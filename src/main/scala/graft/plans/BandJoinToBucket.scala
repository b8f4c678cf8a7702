package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an inner BAND join — a join whose only usable
  * predicate constrains the difference of a left-side and a right-side
  * expression to a bounded interval — into a BUCKETED equi-join, j19's
  * manual plan shape applied automatically to any user query.
  *
  * Recognized shapes (any orientation, any comparison direction):
  *  - `abs(a − b) <= w` (also `<`) — the symmetric band;
  *  - the hand-written PAIRED form: one conjunct bounding `a − b` from
  *    above and another from below (`a − b <= w && b − a <= w`,
  *    `a − b BETWEEN -w AND w`, asymmetric `a − b <= u && a − b >= l`, …).
  *    The bounds are merged per (left-expr, right-expr) pair across all
  *    conjuncts; a band needs BOTH a finite lower and upper bound.
  *
  * Operand types: DOUBLE/FLOAT (fp bucketing, ±2 guard band — see below),
  * BYTE/SHORT/INT/LONG (exact long floor-division, ±1), and DECIMAL up to
  * the long-backed precision (≤ 18 digits at the merged scale: exact
  * unscaled-long floor-division, ±1).
  *
  * Without an equi-conjunct Spark has no hash key, so the planner's only
  * options are broadcast-nested-loop or a cartesian product: O(n·m)
  * predicate evaluations, and the broadcast side cannot be corpus-sized.
  * The rewrite quantizes the band axis into width-W integer buckets
  * (W = max(|lo|, |hi|)), EXPANDs the left side to its own bucket ± the
  * guard radius, adds the bucket equality as a new equi-conjunct, and
  * keeps the ORIGINAL predicate as the residual — so false POSITIVES are
  * impossible by construction; the only hazard class is a dropped pair,
  * which the guard radius below closes. Cost: one keyed shuffle of
  * (2·radius+1)·n + m rows on a dense integer key — broadcast-free,
  * skew-safe, linear.
  *
  * Precision model for the fp path (why ±2, not ±1): buckets are
  * `floor(x ∕ W)` on IEEE doubles. Divide is correctly rounded and every
  * integer in range is representable, so the computed quotient can cross
  * an integer boundary only UPWARD: computed bucket ∈ {true, true + 1}.
  * The residual `|x − y| <= W` is itself evaluated in fp, so an accepted
  * pair can have real |x − y| up to one ulp ABOVE W — at an exact
  * boundary alignment its true buckets then differ by 2 (e.g.
  * x = −1e−300, y = 0.7, W = 0.7: fl(y − x) = 0.7 accepts the pair, yet
  * floor(x∕W) = −1 and floor(y∕W) = +1 — a ±1 expand silently DROPS it;
  * BandJoinSpec carries that pair as a negative control). The two
  * mechanisms cannot stack on the same side (slack puts y∕W just above
  * an integer — nowhere near the next round-up zone), so computed-bucket
  * difference ≤ 2 and a ±2 expand covers every accepted pair.
  * PRECONDITION (documented, not statically checkable): |x ∕ W| < 2⁵¹.
  * Beyond ~2⁵² the quotient grid is coarser than 1 and floor loses
  * integer resolution entirely; at those magnitudes the band axis should
  * be rescaled (or stored integral, which takes the exact path).
  *
  * The integral and decimal paths never round: bucket =
  * `(x − pmod(x, W)) div W` on longs (decimals via the unscaled long at
  * the merged scale, a cast that is exact by construction) is true floor
  * division, and an accepted pair's difference is an exact integer ≤ W,
  * so buckets differ by ≤ 1 — the ±1 expand is provably complete.
  *
  * Fire conditions (all checked, otherwise the join is left untouched):
  *  - inner join, condition present;
  *  - the merged bounds give lo ≤ hi with W = max(|lo|, |hi|) > 0, the
  *    band operands are deterministic, single-sided, of a supported type;
  *  - no conjunct is already an equi-predicate across the two sides (if
  *    one exists the planner already has a hash key and the expansion
  *    would only multiply the probe side).
  *
  * Null semantics are preserved: a null band operand makes the original
  * predicate null (row dropped by the inner join) and makes the
  * synthesized bucket null (row dropped by the added equality) — same
  * result.
  *
  * Installed via [[GraftExtensions]] (config-time) or `install(spark)`
  * (runtime, `spark.experimental.extraOptimizations`).
  */
object BandJoinToBucket extends Rule[LogicalPlan] {

  /** Session-conf kill switches (r10 advice): the whole rule, and the fp
    * path alone. The fp ±2 guard is proven only under |x ∕ W| < 2⁵¹ — a
    * precondition the rule cannot check statically — so users with
    * pathological magnitude-to-width domains can restore the unrewritten
    * (nested-loop but correct) plan without a code change. */
  val EnabledKey = "spark.graft.bandJoin.enabled"
  val FpEnabledKey = "spark.graft.bandJoin.fp.enabled"
  private def flag(key: String): Boolean =
    conf.getConfString(key, "true").toBoolean

  def apply(plan: LogicalPlan): LogicalPlan = if (!flag(EnabledKey)) plan else plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else findBand(conjuncts, left, right) match {
        case Some(band) =>
          val lBucketBase = band.bucket(band.l)
          val rBucket = Alias(band.bucket(band.r), "graft_band_bucket")()
          val lBucketAttr =
            AttributeReference("graft_band_bucket_l", LongType, nullable = true)()
          val expand = Expand(
            band.offsets.map(off =>
              left.output :+ Add(lBucketBase, Literal(off, LongType))),
            left.output :+ lBucketAttr, left)
          val projRight = Project(right.output :+ rBucket, right)
          val newCond = And(EqualTo(lBucketAttr, rBucket.toAttribute), cond)
          Project(j.output,
            Join(expand, projRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  // ------------------------------------------------------------------
  // band description: how to bucket each side, and the expand radius
  // ------------------------------------------------------------------

  private sealed trait Band {
    def l: Expression
    def r: Expression
    def bucket(e: Expression): Expression
    def offsets: Seq[Long]
  }

  /** fp path: floor(x ∕ w) with the ±2 guard band (see precision model). */
  private case class DoubleBand(l: Expression, r: Expression, w: Double)
      extends Band {
    def bucket(e: Expression): Expression = {
      val x = if (e.dataType == DoubleType) e else Cast(e, DoubleType)
      Floor(Divide(x, Literal(w, DoubleType)))
    }
    def offsets: Seq[Long] = Seq(-2L, -1L, 0L, 1L, 2L)
  }

  /** exact path: true floor division on longs, provably complete at ±1. */
  private case class LongBand(l: Expression, r: Expression, w: Long)
      extends Band {
    def bucket(e: Expression): Expression =
      floorDiv(if (e.dataType == LongType) e else Cast(e, LongType), w)
    def offsets: Seq[Long] = Seq(-1L, 0L, 1L)
  }

  /** exact decimal path: unscaled long at the merged scale, then LongBand
    * math. The widening cast is exact (precision grew with the scale). */
  private case class DecimalBand(l: Expression, r: Expression,
      precision: Int, scale: Int, wUnscaled: Long) extends Band {
    def bucket(e: Expression): Expression =
      floorDiv(UnscaledValue(Cast(e, DecimalType(precision, scale))), wUnscaled)
    def offsets: Seq[Long] = Seq(-1L, 0L, 1L)
  }

  /** floor(x ∕ w) in exact long arithmetic, overflow-free at every long
    * (r10 advice: the earlier `x − pmod(x, w)` form wrapped for x within
    * pmod(x, w) of Long.MinValue). Truncating division by a positive w
    * never overflows, and floor differs from it by exactly 1 when the
    * remainder is negative: floor(x ∕ w) = (x div w) − [x % w < 0]. The
    * −1 correction cannot underflow either — x div w = Long.MinValue
    * requires w = 1, where the remainder is 0. Nulls propagate: a null x
    * nulls the divide, and If's else-branch keeps the correction at 0. */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    Subtract(
      IntegralDivide(x, wl),
      If(LessThan(Remainder(x, wl), Literal(0L)), Literal(1L), Literal(0L)))
  }

  // ------------------------------------------------------------------
  // detection
  // ------------------------------------------------------------------

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private val supportedTypes: DataType => Boolean = {
    case DoubleType | FloatType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }

  private def sided(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && supportedTypes(e.dataType)

  private def hasEquiConjunct(cs: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    def crossSided(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    cs.exists {
      case EqualTo(a, b) => crossSided(a, b)
      // <=> is a native hash key too (cf. j21) — expanding the probe side
      // when the planner already has one is a pure perf regression
      case EqualNullSafe(a, b) if a.deterministic && b.deterministic =>
        crossSided(a, b)
      case _ => false
    }
  }

  /** Bounds on (l − r) accumulated across conjuncts: lo ≤ l − r ≤ hi. */
  private case class Bounds(l: Expression, r: Expression,
      lo: Option[BigDecimal], hi: Option[BigDecimal])

  /** Exact numeric value of a positive-width literal. Doubles convert via
    * the exact binary expansion, so no decimal rounding enters the merge. */
  private def litValue(e: Expression): Option[BigDecimal] = e match {
    case l: Literal if l.value != null =>
      l.value match {
        case d: java.lang.Double =>
          if (java.lang.Double.isFinite(d)) Some(BigDecimal(new java.math.BigDecimal(d.doubleValue()))) else None
        case f: java.lang.Float =>
          if (java.lang.Float.isFinite(f)) Some(BigDecimal(new java.math.BigDecimal(f.doubleValue()))) else None
        case n @ (_: java.lang.Long | _: java.lang.Integer |
            _: java.lang.Short | _: java.lang.Byte) =>
          Some(BigDecimal(n.asInstanceOf[java.lang.Number].longValue()))
        case dec: Decimal => Some(BigDecimal(dec.toJavaBigDecimal))
        case _ => None
      }
    case _ => None
  }

  /** Per-conjunct bound contributions on an oriented (left, right) pair. */
  private def contributions(c: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[Bounds] = {
    def orientAbs(a: Expression, b: Expression, w: BigDecimal): Seq[Bounds] =
      if (sided(a, left) && sided(b, right)) Seq(Bounds(a, b, Some(-w), Some(w)))
      else if (sided(b, left) && sided(a, right)) Seq(Bounds(b, a, Some(-w), Some(w)))
      else Seq.empty
    // bound on the raw difference (a − b) cmp v: orient to (l − r),
    // flipping both the bound side and its sign when a sits on the right
    def orientDiff(a: Expression, b: Expression, isUpper: Boolean,
        v: BigDecimal): Seq[Bounds] =
      if (sided(a, left) && sided(b, right))
        Seq(if (isUpper) Bounds(a, b, None, Some(v)) else Bounds(a, b, Some(v), None))
      else if (sided(a, right) && sided(b, left))
        Seq(if (isUpper) Bounds(b, a, Some(-v), None) else Bounds(b, a, None, Some(-v)))
      else Seq.empty
    c match {
      // abs forms: |a − b| <= w (either comparison orientation, <= or <)
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), wl) =>
        litValue(wl).filter(_ > 0).toSeq.flatMap(orientAbs(a, b, _))
      case LessThan(Abs(Subtract(a, b, _), _), wl) =>
        litValue(wl).filter(_ > 0).toSeq.flatMap(orientAbs(a, b, _))
      case GreaterThanOrEqual(wl, Abs(Subtract(a, b, _), _)) =>
        litValue(wl).filter(_ > 0).toSeq.flatMap(orientAbs(a, b, _))
      case GreaterThan(wl, Abs(Subtract(a, b, _), _)) =>
        litValue(wl).filter(_ > 0).toSeq.flatMap(orientAbs(a, b, _))
      // one-sided forms on the raw difference; strict comparisons keep the
      // closed bound (conservative — the residual enforces strictness)
      case LessThanOrEqual(Subtract(a, b, _), wl) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = true, _))
      case LessThan(Subtract(a, b, _), wl) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = true, _))
      case GreaterThanOrEqual(Subtract(a, b, _), wl) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = false, _))
      case GreaterThan(Subtract(a, b, _), wl) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = false, _))
      case LessThanOrEqual(wl, Subtract(a, b, _)) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = false, _))
      case LessThan(wl, Subtract(a, b, _)) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = false, _))
      case GreaterThanOrEqual(wl, Subtract(a, b, _)) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = true, _))
      case GreaterThan(wl, Subtract(a, b, _)) =>
        litValue(wl).toSeq.flatMap(orientDiff(a, b, isUpper = true, _))
      case _ => Seq.empty
    }
  }

  /** Merge per-pair bounds (tightest wins) and build the first viable band. */
  private def findBand(cs: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[Band] = {
    val merged = scala.collection.mutable.ArrayBuffer.empty[Bounds]
    for (c <- cs; contrib <- contributions(c, left, right)) {
      val i = merged.indexWhere(m =>
        m.l.semanticEquals(contrib.l) && m.r.semanticEquals(contrib.r))
      if (i < 0) merged += contrib
      else {
        val m = merged(i)
        def tight(a: Option[BigDecimal], b: Option[BigDecimal],
            pick: (BigDecimal, BigDecimal) => BigDecimal) = (a, b) match {
          case (Some(x), Some(y)) => Some(pick(x, y))
          case (x, y) => x.orElse(y)
        }
        merged(i) = Bounds(m.l, m.r,
          tight(m.lo, contrib.lo, _ max _), tight(m.hi, contrib.hi, _ min _))
      }
    }
    merged.collectFirst(Function.unlift {
      case Bounds(l, r, Some(lo), Some(hi)) if lo <= hi =>
        val w = lo.abs.max(hi.abs)
        if (w > 0) mkBand(l, r, w) else None
      case _ => None
    })
  }

  private def mkBand(l: Expression, r: Expression,
      w: BigDecimal): Option[Band] = l.dataType match {
    case DoubleType | FloatType if flag(FpEnabledKey) =>
      // round the exact merged width UP to a double so the fp bucket width
      // can never be narrower than the true bound
      val wd0 = w.toDouble
      val wd = if (BigDecimal(new java.math.BigDecimal(wd0)) < w) Math.nextUp(wd0) else wd0
      if (wd > 0 && java.lang.Double.isFinite(wd)) Some(DoubleBand(l, r, wd))
      else None
    case ByteType | ShortType | IntegerType | LongType =>
      // fractional widths on integral operands round up (cover superset)
      val wl = w.setScale(0, BigDecimal.RoundingMode.CEILING)
      if (wl >= 1 && wl <= BigDecimal(Long.MaxValue / 4)) Some(LongBand(l, r, wl.toLongExact))
      else None
    case dt: DecimalType =>
      val scale = math.max(dt.scale, w.scale)
      val precision = dt.precision + (scale - dt.scale)
      if (precision <= Decimal.MAX_LONG_DIGITS) {
        val wu = w.setScale(scale, BigDecimal.RoundingMode.CEILING)
          .underlying.unscaledValue
        if (wu.signum > 0 && wu.bitLength <= 61)
          Some(DecimalBand(l, r, precision, scale, wu.longValueExact))
        else None
      } else None
    case _ => None
  }

  /** Idempotent runtime install (the driver owns session construction). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this)) {
      spark.experimental.extraOptimizations = cur :+ this
    }
  }
}
