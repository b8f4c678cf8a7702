package graft

/** Plan lint over the ENTIRE declared surface: walk every query's physical
  * plan and reject the patterns that do not survive a 1000-executor cluster.
  *
  * CartesianProductExec is Spark's non-broadcast unkeyed cross join — the
  * all-pairs shape every similarity operator here is specifically designed
  * to avoid. Declared cross/nested-loop joins (j10, l3, l6, x11 codebook,
  * a12-style stats broadcasts) must all plan as BroadcastNestedLoopJoin
  * with the TINY side built, never CartesianProduct. A regression that
  * swaps a keyed or broadcast join for a cartesian one fails here before
  * it ever reaches the bench.
  */
class PlanLintSpec extends SparkSpec {

  test("no declared query plans a CartesianProduct") {
    // NOTE: x20/x21_semdedup_learned eagerly localCheckpoint their
    // iteration frames, which truncates those subtrees to RDD scans in
    // the whole-query plan — their internals are linted separately by the
    // building-blocks test below.
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      spark.catalog.clearCache() // plan-shape isolation: Ckpt.shared registers CacheManager entries at BUILD time; a stale entry from the previous query would substitute into this plan
      val plan = fn(spark, sf001).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: ${offenders.mkString(", ")}")
  }

  /** The broadcast-hint lint below catches corpus-sized frames the CODE
    * hints; this one catches the subtler twin the ScaleProfile run exposed:
    * a broadcast the STATIC PLANNER chooses on its own. Joins below the
    * first shuffle are planned from static size estimates, and estimates
    * through a Generate (explode) are underestimates — so the planner
    * happily broadcast x1's corpus-sized exploded (doc, token) stream,
    * which was bimodal 15 s / 70 s at a synthetic 8× sf0.1 (driver-built
    * multi-million-row HashedRelation, cost dependent on driver heap
    * state) and a guaranteed driver OOM at 100 TB. The hazard is specific
    * to NARROW build sides (scan/filter/project/generate only): those have
    * no shuffle-stage boundary beneath them, so the static estimate is the
    * only size check that will ever run. A build side containing an
    * aggregate or join sits above materialized query stages whose REAL
    * sizes AQE re-optimizes with — it demotes the broadcast if runtime
    * size is large, so those are left to AQE on purpose (l7/l8/x13's
    * vocabulary-sized agg joins rely on exactly that). Walk every declared
    * query's pre-AQE physical plan: no broadcast join may BUILD a narrow
    * side that scans documents/embeddings without a corpus-reducing step
    * (global aggregate, limit, or literal-comparison filter).
    */
  test("no planner-chosen broadcast of an unreduced corpus frame") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      spark.catalog.clearCache() // plan-shape isolation: Ckpt.shared registers CacheManager entries at BUILD time; a stale entry from the previous query would substitute into this plan
      if (hasCorpusBroadcastBuild(fn(spark, sf001).queryExecution.sparkPlan))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"planner-chosen corpus broadcasts: ${offenders.mkString(", ")}")
  }

  /** The whole-surface test above passes vacuously if a Spark upgrade
    * changes the plan-node classes the detector matches on — these controls
    * pin the detector itself: a forced broadcast build of an unreduced
    * corpus explode MUST flag; an aggregated (vocabulary-sized) build and a
    * limit-reduced build must NOT (those are exactly the AQE-governed /
    * corpus-reducing shapes the lint exempts on purpose).
    */
  test("planner-broadcast lint detector: flags forced corpus build, passes reduced builds") {
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sf001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val probe = Tables.documents(spark, sf001).select(col("doc_id").as("p_id"))
    val bad = probe.join(broadcast(toks), col("p_id") === col("doc_id"))
    assert(hasCorpusBroadcastBuild(bad.queryExecution.sparkPlan),
      "detector must flag a broadcast build of an unreduced corpus explode")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val agg = toks.join(broadcast(vocab), "tok")
    assert(!hasCorpusBroadcastBuild(agg.queryExecution.sparkPlan),
      "an aggregated build side is AQE-governed and must not flag")
    val reduced = probe.join(broadcast(toks.limit(10)), col("p_id") === col("doc_id"))
    assert(!hasCorpusBroadcastBuild(reduced.queryExecution.sparkPlan),
      "a limit-reduced build side must not flag")
    // fact-table rule: an EXPLODED lineitem build flags (estimate through
    // Generate is a systematic underestimate — the j15 first cut), a plain
    // lineitem scan build does not (file-size estimates self-correct at
    // scale, so the static choice is only ever made when it is true)
    val liBins = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), explode(expr(
        "sequence(l_linenumber, l_linenumber + 1)")).as("bin"))
    val liProbe = Tables.lineitem(spark, sf001).select(col("l_orderkey").as("ok2"))
    val badLi = liProbe.join(broadcast(liBins), col("ok2") === col("l_orderkey"))
    assert(hasCorpusBroadcastBuild(badLi.queryExecution.sparkPlan),
      "a broadcast build of an exploded fact-table frame must flag")
    val plainLi = liProbe.join(
      broadcast(Tables.lineitem(spark, sf001).select(col("l_orderkey"))),
      col("ok2") === col("l_orderkey"))
    assert(!hasCorpusBroadcastBuild(plainLi.queryExecution.sparkPlan),
      "a plain fact-table scan build (accurate estimate) must not flag")
  }

  /** Detector for the planner-broadcast lint: does any broadcast join in
    * this pre-AQE plan BUILD a narrow (scan/filter/project/generate-only)
    * side that scans documents/embeddings without a corpus-reducing step
    * (global aggregate, limit, or literal-comparison filter)?
    */
  private def hasCorpusBroadcastBuild(
      plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.BinaryComparison
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

    def scans(p: SparkPlan, tables: String*): Boolean =
      p.collectLeaves().exists {
        case f: FileSourceScanExec => f.relation.location.rootPaths.exists {
          rp => tables.exists(t => rp.toString.contains(t)) }
        case _ => false
      }
    // documents/embeddings: ANY narrow unreduced build flags (the training
    // corpus is the canonical 100 TB frame). Fact tables (lineitem/events/
    // orders): flag only when the narrow build contains a Generate — a
    // plain file scan's size estimate is the real file size and
    // self-corrects at scale (a 100 TB scan estimate exceeds any broadcast
    // threshold), but an estimate THROUGH an explode is a systematic
    // underestimate (the j15 first cut planned exactly this broadcast).
    def corpusScan(p: SparkPlan): Boolean =
      scans(p, "documents.parquet", "embeddings.parquet") ||
      (scans(p, "lineitem.parquet", "events.parquet", "orders.parquet") &&
        p.find(_.isInstanceOf[GenerateExec]).isDefined)
    def reducing(p: SparkPlan): Boolean = p.find {
      case a: HashAggregateExec if a.groupingExpressions.isEmpty => true
      case a: SortAggregateExec if a.groupingExpressions.isEmpty => true
      case a: ObjectHashAggregateExec if a.groupingExpressions.isEmpty => true
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case f: FilterExec => f.condition.exists {
        case c: BinaryComparison => c.left.foldable || c.right.foldable
        case _ => false
      }
      case _ => false
    }.isDefined
    // A keyed aggregate or join below the build implies a materialized
    // query stage whose real size AQE re-plans with; a narrow subtree has
    // no such boundary — the static estimate is final.
    def narrow(p: SparkPlan): Boolean = p.find {
      case _: HashAggregateExec | _: SortAggregateExec |
           _: ObjectHashAggregateExec => true
      case j: SparkPlan if j.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec] => true
      case _ => false
    }.isEmpty
    val builds = plan.collect {
      case j: BroadcastHashJoinExec =>
        j.buildSide match { case BuildLeft => j.left; case BuildRight => j.right }
      case j: BroadcastNestedLoopJoinExec =>
        j.buildSide match { case BuildLeft => j.left; case BuildRight => j.right }
    }
    builds.exists(s => corpusScan(s) && narrow(s) && !reducing(s))
  }

  /** Eager localCheckpoint (x20's rounds, the Lloyd trainer) hides the
    * checkpointed subtree from the whole-query lint above — the plan just
    * shows an RDD scan. Lint the UN-checkpointed building blocks directly
    * so a cartesian regression inside an iteration cannot slip through.
    */
  test("checkpointed iteration building blocks plan cartesian-free") {
    import org.apache.spark.sql.functions._
    val edges = ops.Pipeline.x20Edges(spark, sf001)
    val labels0 = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("doc_id").as("lbl"))
    val vecs = Tables.embeddings(spark, sf001)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("emb"))
    val cb = vecs.orderBy("id").limit(16)
      .select(col("id").as("cent_id"), col("emb").as("cent_emb"))
    val assigned = ops.KMeansCodebook.assign(vecs, cb)
    val ed = ops.Rdf.r7Edges(spark, sf001)
    val pr0 = ops.Rdf.r7Step(ed, None)
    val blocks = Seq(
      "x20 edges" -> edges,
      "x20 hook" -> ops.Pipeline.x20Hook(edges, labels0),
      "x20 shortcut" -> ops.Pipeline.x20Shortcut(labels0),
      "kmeans assign" -> assigned,
      "kmeans means" -> ops.KMeansCodebook.meansStep(assigned, vecs, mirrored = true),
      "r7 edges" -> ed,
      "r7 step0" -> pr0,
      "r7 step" -> ops.Rdf.r7Step(ed, Some((pr0, ops.Rdf.defaultRank(1)))),
      "x27 body" -> ops.Pipeline.x27On(ops.Pipeline.x27Cells(spark, sf001)))
    blocks.foreach { case (n, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
    }
  }

  /** The distributed prefix-sum idiom (x27, and r13's panel re-index since
    * round 10) tiles the global order into sampled range cells; the ONLY
    * unpartitioned window it is allowed to keep runs over the P per-cell
    * aggregates (P = shuffle parallelism, a config constant at any corpus).
    * A data-sized `Window.orderBy(...)` — the single-partition sort the r9
    * verdict flagged at Rdf.scala's old panel re-index — fails here.
    */
  test("prefix-sum blocks: unpartitioned windows only over per-cell aggregates") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    import org.apache.spark.sql.functions.col
    val und = {
      val e = ops.Rdf.coEdges(spark, sf001)
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    }
    val blocks = Seq(
      "r13 seed re-index" ->
        ops.Rdf.r13SeedBitsOn(ops.Rdf.r13PanelCells(und)),
      "x27 body" -> ops.Pipeline.x27On(ops.Pipeline.x27Cells(spark, sf001)))
    blocks.foreach { case (name, df) =>
      val offenders = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
            !w.child.exists {
              case a: Aggregate => a.groupingExpressions
                .exists(_.references.exists(_.name == "cell"))
              case _ => false
            } => w
      }
      assert(offenders.isEmpty,
        s"$name keeps a data-sized unpartitioned window:\n${offenders.mkString("\n")}")
    }
  }

  /** A `broadcast()` hint on a frame whose cardinality grows with the
    * corpus is the one pattern AQE cannot save you from — the hint is
    * unconditional, so at 100 TB it collects the whole table onto the
    * driver and every executor. A hinted subtree that scans the corpus
    * tables (documents/embeddings) must contain a corpus-reducing step:
    * a global aggregate (≤1 row), a limit, or a literal-comparison filter
    * (a fixed probe/codebook set like vec_id < 10). Frames that are merely
    * "small at test SF" must leave the decision to AQE (no hint).
    */
  test("no broadcast hint on a corpus-sized documents/embeddings frame") {
    import org.apache.spark.sql.catalyst.expressions.BinaryComparison
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

    def corpusLeaf(p: LogicalPlan): Boolean = p.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.exists { rp =>
          val s = rp.toString
          s.contains("documents.parquet") || s.contains("embeddings.parquet") ||
        s.contains("lineitem.parquet") || s.contains("events.parquet") ||
        s.contains("orders.parquet")
        }
        case _ => false
      }
      case _ => false
    }
    def reducing(p: LogicalPlan): Boolean = p.exists {
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case _: GlobalLimit | _: LocalLimit => true
      // A comparison against a foldable side (a literal, possibly wrapped
      // in an implicit cast: `vec_id < cast(10 as bigint)`) is a fixed
      // probe/codebook selection — corpus-reducing by construction.
      case f: Filter => f.condition.exists {
        case cmp: BinaryComparison => cmp.left.foldable || cmp.right.foldable
        case _ => false
      }
      case _ => false
    }
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      spark.catalog.clearCache() // plan-shape isolation: Ckpt.shared registers CacheManager entries at BUILD time; a stale entry from the previous query would substitute into this plan
      val hinted = fn(spark, sf001).queryExecution.analyzed.collect {
        case h: ResolvedHint
          if h.hints.strategy.exists(_.toString.toUpperCase.contains("BROADCAST")) => h
      }
      if (hinted.exists(h => corpusLeaf(h.child) && !reducing(h.child))) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"corpus-sized broadcast hints: ${offenders.mkString(", ")}")
  }

  /** The third classic scale regression (after cartesians and corpus-sized
    * broadcasts): a literal predicate that silently stops reaching the
    * parquet scan — e.g. a refactor wrapping the column in a non-pushable
    * expression — turns a pruned read into a full-table scan that the
    * query still answers correctly at test SF. Assert the predicate shows
    * up INSIDE a scan's `PushedFilters: [...]` for every declared query
    * with a literal predicate on a scanned column (j3's date range lifted
    * off the scan must fail here).
    */
  test("literal predicates reach the parquet scan (PushedFilters non-empty)") {
    // everything from the marker to the end of the scan node's line (the
    // filter list itself nests brackets — In(c, [..]) — so no ]-regex)
    def pushedLists(plan: String): Seq[String] = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .map(l => l.substring(l.indexOf("PushedFilters: [")))
      .toSeq
    // plan-node metadata strings truncate at 100 chars by default, which
    // cuts long pushed-filter lists mid-entry (no closing bracket)
    val prevLen = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try {
    val expect = Seq(
      // query -> fragment that must appear inside some scan's PushedFilters
      "c2_filter_pred" -> "StringStartsWith(l_returnflag,N)",
      "j3_star_5way" -> "GreaterThanOrEqual(o_orderdate,",
      "j6_anti" -> "GreaterThanOrEqual(o_orderdate,",
      "x9_ann_lsh" -> "LessThan(vec_id,10)",
      "x11_ann_ivf" -> "LessThan(vec_id,",
      "l3_cosine_topk" -> "LessThan(vec_id,10)")
    val bad = expect.flatMap { case (name, frag) =>
      spark.catalog.clearCache() // plan-shape isolation: Ckpt.shared registers CacheManager entries at BUILD time; a stale entry from the previous query would substitute into this plan
      val plan = SparkEntry.queries(name)(spark, sf001)
        .queryExecution.executedPlan.toString
      val pushed = pushedLists(plan)
      if (pushed.exists(_.contains(frag))) None
      else Some(s"$name: '$frag' not in pushed filters ${pushed.mkString(" | ")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prevLen)
  }

  /** Negative control for the lint above: phrase j3's date range through
    * an expression Spark cannot push (string-concat over the cast column)
    * and assert the fragment REALLY disappears from PushedFilters — i.e.
    * the positive test keys on scan pushdown, not on text that would
    * appear anywhere (DataFilters, Filter nodes) regardless.
    */
  test("pushdown lint control: a lifted predicate leaves PushedFilters") {
    import org.apache.spark.sql.functions._
    val lifted = Tables.orders(spark, sf001)
      .filter(concat(col("o_orderdate").cast("string"), lit("")) >= "1996-01-01")
      .select("o_orderkey")
    val plan = lifted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), "control query must still scan parquet")
    assert(!plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"lifted range unexpectedly pushed:\n$plan")
  }

  /** The custom Catalyst expressions exist to stay INSIDE whole-stage
    * codegen (their docstrings' whole justification over the composable
    * HOFs). Two regressions would be silent at runtime: an expression
    * reworked onto CodegenFallback quietly interprets per row, and a
    * doGenCode emitting uncompilable Java quietly falls back per stage.
    * Guard both: the expressions must not be CodegenFallback, and the
    * queries exercising them must execute with codegen fallback disabled
    * (compile errors become hard failures instead of silent interpretation).
    */
  test("custom expressions stay codegen-capable (no fallback)") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val exprs = Seq(
      GraftBridge.expression(graft.functions.DotProduct.dot(col("a"), col("b"))),
      GraftBridge.expression(graft.functions.NGrams.ngrams(col("a"), 3)),
      GraftBridge.expression(graft.functions.SortedIntersectCount
        .sortedIntersectCount(col("a"), col("b"))),
      graft.functions.SignBands(GraftBridge.expression(lit(1)), 16, 4))
    exprs.foreach { e =>
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.getClass.getName} fell back to interpreted eval")
    }
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      Seq("x16_repetition", "l3_cosine_topk", "x2_simhash", "x9_ann_lsh",
          "x1_minhash_lsh")
        .foreach { q =>
          assert(SparkEntry.queries(q)(spark, sf001).count() > 0, q)
        }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("every declared query's optimized plan builds without error") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val qe = fn(spark, sf001).queryExecution
      assert(qe.optimizedPlan != null, name)
    }
  }

  /** x22's design claim is that the composed pipeline (dedup survivor →
    * gate → sample → split → rollup) shares ONE corpus scan instead of
    * re-reading the lake per stage — enforce it so a refactor that joins
    * stage outputs (and silently multiplies the 100 TB scan) fails here.
    */
  test("x22 training manifest reads the documents table exactly once") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scans = ops.Pipeline.x22(spark, sf001).queryExecution.optimizedPlan
      .collectLeaves().count {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.exists(_.toString.contains("documents.parquet"))
          case _ => false
        }
        case _ => false
      }
    assert(scans === 1, s"x22 must scan documents once, found $scans scans")
  }

  /** x40's funnel accounting makes the same single-scan claim — a naive
    * stage-per-subframe formulation re-scans the lake once per stage (the
    * measured plan had 10 document scans before the flag-chain rewrite). */
  test("x40 curation funnel reads the documents table exactly once") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val scans = ops.Pipeline.x40(spark, sf001).queryExecution.optimizedPlan
      .collectLeaves().count {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.exists(_.toString.contains("documents.parquet"))
          case _ => false
        }
        case _ => false
      }
    assert(scans === 1, s"x40 must scan documents once, found $scans scans")
  }

  /** j18's design claim: Catalyst decorrelates the NOT EXISTS into ONE
    * anti join — no per-row subquery execution survives to the physical
    * plan. A Spark change that left a correlated subquery in place would
    * re-execute orders per customer row (quadratic at scale). */
  test("j18 NOT EXISTS plans as a single anti join, no residual subquery") {
    val plan = ops.Joins.j18(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(500))
    assert(!plan.contains("InSubqueryExec") && !plan.contains("ScalarSubquery"),
      "correlated subquery survived decorrelation")
  }

  /** j17's pre-shuffle Bloom probe must be Spark's native
    * BloomFilterMightContain codegen predicate, not a Scala UDF — a UDF in
    * that filter breaks whole-stage codegen exactly on the fact-scan hot
    * path the operator exists to protect (round-8 verdict item 5). */
  test("j17 bloom probe is a native codegen predicate, no ScalaUDF") {
    val df = ops.Joins.j17(spark, sf001)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("UDF") && !physical.contains("ScalaUDF"),
      "Scala UDF found in j17's physical plan:\n" + physical.take(800))
    assert(physical.contains("might_contain"),
      "BloomFilterMightContain missing from j17's plan:\n" + physical.take(800))
  }

  /** w10's design claim: the top-20 cut plans as TakeOrderedAndProject
    * (per-partition heaps + one merge), never a global sort of the
    * per-customer revenue frame. */
  test("w10 pareto top-20 plans as TakeOrderedAndProject, no global sort below it") {
    val plan = ops.Windows.w10(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  /** x39's cap must run through the TopKPerGroup physical operator (bounded
    * per-partition heaps), not a generic window — the skew-proof property
    * the SURVEY row claims. */
  test("x39 domain cap plans through TopKPerGroupExec") {
    val plan = ops.Pipeline.x39(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(500))
  }

  /** Does any exchange (shuffle or broadcast) in this physical plan move a
    * binary (blob) column? At 100 TB of media that is a payload-sized
    * network pass — the round-12 weak finding (`extractFeatures` used to
    * repartition the blob-bearing frame on `kind`). */
  private def hasBlobExchange(
      plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.BinaryType
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // AQE wraps the physical plan (AdaptiveSparkPlanExec's subtree is a
    // field, not a child), so a plain collect() sees no exchanges — unwrap.
    // An exchange fed by a PARTIAL AGGREGATE is exempt: its binary columns
    // are serialized agg buffers (percentile_disc et al.), bounded per
    // group — not the blob payload the lint hunts.
    plan.exists {
      case a: AdaptiveSparkPlanExec => hasBlobExchange(a.executedPlan)
      case q: QueryStageExec => hasBlobExchange(q.plan)
      case e: Exchange => !e.child.isInstanceOf[BaseAggregateExec] &&
        e.child.output.exists(_.dataType == BinaryType)
      case _ => false
    }
  }

  /** The m-group's written contract (ops/Media.scala): blobs never reach a
    * shuffle — only extracted ~50-byte metadata rows do. Enforce it on the
    * physical plan of every declared m-key so a reintroduced payload
    * exchange (repartition, planner broadcast of the media frame, a join
    * keyed before feature extraction) fails here before the bench. */
  test("m-group plans carry no blob-bearing exchange") {
    val offenders = SparkEntry.queries.keys.filter(_.startsWith("m")).filter {
      name =>
        spark.catalog.clearCache() // plan-shape isolation (see above)
        hasBlobExchange(
          SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan)
    }
    assert(offenders.isEmpty,
      s"blob-bearing exchanges: ${offenders.mkString(", ")}")
  }

  /** Detector controls: a forced repartition of the blob-bearing media
    * frame MUST flag (this is exactly the round-12 defect), and the fixed
    * extractFeatures plan must NOT (metadata-only aggregation exchanges are
    * fine — they move ~50-byte rows, not payloads). */
  test("blob-exchange lint detector: flags payload repartition, passes metadata shuffles") {
    import org.apache.spark.sql.functions._
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sf001)
    val bad = media.repartition(col("kind")).toDF()
    assert(hasBlobExchange(bad.queryExecution.executedPlan),
      "detector must flag a repartition that moves the content column")
    val good = multimodal.Multimodal.extractFeatures(media)
      .groupBy(col("kind")).agg(count(lit(1)).as("n")).toDF()
    assert(!hasBlobExchange(good.queryExecution.executedPlan),
      "a metadata-only aggregation exchange must not flag")
  }

  /** The round-12 m-group bug is a CLASS, not an instance: a repartition
    * keyed ONLY on columns with a declared tiny domain (kind: 3 values,
    * lang: a handful) caps parallelism at the domain size no matter how
    * wide the cluster — and when the row carries a binary payload it also
    * ships every blob byte through that ≤|domain|-partition exchange. Walk
    * every declared query's analyzed plan: no RepartitionByExpression may
    * key exclusively on tiny-domain columns while its child carries a
    * binary column. (Salting — adding a high-cardinality term like
    * pmod(hash(doc_id), N) — widens the key space and is exempt by
    * construction: its references are no longer tiny-domain-only.) */
  test("no tiny-domain payload repartition in any declared query") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      spark.catalog.clearCache() // plan-shape isolation: Ckpt.shared registers CacheManager entries at BUILD time; a stale entry from the previous query would substitute into this plan
      if (hasTinyDomainPayloadRepartition(
          fn(spark, sf001).queryExecution.analyzed)) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"tiny-domain payload repartitions: ${offenders.mkString(", ")}")
  }

  private val tinyDomainCols = Set("kind", "lang", "split", "l_returnflag",
    "l_linestatus", "o_orderstatus", "event_type", "source")

  private def hasTinyDomainPayloadRepartition(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    import org.apache.spark.sql.types.BinaryType
    plan.exists {
      case r: RepartitionByExpression =>
        val refs = r.partitionExpressions.flatMap(_.references).map(_.name)
        refs.nonEmpty && refs.forall(tinyDomainCols.contains) &&
          r.child.output.exists(_.dataType == BinaryType)
      case _ => false
    }
  }

  /** Controls for the tiny-domain lint: the exact round-12 shape (payload
    * repartition on `kind`) must flag; the SALTED form and a metadata-only
    * (no binary column) repartition must not. */
  test("tiny-domain repartition lint: flags kind-only payload, passes salted and metadata") {
    import org.apache.spark.sql.functions._
    val media = multimodal.Multimodal.mediaFromDocuments(spark, sf001).toDF()
    assert(hasTinyDomainPayloadRepartition(
      media.repartition(col("kind")).queryExecution.analyzed),
      "kind-only payload repartition must flag")
    assert(!hasTinyDomainPayloadRepartition(
      media.repartition(col("kind"), pmod(hash(col("doc_id")), lit(32)))
        .queryExecution.analyzed),
      "salted repartition must not flag (high-cardinality term in the key)")
    assert(!hasTinyDomainPayloadRepartition(
      media.drop("content").repartition(col("kind")).queryExecution.analyzed),
      "metadata-only repartition must not flag (no binary column moves)")
  }
}
