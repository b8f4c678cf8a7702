package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops._

/** Per-operator semantics on tiny literal data + invariants on the fixture
  * (SURVEY.md §5.2-2/5): NULL/boundary edges, partitioning invariance,
  * determinism double-runs for the riskiest queries.
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("session_window boundary: event at exactly prev+gap merges (strict >)") {
    val base = 1700000000000000L // µs
    val gap = 30L * 60 * 1000000
    val df = Seq(
      (1L, base), (1L, base + gap), // exactly at gap → same session
      (1L, base + gap + gap + 1)    // 1µs past → new session
    ).toDF("user_id", "us")
      .withColumn("tstamp", timestamp_micros($"us"))
    val sessions = df.groupBy($"user_id", session_window($"tstamp", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select($"cnt").as[Long].collect().sorted
    assert(sessions.toSeq == Seq(1L, 2L))
  }

  test("semi and anti joins partition the left side") {
    val semi = Joins.j5(spark, sf001).count()
    val antiOpen = Tables.customer(spark, sf001)
      .join(Tables.orders(spark, sf001).filter($"o_orderstatus" === "O"),
        $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(semi + antiOpen === Tables.customer(spark, sf001).count())
  }

  test("full outer row accounting (j7)") {
    val j7 = Joins.j7(spark, sf001)
    val nations = j7.count()
    val withBoth = j7.filter($"cust_cnt".isNotNull && $"supp_cnt".isNotNull).count()
    val custOnly = j7.filter($"supp_cnt".isNull).count()
    val suppOnly = j7.filter($"cust_cnt".isNull).count()
    assert(withBoth + custOnly + suppOnly === nations)
    assert(custOnly > 0) // sf0.001 has 10 suppliers over 25 nations
  }

  test("decimal aggregation is partitioning-invariant (rule D2)") {
    val base = Tables.lineitem(spark, sf001)
    val results = Seq(1, 2, 4).map { n =>
      base.repartition(n)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(Det.dec4($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("s"))
        .orderBy("l_returnflag", "l_linestatus")
        .collect().toSeq
    }
    assert(results(0) == results(1) && results(1) == results(2))
  }

  test("a17 regression moments are partitioning-invariant (rule D2 on closed forms)") {
    // The regression's six moments are exact decimals/longs, so slope/
    // intercept/r2 must be BIT-identical under any input partitioning —
    // the property the native regr_* aggregates lack.
    val shufP = spark.conf.get("spark.sql.shuffle.partitions")
    val results = Seq("1", "4").map { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try ops.Aggs.a17(spark, sf001).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", shufP)
    }
    assert(results(0) == results(1))
  }

  test("w2 top-k: at most 3 per brand, ranks contiguous from 1") {
    val rows = Windows.w2(spark, sf001).collect()
    val byBrand = rows.groupBy(_.getString(0))
    byBrand.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("running window final value equals group total (w3)") {
    val w3 = Windows.w3(spark, sf001)
    val finals = w3.groupBy("o_custkey").agg(
      max("running_cnt").as("final_cnt"), count(lit(1)).as("n"))
    assert(finals.filter($"final_cnt" =!= $"n").count() === 0)
  }

  test("exact dedup is idempotent (l1)") {
    val l1 = Llm.l1(spark, sf001)
    assert(l1.select("text_hash").distinct().count() === l1.count())
    assert(l1.select("survivor_id").distinct().count() === l1.count())
  }

  test("generator row count: sum of per-order sequence lengths (u3)") {
    val expected = Tables.orders(spark, sf001)
      .select(sum(($"o_orderkey" % 3) + 1)).as[Long].head()
    assert(Udfs.u3(spark, sf001).count() === expected)
  }

  test("determinism double-run: riskiest queries byte-equal across runs") {
    Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "l3" -> Llm.l3, "w1" -> Windows.w1, "s3" -> ops.Events.s3,
      // the round-robin-repartitioned pair ops: intra-partition order is
      // nondeterministic, so these prove the final total order masks it
      "x1" -> Pipeline.x1, "x4" -> Pipeline.x4, "x10" -> Pipeline.x10,
      "l2" -> Llm.l2, "j9" -> Joins.j9,
      // round-3 ranked/iterative additions
      "l6" -> Llm.l6, "x11" -> Pipeline.x11, "r5" -> Rdf.r5,
      // round-5 ranked/joined additions
      "l7" -> Llm.l7, "x14" -> Pipeline.x14, "s6" -> ops.Events.s6,
      // round-6 iterative/bucketed/ranked additions
      "x20" -> Pipeline.x20, "x21" -> Pipeline.x21,
      "l8" -> Llm.l8, "x22" -> Pipeline.x22, "a17" -> Aggs.a17,
      "x23" -> Pipeline.x23,
      // round-7 trained-codebook addition (iterative Lloyd + pair join)
      "x21_learned" -> Pipeline.x21Learned,
      // round-7 iterative / sampled-partitioning additions: r7 rebuilds a
      // localCheckpoint chain per run; x27's cell assignment comes from a
      // SAMPLED range partitioner, so the double-run proves the emitted
      // cum is boundary-invariant run-to-run, not just width-to-width
      "r7" -> Rdf.r7, "x27" -> Pipeline.x27,
      // round-8 iterative/survivor-indexed additions: r8 threads three
      // driver-side dangling scalars between rounds; x29/x32 hang on the
      // min(struct) survivor index; x21's assign window tie-break covers
      // the scaled-k path too
      "r8" -> Rdf.r7Redistributed, "x29" -> Pipeline.x29,
      "x32" -> Pipeline.x32
    ).foreach { case (name, q) =>
      val a = q(spark, sf001).collect().toSeq
      val b = q(spark, sf001).collect().toSeq
      assert(a == b, s"query $name differed between runs")
    }
  }

  test("LSH candidates are a superset of high-jaccard pairs it reports (x1 ⊆ l2 family)") {
    // every x1 pair has jaccard >= 0.7 by construction
    val bad = Pipeline.x1(spark, sf001).filter($"jaccard" < 0.7).count()
    assert(bad === 0)
  }

  test("salted join is result-identical to the plain join (skew helper)") {
    val plain = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .select("o_orderkey", "c_custkey", "c_name")
    val salted = ops.Skew.saltedJoin(
      Tables.orders(spark, sf001), Tables.customer(spark, sf001),
      "o_custkey", "c_custkey", $"o_orderkey", 8)
      .select("o_orderkey", "c_custkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("SetSim plan construction triggers zero Spark jobs") {
    // Round 1 ran dict.count() inside tokenSets — an eager job on every
    // query construction. Representation choice now lives inside the plan.
    // (Table loading itself may run a parquet schema-inference job, which is
    // Spark's own read path — measured over in-memory frames to isolate
    // SetSim.)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val toks = Seq((1L, "en", Array("a", "b")), (2L, "en", Array("a", "c")))
      .toDF("doc_id", "lang", "toks")
    spark.sparkContext.addSparkListener(listener)
    try {
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      jobs.set(0)
      SetSim.pairs(SetSim.tokenSets(toks), blocks = 8)
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      assert(jobs.get() === 0, "SetSim construction must not launch Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("SetSim.pairs bucket fuse: oversized bucket fails loudly, legal sizes unchanged") {
    // r10-verdict item 5: the exact O(bucket²) path needs a misuse guard —
    // a corpus-wide caller must get a LOUD error naming the sublinear
    // operators, not a silently quadratic job.
    val toks = (1 to 40).map(i => (i.toLong, "en", s"t$i u$i"))
      .toDF("doc_id", "lang", "text")
      .select($"doc_id", $"lang", array_distinct(split($"text", " ")).as("toks"))
    val enc = SetSim.tokenSets(toks)
    // negative control: a cap below the bucket size trips the fuse
    val err = intercept[Exception] {
      SetSim.pairs(enc, blocks = 4, maxBucket = 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(m => m.contains("exact pairwise bucket")
      && m.contains("MinHash")), s"fuse error lost its pointer: $err")
    // the declared default passes the fixture untouched: same pair set
    // with and without an effectively-infinite cap
    val guarded = SetSim.pairs(enc, blocks = 4).select("a_id", "b_id")
      .collect().map(_.toString).sorted.toSeq
    val open = SetSim.pairs(enc, blocks = 4, maxBucket = Long.MaxValue)
      .select("a_id", "b_id").collect().map(_.toString).sorted.toSeq
    assert(guarded === open)
    // plan-shape assertion (round-11 ADVICE item 2): the fuse must SURVIVE
    // optimization — if a rewrite ever folds the assert_true/raise_error
    // subtree out of the executed plan, the guard is silently gone even
    // though results stay correct. Both join edges now derive from the
    // guarded frame, and the optimized plan must still carry the error.
    val optimized = SetSim.pairs(enc, blocks = 4)
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("raise_error") || optimized.contains("assert_true"),
      "bucket-fuse assert subtree was optimized out of the executed plan")
  }

  test("SetSim encodes identically through mask and hashed-id paths") {
    // Same tiny corpus, two vocab sizes: ≤63 (bitmask) and >63 (xxhash64
    // arrays) must produce identical (inter, uni) pairs.
    def corpus(extra: Int) = {
      val docs = Seq(
        (1L, "en", "a b c d"), (2L, "en", "a b c e"), (3L, "en", "x y z w")
      ) ++ (0 until extra).map(i => (100L + i, "en", s"pad$i filler$i"))
      docs.toDF("doc_id", "lang", "text")
        .select($"doc_id", $"lang", array_distinct(split($"text", " ")).as("toks"))
    }
    def pairsOf(extra: Int) =
      SetSim.pairs(SetSim.tokenSets(corpus(extra)), blocks = 4)
        .filter($"a_id" < 100 && $"b_id" < 100)
        .select("a_id", "b_id", "inter", "uni")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
    val small = pairsOf(0)   // vocab = 10 → bitmask path
    val large = pairsOf(40)  // vocab = 90 → hashed-id path
    assert(small.nonEmpty)
    assert(small == large)
  }

  test("salted join keeps rows whose salt-source column is NULL") {
    // Regression: pmod(null, s) is null and null === null never matches, so a
    // nullable salt source silently dropped fact rows before the hash/coalesce
    // derivation.
    val fact = Seq((1L, Option(10L)), (2L, Option.empty[Long]), (3L, Option(30L)))
      .toDF("fk", "src")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("dk", "name")
    val out = ops.Skew.saltedJoin(fact, dim, "fk", "dk", $"src", 4)
    assert(out.count() === 3, "NULL-salt row must survive the salted join")
  }

  test("anti-join result disjoint from semi-join result (j6 vs 1995 buyers)") {
    val anti = Joins.j6(spark, sf001).select($"c_custkey")
    val buyers95 = Tables.customer(spark, sf001)
      .join(Tables.orders(spark, sf001).filter(year($"o_orderdate") === 1995),
        $"c_custkey" === $"o_custkey", "left_semi").select($"c_custkey")
    assert(anti.intersect(buyers95).count() === 0)
    assert(anti.count() + buyers95.count() === Tables.customer(spark, sf001).count())
  }

  test("cosine top-k self-consistency: sims within [-1,1], ranks 1..5 (l3)") {
    val rows = Llm.l3(spark, sf001).collect()
    assert(rows.length === 50)
    rows.foreach { r: Row =>
      assert(math.abs(r.getDouble(3)) <= 1.0001)
    }
  }

  test("a12 moments match Spark's native corr/stddev to float tolerance") {
    // The exact-decimal moment formulation must agree with the (order-
    // dependent) native double aggregates within double noise.
    val ours = ops.Aggs.a12(spark, sf001)
      .select($"l_returnflag", $"corr_qty_price", $"stddev_qty", $"stddev_price")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val native = Tables.lineitem(spark, sf001)
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"),
        stddev_samp($"l_quantity").as("sx"),
        stddev_samp($"l_extendedprice").as("sy"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours.keySet === native.keySet)
    ours.foreach { case (k, (c, sx, sy)) =>
      assert(math.abs(c - native(k)._1) < 1e-3, s"corr($k)")
      assert(math.abs(sx - native(k)._2) < 1e-2, s"stddev_qty($k)")
      assert(math.abs(sy - native(k)._3) < 1.0, s"stddev_price($k)")
    }
  }

  test("j12 lateral top-n equals the hand-written window formulation") {
    val lateral = Joins.j12(spark, sf001).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    val manual = Tables.customer(spark, sf001)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .join(Tables.nation(spark, sf001), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"c_acctbal")
      .orderBy("n_name", "c_custkey").collect().toSeq
    assert(lateral == manual)
    assert(lateral.nonEmpty)
  }

  test("a17 regression matches Spark's native regr_slope/intercept to float tolerance") {
    val ours = ops.Aggs.a17(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val x = datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
      .cast("double")
    val native = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(regr_slope($"o_totalprice", x).as("sl"),
        regr_intercept($"o_totalprice", x).as("ic"),
        regr_r2($"o_totalprice", x).as("r2"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours.keySet === native.keySet)
    ours.foreach { case (k, (sl, ic, r2)) =>
      assert(math.abs(sl - native(k)._1) < 1e-2, s"slope($k): $sl vs ${native(k)._1}")
      assert(math.abs(ic - native(k)._2) < 1e2 * math.max(1.0, math.abs(ic) * 1e-4),
        s"intercept($k): $ic vs ${native(k)._2}")
      assert(math.abs(r2 - native(k)._3) < 1e-3, s"r2($k)")
    }
  }

  test("a13 unpivot: long form sums back to the wide counts") {
    val long = ops.Aggs.a13(spark, sf001)
    assert(long.select($"status").distinct().collect().map(_.getString(0)).sorted
      === Array("F", "O", "P"))
    val total = long.agg(sum($"cnt")).as[Long].head()
    assert(total === Tables.orders(spark, sf001).count())
  }

  test("l6 BM25: rare term dominates, scores non-increasing, top-10 only") {
    val rows = Llm.l6(spark, sf001).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // 'dup' is the only selective term (df≈5%): every top doc must contain it
    assert(rows.forall(_.getAs[Int]("tf_dup") > 0))
  }

  test("w7 value picks: first <= all prices' date-order, nth null iff <2 orders") {
    val rows = Windows.w7(spark, sf001).collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.values.foreach { rs =>
      val firstPrices = rs.map(_.getDouble(4)).distinct
      val lastPrices = rs.map(_.getDouble(5)).distinct
      assert(firstPrices.length === 1 && lastPrices.length === 1,
        "first/last must be constant within a partition")
      if (rs.length < 2) assert(rs.forall(_.isNullAt(6)))
      else assert(rs.forall(!_.isNullAt(6)))
    }
  }

  test("s5 funnel: converted implies both timestamps present and ordered") {
    val rows = ops.Events.s5(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getInt(4) == 1) {
        assert(!r.isNullAt(1) && !r.isNullAt(2))
        assert(r.getLong(1) <= r.getLong(2))
      }
    }
    val totalEvents = rows.map(_.getLong(3)).sum
    assert(totalEvents === Tables.events(spark, sf001).count())
  }

  test("r5 property path: closure = c->n + c->r + n->r with shortest depths") {
    val rows = ops.Rdf.r5(spark, sf001).collect()
    val nCust = Tables.customer(spark, sf001).count()
    val nNat = Tables.nation(spark, sf001).count()
    assert(rows.length === 2 * nCust + nNat)
    val byDepth = rows.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(byDepth(1) === nCust + nNat) // direct edges
    assert(byDepth(2) === nCust)        // customer -> region, 2 hops
    assert(!byDepth.contains(3) && !byDepth.contains(4)) // DAG ends at region
  }

  test("x12 split: covers all docs, fractions near 75/12.5/12.5, stable") {
    val out = Pipeline.x12(spark, sf001).collect()
    val byS = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val total = byS.values.sum
    assert(total === Tables.documents(spark, sf001).count())
    val trainFrac = byS("train").toDouble / total
    assert(trainFrac > 0.55 && trainFrac < 0.9, s"train frac $trainFrac")
    // determinism: identical under a different partitioning
    val again = Pipeline.x12(spark, sf001).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("x11 IVF ANN: <=3 ranked candidates per query from probed cells only") {
    val rows = Pipeline.x11(spark, sf001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to rs.length))
    }
    // IVF recall vs the exact scan: at sf0.001 (20 vecs, 16 cells) the probed
    // cells must recover at least half of the true top-3 slots.
    val exact = Llm.l3(spark, sf001).filter($"rnk" <= 3)
      .select($"q_id", $"c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    assert(got.intersect(exact).size * 2 >= exact.size,
      s"IVF recalled ${got.intersect(exact).size}/${exact.size} exact slots")
  }

  test("a14 pivot: wide cells sum back to a1's long-form totals") {
    val wide = Aggs.a14(spark, sf001).collect()
    val long = Aggs.a1(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("sum_qty"), r.getAs[Long]("count_order"))).toMap
    wide.foreach { r =>
      val rf = r.getString(0)
      Seq("F", "O").foreach { ls =>
        val qty = Option(r.getAs[java.lang.Double](s"${ls}_qty")).map(_.toDouble)
        val cnt = r.getAs[Long](s"${ls}_cnt")
        long.get((rf, ls)) match {
          case Some((q, c)) => assert(qty.contains(q) && cnt == c, s"cell ($rf,$ls)")
          case None         => assert(qty.isEmpty && cnt == 0L, s"empty cell ($rf,$ls)")
        }
      }
    }
  }

  test("a15 histogram: buckets within range, counts sum to table size") {
    val h = Aggs.a15(spark, sf001).collect()
    assert(h.forall { r => val b = r.getAs[Long]("bucket"); b >= 0 && b <= 9 })
    assert(h.map(_.getAs[Long]("order_cnt")).sum ===
      Tables.orders(spark, sf001).count())
    h.foreach(r => assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price")))
  }

  test("s6 retention: offsets non-negative, day-0 cell counts every cohort user") {
    val rows = ops.Events.s6(spark, sf001).collect()
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0))
    // Σ over cohorts of day-0 active_users = number of distinct users: every
    // user is active in their own first-day cell, and cohorts partition users.
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(_.getAs[Long]("active_users")).sum
    val users = Tables.events(spark, sf001).select($"user_id").distinct().count()
    assert(day0 === users)
  }

  test("r6 degree distribution: object counts account for every nation and region") {
    val rows = Rdf.r6(spark, sf001).collect()
    val byP = rows.groupBy(_.getString(0))
    // every degree row counts objects; totals = distinct referenced objects
    val nObjNation = byP("nationkey").map(_.getAs[Long]("n_objects")).sum
    val refNations = Tables.customer(spark, sf001).select($"c_nationkey").distinct().count()
    assert(nObjNation === refNations)
    // weighted degree sum = total triples (customers / nations)
    val wNation = byP("nationkey").map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_objects")).sum
    assert(wNation === Tables.customer(spark, sf001).count())
    val wRegion = byP("regionkey").map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_objects")).sum
    assert(wRegion === Tables.nation(spark, sf001).count())
  }

  test("l7 tfidf: scores positive and non-increasing, corpus-wide terms excluded") {
    val rows = Llm.l7(spark, sf001).collect()
    assert(rows.length <= 100)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a term present in every document has idf = ln(1) = 0 → can never rank
    assert(scores.forall(_ > 0))
  }

  test("x14 contamination: rates in [0,1], only test-split docs appear") {
    val rows = Pipeline.x14(spark, sf001).collect()
    rows.foreach { r =>
      val rate = r.getAs[Double]("contamination_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_shingles"))
    }
    val md5TestDocs = Tables.documents(spark, sf001)
      .filter(substring(md5($"doc_id".cast("string").cast("binary")), 1, 1).isin("e", "f"))
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.subsetOf(md5TestDocs))
  }

  test("x15 source diversity: distinct vocabulary bounded by token volume") {
    val rows = Pipeline.x15(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("total_tokens"))
      val ttr = r.getAs[Double]("type_token_ratio")
      assert(ttr > 0.0 && ttr <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("doc_cnt")).sum ===
      Tables.documents(spark, sf001).count())
  }

  test("x17 cross-source matrix: pair counts conserve x1's pair graph") {
    val matrix = Pipeline.x17(spark, sf001).collect()
    // every x1 pair lands in exactly one normalized source-pair cell
    assert(matrix.map(_.getAs[Long]("pair_cnt")).sum ===
      Pipeline.x1(spark, sf001).count())
    matrix.foreach { r =>
      assert(r.getAs[String]("src1") <= r.getAs[String]("src2"),
        "matrix must be least/greatest-normalized (upper-triangular)")
      assert(r.getAs[Long]("pair_cnt") > 0)
    }
  }

  test("x16 repetition: ratio consistent with distinct/total trigram counts") {
    val rows = Pipeline.x16(spark, sf001).collect()
    rows.foreach { r =>
      val n = r.getAs[Int]("n_trigrams"); val dct = r.getAs[Int]("n_distinct")
      assert(dct >= 1 && dct <= n)
      val expect = BigDecimal(1.0 - dct.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rep_ratio") - expect) < 1e-9)
    }
    // every doc with >= 3 tokens appears
    val eligible = Tables.documents(spark, sf001)
      .filter(size(split($"text", " ")) >= 3).count()
    assert(rows.length.toLong === eligible)
  }

  test("a16 listagg: CSV element count equals n_nations, elements sorted") {
    val rows = Aggs.a16(spark, sf001).collect()
    assert(rows.map(_.getAs[Long]("n_nations")).sum ===
      Tables.nation(spark, sf001).count())
    rows.foreach { r =>
      val parts = r.getAs[String]("nations_csv").split(",").toSeq
      assert(parts.length.toLong === r.getAs[Long]("n_nations"))
      assert(parts === parts.sorted, "listagg elements must be sorted")
    }
  }

  test("s7 rolling active: wau >= dau, wau bounded by user count") {
    val rows = ops.Events.s7(spark, sf001).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf001).select($"user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"),
        "a 7-day window is a superset of its last day")
      assert(r.getAs[Long]("wau") <= users)
    }
  }

  test("x20 hook+shortcut labels equal DedupCluster's fixpoint (sf0.001 AND sf0.1)") {
    // Round-6's linear 8-hop propagation provably diverged at sf0.1
    // (measured max distance-to-min 11 > 8); the pointer-doubling rounds
    // must reach the TRUE component min at every fixture SF, so assert
    // equality with the verified-convergent fixpoint path at the smallest
    // AND the largest SF (the one the old bound failed at).
    Seq(sf001, sf1).foreach { sf =>
      val bounded = Pipeline.x20(spark, sf)
        .select($"doc_id", $"cluster").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fixpoint = ops.DedupCluster.components(
        Pipeline.x10(spark, sf).select($"a_id", $"b_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fixpoint.nonEmpty, "fixture must contain near-dup pairs")
      fixpoint.foreach { case (id, lbl) =>
        assert(bounded(id) === lbl, s"$sf doc $id: x20 ${bounded(id)} != fixpoint $lbl")
      }
      // docs in no pair are their own singleton cluster
      val paired = fixpoint.keySet
      bounded.foreach { case (id, lbl) =>
        if (!paired.contains(id)) assert(lbl === id, s"$sf singleton $id")
      }
    }
  }

  test("s8 transitions: per-prev probabilities sum to 1, counts conserve successor pairs") {
    val rows = ops.Events.s8(spark, sf001).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getAs[String]("prev_type"))
    byPrev.values.foreach { rs =>
      val pSum = rs.map(_.getAs[Double]("prob")).sum
      assert(math.abs(pSum - 1.0) < 1e-2, s"probabilities sum to $pSum")
    }
    // successor pairs = events - one first-event per user
    val events = Tables.events(spark, sf001).count()
    val users = Tables.events(spark, sf001).select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("cnt")).sum === events - users)
  }

  test("l8 PMI: bounded top-50, scores non-increasing, counts >= 5") {
    val rows = Llm.l8(spark, sf001).collect()
    assert(rows.length <= 50)
    assert(rows.nonEmpty)
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Long]("c12") >= 5))
  }

  test("x22 manifest equals composing l1 survivors + x18 gate + x19 sample + x12 split") {
    val manifest = Pipeline.x22(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"))).toMap
    // recompose from the individual declared stages
    val survivors = Llm.l1(spark, sf001).select($"survivor_id".as("doc_id"))
    val gated = Pipeline.x18(spark, sf001).filter($"keep" === 1)
      .select($"doc_id", $"wc")
    val srcNum = regexp_extract($"source", "([0-9]+)$", 1).cast("int")
    val thr = when(srcNum < 5, lit("zz")).when(srcNum < 10, lit("80"))
      .otherwise(lit("40"))
    val sampled = Tables.documents(spark, sf001)
      .filter(substring(md5($"doc_id".cast("string").cast("binary")), 1, 2) < thr)
      .select($"doc_id", $"lang")
    val h = substring(md5($"doc_id".cast("string").cast("binary")), 1, 1)
    val split = Tables.documents(spark, sf001).select($"doc_id",
      when(h.isin("c", "d"), "val").when(h.isin("e", "f"), "test")
        .otherwise("train").as("split"))
    val composed = survivors.join(gated, "doc_id").join(sampled, "doc_id")
      .join(split, "doc_id")
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("kept_docs"), sum($"wc").as("kept_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"))).toMap
    assert(manifest === composed)
    assert(manifest.nonEmpty)
  }

  test("x23 containment: directional, above threshold, superset of symmetric full matches") {
    val rows = Pipeline.x23(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("contained_id") !== r.getAs[Long]("container_id"))
      assert(r.getAs[Double]("containment") >= 0.8)
      assert(r.getAs[Double]("containment") <= 1.0)
    }
    // asymmetry sanity: every x3 pair with jaccard = 1.0 (identical shingle
    // sets) must appear in BOTH directions here
    val full = Pipeline.x3(spark, sf001).filter($"jaccard" === 1.0)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dirs = rows.map(r =>
      (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"))).toSet
    full.foreach { case (a, b) =>
      assert(dirs.contains((a, b)) && dirs.contains((b, a)),
        s"identical-set pair ($a,$b) must be mutually contained")
    }
  }

  test("x23 on literal docs: a strict shingle-subset doc is contained at 1.0, not vice versa") {
    // doc 1's trigram set is a strict subset of doc 2's; doc 3 is disjoint.
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta", "s", 0L),
      (2L, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s", 0L),
      (3L, "en", "one two three four five six", "s", 0L)
    ).toDF("doc_id", "lang", "text", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-x23-").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val rows = Pipeline.x23(spark, dir).collect()
      .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id")) ->
        r.getAs[Double]("containment")).toMap
    assert(rows.get((1L, 2L)).contains(1.0), "subset doc must be contained at 1.0")
    assert(!rows.contains((2L, 1L)),
      "the superset doc is NOT contained in the subset doc (asymmetry)")
    assert(!rows.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("x21 semdedup: pairs share a cell, sims above threshold, a < b") {
    val rows = Pipeline.x21(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("sim") >= 0.35)
    }
    // cluster-scoped by construction: every reported pair's members must be
    // assigned to the emitted cell — cross-checked against x11's assignment
    // (same identity codebook, same rounded-cosine argmax).
    val e = Tables.embeddings(spark, sf001)
      .withColumn("emb", $"embedding".cast("array<double>"))
      .withColumn("nrm", sqrt(graft.functions.DotProduct.dot($"emb", $"emb")))
      .select($"vec_id", $"emb", $"nrm")
    val cent = e.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"emb".as("cent_emb"), $"nrm".as("cent_nrm"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy($"csim".desc, $"cent_id")
    val cellOf = e.crossJoin(broadcast(cent))
      .withColumn("csim", Det.round4nz(
        graft.functions.DotProduct.dot($"emb", $"cent_emb") / ($"nrm" * $"cent_nrm")))
      .withColumn("crn", row_number().over(wA))
      .filter($"crn" === 1)
      .select($"vec_id", $"cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cell = r.getAs[Long]("cell")
      assert(cellOf(r.getAs[Long]("a_id")) === cell)
      assert(cellOf(r.getAs[Long]("b_id")) === cell)
    }
  }

  test("x24 repeated spans: every fixture doc matches a brute-force recomputation") {
    val rows = Pipeline.x24(spark, sf001).collect()
    // Oracle-independent ground truth: recompute coverage per doc with
    // plain in-memory collections (500 docs at sf0.001 — cheap), no Spark
    // machinery shared with the operator beyond the raw text.
    val docs = Tables.documents(spark, sf001).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val owners = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    for ((id, w) <- docs; i <- 0 to w.length - 5)
      owners.getOrElseUpdate(w.slice(i, i + 5).mkString(" "),
        scala.collection.mutable.Set[Long]()) += id
    val expect = docs.map { case (id, w) =>
      val cov = scala.collection.mutable.Set[Int]()
      for (i <- 0 to w.length - 5)
        if (owners(w.slice(i, i + 5).mkString(" ")).size >= 2) cov ++= (i to i + 4)
      id -> ((w.length.toLong, cov.size.toLong))
    }.toMap
    assert(rows.length === docs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, c) = expect(id)
      assert(r.getAs[Long]("n_tokens") === n)
      assert(r.getAs[Long]("n_covered") === c, s"doc $id covered-count mismatch")
      val e = BigDecimal(c.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("coverage") - e) < 1e-9)
    }
    assert(rows.exists(r => r.getAs[Long]("n_covered") > 0),
      "fixture should contain at least one cross-doc repeated span")
  }

  test("x25 keep list: exactly one keep per cluster, and it is the quality/doc_id argmax") {
    val rows = Pipeline.x25(spark, sf001).collect()
    val clusters = Pipeline.x20(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    val quality = Pipeline.x6(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    assert(rows.length === clusters.size)
    // cluster and quality columns must agree with the source operators
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("cluster") === clusters(id))
      assert(r.getAs[Double]("quality") === quality(id))
    }
    // per cluster: exactly one keep, and it is the (max quality, min doc_id) member
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (cl, members) =>
      val keeps = members.filter(_.getAs[Int]("keep") === 1)
      assert(keeps.length === 1, s"cluster $cl must keep exactly one doc")
      val expected = members.minBy(r =>
        (-r.getAs[Double]("quality"), r.getAs[Long]("doc_id")))
      assert(keeps.head.getAs[Long]("doc_id") === expected.getAs[Long]("doc_id"),
        s"cluster $cl kept the wrong canonical doc")
    }
    // the fixture has real multi-doc clusters, so some docs are dropped
    assert(rows.exists(_.getAs[Int]("keep") === 0),
      "fixture should contain at least one dropped near-dup")
  }

  test("x24 on literal docs: shared 5-gram covers exactly its positions on both sides") {
    val docs = Seq(
      (1L, "a b c d e f", "en", "s", 0L),
      (2L, "x y z a b c d e q r", "en", "s", 0L),
      (3L, "one two three", "en", "s", 0L),
      (4L, "p q r s t u", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-x24-").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.x24(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_covered"), r.getAs[Double]("coverage"))).toMap
    // docs 1/2 share only "a b c d e": 5 positions of 6 resp. 10 tokens
    assert(m(1L) === ((5L, 0.8333)))
    assert(m(2L) === ((5L, 0.5)))
    assert(m(3L) === ((0L, 0.0))) // < 5 tokens: no grams at all
    assert(m(4L) === ((0L, 0.0))) // no cross-doc gram
  }

  test("x32 chunk rewrite: duplicate chunks removed, survivor order preserved") {
    // 12-token docs → chunks of 10 + tail; doc 1 owns both its chunks;
    // doc 2 repeats doc 1's first 10 tokens exactly (loses that chunk) but
    // keeps its distinct tail; doc 3 is doc 1 verbatim (fully deduped
    // except nothing: doc 3's chunks are doc 1's chunks → all lost)
    import org.apache.spark.sql.functions.col
    val base = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$base t1 t2", "en", "s", 0L),
      (2L, s"$base u1 u2", "en", "s", 0L),
      (3L, s"$base t1 t2", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-x32-").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.x32(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("kept_chunks"),
          r.getAs[String]("clean_text"))).toMap
    assert(m(1L) === ((2L, 2L, s"$base t1 t2")))   // canonical: all kept
    assert(m(2L) === ((2L, 1L, "u1 u2")))          // shared head removed
    assert(m(3L) === ((2L, 0L, "")))               // verbatim dup → empty
    // x29's kept counts agree with the rewrite's
    val d29 = Pipeline.x29(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kept_chunks")).toMap
    assert(d29 === m.view.mapValues(_._2).toMap)
  }

  test("x34 winnow: shared long run guarantees a shared fingerprint; disjoint docs share none") {
    import org.apache.spark.sql.functions.col
    // winnowing guarantee: any shared token run of length >= w + k - 1
    // (= 4 + 5 - 1 = 8) must produce >= 1 shared fingerprint
    val run = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $run a4 a5", "en", "s", 0L),   // shares `run` with 2
      (2L, s"b1 b2 $run b3 b4 b5", "en", "s", 0L),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "en", "s", 0L), // disjoint
      (4L, "d1 d2 d3", "en", "s", 0L)                 // < 5 tokens: no grams
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-x34-").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val m = Pipeline.x34(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_fp"),
          r.getAs[Long]("shared_fp"))).toMap
    assert(m(1L)._3 >= 1L, "docs 1/2 share an 8-token run -> shared fp")
    assert(m(2L)._3 >= 1L)
    assert(m(3L)._3 === 0L, "disjoint doc must share nothing")
    assert(m(4L) === ((0L, 0L, 0L)), "sub-k doc: no grams, no fingerprints")
    // density bound: winnowing selects at most one fp per window
    m.values.foreach { case (_, nFp, _) => assert(nFp >= 0L) }
    assert(m(3L)._2 >= 1L && m(3L)._2 <= 6L) // 10 tokens -> 6 grams, 3 windows
  }

  test("r7 pagerank: matches an in-memory scaled-integer iteration exactly") {
    val rows = Rdf.r7(spark, sf001).collect()
    // ground truth: same edge construction, plain Scala Long math
    def s(v: Any): String = String.valueOf(v)
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey").collect()
    val edges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    li.foreach { r =>
      val src = s"l:${s(r.get(0))}:${s(r.get(1))}"
      edges += ((src, s"o:${s(r.get(0))}"))
      edges += ((src, s"p:${s(r.get(2))}"))
      edges += ((src, s"s:${s(r.get(3))}"))
    }
    Tables.orders(spark, sf001).select($"o_orderkey", $"o_custkey").collect()
      .foreach(r => edges += ((s"o:${s(r.get(0))}", s"c:${s(r.get(1))}")))
    Tables.customer(spark, sf001).select($"c_custkey", $"c_nationkey").collect()
      .foreach(r => edges += ((s"c:${s(r.get(0))}", s"n:${s(r.get(1))}")))
    Tables.supplier(spark, sf001).select($"s_suppkey", $"s_nationkey").collect()
      .foreach(r => edges += ((s"s:${s(r.get(0))}", s"n:${s(r.get(1))}")))
    Tables.nation(spark, sf001).select($"n_nationkey", $"n_regionkey").collect()
      .foreach(r => edges += ((s"n:${s(r.get(0))}", s"r:${s(r.get(1))}")))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = nodes.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to Rdf.PageRankIters) {
      val sums = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) => sums(dst) += pr(src) / deg(src) }
      pr = nodes.map(n => n -> (150000000000L + sums(n) * 17L / 20L)).toMap
    }
    val expect = pr.toSeq.sortBy { case (n, r) => (-r, n) }.take(25)
    assert(rows.length === 25)
    rows.zip(expect).foreach { case (row, (n, r)) =>
      assert(row.getAs[String]("node") === n)
      assert(row.getAs[Long]("rank") === r)
    }
    // hubs must outrank leaves: the top node is an aggregator, not a lineitem
    assert(!rows.head.getAs[String]("node").startsWith("l:"))
  }

  test("r7Redistributed: dangling mass fed back, matches in-memory reference") {
    val rows = Rdf.r7Redistributed(spark, sf001).collect()
    def s(v: Any): String = String.valueOf(v)
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey").collect()
    val edges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    li.foreach { r =>
      val src = s"l:${s(r.get(0))}:${s(r.get(1))}"
      edges += ((src, s"o:${s(r.get(0))}"))
      edges += ((src, s"p:${s(r.get(2))}"))
      edges += ((src, s"s:${s(r.get(3))}"))
    }
    Tables.orders(spark, sf001).select($"o_orderkey", $"o_custkey").collect()
      .foreach(r => edges += ((s"o:${s(r.get(0))}", s"c:${s(r.get(1))}")))
    Tables.customer(spark, sf001).select($"c_custkey", $"c_nationkey").collect()
      .foreach(r => edges += ((s"c:${s(r.get(0))}", s"n:${s(r.get(1))}")))
    Tables.supplier(spark, sf001).select($"s_suppkey", $"s_nationkey").collect()
      .foreach(r => edges += ((s"s:${s(r.get(0))}", s"n:${s(r.get(1))}")))
    Tables.nation(spark, sf001).select($"n_nationkey", $"n_regionkey").collect()
      .foreach(r => edges += ((s"n:${s(r.get(0))}", s"r:${s(r.get(1))}")))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSet
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val dangling = nodes.filterNot(deg.contains)
    assert(dangling.nonEmpty && dangling.forall(n =>
      n.startsWith("p:") || n.startsWith("r:"))) // parts + regions only
    var pr = nodes.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to Rdf.PageRankIters) {
      val share = dangling.iterator.map(pr).sum / nodes.size
      val sums = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      edges.foreach { case (src, dst) => sums(dst) += pr(src) / deg(src) }
      pr = nodes.map(n => n -> (150000000000L + (sums(n) + share) * 17L / 20L)).toMap
    }
    val expect = pr.toSeq.sortBy { case (n, r) => (-r, n) }.take(25)
    assert(rows.length === 25)
    rows.zip(expect).foreach { case (row, (n, r)) =>
      assert(row.getAs[String]("node") === n)
      assert(row.getAs[Long]("rank") === r)
    }
    // redistribution strictly raises the total recirculating mass vs r7's
    // drop semantics: the top rank must not fall below the declared r7's
    val dropTop = Rdf.r7(spark, sf001).collect().head.getAs[Long]("rank")
    assert(rows.head.getAs[Long]("rank") >= dropTop)
  }

  test("r7 integer headroom: the *17 damping multiplicand keeps >=10x margin at sf0.1") {
    // r7Step sums contributions as BIGINT (non-ANSI: wraps, not errors) and
    // the oracle sums in HUGEINT — beyond the documented headroom the two
    // sides would diverge silently. This pins the headroom claim with a
    // measured bound: one extra round's per-node contribution sums at the
    // largest fixture must clear the *17 multiply with >=10x margin.
    val ed = Rdf.r7Edges(spark, sf1)
    var pr: Option[org.apache.spark.sql.DataFrame] = None
    for (i <- 1 to Rdf.PageRankIters)
      pr = Some(Rdf.r7Step(ed, pr.map((_, Rdf.defaultRank(i - 1)))))
    val maxSum = ed
      .join(pr.get.withColumnRenamed("dst", "src"), Seq("src"), "left")
      .select($"dst", expr(
        s"COALESCE(pr, CAST(${Rdf.defaultRank(Rdf.PageRankIters)} AS BIGINT))" +
          " DIV d").as("contrib"))
      .groupBy("dst").agg(sum($"contrib").as("s"))
      .agg(max($"s")).head().getLong(0)
    assert(maxSum < Long.MaxValue / 17 / 10)
  }

  test("x26 vocab coverage: matches brute-force counts; cum_share monotone to 1-ish") {
    val rows = Pipeline.x26(spark, sf001).collect()
    val toks = Tables.documents(spark, sf001).select($"text").collect()
      .flatMap(_.getString(0).split(" ", -1))
    val cnt = toks.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val top = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
    assert(rows.length === math.min(50, cnt.size))
    var cum = 0L
    rows.zip(top).zipWithIndex.foreach { case ((row, (t, c)), i) =>
      assert(row.getAs[String]("token") === t)
      assert(row.getAs[Int]("rnk") === i + 1)
      assert(row.getAs[Long]("cnt") === c)
      cum += c
      val e = BigDecimal(cum.toDouble / toks.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getAs[Double]("cum_share") - e) < 1e-9)
    }
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
  }

  test("x27 shard pack: two-phase prefix sum equals the global running sum") {
    val rows = Pipeline.x27(spark, sf001).collect()
    val base = Pipeline.x6(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("wc").toLong,
        r.getAs[Double]("quality")))
    // in-memory global running sum in curriculum order
    var cum = 0L
    val expect = base.sortBy { case (id, _, q) => (-q, id) }.map { case (id, wc, q) =>
      cum += wc
      id -> ((q, wc, cum, (cum - wc) / Pipeline.ShardTokens))
    }.toMap
    assert(rows.length === base.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (q, wc, c, shard) = expect(id)
      assert(r.getAs[Double]("quality") === q)
      assert(r.getAs[Long]("wc") === wc)
      assert(r.getAs[Long]("cum_tokens") === c, s"doc $id cum mismatch")
      assert(r.getAs[Long]("shard") === shard)
    }
    // shards are contiguous 0..max with no holes
    val shards = rows.map(_.getAs[Long]("shard")).distinct.sorted.toSeq
    assert(shards === (0L to shards.max))
  }

  test("x28 mixture weights: shares sum to ~1 and weight inverts the share") {
    val rows = Pipeline.x28(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val bySrc = docs.groupBy(_._1)
    assert(rows.length === bySrc.size)
    val nSrc = bySrc.size.toLong
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val docsN = bySrc(src).length.toLong
      assert(r.getAs[Long]("docs") === docsN)
      assert(r.getAs[Long]("tokens") === bySrc(src).map(_._2).sum)
      val share = BigDecimal(docsN.toDouble / docs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("share") - share) < 1e-9)
      val w = BigDecimal(docs.length.toDouble / (nSrc * docsN))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("weight") - w) < 1e-9)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 0.01)
  }

  test("w8 distributed decile arithmetic equals Spark's own ntile(10)") {
    // the range-partitioned prefix-sum decile must agree with the builtin
    // single-partition window on the same spend frame, bucket for bucket
    val spend = Tables.orders(spark, sf001).groupBy($"o_custkey")
      .agg(sum(Det.dec2($"o_totalprice")).as("spend"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"spend".desc, $"o_custkey")
    val builtin = spend.withColumn("decile", ntile(10).over(w))
      .groupBy("decile").agg(count(lit(1)).as("n_cust"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ours = Windows.w8(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ours === builtin)
  }

  test("a19 interpolation: observed rows exact, gap rows between neighbors") {
    val rows = Aggs.a19(spark, sf001).collect()
    assert(rows.length === 90)
    val vals = rows.map(r => (r.getInt(1), r.getDouble(2)))
    assert(vals.exists(_._1 == 0) && vals.exists(_._1 == 1))
    // every interior gap value lies within [min, max] of the nearest
    // observed neighbors (linear interp never overshoots)
    val obsIdx = vals.zipWithIndex.collect { case ((1, _), i) => i }
    vals.zipWithIndex.foreach { case ((obs, v), i) =>
      if (obs == 0 && i > obsIdx.head && i < obsIdx.last) {
        val p = obsIdx.filter(_ < i).max
        val n = obsIdx.filter(_ > i).min
        val lo = math.min(vals(p)._2, vals(n)._2) - 1e-9
        val hi = math.max(vals(p)._2, vals(n)._2) + 1e-9
        assert(v >= lo && v <= hi, s"gap day $i value $v outside [$lo,$hi]")
      }
    }
  }

  test("j14 fuzzy join: distances in [1,3] and pair symmetry") {
    val rows = Joins.j14(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Int]("min_dist")
      assert(d >= 1 && d <= 3)
    }
    // each unordered pair contributes to BOTH endpoints' n_sim → even sum
    assert(rows.map(_.getAs[Long]("n_sim")).sum % 2 === 0)
  }

  test("j15 binned interval join equals the naive theta-join") {
    val li = Tables.lineitem(spark, sf001).select(
      $"l_partkey".as("pk"), $"l_orderkey".as("ok"),
      $"l_linenumber".as("ln"), $"l_suppkey".as("sk"),
      datediff($"l_shipdate".cast("date"), lit("1992-01-01").cast("date"))
        .as("st"), $"l_quantity".cast("int").as("q"))
      .withColumn("en", $"st" + $"q")
    val b = li.select($"pk".as("pk2"), $"ok".as("ok2"), $"ln".as("ln2"),
      $"sk".as("sk2"), $"st".as("st2"), $"en".as("en2"))
    val naive = li.join(b, $"pk" === $"pk2"
        && struct($"ok", $"ln") < struct($"ok2", $"ln2"))
      .filter($"st" <= $"en2" && $"st2" <= $"en" && $"sk" =!= $"sk2")
      .groupBy($"pk").agg(count(lit(1)).as("overlap_pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = Joins.j15(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binned === naive)
  }

  test("r9 degree-oriented triangles equal the naive orientation; 3|sum") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val e = li.join(li.select($"ok".as("ok2"), $"p".as("p2")),
        $"ok" === $"ok2" && $"p" < $"p2")
      .select($"p".as("u"), $"p2".as("v")).distinct()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("p"))
      .groupBy("p").agg(count(lit(1)).as("tri_cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ours = Rdf.r9(spark, sf001).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("tri_cnt")).toMap
    assert(ours === naive)
    assert(ours.values.sum % 3 === 0)
  }

  test("r11 BFS distances match a driver-side reference BFS") {
    val edges = Rdf.coEdges(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    val seeds = nodes.filter(_ % 100 == 0)
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (k <- 1 to 4) {
      val next = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist = dist ++ next.map(_ -> k)
      frontier = next
    }
    val ours = Rdf.r11(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ours === dist)
  }

  test("u6 centroid equals brute-force quantized mean per label") {
    val vecs = Tables.embeddings(spark, sf001)
      .select($"label", $"embedding".cast("array<double>")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val expect = vecs.groupBy(_._1).map { case (lbl, vs) =>
      val n = vs.length
      val dims = vs.head._2.length
      val cent = (0 until dims).map { j =>
        val sum = vs.map(v => BigDecimal(v._2(j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        BigDecimal(sum.toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      }
      lbl -> (n.toLong, cent)
    }
    // Long-format declared output (D9: scalar columns only): one row per
    // (label, dim), the Aggregator's array posexploded.
    val rows = Udfs.u6(spark, sf001).collect()
    assert(rows.length === expect.values.map(_._2.length).sum)
    rows.foreach { r =>
      val (n, cent) = expect(r.getInt(0))
      assert(r.getLong(1) === n)
      assert(r.getDouble(3) === cent(r.getInt(2)))
    }
  }

  test("s10: dau = new + returning; cum ends at total distinct users") {
    val rows = Events.s10(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") ===
        r.getAs[Long]("new_users") + r.getAs[Long]("returning"))
    }
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val total = Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(cums.last === total)
  }

  test("w9 interval frame: trailing-7-day sums reconcile per supplier") {
    val rows = Windows.w9(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val bySupp = rows.groupBy(_._1)
    bySupp.foreach { case (_, rs) =>
      val byDay = rs.map(r => r._2 -> r._3).toMap
      rs.foreach { case (_, d, n, n7, _) =>
        val expect = (0 to 7).map(k => byDay.getOrElse(d.minusDays(k), 0L)).sum
        assert(n7 === expect, s"day $d")
        assert(n7 >= n)
      }
    }
  }

  test("x38 incremental dedup hits all three statuses on literal docs") {
    // corpus: ids 0,1 (ids % 5 != 4); batch: ids 4, 9, 14, 19 (% 5 == 4)
    //  - id 4 repeats corpus content  -> dup_of_corpus
    //  - ids 9 and 14 share NEW content -> 9 unique, 14 dup_in_batch
    //  - id 19 is fresh                 -> unique
    val docs = Seq(
      (0L, "alpha beta"), (1L, "gamma"),
      (4L, "Alpha Beta  "), // case/trim-normalizes to corpus content
      (9L, "delta"), (14L, "delta"), (19L, "epsilon")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x38lit").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.x38(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(4L -> "dup_of_corpus", 9L -> "unique",
      14L -> "dup_in_batch", 19L -> "unique"))
    // fixture accounting: statuses partition the batch
    val fix = Pipeline.x38(spark, sf001).collect()
    val batchN = Tables.documents(spark, sf001)
      .filter($"doc_id" % 5 === 4).count()
    assert(fix.length.toLong === batchN)
  }

  test("x57 incremental near-dup hits all three statuses on literal docs") {
    // MinHash sees DISTINCT token sets, so reordering/repeating tokens
    // changes the exact-dedup hash (x38's level) but not the signature —
    // the near-dup level x57 exists to catch.
    // corpus: ids 0, 1; batch: ids 4, 9, 14, 19
    //  - id 4 permutes corpus id 0's tokens  -> dup_of_corpus (partner 0)
    //  - ids 9/14 share a NEW token set      -> 9 unique, 14 dup_in_batch
    //  - id 19 is fresh                      -> unique
    val docs = Seq(
      (0L, "alpha beta gamma", "en"), (1L, "zeta", "en"),
      (4L, "gamma beta alpha", "en"),
      (9L, "delta epsilon", "en"), (14L, "epsilon delta delta", "en"),
      (19L, "omega", "en")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("x57lit").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.x57(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out === Map(
      4L -> ("dup_of_corpus", Some(0L)), 9L -> ("unique", None),
      14L -> ("dup_in_batch", Some(9L)), 19L -> ("unique", None)))
  }

  test("x57 equals a driver-side brute-force recomputation at sf0.001") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sig = docs.map { case (id, lang, text) =>
      val toks = text.split(" ", -1).distinct
      val mh: Seq[String] =
        (0 until 8).map(i => toks.map(t => md5hex(s"$i:$t")).min).toList
      val bands = Seq(md5hex(mh(0) + mh(1)), md5hex(mh(2) + mh(3)),
        md5hex(mh(4) + mh(5)), md5hex(mh(6) + mh(7)))
      (id, lang, mh, bands)
    }
    def agrees(a: Seq[String], b: Seq[String]): Boolean =
      (0 until 8).count(i => a(i) == b(i)) >= 6
    def collides(a: Seq[String], b: Seq[String]): Boolean =
      (0 until 4).exists(i => a(i) == b(i))
    val (batch, corpus) = sig.partition(_._1 % 5 == 4)
    val expected = batch.sortBy(_._1).map { case (id, lang, mh, bands) =>
      def minPartner(pool: Array[(Long, String, Seq[String], Seq[String])]) =
        pool.filter(p => p._2 == lang && collides(bands, p._4) &&
          agrees(mh, p._3)).map(_._1).sorted.headOption
      val cp = minPartner(corpus)
      val bp = minPartner(batch.filter(_._1 < id))
      val status =
        if (cp.isDefined) "dup_of_corpus"
        else if (bp.isDefined) "dup_in_batch" else "unique"
      (id, status, cp.orElse(bp))
    }.toSeq
    val got = Pipeline.x57(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got === expected)
    assert(got.exists(_._2 == "dup_of_corpus") && got.exists(_._2 == "unique"),
      "fixture no longer exercises the corpus-dup and unique classes")
  }

  test("w12 rank-ties top-2 equals driver recomputation; boundary ties kept") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).doubleValue))
    // rank(q) <= 2 ⟺ fewer than 2 strictly-greater quantities in the group
    // (quantities are integer-valued doubles — comparisons exact)
    val expected = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.filter(r => rows.count(o => o._4 > r._4) < 2)
    }.toSet
    val got = ops.Windows.w12(spark, sf001).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).doubleValue)).toSet
    assert(got === expected)
    // the tie-keeping contract: more rows than 2 per supplier on average
    val nSupp = li.map(_._1).distinct.length
    assert(got.size > 2 * nSupp, s"no boundary ties kept: ${got.size} rows")
  }

  test("r17 clustering coefficient equals an in-memory graph recomputation") {
    val edges = Rdf.coEdges(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val expected = adj.toSeq.filter(_._2.size >= 2).map { case (n, nb) =>
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      val dg = nb.size.toLong
      val cc = 2.0 * tri / (dg * (dg - 1))
      (n, dg, tri.toLong,
        BigDecimal(cc).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }.sortBy(_._1)
    val got = Rdf.r17(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ===
      expected.map(t => (t._1, t._2, t._3)))
    // cc compares against round-half-even of the true double (round4nz's
    // contract); allow the one-ulp boundary where the reference disagrees
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 5e-5, s"node ${g._1}: ${g._4} vs ${e._4}")
    }
    // the fixture graph is dense enough that every deg ≥ 2 node closes a
    // triangle, so the tri = 0 left-join path needs a literal graph:
    // orders {1: 10,11} {2: 11,12} → path 10—11—12; node 11 has deg 2,
    // zero triangles → the coalesce emits its cc = 0 row
    val dir = java.nio.file.Files.createTempDirectory("r17lit").toString
    Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val lit = Rdf.r17(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(lit.toSet === Set((11L, 2L, 0L, 0.0)))
  }

  test("x58 prefix-dedup groups equal driver recomputation; catches non-exact dups") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      (md5hex(toks.take(20).mkString(" ")), id,
        md5hex(text.trim.toLowerCase))
    }.groupBy(_._1).filter(_._2.length >= 2).map { case (ph, g) =>
      (g.map(_._2).min, ph, g.length.toLong, g.map(_._3).distinct.length.toLong)
    }.toSet
    val got = ops.Pipeline.x58(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.exists(_._4 > 1L),
      "fixture has no prefix group spanning distinct full texts — " +
        "x58 would be indistinguishable from exact dedup")
  }

  test("s18 churn audit equals driver recomputation on integer ns") {
    val ev = Tables.events(spark, sf001)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val corpusMax = ev.map(_._2).max
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val h = (corpusMax - rows.map(_._2).max) / 3600000000000L
      (u, rows.length.toLong, h, h >= 24)
    }.toSet
    val got = ops.Events.s18(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got === expected)
  }

  test("a25 argmax/conditional aggregate batch equals driver recomputation") {
    val cust = Tables.customer(spark, sf001)
      .select($"c_nationkey", $"c_custkey", $"c_name", $"c_acctbal").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getString(2), r.getAs[Number](3).doubleValue))
    val expected = cust.groupBy(_._1).map { case (n, rows) =>
      def ord(r: (Long, Long, String, Double)): Long =
        BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact * 100000000L + r._2
      (n, rows.length.toLong,
        rows.maxBy(ord)._3, rows.minBy(ord)._3,
        rows.count(_._4 > 0).toLong,
        rows.forall(_._4 > -1000), rows.exists(_._4 > 9000))
    }.toSet
    val got = Aggs.a25(spark, sf001).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .toSet
    assert(got === expected)
  }

  test("f16 edit distances equal a driver-side Levenshtein DP") {
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val tmp = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = tmp
        }
      }
      prev(b.length)
    }
    val parts = Tables.part(spark, sf001)
      .select($"p_partkey", $"p_name", $"p_brand", $"p_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val got = Scalars.f16(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.size === parts.length)
    parts.foreach { case (pk, name, brand, ptyp) =>
      val (bd, ntd, ntc, sim) = got(pk)
      val d = lev(name, ptyp)
      assert(bd === lev(brand, "Brand#00").toLong, s"part $pk brand_dist")
      assert(ntd === d.toLong, s"part $pk name_type_dist")
      assert(ntc === (if (d <= 9) d.toLong else -1L), s"part $pk capped")
      val ref = 1.0 - d.toDouble / math.max(name.length, ptyp.length)
      assert(math.abs(sim - ref) < 5e-5, s"part $pk sim $sim vs $ref")
    }
    assert(got.values.exists(_._3 == -1L) && got.values.exists(_._3 >= 0L),
      "threshold form never/always fired — cap fixture drift")
  }

  test("x59 threshold sweep equals a driver recompute of x1's banded pairs") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val enc = docs.map { case (id, lang, text) =>
      val toks = text.split(" ", -1).distinct
      val mh = (0 until 8).map(i => toks.map(t => md5hex(s"$i:$t")).min)
      val bands = Seq(md5hex(mh(0) + mh(1)), md5hex(mh(2) + mh(3)),
        md5hex(mh(4) + mh(5)), md5hex(mh(6) + mh(7)))
      (id, lang, toks.toSet, bands)
    }
    val expected = (for {
      a <- enc; b <- enc
      if a._1 < b._1 && a._2 == b._2 &&
        (0 until 4).exists(i => a._4(i) == b._4(i))
      inter = (a._3 & b._3).size
      uni = a._3.size + b._3.size - inter
      if inter * 10 >= uni * 7
    } yield (20L * inter) / uni)
      .groupBy(identity).map { case (bkt, xs) =>
        (bkt, bkt.toDouble / 20.0, xs.length.toLong)
      }.toSet
    val got = ops.Pipeline.x59(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === expected)
    // sweep total reconciles with x1's declared verified-pair count
    assert(got.toSeq.map(_._3).sum ===
      ops.Pipeline.x1(spark, sf001).count())
  }

  test("w13 dense-rank top-2 tiers equals driver recomputation") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).doubleValue))
    // dense_rank(q) <= 2 ⟺ fewer than 2 DISTINCT strictly-greater values
    val expected = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val top2 = rows.map(_._4).distinct.sorted(Ordering[Double].reverse).take(2).toSet
      rows.filter(r => top2.contains(r._4))
    }.toSet
    val got = ops.Windows.w13(spark, sf001).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).doubleValue)).toSet
    assert(got === expected)
    // the dense contract: strictly more rows than w12's rank form keeps
    val w12n = ops.Windows.w12(spark, sf001).count()
    assert(got.size >= w12n, s"dense kept ${got.size} < rank's $w12n")
  }

  test("s19 value quantiles equal a driver-side quantile_cont interpolation") {
    val ev = Tables.events(spark, sf001)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    def q(vs: Array[Double], f: Double): Double = {
      val s = vs.sorted
      val pos = f * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val vs = rows.map(_._2)
      (t, rows.length.toLong, q(vs, 0.25), q(vs, 0.5), q(vs, 0.75), q(vs, 0.95))
    }
    val got = ops.Events.s19(spark, sf001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got.size === expected.size)
    expected.foreach { case (t, n, p25, p50, p75, p95) =>
      val g = got(t)
      assert(g._1 === n, s"$t n_events")
      for ((gv, ev2, tag) <- Seq((g._2, p25, "p25"), (g._3, p50, "p50"),
        (g._4, p75, "p75"), (g._5, p95, "p95")))
        assert(math.abs(gv - ev2) < 5e-6, s"$t $tag: $gv vs $ev2")
    }
  }

  test("adaptiveUnit maximizes the PageRank unit under the mass guard") {
    // the executable form of r7MassGuard's remedy (round-11 knee finding:
    // m16's 5,143,128 nodes trip the declared S = 10^12)
    val bound = Long.MaxValue / 4
    for (n <- Seq(1L, 1000L, 860000L, 2305842L, 2305844L, 5143128L,
      51431280L, 2000000000L)) {
      val s = Rdf.adaptiveUnit(n)
      assert(n <= bound / s, s"n=$n: selected unit $s violates the guard")
      assert(s == 1000000000000L || n > bound / (s * 10),
        s"n=$n: unit $s is not maximal — ${s * 10} also fits")
      assert(s >= 10000L)
    }
    // the declared fixture scales keep the declared unit
    assert(Rdf.adaptiveUnit(860000L) === 1000000000000L)
    // the knee corpus that tripped the guard now selects one decade down
    assert(Rdf.adaptiveUnit(5143128L) === 100000000000L)
  }

  test("adaptiveUnit is PLUMBED: r8's adaptive face runs end-to-end") {
    // round-11 verdict item 2: adaptiveUnit existed but r7Redistributed
    // hard-coded S = 10^12, so the knob could not actually be turned.
    // (a) at fixture scale adaptiveUnit returns the declared 10^12, so the
    // adaptive face is BIT-IDENTICAL to the declared r8;
    val declared = Rdf.r7Redistributed(spark, sf001).collect()
    val adaptive = Rdf.r7RedistributedAdaptive(spark, sf001).collect()
    assert(adaptive.map(_.toString).toSeq === declared.map(_.toString).toSeq)
    // (b) a shrunken unit (the >2.3M-node regime, forced here via unitFor)
    // runs green end-to-end and agrees with the declared ranking: same
    // top-25 ordering, ranks equal after unit normalization to ~1e-9
    // relative (each DIV round drops at most 1 ulp of the smaller unit).
    val small = Rdf.r7RedistributedUnit(spark, sf001, _ => 100000000000L)
      .collect()
    assert(small.length === 25)
    small.zip(declared).foreach { case (s10, s12) =>
      assert(s10.getAs[String]("node") === s12.getAs[String]("node"))
      val r10 = s10.getAs[Long]("rank").toDouble * 10
      val r12 = s12.getAs[Long]("rank").toDouble
      assert(math.abs(r10 - r12) / r12 < 1e-6,
        s"${s10.getAs[String]("node")}: $r10 vs $r12")
    }
  }

  test("x37 dataset card accounting: dups reconcile with l1's groups") {
    val r = Pipeline.x37(spark, sf001).collect()(0)
    assert(r.getAs[Long]("n_docs") ===
      r.getAs[Long]("n_distinct") + r.getAs[Long]("dup_docs"))
    // l1 groups by the same hash — its row count IS n_distinct, and its
    // dup_cnt mass is the doc count
    val l1 = Llm.l1(spark, sf001).collect()
    assert(r.getAs[Long]("n_distinct") === l1.length.toLong)
    assert(r.getAs[Long]("n_docs") === l1.map(_.getAs[Long]("dup_cnt")).sum)
  }

  test("a20 weighted median: crossing property against collected data") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_returnflag", Det.dec2($"l_extendedprice").cast("double"),
        $"l_quantity".cast("long")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val rows = Aggs.a20(spark, sf001).collect()
    rows.foreach { r =>
      val flag = r.getString(0); val med = r.getDouble(1)
      val grp = li.filter(_._1 == flag).sortBy(_._2)
      val tot = grp.map(_._3).sum
      assert(r.getLong(2) === tot)
      val below = grp.filter(_._2 < med).map(_._3).sum
      val atOrBelow = grp.filter(_._2 <= med).map(_._3).sum
      // med is the SMALLEST price level whose cumulative weight crosses half
      assert(2 * atOrBelow >= tot, s"$flag: $med does not cross half")
      assert(2 * below < tot, s"$flag: a smaller price already crossed")
    }
  }

  test("kCore capability equals a driver-side reference peel") {
    val k = 30
    val edgeRows = Rdf.coEdges(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference: iterative peel on the collected edge set
    var es = edgeRows.toSet
    var changed = true
    while (changed) {
      val deg = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    val refDeg = (es.toSeq.map(_._1) ++ es.toSeq.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val ours = Rdf.kCore(Rdf.coEdges(spark, sf001), k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ours === refDeg)
    assert(ours.nonEmpty || refDeg.isEmpty)
  }

  test("x35 HLL: estimate within the m=256 error envelope, registers bounded") {
    val rows = Sketches.x35(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_users").toDouble
      val est = r.getAs[Double]("hll_est")
      // 1.04/sqrt(256) = 6.5% std error; 3-sigma envelope ~ 20%
      assert(math.abs(est - n) / n <= 0.20, s"est $est vs true $n")
    }
    // register table is bounded by m per group at ANY corpus size
    val regCnt = Tables.events(spark, sf001)
      .select($"event_type", md5($"user_id".cast("string")).as("h"))
      .select($"event_type",
        expr("CAST(conv(substring(h, 1, 2), 16, 10) AS INT)").as("bucket"))
      .distinct().groupBy($"event_type").count()
      .agg(max($"count")).collect()(0).getLong(0)
    assert(regCnt <= Sketches.HllM)
  }

  test("x36 CMS: estimate never undercounts; exactly the top 20") {
    val rows = Sketches.x36(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"))
      assert(r.getAs[Long]("overcount") ===
        r.getAs[Long]("cms_est") - r.getAs[Long]("true_cnt"))
    }
    val cnts = rows.map(_.getAs[Long]("true_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("r10 top-5 similar suppliers: group sizes and contiguous ranks") {
    val rows = Rdf.r10(spark, sf001).collect()
    val byS1 = rows.groupBy(_.getAs[Long]("s1"))
    assert(byS1.nonEmpty)
    byS1.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rs.length))
      // jac non-increasing with rank
      val byRank = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("jac"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("a21 mode: one row per user, mode_cnt dominates, share in (0,1]") {
    val rows = Aggs.a21(spark, sf001).collect()
    val users = Tables.events(spark, sf001)
      .select($"user_id").distinct().count()
    assert(rows.length.toLong === users)
    rows.foreach { r =>
      val (cnt, n) = (r.getAs[Long]("mode_cnt"), r.getAs[Long]("n_events"))
      assert(cnt >= 1 && cnt <= n)
      // 5 event types -> the mode is at least a fifth of the events
      assert(cnt * 5 >= n)
      val share = r.getAs[Double]("mode_share")
      assert(share > 0.0 && share <= 1.0)
    }
  }

  test("s11 gap stats: total gap telescopes to the user's timestamp span") {
    val out = Events.s11(spark, sf001)
    val span = Tables.events(spark, sf001)
      .select($"user_id", expr("ts div 1000").as("ts_us"))
      .groupBy($"user_id")
      .agg((max($"ts_us") - min($"ts_us")).as("span"),
        count(lit(1)).as("n"))
    val joined = out.join(span, Seq("user_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_events") === r.getAs[Long]("n"))
      if (r.getAs[Long]("n") > 1) {
        assert(r.getAs[Long]("total_gap_us") === r.getAs[Long]("span"))
        assert(r.getAs[Long]("min_gap_us") <= r.getAs[Long]("max_gap_us"))
      } else assert(r.isNullAt(r.fieldIndex("total_gap_us")))
    }
  }

  test("l9 keyword top-3: ranks contiguous, scores non-increasing per doc") {
    val rows = Llm.l9(spark, sf001).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length))
      val sc = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("score"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
  }

  test("f13 regex: vowel count and word anchors agree with direct string ops") {
    Scalars.f13(spark, sf001)
      .join(Tables.part(spark, sf001), Seq("p_partkey"))
      .collect().foreach { r =>
        val name = r.getAs[String]("p_name")
        assert(r.getAs[Long]("n_vowels") === name.count("aeiou".contains(_)))
        assert(r.getAs[Boolean]("is_widget") === name.endsWith("widget"))
        assert(name.startsWith(r.getAs[String]("first_word")))
        assert(name.endsWith(r.getAs[String]("last_word")))
        assert(r.getAs[String]("devoweled") === name.filterNot("aeiou".contains(_)))
      }
  }

  test("j16 nearest-asof equals the brute-force range join (sf0.001)") {
    val usPerHour = 3600L * 1000000L
    val e = Tables.events(spark, sf001)
      .select($"event_id", $"user_id", expr("ts div 1000").as("ts_us"),
        $"event_type")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts_us".as("pts"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("cid"), $"user_id", $"ts_us".as("cts"))
    val brute = p.join(c, Seq("user_id"))
      .filter(abs($"cts" - $"pts") <= usPerHour)
      // mirror j16's pick order: nearest first; distance ties -> the
      // backward side; within a side, the window's frame edge (backward =
      // LAST of (cts, cid) ascending, forward = FIRST)
      .withColumn("side", when($"cts" <= $"pts", 0).otherwise(1))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_id")
          .orderBy(abs($"cts" - $"pts"), $"side",
            when($"side" === 0, -$"cts").otherwise($"cts"),
            when($"side" === 0, -$"cid").otherwise($"cid"))))
      .filter($"rn" === 1)
      .select($"event_id", $"user_id", $"pts".as("purchase_ts"),
        $"cid".as("click_event_id"), ($"cts" - $"pts").as("delta_us"))
    val got = Joins.j16(spark, sf001)
    assert(got.count() > 0)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("j17 bloom-prefiltered join equals the plain join (sf0.001)") {
    val plain = Tables.lineitem(spark, sf001)
      .join(Tables.supplier(spark, sf001),
        $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, sf001),
        $"s_nationkey" === $"n_nationkey")
      .filter($"n_nationkey" < 5)
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).as("rev"))
      .select($"s_suppkey", $"s_name", $"n_items",
        expr("CAST(CAST(rev AS DECIMAL(18,2)) AS DOUBLE)").as("revenue"))
    val got = Joins.j17(spark, sf001)
    assert(got.count() > 0)
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }

  test("s12 manual sessionization agrees with s3's built-in session_window") {
    def sig(df: org.apache.spark.sql.DataFrame, cnt: String) =
      df.groupBy($"user_id")
        .agg(sort_array(collect_list(col(cnt))).as("sizes"))
        .collect().map(r => r.getAs[Long]("user_id") ->
          r.getAs[Seq[Long]]("sizes")).toMap
    val manual = sig(Events.s12(spark, sf001), "n_events")
    val builtin = sig(Events.s3(spark, sf001), "cnt")
    assert(manual.nonEmpty)
    assert(manual === builtin)
  }

  test("f14 calendar truncation invariants") {
    Scalars.f14(spark, sf001).collect().foreach { r =>
      val d = r.getAs[java.sql.Date]("d").toLocalDate
      val ms = r.getAs[java.sql.Date]("month_start").toLocalDate
      val qs = r.getAs[java.sql.Date]("quarter_start").toLocalDate
      val ws = r.getAs[java.sql.Date]("week_start").toLocalDate
      val me = r.getAs[java.sql.Date]("month_end").toLocalDate
      assert(ms == d.withDayOfMonth(1))
      assert(qs.getDayOfMonth == 1 && Seq(1, 4, 7, 10).contains(qs.getMonthValue))
      assert(ws.getDayOfWeek == java.time.DayOfWeek.MONDAY && !ws.isAfter(d))
      assert(me == d.withDayOfMonth(d.lengthOfMonth))
      assert(r.getAs[Long]("days_in_month") == d.lengthOfMonth.toLong)
    }
  }

  test("x40 funnel: counts monotone and reconcilable stage by stage") {
    val rows = Pipeline.x40(spark, sf001).collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.map(_.getAs[String]("stage_name")).toSeq ==
      Seq("raw", "exact_dedup", "lang_en", "min_length", "domain_cap"))
    val outs = rows.map(_.getAs[Long]("docs_out"))
    assert(outs.zip(outs.tail).forall { case (a, b) => b <= a })
    // stage0 = corpus size; stage1 = distinct content hashes (l1's groups)
    assert(outs(0) === Tables.documents(spark, sf001).count())
    assert(outs(1) === Llm.l1(spark, sf001).count())
    // docs_in chains to the previous stage's docs_out
    rows.tail.zip(rows).foreach { case (cur, prev) =>
      assert(cur.getAs[Long]("docs_in") === prev.getAs[Long]("docs_out"))
    }
  }

  test("w10 pareto: 20 rows, revenue non-increasing, cum_share monotone to <= 1") {
    val rows = Windows.w10(spark, sf001).collect()
    assert(rows.length === 20)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
    val cum = rows.map(_.getAs[Double]("cum_share"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last <= 1.0 && cum.head > 0.0)
  }

  test("u7 typed mapGroups equals the declarative groupBy.agg") {
    val declarative = Tables.customer(spark, sf001)
      .groupBy($"c_nationkey".cast("int").as("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        expr("CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)")
          .as("total_bal"),
        min($"c_custkey").as("min_custkey"),
        max($"c_custkey").as("max_custkey"))
    val got = Udfs.u7(spark, sf001)
    assert(got.count() > 0)
    assert(got.exceptAll(declarative).isEmpty && declarative.exceptAll(got).isEmpty)
  }

  test("j18 NOT EXISTS partitions customers against the open-order semi join") {
    val withOpen = Tables.customer(spark, sf001)
      .join(Tables.orders(spark, sf001).filter($"o_orderstatus" === "O"),
        $"c_custkey" === $"o_custkey", "left_semi").count()
    val without = Joins.j18(spark, sf001).count()
    assert(without > 0)
    assert(withOpen + without === Tables.customer(spark, sf001).count())
  }

  test("x41 shard audit: totals reconcile and shards tile the token axis") {
    val rows = Pipeline.x41(spark, sf001).collect()
      .sortBy(_.getAs[Long]("shard"))
    val docs = Tables.documents(spark, sf001)
      .select(size(split($"text", " ")).cast("bigint").as("wc"))
      .agg(count(lit(1)).as("n"), sum($"wc").as("toks")).head()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("tokens")).sum === docs.getAs[Long]("toks"))
    rows.foreach { r =>
      // a shard's first token offset lands inside its own 2,500-token band
      assert(r.getAs[Long]("start_tok") / 2500L === r.getAs[Long]("shard"))
    }
    // consecutive shards touch: next start == previous end (telescoping cum)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("start_tok") === a.getAs[Long]("end_tok"))
    }
  }

  test("a22 MAD: crossing property against a driver-side exact recomputation") {
    val prices = Tables.lineitem(spark, sf001)
      .select($"l_returnflag", expr("CAST(l_extendedprice AS DECIMAL(18,2))").as("p"))
      .collect().map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[java.math.BigDecimal]("p")))
    def lowerMedian(xs: Seq[java.math.BigDecimal]): java.math.BigDecimal = {
      val sorted = xs.sorted(Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[java.math.BigDecimal]()))
      sorted((xs.length - 1) / 2) // first index where 2*(i+1) >= n
    }
    val expected = prices.groupBy(_._1).map { case (f, rows) =>
      val ps = rows.map(_._2).toSeq
      val med = lowerMedian(ps)
      val mad = lowerMedian(ps.map(p => p.subtract(med).abs()))
      (f, med.doubleValue, mad.doubleValue, rows.length.toLong)
    }.toSet
    val got = Aggs.a22(spark, sf001).collect().map { r =>
      (r.getAs[String]("l_returnflag"), r.getAs[Double]("median_price"),
        r.getAs[Double]("mad"), r.getAs[Long]("n_items"))
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("s13 anomaly flags equal a driver-side exact recomputation") {
    val daily = Tables.events(spark, sf001)
      .select($"user_id", expr("(ts div 1000) div 86400000000").as("day_idx"))
      .groupBy($"user_id", $"day_idx").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("day_idx"), r.getAs[Long]("cnt")))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val n = BigInt(rows.length)
      val s = BigInt(rows.map(_._3).sum)
      val ss = rows.map(c => BigInt(c._3) * c._3).sum
      rows.filter { case (_, _, c) =>
        val dev = n * c - s
        dev * dev > 4 * (n * ss - s * s)
      }.map { case (_, d, c) => (u, d, c) }
    }.toSet
    val got = Events.s13(spark, sf001).collect().map { r =>
      (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("cnt"))
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty || expected.isEmpty)
  }

  test("x39 domain cap matches the window-rank formulation (sf0.001)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
    val docs = Tables.documents(spark, sf001)
      .select($"source", $"doc_id", $"n_chars")
    val kept = docs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .groupBy($"source")
      .agg(count(lit(1)).as("kept_docs_w"), sum($"n_chars").as("kept_chars_w"))
    val got = Pipeline.x39(spark, sf001).join(kept, Seq("source")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("kept_docs") === r.getAs[Long]("kept_docs_w"))
      assert(r.getAs[Long]("kept_chars") === r.getAs[Long]("kept_chars_w"))
      assert(r.getAs[Long]("kept_docs") ===
        math.min(r.getAs[Long]("total_docs"), 10L))
      assert(r.getAs[Long]("dropped_docs") ===
        r.getAs[Long]("total_docs") - r.getAs[Long]("kept_docs"))
    }
  }

  test("x42 novelty equals a driver-side first-occurrence recomputation") {
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val triSets = docs.map { case (id, ws) =>
      id -> ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val firstDoc = triSets.toSeq.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).min }
    val rows = ops.Pipeline.x42(spark, sf001).collect()
    assert(rows.length === triSets.count(_._2.nonEmpty))
    rows.foreach { r =>
      val (id, nTri, nNovel) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val ts = triSets(id)
      assert(nTri === ts.size)
      assert(nNovel === ts.count(t => firstDoc(t) == id))
      assert(math.abs(r.getDouble(3) - nNovel.toDouble / nTri) < 5e-5)
    }
  }

  test("x43 KL drift: non-negative (Gibbs), token masses reconcile") {
    val rows = ops.Pipeline.x43(spark, sf001).collect()
    assert(rows.length === 20) // fixture has 20 sources
    val corpusTokens = Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.expr(
        "sum(size(split(text, ' ')))")).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum === corpusTokens)
    rows.foreach { r =>
      // quantization noise can push a true-0 KL a hair negative; the
      // declared output rounds at 4 dp, so -0.0001 is the worst legal case
      assert(r.getDouble(3) >= -1e-4, s"KL < 0 for ${r.getString(0)}")
      assert(r.getLong(2) > 0) // vocab
    }
  }

  test("r12 distances equal a driver-side 3-round Bellman-Ford") {
    val li = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val adj = co.toSeq.flatMap { case ((a, b), c) =>
      val w = math.max(1L, 10L - c)
      Seq((a, b, w), (b, a, w))
    }.groupBy(_._1)
    val src = co.keys.flatMap(p => Seq(p._1, p._2)).min
    var dist = Map(src -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        adj.getOrElse(u, Seq()).map { case (_, v, w) => v -> (du + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).min }
    }
    val rows = ops.Rdf.r12(spark, sf001).collect()
    assert(rows.length === dist.size)
    rows.foreach { r =>
      assert(r.getLong(1) === dist(r.getLong(0)),
        s"dist mismatch at part ${r.getLong(0)}")
    }
  }

  test("u8 running WAvg equals a driver-side quantized running recomputation") {
    import org.apache.spark.sql.functions._
    def d4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val input = Tables.lineitem(spark, sf001)
      .filter(col("l_discount") > 0)
      .select(col("l_suppkey"), col("l_shipdate").cast("date").cast("string"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5)))
    val expect = input.groupBy(_._1).toSeq.flatMap { case (sk, rs) =>
      var sw = BigDecimal(0)
      var ww = BigDecimal(0)
      rs.sortBy(t => (t._2, t._3, t._4, t._5, t._6)).map { t =>
        sw += d4(t._5) * d4(t._6)
        ww += d4(t._6)
        // finish IS the declared rounding contract (exact rational
        // half-up) — reuse it so this test checks the WINDOW plumbing
        (sk, t._2, t._3, t._4, ops.Udfs.WAvg.finish((sw, ww)))
      }
    }.sorted
    val got = ops.Udfs.u8(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getInt(3), r.getDouble(4))).toSeq.sorted
    assert(got === expect)
  }

  test("x44 estimate and truth both recompute driver-side per output pair") {
    val docs = Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSet).toMap
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val sigs = docs.map { case (id, ts) =>
      id -> (0 until 8).map(i => ts.map(t => md5hex(s"$i:$t")).min)
    }
    val rows = ops.Pipeline.x44(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(1), r.getLong(2))
      val (sa, sb) = (docs(a), docs(b))
      val j = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(r.getDouble(3) - j) < 5e-5, s"jaccard pair ($a,$b)")
      val k = (0 until 8).count(i => sigs(a)(i) == sigs(b)(i))
      assert(r.getDouble(4) === k / 8.0, s"mh_est pair ($a,$b)")
      assert(k >= 2, s"candidate ($a,$b) lacks an agreeing band") // LSH sanity
    }
  }

  test("s14 lateness flags equal a driver-side recomputation") {
    val evs = Tables.events(spark, sf001)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = evs.groupBy(_._1).map { case (u, rs) =>
      var mx = Long.MinValue
      var late = 0L
      var worst = 0L
      rs.sortBy(_._2).foreach { case (_, _, t) =>
        if (mx != Long.MinValue && mx - t > 300000000000L) {
          late += 1
          worst = math.max(worst, (mx - t) / 1000)
        }
        mx = math.max(mx, t)
      }
      u -> ((rs.length.toLong, late, worst))
    }
    val rows = ops.Events.s14(spark, sf001).collect()
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === expect(r.getLong(0)),
        s"user ${r.getLong(0)}")
    }
  }

  test("centroid aggregator fails loudly on ragged embeddings") {
    // Unguarded, a longer later row threw AIOOBE only when it wasn't the
    // partition's first row (order-dependent) and merge's zip silently
    // truncated mismatched partials — both must fail identically under any
    // partitioning.
    val b2 = Udfs.Centroid.reduce(Udfs.Centroid.zero, Udfs.VecIn(Seq(0.1, 0.2)))
    intercept[IllegalArgumentException] {
      Udfs.Centroid.reduce(b2, Udfs.VecIn(Seq(0.1)))
    }
    intercept[IllegalArgumentException] {
      Udfs.Centroid.reduce(b2, Udfs.VecIn(Seq(0.1, 0.2, 0.3)))
    }
    val b1 = Udfs.Centroid.reduce(Udfs.Centroid.zero, Udfs.VecIn(Seq(0.3)))
    intercept[IllegalArgumentException] { Udfs.Centroid.merge(b2, b1) }
    // same-length partials still merge exactly
    val m = Udfs.Centroid.merge(b2,
      Udfs.Centroid.reduce(Udfs.Centroid.zero, Udfs.VecIn(Seq(0.3, 0.4))))
    assert(Udfs.Centroid.finish(m) === Seq(0.2, 0.3))
  }

  test("r7 mass guard rejects node counts that overflow the scaled unit") {
    Rdf.r7MassGuard(2000000L) // an sf1-class graph is fine
    intercept[IllegalArgumentException] { Rdf.r7MassGuard(3000000000L) }
    Rdf.r7MassGuard(3000000000L, s = 100000000L) // the documented cure
  }

  test("x45 DSIR log-weights recompute driver-side; en-target separation") {
    val out = ops.Pipeline.x45(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.length === docs.length)
    // driver-side recompute of the declared decomposition
    val perDoc = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ").groupBy(identity).map { case (w, a) => w -> a.length.toLong })
    }
    val ctM = scala.collection.mutable.Map.empty[String, Long]
    val ccM = scala.collection.mutable.Map.empty[String, Long]
    perDoc.foreach { case (_, lang, m) =>
      m.foreach { case (w, c) =>
        ccM(w) = ccM.getOrElse(w, 0L) + c
        if (lang == "en") ctM(w) = ctM.getOrElse(w, 0L) + c
      }
    }
    val nC = ccM.values.sum; val v = ccM.size.toLong; val nT = ctM.values.sum
    def q9(x: Double): BigDecimal =
      BigDecimal(java.lang.Double.toString(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expByDoc = perDoc.map { case (id, _, m) =>
      val a = m.map { case (w, c) => q9(c * math.log(ctM.getOrElse(w, 0L) + 1.0)) }.sum
      val b = m.map { case (w, c) => q9(c * math.log(ccM(w).toDouble)) }.sum
      val n = m.values.sum
      id -> (a.toDouble - b.toDouble + n.toDouble * (math.log(nC.toDouble) - math.log((nT + v).toDouble)))
    }.toMap
    out.foreach { r =>
      val exp = expByDoc(r.getLong(0))
      assert(math.abs(r.getDouble(3) - exp) < 1.01e-4,
        s"doc ${r.getLong(0)}: ${r.getDouble(3)} vs $exp")
    }
    // semantics: the en slice IS the target — its mean log-weight must sit
    // above the non-en mean (likelihood ratio favors in-domain docs)
    val (en, rest) = out.partition(_.getString(1) == "en")
    val mEn = en.map(_.getDouble(3)).sum / en.length
    val mRest = rest.map(_.getDouble(3)).sum / rest.length
    assert(mEn > mRest, s"en mean $mEn !> non-en mean $mRest")
  }

  test("x46 temperature weights recompute; tempering compresses toward uniform") {
    val out = ops.Pipeline.x46(spark, sf001).collect()
    assert(out.length === 20)
    // Σ tweight ≈ 1 (each of 20 weights 4-dp rounded)
    val sumW = out.map(_.getDouble(4)).sum
    assert(math.abs(sumW - 1.0) <= 20 * 5.1e-5)
    // recompute from raw token masses
    val toks = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    val n = toks.values.sum.toDouble
    def q9(x: Double): BigDecimal =
      BigDecimal(java.lang.Double.toString(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val rs = toks.map { case (s0, t) => s0 -> q9(math.sqrt(t / n)) }
    val sumR = rs.values.sum
    out.foreach { r =>
      val exp = (rs(r.getString(0)) .toDouble) / sumR.toDouble
      assert(math.abs(r.getDouble(4) - exp) < 1.01e-4)
      // τ = 0.5 compresses: above-average sources shrink, below-average grow
      val share = r.getDouble(3)
      if (share > 0.051) assert(r.getDouble(4) < share)
      if (share < 0.049) assert(r.getDouble(4) > share)
    }
  }

  test("j19 bucketed band join equals the brute-force theta join") {
    val got = Joins.j19(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = Tables.supplier(spark, sf001).select($"s_suppkey", $"s_acctbal")
      .crossJoin(Tables.customer(spark, sf001).select($"c_custkey", $"c_acctbal"))
      .filter(org.apache.spark.sql.functions.abs($"s_acctbal" - $"c_acctbal") <= 25.0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === exp)
    assert(got.nonEmpty) // fixture probe: 5 pairs at sf0.001
  }

  test("s15 streaks equal a driver-side gaps-and-islands recomputation") {
    val out = ops.Events.s15(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toString))).toMap
    val days = Tables.events(spark, sf001)
      .select($"user_id", org.apache.spark.sql.functions.expr(
        "(ts div 1000) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, a) => u -> a.map(_._2).sorted }
    assert(out.keySet === days.keySet)
    days.foreach { case (u, ds) =>
      var runs = List.empty[(Long, Long)] // (start, len)
      ds.foreach { d =>
        runs = runs match {
          case (s0, l) :: t if d == s0 + l => (s0, l + 1) :: t
          case t => (d, 1L) :: t
        }
      }
      val maxLen = runs.map(_._2).max
      val bs = runs.filter(_._2 == maxLen).map(_._1).min
      val expDate = java.time.LocalDate.ofEpochDay(bs).toString
      assert(out(u) === ((ds.length.toLong, runs.length.toLong, maxLen, expDate)),
        s"user $u: ${out(u)} vs (${ds.length}, ${runs.length}, $maxLen, $expDate)")
    }
  }

  test("x47 cluster separation recomputes driver-side; sane geometry") {
    val out = ops.Pipeline.x47(spark, sf001).collect()
    assert(out.length === 10)
    assert(out.map(_.getLong(1)).sum === 500)
    val vecs = Tables.embeddings(spark, sf001)
      .select($"label", $"embedding".cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val byL = vecs.groupBy(_._1).map { case (l, a) => l -> a.map(_._2) }
    val cent = byL.map { case (l, vs) =>
      l -> Array.tabulate(64)(j => vs.map(_(j)).sum / vs.length)
    }
    out.foreach { r =>
      val l = r.getInt(0)
      val intraExp = byL(l).map(v =>
        v.zip(cent(l)).map { case (a, b) => (a - b) * (a - b) }.sum).sum / byL(l).length
      assert(math.abs(r.getDouble(2) - intraExp) < 1e-3,
        s"label $l intra ${r.getDouble(2)} vs $intraExp")
      val cds = cent.keys.filter(_ != l).map { o =>
        o -> cent(l).zip(cent(o)).map { case (a, b) => (a - b) * (a - b) }.sum
      }.toSeq
      val (expNear, expD2) = cds.minBy { case (o, d2) => (d2, o) }
      assert(r.getInt(3) === expNear, s"label $l nearest ${r.getInt(3)} vs $expNear")
      assert(math.abs(r.getDouble(4) - expD2) < 1e-3)
      assert(math.abs(r.getDouble(5) - r.getDouble(4) / intraExp) < 1e-2)
      assert(r.getDouble(2) > 0 && r.getDouble(4) > 0)
    }
  }

  test("r13 harmonic counts equal a driver-side multi-source BFS") {
    val out = ops.Rdf.r13(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    li.groupBy(_._1).values.foreach { grp =>
      val ps = grp.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) adj(a) = adj(a) + b
    }
    val nodes = adj.keySet
    val seeds = nodes.filter(_ % 100 == 0)
    // dist(n, s) for every node within 3 hops of seed s
    val reach = scala.collection.mutable.Map.empty[(Long, Long), Int]
    seeds.foreach { s0 =>
      var frontier = Set(s0); var seen = Set(s0)
      for (k <- 1 to 3) {
        val next = frontier.flatMap(adj) -- seen
        next.foreach(n => reach((n, s0)) = k)
        seen ++= next; frontier = next
      }
    }
    val exp = reach.toSeq.groupBy(_._1._1).map { case (n, rs) =>
      val ds = rs.map(_._2)
      val (r1, r2, r3) = (ds.count(_ == 1).toLong, ds.count(_ == 2).toLong,
        ds.count(_ == 3).toLong)
      n -> ((r1, r2, r3, 6 * r1 + 3 * r2 + 2 * r3))
    }
    assert(out.keySet === exp.keySet)
    exp.foreach { case (n, e) => assert(out(n) === e, s"node $n") }
  }

  test("s16 peak hour equals a driver-side argmax; smallest hour on ties") {
    val out = ops.Events.s16(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val ev = Tables.events(spark, sf001)
      .select($"event_type", expr("(ts div 3600000000000) % 24").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = ev.groupBy(_._1).map { case (t, a) =>
      val hist = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (ph, pc) = hist.toSeq.minBy { case (h, c) => (-c, h) }
      t -> ((a.length.toLong, ph.toInt, pc))
    }
    assert(out.keySet === exp.keySet)
    exp.foreach { case (t, (tot, ph, pc)) =>
      val (gTot, gPh, gPc, gShare) = out(t)
      assert((gTot, gPh, gPc) === ((tot, ph, pc)), s"type $t")
      assert(math.abs(gShare - pc.toDouble / tot) < 1.01e-4)
    }
  }

  test("x48 benford digits partition the orders; expectation matches ln") {
    val out = ops.Pipeline.x48(spark, sf001).collect()
    assert(out.map(_.getInt(0)).toSeq === (1 to 9))
    val nOrders = Tables.orders(spark, sf001).count()
    assert(out.map(_.getLong(1)).sum === nOrders)
    out.foreach { r =>
      val d = r.getInt(0)
      val expB = math.round((math.log(d + 1.0) - math.log(d.toDouble))
        / math.log(10.0) * 1e4) / 1e4
      assert(math.abs(r.getDouble(3) - expB) < 1.01e-4, s"digit $d benford")
      assert(math.abs(r.getDouble(2) - r.getLong(1).toDouble / nOrders) < 1.01e-4)
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 1.01e-4)
    }
    // the fixture's totalprice spread is Benford-ish: low digits dominate
    val byDigit = out.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(1) > byDigit(9))
  }

  test("x49 fertility recomputes from raw masses; x50 waste account closes") {
    val f = ops.Pipeline.x49(spark, sf001).collect()
    f.foreach { r =>
      val (chars, ws, bpe) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ws > 0 && bpe > 0)
      assert(math.abs(r.getDouble(6) - chars.toDouble / ws) < 1.01e-4)
      assert(math.abs(r.getDouble(7) - chars.toDouble / bpe) < 1.01e-4)
    }
    val docs = Tables.documents(spark, sf001).count()
    assert(f.map(_.getLong(2)).sum === docs)
    val w = ops.Pipeline.x50(spark, sf001).collect()
    assert(w.map(_.getLong(1)).sum === docs)
    val L = ops.Pipeline.CtxLen
    w.foreach { r =>
      val (dn, tok, seqs, pad) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pad === seqs * L - tok)
      // Σ⌈wc∕L⌉ is bounded by ⌈Σwc∕L⌉ below and Σwc∕L + n_docs above
      assert(seqs >= (tok + L - 1) / L && seqs <= tok / L + dn)
      assert(math.abs(r.getDouble(5) - pad.toDouble / (seqs * L)) < 1.01e-4)
    }
  }

  /** Driver-side undirected co-purchase adjacency at sf0.001 (shared by the
    * r14/r15 recomputation tests — ~200 nodes, collectable). */
  private def undAdj(): Map[Long, Set[Long]] = {
    val e = ops.Rdf.coEdges(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (e ++ e.map(_.swap)).groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).toSet
    }
  }

  test("r14 k-core equals a driver-side 3-round peel") {
    var adj = undAdj()
    for (_ <- 1 to 3) {
      val keep = adj.filter { case (n, nb) => nb.count(adj.contains) >= 3 }
        .keySet
      adj = adj.collect { case (n, nb) if keep(n) =>
        n -> nb.filter(keep)
      }.filter(_._2.nonEmpty).toMap
    }
    val expected = adj.map { case (n, nb) => n -> nb.size.toLong }
    val got = ops.Rdf.r14(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("r15 jaccard links equal a driver-side common-neighbor recomputation") {
    val adj = undAdj()
    val expected = (for {
      (u, nu) <- adj.toSeq; v <- nu if u < v
      cn = (nu intersect adj(v)).size if cn >= 1
    } yield (u, v) -> (cn.toLong, nu.size.toLong, adj(v).size.toLong)).toMap
    val got = ops.Rdf.r15(spark, sf001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (cn, du, dv) = expected(key)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((cn, du, dv)), key)
      assert(math.abs(r.getDouble(5) - cn.toDouble / (du + dv - cn)) < 1.01e-4)
    }
  }

  test("s17 bursts equal a driver-side lead-2 recomputation") {
    val ev = Tables.events(spark, sf001)
      .select($"user_id", $"event_id", expr("ts div 1000").as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      u -> (ts.length.toLong,
        ts.indices.count(i => i + 2 < ts.length &&
          ts(i + 2) - ts(i) <= 300000000L).toLong)
    }
    val got = ops.Events.s17(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
  }

  test("a23 winsorized mean equals a driver-side clamp at interpolated bounds") {
    val rows = Tables.orders(spark, sf001)
      .select($"o_orderpriority", $"o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def pct(v: Array[Double], p: Double): Double = {
      // Spark `percentile` ≡ DuckDB quantile_cont: rank p·(n−1), linear
      val s = v.sorted; val rk = p * (s.length - 1)
      val lo = rk.toInt; val f = rk - lo
      if (lo + 1 < s.length) s(lo) + f * (s(lo + 1) - s(lo)) else s(lo)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val v = rs.map(_._2)
      val p05 = BigDecimal(pct(v, 0.05)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      val p95 = BigDecimal(pct(v, 0.95)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      val wz = v.map(x => BigDecimal(math.min(math.max(x, p05), p95))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      g -> (v.length.toLong, (wz.sum / v.length).toDouble)
    }
    ops.Aggs.a23(spark, sf001).collect().foreach { r =>
      val (n, m) = expected(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(4) - m) < 1.01e-4, r.getString(0))
      assert(r.getDouble(2) <= r.getDouble(3)) // p05 ≤ p95
    }
  }

  test("f15 string batch: literal probes incl. lpad/rpad truncation") {
    val out = ops.Scalars.f15(spark, sf001).limit(50).collect()
    out.foreach { r =>
      val name = r.getString(1)
      assert(r.getString(2).length === 30 && r.getString(3).length === 30)
      if (name.length <= 30) {
        assert(r.getString(2).endsWith(name)) // left-padded
        assert(r.getString(3).startsWith(name)) // right-padded
      } else {
        assert(r.getString(2) === name.take(30)) // both truncate
        assert(r.getString(3) === name.take(30))
      }
      assert(r.getString(5) === name.reverse)
      assert(r.getString(6) === name.take(3) * 2)
      val ia = name.indexOf('a') + 1
      assert(r.getLong(7) === ia.toLong)
    }
  }

  test("x51 zipf fit equals a driver-side OLS on the same quantized terms") {
    val cnts = Tables.documents(spark, sf001)
      .select(explode(split($"text", " ")).as("t")).groupBy("t").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).take(100)
    def q9(d: Double): BigDecimal =
      BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val xs = cnts.indices.map(i => q9(math.log(i + 1.0)))
    val ys = cnts.map(c => q9(math.log(c._2.toDouble)))
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = ops.Pipeline.x51(spark, sf001).head()
    assert(r.getLong(0) === xs.length.toLong)
    assert(math.abs(r.getDouble(1) - slope) < 1.01e-4)
    assert(r.getDouble(1) < 0) // counts fall with rank
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1) // r²
  }

  test("x52 first positions recompute driver-side (1-based)") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val firsts = docs.flatMap { case (id, t) =>
      t.split(" ").zipWithIndex.groupBy(_._1)
        .map { case (tok, occ) => (tok, occ.map(_._2).min + 1) }
    }
    val expected = firsts.groupBy(_._1).map { case (tok, fs) =>
      tok -> (fs.length.toLong, fs.map(_._2.toLong).sum)
    }.toSeq.sortBy { case (t, (df, _)) => (-df, t) }.take(20)
    val got = ops.Pipeline.x52(spark, sf001).collect()
    assert(got.map(_.getString(0)).toSeq === expected.map(_._1))
    got.zip(expected).foreach { case (r, (_, (df, sfp))) =>
      assert(r.getLong(1) === df)
      assert(math.abs(r.getDouble(2) - sfp.toDouble / df) < 1.01e-4)
    }
  }

  test("j21 null-safe join equals a driver-side null-matches-null recomputation") {
    val sup = Tables.supplier(spark, sf001)
      .select($"s_suppkey", $"s_nationkey").collect()
      .map(r => r.getAs[Number](1).longValue)
      .map(n => if (n == 24L) Option.empty[Long] else Some(n))
    val cust = Tables.customer(spark, sf001)
      .select($"c_custkey", $"c_nationkey").collect()
      .map(r => r.getAs[Number](1).longValue)
      .map(n => if (n == 24L) Option.empty[Long] else Some(n))
    val expected = (for { sk <- sup; ck <- cust if sk == ck } yield sk)
      .groupBy(identity).map { case (k, xs) =>
        k.getOrElse(-1L) -> (xs.length.toLong,
          if (k.isEmpty) xs.length.toLong else 0L)
      }
    val got = ops.Joins.j21(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    // the whole point: <=> plans as a hash join, never a nested loop
    val plan = ops.Joins.j21(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("a24 HHI recomputes driver-side; bounds sanity") {
    val rows = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey", $"c_custkey", $"o_totalprice").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val expected = rows.groupBy(_._1).map { case (n, rs) =>
      val perCust = rs.groupBy(_._2).map { case (_, cs) => cs.map(_._3).sum }
      val t = perCust.sum
      n -> (perCust.size.toLong,
        ((perCust.map(r => r * r).sum).toDouble / (t.toDouble * t.toDouble)))
    }
    ops.Aggs.a24(spark, sf001).collect().foreach { r =>
      val (n, hhi) = expected(r.getAs[Number](0).longValue)
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(3) - hhi) < 1.01e-4, r.get(0))
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(3) >= 1.0 / n - 1e-4) // HHI lower bound 1/n
    }
  }

  test("x54 length-bias moments recompute from x6's quantized qualities") {
    val q = ops.Pipeline.x6(spark, sf001)
      .select($"wc", $"quality").collect()
      .map(r => (r.getInt(0).toLong,
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val n = q.length.toDouble
    val sx = q.map(_._1).sum.toDouble
    val sy = q.map(_._2).sum.toDouble
    val sxx = q.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
    val syy = q.map(p => p._2 * p._2).sum.toDouble
    val sxy = q.map(p => BigDecimal(p._1) * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val out = ops.Pipeline.x54(spark, sf001).collect()
    assert(out.map(_.getLong(1)).sum === q.length.toLong)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - slope) < 1.01e-4)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    }
    // per-bucket means recompute
    val byBucket = q.groupBy(_._1 / 10)
    out.foreach { r =>
      val vs = byBucket(r.getLong(0))
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) -
        (vs.map(_._2).sum / vs.length).toDouble) < 1.01e-4)
    }
  }

  test("x55 shingle octaves recompute driver-side; postings mass closes") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
      .filter(_._2.length >= 3)
    val df = docs.flatMap { case (id, w) =>
      (0 to w.length - 3).map(i => (id, s"${w(i)} ${w(i + 1)} ${w(i + 2)}"))
    }.distinct.groupBy(_._2).map { case (_, xs) => xs.length.toLong }
    val expected = df.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d))
      .map { case (b, ds) => b.toLong -> (ds.size.toLong, ds.sum) }
    val got = ops.Pipeline.x55(spark, sf001).collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    assert(got.values.map(_._2).sum === df.sum) // Σ postings = Σ df
  }

  test("r16 assortativity equals a driver-side Pearson over edge-end degrees") {
    val adj = undAdj()
    val ends = adj.toSeq.flatMap { case (u, nb) =>
      nb.toSeq.map(v => (nb.size.toLong, adj(v).size.toLong))
    }
    val n = ends.length.toDouble
    val sx = ends.map(_._1).sum.toDouble
    val sy = ends.map(_._2).sum.toDouble
    val sxx = ends.map(p => p._1 * p._1).sum.toDouble
    val syy = ends.map(p => p._2 * p._2).sum.toDouble
    val sxy = ends.map(p => p._1 * p._2).sum.toDouble
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = ops.Rdf.r16(spark, sf001).head()
    assert(got.getLong(0) === ends.length.toLong)
    assert(math.abs(got.getDouble(1) - sx / n) < 1.01e-4)
    assert(math.abs(got.getDouble(2) - r) < 1.01e-4)
    assert(got.getDouble(2) >= -1.0 && got.getDouble(2) <= 1.0)
  }

  test("x56 duplicate inflation recomputes driver-side; account closes against l1") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase))
    val surv = docs.groupBy(_._3).map { case (t, ds) =>
      t -> ds.map(_._1).min
    }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val dups = ds.filter(d => surv(d._3) != d._1)
      src -> (ds.length.toLong, dups.length.toLong)
    }
    val got = ops.Pipeline.x56(spark, sf001).collect()
    got.foreach { r =>
      val (docsN, dupN) = expected(r.getString(0))
      assert(r.getLong(1) === docsN && r.getLong(3) === dupN, r.getString(0))
      assert(r.getLong(4) <= r.getLong(2)) // dup tokens ≤ tokens
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    }
    // total duplicate docs must equal the corpus minus l1's survivor count
    val l1Survivors = ops.Llm.l1(spark, sf001).count()
    assert(got.map(_.getLong(3)).sum === docs.length - l1Survivors)
  }

  test("x53 gini recomputes driver-side; bounds and balance sanity") {
    val masses = Tables.documents(spark, sf001)
      .select($"source", size(split($"text", " ")).cast("long").as("wc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => (s, rs.map(_._2).sum) }
      .toSeq.sortBy { case (s, m) => (m, s) }
    val n = masses.length.toLong
    val tot = masses.map(_._2).sum
    val wsum = masses.zipWithIndex.map { case ((_, m), i) => (i + 1) * m }.sum
    val gini = (2.0 * wsum - (n + 1).toDouble * tot) / (n.toDouble * tot)
    val r = ops.Pipeline.x53(spark, sf001).head()
    assert(r.getLong(0) === n && r.getLong(1) === tot)
    assert(math.abs(r.getDouble(2) - gini) < 1.01e-4)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  private def md5bytes(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString

  test("m1 media rollup equals driver recomputation over encode(text) blobs") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val kinds = Array("image", "audio", "video")
    val expected = docs.groupBy { case (id, _) => kinds((id % 3).toInt) }
      .map { case (k, g) =>
        (k, g.length.toLong, g.map(_._2.length.toLong).sum,
          g.map(x => md5bytes(x._2)).distinct.length.toLong,
          g.map(_._2.length).min, g.map(_._2.length).max)
      }.toSeq.sortBy(_._1)
    val got = ops.Media.m1(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(got === expected)
  }

  test("m2 frame accounting equals the ceil/tail arithmetic per video blob") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8").length))
      .filter(_._1 % 3 == 2)
    val expected = docs.map { case (id, len) =>
      (id, ((len + 63) / 64).toLong, len.toLong, ((len - 1) % 64) + 1)
    }.sortBy(_._1).toSeq
    val got = ops.Media.m2(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("m3 blob-prefix groups equal driver recomputation; spans kinds") {
    val kinds = Array("image", "audio", "video")
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val expected = docs.map { case (id, b) =>
      (md5bytes(b.take(64)), id, md5bytes(b), kinds((id % 3).toInt))
    }.groupBy(_._1).filter(_._2.length >= 2).map { case (ps, g) =>
      (ps, g.length.toLong, g.map(_._3).distinct.length.toLong,
        g.map(_._4).distinct.length.toLong, g.map(_._2).min)
    }.toSet
    val got = ops.Media.m3(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture lost its shared 64-byte prefixes")
    assert(got.exists(_._4 > 1L), "no prefix group spans kinds — n_kinds inert")
  }

  test("m4 media mix equals driver recomputation; shares sum to ~1 per kind") {
    val kinds = Array("image", "audio", "video")
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).getBytes("UTF-8").length.toLong))
    val cells = docs.groupBy { case (id, l, _) => (kinds((id % 3).toInt), l) }
      .map { case ((k, l), g) => ((k, l), (g.length.toLong, g.map(_._3).sum)) }
    val kindBytes = cells.groupBy(_._1._1)
      .map { case (k, m) => k -> m.values.map(_._2).sum }
    val expected = cells.map { case ((k, l), (n, b)) =>
      (k, l, n, b, BigDecimal(b.toDouble / kindBytes(k).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = ops.Media.m4(spark, sf001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) === ((e._1, e._2, e._3, e._4)))
      assert(math.abs(g._5 - e._5) < 1.5e-4, s"$g vs $e")
    }
    got.groupBy(_._1).foreach { case (k, rows) =>
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3, s"$k shares")
    }
  }

  test("f17 higher-order lambdas equal per-row recomputation; flags discriminate") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val lens = text.split(" ", -1).map(_.length)
      (id, lens.length, lens.max, lens.map(_.toLong).sum,
        lens.exists(_ > 6), lens.forall(_ < 8), lens.count(_ >= 6))
    }.sortBy(_._1).toSeq
    val got = ops.Scalars.f17(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5), r.getInt(6))).toSeq
    assert(got === expected)
    assert(got.exists(_._5) && got.exists(!_._5), "has_long is inert")
    assert(got.exists(_._6) && got.exists(!_._6), "all_short is inert")
  }

  test("a26 discrete quantiles: smallest value with cume share >= p, exactly") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_returnflag", $"l_quantity".cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = li.groupBy(_._1).map { case (f, g) =>
      val qs = g.map(_._2).sorted
      def disc(p: Int): Long = qs((qs.length * p + 99) / 100 - 1)
      (f, g.length.toLong, disc(25), disc(50), disc(75), disc(95))
    }.toSeq.sortBy(_._1)
    // disc(p) above = value at 1-based index ceil(n*p/100) — exactly the
    // smallest value whose cumulative count reaches p% of n
    val got = ops.Aggs.a26(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("s20 dow profile equals integer epoch-day recomputation") {
    val ev = Tables.events(spark, sf001)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cells = ev.groupBy { case (t, ts) =>
      (t, ((ts / (86400L * 1000000000L)) + 3) % 7)
    }.map { case (k, g) => k -> g.length.toLong }
    val totals = cells.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val expected = cells.map { case ((t, dow), n) =>
      (t, dow.toInt, n, totals(t),
        BigDecimal(n.toDouble / totals(t).toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = ops.Events.s20(spark, sf001).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) === ((e._1, e._2, e._3, e._4)))
      assert(math.abs(g._5 - e._5) < 1.5e-4)
    }
    assert(got.map(_._2).distinct.sorted === (0 to 6), "all 7 weekdays present")
  }

  test("j22 exists-flags equal stacked semi-join counts") {
    // recompute via independent left-semi joins per predicate — the shape
    // j22 exists to REPLACE (1 shuffle per predicate vs 2 total)
    def semiCounts(pred: org.apache.spark.sql.Column) =
      Tables.orders(spark, sf001)
        .join(Tables.lineitem(spark, sf001).filter(pred)
            .select($"l_orderkey").distinct(),
          $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy("o_orderpriority").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ret = semiCounts($"l_returnflag" === "R")
    val big = semiCounts($"l_quantity" >= 45)
    val nOrders = Tables.orders(spark, sf001).groupBy("o_orderpriority")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = ops.Joins.j22(spark, sf001).collect()
    rows.foreach { r =>
      val p = r.getString(0)
      assert(r.getLong(1) === nOrders(p), s"$p n_orders")
      assert(r.getLong(2) === ret.getOrElse(p, 0L), s"$p n_with_return")
      assert(r.getLong(3) === big.getOrElse(p, 0L), s"$p n_with_big")
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)), s"$p both")
    }
  }

  test("u9 typed argmax equals the window argmax under the declared total order") {
    val ev = Tables.events(spark, sf001)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val w = g.minBy(e => (-e._5, e._3, e._2))
      (u, w._2, w._4, w._5)
    }.toSeq.sortBy(_._1)
    val got = ops.Udfs.u9(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("x60 suffix groups equal driver recomputation; catches non-exact dups") {
    def md5s(s: String): String = md5bytes(s.getBytes("UTF-8"))
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      (md5s(toks.takeRight(3).mkString(" ")), id, md5s(text.trim.toLowerCase))
    }.groupBy(_._1).filter(_._2.length >= 2).map { case (sh, g) =>
      (g.map(_._2).min, sh, g.length.toLong, g.map(_._3).distinct.length.toLong)
    }.toSet
    val got = ops.Pipeline.x60(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.exists(_._4 > 1L),
      "no suffix group spans distinct full texts — x60 ≡ exact dedup")
  }

  test("m5 chunk dedup equals driver recomputation; tail chunks partial") {
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val chunks = docs.flatMap { case (id, b) =>
      b.grouped(64).map(c => (md5bytes(c), id, c.length))
    }
    val expected = chunks.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2)
      .map { case (sig, g) =>
        (sig, g.map(_._2).distinct.length.toLong, g.length.toLong,
          g.map(_._2).min, g.map(_._3).min,
          (g.length - 1).toLong * g.map(_._3).min)
      }.toSet
    val got = ops.Media.m5(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getInt(5), r.getLong(6))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture lost its shared 64-byte chunks")
    // same sig ⇒ same bytes ⇒ one length per group (the min-is-exact claim)
    chunks.groupBy(_._1).foreach { case (sig, g) =>
      assert(g.map(_._3).distinct.length === 1, s"$sig lengths diverge")
    }
  }

  test("u10 flatMapGroups gaps equal the lag-window recomputation") {
    val thr = 3600L * 1000000L
    val ev = Tables.events(spark, sf001)
      .select($"user_id", $"event_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000L))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (u, g) =>
      val s = g.sortBy(e => (e._3, e._2))
      s.sliding(2).collect {
        case Array(a, b) if b._3 - a._3 > thr => (u, a._3, b._3, b._3 - a._3)
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = ops.Udfs.u10(spark, sf001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture has no >1h inter-event gaps")
  }

  test("s21 adoption curve: new users sum to distinct users per type; cum monotone") {
    val rows = ops.Events.s21(spark, sf001).collect().map(r =>
      (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    val perType = Tables.events(spark, sf001)
      .select($"event_type", $"user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, g) => t -> g.length.toLong }
    rows.groupBy(_._1).foreach { case (t, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._3).sum === perType(t), s"$t adopters")
      assert(sorted.last._4 === perType(t), s"$t final cum")
      sorted.foldLeft(0L) { (acc, r) =>
        assert(r._4 === acc + r._3, s"$t cum at ${r._2}"); r._4
      }
    }
  }

  test("f18 formatting card equals per-row Java recomputation") {
    val ord = Tables.orders(spark, sf001)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_orderpriority", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4))).sortBy(_._1)
    val got = ops.Scalars.f18(spark, sf001).collect()
    assert(got.length === ord.length)
    got.zip(ord).foreach { case (g, (ok, ck, st, pr, tp)) =>
      assert(g.getLong(0) === ok)
      assert(g.getString(1) === f"ORD-$ok%09d")
      // Spark's double→decimal cast goes through the double's SHORTEST
      // string repr (BigDecimal.decimal), not the exact binary expansion
      val dec = BigDecimal(tp)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
      assert(g.getString(2) === "$" + (" " * (12 - dec.length)) + dec)
      assert(g.getString(3) === s"$st|$pr")
      assert(g.getString(4) === ("0" * (10 - ck.toString.length)) + ck)
      assert(g.getString(5) === (st + "..." ).take(3))
    }
  }

  test("x61 stratified sample: exactly min(5, stratum size) rows per source, hash-ordered") {
    val docs = Tables.documents(spark, sf001)
      .select($"source", $"doc_id", $"lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def h(id: Long): String = md5bytes(id.toString.getBytes("UTF-8"))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      g.sortBy(d => (h(d._2), d._2)).take(5).zipWithIndex.map {
        case ((_, id, lang), i) => (src, i + 1, id, lang, h(id))
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = ops.Pipeline.x61(spark, sf001).collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getString(4))).toSeq
    assert(got === expected)
    got.groupBy(_._1).foreach { case (src, g) =>
      val n = docs.count(_._1 == src)
      assert(g.length === math.min(5, n), s"$src quota")
    }
  }

  test("x62 profile card equals driver recomputation over all three columns") {
    val docs = Tables.documents(spark, sf001)
      .select($"lang", $"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = docs.length.toLong
    val expected = Set(
      ("lang", n, docs.count(_._1 == null).toLong,
        docs.map(_._1).distinct.length.toLong,
        docs.map(_._1).min, docs.map(_._1).max),
      ("source", n, docs.count(_._2 == null).toLong,
        docs.map(_._2).distinct.length.toLong,
        docs.map(_._2).min, docs.map(_._2).max),
      ("n_chars", n, 0L, docs.map(_._3).distinct.length.toLong,
        docs.map(_._3).min.toString, docs.map(_._3).max.toString))
    val got = ops.Pipeline.x62(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet
    assert(got === expected)
  }

  test("r18 components equal a driver union-find over the support-2 subgraph") {
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val comp = nodes.map(n => n -> find(n)).toMap
    val sizes = comp.groupBy(_._2).map { case (c, g) => c -> g.size.toLong }
    val expected = nodes.map(n => (n, comp(n), sizes(comp(n)))).toSet
    val got = ops.Rdf.r18(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.exists(_._3 >= 2), "fixture has no multi-node component")
  }

  test("m6 size profile: discrete quantiles are attained byte lengths") {
    val lens = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0) % 3, r.getString(1).getBytes("UTF-8").length))
    val kinds = Map(0L -> "image", 1L -> "audio", 2L -> "video")
    def pdisc(s: Seq[Int], q: Double): Int = {
      val sorted = s.sorted
      sorted(math.ceil(q * sorted.length).toInt.max(1) - 1)
    }
    val got = ops.Media.m6(spark, sf001).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    got.foreach { r =>
      val g = lens.filter(l => kinds(l._1) == r.getString(0)).map(_._2).toSeq
      assert(r.getLong(1) === g.length.toLong)
      assert(r.getInt(2) === pdisc(g, 0.25), "p25")
      assert(r.getInt(3) === pdisc(g, 0.50), "p50")
      assert(r.getInt(4) === pdisc(g, 0.90), "p90")
      val mean = BigDecimal(g.map(_.toLong).sum.toDouble / g.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - mean) < 1e-9, "mean")
    }
  }

  test("f19 parse_url recovers every constructed component") {
    val rows = ops.Scalars.f19(spark, sf001).collect()
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"source", $"lang", $"n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val (src, lang, nc) = docs(r.getLong(0))
      assert(r.getString(2) === "https")
      assert(r.getString(3) === s"$src.example.com")
      assert(r.getString(4) === s"/docs/$lang/${r.getLong(0)}")
      assert(r.getString(5) === s"lang=$lang&chars=$nc")
      assert(r.getString(6) === nc.toString)
      assert(r.getString(1) ===
        s"https://${r.getString(3)}${r.getString(4)}?${r.getString(5)}")
    }
  }

  test("u11 cogroup reconciliation equals the SQL left-join aggregate") {
    val sql = Tables.orders(spark, sf001).as("o")
      .join(Tables.lineitem(spark, sf001).as("l"),
        $"o_orderkey" === $"l_orderkey", "left")
      .groupBy($"o_orderkey", $"o_totalprice")
      .agg(count($"l_orderkey").as("n_items"),
        coalesce(sum(graft.Det.dec2($"l_extendedprice")),
          lit(0).cast("decimal(18,2)")).as("gross"))
      .select($"o_orderkey", $"n_items",
        graft.Det.dec2($"o_totalprice").cast("double").as("o_total"),
        $"gross".cast("double").as("li_gross"),
        (graft.Det.dec2($"o_totalprice") - $"gross").cast("double").as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val got = ops.Udfs.u11(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got === sql)
    assert(got.nonEmpty)
  }

  test("l10 confusion matrix: diagonal mass equals x5 correct count; rows sum to 1") {
    val x5 = ops.Pipeline.x5(spark, sf001).collect()
      .map(r => (r.getString(1), r.getString(2), r.getInt(3)))
    val got = ops.Llm.l10(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._3).sum === x5.length.toLong)
    val diag = got.filter(c => c._1 == c._2).map(_._3).sum
    assert(diag === x5.map(_._3.toLong).sum, "diagonal = x5 correct count")
    got.groupBy(_._1).foreach { case (lang, cells) =>
      val n = x5.count(_._1 == lang).toLong
      assert(cells.map(_._3).sum === n, s"$lang row mass")
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-3, s"$lang shares")
    }
  }

  test("s22 first/last touch: cells partition users; event mass conserved") {
    val ev = Tables.events(spark, sf001)
      .select($"user_id", $"event_id", $"event_type", expr("ts div 1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val perUser = ev.groupBy(_._1).map { case (u, g) =>
      val s = g.sortBy(e => (e._4, e._2))
      (u, s.head._3, s.last._3, g.length.toLong)
    }.toSeq
    val expected = perUser.groupBy(c => (c._2, c._3)).map { case ((f, l), g) =>
      (f, l, g.size.toLong, g.map(_._4).sum)
    }.toSet
    val got = ops.Events.s22(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    val shares = ops.Events.s22(spark, sf001).collect().map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-3)
  }

  test("x63 band occupancy accounts every signature and x1's candidate mass") {
    val rows = ops.Pipeline.x63(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).distinct.sorted.toSeq === Seq(0, 1, 2, 3))
    val nDocs = Tables.documents(spark, sf001).count()
    rows.groupBy(_._1).foreach { case (band, g) =>
      assert(g.map(_._4).sum === nDocs, s"band $band doc mass")
      g.foreach { r => assert(r._5 === r._2 * (r._2 - 1) / 2 * r._3,
        s"band $band size ${r._2} pair math") }
    }
    // bucket-size-1 classes generate zero candidates; some bucket must
    // be hot enough to generate pairs on this fixture (x1 finds pairs)
    assert(rows.exists(r => r._2 >= 2 && r._5 > 0))
  }

  test("x64 CDC chunks equal a driver recomputation; insertion shifts one chunk") {
    def md5s(s: String): String = md5bytes(s.getBytes("UTF-8"))
    def cut(text: String): Seq[String] = {
      val toks = text.split(" ", -1).toSeq
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.foreach { t =>
        cur += t
        if ("0123".contains(md5s(t).charAt(0))) {
          out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer()
        }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq.map(_.mkString(" "))
    }
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chunks = docs.flatMap { case (id, t) =>
      cut(t).map(c => (md5s(c), id, c.split(" ", -1).length.toLong)) }
    val expected = chunks.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.length >= 2)
      .map { case (sig, g) =>
        (sig, g.map(_._2).distinct.length.toLong, g.length.toLong,
          g.map(_._3).min, g.map(_._2).min,
          (g.length - 1) * g.map(_._3).min)
      }.toSet
    val got = ops.Pipeline.x64(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture lost its shared CDC chunks")
    // the CDC property: a token prepended to a document changes only the
    // first chunk's content — every later chunk is boundary-stable
    val t = docs.head._2
    val before = cut(t)
    val after = cut("zzz_inserted " + t)
    assert(before.length >= 2, "doc 0 too short for the shift probe")
    assert(after.takeRight(before.length - 1) ===
      before.takeRight(before.length - 1))
  }

  test("r19 per-degree curve aggregates to r16's end-pair moments") {
    val rows = ops.Rdf.r19(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val r16 = ops.Rdf.r16(spark, sf001).collect().head
    // Σ n_ends over degree classes = r16's total end count, and the
    // end-weighted mean degree of SOURCES equals r16's avg_end_degree
    assert(rows.map(_._3).sum === r16.getLong(0))
    val wavg = rows.map(r => r._1.toDouble * r._3).sum / rows.map(_._3).sum
    assert(math.abs(wavg - r16.getDouble(1)) < 1e-3, "end-degree mass")
    rows.foreach { r => assert(r._3 >= r._2, "ends >= nodes per class") }
    // degree classes partition nodes: Σ n_nodes = |parts sharing an order
    // with a DIFFERENT part| (p < p2 excludes self-pairs)
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct; if (ps.length >= 2) ps else Nil
    }.toSet
    assert(rows.map(_._2).sum === nodes.size.toLong)
  }

  test("x65 bands partition the corpus; dup mass equals l1's non-singleton mass") {
    val rows = ops.Pipeline.x65(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = Tables.documents(spark, sf001).count()
    assert(rows.map(_._2).sum === nDocs)
    val dupTotal = ops.Llm.l1(spark, sf001).collect()
      .map(_.getLong(2)).filter(_ >= 2).sum
    assert(rows.map(_._3).sum === dupTotal, "dup mass = l1 groups >= 2")
    rows.foreach { r =>
      assert(r._1 >= 0 && r._1 <= 10)
      assert(math.abs(r._4 - r._3.toDouble / r._2) < 1e-3)
    }
  }

  test("x66 what-if: 4x2 config equals x63's occupancy totals; monotone in rows-per-band") {
    val rows = ops.Pipeline.x66(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map(t => t._1 -> t).toMap
    val x63 = ops.Pipeline.x63(spark, sf001).collect()
      .map(r => (r.getLong(2), r.getLong(4)))
    assert(rows("4x2")._2 === x63.map(_._1).sum, "bucket count vs x63")
    assert(rows("4x2")._4 === x63.map(_._2).sum, "pair mass vs x63")
    // fewer rows per band -> looser buckets -> more candidates
    assert(rows("8x1")._4 >= rows("4x2")._4)
    assert(rows("4x2")._4 >= rows("2x4")._4)
  }

  test("f20 try_* family: zero discounts null, casts and element_at match per-row recompute") {
    val got = ops.Scalars.f20(spark, sf001).collect()
    val src = Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
        $"l_discount", $"l_returnflag", $"l_linestatus").collect()
    assert(got.length === src.length)
    val zeros = src.count(_.getDouble(3) == 0.0)
    assert(zeros > 0, "fixture lost its zero discounts")
    assert(got.count(_.isNullAt(2)) === zeros)
    got.foreach { r =>
      if (r.getLong(0) % 1000 == 0) assert(r.isNullAt(3), "dirty row nulls")
      else assert(r.getInt(3) === r.getInt(1), "clean row casts")
      assert(r.getLong(4) === r.getLong(0), "orderkey round-trips")
      assert(r.isNullAt(6), "index 5 past end")
    }
    assert(got.exists(_.isNullAt(3)), "fixture has no %1000 dirty rows")
    val statuses = Tables.lineitem(spark, sf001)
      .select($"l_linestatus").distinct().collect().map(_.getString(0)).toSet
    assert(got.map(_.getString(5)).toSet === statuses)
  }

  test("s23 stickiness: mau >= dau, ratio in (0,1], mau covers trailing window") {
    val rows = ops.Events.s23(spark, sf001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val ud = Tables.events(spark, sf001)
      .select($"user_id", expr("(ts div 1000) div 86400000000")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._2)
    rows.foreach { case (day, dau, mau, st) =>
      assert(mau >= dau)
      assert(st > 0 && st <= 1.0)
      assert(math.abs(st - dau.toDouble / mau) < 1e-3)
    }
    // spot-check one day's mau against a driver recompute
    val days = byDay.keys.toSeq.sorted
    val d0 = days.last
    val expect = ud.filter(p => p._2 <= d0 && p._2 >= d0 - 27)
      .map(_._1).distinct.length.toLong
    val got = rows.find(_._1 == java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(d0)).toString).map(_._3)
    assert(got === Some(expect), s"mau at day $d0")
  }

  test("u12 joinWith equals the flat SQL join") {
    val sql = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_name",
        graft.Det.dec2($"o_totalprice").cast("double").as("o_total"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val got = ops.Udfs.u12(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === sql)
    assert(got.nonEmpty)
  }

  test("s24 conversion lag: cohorts cover signup users, quantiles ordered") {
    val rows = ops.Events.s24(spark, sf001).collect()
    assert(rows.nonEmpty)
    val signupUsers = Tables.events(spark, sf001)
      .filter($"event_type" === "signup")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === signupUsers,
      "every user with a signup lands in exactly one cohort")
    rows.foreach { r =>
      val (nu, nc) = (r.getLong(1), r.getLong(2))
      assert(nc <= nu)
      assert(math.abs(r.getDouble(3) - nc.toDouble / nu) < 1e-4)
      if (nc > 0) {
        val (p25, p50, p90) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(p25 >= 0 && p25 <= p50 && p50 <= p90, r.toString)
      } else assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("x67 approx vocab: HLL estimate certified within 5% of exact, per lang") {
    val rows = ops.Pipeline.x67(spark, sf001).collect()
    assert(rows.length === 5, "one row per fixture language")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getInt(2) === 1,
        s"lang ${r.getString(0)}: estimate strayed past the declared 5%")
    }
  }

  test("x68 context curve: monotone in context length, fractions consistent") {
    val rows = ops.Pipeline.x68(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(64, 128, 256, 512, 1024))
    val nd = Tables.documents(spark, sf001).count()
    val tt = Tables.documents(spark, sf001)
      .select(size(split($"text", " ")).cast("bigint")).collect()
      .map(_.getLong(0)).sum
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) >= b.getLong(1), "docs truncated falls with length")
      assert(a.getLong(3) >= b.getLong(3), "tokens lost falls with length")
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1).toDouble / nd) < 1e-4)
      assert(math.abs(r.getDouble(4) - r.getLong(3).toDouble / tt) < 1e-4)
    }
  }

  test("x69 norm audit: bands partition the corpus, stats ordered") {
    val rows = ops.Pipeline.x69(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sf001).count())
    rows.foreach { r =>
      val (band, mn, mx, mean) =
        (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= mx && mean >= mn - 1e-4 && mean <= mx + 1e-4)
      assert(math.floor(mn * 10).toInt === band, r.toString)
      assert(math.floor(mx * 10).toInt === band, r.toString)
    }
  }

  test("x70 BPE merge fold: greedy-left on adversarial symbol runs") {
    // (sym, p1, p2, expected): equal-symbol runs merge leftmost
    // non-overlapping; a pair must NEVER match across a symbol boundary
    // (the 'h x' tail of symbol 'th' case); merged tails don't re-match.
    val cases = Seq(
      ("a a a", "a", "a", "aa a"),
      ("a a a a a", "a", "a", "aa aa a"),
      ("x h x h x", "h", "x", "x hx hx"),
      ("a th x", "h", "x", "a th x"),
      ("t h e", "t", "h", "th e"),
      ("th e", "th", "e", "the"),
      ("ab b b", "ab", "b", "abb b"),
      ("q", "q", "q", "q"))
    cases.foreach { case (sym, p1, p2, want) =>
      val got = spark.sql(
        s"SELECT ${ops.Pipeline.BpeMergeExpr} AS m FROM VALUES " +
        s"('$sym', '$p1', '$p2') AS t(sym, p1, p2)").head().getString(0)
      assert(got === want, s"fold('$sym', '$p1'+'$p2')")
    }
  }

  test("x70 BPE train: 3 rounds, round 1 equals the brute-force top pair") {
    val rows = ops.Pipeline.x70(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getString(2) === r.getString(1).replace(" ", ""))
      assert(r.getLong(3) > 0)
    }
    // brute-force round 1: char-pair counts weighted by word frequency
    val wc = Tables.documents(spark, sf001)
      .select(explode(split($"text", " ")).as("w"))
      .collect().map(_.getString(0)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val pairCnt = wc.toSeq.flatMap { case (w, c) =>
      w.sliding(2).map(p => (s"${p(0)} ${p(1)}", c)) }
      .groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
    val top = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert((rows(0).getString(1), rows(0).getLong(3)) === top)
  }

  test("x71 vocab growth: cumulative curves reconcile with corpus totals") {
    val rows = ops.Pipeline.x71(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 9L))
    val totalToks = Tables.documents(spark, sf001)
      .select(size(split($"text", " ")).cast("bigint")).collect()
      .map(_.getLong(0)).sum
    val vocab = Tables.documents(spark, sf001)
      .select(explode(split($"text", " ")).as("t"))
      .distinct().count()
    assert(rows.last.getLong(2) === totalToks, "cum_tokens covers the corpus")
    assert(rows.last.getLong(4) === vocab, "cum_types reaches the vocabulary")
    assert(rows.map(_.getLong(3)).sum === vocab)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) === a.getLong(2) + b.getLong(1))
      assert(b.getLong(4) === a.getLong(4) + b.getLong(3))
    }
  }

  test("s25 EWMA anomaly: head has no level, a middle row recomputes") {
    val rows = ops.Events.s25(spark, sf001).collect()
    assert(rows.length >= 10)
    assert(rows(0).isNullAt(2) && rows(0).getInt(4) === 0,
      "day 1 has no history")
    assert(rows.drop(1).forall(!_.isNullAt(2)))
    val wts = Seq(3000000L, 2100000L, 1470000L, 1029000L, 720300L, 504210L,
      352947L)
    val cnts = rows.map(_.getLong(1))
    for (i <- Seq(3, 10, rows.length - 1)) {
      val k = math.min(i, 7)
      val num = (1 to k).map(j => cnts(i - j) * wts(j - 1)).sum
      val den = (1 to k).map(j => wts(j - 1)).sum
      val want = math.floor(num.toDouble / den.toDouble * 1e4 + 0.5) / 1e4
      assert(math.abs(rows(i).getDouble(2) - want) < 1.1e-4, s"row $i")
      assert(rows(i).getInt(4) ===
        (if (cnts(i).toDouble > 2.0 * rows(i).getDouble(2)) 1 else 0))
    }
  }

  test("s26 linear attribution: credit mass equals credited conversions") {
    val rows = ops.Events.s26(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("click", "view"))
    rows.foreach(r => assert(r.getLong(1) > 0 && r.getLong(2) > 0))
    // every credited conversion hands out EXACTLY round4(1/n) × n ≈ 1
    val credited = {
      val ev = Tables.events(spark, sf001)
        .select($"event_id", $"user_id", expr("ts div 1000").as("us"),
          $"event_type")
      val t = ev.filter($"event_type".isin("click", "view"))
        .select($"user_id", $"us".as("t_us"))
      ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("c_id"), $"us".as("c_us"))
        .join(t, Seq("user_id"))
        .filter($"t_us" < $"c_us" && $"t_us" >= $"c_us" - lit(604800000000L))
        .select("c_id").distinct().count()
    }
    val totalCredit = rows.map(_.getDouble(3)).sum
    assert(math.abs(totalCredit - credited) < credited * 5e-4 + 1e-3,
      s"credit mass $totalCredit vs $credited credited conversions")
  }

  test("r20 local bridges: complement of triangle support, ends reconcile") {
    // sf0.01: sf0.001's co-purchase graph is so dense EVERY edge is
    // triangle-supported (verified brute force — 8,899 edges, 0 bridges),
    // so the zero-row result there is correct but vacuous
    val rows = ops.Rdf.r20(spark, sf01).collect()
    assert(rows.nonEmpty)
    // bridge-end mass = 2 × bridge-edge count, recomputed brute force
    val li = Tables.lineitem(spark, sf01)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val edges = li.join(li.select($"ok".as("ok2"), $"p".as("p2")),
        $"ok" === $"ok2" && $"p" < $"p2")
      .select($"p".as("u"), $"p2".as("v")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, g) => (n, g.map(_._2).toSet) }
    val bridgeEdges = edges.filter { case (u, v) =>
      (adj(u) & adj(v)).isEmpty }
    assert(rows.map(_.getLong(2)).sum === 2L * bridgeEdges.size)
    val wantEnds = bridgeEdges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, g) => (n, g.size.toLong) }
    rows.foreach { r =>
      assert(wantEnds(r.getLong(0)) === r.getLong(2), r.toString)
      assert(adj(r.getLong(0)).size === r.getLong(1), "degree column")
    }
  }

  test("x72 BPE compression: monotone mass, saved = round-count of merges") {
    val rows = ops.Pipeline.x72(spark, sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    // round-0 mass = total chars of length>=2 corpus words
    val m0 = Tables.documents(spark, sf001)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") >= 2)
      .agg(sum(length($"w"))).head().getLong(0)
    assert(rows(0).getLong(1) === m0)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) < a.getLong(1), "each merge round reduces mass")
    }
    rows.foreach { r =>
      assert(r.getLong(2) === m0 - r.getLong(1))
      assert(math.abs(r.getDouble(3) - r.getLong(1).toDouble / m0) < 1e-4)
    }
    // each round's mass drop = that round's merge count (one symbol saved
    // per merged occurrence) — x70's counts are pair OCCURRENCES, merges
    // are the greedy non-overlapping subset, so drop <= count
    val tops = ops.Pipeline.x70(spark, sf001).collect()
    rows.sliding(2).zip(tops.iterator).foreach { case (Array(a, b), t) =>
      assert(a.getLong(1) - b.getLong(1) <= t.getLong(3), t.toString)
    }
  }

  test("s27 sequence funnel: stage counts nest and match brute force") {
    val rows = ops.Events.s27(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_signup", "2_click_24h", "3_purchase_24h"))
    val Array(n1, n2, n3) = rows.map(_.getLong(1))
    assert(n1 >= n2 && n2 >= n3 && n2 > 0, s"$n1/$n2/$n3")
    // brute force per user over collected events
    val evs = Tables.events(spark, sf001)
      .select($"user_id", expr("ts div 1000").as("us"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val d = 86400000000L
    val byUser = evs.groupBy(_._1)
    val want = byUser.values.map { es =>
      val fs = es.filter(_._3 == "signup").map(_._2).minOption
      val fc = fs.flatMap(f => es.filter(e => e._3 == "click"
        && e._2 > f && e._2 <= f + d).map(_._2).minOption)
      val fp = fc.flatMap(c => es.filter(e => e._3 == "purchase"
        && e._2 > c && e._2 <= c + d).map(_._2).minOption)
      (fs.isDefined, fc.isDefined, fp.isDefined)
    }.toSeq
    assert((n1, n2, n3) === (want.count(_._1).toLong,
      want.count(_._2).toLong, want.count(_._3).toLong))
    assert(rows(1).getDouble(2) > 0 && rows(0).isNullAt(2))
  }

  test("r21 truss: equals brute-force peeling, cascade visible") {
    val rows = ops.Rdf.r21(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: materialize edges, peel twice, recount
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    var edges = li.join(li.select($"ok".as("ok2"), $"p".as("p2")),
        $"ok" === $"ok2" && $"p" < $"p2")
      .select($"p".as("u"), $"p2".as("v")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (n, g) => (n, g.map(_._2).toSet) }
      es.toSeq.map(e => e -> (adj(e._1) & adj(e._2)).size.toLong).toMap
    }
    (1 to ops.Rdf.TrussPeels).foreach { _ =>
      val s = support(edges)
      edges = edges.filter(e => s(e) >= 2)
    }
    val fin = support(edges)
    assert(rows.keySet === edges)
    edges.foreach(e => assert(rows(e) === fin(e), e.toString))
    // the peel is not vacuous at this SF: something must have been dropped
    assert(rows.nonEmpty)
  }

  test("m7 media dedup: all-groups inventory reconciles item mass") {
    val rows = ops.Media.m7(spark, sf001).collect()
    val items = Tables.documents(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum === items)
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(5) === (r.getLong(1) - 1) * r.getInt(4), r.toString)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 3)
    }
  }

  test("r22 label propagation equals brute-force min-label flooding") {
    val rows = ops.Rdf.r22(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = Tables.lineitem(spark, sf001)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    val edges = li.join(li.select($"ok".as("ok2"), $"p".as("p2")),
        $"ok" === $"ok2" && $"p" < $"p2")
      .groupBy($"p".as("u"), $"p2".as("v")).agg(count(lit(1)).as("sup"))
      .filter($"sup" >= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, g) => (n, g.map(_._2)) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to ops.Rdf.LabelPropRounds).foreach { _ =>
      lbl = lbl.map { case (n, l) => n -> math.min(l, adj(n).map(lbl).min) }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, g) => (l, g.size.toLong) }
    assert(rows.keySet === lbl.keySet)
    assert(rows.nonEmpty)
    lbl.foreach { case (n, l) => assert(rows(n) === ((l, sizes(l))), n.toString) }
    // the mesoscale claim (many round-3 basins) holds at sf0.01 — 186
    // labels over 1,880 nodes, measured in the key's scaladoc — but the
    // 200-node sf0.001 support-2 subgraph floods to one label in 3
    // rounds, so this fixture asserts only brute-force equality
  }

  test("x73 approx quantile: flags certify the sketch, exact values match s19") {
    val rows = ops.Sketches.x73(spark, sf001).collect()
    assert(rows.nonEmpty)
    val s19 = ops.Events.s19(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(5))).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) <= r.getDouble(3), s"$t: p50 > p95")
      assert(r.getDouble(2) === s19(t)._1, s"$t: p50 drifted from s19")
      assert(r.getDouble(3) === s19(t)._2, s"$t: p95 drifted from s19")
      assert(r.getInt(4) === 1, s"$t: approx p50 strayed past its rank band")
      assert(r.getInt(5) === 1, s"$t: approx p95 strayed past its rank band")
    }
  }
}
