package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2-3) on small generated relations.
  * Uses ScalaCheck generators with fixed seeds (no scalatestplus bridge in
  * the offline dependency set), 10 cases per property.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyList: Gen[List[Int]] = Gen.listOfN(30, Gen.choose(0, 9))

  test("join algebra: |A ⋈ B| = Σ_k cntA(k)·cntB(k); semi ∪ anti partitions A") {
    cases(Gen.zip(keyList, keyList)).foreach { case (as, bs) =>
      val a = as.zipWithIndex.toDF("k", "ida")
      val b = bs.zipWithIndex.toDF("k2", "idb")
      val inner = a.join(b, $"k" === $"k2").count()
      val expected = as.groupBy(identity).map { case (k, g) =>
        g.size.toLong * bs.count(_ == k)
      }.sum
      assert(inner === expected)
      val semi = a.join(b, $"k" === $"k2", "left_semi").count()
      val anti = a.join(b, $"k" === $"k2", "left_anti").count()
      assert(semi + anti === as.size.toLong)
    }
  }

  test("row_number over a unique order is a permutation of 1..n") {
    cases(keyList).foreach { xs =>
      val df = xs.zipWithIndex.toDF("v", "id")
      val rns = df.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy($"v", $"id")))
        .select("rn").as[Int].collect().sorted.toSeq
      assert(rns == (1 to xs.size))
    }
  }

  test("connected components equal in-memory union-find on random graphs") {
    // DedupCluster's hook+shortcut fixpoint vs a 20-line reference
    // union-find — random edge lists, not just chains and fixtures, so a
    // propagation bug that happens to cancel on structured graphs fails
    // here (8 graphs ≤ 40 nodes keep the Spark-job count test-friendly).
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    cases(edgeGen, n = 8).foreach { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min node id of the component
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.groupBy(find).flatMap { case (_, members) =>
        val m = members.min
        members.map(_ -> m)
      }
      val got = ops.DedupCluster.components(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"edges: $edges")
    }
  }

  test("r7's PageRank rounds equal in-memory integer iteration on random cyclic graphs") {
    // The fixture FK graph is ACYCLIC (layered l→o→c→n→r), so cycles,
    // self-loops, and rank feedback never exercise the declared query's
    // machinery. Random directed multigraphs here include all three; the
    // reference is a 15-line Long-arithmetic loop (6 graphs ≤ 20 nodes
    // keep the 3-round × 2-join Spark-job count test-friendly).
    val edgeGen = Gen.listOfN(30, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .suchThat(_.nonEmpty)
    cases(edgeGen, n = 6).foreach { edges =>
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val ed = edges.map { case (s, t) => (s, t, deg(s)) }.toDF("src", "dst", "d")
      var prDf: Option[org.apache.spark.sql.DataFrame] = None
      (1 to ops.Rdf.PageRankIters).foreach { i =>
        prDf = Some(ops.Rdf.r7Step(ed, prDf.map((_, ops.Rdf.defaultRank(i - 1)))))
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val got = nodes.toDF("node")
        .join(prDf.get.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select($"node",
          coalesce($"pr", lit(ops.Rdf.defaultRank(ops.Rdf.PageRankIters))).as("pr"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var pr = nodes.map(_ -> ops.Rdf.defaultRank(0)).toMap
      (1 to ops.Rdf.PageRankIters).foreach { _ =>
        val sums = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        edges.foreach { case (s, t) => sums(t) += pr(s) / deg(s) }
        pr = nodes.map(n => n ->
          (if (sums.contains(n)) 150000000000L + sums(n) * 17L / 20L
           else 150000000000L)).toMap
      }
      // round 1 in-memory uses init for all; later rounds base for no-in-edge
      // nodes — both encoded above exactly as the COALESCE defaults
      assert(got === pr, s"edges: $edges")
    }
  }

  test("round4fast is bit-identical to builtin round(,4) on random and adversarial doubles") {
    // the fast path must NEVER flip a value vs Spark's BigDecimal round —
    // fuzz across magnitudes plus hand-built adversaries: exact .00005
    // ties (k odd / 2·10⁴), ±1-ulp nudges around them, ±0, subnormal-ish,
    // beyond-long-floor magnitudes, NaN/±Inf, and the classic 2.675
    // shortest-repr case
    val magGen = Gen.oneOf(1e-6, 1e-3, 1.0, 1e3, 1e7, 1e11)
    val rGen = Gen.listOfN(2000,
      Gen.zip(Gen.choose(-1.0, 1.0), magGen).map { case (x, m) => x * m })
    val adversarial: Seq[Double] = Seq(1L, 3L, 12345L, 99999L, 1000001L)
      .flatMap { k =>
        val v = k / 2e4
        Seq(v, -v, Math.nextUp(v), Math.nextDown(v),
          -Math.nextUp(v), -Math.nextDown(v))
      } ++ Seq(0.0, -0.0, 1e-300, -1e-300, 1e15, -1e15, 2.675, -2.675,
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    cases(rGen, n = 5).foreach { xs =>
      val all = xs ++ adversarial
      val rows = all.toDF("x")
        .select($"x", Det.round4fast($"x").as("f"), round($"x", 4).as("b"))
        .collect()
      rows.foreach { r =>
        val (x, f, b) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        assert(java.lang.Double.doubleToLongBits(f) ===
          java.lang.Double.doubleToLongBits(b), s"x=$x fast=$f builtin=$b")
      }
    }
  }

  test("decimal sum is invariant under repartitioning") {
    cases(Gen.listOfN(50, Gen.choose(-10000, 10000))).foreach { cents =>
      val df = cents.map(c => c / 100.0).toDF("x")
      val sums = Seq(1, 3, 7).map { n =>
        df.repartition(n).agg(sum(Det.dec2($"x"))).head().getDecimal(0)
      }
      assert(sums.distinct.size === 1)
    }
  }

  test("exact dedup fixpoint: grouping survivors again changes nothing") {
    cases(Gen.listOfN(40, Gen.oneOf("aa", "bb", "cc", "dd"))).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = docs.groupBy(md5(lower(trim($"text")).cast("binary")).as("h"))
        .agg(min("doc_id").as("survivor"))
      val twice = once.groupBy("h").agg(min("survivor").as("survivor"))
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("TopKPerGroup equals sort-and-take on random data (custom exec property)") {
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0, 4), Gen.choose(0, 20)))
    cases(gen).foreach { rows =>
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id").repartition(3)
      val custom = graft.plans.TopKPerGroup(df, Seq("g"),
        Seq(("v", true), ("id", false)), 2)
        .select("g", "v", "id").collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val expected = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
        .groupBy(_._1).values.flatMap(group =>
          group.sortBy(t => (-t._2, t._3)).take(2)).toSet
      assert(custom === expected)
    }
  }

  test("SetSim bitmask path equals array path on generated token sets") {
    val word = Gen.oneOf((0 until 40).map(i => s"w$i")) // >63 when big, <63 when small
    val doc = Gen.listOfN(8, word)
    cases(Gen.listOfN(20, doc)).foreach { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) =>
        (i.toLong, "xx", ws.distinct.toArray)
      }.toDF("doc_id", "lang", "toks")
      val enc = graft.ops.SetSim.tokenSets(df)
      val viaSetSim = graft.ops.SetSim.pairs(enc, blocks = 4)
        .select("a_id", "b_id", "inter", "uni")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      val sets = docs.map(_.distinct.toSet).zipWithIndex
      val expected = (for {
        (sa, ia) <- sets; (sb, ib) <- sets if ia < ib
      } yield (ia.toLong, ib.toLong, (sa & sb).size, (sa | sb).size)).toSet
      assert(viaSetSim === expected)
    }
  }

  test("prefixCandidates has exact recall at t=9/10 on generated token sets") {
    val word = Gen.oneOf((0 until 12).map(i => s"w$i"))
    val doc = Gen.listOfN(8, word)
    cases(Gen.listOfN(15, doc)).foreach { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) =>
        (i.toLong, "xx", ws.distinct.toArray)
      }.toDF("doc_id", "lang", "toks")
      val cand = graft.ops.SetSim.prefixCandidates(df, 9, 10)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = docs.map(_.distinct.toSet).zipWithIndex
      val mustFind = for {
        (sa, ia) <- sets; (sb, ib) <- sets
        if ia < ib && 10 * (sa & sb).size >= 9 * (sa | sb).size
      } yield (ia.toLong, ib.toLong)
      mustFind.foreach { p =>
        assert(cand.contains(p), s"pair $p with j >= 0.9 missed by prefix filter")
      }
    }
  }

  test("SignBands codegen expression equals the HOF formulation on random vectors") {
    import org.apache.spark.sql.functions.expr
    val vec = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0))
    cases(Gen.listOfN(12, vec)).foreach { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "emb")
      val got = df.select($"id",
          graft.functions.SignBands.signBands($"emb", 16, 4).as("b"))
        .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
      val want = df.select($"id", expr(
          """transform(sequence(0, 15), k -> aggregate(sequence(0, 3), 0L,
            | (acc, j) -> acc + CASE WHEN emb[4*k + j] > 0D
            |   THEN cast(shiftleft(1, j) as bigint) ELSE 0L END))""".stripMargin).as("b"))
        .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
      assert(got == want)
    }
  }

  test("SortedIntersectCount equals size(array_intersect) on random sorted distinct arrays") {
    import org.apache.spark.sql.functions.{array_intersect, size}
    // draws from a small id pool so overlaps are common; empty arrays and
    // disjoint / identical pairs all arise across the generated cases
    val ids = Gen.chooseNum(0L, 40L)
    val arr = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, ids))
      .map(_.distinct.sorted)
    cases(Gen.listOfN(12, Gen.zip(arr, arr))).foreach { pairs =>
      val df = pairs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a.toArray, b.toArray) }
        .toDF("id", "a", "b")
      val got = df.select($"id",
          graft.functions.SortedIntersectCount
            .sortedIntersectCount($"a", $"b").as("c"))
        .orderBy("id").as[(Long, Int)].collect().toSeq
      val want = df.select($"id", size(array_intersect($"a", $"b")).as("c"))
        .orderBy("id").as[(Long, Int)].collect().toSeq
      assert(got == want)
    }
  }

  test("NGrams(3) codegen expression equals the HOF formulation on random token lists") {
    import org.apache.spark.sql.functions.expr
    val word = Gen.oneOf((0 until 6).map(i => s"w$i"))
    // lengths 0-5 cover the <3-token empty-array edge both sides of 3
    val doc = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, word))
    cases(Gen.listOfN(12, doc)).foreach { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.toArray) }
        .toDF("id", "w")
      val got = df.select($"id",
          graft.functions.NGrams.ngrams($"w", 3).as("t"))
        .orderBy("id").as[(Long, Seq[String])].collect().toSeq
      val want = df.select($"id", expr(
          """CASE WHEN size(w) >= 3 THEN transform(sequence(0, size(w) - 3),
            |  i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin).as("t"))
        .orderBy("id").as[(Long, Seq[String])].collect().toSeq
      assert(got == want)
      // and the bigram width x13 uses, against the same HOF shape
      val got2 = df.select($"id",
          graft.functions.NGrams.ngrams($"w", 2).as("t"))
        .orderBy("id").as[(Long, Seq[String])].collect().toSeq
      val want2 = df.select($"id", expr(
          """CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2),
            |  i -> concat(w[i], ' ', w[i+1]))
            |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin).as("t"))
        .orderBy("id").as[(Long, Seq[String])].collect().toSeq
      assert(got2 == want2)
    }
  }

  test("k-means property: one Lloyd step never increases SSE (random vectors)") {
    val vecGen = Gen.listOfN(12, Gen.listOfN(4, Gen.choose(-100, 100)))
    cases(vecGen, n = 5).foreach { vs =>
      val df = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toDouble / 10.0)) }
        .toDF("id", "emb")
      val sse0 = ops.KMeansCodebook.sse(df, ops.KMeansCodebook.train(df, 3, 0))
      val sse1 = ops.KMeansCodebook.sse(df, ops.KMeansCodebook.train(df, 3, 1))
      val sse2 = ops.KMeansCodebook.sse(df, ops.KMeansCodebook.train(df, 3, 2))
      assert(sse1 <= sse0 + 1e-9 && sse2 <= sse1 + 1e-9,
        s"SSE not monotone: $sse0 -> $sse1 -> $sse2")
    }
  }

  test("transitive-closure property: chain graph of length n yields n*(n+1)/2 paths") {
    // r5's unrolled-join closure shape over a synthetic chain 0->1->...->n
    cases(Gen.choose(2, 4), n = 3).foreach { n =>
      val edges = (0 until n).map(i => (s"v$i", s"v${i + 1}")).toDF("src", "dst")
      val hop = edges.select($"src".as("e_src"), $"dst".as("e_dst"))
      def extend(p: org.apache.spark.sql.DataFrame) =
        p.join(hop, $"dst" === $"e_src")
          .select($"src", $"e_dst".as("dst"), ($"depth" + 1).as("depth"))
      val p1 = edges.withColumn("depth", lit(1))
      val p2 = extend(p1); val p3 = extend(p2); val p4 = extend(p3)
      val closure = p1.union(p2).union(p3).union(p4)
        .groupBy($"src", $"dst").agg(min($"depth").as("depth"))
      // a chain of n edges has n + (n-1) + ... + 1 bounded-by-4 paths
      val expected = (1 to n).map(len => math.max(0, n - len + 1))
        .zipWithIndex.collect { case (c, i) if i < 4 => c }.sum
      assert(closure.count() === expected.toLong)
    }
  }

  test("x30 entropy matches in-memory formula and information-theory bounds on random docs") {
    val wordGen: Gen[List[String]] =
      Gen.listOfN(40, Gen.oneOf("a", "b", "c", "dd", "ee", "fff"))
    val docsWords = cases(wordGen, 8).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws) }
    val dir = java.nio.file.Files.createTempDirectory("graft-x30p-").toString
    docsWords.map { case (id, ws) => (id, ws.mkString(" "), "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = ops.Pipeline.x30(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy"))).toMap
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    docsWords.foreach { case (id, ws) =>
      val counts = ws.groupBy(identity).map(_._2.length.toLong)
      val n = ws.length.toLong
      val sclnc = counts.map(c => q9(c * math.log(c.toDouble))).sum
      val h = math.log(n.toDouble) - sclnc.toDouble / n
      assert(got(id)._1 === r4(h), s"doc $id entropy")
      val d = counts.size
      val expNorm = if (d > 1) r4(h / math.log(d.toDouble)) else 0.0
      assert(got(id)._2 === expNorm, s"doc $id norm_entropy")
      // bounds: 0 <= H <= ln(distinct) (+rounding slack), norm in [0, 1]
      assert(got(id)._1 >= -1e-4 && got(id)._1 <= math.log(d.toDouble) + 1e-4)
      assert(got(id)._2 >= 0.0 && got(id)._2 <= 1.0 + 1e-9)
    }
  }

  test("session-window invariant on fixture: events conserved, gaps ≥ 30 min") {
    val s3 = ops.Events.s3(spark, sf001)
    val total = s3.agg(sum("cnt")).head().getLong(0)
    assert(total === Tables.events(spark, sf001).count())
    // consecutive sessions of the same user must start > prev end (gap rule)
    val rows = s3.orderBy("user_id", "session_start").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(!b.getTimestamp(1).before(a.getTimestamp(2)))
      case _ =>
    }
  }

  test("ntileBucket arithmetic equals Spark's ntile for adversarial (n, k)") {
    // w8's distributed decile rests on this arithmetic; cover the shapes
    // the fixture can't hit — n < k, n = k, n % k = 0, primes, k != 10
    val shapes = Seq((1, 10), (5, 10), (10, 10), (7, 3), (95, 10),
      (100, 10), (101, 10), (256, 7), (13, 13), (40, 4))
    shapes.foreach { case (n, k) =>
      val df = (1 to n).toDF("pos").withColumn("n_total", lit(n).cast("bigint"))
      val ours = df
        .withColumn("b", ops.Windows.ntileBucket("pos", "n_total", k))
        .orderBy("pos").select("b").as[Int].collect().toSeq
      val w = org.apache.spark.sql.expressions.Window.orderBy("pos")
      val builtin = df.withColumn("b", ntile(k).over(w))
        .orderBy("pos").select("b").as[Int].collect().toSeq
      assert(ours === builtin, s"(n=$n, k=$k)")
    }
  }

  test("weighted-median crossing: window AND distributed forms equal brute force") {
    // random weighted levels over 2 groups; lower weighted median by
    // definition = first value (ascending) where 2*cumWeight >= totWeight
    val gen = Gen.listOfN(25,
      Gen.zip(Gen.oneOf("A", "B"), Gen.choose(0, 15), Gen.choose(1L, 9L)))
    cases(gen).foreach { rows =>
      val lv = rows.toDF("l_returnflag", "v", "w0")
        .groupBy($"l_returnflag", $"v").agg(sum($"w0").as("w"))
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val tot = byV.map(_._2).sum
        val cums = byV.scanLeft((0, 0L)) { case ((_, c), (v, w)) => (v, c + w) }.tail
        g -> cums.find { case (_, c) => 2 * c >= tot }.get._1
      }
      // window form (a20/a22's inline shape)
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("v").rowsBetween(Long.MinValue, 0)
      val wTot = org.apache.spark.sql.expressions.Window.partitionBy("l_returnflag")
      val win = lv.withColumn("cum", sum($"w").over(wCum))
        .withColumn("tot", sum($"w").over(wTot))
        .filter($"cum" * 2 >= $"tot")
        .groupBy($"l_returnflag").agg(min($"v").as("med"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val dist = ops.Aggs.lowerMedianDistributed(lv, "v", "med")
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(win === expected)
      assert(dist === expected)
    }
  }

  test("BPE merge fold equals reference greedy-left merge on random symbol lists") {
    // Reference semantics (Sennrich BPE merge step): scan left to right,
    // replace each non-overlapping (p1, p2) adjacency with p1+p2.
    def refMerge(syms: List[String], p1: String, p2: String): List[String] = {
      val out = List.newBuilder[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case a :: b :: tl if a == p1 && b == p2 => out += a + b; rest = tl
        case a :: tl => out += a; rest = tl
        case Nil => ()
      }
      out.result()
    }
    // symbols from a tiny alphabet so runs and near-miss boundaries (the
    // 'h x' tail of a previously merged 'th' class) are common; pairs
    // drawn from the same alphabet INCLUDING already-merged 2-char
    // symbols to fuzz the suffix test across merge generations
    val sym = Gen.oneOf("a", "b", "ab", "ba", "aa", "x")
    val gen = Gen.zip(Gen.nonEmptyListOf(sym).map(_.take(12)),
      Gen.zip(sym, sym))
    cases(gen, n = 40).foreach { case (syms, (p1, p2)) =>
      val got = spark.sql(
        s"SELECT ${ops.Pipeline.BpeMergeExpr} AS m FROM VALUES " +
        s"('${syms.mkString(" ")}', '$p1', '$p2') AS t(sym, p1, p2)")
        .head().getString(0)
      assert(got === refMerge(syms, p1, p2).mkString(" "),
        s"fold(${syms.mkString("[", " ", "]")}, '$p1'+'$p2')")
    }
  }

  test("capability BPE trainer: 3-round prefix equals x70/x72, prefix k-invariant, converges") {
    // the declared keys ARE the trainer at k = BpeRounds: merges equal x70
    val t3 = ops.Pipeline.bpeTrain(spark, sf001, ops.Pipeline.BpeRounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val x70 = ops.Pipeline.x70(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(t3.map(t => (t._1, t._2, t._3, t._4)).toSeq === x70.toSeq)
    // ... and the per-round mass equals x72's curve at rounds 1..k
    val x72 = ops.Pipeline.x72(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    t3.foreach { t => assert(t._5 === x72(t._1), s"round ${t._1} mass") }
    // prefix is k-invariant and the top count never increases (a merge
    // only creates pairs bounded by the merged pair's own count)
    val t6 = ops.Pipeline.bpeTrain(spark, sf001, 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(t6.length === 6, "fixture must sustain 6 merge rounds")
    assert(t6.take(3).toSeq === t3.toSeq)
    t6.sliding(2).foreach(p => assert(p(0)._4 >= p(1)._4, "count monotone"))
    t6.sliding(2).foreach(p => assert(p(0)._5 > p(1)._5, "mass shrinks"))
    // convergence: an unreachable min-count stops before round 1
    assert(ops.Pipeline.bpeTrain(spark, sf001, 5, Long.MaxValue).count() === 0)
  }
}
