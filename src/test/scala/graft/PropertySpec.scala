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
}
