package graft

/** Fixture contract (SURVEY.md §5.2-6): schemas and row counts asserted on
  * read so a testdata change is detected, not silently absorbed.
  */
class FixtureContractSpec extends SparkSpec {

  private val expectedCounts = Map(
    "region" -> 5L, "nation" -> 25L, "supplier" -> 10L, "customer" -> 150L,
    "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L, "events" -> 1000L,
    "documents" -> 500L, "embeddings" -> 500L)

  test("row counts at sf0.001 match FIXTURES.md") {
    expectedCounts.foreach { case (name, n) =>
      val df =
        if (name == "events") Tables.events(spark, sf001)
        else spark.read.parquet(s"$sf001/$name.parquet")
      assert(df.count() === n, s"table $name")
    }
  }

  test("key schemas") {
    val li = Tables.lineitem(spark, sf001).schema
    assert(li.fieldNames.toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    val emb = Tables.embeddings(spark, sf001).schema
    assert(emb("embedding").dataType.typeName == "array")
  }

  test("events.ts reads as epoch-nanosecond longs under nanosAsLong") {
    val e = Tables.events(spark, sf001)
    assert(e.schema("ts").dataType.typeName == "long")
    val ts = e.selectExpr("min(ts)", "max(ts)").head()
    // 2024-01-01..2024-01-30 in epoch-ns
    assert(ts.getLong(0) >= 1704067200000000000L)
    assert(ts.getLong(1) < 1706659200000000000L)
  }

  test("lineitem (l_orderkey, l_linenumber) is NOT unique — guards rule D1 sorts") {
    val dups = Tables.lineitem(spark, sf001)
      .groupBy("l_orderkey", "l_linenumber").count().filter("count > 1").count()
    assert(dups > 0)
  }

  test("l_linenumber fits 3 bits — guards r7's packed node-id encoding") {
    val r = Tables.lineitem(spark, sf001)
      .selectExpr("min(l_linenumber)", "max(l_linenumber)").head()
    assert(r.getInt(0) >= 0 && r.getInt(1) <= 7)
  }

  test("documents.text is pure ASCII — guards m3's char-prefix == byte-prefix oracle") {
    // m3 slices the first 64 BYTES of the media blob; its DuckDB oracle can
    // only slice VARCHAR characters (md5/substring are VARCHAR-only there).
    // The two agree iff every text is single-byte — assert it so a future
    // fixture with multi-byte chars fails HERE, not as an m3 hash drift.
    val nonAscii = Tables.documents(spark, sf001)
      .filter("length(text) <> octet_length(encode(text, 'UTF-8'))").count()
    assert(nonAscii === 0L)
    val nonAscii01 = Tables.documents(spark, "/root/testdata/sf0.01")
      .filter("length(text) <> octet_length(encode(text, 'UTF-8'))").count()
    assert(nonAscii01 === 0L)
  }
}
