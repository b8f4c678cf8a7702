package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamTwins
import graft.streaming.StreamTwins.Event

/** Streaming ≡ batch equivalence (SURVEY.md §5.2-4): the fixture's events fed
  * incrementally through a MemoryStream must converge to the batch twin's
  * result; plus watermark late-data semantics on hand-built rows.
  */
class StreamTwinsSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureEvents: Seq[Event] =
    Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq

  test("file-source ingest: readStream over a watched parquet dir equals batch") {
    // The production ingest path (MemoryStream everywhere else is the unit
    // harness): files LANDING in a directory are the stream. Two chunks
    // written before/after the first micro-batch must both be picked up,
    // and the tumbling agg must converge to the batch result.
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-").toString
    val src = s"$dir/in"; val ck = s"$dir/ck"; val out = s"$dir/out"
    val events = fixtureEvents.sortBy(_.ts)
    val (first, rest) = events.splitAt(events.length / 2)
    first.toDF().write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val query = StreamTwins.tumbling(
        spark.readStream.schema(schema).parquet(src))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    try {
      query.processAllAvailable()
      rest.toDF().write.mode("append").parquet(src)
      // close every window: one event past max ts + watermark
      Seq(Event(-1L, events.last.ts + 3L * 3600 * 1000000000L,
        0L, "signup", 0.0)).toDF().write.mode("append").parquet(src)
      query.processAllAvailable()
      val sunk = spark.read.parquet(out)
        .filter($"window_start" <= timestamp_micros(lit(events.last.ts / 1000)))
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = StreamTwins.tumbling(events.toDF())
        .filter($"window_start" <= timestamp_micros(lit(events.last.ts / 1000)))
        .orderBy("window_start", "event_type").collect().toSeq
      assert(sunk.map(_.toSeq) == batch.map(_.toSeq))
      assert(sunk.nonEmpty)
    } finally query.stop()
  }

  test("incremental dedup: streamed verdicts reproduce x38's classification") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf001)
      .select($"doc_id", $"text").as[StreamTwins.Doc]
      .collect().toSeq.sortBy(_.doc_id)
    val (batch, corpus) = docs.partition(_.doc_id % 5 == 4)
    val stream = MemoryStream[StreamTwins.Doc]
    val query = StreamTwins.incrDedup(stream.toDF())
      .writeStream.format("memory").queryName("incrdedup")
      .outputMode("append").start()
    try {
      // the corpus lands first in two id-ordered chunks (the state store
      // becomes the persisted dedup index), then x38's ingest batch
      corpus.grouped(corpus.length / 2 + 1).foreach { c =>
        stream.addData(c); query.processAllAvailable()
      }
      stream.addData(batch)
      query.processAllAvailable()
      val all = spark.table("incrdedup")
        .as[StreamTwins.DedupVerdict].collect().toSeq
      assert(all.size === docs.size, "one verdict per document")
      val verdicts = all.map(v => v.doc_id -> v).toMap
      // batch-doc verdicts map exactly onto x38's three-way classification
      val x38 = ops.Pipeline.x38(spark, sf001).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(x38.nonEmpty)
      x38.foreach { case (id, (status, firstInBatch)) =>
        val v = verdicts(id)
        status match {
          case "dup_of_corpus" => // survivor lives in the corpus feed
            assert(v.status == "duplicate" && v.first_id % 5 != 4, s"doc $id: $v")
          case "dup_in_batch" => // survivor is x38's in-batch first
            assert(v.status == "duplicate" && v.first_id == firstInBatch,
              s"doc $id: $v")
          case "unique" =>
            assert(v.status == "unique" && v.first_id == id, s"doc $id: $v")
        }
      }
      // per hash group: exactly one unique = the first ARRIVAL (min corpus
      // id when the group touches the corpus — corpus fed first — else min
      // batch id), every other member a duplicate pointing at it
      all.groupBy(_.h).foreach { case (h, vs) =>
        val ids = vs.map(_.doc_id)
        val expectFirst = ids.filter(_ % 5 != 4) match {
          case c if c.nonEmpty => c.min
          case _ => ids.min
        }
        assert(vs.filter(_.status == "unique").map(_.doc_id) == Seq(expectFirst),
          s"hash $h")
        assert(vs.filter(_.doc_id != expectFirst)
          .forall(v => v.status == "duplicate" && v.first_id == expectFirst),
          s"hash $h")
      }
    } finally query.stop()
  }

  test("incremental NEAR-dup: streamed hits roll up to x57's classification") {
    implicit val sqlCtx = spark.sqlContext
    // the feed carries precomputed signatures (a real ingest pipeline
    // computes MinHash at the edge); band rows come from x57's exact
    // band projection over x1's signature frame
    val feed = StreamTwins.nearDupBandFeed(
      ops.Pipeline.x1Sig(spark, sf001), $"doc_id" % 5 === 4)
      .collect().toSeq.sortBy(_.doc_id)
    val (batchRows, corpusRows) = feed.partition(_.is_batch)
    val stream = MemoryStream[StreamTwins.BandRow]
    val query = StreamTwins.incrNearDup(stream.toDF()
        .as[StreamTwins.BandRow])
      .writeStream.format("memory").queryName("incrneardup")
      .outputMode("append").start()
    try {
      // corpus first (the state store becomes the persisted banded
      // index), then the ingest batch in TWO id-ordered chunks — the
      // first-arrival invariant says the split cannot change verdicts
      corpusRows.grouped(corpusRows.length / 2 + 1).foreach { c =>
        stream.addData(c); query.processAllAvailable()
      }
      batchRows.grouped(batchRows.length / 2 + 1).foreach { c =>
        stream.addData(c); query.processAllAvailable()
      }
      val hits = spark.table("incrneardup")
        .as[StreamTwins.NearDupHit].collect().toSeq
      // stateless downstream rollup: min partner per class, corpus wins
      val byDoc = hits.groupBy(_.doc_id)
      def verdict(id: Long): (String, Option[Long]) =
        byDoc.get(id) match {
          case Some(hs) =>
            val corpus = hs.filter(_.partner_is_corpus).map(_.partner)
            val inBatch = hs.filterNot(_.partner_is_corpus).map(_.partner)
            if (corpus.nonEmpty) ("dup_of_corpus", Some(corpus.min))
            else ("dup_in_batch", Some(inBatch.min))
          case None => ("unique", None)
        }
      val x57 = ops.Pipeline.x57(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
      assert(x57.nonEmpty)
      x57.foreach { case (id, status, partner) =>
        val (gs, gp) = verdict(id)
        assert(gs === status, s"doc $id status")
        assert(gp === partner, s"doc $id partner")
      }
      // and every streamed verdict belongs to a batch doc x57 scored
      assert(byDoc.keySet.subsetOf(x57.map(_._1).toSet))
    } finally query.stop()
  }

  test("tumbling window: streamed result equals batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val query = StreamTwins.tumbling(stream.toDF())
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    try {
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("tumb")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = StreamTwins.tumbling(
        events.toDF())
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("parquet file sink + checkpoint: append stream persists exactly-once across restart") {
    // The deployment shape a real pipeline runs: append-mode windowed agg →
    // parquet sink with a checkpointLocation. The checkpoint makes restarts
    // exactly-once: stopping after N batches and re-starting a NEW query off
    // the same checkpoint must not duplicate or lose finalized windows.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-").toString
    val ck = s"$dir/ck"; val out = s"$dir/out"
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    def startQuery() = StreamTwins.tumbling(stream.toDF())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = startQuery()
    try {
      val (first, rest) = events.splitAt(events.length / 2)
      stream.addData(first)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = startQuery() // restart from the same checkpoint
    try {
      stream.addData(events.drop(events.length / 2))
      q2.processAllAvailable()
      // close the last windows: an event past every fixture ts + watermark
      stream.addData(Seq(Event(-1L, events.last.ts + 3L * 3600 * 1000000000L,
        0L, "signup", 0.0)))
      q2.processAllAvailable()
      val sunk = spark.read.parquet(out)
        .filter($"window_start" <= timestamp_micros(lit(events.last.ts / 1000)))
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = StreamTwins.tumbling(events.toDF())
        .filter($"window_start" <= timestamp_micros(lit(events.last.ts / 1000)))
        .orderBy("window_start", "event_type").collect().toSeq
      // append mode emits each finalized window exactly once, so the sink's
      // parquet contents equal the batch result over the closed windows
      assert(sunk == batch)
      assert(sunk.nonEmpty)
    } finally q2.stop()
  }

  test("mapGroupsWithState per-user totals equal batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val query = StreamTwins.userTotals(stream.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // update mode emits one row per key per batch: keep the last per key
      val streamed = spark.table("totals")
        .groupBy("user_id").agg(max("cnt").as("cnt"))
        .orderBy("user_id").as[(Long, Long)].collect().toSeq
      val batch = events.toDF().groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy("user_id").as[(Long, Long)].collect().toSeq
      assert(streamed == batch)
    } finally query.stop()
  }

  test("streaming funnel (mapGroupsWithState) equals batch s5 under shuffled arrival") {
    implicit val sqlCtx = spark.sqlContext
    // conditional minima are order-insensitive: shuffle arrival deliberately
    val events = new scala.util.Random(42).shuffle(fixtureEvents)
    val stream = MemoryStream[Event]
    val query = StreamTwins.funnel(stream.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // update mode re-emits a user's row per batch; event_cnt is monotone,
      // so the max-cnt row per user is the final state
      val streamed = spark.table("funnel")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(col("event_cnt").desc)))
        .filter(col("rn") === 1).drop("rn")
        .select("user_id", "first_signup", "first_purchase", "event_cnt", "converted")
        .orderBy("user_id").collect().toSeq
      val batch = ops.Events.s5(spark, sf001)
        .select("user_id", "first_signup", "first_purchase", "event_cnt", "converted")
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming strict-sequence funnel equals batch s27 under randomized splits") {
    implicit val sqlCtx = spark.sqlContext
    // the twin's contract is an event-time-ordered feed; the SPLIT POINTS
    // are randomized (seeded) so micro-batch boundaries land between every
    // kind of step pair — with ~100 chunks over 5k+ events, many users'
    // signup→click and click→purchase boundaries are crossed mid-step
    val events = fixtureEvents.sortBy(e => (e.ts, e.event_id))
    val batchRows = ops.Events.s27(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(7, 14).foreach { seed =>
      val r = new scala.util.Random(seed)
      val stream = MemoryStream[Event]
      val query = StreamTwins.seqFunnel(stream.toDS())
        .writeStream.format("memory").queryName(s"seqfunnel$seed")
        .outputMode("update").start()
      try {
        var rest = events
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + r.nextInt(50))
          stream.addData(chunk)
          query.processAllAvailable()
          rest = tail
        }
        // update mode re-emits per batch; event_cnt is monotone, so the
        // max-cnt row per user is the final state. Stage conversions are
        // pure functions of the three stage counts, so count equality is
        // full-output equality with batch s27.
        val snap = spark.table(s"seqfunnel$seed")
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("user_id")
              .orderBy(col("event_cnt").desc)))
          .filter(col("rn") === 1)
        val counts = snap.agg(
            count(col("first_signup")).as("n1"),
            count(col("first_click_24h")).as("n2"),
            count(col("first_purchase_24h")).as("n3"))
          .collect().head
        assert(counts.getLong(0) === batchRows("1_signup"), s"seed $seed: stage 1")
        assert(counts.getLong(1) === batchRows("2_click_24h"), s"seed $seed: stage 2")
        assert(counts.getLong(2) === batchRows("3_purchase_24h"), s"seed $seed: stage 3")
        assert(counts.getLong(0) > counts.getLong(2),
          "fixture must exercise a non-trivial funnel")
      } finally query.stop()
    }
  }

  test("streaming retention ledger rolls up to batch s6") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    val query = StreamTwins.retentionLedger(stream.toDS())
      .writeStream.format("memory").queryName("retention")
      .outputMode("update").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // latest snapshot per (user, cohort, offset): counts are monotone
      val snapshot = spark.table("retention")
        .groupBy("user_id", "cohort_idx", "day_offset")
        .agg(max("event_cnt").as("event_cnt"))
      // downstream cell rollup over the snapshot = batch s6's semantics
      val streamed = snapshot
        .groupBy("cohort_idx", "day_offset")
        .agg(countDistinct("user_id").as("active_users"),
          sum("event_cnt").as("event_cnt"))
        .select(to_date(timestamp_seconds(col("cohort_idx") * 86400)).as("cohort_day"),
          col("day_offset"), col("active_users"), col("event_cnt"))
        .orderBy("cohort_day", "day_offset").collect().toSeq
      val batch = ops.Events.s6(spark, sf001)
        .orderBy("cohort_day", "day_offset").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming user-day cells roll up to batch s7 DAU/WAU") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val query = StreamTwins.userDays(stream.toDF())
      .writeStream.format("memory").queryName("userdays")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // downstream dashboard rollup over the emitted distinct cells = batch s7
      val cells = spark.table("userdays")
        .as[(Long, Long)].collect().toSeq.toDF("user_id", "day_idx")
      val dau = cells.groupBy("day_idx").agg(count(lit(1)).as("dau"))
      val wau = cells
        .withColumn("cover_idx", explode(sequence(col("day_idx"), col("day_idx") + 6)))
        .select("cover_idx", "user_id").distinct()
        .groupBy("cover_idx").agg(count(lit(1)).as("wau"))
      val streamed = dau.join(wau, col("day_idx") === col("cover_idx"))
        .select(to_date(timestamp_seconds(col("day_idx") * 86400)).as("day"),
          col("dau"), col("wau"))
        .orderBy("day").collect().toSeq
      val batch = ops.Events.s7(spark, sf001).collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming transitions roll up to batch s8 across event-time-split batches") {
    implicit val sqlCtx = spark.sqlContext
    // split on event time so cross-batch per-user order is preserved — the
    // state must carry the last event over the batch boundary
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    val query = StreamTwins.transitions(stream.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      // materialize: a self-join directly over the memory sink hits
      // conflicting attribute references (MemoryPlan is not deduplicated)
      val pairs = spark.table("transitions")
        .as[(Long, String, String)].collect().toSeq
        .toDF("user_id", "prev_type", "next_type")
      val tot = pairs.groupBy("prev_type").agg(count(lit(1)).as("from_cnt"))
      val streamed = pairs.groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("cnt"))
        .join(tot, Seq("prev_type"))
        .select(col("prev_type"), col("next_type"), col("cnt"),
          Det.round4nz(col("cnt").cast("double") / col("from_cnt").cast("double"))
            .as("prob"))
        .orderBy("prev_type", "next_type").collect().toSeq
      val batch = ops.Events.s8(spark, sf001)
        .orderBy("prev_type", "next_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming sessionization equals batch s12 minus each user's open session") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    val query = StreamTwins.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessionize")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("sessionize")
        .orderBy("user_id", "session_idx").collect().toSeq
      // batch result minus each user's final (still-open) session
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val batch = ops.Events.s12(spark, sf001)
        .withColumn("last_idx", max(col("session_idx")).over(w))
        .filter(col("session_idx") < col("last_idx"))
        .select("user_id", "session_idx", "n_events", "sess_start_us",
          "sess_end_us", "duration_us")
        .orderBy("user_id", "session_idx").collect().toSeq
      assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("sessionization state survives a checkpointed restart (flatMapGroupsWithState)") {
    // The stateful-restart case the file-sink test covers for windowed aggs,
    // here for ARBITRARY state: the open-session state store must come back
    // from the checkpoint, so a session spanning the restart still closes
    // with the right start/count.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sess-").toString
    val ck = s"$dir/ck"; val out = s"$dir/out"
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    def startQuery() = StreamTwins.sessionize(stream.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).outputMode("append").start()
    val q1 = startQuery()
    try {
      stream.addData(events.take(events.length / 2))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = startQuery()
    try {
      stream.addData(events.drop(events.length / 2))
      q2.processAllAvailable()
      val sunk = spark.read.parquet(out)
        .orderBy("user_id", "session_idx").collect().toSeq
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val batch = ops.Events.s12(spark, sf001)
        .withColumn("last_idx", max(col("session_idx")).over(w))
        .filter(col("session_idx") < col("last_idx"))
        .select("user_id", "session_idx", "n_events", "sess_start_us",
          "sess_end_us", "duration_us")
        .orderBy("user_id", "session_idx").collect().toSeq
      assert(sunk.map(_.toSeq) == batch.map(_.toSeq))
      assert(sunk.nonEmpty)
    } finally q2.stop()
  }

  test("streaming rate window equals batch s9 across event-time-split batches") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    val query = StreamTwins.rateWindow(stream.toDS())
      .writeStream.format("memory").queryName("rate_window")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("rate_window")
        .orderBy("event_id").collect().toSeq
      val batch = ops.Events.s9(spark, sf001)
        .orderBy("event_id").collect().toSeq
      assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming as-of join equals batch j9 across event-time-split batches") {
    implicit val sqlCtx = spark.sqlContext
    // split on event time so cross-batch per-user order is preserved — the
    // state must carry the latest signup over the batch boundary
    val events = fixtureEvents.sortBy(_.ts)
    val (first, second) = events.splitAt(events.length / 2)
    val stream = MemoryStream[Event]
    val query = StreamTwins.asOf(stream.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    try {
      Seq(first, second).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("asof")
        .orderBy("event_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val batch = ops.Joins.j9(spark, sf001)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming document ingest equals batch (quality filter + first-arrival dedup)") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, text: String, lang: String)
    val fixture = Tables.documents(spark, sf001)
      .select("doc_id", "text", "lang")
      .orderBy("doc_id") // arrival order = doc_id order → dedup keeps min id
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // the fixture has no exact dups and no low-quality docs at this SF —
    // append one of each so both drop paths demonstrably fire
    val docs = fixture ++ Seq(
      (900001L, fixture.head._2, fixture.head._3), // exact dup of doc 0
      (900002L, "the a of and the a of and", "en")) // pure stopwords
    val stream = MemoryStream[(Long, String, String)]
    val query = StreamTwins.ingestDocs(
        stream.toDF().toDF("doc_id", "text", "lang"), minQuality = 0.5)
      .writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamed = spark.table("ingest")
        .select("doc_id").as[Long].collect().sorted.toSeq
      // deterministic batch expectation: same quality formula, min doc_id
      // per content hash (arrival order above = doc_id order)
      val expected = docs.toDF("doc_id", "text", "lang")
        .withColumn("w", split($"text", " "))
        .withColumn("wc", size($"w"))
        .withColumn("quality", lit(1.0)
          - lit(0.5) * (size(filter($"w",
            t => t.isin("the", "a", "of", "and"))).cast("double") / $"wc")
          - lit(0.3) * (size(filter($"w",
            t => length(t) <= 2)).cast("double") / $"wc"))
        .filter($"quality" >= 0.5)
        .withColumn("text_hash", md5(lower(trim($"text")).cast("binary")))
        .groupBy("text_hash").agg(min($"doc_id").as("doc_id"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed.nonEmpty && streamed.length < docs.length)
      assert(!streamed.contains(900001L), "exact duplicate must be dropped")
      assert(!streamed.contains(900002L), "low-quality doc must be dropped")
      assert(streamed == expected)
    } finally query.stop()
  }

  test("watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val h = 3600L * 1000000000L // ns per hour
    val base = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
    val stream = MemoryStream[Event]
    val query = StreamTwins.tumbling(stream.toDF())
      .writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      // two events in hour 0
      stream.addData(Event(1, base + 1, 1, "click", 1.0),
        Event(2, base + 2, 1, "click", 1.0))
      query.processAllAvailable()
      // advance event time to hour 5 → watermark moves past hour 0+1h
      stream.addData(Event(3, base + 5 * h, 1, "click", 1.0))
      query.processAllAvailable()
      // late event for hour 0, beyond watermark → must be dropped
      stream.addData(Event(4, base + 3, 1, "click", 1.0))
      query.processAllAvailable()
      // one more to flush
      stream.addData(Event(5, base + 6 * h, 1, "click", 1.0))
      query.processAllAvailable()
      val hour0 = spark.table("late")
        .filter(col("window_start") === timestamp_seconds(lit(base / 1000000000L)))
        .select("cnt").as[Long].collect().toSeq
      assert(hour0 == Seq(2L), "late event must not change the finalized window")
    } finally query.stop()
  }

  test("streaming dedup state: distinct keys equal batch distinct") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents
    val stream = MemoryStream[Event]
    val query = StreamTwins.dedup(stream.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val streamedKeys = spark.table("dedup")
        .select("user_id", "event_type", "minute_idx").distinct().count()
      val batchKeys = events.toDF()
        .withColumn("minute_idx", expr("ts div 60000000000"))
        .select("user_id", "event_type", "minute_idx").distinct().count()
      assert(spark.table("dedup").count() === streamedKeys)
      assert(streamedKeys === batchKeys)
    } finally query.stop()
  }

  test("bounded dedup (dropDuplicatesWithinWatermark) drops in-watermark dups") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents.sortBy(_.ts)
    val stream = MemoryStream[Event]
    val query = StreamTwins.dedupBounded(stream.toDF())
      .writeStream.format("memory").queryName("dedup_bounded")
      .outputMode("append").start()
    try {
      val (first, rest) = events.splitAt(events.length / 2)
      stream.addData(first)
      query.processAllAvailable()
      // re-send a batch-1 row (same user/type/minute, new event_id): a
      // duplicate arriving within the watermark must be suppressed
      val dup = first.last.copy(event_id = -1L)
      stream.addData(rest :+ dup)
      query.processAllAvailable()
      val out = spark.table("dedup_bounded")
      assert(out.filter(col("event_id") === -1L).count() === 0)
      // exactly one row per key, matching the batch distinct-key count
      val batchKeys = events.toDF()
        .withColumn("minute_idx", expr("ts div 60000000000"))
        .select("user_id", "event_type", "minute_idx").distinct().count()
      assert(out.count() === batchKeys)
    } finally query.stop()
  }

  test("foreachBatch epoch-overwrite sink is idempotent under batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-feb-").toString + "/out"
    val events = fixtureEvents.sortBy(_.ts).take(200)
    val stream = MemoryStream[Event]
    var lastEpoch = -1L
    var lastBatch: Seq[Event] = Nil
    val sink = StreamTwins.epochOverwriteSink(out)
    val query = stream.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        lastEpoch = id
        lastBatch = df.as[Event].collect().toSeq
        sink(df, id)
      }
      .outputMode("append").start()
    try {
      events.grouped(events.length / 2 + 1).foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
      }
      val before = spark.read.parquet(out).count()
      assert(before === events.length.toLong)
      // simulate the at-least-once replay: re-deliver the LAST batch to the
      // sink with the SAME epoch id (what a restart between sink write and
      // checkpoint commit does) — row count must not change
      sink(lastBatch.toDF(), lastEpoch)
      assert(spark.read.parquet(out).count() === before)
    } finally query.stop()
  }

  test("stream-stream interval join: streamed result equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixtureEvents.sortBy(_.ts)
    val sStream = MemoryStream[Event]
    val pStream = MemoryStream[Event]
    val query = StreamTwins.signupPurchaseJoin(sStream.toDF(), pStream.toDF())
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // feed both sides in event-time order, three chunks each, then a
      // far-future row on each side to advance both watermarks past every
      // fixture event so all joinable pairs are emitted
      val chunks = events.grouped(events.length / 3 + 1).toSeq
      chunks.foreach { chunk =>
        sStream.addData(chunk)
        pStream.addData(chunk)
        query.processAllAvailable()
      }
      val far = events.last.ts + 10L * 3600 * 1000000000L
      sStream.addData(Seq(Event(-1L, far, 0L, "noop", 0.0)))
      pStream.addData(Seq(Event(-2L, far, 0L, "noop", 0.0)))
      query.processAllAvailable()
      val streamed = spark.table("ssjoin")
        .orderBy("signup_id", "purchase_id").collect().toSeq
      val batch = StreamTwins.signupPurchaseJoin(events.toDF(), events.toDF())
        .orderBy("signup_id", "purchase_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  /** m5's streaming face: the incrChunkDedup snapshot (last card per sig,
    * n_docs >= 2) must equal batch m5 — and equal it under TWO different
    * micro-batch splits (the first-arrival invariant: per-sig state is a
    * monotone fold, so the snapshot is split-independent). */
  test("incremental chunk dedup: streamed snapshot reproduces batch m5 under any split") {
    import graft.multimodal.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val chunks = Multimodal
      .chunkSignatures(Multimodal.mediaFromDocuments(spark, sf001), 64)
      .collect().toSeq.sortBy(r => (r.doc_id, r.chunk_idx))

    def snapshot(nSplits: Int, name: String): Set[(String, Long, Long, Long, Long, Long)] = {
      val stream = MemoryStream[Multimodal.ChunkSig]
      val query = StreamTwins.incrChunkDedup(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        chunks.grouped(chunks.length / nSplits + 1).foreach { c =>
          stream.addData(c); query.processAllAvailable()
        }
        // update-mode sink keeps every emission; the card is monotone in
        // n_occ, so the latest card per sig is the max-n_occ row
        spark.table(name).as[StreamTwins.ChunkCard].collect()
          .groupBy(_.chunk_sig).values
          .map(_.maxBy(_.n_occ))
          .filter(_.n_docs >= 2)
          .map(c => (c.chunk_sig, c.n_docs, c.n_occ, c.n_kinds, c.first_doc,
            c.dup_bytes))
          .toSet
      } finally query.stop()
    }

    val snap3 = snapshot(3, "incrchunk3")
    val batch = ops.Media.m5(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6)))
      .toSet
    assert(batch.nonEmpty, "fixture must contain shared chunks")
    assert(snap3 === batch)
    // different split, same snapshot (first-arrival invariant)
    assert(snapshot(7, "incrchunk7") === snap3)
  }

  test("EWMA ledger twin: streamed days equal batch s25 under any split") {
    implicit val sqlCtx = spark.sqlContext
    val batch = ops.Events.s25(spark, sf001).collect().toSeq
    val inputs = Tables.events(spark, sf001)
      .select(expr(s"(ts div 1000) div ${86400L * 1000000L}").as("day_idx"))
      .groupBy("day_idx").agg(count(lit(1)).as("cnt"))
      .orderBy("day_idx").collect()
      .map(r => StreamTwins.EwmaDay(r.getLong(0), r.getLong(1))).toSeq
    for (chunkSize <- Seq(1, 7, inputs.length)) {
      val stream = MemoryStream[StreamTwins.EwmaDay]
      val query = StreamTwins.ewmaLedger(stream.toDS())
        .writeStream.format("memory").queryName(s"ewma$chunkSize")
        .outputMode("append").start()
      try {
        inputs.grouped(chunkSize).foreach { c =>
          stream.addData(c); query.processAllAvailable()
        }
        val streamed = spark.table(s"ewma$chunkSize")
          .orderBy("day_idx").collect()
        assert(streamed.length === batch.length)
        streamed.zip(batch).foreach { case (s, b) =>
          assert(s.getLong(0) === b.getDate(0).toLocalDate.toEpochDay)
          assert(s.getLong(1) === b.getLong(1), "cnt")
          if (b.isNullAt(2)) assert(s.isNullAt(2))
          else assert(s.getDouble(2) === b.getDouble(2), "ewma")
          if (b.isNullAt(3)) assert(s.isNullAt(3))
          else assert(s.getDouble(3) === b.getDouble(3), "ratio")
          assert(s.getInt(4) === b.getInt(4), "is_spike")
        }
      } finally query.stop()
    }
  }
}
