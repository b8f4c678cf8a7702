package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, determinism, batch shape (SURVEY.md §2.8 /
  * builder brief — decode itself is a documented stub).
  */
class MultimodalSpec extends SparkSpec {

  test("media table: binary content + typed metadata, one row per document") {
    val media = Multimodal.mediaFromDocuments(spark, sf001)
    assert(media.count() === 500)
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(Set("image", "audio", "video") ==
      media.select("kind").distinct().collect().map(_.getString(0)).toSet)
  }

  test("feature extraction is deterministic and total") {
    val media = Multimodal.mediaFromDocuments(spark, sf001)
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
    assert(a.length === 500)
    assert(a.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    assert(a.forall(_.byte_len > 0))
  }

  test("frame sampling yields ceil(len/frameBytes) frames per video") {
    val media = Multimodal.mediaFromDocuments(spark, sf001)
    val frames = Multimodal.sampleFrames(media, 64).collect()
    val videos = media.filter(_.kind == "video").collect()
    val expected = videos.map(v => (v.content.length + 63) / 64).sum
    assert(frames.length === expected)
    assert(frames.forall(_.byte_len <= 64))
  }

  test("feature stats aggregate per kind") {
    val media = Multimodal.mediaFromDocuments(spark, sf001)
    val stats = Multimodal.featureStats(Multimodal.extractFeatures(media)).collect()
    assert(stats.length === 3)
    assert(stats.map(_.getLong(1)).sum === 500)
  }

  /** CDC's reason to exist: a 1-byte insertion early in the blob must leave
    * every chunk signature intact except the chunk(s) overlapping the edit
    * neighborhood — while ALIGNED chunking re-signs essentially everything
    * downstream of the edit (both halves asserted, so the test pins the
    * property, not just the implementation). */
  test("CDC chunking is shift-resilient where aligned chunking is not") {
    import spark.implicits._
    // deterministic pseudo-random blob (xorshift), long enough for ~60
    // expected CDC chunks at maskBits=6
    def blob(insertAt: Int): Array[Byte] = {
      val n = 4000
      val out = new Array[Byte](if (insertAt >= 0) n + 1 else n)
      var x = 0x9e3779b97f4a7c15L
      var i = 0; var j = 0
      while (i < n) {
        if (i == insertAt) { out(j) = 0x5a; j += 1 }
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        out(j) = (x & 0xff).toByte
        i += 1; j += 1
      }
      out
    }
    def item(b: Array[Byte]) = Seq(
      Multimodal.MediaItem(1L, "video", "en", b, 1, 1)).toDS()
    val before = item(blob(-1))
    val after = item(blob(100))

    def sigs(ds: org.apache.spark.sql.Dataset[Multimodal.ChunkSig]): Seq[String] =
      ds.collect().sortBy(_.chunk_idx).map(_.chunk_sig).toSeq

    val cdcB = sigs(Multimodal.chunkSignaturesCDC(before))
    val cdcA = sigs(Multimodal.chunkSignaturesCDC(after))
    assert(cdcB.length > 20, s"want a real chunk count, got ${cdcB.length}")
    val lostC = cdcB.toSet -- cdcA.toSet
    val gainedC = cdcA.toSet -- cdcB.toSet
    assert(lostC.size <= 2 && gainedC.size <= 2,
      s"CDC must localize the edit: lost=${lostC.size} gained=${gainedC.size}")
    // determinism: same bytes, same cuts
    assert(cdcB == sigs(Multimodal.chunkSignaturesCDC(item(blob(-1)))))

    val alB = sigs(Multimodal.chunkSignatures(before, 64))
    val alA = sigs(Multimodal.chunkSignatures(after, 64))
    val lostA = alB.toSet -- alA.toSet
    assert(lostA.size > alB.length / 2,
      s"aligned chunking must cascade: only ${lostA.size}/${alB.length} changed")
    // byte conservation: CDC chunks tile the blob exactly
    assert(Multimodal.chunkSignaturesCDC(before).collect().map(_.byte_len).sum
      === blob(-1).length)
  }
}
