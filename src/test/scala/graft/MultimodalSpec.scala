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
}
