package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("extractFeatures is deterministic and schema-complete") {
    val items = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(items).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.features.length == 8))
    // deterministic: same payload → same digest/features on a second run
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 30)).collect()
    assert(feats.map(_.digest).sorted.sameElements(again.map(_.digest).sorted))
  }

  test("sampleFrames only samples video items and respects maxFrames") {
    val items = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(items, everyMs = 1000, maxFrames = 5).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.media_id).forall(_._2.length <= 5))
    val videoIds = items.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }

  test("queries() plumbing: features join back to items by id") {
    val items = Multimodal.syntheticMedia(spark, 12)
    val feats = Multimodal.extractFeatures(items)
    val joined = items.join(feats.toDF("media_id", "kind2", "n_bytes", "digest", "features"), "media_id")
    assert(joined.count() == 12)
  }
}
