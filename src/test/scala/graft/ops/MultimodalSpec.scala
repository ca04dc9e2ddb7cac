package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  lazy val assets = Multimodal.syntheticAssets(spark, 100).cache()

  test("asset table honors the typed metadata contract") {
    assert(assets.schema === Multimodal.assetSchema)
    assert(assets.count() === 100)
    // images carry dimensions, a/v carries duration
    assert(assets.filter(col("mime").startsWith("image/") &&
      col("width").isNull).count() === 0)
    assert(assets.filter(!col("mime").startsWith("image/") &&
      col("duration_ms").isNull).count() === 0)
  }

  test("metadata pruning happens before decode (filter is scan-side)") {
    val pruned = Multimodal.images(assets, minWidth = 100)
    assert(pruned.count() > 0)
    assert(pruned.filter(col("width") < 100).count() === 0)
  }

  test("extractFeatures: deterministic fixed-dim features, batch plumbing intact") {
    val f1 = Multimodal.extractFeatures(assets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = Multimodal.extractFeatures(assets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1 === f2) // stub decode is deterministic
    assert(f1.values.forall(_.length === Multimodal.FeatureDim))
    assert(f1.size === 100)
    // different payloads → different features (not a constant stub)
    assert(f1(0L) !== f1(1L))
  }

  test("sampleFrames: one row per sampled timestamp within duration") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 500L)
    val byAsset = frames.groupBy("asset_id")
      .agg(count(lit(1)).as("n"), max("frame_ts_ms").as("maxts"))
      .collect()
    assert(byAsset.nonEmpty)
    byAsset.foreach { r =>
      assert(r.getLong(2) >= 0)
    }
    // frame timestamps never exceed duration
    val joined = frames.join(assets, "asset_id")
      .filter(col("frame_ts_ms") >= col("duration_ms"))
    assert(joined.count() === 0)
  }
}
