package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: schema, batch decode shape,
  * resize arithmetic, frame sampling. The codec itself is a documented
  * deterministic stub. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  lazy val assets = Multimodal.syntheticAssets(
    Seq((1L, "hello world"), (2L, "spark multimodal"), (3L, "frame sample me"))
      .toDF("id", "txt"), "id", "txt").cache()

  test("synthetic assets carry the canonical schema") {
    assets.schema.fieldNames.toSeq shouldBe Seq("asset_id", "modality", "payload", "meta")
    assets.select("modality").distinct().count() shouldBe 3
  }

  test("decode produces typed metadata + fixed-dim features, deterministically") {
    val d1 = Multimodal.decodeAssets(assets, dim = 16).collect().sortBy(_.getLong(0))
    val d2 = Multimodal.decodeAssets(assets, dim = 16).collect().sortBy(_.getLong(0))
    d1.map(_.toString).toSeq shouldBe d2.map(_.toString).toSeq
    d1.foreach { r =>
      r.getAs[Seq[Float]]("features").size shouldBe 16
      r.getAs[Int]("width") should be >= 64
      r.getAs[Long]("n_bytes") should be > 0L
    }
  }

  test("resize preserves aspect ratio and caps the long side") {
    val resized = Multimodal.resizeMeta(Multimodal.decodeAssets(assets), maxSide = 100)
    resized.collect().foreach { r =>
      math.max(r.getAs[Int]("out_width"), r.getAs[Int]("out_height")) should be <= 101
    }
  }

  test("frame sampling explodes video assets only") {
    val frames = Multimodal.sampleFrames(Multimodal.decodeAssets(assets), everyN = 2, maxFrames = 5)
    frames.select("modality").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("video")
    frames.count() should be > 0L
  }

  test("decoded features feed the ANN operators directly") {
    val decoded = Multimodal.decodeAssets(assets, dim = 8)
    val pairs = graft.operators.Ann.cosineNearDupPairs(decoded, "asset_id", "features", -1.0)
    pairs.count() shouldBe 3 // all pairs of 3 assets
  }
}
