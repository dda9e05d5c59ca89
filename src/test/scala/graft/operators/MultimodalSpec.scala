package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partition-batched media feature extraction: schema, shapes, determinism") {
    val assets = Multimodal.syntheticAssets(spark, 60)
    val feats = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats.length == 60)
    feats.foreach { f =>
      f.kind match {
        case "audio" =>
          assert(f.feature.length == 8) // 8 filterbank bands
          assert(f.feature.exists(_ > 0f))
        case "image" =>
          assert(f.feature.length == 64 && f.out_width == 8 && f.out_height == 8)
        case "video" =>
          assert(f.n_sampled_frames == 8) // 32 frames / stride 4
      }
    }
    // deterministic across runs and partitioning
    val again = Multimodal.extractFeatures(assets.repartition(7)).collect().sortBy(_.asset_id)
    assert(again.map(_.feature.toSeq).toSeq == feats.map(_.feature.toSeq).toSeq)
  }
}
