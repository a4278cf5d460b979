package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asset table: binary payloads with typed metadata") {
    val a = Multimodal.assets(spark, sfDir)
    assert(a.schema("payload").dataType.typeName === "binary")
    val r = a.orderBy("asset_id").head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
  }

  test("batched stub decoder: deterministic 8-dim features, batch call shape") {
    val f1 = Multimodal.stubDecodeBatch(Seq("hello".getBytes, "world".getBytes))
    val f2 = Multimodal.stubDecodeBatch(Seq("hello".getBytes, "world".getBytes))
    assert(f1.map(_.toSeq) === f2.map(_.toSeq))
    assert(f1.forall(_.length === 8))
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sfDir), batchSize = 16)
    val row = feats.orderBy("asset_id").head()
    assert(row.getAs[Seq[Double]]("features").length === 8)
    // no shuffle introduced: partitioning preserved
    assert(feats.rdd.getNumPartitions === Multimodal.assets(spark, sfDir).rdd.getNumPartitions)
  }

  test("resize metadata keeps aspect ratio; frame sampling explodes video rows") {
    val resized = Multimodal.resizeMeta(Multimodal.assets(spark, sfDir), 640)
    assert(resized.filter($"out_width" > 640).count() === 0)
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sfDir))
    assert(frames.groupBy("asset_id").count().filter($"count" =!= 5).count() === 0)
  }
}
