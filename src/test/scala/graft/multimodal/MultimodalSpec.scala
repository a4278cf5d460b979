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

  test("multimodal pack: modality costs, per-shard sequential fill, budget respected (B14)") {
    val out = Multimodal.multimodalPack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    // cost model spot checks: audio is always rate/160 = 100
    out.filter(_._2 == "audio").foreach(t => assert(t._4 === 100L))
    // image cost for doc_id%8==0: ceil(320/16)*ceil(180/16) = 20*12
    out.find(t => t._2 == "image" && t._1 % 8 == 0).foreach(t => assert(t._4 === 240L))
    out.groupBy(_._3).foreach { case (_, shard) =>
      val sorted = shard.sortBy(_._1)
      // pack ids are non-decreasing in fill order and cum ends in the pack
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 <= b._6)
          assert(b._5 === a._5 + b._4) // cumulative cost is exact
        case _ =>
      }
      sorted.foreach(t => assert(math.ceil(t._5.toDouble / 8192).toInt === t._6))
    }
  }
}
