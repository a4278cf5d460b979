package graft.ops

import graft.{SparkSpec, Tables}

/** Structural pins for the e04 training-batches flagship (exactness is
  * oracle-gated end to end; these pin the composition contracts the hash
  * alone doesn't name). */
class TrainPipelineSpec extends SparkSpec {

  private lazy val manifest = TrainPipeline.trainingBatches(spark, sfDir).collect()
    .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("e04: manifest conserves the selected docs and packs respect capacity shape") {
    // recompute the per-source quota + selection count independently
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sk = bySrc.view.mapValues(n => math.sqrt((n * 100000000L).toDouble).toLong).toMap
    val (nTotal, sTotal) = (bySrc.values.sum, sk.values.sum)
    val quota = bySrc.map { case (src, n) =>
      src -> math.min(n, 3L * nTotal * sk(src) / (5L * sTotal)) }
    val expectedSelected = quota.values.sum
    assert(manifest.map(_._3).sum === expectedSelected)
    // every pack is non-empty; sum_tokens positive; sources mixed
    assert(manifest.forall { case (_, _, n, toks, srcs) =>
      n >= 1 && toks >= 1 && srcs >= 1 && srcs <= n })
  }

  test("e04: temperature flattening bites on a skewed mixture (shared shares core)") {
    // planted 16:4:1 skew through the SAME temperatureShares core e04's
    // quota derives from (sf0.001's uniform sources cannot exercise this)
    import spark.implicits._
    val docs = ((1 to 1600).map(i => (i.toLong, "head")) ++
      (1601 to 2000).map(i => (i.toLong, "mid")) ++
      (2001 to 2100).map(i => (i.toLong, "tail")))
      .toDF("doc_id", "source")
    val out = Relational2.temperatureMixOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // head: temperature share strictly below natural; tail: strictly above
    assert(out("head")._2 < out("head")._1)
    assert(out("tail")._2 > out("tail")._1)
  }

  test("e04: pack ids are non-decreasing in cumulative tokens and shard-local") {
    // per shard, pack ids start at 1 and never decrease as pack_id is
    // ceil of a running sum; gaps are legal (a long doc can jump packs)
    manifest.groupBy(_._1).foreach { case (_, packs) =>
      val ids = packs.map(_._2).sorted
      assert(ids.head >= 1 && ids.distinct.length == ids.length)
    }
  }
}
