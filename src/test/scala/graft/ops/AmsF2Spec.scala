package graft.ops

import graft.SparkSpec

/** b05_ams_f2: exact F2 on a hand multiset, deterministic estimator
  * accuracy on real data, and partition invariance of the sketch. */
class AmsF2Spec extends SparkSpec {
  import spark.implicits._

  test("exact F2 column: hand multiset sums of squared multiplicities") {
    // g1: a×3, b×2, c×1 → F2 = 9+4+1 = 14; g2: x×4 → 16
    val items = (Seq.fill(3)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq(("g1", "c")) ++ Seq.fill(4)(("g2", "x"))).toDF("g", "k")
    val out = Relational.amsF2Of(items).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("g1" -> 14L, "g2" -> 16L))
  }

  test("estimator lands near truth on the gate data (deterministic hashes)") {
    // gate scale (sf0.01): ~15k distinct keys per flag — the regime the
    // J=64 geometry targets (sf0.001's ~1.5k keys see ~40% error, as the
    // 1/√(groups) variance predicts)
    val rows = Relational.amsF2Query(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("f2_exact").toDouble
      val est = r.getAs[Long]("ams_f2").toDouble
      // fixed md5 hashes + fixed data → this is a deterministic pin,
      // not a probabilistic bound; 20% is far beyond observed (<4%)
      assert(math.abs(est - exact) / exact < 0.2,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("partition-invariant: z sums are combinable, median is a set property") {
    val items = (1 to 5000).map(i => ("g", s"k${i % 997}")).toDF("g", "k")
    val a = Relational.amsF2Of(items.repartition(3)).collect().toSeq.map(_.toSeq)
    val b = Relational.amsF2Of(items.repartition(17)).collect().toSeq.map(_.toSeq)
    assert(a === b)
  }
}
