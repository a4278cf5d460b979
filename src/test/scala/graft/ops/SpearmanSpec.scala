package graft.ops

import graft.SparkSpec

/** b04_spearman: monotone invariance, tie-average ranks, and a driver
  * brute-recompute with the identical moment formulation. */
class SpearmanSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Long, Long)]) =
    rows.toDF("l_returnflag", "x", "y")

  test("nonlinear monotone series pins rho exactly 1; reversal exactly -1") {
    // y = x^3: monotone but nonlinear — Spearman 1 where Pearson < 1
    val mono = df((1L to 20L).map(i => ("g", i, i * i * i)))
    assert(Relational.spearmanOf(mono).head().getAs[Double]("spearman_rho") === 1.0)
    val anti = df((1L to 20L).map(i => ("g", i, -(i * i * i))))
    assert(Relational.spearmanOf(anti).head().getAs[Double]("spearman_rho") === -1.0)
  }

  test("tie-average ranks match the driver brute recompute on real data") {
    val rows = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Relational.spearman(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("spearman_rho")).toMap
    for ((flag, grp0) <- rows.groupBy(_._1)) {
      val grp = grp0.toSeq
      def ranks2(vs: Seq[Long]): Map[Long, Long] = {
        val sorted = vs.sorted
        vs.distinct.map { v =>
          val before = sorted.count(_ < v).toLong
          val c = sorted.count(_ == v).toLong
          v -> (2 * before + c + 1)
        }.toMap
      }
      val rx = ranks2(grp.map(_._2)); val ry = ranks2(grp.map(_._3))
      val pairs = grp.map(t => (rx(t._2), ry(t._3)))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(t => t._1 * t._2).sum
      val sx2 = pairs.map(t => t._1 * t._1).sum
      val sy2 = pairs.map(t => t._2 * t._2).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val den = math.sqrt((n.toDouble * sx2.toDouble - sx.toDouble * sx.toDouble)
        * (n.toDouble * sy2.toDouble - sy.toDouble * sy.toDouble))
      assert(math.abs(out(flag) - num / den) < 1e-12, s"flag $flag")
    }
  }
}
