package graft.ops

import graft.SparkSpec

/** b05_percentile_cont: the ×4-scaled interpolation must equal the
  * definitional linear interpolation, driver-recomputed. */
class PercentileContSpec extends SparkSpec {

  test("quartiles equal the definitional linear interpolation (B5)") {
    val out = Relational.percentileCont(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)
    val cents = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((flag, vs) <- cents; k <- 1 to 3) {
      val n = vs.length
      val pos4 = (n - 1).toLong * k // position ×4
      val lo = (pos4 / 4).toInt
      val rem = (pos4 % 4).toInt
      val vHi = if (lo + 1 < n) vs(lo + 1) else vs(lo)
      val expX4 = vs(lo) * (4 - rem) + vHi * rem
      val (gotN, gotX4, gotVal) = out((flag, k))
      assert(gotN === n.toLong)
      assert(gotX4 === expX4, s"flag $flag q$k")
      assert(gotVal === expX4.toDouble / 4.0)
    }
  }

  test("arbitrary p = num/den tails equal the definitional interpolation (r8)") {
    val out = Relational.percentileAny(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(5), r.getDouble(6))).toMap
    assert(out.nonEmpty)
    val cents = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((flag, vs) <- cents; (pct, num, den) <- Seq((10, 1L, 10L), (90, 9L, 10L), (99, 99L, 100L))) {
      val n = vs.length
      val posD = (n - 1).toLong * num // position ×den
      val lo = (posD / den).toInt
      val rem = posD % den
      val vHi = if (lo + 1 < n) vs(lo + 1) else vs(lo)
      val expXd = vs(lo) * (den - rem) + vHi * rem
      val (gotN, gotXd, gotVal) = out((flag, pct))
      assert(gotN === n.toLong)
      assert(gotXd === expXd, s"flag $flag p$pct")
      assert(gotVal === expXd.toDouble / den.toDouble)
    }
  }
}
