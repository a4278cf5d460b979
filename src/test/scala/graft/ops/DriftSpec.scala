package graft.ops

import graft.SparkSpec

/** b04_ks_test / b04_psi_drift: both drift screens recomputed from a
  * literal driver-side definition on real data. */
class DriftSpec extends SparkSpec {

  private def ordersRows() = graft.Tables.orders(spark, sfDir)
    .selectExpr("o_orderpriority", "year(o_orderdate) AS y",
      "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
    .collect()
    .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    .filter(t => t._2 == 1997 || t._2 == 1998)

  test("KS: exact sup of the cross-multiplied CDF difference matches brute (B4, r8)") {
    val rows = ordersRows()
    val out = Relational.ksTestQuery(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(out.nonEmpty)
    for ((prio, grp) <- rows.groupBy(_._1)) {
      val a = grp.filter(_._2 == 1997).map(_._3).sorted
      val b = grp.filter(_._2 == 1998).map(_._3).sorted
      val na = a.length.toLong; val nb = b.length.toLong
      val merged = (a ++ b).distinct.sorted
      // exact integer sup: |F_a(v)·nb − F_b(v)·na| at every distinct v
      val curve = merged.map(v =>
        (v, math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)))
      val dNum = curve.map(_._2).max
      val atCents = curve.filter(_._2 == dNum).map(_._1).min
      val (gotNa, gotNb, gotD, gotAt, gotKs) = out(prio)
      assert(gotNa === na, s"$prio na")
      assert(gotNb === nb, s"$prio nb")
      assert(gotD === dNum, s"$prio d_num")
      assert(gotAt === atCents, s"$prio at_cents")
      assert(gotKs === dNum.toDouble / (na.toDouble * nb.toDouble), s"$prio ks_d")
    }
  }

  test("Welch t: moments and the statistic match the literal definition (B4, r8)") {
    val rows = graft.Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "year(o_orderdate) AS y",
        "CAST(round(o_totalprice) AS BIGINT) AS usd")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .filter(t => t._2 == 1997 || t._2 == 1998)
    val out = Relational.welchTQuery(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.nonEmpty)
    for ((prio, grp) <- rows.groupBy(_._1)) {
      val a = grp.filter(_._2 == 1997).map(_._3)
      val b = grp.filter(_._2 == 1998).map(_._3)
      val r = out(prio)
      assert(r.getAs[Long]("n_1997") === a.length.toLong)
      assert(r.getAs[Long]("s_1997") === a.sum)
      assert(r.getAs[Long]("ss_1998") === b.map(x => x * x).sum)
      def nD(n: Int) = n.toDouble
      val (n1, n2) = (a.length, b.length)
      val v1 = (nD(n1) * a.map(x => x * x).sum.toDouble - a.sum.toDouble * a.sum.toDouble) /
        (nD(n1) * (nD(n1) - 1.0))
      val v2 = (nD(n2) * b.map(x => x * x).sum.toDouble - b.sum.toDouble * b.sum.toDouble) /
        (nD(n2) * (nD(n2) - 1.0))
      val se2 = v1 / nD(n1) + v2 / nD(n2)
      val exp = if (n1 <= 1 || n2 <= 1 || se2 <= 0.0) 0.0
        else (a.sum.toDouble / nD(n1) - b.sum.toDouble / nD(n2)) / math.sqrt(se2)
      assert(r.getAs[Double]("t_stat") === exp, s"prio $prio")
    }
  }

  test("PSI: exact ppb shares/delta/ratio match brute; the driver-side " +
    "statistic derives from the gated integers alone (B4, r8)") {
    val rows = ordersRows()
    val out = Relational.psiDriftQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byBucket = rows.groupBy(t => t._3 / 2500000L)
    val na = rows.count(_._2 == 1997).toLong
    val nb = rows.count(_._2 == 1998).toLong
    assert(out.length === byBucket.size)
    var psi = 0.0 // the one log per term happens HERE, never in the gate
    for (r <- out) {
      val bucket = r.getLong(0)
      val c97 = byBucket(bucket).count(_._2 == 1997).toLong
      val c98 = byBucket(bucket).count(_._2 == 1998).toLong
      assert(r.getLong(1) === c97)
      assert(r.getLong(2) === c98)
      assert(r.getLong(3) === c97 * 1000000000L / na)
      assert(r.getLong(4) === c98 * 1000000000L / nb)
      assert(r.getLong(5) === c97 * 1000000000L / na - c98 * 1000000000L / nb)
      if (c97 > 0 && c98 > 0) {
        assert(r.getLong(6) === c97 * nb * 1000000000L / (c98 * na), s"bucket $bucket")
        val p = c97.toDouble / na.toDouble; val q = c98.toDouble / nb.toDouble
        psi += (p - q) * math.log(p / q)
      } else assert(r.isNullAt(6), s"bucket $bucket should be NULL")
    }
    // the derived statistic is finite and non-negative (PSI >= 0 by
    // Gibbs' inequality on every term pair)
    assert(psi >= 0.0 && !psi.isNaN && !psi.isInfinite)
  }
}
