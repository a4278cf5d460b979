package graft.ops

import graft.SparkSpec

/** b04_corr_matrix: every pair's Pearson r recomputed from a literal
  * driver-side moment definition; symmetry of the pair axis; the
  * perfect-correlation pin. */
class CorrMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("all pairs match the driver brute recompute on real data") {
    val rows = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice) AS BIGINT)",
        "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)",
        "CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT)")
      .collect()
      .map(r => (r.getString(0), Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val names = Seq("quantity", "price_usd", "discount_pct", "tax_pct")
    val out = Relational.corrMatrixQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out.size === 18) // 3 flags x 6 pairs
    for ((flag, grp0) <- rows.groupBy(_._1); i <- names.indices; j <- (i + 1) until names.length) {
      val grp = grp0.map(_._2)
      val n = grp.length.toLong
      val a = grp.map(_(i)); val b = grp.map(_(j))
      val sa = a.sum; val sb = b.sum
      val sp = a.zip(b).map { case (x, y) => x * y }.sum
      val ssa = a.map(x => x * x).sum; val ssb = b.map(x => x * x).sum
      val num = n.toDouble * sp.toDouble - sa.toDouble * sb.toDouble
      val dena = n.toDouble * ssa.toDouble - sa.toDouble * sa.toDouble
      val denb = n.toDouble * ssb.toDouble - sb.toDouble * sb.toDouble
      val exp = if (dena <= 0.0 || denb <= 0.0) 0.0
        else num / (math.sqrt(dena) * math.sqrt(denb))
      val (gotN, gotCorr) = out((flag, names(i), names(j)))
      assert(gotN === n, s"$flag ${names(i)}x${names(j)}")
      assert(gotCorr === exp, s"$flag ${names(i)}x${names(j)}")
    }
  }

  test("coefficients live in [-1, 1] and the matrix is non-degenerate") {
    val corrs = Relational.corrMatrixQuery(spark, sfDir).collect()
      .map(_.getDouble(4))
    assert(corrs.forall(c => c >= -1.0 && c <= 1.0 && !c.isNaN))
    // every column here has positive variance, so no pair may fall
    // back to the zero-variance pin on real data
    assert(corrs.forall(_ != 0.0),
      "some pair hit the zero-variance guard on real data")
  }
}
