package graft.ops

import graft.SparkSpec

/** b04_kendall: exact concordant/discordant/tie counts without the O(n²)
  * pair form — pinned against a literal all-pairs brute recompute, plus
  * the pair-partition identity nc + nd + tx + ty − txy = C(n,2). */
class KendallSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(String, Long, Long)]) =
    rows.toDF("l_returnflag", "x", "y")

  /** Literal O(n²) reference: every unordered pair classified once. */
  private def brute(rows: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var txy = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val (x1, y1) = rows(i); val (x2, y2) = rows(j)
      if (x1 == x2 && y1 == y2) { txy += 1; tx += 1; ty += 1 }
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) nc += 1
      else nd += 1
    }
    (nc, nd, tx, ty, txy)
  }

  test("monotone series pins tau_b exactly 1; reversal exactly -1") {
    val mono = df((1L to 25L).map(i => ("g", i, i * i)))
    assert(Relational.kendallOf(mono).head().getAs[Double]("tau_b") === 1.0)
    val anti = df((1L to 25L).map(i => ("g", i, -(i * i))))
    assert(Relational.kendallOf(anti).head().getAs[Double]("tau_b") === -1.0)
  }

  test("hand-planted ties in x, y, and both match the brute pair classifier") {
    // duplicates in every combination: x-only ties, y-only ties, full ties
    val rows = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 30L),
      (3L, 20L), (3L, 20L), (3L, 5L), (4L, 30L), (4L, 30L), (2L, 30L))
    val out = Relational.kendallOf(df(rows.map(t => ("g", t._1, t._2)))).head()
    val (nc, nd, tx, ty, txy) = brute(rows)
    assert(out.getAs[Long]("nc") === nc)
    assert(out.getAs[Long]("nd") === nd)
    assert(out.getAs[Long]("ties_x") === tx)
    assert(out.getAs[Long]("ties_y") === ty)
    assert(out.getAs[Long]("ties_xy") === txy)
    val n = rows.length.toLong; val n0 = n * (n - 1) / 2
    assert(nc + nd + tx + ty - txy === n0) // partition of all pairs
    val expTau = (nc - nd).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    assert(out.getAs[Double]("tau_b") === expTau)
  }

  test("all-tied group yields tau_b 0, not NaN") {
    val out = Relational.kendallOf(df(Seq.fill(6)(("g", 7L, 7L)))).head()
    assert(out.getAs[Long]("nc") === 0L)
    assert(out.getAs[Long]("nd") === 0L)
    assert(out.getAs[Double]("tau_b") === 0.0)
  }

  test("plan shape: the |x-domain| window sums collapse into two Window " +
    "operators (in-bin pass + bin carry), not one per sum") {
    val plan = Relational.kendall(spark, sfDir).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the whole point of the r8 re-plan: ~50 same-spec running sums
    // share ONE sort/WindowExec; a per-sum Window chain would mean
    // CollapseWindow regressed and the plan sorts the cells ~50×
    assert(windows.size <= 2, s"expected <= 2 Window ops, got ${windows.size}")
    assert(windows.exists(_.windowExpressions.size >= 10),
      "the multi-column window pass is missing — sums did not share a spec")
  }

  test("real-data groups match the brute classifier and the pair identity") {
    val rows = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = Relational.kendall(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((flag, grp) <- rows.groupBy(_._1)) {
      val (nc, nd, tx, ty, txy) = brute(grp.map(t => (t._2, t._3)).toSeq)
      val r = out(flag)
      assert(r.getAs[Long]("nc") === nc, s"nc flag $flag")
      assert(r.getAs[Long]("nd") === nd, s"nd flag $flag")
      assert(r.getAs[Long]("ties_x") === tx, s"tx flag $flag")
      assert(r.getAs[Long]("ties_y") === ty, s"ty flag $flag")
      assert(r.getAs[Long]("ties_xy") === txy, s"txy flag $flag")
      val n = grp.length.toLong; val n0 = n * (n - 1) / 2
      assert(nc + nd + tx + ty - txy === n0, s"identity flag $flag")
    }
  }
}
