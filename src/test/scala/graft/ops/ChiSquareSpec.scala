package graft.ops

import graft.SparkSpec

/** b04_chisq: hand-computed 2×2 contingency fixture + identities on
  * the real gate data (margins reconstruct, zero cells filled). */
class ChiSquareSpec extends SparkSpec {
  import spark.implicits._

  test("2x2 fixture matches the hand-computed chi-square decomposition") {
    // obs [[10,20],[20,10]]: margins 30/30, n=60, expected 15 everywhere,
    // contrib (±5)²/15 each, χ² = 4·25/15 = 20/3
    val rows =
      Seq.fill(10)(("p1", "A")) ++ Seq.fill(20)(("p1", "B")) ++
      Seq.fill(20)(("p2", "A")) ++ Seq.fill(10)(("p2", "B"))
    val out = Relational.chiSquareOf(
        rows.toDF("o_orderpriority", "o_orderstatus")).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Long]("row_tot") === 30L)
      assert(r.getAs[Long]("col_tot") === 30L)
      assert(r.getAs[Long]("n") === 60L)
      assert(r.getAs[Double]("expected") === 15.0)
      assert(r.getAs[Double]("contrib") === 25.0 / 15.0)
    }
    val chi2 = out.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(chi2 - 20.0 / 3.0) < 1e-12)
  }

  test("absent cells are zero-filled with full expected contribution") {
    // p2 never appears with status B → cell (p2,B) obs=0, e=2·2/6, contrib=e
    val rows = Seq(("p1", "A"), ("p1", "A"), ("p1", "B"), ("p1", "B"),
      ("p2", "A"), ("p2", "A"))
    val out = Relational.chiSquareOf(
        rows.toDF("o_orderpriority", "o_orderstatus")).collect()
    assert(out.length === 4)
    val zero = out.find(r => r.getString(0) == "p2" && r.getString(1) == "B").get
    assert(zero.getAs[Long]("obs") === 0L)
    val e = zero.getAs[Double]("expected")
    assert(e === 2.0 * 2.0 / 6.0)
    assert(zero.getAs[Double]("contrib") === e)
  }

  test("gate data: margins reconstruct and cell axis is complete") {
    val out = Relational.chiSquare(spark, sfDir).collect()
    val nPr = out.map(_.getString(0)).distinct.length
    val nSt = out.map(_.getString(1)).distinct.length
    assert(out.length === nPr * nSt)
    val n = out.head.getAs[Long]("n")
    assert(out.map(_.getAs[Long]("obs")).sum === n)
    // each row margin equals the sum of its cells
    out.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("obs")).sum === cells.head.getAs[Long]("row_tot"))
    }
  }
}
