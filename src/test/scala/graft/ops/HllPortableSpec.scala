package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy pins for the portable HLL (b05_hll_portable) — the gate
  * proves both engines build the identical register file; these pin
  * that the register file actually estimates (raw HLL 1σ error is
  * 1.04/√m ≈ 6.5% at m=256; assert a generous 3σ envelope). */
class HllPortableSpec extends SparkSpec {
  import spark.implicits._

  test("portable HLL estimates planted cardinalities within the error envelope (B5)") {
    for (n <- Seq(2000, 20000)) {
      val items = (1 to n).map(i => ("x", s"val$i")).toDF("g", "v")
      val est = Relational.hllEstimates(items).collect().head.getDouble(1)
      assert(math.abs(est - n) <= 0.20 * n, s"n=$n est=$est")
    }
  }

  test("portable HLL is insensitive to duplication (distinct-count, not count)") {
    val once = (1 to 5000).map(i => ("x", s"v$i"))
    val est1 = Relational.hllEstimates(once.toDF("g", "v")).collect().head.getDouble(1)
    val est5 = Relational.hllEstimates(
      (1 to 5).flatMap(_ => once).toDF("g", "v")).collect().head.getDouble(1)
    assert(est1 === est5) // registers are max-folds: duplicates change nothing
  }

  test("declared gate: estimate within the envelope of the exact count per flag (B5)") {
    Relational.hllPortableQuery(spark, sfDir).collect().foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      assert(math.abs(est - exact) <= 0.20 * exact,
        s"flag ${r.getString(0)}: est=$est exact=$exact")
    }
  }
}
