package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r10 (VERDICT r9 #1): the final decimal→double render cast is value-exact
  * only while |unscaled| < 2^53 — q1-class revenue sums cross that at 100 TB
  * row counts (~6·10¹¹ lineitems × ~3·10⁵ cents ≈ 2·10¹⁷ unscaled), after
  * which the cast SILENTLY rounds the exact decimal answer. Every row-scale
  * money sum now rides `Relational.castExact`, which passes sub-bound values
  * through bit-unchanged and throws loudly at or above the bound. This spec
  * plants aggregates on both sides of 2^53 and pins the throw-vs-exact
  * contract, plus the rounding behaviour of the UNGUARDED cast at the planted
  * magnitude (proving the planted case genuinely bites — the OverflowSpec
  * pattern). */
class RenderExactnessSpec extends SparkSpec {
  import spark.implicits._

  /** Sum `n` copies of `cents/100` through the guarded scale-2 emitter. */
  private def sumPlanted(bd: java.math.BigDecimal, n: Int) =
    spark.range(n).select(lit(bd).cast("decimal(28,2)").as("v"))
      .agg(Relational.castExact(sum($"v"), 2).as("s"))

  test("below 2^53 unscaled: guarded render is value-exact (hash-neutral)") {
    // 3 × 30,000,000,000,000.01 = 90,000,000,000,000.03 → unscaled 9.0…e15 < 2^53
    val v = new java.math.BigDecimal("30000000000000.01")
    val out = sumPlanted(v, 3).select($"s".cast("double")).head().getDouble(0)
    assert(out == 9.000000000000003e13, s"got $out")
    // and the decimal itself is untouched by the guard
    val dec = sumPlanted(v, 3).head().getDecimal(0)
    assert(dec.compareTo(new java.math.BigDecimal("90000000000000.03")) == 0)
  }

  test("at/above 2^53 unscaled: guarded emitter throws loudly, never rounds") {
    // 3 × 31,000,000,000,000.01 = 93,000,000,000,000.03 → unscaled 9.3e15 > 2^53
    val v = new java.math.BigDecimal("31000000000000.01")
    // raise_error surfaces as SparkRuntimeException (USER_RAISED_EXCEPTION)
    val e = intercept[Exception] { sumPlanted(v, 3).head() }
    assert(e.getMessage.contains("render-exactness violated"),
      s"unexpected: ${e.getMessage}")
  }

  test("the planted magnitude genuinely bites: the unguarded cast rounds") {
    // unscaled 9,300,000,000,000,003 > 2^53 = 9,007,199,254,740,992:
    // double cannot hold the trailing .03 — the raw cast loses it.
    val exact = new java.math.BigDecimal("93000000000000.03")
    val raw = spark.range(1).select(lit(exact).cast("decimal(28,2)").cast("double"))
      .head().getDouble(0)
    assert(new java.math.BigDecimal(raw).compareTo(exact) != 0,
      s"expected lossy render at this magnitude, got exact $raw")
  }

  test("null aggregate (empty group) passes the guard as null, not a throw") {
    val out = spark.range(1).filter(lit(false))
      .select(lit(new java.math.BigDecimal("1.00")).cast("decimal(28,2)").as("v"))
      .agg(Relational.castExact(sum($"v"), 2).as("s"))
      .head()
    assert(out.isNullAt(0))
  }
}
