package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r10 (VERDICT r9 #1): the final decimal→double render cast is value-exact
  * only while the double grid spaces FINER than the decimal grid. Two
  * conditions must hold: the unscaled integer fits 2^53 (the bound the r9
  * verdict named), AND ulp(value) < 10^-scale — the second is the tighter
  * one and bites first: at scale 2 it fails from |v| = 2^46 ≈ 7.04·10¹³
  * (unscaled 7.04·10¹⁵ < 2^53 ≈ 9.01·10¹⁵), where adjacent CENTS collide
  * onto one double even though each integer is still exactly representable.
  * Every row-scale money sum rides `Relational.castExact`, which passes
  * sub-bound values through bit-unchanged and throws loudly at or above
  * 2^(53 − ceil(scale·log₂10)). This spec pins the throw-vs-exact contract
  * on both sides, a CONCRETE colliding cent pair inside the band the naive
  * 2^53 bound would have admitted, and a scalacheck property over the whole
  * sub-bound range (the OverflowSpec planted-magnitude pattern). */
class RenderExactnessSpec extends SparkSpec {
  import spark.implicits._

  /** Sum `n` copies of `bd` through the guarded scale-2 emitter. */
  private def sumPlanted(bd: java.math.BigDecimal, n: Int) =
    spark.range(n).select(lit(bd).cast("decimal(28,2)").as("v"))
      .agg(Relational.castExact(sum($"v"), 2).as("s"))

  private def guarded(bd: java.math.BigDecimal) =
    spark.range(1).select(
      Relational.castExact(lit(bd).cast("decimal(38,2)"), 2).as("s"))

  // scale-2 safe bound: 2^46 in value space, 2^46·100 unscaled
  private val BoundUnscaled = (1L << 46) * 100L

  test("below the bound: guarded render is value-exact (hash-neutral)") {
    // 3 × 20,000,000,000,000.01 = 60,000,000,000,000.03 → v = 6.0e13 < 2^46
    val v = new java.math.BigDecimal("20000000000000.01")
    val out = sumPlanted(v, 3).select($"s".cast("double")).head().getDouble(0)
    // the double rounds back to exactly the planted decimal
    assert(new java.math.BigDecimal(out).setScale(2, java.math.RoundingMode.HALF_EVEN)
      .compareTo(new java.math.BigDecimal("60000000000000.03")) == 0, s"got $out")
    // and the decimal itself is untouched by the guard
    val dec = sumPlanted(v, 3).head().getDecimal(0)
    assert(dec.compareTo(new java.math.BigDecimal("60000000000000.03")) == 0)
  }

  test("at/above the bound: guarded emitter throws loudly, never rounds") {
    // 3 × 31,000,000,000,000.01 → v = 9.3e13 > 2^46 ≈ 7.04e13
    val v = new java.math.BigDecimal("31000000000000.01")
    val e = intercept[Exception] { sumPlanted(v, 3).head() }
    assert(e.getMessage.contains("render-exactness violated"),
      s"unexpected: ${e.getMessage}")
  }

  test("the band the naive 2^53 bound admits genuinely bites: a concrete " +
    "adjacent-cent COLLISION at v ~ 8e13 (unscaled < 2^53), and the guard throws") {
    // ulp(8e13) = 2^-6·2^52-region = 0.015625 > one cent: both cents round
    // to the same double — distinct exact answers, one rendered value
    val a = new java.math.BigDecimal("80000000000000.01") // unscaled 8.0e15 < 2^53
    val b = new java.math.BigDecimal("80000000000000.02")
    val da = spark.range(1).select(lit(a).cast("decimal(38,2)").cast("double"))
      .head().getDouble(0)
    val db = spark.range(1).select(lit(b).cast("decimal(38,2)").cast("double"))
      .head().getDouble(0)
    assert(a.compareTo(b) != 0 && da == db,
      s"expected a collision in the 2^46..2^53/100 band, got $da vs $db")
    // the tightened guard rejects both
    for (v <- Seq(a, b)) {
      val e = intercept[Exception] { guarded(v).head() }
      assert(e.getMessage.contains("render-exactness violated"))
    }
  }

  test("property: below the bound the render cast round-trips to the exact " +
    "decimal; at/above it the guard always throws (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val below = Gen.chooseNum(0L, BoundUnscaled - 1)
    val atOrAbove = Gen.chooseNum(BoundUnscaled, Long.MaxValue)
    def asDec(unscaled: Long) = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(unscaled), 2)
    val propBelow = Prop.forAll(below) { u =>
      val bd = asDec(u)
      val out = guarded(bd).select($"s".cast("double")).head().getDouble(0)
      // sub-bound: ulp < one cent, so nearest-cent of the double IS bd
      new java.math.BigDecimal(out).setScale(2, java.math.RoundingMode.HALF_EVEN)
        .compareTo(bd) == 0
    }
    val propAbove = Prop.forAll(atOrAbove) { u =>
      try { guarded(asDec(u)).head(); false }
      catch { case e: Exception => e.getMessage.contains("render-exactness") }
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(30)
    assert(SCTest.check(params, propBelow).passed, "below-bound round-trip")
    assert(SCTest.check(params, propAbove).passed, "at/above-bound throw")
  }

  test("null aggregate (empty group) passes the guard as null, not a throw") {
    val out = spark.range(1).filter(lit(false))
      .select(lit(new java.math.BigDecimal("1.00")).cast("decimal(28,2)").as("v"))
      .agg(Relational.castExact(sum($"v"), 2).as("s"))
      .head()
    assert(out.isNullAt(0))
  }
}
