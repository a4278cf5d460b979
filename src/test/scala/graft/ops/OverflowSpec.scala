package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r9 (VERDICT r8 #2): the ppb emitters' integer products used to run
  * in int64, where c·10⁹ wraps SILENTLY at ~9.2·10¹⁸ — green at gate
  * scale, corrupt at 100 TB row counts. Every row-scale product now
  * runs in DECIMAL(38,0) with `div` flooring back to an exact BIGINT.
  * This spec pins the WIDEST product per emitter shape under 10¹²-row
  * (and larger) cardinalities — each case plants counts whose int64
  * product WOULD have overflowed and asserts the exact BigInt
  * quotient, so a regression back to long arithmetic fails loudly.
  * (Under Spark 4's default ANSI mode the old form THROWS
  * ARITHMETIC_OVERFLOW instead of wrapping — so pre-widening the
  * 100 TB failure mode was a crashed job, and with ANSI off a silently
  * wrong gate; either way the DECIMAL(38) path is the fix. The
  * "old form throws" probes pin that the planted counts genuinely
  * exercise the overflow.) */
class OverflowSpec extends SparkSpec {
  import spark.implicits._

  private val B = BigInt(1000000000L)

  /** Evaluate one SQL expression over a single planted row. */
  private def eval(cols: Seq[(String, Long)], sql: String): Long = {
    val df = Seq(1).toDF("one")
    val planted = cols.foldLeft(df) { case (d, (n, v)) => d.withColumn(n, lit(v)) }
    planted.select(expr(sql).cast("long").as("out")).head().getLong(0)
  }

  test("share ppb: c*1e9 div n survives c = 5e12 (psi/benford/heatmap/abtest shape)") {
    val c = 5000000000000L // 5e12 rows — c*1e9 = 5e21 >> int64 max
    val n = 9000000000000L
    val got = eval(Seq("c" -> c, "n" -> n),
      "(CAST(c AS DECIMAL(38,0)) * 1000000000) div n")
    val want = (BigInt(c) * B / BigInt(n)).toLong
    assert(got === want, s"got $got want $want")
    // the old int64 form overflows (ANSI: throws) — proves the case bites
    assertThrows[ArithmeticException] {
      eval(Seq("c" -> c, "n" -> n), "(c * 1000000000) div n")
    }
  }

  test("psi ratio ppb: c97*n98*1e9 div (c98*n97) survives 1e12-scale counts") {
    val (c97, c98) = (4000000000000L, 3000000000000L)
    val (n97, n98) = (9000000000000L, 8000000000000L)
    val got = eval(Seq("c97" -> c97, "c98" -> c98, "n97" -> n97, "n98" -> n98),
      "CAST(c97 AS DECIMAL(38,0)) * n98 * 1000000000 div (CAST(c98 AS DECIMAL(38,0)) * n97)")
    val want = (BigInt(c97) * BigInt(n98) * B / (BigInt(c98) * BigInt(n97))).toLong
    assert(got === want, s"got $got want $want")
  }

  test("jaccard ppb: n_shared*1e9 div union survives 6e12 shared members (bitmap/kmv/graph shape)") {
    val (sh, a, b) = (6000000000000L, 9000000000000L, 8000000000000L)
    val got = eval(Seq("sh" -> sh, "a" -> a, "b" -> b),
      "(CAST(sh AS DECIMAL(38,0)) * 1000000000) div (a + b - sh)")
    val want = (BigInt(sh) * B / BigInt(a + b - sh)).toLong
    assert(got === want, s"got $got want $want")
  }

  test("kmv est_intersection: n_both*est_union div m survives corpus-scale est_union") {
    val (nb, eu, m) = (200L, 7000000000000000000L, 256L) // eu near int64 edge
    val got = eval(Seq("nb" -> nb, "eu" -> eu, "m" -> m),
      "(CAST(nb AS DECIMAL(38,0)) * eu) div m")
    val want = (BigInt(nb) * BigInt(eu) / BigInt(m)).toLong
    assert(got === want, s"got $got want $want")
  }

  test("graph density ppb: 2*E*1e9 div V*(V-1) survives V = 1e10, E = 1e12") {
    val (e, v) = (1000000000000L, 10000000000L)
    val got = eval(Seq("e" -> e, "v" -> v),
      "(CAST(2 AS DECIMAL(38,0)) * e * 1000000000) div (CAST(v AS DECIMAL(38,0)) * (v - 1))")
    val want = (BigInt(2) * BigInt(e) * B / (BigInt(v) * BigInt(v - 1))).toLong
    assert(got === want, s"got $got want $want")
    // the DENOMINATOR alone overflows int64 here (1e20): pin that too
    assertThrows[ArithmeticException] {
      eval(Seq("e" -> e, "v" -> v),
        "(CAST(2 AS DECIMAL(38,0)) * e * 1000000000) div (v * (v - 1))")
    }
  }

  test("clustering ppb: 3*T*1e9 div wedges survives T = 4e12 triangles") {
    val (t, w) = (4000000000000L, 90000000000000L)
    val got = eval(Seq("t" -> t, "w" -> w),
      "(CAST(3 AS DECIMAL(38,0)) * t * 1000000000) div w")
    val want = (BigInt(3) * BigInt(t) * B / BigInt(w)).toLong
    assert(got === want, s"got $got want $want")
  }

  test("dice ppb: 2*c_xy*1e9 div (c_x+c_y) survives 7e12 bigram count (collocations shape)") {
    val (cxy, cx, cy) = (7000000000000L, 8000000000000L, 9000000000000L)
    val got = eval(Seq("cxy" -> cxy, "cx" -> cx, "cy" -> cy),
      "(CAST(2 AS DECIMAL(38,0)) * cxy * 1000000000) div (cx + cy)")
    val want = (BigInt(2) * BigInt(cxy) * B / BigInt(cx + cy)).toLong
    assert(got === want, s"got $got want $want")
  }

  test("planned_docs: sk*budget div s_total survives 8e12-scale scaled counts (temperature mix shape)") {
    val (sk, st, budget) = (8000000000000L, 9000000000000L, 100000L)
    val got = eval(Seq("sk" -> sk, "st" -> st),
      s"(CAST(sk AS DECIMAL(38,0)) * ${budget}L) div st")
    val want = (BigInt(sk) * BigInt(budget) / BigInt(st)).toLong
    assert(got === want, s"got $got want $want")
  }

  test("widened emitters still match the unwidened values at gate-scale counts") {
    // the hash-stability argument: below the wrap the DECIMAL path and
    // the old int64 path agree exactly, so every gate hash is unchanged
    for ((c, n) <- Seq((602L, 1500L), (0L, 9L), (123456789L, 987654321L))) {
      val wide = eval(Seq("c" -> c, "n" -> n),
        "(CAST(c AS DECIMAL(38,0)) * 1000000000) div n")
      val narrow = eval(Seq("c" -> c, "n" -> n), "(c * 1000000000) div n")
      assert(wide === narrow, s"c=$c n=$n: wide $wide != narrow $narrow")
    }
  }
}
