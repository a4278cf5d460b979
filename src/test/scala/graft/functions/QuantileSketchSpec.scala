package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Probs = Seq(1 -> 4, 1 -> 2, 3 -> 4, 9 -> 10)

  /** True rank of `v` in `xs` = count of elements <= v. */
  private def rankOf(xs: Seq[Long], v: Long): Long = xs.count(_ <= v).toLong

  test("exact regime: capacity >= n reports the exact ⌈p·n⌉ order statistics") {
    val xs = (1L to 1000L).map(i => (i * 7919) % 500) // each value twice -> ties
    val qs = udaf(new QuantileSketchAgg(1024, Probs))
    val out = xs.toDF("v").repartition(8)
      .agg(qs($"v").as("q")).select($"q").head().getSeq[Long](0)
    val sorted = xs.sorted
    val expected = Probs.map { case (a, b) =>
      sorted(((a.toLong * xs.length + b - 1) / b - 1).toInt)
    }
    assert(out.toSeq === expected)
  }

  test("exact regime is partition-invariant (merge-tree independent)") {
    val xs = (1L to 500L).map(i => (i * 31) % 97)
    val qs = udaf(new QuantileSketchAgg(512, Probs))
    val a = xs.toDF("v").repartition(3).agg(qs($"v")).head().getSeq[Long](0)
    val b = xs.toDF("v").repartition(17).agg(qs($"v")).head().getSeq[Long](0)
    assert(a.toSeq === b.toSeq)
  }

  test("lossy regime: rank error stays within the stated sketch budget") {
    val n = 20000
    val xs = (1L to n.toLong).map(i => (i * 104729) % n) // permutation of 0..n-1
    val cap = 64
    val qs = udaf(new QuantileSketchAgg(cap, Probs))
    val out = xs.toDF("v").repartition(8)
      .agg(qs($"v").as("q")).select($"q").head().getSeq[Long](0)
    // deterministic Munro-Paterson budget: O(n log(n/cap) / cap); assert
    // the empirical error is comfortably inside 20% of n (budget ~12.5%)
    Probs.zip(out).foreach { case ((a, b), v) =>
      val target = a.toLong * n / b
      val err = math.abs(rankOf(xs, v) - target)
      assert(err <= n / 5, s"p=$a/$b reported $v rank off by $err")
    }
    // lossy content is merge-tree-dependent (documented), so distributed
    // runs pin only the BOUND above; on a single partition the reduce
    // path is fully deterministic run-to-run
    val one = xs.toDF("v").coalesce(1).agg(qs($"v").as("q")).head().getSeq[Long](0)
    val two = xs.toDF("v").coalesce(1).agg(qs($"v").as("q")).head().getSeq[Long](0)
    assert(one.toSeq === two.toSeq)
    Probs.zip(one).foreach { case ((a, b), v) =>
      assert(math.abs(rankOf(xs, v) - a.toLong * n / b) <= n / 5)
    }
  }

  test("empty input reports an empty quantile list, not nulls") {
    val qs = udaf(new QuantileSketchAgg(16, Probs))
    val out = Seq.empty[Long].toDF("v").agg(qs($"v").as("q")).head().getSeq[Long](0)
    assert(out.isEmpty)
  }
}
