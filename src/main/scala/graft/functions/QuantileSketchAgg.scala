package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Mergeable multi-level quantile sketch as a single-buffer typed
  * Aggregator — the bounded-memory companion to the exact rank-window
  * quantiles in `TextAnalysis.qualityThreshold` / `Relational.medians`,
  * for the regime where a per-group sort no longer fits (per-source
  * length percentiles over 100 TB of documents).
  *
  * Structure is the classic Munro-Paterson / KLL level scheme: level i
  * holds items of implicit weight 2^i; when a level exceeds `capacity`
  * it sorts and promotes every second element (odd sorted positions — a
  * DETERMINISTIC compactor, where KLL flips a coin for the offset) to
  * level i+1. Memory is O(capacity · log(n/capacity)) items regardless
  * of stream length, and partials shuffle as one bounded buffer per
  * partition instead of one row per value.
  *
  * Guarantees: with the deterministic compactor the rank error of any
  * reported quantile is bounded by the total promoted-weight loss,
  * O(n·log(n/capacity)/capacity) worst-case (Munro-Paterson 1980;
  * randomized KLL trades this for O(n/capacity) w.h.p. — determinism is
  * the better trade here, where run-to-run identical output is a gate).
  * Compaction content depends on arrival order, so lossy-regime outputs
  * are spec-pinned, never hash-gated — EXCEPT that when `capacity` >= n
  * for a group no compaction ever fires, level 0 is the whole multiset,
  * and the reported quantiles are EXACTLY the rank-⌈p·n⌉ order
  * statistics: that regime is DuckDB-oracle hash-gated (the same
  * exact-regime treatment as `HeavyHittersAgg` / b05_approx_stats).
  *
  * Quantile definition (both engines, exact integer arithmetic): for
  * p = a/b, the reported value is the smallest item whose cumulative
  * weight reaches ⌈p·n⌉ = (a·n + b − 1) div b — percentile_disc
  * semantics, no interpolation, portable.
  */
class QuantileSketchAgg(capacity: Int, probs: Seq[(Int, Int)])
    extends Aggregator[Long, Seq[Seq[Long]], Seq[Long]] {
  require(capacity >= 2, "QuantileSketchAgg: capacity must be >= 2")
  require(probs.nonEmpty && probs.forall { case (a, b) => a > 0 && a <= b },
    "QuantileSketchAgg: probabilities must be fractions in (0, 1]")

  override def zero: Seq[Seq[Long]] = Seq(Vector.empty[Long])

  /** Cascade compaction: any overfull level sorts and promotes its odd
    * sorted positions (weight doubles); an odd straggler is dropped —
    * bounded weight loss, part of the stated rank-error budget. */
  private def compact(levels: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    var ls = levels.map(_.toVector).toVector
    var i = 0
    while (i < ls.length) {
      if (ls(i).length > capacity) {
        val sorted = ls(i).sorted
        val promoted = Vector.tabulate(sorted.length / 2)(j => sorted(2 * j + 1))
        ls = ls.updated(i, Vector.empty[Long])
        ls =
          if (i + 1 < ls.length) ls.updated(i + 1, ls(i + 1) ++ promoted)
          else ls :+ promoted
      }
      i += 1
    }
    ls
  }

  override def reduce(buf: Seq[Seq[Long]], v: Long): Seq[Seq[Long]] =
    compact(buf.updated(0, buf.head :+ v))

  override def merge(a: Seq[Seq[Long]], b: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    val depth = math.max(a.length, b.length)
    val merged = Vector.tabulate(depth) { i =>
      val x = if (i < a.length) a(i).toVector else Vector.empty[Long]
      val y = if (i < b.length) b(i).toVector else Vector.empty[Long]
      x ++ y
    }
    compact(merged)
  }

  /** Weighted rank scan; empty input reports an empty quantile list. */
  override def finish(buf: Seq[Seq[Long]]): Seq[Long] = {
    val weighted = buf.zipWithIndex
      .flatMap { case (lvl, i) => lvl.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    if (weighted.isEmpty) Seq.empty
    else {
      val n = weighted.iterator.map(_._2).sum
      probs.map { case (a, b) =>
        val target = (a.toLong * n + b - 1) / b
        var cum = 0L
        var ans = weighted.last._1
        val it = weighted.iterator
        var found = false
        while (it.hasNext && !found) {
          val (v, w) = it.next()
          cum += w
          if (cum >= target) { ans = v; found = true }
        }
        ans
      }
    }
  }

  override def bufferEncoder: Encoder[Seq[Seq[Long]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Long]]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
