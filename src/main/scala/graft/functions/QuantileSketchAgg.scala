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

  // r16 (optimization round): the per-row path used to rebuild the
  // outer Vector (`buf.updated(0, buf.head :+ v)`) and re-walk every
  // level through an allocating `levels.map(_.toVector)` on EVERY
  // arriving value. [[QsBuf]] keeps the identical level scheme in flat
  // growable long arrays mutated in place (the TypedImperativeAggregate
  // object-buffer contract, same as [[KmvBuf]]): appends are one array
  // store, the cascade fires only when a level actually overflows, and
  // the encoded buffer (Seq of per-level Seqs, insertion order
  // preserved) is bit-identical — QuantileSketchSpec pins exact-regime
  // equality with percentile_disc and the lossy-regime error budget.
  override def zero: Seq[Seq[Long]] = QsBuf.empty(capacity)

  override def reduce(buf: Seq[Seq[Long]], v: Long): Seq[Seq[Long]] =
    QsBuf.from(buf, capacity).append(v)

  override def merge(a: Seq[Seq[Long]], b: Seq[Seq[Long]]): Seq[Seq[Long]] =
    QsBuf.mergeLevels(a, b, capacity)

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

/** Mutable level storage behind [[QuantileSketchAgg]] — flat growable
  * long arrays with a live-prefix length per level, presented as the
  * aggregator's `Seq[Seq[Long]]` buffer type so the encoded partial
  * (one bounded array per level, insertion order preserved) is
  * bit-identical to the old immutable-Vector form. The cascade
  * compaction replicates the old walk exactly: any overfull level
  * sorts, promotes its odd sorted positions to the next level (created
  * on demand), clears, and the walk continues upward — content depends
  * on arrival order in the lossy regime precisely as before. */
private[functions] final class QsBuf private (
    private var lvl: Array[Array[Long]],
    private var len: Array[Int],
    private var depth: Int,
    private val capacity: Int)
    extends scala.collection.immutable.AbstractSeq[Seq[Long]] {

  override def length: Int = depth
  override def apply(i: Int): Seq[Long] = {
    if (i < 0 || i >= depth) throw new IndexOutOfBoundsException(s"$i of $depth")
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      java.util.Arrays.copyOf(lvl(i), len(i)))
  }
  override def iterator: Iterator[Seq[Long]] =
    (0 until depth).iterator.map(apply)

  /** Make level i exist and have room for `extra` more values. */
  private def ensure(i: Int, extra: Int): Unit = {
    if (i >= lvl.length) {
      val cap = math.max(4, math.max(i + 1, lvl.length * 2))
      lvl = java.util.Arrays.copyOf(lvl, cap)
      len = java.util.Arrays.copyOf(len, cap)
    }
    while (depth <= i) {
      if (lvl(depth) == null) lvl(depth) = new Array[Long](16)
      depth += 1
    }
    val need = len(i) + extra
    if (need > lvl(i).length) {
      var cap = math.max(16, lvl(i).length)
      while (cap < need) cap *= 2
      lvl(i) = java.util.Arrays.copyOf(lvl(i), cap)
    }
  }

  def append(v: Long): QsBuf = {
    ensure(0, 1)
    lvl(0)(len(0)) = v
    len(0) += 1
    compactCascade()
    this
  }

  private[functions] def compactCascade(): Unit = {
    var i = 0
    while (i < depth) {
      if (len(i) > capacity) {
        val sorted = java.util.Arrays.copyOf(lvl(i), len(i))
        java.util.Arrays.sort(sorted)
        val nProm = sorted.length / 2 // odd straggler dropped, as before
        len(i) = 0
        ensure(i + 1, nProm)
        val tgt = lvl(i + 1)
        var t = len(i + 1)
        var j = 0
        while (j < nProm) { tgt(t) = sorted(2 * j + 1); t += 1; j += 1 }
        len(i + 1) = t
      }
      i += 1
    }
  }
}

private[functions] object QsBuf {
  /** Depth-1 buffer with an empty level 0 — encodes as `Seq(Seq())`,
    * exactly the old zero. */
  def empty(capacity: Int): QsBuf =
    new QsBuf(Array(new Array[Long](16)), new Array[Int](1), 1, capacity)

  def from(s: Seq[Seq[Long]], capacity: Int): QsBuf = s match {
    case qb: QsBuf => qb
    case other =>
      val lv = other.map(_.toArray).toArray
      new QsBuf(lv, lv.map(_.length), lv.length, capacity)
  }

  /** Level-wise concatenation (a's values then b's, per level) followed
    * by the cascade — the old merge verbatim. */
  def mergeLevels(a: Seq[Seq[Long]], b: Seq[Seq[Long]], capacity: Int): QsBuf = {
    val depth = math.max(a.length, b.length)
    val lv = new Array[Array[Long]](math.max(1, depth))
    val ln = new Array[Int](math.max(1, depth))
    var i = 0
    while (i < depth) {
      val x = if (i < a.length) a(i).toArray else Array.emptyLongArray
      val y = if (i < b.length) b(i).toArray else Array.emptyLongArray
      val m = new Array[Long](x.length + y.length)
      System.arraycopy(x, 0, m, 0, x.length)
      System.arraycopy(y, 0, m, x.length, y.length)
      lv(i) = m
      ln(i) = m.length
      i += 1
    }
    if (depth == 0) { lv(0) = new Array[Long](16); ln(0) = 0 }
    val out = new QsBuf(lv, ln, math.max(1, depth), capacity)
    out.compactCascade()
    out
  }
}
