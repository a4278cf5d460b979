package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters sketch as a single-buffer typed Aggregator —
  * the bounded-memory "frequent items" aggregate behind blocklist mining,
  * frequent-token dashboards, and skew detection at corpus scale.
  *
  * The buffer is at most `capacity` (item, counter) entries regardless of
  * stream length, so partials stay broadcast-small and the shuffle carries
  * one bounded map per partition instead of one row per distinct item
  * (contrast the exact census in `TextAnalysis.topNgrams`, whose shuffle
  * is the full distinct-item set). Guarantees (Misra-Gries 1982; merge
  * rule per Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *  - every item with true count > n/(capacity+1) is present in the
  *    output, and
  *  - each reported estimate satisfies true - n/(capacity+1) <= est <=
  *    true,
  *
  * and both survive arbitrary partitioning/merge trees. When `capacity`
  * >= the number of distinct items no counter is ever evicted and the
  * output equals the exact counts — the regime the DuckDB-gated query
  * runs in (the same exact-regime treatment as b05's approx sketches vs
  * their exact counterparts). In the lossy regime the counter VALUES are
  * partition-order-dependent (the guarantee is not), so lossy outputs are
  * spec-pinned, never hash-gated.
  *
  * reduce() eviction decrements all counters O(capacity) only when the
  * buffer is full AND the item is novel — amortized O(1) per input over
  * any stream. merge() sums counters then subtracts the (capacity+1)-th
  * largest value from every survivor (the mergeable-summaries rule),
  * keeping the additive error bounds intact.
  */
class HeavyHittersAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0, "HeavyHittersAgg: capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) buf // null keys carry no frequency information
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < capacity => buf.updated(item, 1L)
      case None =>
        // full + novel: decrement every counter, drop zeros (the new item
        // itself is absorbed by the decrement — classic Misra-Gries)
        buf.iterator.collect { case (k, c) if c > 1L => (k, c - 1L) }.toMap
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val summed = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (summed.size <= capacity) summed
      else {
        // subtract the (capacity+1)-th largest counter from all; at most
        // `capacity` survive (those strictly above it)
        val kth = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
        summed.iterator.collect { case (k, c) if c > kth => (k, c - kth) }.toMap
      }
    }
  }

  /** Deterministic presentation: (count desc, item asc). */
  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (item, c) => (-c, item) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
