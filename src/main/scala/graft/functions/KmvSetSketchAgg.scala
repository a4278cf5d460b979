package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (KMV) sketch CONTENTS aggregator: keeps the `k` smallest
  * DISTINCT pre-hashed values and returns them as a sorted ascending
  * array — the raw material for KMV SET-OPERATION estimates (union
  * cardinality, Jaccard, intersection; Beyer et al., SIGMOD 2007 "On
  * synopses for distinct-value estimation under multiset operations").
  *
  * Unlike [[KmvDistinctAgg]] (which finishes to a single estimate over
  * an internally XXH64-hashed string), this aggregator takes values
  * ALREADY hashed by the caller — in the queries, the engine-portable
  * 48-bit md5 prefix ([[Md5Prefix]]) — so a SQL oracle can replay the
  * identical sketch with `ROW_NUMBER() OVER (ORDER BY h) <= k` over the
  * same md5 arithmetic, making even the LOSSY estimates hash-gateable
  * (the b05_countmin / b05_hll_portable discipline).
  *
  * The buffer is ≤k longs regardless of input size, merge is
  * union-then-take-k, and "the k smallest distinct elements of a set"
  * is a set property — fully partition-invariant in every regime.
  * Hashes are expected non-negative (48-bit md5 prefixes are), so
  * natural signed ordering is the unsigned ordering; no sign flip.
  */
class KmvSetSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, "KmvSetSketchAgg: k must be at least 2")

  // r16 (optimization round): in-place [[KmvBuf]] insert/merge — see
  // KmvEstimateAgg; set semantics and encoded partials bit-identical.
  override def zero: Seq[Long] = KmvBuf.empty(k)

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    KmvBuf.from(buf, k).insert(h)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else KmvBuf.mergeSorted(a, b, k)
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
