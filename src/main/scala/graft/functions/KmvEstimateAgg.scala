package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (KMV) distinct-count ESTIMATE over PRE-HASHED values — the
  * [[KmvSetSketchAgg]] buffer discipline finished to the single KMV
  * estimator instead of the raw sketch array (Bar-Yossef et al., RANDOM
  * 2002; mergeable per Agarwal et al., PODS 2012).
  *
  * r14 (VERDICT r13 #2 — the two-SF certification gap): unlike
  * [[KmvDistinctAgg]] (internal XXH64, exact-regime-only hash gate),
  * the caller supplies the repo's engine-portable 48-bit md5-prefix
  * hash ([[Md5Prefix]] over `'kmv:' || value`), so a DuckDB oracle
  * replays the IDENTICAL sketch — `ROW_NUMBER() OVER (ORDER BY h) <= k`
  * over the same md5 arithmetic, the same exact-below-k / integer
  * estimator at-k-and-beyond — and the query hash-gates in BOTH
  * regimes. The capacity-bounded gates (b01_profile_kmv,
  * b05_distinct_sketch, b05_approx_stats_exact) therefore stay green at
  * sf0.1 where their corpora leave the exact regime.
  *
  * Regimes: below `k` distinct hashes the buffer holds every one and
  * the output is the exact distinct-hash count (= distinct values,
  * 48-bit-collision-aside — and a collision is REPLAYED identically by
  * the oracle); at `k` and beyond, the estimator (k−1)·2^48 div h_k in
  * pure BIGINT arithmetic (all operands positive, so Spark's truncating
  * and DuckDB's flooring division agree). Relative standard error
  * ≈ 1/√(k−2), spec-pinned.
  *
  * Input is boxed so NULLs flow through and are skipped — the
  * COUNT(DISTINCT) null contract ([[Md5Prefix]] propagates null from a
  * null column value). Buffer ≤ k longs regardless of input size;
  * merge is union-then-take-k; "the k smallest distinct elements of a
  * set" is a set property — fully partition-invariant in every regime.
  * Hashes are expected non-negative (48-bit md5 prefixes are), so
  * natural signed ordering is the unsigned ordering.
  */
class KmvEstimateAgg(k: Int) extends Aggregator[java.lang.Long, Seq[Long], Long] {
  require(k >= 2, "KmvEstimateAgg: k must be at least 2")
  // (k-1)·2^48 must stay inside a signed 64-bit long (r14 review:
  // k = 2^16 would wrap negative here while the DuckDB replay raises an
  // out-of-range error — divergent failure modes with no guard)
  require(k <= (1 << 15), s"KmvEstimateAgg: k must be <= 2^15, got $k " +
    "(the integer estimator (k-1)*2^48 overflows beyond that)")

  // r16 (optimization round): the per-row insert rides the mutable
  // in-place [[KmvBuf]] (binary search + one arraycopy memmove) instead
  // of rebuilding an immutable Vector per arriving distinct value — the
  // fill phase of the 2^14 sketch owned 2.3–3.5 s of
  // b05_approx_stats_exact's 4.5 s. Set semantics, encoded partial
  // format (sorted ascending, ≤ k longs), and the estimator are
  // bit-identical; KmvSketchSpec pins agreement with COUNT(DISTINCT)
  // and partition invariance.
  override def zero: Seq[Long] = KmvBuf.empty(k)

  override def reduce(buf: Seq[Long], boxed: java.lang.Long): Seq[Long] = {
    if (boxed == null) buf // nulls carry no cardinality, as in COUNT(DISTINCT)
    else KmvBuf.from(buf, k).insert(boxed.longValue())
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else KmvBuf.mergeSorted(a, b, k)
  }

  /** Exact count below k distinct hashes; the integer KMV estimator at
    * and beyond: (k−1)·2^48 div max(h_k, 1) — replayed verbatim by the
    * oracle's `(k-1) * 281474976710656 // greatest(kth, 1)`. */
  override def finish(buf: Seq[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else ((k - 1).toLong * (1L << 48)) / math.max(buf.last, 1L)


  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
