package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.Platform

/** K-minimum-values distinct-count sketch as a single-buffer typed
  * Aggregator — the bounded-memory COUNT(DISTINCT) behind cardinality
  * dashboards and join-size estimation at corpus scale (Bar-Yossef et
  * al., RANDOM 2002; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * The buffer is the `k` smallest DISTINCT hash values seen, so partials
  * stay ≤k longs regardless of stream length (contrast the full
  * distinct-value shuffle of an exact COUNT(DISTINCT), which Spark plans
  * as a two-phase expand). Because "the k smallest distinct elements of a
  * set" is itself a set property, the sketch — unlike Misra-Gries
  * counters — is FULLY partition-invariant even in the lossy regime: any
  * partitioning and any merge tree yield the identical buffer, hence the
  * identical estimate (spec-pinned under 3 vs 17 partitions).
  *
  * Regimes, mirroring [[HeavyHittersAgg]] / [[QuantileSketchAgg]]:
  *  - fewer than `k` distinct values ⇒ the buffer holds EVERY distinct
  *    hash and the output is the exact distinct count (hash collisions
  *    aside: 64-bit XXH64, birthday-negligible below ~2^32 distinct) —
  *    the regime the DuckDB-gated query runs in;
  *  - at `k` and beyond ⇒ the classic KMV estimator (k−1)/f(h_k), where
  *    f maps the k-th smallest hash to its fraction of the unsigned
  *    64-bit space. Relative standard error ≈ 1/√(k−2); the bound is
  *    spec-pinned, never hash-gated.
  *
  * Buffer values are stored SIGN-FLIPPED (h ^ Long.MinValue) so natural
  * signed ordering equals unsigned ordering of the raw hashes; the seq is
  * kept sorted ascending + distinct.
  */
class KmvDistinctAgg(k: Int) extends Aggregator[String, Seq[Long], Long] {
  require(k >= 2, "KmvDistinctAgg: k must be at least 2")

  private val Seed = 42L // same base seed as Spark's xxhash64 default

  private def hashFlipped(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed) ^ Long.MinValue
  }

  // r16 (optimization round): in-place [[KmvBuf]] insert/merge — see
  // KmvEstimateAgg; set semantics and encoded partials bit-identical.
  override def zero: Seq[Long] = KmvBuf.empty(k)

  override def reduce(buf: Seq[Long], item: String): Seq[Long] = {
    if (item == null) buf // nulls carry no cardinality, as in COUNT(DISTINCT)
    else KmvBuf.from(buf, k).insert(hashFlipped(item))
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else KmvBuf.mergeSorted(a, b, k)
  }

  /** Exact count below k distinct; the KMV estimator at and beyond. */
  override def finish(buf: Seq[Long]): Long = {
    if (buf.length < k) buf.length.toLong
    else {
      // k-th smallest hash as a fraction of the unsigned 64-bit space
      val pos = (buf.last.toDouble + 9.223372036854776e18).max(1.0)
      math.round((k - 1).toDouble * 1.8446744073709552e19 / pos)
    }
  }


  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
