package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Element-wise sum of quantized (long) vectors in ONE aggregation buffer —
  * the centroid-recompute kernel for k-means/cluster summarization.
  *
  * Versus posexplode → per-(group, pos) aggregate → re-assemble: one
  * map-side-combinable shuffle carrying a single array column per group
  * instead of dims× rows plus a second aggregate to rebuild the array.
  * Buffer sizes itself on first input; mismatched vector lengths fail
  * fast (corrupt input must not silently truncate a centroid). Integer
  * sums → exact, order-independent, bit-stable.
  */
class VecSumAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    // an empty INPUT vector would be indistinguishable from the zero
    // buffer and silently absorbed — that's corrupt input, fail fast
    require(v.nonEmpty, "VecSumAgg: empty input vector")
    if (buf.isEmpty) v.toArray
    else {
      require(buf.length == v.length,
        s"VecSumAgg: vector length ${v.length} != buffer ${buf.length}")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"VecSumAgg: merge length mismatch ${a.length} != ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
