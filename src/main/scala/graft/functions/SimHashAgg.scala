package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed aggregator producing a 64-bit SimHash in ONE aggregation buffer:
  * input is a token's 64-bit hash; the buffer holds the 64 per-bit ±1
  * sums; finish packs the sign vector into one long.
  *
  * Versus the 64-aggregate-columns formulation: one buffer per group and a
  * tight 64-iteration loop per row instead of 64 separate conditional-sum
  * expressions — smaller codegen, same shuffle shape (map-side partial
  * merge on the int array), and BIT-IDENTICAL results (same ±1 sums, same
  * `> 0` sign rule).
  */
class SimHashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
