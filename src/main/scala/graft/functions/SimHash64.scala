package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document 64-bit SimHash as ONE per-row expression — no explode,
  * no aggregation, no shuffle.
  *
  * Reproduces the explode+[[SimHashAgg]] pipeline bit-exactly
  * (property-tested in SimHash64Spec):
  *   - tokens = `split(text, ' ')` semantics including empty tokens
  *     (split on every single space, trailing empties kept — Spark's
  *     `split` uses limit=-1);
  *   - per-token hash = Spark's `xxhash64(tok)` = XXH64 over the token's
  *     UTF-8 bytes with seed 42 (hashed IN PLACE over the document's byte
  *     array — a space byte can never occur inside a multi-byte UTF-8
  *     sequence, so token boundaries are byte boundaries and no per-token
  *     copy is made);
  *   - per-bit ±1 sums over token OCCURRENCES, final bit = sum > 0.
  *
  * This turns SimHash sketching from a shuffle (explode → hash-agg on
  * doc_id) into a scan-side projection: at 100 TB the sketch costs one
  * pass over the text column, and sketch-based dedup composes with
  * streaming `dropDuplicates` without stateful aggregation.
  *
  * Null text → null (the aggregation path instead drops the doc's rows
  * at explode; corpus text is non-null, and the row path is strictly
  * more faithful — the doc keeps a sketch).
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Impl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64Impl.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `simhash64(text)`. */
  def apply(c: Column): Column =
    bridge.toColumn(SimHash64(bridge.toExpression(c)))
}

/** The kernel — static so generated code can call it (Scala object methods
  * surface as Java static forwarders, the same trick Spark's own codegen
  * uses for hash functions). */
object SimHash64Impl {
  final val Seed = 42L // Spark's xxhash64 seed

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val sums = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        var j = 0
        while (j < 64) {
          sums(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
