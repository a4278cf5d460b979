package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions: the 1-based byte
  * positions `p` (w ≤ p ≤ len) where the base-31 Horner hash of the `w`
  * bytes ending at `p` is ≡ 0 (mod `div`) — the cut points of
  * [[graft.text.TextAnalysis.cdcChunksOf]].
  *
  * Why a native expression (r7, measured): the same computation written
  * with built-in higher-order functions
  * (`transform(sequence(1, len), i -> ascii(substring(text, i, 1)))`
  * materializing a code-point array, then a per-position
  * `aggregate(slice(codes, ...))`) is BOTH interpreted (HOFs have no
  * codegen) and, after `CollapseProject` inlines the codes array into
  * every position's slice, O(len³) per document — a single bench task
  * spun for 19 minutes at sf0.1 before this kernel replaced it. Here:
  * one O(len) pass with an incremental window (enter byte, subtract the
  * leaving byte scaled by 31^{w-1}… via precomputed 31^w), inside
  * whole-stage codegen.
  *
  * The hash runs over UTF-8 BYTES; the SQL oracle replays it over code
  * points via `ord(substr(..))` — identical on the ASCII regime the
  * CDC operator filters to (the [[RollingHash]] portable-twin
  * discipline). Exactness: w = 8 bytes tops the window hash at ≈ 8.4e12
  * < 2^63, and the incremental update only ever holds that same window
  * value, so every step is exact long arithmetic with no wraparound. */
case class CdcBoundaries(child: Expression, w: Int, div: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1 && w <= 12, "window must fit exact long arithmetic (<= 12 bytes)")
  require(div >= 1, "divisor must be positive")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "cdc_boundaries"

  private val pow: Long = { var p = 1L; var i = 0; while (i < w) { p *= 31L; i += 1 }; p }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val tmp = new Array[Int](if (n >= w) n - w + 1 else 0)
    var cnt = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = h * 31L + (bytes(i) & 0xffL)
      if (i >= w) h -= pow * (bytes(i - w) & 0xffL)
      if (i >= w - 1 && h % div == 0) { tmp(cnt) = i + 1; cnt += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(tmp, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val tmp = ctx.freshName("tmp")
      val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |int[] $tmp = new int[$n >= $w ? $n - $w + 1 : 0];
         |int $cnt = 0;
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |  if ($i >= $w) $h -= ${pow}L * ($bytes[$i - $w] & 0xffL);
         |  if ($i >= ${w - 1} && $h % $div == 0) { $tmp[$cnt++] = $i + 1; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($tmp, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  import org.apache.spark.sql.graftbridge.bridge
  def apply(c: Column, w: Int, div: Int): Column =
    bridge.toColumn(CdcBoundaries(bridge.toExpression(c), w, div))
}
