package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The ENGINE-PORTABLE md5-prefix integer hash — `conv(substring(md5(s),
  * 1, hexDigits), 16, 10)` fused into one per-row kernel.
  *
  * The composed formulation is the repo's cross-engine hash contract
  * (identical in DuckDB as `CAST('0x' || substr(md5(s), 1, h) AS
  * BIGINT)`), but as a Spark plan it materializes a 32-char hex
  * UTF8String, slices it, and parses it back through base conversion —
  * three string allocations per gram on the hottest path of the span/
  * fingerprint operators. This kernel digests the UTF-8 bytes in place
  * (no copy when the string is heap-backed) and assembles the first
  * `hexDigits/2` digest bytes big-endian into the SAME long value —
  * bit-identical by construction and property-tested against the
  * composed baseline, so every DuckDB oracle is untouched.
  *
  * `hexDigits` must be even (prefixes are whole digest bytes) and ≤ 14
  * (15+ hex digits could exceed a signed long in the conv formulation).
  * Null input → null, matching `md5`'s null propagation.
  */
case class Md5Prefix(child: Expression, hexDigits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(hexDigits > 0 && hexDigits % 2 == 0 && hexDigits <= 14,
    s"hexDigits must be even and in [2, 14], got $hexDigits")
  override def dataType: DataType = LongType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "md5_prefix"

  override def nullSafeEval(input: Any): Any =
    Md5PrefixImpl.compute(input.asInstanceOf[UTF8String], hexDigits / 2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5PrefixImpl.compute($c, ${hexDigits / 2});")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Prefix {
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `md5Prefix(s, hexDigits)`. */
  def apply(c: Column, hexDigits: Int): Column =
    bridge.toColumn(Md5Prefix(bridge.toExpression(c), hexDigits))
}

/** Static kernel so generated code can call it (object methods surface as
  * Java static forwarders — the same linkage Spark's hash codegen uses). */
object Md5PrefixImpl {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, nBytes: Int): Long = {
    val md = digest.get()
    md.reset()
    val base = s.getBaseObject
    val n = s.numBytes
    base match {
      // heap-backed: digest in place over the backing array, zero copies
      case arr: Array[Byte] =>
        val off = s.getBaseOffset - Platform.BYTE_ARRAY_OFFSET
        md.update(arr, off.toInt, n)
      case _ =>
        md.update(s.getBytes)
    }
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < nBytes) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v
  }
}
