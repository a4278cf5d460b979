package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes:
  * `h = h * 31 + byte` over the full value — a deterministic document
  * fingerprint for shingling/near-dup pipelines.
  *
  * Implemented as a native Catalyst expression WITH codegen (`doGenCode`)
  * so it stays inside whole-stage codegen on the hot path — no UDF
  * serialization, no codegen fence. classic java-style `String.hashCode`
  * generalized to 64 bits.
  */
case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  // SQL-registered (`rolling_hash(x)` from user SQL): non-string arguments
  // must be rejected at analysis time, not fail inside generated code.
  // (return type inferred: AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `rolling_hash(text)`. */
  def apply(c: Column): Column =
    bridge.toColumn(RollingHash(bridge.toExpression(c)))
}
