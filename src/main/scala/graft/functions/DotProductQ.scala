package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two quantized (milliunit) long vectors —
  * the inner kernel of every similarity/ANN operator in
  * [[graft.similarity.Similarity]].
  *
  * A native Catalyst expression with `doGenCode`: the generated code is a
  * single fused loop over the two `ArrayData` values — no intermediate
  * zipped array, no lambda-function frames, and it stays inside
  * whole-stage codegen. The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0, _+_)`) allocates a zipped array
  * per row pair and evaluates two lambdas per element; on the ANN hot
  * path (one dot per candidate pair) that is the dominant cost.
  *
  * Null semantics mirror the HOF formulation exactly: NULL if either
  * input is NULL, if the lengths differ (zip_with pads with null →
  * null product → null sum), or if any element is NULL.
  * ImplicitCastInputTypes (not check-only ExpectsInputTypes) keeps the
  * HOF formulation's coercion: int/float arrays promote to bigint
  * arrays instead of failing analysis.
  *
  * Overflow semantics also mirror the HOF formulation under ANSI mode
  * (the default on Spark 4): `Math.multiplyExact`/`addExact` throw
  * ArithmeticException where the baseline's `*`/`+` would — a silent
  * wraparound here would return a WRONG similarity value where the
  * declarative plan errors. Quantized milliunit embeddings stay far from
  * the boundary (|x| ≤ ~1e6 ⇒ products ≤ 1e12, 6 orders under 2^63),
  * so the exact ops cost nothing on the hot path.
  */
case class DotProductQ(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def prettyName: String = "dot_q"
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = Math.addExact($acc, Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}

object DotProductQ {
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `dot_q(a, b)`. */
  def apply(a: Column, b: Column): Column =
    bridge.toColumn(DotProductQ(bridge.toExpression(a), bridge.toExpression(b)))
}
