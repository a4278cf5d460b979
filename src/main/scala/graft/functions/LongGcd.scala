package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Greatest common divisor of two longs (Euclid, on absolute values) —
  * the canonicalization kernel behind exact-rational analytics: reducing a
  * slope Δy/Δx to lowest terms (py, px) makes rational EQUALITY a plain
  * column equality, so a groupBy can collapse equal slopes before the
  * (tiny) exact-ordering stage. Spark ships no `gcd` builtin; this is the
  * codegen-friendly one-pass loop (matches DuckDB's `gcd` on the oracle
  * side, which also works on absolute values).
  *
  * `long_gcd(0, 0) = 0`; otherwise strictly positive. Euclid runs raw on
  * signed values (Java `%` tracks the dividend's sign and strictly
  * shrinks magnitude), with one final negation — so no abs-of-MinValue
  * overflow mid-loop. The single unrepresentable case is a TRUE gcd of
  * 2⁶³ (e.g. `long_gcd(Long.MinValue, 0)`), which wraps to MinValue —
  * impossible for this library's callers (cents-scaled deltas ≪ 2⁶³). */
case class LongGcd(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType, LongType)
  override def prettyName: String = "long_gcd"

  override def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[Long]
    var b = r.asInstanceOf[Long]
    // Euclid is sign-agnostic under Java's % (remainder tracks dividend
    // sign, magnitude strictly decreases) — run it raw, take abs at the
    // end when the result is guaranteed > Long.MinValue.
    while (b != 0L) { val t = a % b; a = b; b = t }
    if (a < 0L) -a else a
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a"); val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      s"""
         |long $a = $l; long $b = $r;
         |while ($b != 0L) { final long $t = $a % $b; $a = $b; $b = $t; }
         |${ev.value} = ($a < 0L) ? -$a : $a;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongGcd =
    copy(left = newLeft, right = newRight)
}

object LongGcd {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `long_gcd(a, b)`. */
  def apply(a: Column, b: Column): Column =
    bridge.toColumn(LongGcd(bridge.toExpression(a), bridge.toExpression(b)))
}
