package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Merge-intersection of two SORTED long arrays — the per-edge kernel of
  * the triangle counter ([[graft.ops.GraphOps.trianglesOf]] intersects
  * the two endpoints' out-adjacency arrays on every oriented edge).
  *
  * `array_intersect` builds a hash set per invocation (per ROW on the
  * edge-join hot path — millions of allocations and rehashes per stage).
  * This expression exploits the arrays' sort order (they come from
  * `sort_array(collect_list(..))`) to emit the intersection in one fused
  * two-pointer pass with a single output allocation, inside whole-stage
  * codegen.
  *
  * CONTRACT (the caller's, by construction in the graph kernel): both
  * inputs sorted ascending with non-null elements. Duplicate elements
  * are handled set-wise (each common value emitted once, like
  * `array_intersect`), so accidental duplicates cannot inflate triangle
  * counts. Unsorted input is the caller's bug — results are then
  * undefined, which is why the SQL registration documents the contract
  * in its usage string. NULL if either input is NULL, matching the
  * built-in. */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // containsNull = false: a null element slot would read as garbage 0 via
  // getLong, silently corrupting results for SQL callers — reject at analysis.
  override def inputTypes =
    Seq(ArrayType(LongType, containsNull = false), ArrayType(LongType, containsNull = false))
  override def prettyName: String = "sorted_intersect"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    val buf = new Array[Long](math.min(n, m))
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        if (c == 0 || buf(c - 1) != x) { buf(c) = x; c += 1 } // set semantics on dups
        i += 1; j += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val buf = ctx.freshName("buf")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |final long[] $buf = new long[Math.min($n, $m)];
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else {
         |    if ($c == 0 || $buf[$c - 1] != $x) { $buf[$c++] = $x; }
         |    $i++; $j++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `sorted_intersect(a, b)`. */
  def apply(a: Column, b: Column): Column =
    bridge.toColumn(SortedIntersect(bridge.toExpression(a), bridge.toExpression(b)))
}
