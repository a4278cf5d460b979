package graft.functions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

class DotProductQSpec extends SparkSpec {
  import spark.implicits._

  private def both(a: Seq[java.lang.Long], b: Seq[java.lang.Long]) = {
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      Similarity.dotQ(col("a"), col("b")).as("native"),
      Similarity.dotQHof(col("a"), col("b")).as("hof")).head()
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
     if (r.isNullAt(1)) None else Some(r.getLong(1)))
  }

  test("native dot_q matches the HOF formulation incl. null/length edge cases") {
    val lv: Long => java.lang.Long = java.lang.Long.valueOf
    // plain case
    assert(both(Seq(lv(1), lv(2), lv(3)), Seq(lv(4), lv(5), lv(6))) === ((Some(32L), Some(32L))))
    // length mismatch → null on both paths
    assert(both(Seq(lv(1), lv(2)), Seq(lv(3))) === ((None, None)))
    // null element → null on both paths
    assert(both(Seq(lv(1), null), Seq(lv(3), lv(4))) === ((None, None)))
    // empty arrays → 0
    assert(both(Seq.empty, Seq.empty) === ((Some(0L), Some(0L))))
  }

  test("property: native == HOF on random long vectors (codegen + interpreted)") {
    val vecGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100000L, 100000L)))
    val prop = Prop.forAll(vecGen, vecGen) { (a: List[Long], b: List[Long]) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        Similarity.dotQ(col("a"), col("b")).as("native"),
        Similarity.dotQHof(col("a"), col("b")).as("hof")).head()
      val native = if (r.isNullAt(0)) None else Some(r.getLong(0))
      val hof = if (r.isNullAt(1)) None else Some(r.getLong(1))
      native == hof
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("overflow throws like the ANSI HOF baseline, never wraps silently") {
    // Long.MaxValue * 2 overflows the multiply; [maxL, maxL]·[1, 1]
    // overflows the accumulate. Both paths must ERROR (ANSI semantics) —
    // a wrapped value would be a silently wrong similarity.
    val maxL = java.lang.Long.valueOf(Long.MaxValue)
    val one = java.lang.Long.valueOf(1L)
    val two = java.lang.Long.valueOf(2L)
    for (input <- Seq((Seq(maxL), Seq(two)), (Seq(maxL, maxL), Seq(one, one)))) {
      val df = Seq(input).toDF("a", "b")
      val native = intercept[Exception](
        df.select(Similarity.dotQ(col("a"), col("b"))).head())
      val hof = intercept[Exception](
        df.select(Similarity.dotQHof(col("a"), col("b"))).head())
      def arithmetic(e: Throwable): Boolean =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(_.isInstanceOf[ArithmeticException])
      assert(arithmetic(native), s"native threw non-arithmetic: $native")
      assert(arithmetic(hof), s"hof threw non-arithmetic: $hof")
    }
  }

  test("whole-stage codegen stays enabled through dot_q (no fallback)") {
    val df = spark.range(4)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id") * 2, lit(1L)).as("b"))
      .select(col("a"), Similarity.dotQ(col("a"), col("b")).as("d"))
    // `*(1)` prefixes in simpleString are WholeStageCodegen stages; assert
    // on the exec node itself and that dot_q's Project sits INSIDE one
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("dot_q")),
      df.queryExecution.executedPlan.toString)
    // row id=3: [3,4]·[6,1] = 22
    assert(df.orderBy(col("d").desc).head().getLong(1) === 22L)
  }
}
