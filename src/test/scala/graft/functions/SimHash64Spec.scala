package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private def aggPath(docs: org.apache.spark.sql.DataFrame) =
    graft.dedup.Dedup.simHashSketches(docs).select("doc_id", "simhash")
  private def rowPath(docs: org.apache.spark.sql.DataFrame) =
    graft.dedup.Dedup.simHashSketchesRow(docs).select("doc_id", "simhash")

  test("row expression == explode+agg pipeline on fixed edge cases") {
    val docs = Seq(
      (1L, "plain tokens here"),
      (2L, ""),                    // split("") = [""] → one empty token
      (3L, " leading and  double space "), // empty tokens preserved
      (4L, "ünïcödé tøkens über alles"),   // multi-byte UTF-8
      (5L, "solo"))
      .toDF("doc_id", "text")
    val a = aggPath(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = rowPath(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("property: row expression == agg pipeline on random token lists") {
    val tokGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("日本語"))
    val docGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
      .map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(5, docGen)) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val a = aggPath(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = rowPath(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      a == b
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash64 stays inside whole-stage codegen") {
    val df = spark.range(8).select(concat(lit("tok "), col("id").cast("string")).as("text"))
      .select(SimHash64(col("text")).as("sh"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("simhash64")),
      df.queryExecution.executedPlan.toString)
    assert(df.distinct().count() === 8) // distinct token sets → distinct sketches
  }

  test("simhash sketch query plan has no shuffle exchange (scan-side projection)") {
    val q = graft.dedup.Dedup.simHashSketchesRow(
      graft.Tables.documents(spark, sfDir))
    // an exchange-bearing plan would be WRAPPED in AdaptiveSparkPlanExec
    // (a leaf that hides children from collect) — assert not-wrapped
    // first so the exchange check below cannot pass vacuously
    assert(!q.queryExecution.executedPlan
      .isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec])
    val exchanges = q.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty)
  }
}
