package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5PrefixSpec extends SparkSpec {
  import spark.implicits._

  private def baseline(c: org.apache.spark.sql.Column, hexDigits: Int) =
    conv(substring(md5(c), 1, hexDigits), 16, 10).cast("long")

  test("kernel == conv(substring(md5)) baseline on fixed edge cases") {
    val rows = Seq("", " ", "a", "hello world", "héllo wörld 世界",
      "x" * 1000, "tab\tnew\nline")
    for (hd <- Seq(8, 12)) {
      val df = rows.toDF("s")
        .select(Md5Prefix(col("s"), hd).as("k"), baseline(col("s"), hd).as("b"))
      df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"hexDigits=$hd mismatch"))
    }
  }

  test("property: kernel == baseline on random strings (both widths)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const('é'), Gen.const('世')))
      .map(_.mkString)
    val prop = Prop.forAll(strGen, Gen.oneOf(2, 8, 12, 14)) { (s: String, hd: Int) =>
      val r = Seq(s).toDF("s")
        .select(Md5Prefix(col("s"), hd), baseline(col("s"), hd)).head()
      r.getLong(0) == r.getLong(1)
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("md5_prefix stays inside whole-stage codegen; null in, null out") {
    val df = spark.range(8)
      .select(concat(lit("gram "), col("id").cast("string")).as("s"))
      .select(Md5Prefix(col("s"), 12).as("h"))
    val stages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.exists(_.toString.contains("md5_prefix")),
      df.queryExecution.executedPlan.toString)
    assert(df.distinct().count() === 8)
    val n = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(Md5Prefix(col("s"), 12).as("h")).collect()
    assert(n.count(_.isNullAt(0)) === 1)
  }

  test("odd or oversized hexDigits is rejected at construction") {
    intercept[IllegalArgumentException](Md5Prefix(col("s"), 7))
    intercept[IllegalArgumentException](Md5Prefix(col("s"), 16))
  }

  test("SQL surface: md5_prefix(s, n) via GraftExtensions, literal width enforced") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(ext)
    org.apache.spark.sql.graftbridge.bridge.applyInjectedFunctions(ext, spark)
    val r = spark.sql(
      """SELECT md5_prefix('hello world', 12) AS h12,
                conv(substring(md5('hello world'), 1, 12), 16, 10) AS b12""").head()
    assert(r.getLong(0) === r.getString(1).toLong)
    // a non-literal width is a hash-contract violation → analysis error
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT md5_prefix('x', CAST(id AS INT)) FROM range(1)").collect())
  }
}
