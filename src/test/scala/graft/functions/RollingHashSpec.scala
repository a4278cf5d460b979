package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))

  test("rolling_hash matches the reference polynomial over codegen path") {
    val inputs = Seq("", "a", "hello world", "üñïçødé", "x" * 10000)
    val got = inputs.toDF("s").select(RollingHash($"s")).collect().map(_.getLong(0))
    assert(got.toSeq === inputs.map(reference))
  }

  test("exact regime (b13_fingerprint_portable): kernel == pure-BigInt polynomial " +
    "for <=12 ASCII bytes; 13 bytes overflows") {
    // the portable-twin contract: within FingerprintMaxLen ASCII bytes the
    // 64-bit hash never wraps, so an ANSI engine's plain BIGINT Horner
    // chain replays it bit-exactly. Pin the boundary with the max-valued
    // ASCII byte '~' (126): 12 bytes stays under 2^63; 13 does not.
    def exact(s: String): BigInt =
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => h * 31 + (b & 0xff))
    val inBound = Seq("~" * 12, "a", "hello", "x" * 12, " !~", "0123456789ab")
    assert(inBound.forall(s => exact(s) <= Long.MaxValue))
    val got = inBound.toDF("s").select(RollingHash($"s")).collect().map(_.getLong(0))
    assert(got.toSeq === inBound.map(s => exact(s).toLong))
    assert(exact("~" * 13) > Long.MaxValue) // 13 bytes: wraparound regime
  }

  test("rolling_hash is null-safe and whole-stage-codegen friendly") {
    val df = Seq(Some("abc"), None).toDF("s").select(RollingHash($"s").as("h"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === reference("abc"))
    assert(rows(1).isNullAt(0))
    // stays inside WholeStageCodegen (no codegen fallback fence); use a
    // range input — a local relation would collapse to LocalTableScan
    val planned = spark.range(2).select(RollingHash(concat(lit("ab"), $"id")).as("h"))
    assert(planned.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
    assert(planned.collect().map(_.getLong(0)).toSeq ===
      Seq(reference("ab0"), reference("ab1")))
  }
}
