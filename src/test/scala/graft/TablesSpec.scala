package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Guards for the two r5 ADVICE findings on [[Tables.events]]:
  *  1. the NTZ conversion must not depend on spark.sql.session.timeZone
  *     (a non-GraftSession session must read identical values);
  *  2. the int64 branch must fire only for parquet TIMESTAMP(NANOS) —
  *     a genuine BIGINT column named `ts` fails fast, never a silent
  *     divide-by-1000.
  */
class TablesSpec extends SparkSpec {

  test("events lands on TIMESTAMP_NTZ with stable values") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() > 0)
    // sanity: values are in a plausible wall-clock range, not raw nanos
    val r = df.agg(min("ts").cast("string"), max("ts").cast("string")).head()
    assert(r.getString(0) >= "1990-01-01" && r.getString(1) <= "2100-01-01",
      s"implausible ts range: $r")
  }

  test("events read is session-timezone independent") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    val utcRows = Tables.events(spark, sfDir)
      .orderBy("event_id").limit(50).select(col("ts").cast("string")).collect().map(_.getString(0))
    try {
      spark.conf.set(tzKey, "America/New_York")
      val nyRows = Tables.events(spark, sfDir)
        .orderBy("event_id").limit(50).select(col("ts").cast("string")).collect().map(_.getString(0))
      assert(nyRows.toSeq == utcRows.toSeq,
        "events ts values shifted with the session timezone")
    } finally spark.conf.set(tzKey, saved)
  }

  test("a genuine BIGINT ts column fails fast instead of being divided by 1000") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tables").toString
    // raw micros in a BIGINT column: LongType to Spark, but the footer says
    // plain int64, NOT TIMESTAMP(NANOS) — must be refused, not re-scaled
    Seq((1L, 1700000000000000L), (2L, 1700000001000000L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val raw = spark.read.parquet(s"$tmp/events.parquet")
    assert(raw.schema("ts").dataType == LongType)
    val e = intercept[RuntimeException] { Tables.events(spark, tmp) }
    assert(e.getMessage.contains("TIMESTAMP(NANOS)"), e.getMessage)
  }
}
