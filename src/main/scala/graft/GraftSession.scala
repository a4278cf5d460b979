package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration so Verify / Bench / tests / CLI all
  * run with identical semantics.
  *
  * - UTC + TIMESTAMP_NTZ parity with the DuckDB oracle.
  * - `nanosAsLong`: the driver-generated `events.parquet` stores
  *   TIMESTAMP(NANOS) which Spark's parquet reader rejects by default;
  *   reading as long + explicit conversion in [[Tables.events]] keeps the
  *   scan vectorized.
  * - AQE on: at cluster scale this gives runtime shuffle-partition
  *   coalescing and skew-join splitting for free.
  */
object GraftSession {
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")

  /** Local session for tests/dev. */
  def local(threads: Int = 8): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
