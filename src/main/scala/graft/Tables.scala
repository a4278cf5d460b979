package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md §2). One parquet file per table under the sf dir.
  *
  * All loads are plain `spark.read.parquet` so Catalyst gets native
  * column pruning + predicate pushdown into the scan; no schema
  * inference happens (parquet footers carry the schema).
  */
object Tables {
  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "lineitem"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "embeddings"))

  /** `events.ts` is written as parquet TIMESTAMP(NANOS); Spark's reader
    * rejects that type, so (with `spark.sql.legacy.parquet.nanosAsLong`,
    * see [[GraftSession]]) we read the raw int64 nanos and truncate to
    * micros — the same ns→us truncation DuckDB applies, keeping the
    * oracle comparable. Result column is TIMESTAMP_NTZ like every other
    * testdata timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
}
