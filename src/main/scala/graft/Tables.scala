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

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader only
    * accepts as raw int64 (`spark.sql.legacy.parquet.nanosAsLong`, see
    * [[GraftSession]]), truncated here to micros exactly like DuckDB's
    * ns→us read — and plain TIMESTAMP(MICROS), read natively. Both paths
    * land on TIMESTAMP_NTZ like every other testdata timestamp, so the
    * oracle sees identical values either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(path(dir, "events"))
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
