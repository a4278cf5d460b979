package graft.harvest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source layer.
  *
  * A1 — the reference fetches LIMIT/OFFSET pages sequentially
  * (harvest.py:54-87,405-416); here each offset range becomes one Spark
  * partition so pages fetch in parallel across executors.
  * A2 — per-page retry with exponential backoff (harvest.py:144-158) runs
  * inside the partition reader; Spark task retries are the backstop.
  *
  * File-based bindings (the portable path) are plain parquet/json reads
  * with the fixed bindings schema — no inference.
  */
object Source {

  /** Marker for transient, retryable fetch failures (the reference retries
    * only HTTP 502 — harvest.py:150). */
  class TransientFetchException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** A2: retry `f` up to `maxRetries` times on [[TransientFetchException]],
    * sleeping baseDelayMs * 2^attempt between attempts (harvest.py:144-158). */
  def withRetry[T](maxRetries: Int = 3, baseDelayMs: Long = 1000)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: TransientFetchException =>
          if (attempt >= maxRetries) throw e
          Thread.sleep(baseDelayMs * (1L << attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** A1: partition-parallel paginated scan. One input partition per offset
    * range; `fetchPage(offset, limit)` runs on executors with retry.
    * `fetchPage` must be serializable and side-effect-free per page.
    */
  def paginated(spark: SparkSession, totalCount: Long, pageSize: Int,
                schema: StructType,
                fetchPage: (Long, Int) => Seq[Row],
                maxRetries: Int = 3, baseDelayMs: Long = 1000): DataFrame = {
    val pages = spark.range(0, math.max(totalCount, 0), math.max(pageSize, 1))
    val rows = pages.rdd.flatMap { offset =>
      withRetry(maxRetries, baseDelayMs) { fetchPage(offset, pageSize) }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Read a bindings file (parquet or json by extension) with the fixed
    * schema. */
  def readBindings(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".json") || path.endsWith(".jsonl"))
      spark.read.schema(Schemas.bindings).json(path)
    else
      spark.read.schema(Schemas.bindings).parquet(path)
}
