package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The at-scale mechanics (SURVEY §8 design notes made executable):
  * skew-salted joins, bucketed co-located joins, partitioned layouts.
  * These are the knobs a 1000-executor deployment turns; ScaleOpsSpec
  * asserts their plan-level effects (no exchange on bucketed joins,
  * partition pruning on partitioned layouts, salted == unsalted results).
  */
object ScaleOps {

  /** Skew-salted equi-join (inner): the small side is replicated into
    * `salts` copies; each big-side row picks one deterministic salt, so a
    * hot key's rows spread over `salts` reducer partitions instead of one.
    * Use when one key dominates (AQE's skew handling covers sort-merge
    * joins; salting also works for aggregations and older planners).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic per-row spread: hash the whole row, not rand() — keeps
    // the query replayable and oracle-friendly
    val rowHash = xxhash64(struct(big.columns.map(col): _*))
    val saltedBig = big.withColumn("__salt", pmod(rowHash, lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for a skewed key — partial
    * aggregate on (key, salt), then final on key. Exact for algebraic
    * aggregates (sum/count here). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows"))
  }

  /** Write a DataFrame as a bucketed external table: co-locates rows by
    * `key` so future equi-joins/aggregations on `key` skip the shuffle
    * entirely (both sides must share bucket count + key). */
  def writeBucketed(df: DataFrame, path: String, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Write a DataFrame hive-partitioned by `partitionCol`: equality/IN
    * filters on that column prune entire directories at plan time. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Run `f` with Catalyst's runtime bloom-filter join pruning forced on:
    * when one join side carries a selective filter, the optimizer injects a
    * bloom-filter aggregate on that side and a `might_contain` probe into
    * the OTHER side's scan, so most non-matching fact rows die before the
    * shuffle instead of after it. This is THE cheap scan-side win for
    * star joins at 100 TB (the fact side is read once regardless; the
    * bloom probe cuts what gets hashed + exchanged). Spark gates the
    * rewrite on size estimates tuned for clusters — this helper pins the
    * thresholds so the plan shape is demonstrable (and spec-assertable) at
    * local fixture scale; production leaves the defaults on.
    */
  def withBloomPruning[T](df: DataFrame)(f: => T): T = {
    val conf = df.sparkSession.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // a broadcast join would make the bloom filter pointless (and the
      // optimizer skips injection); force the shuffle-join shape the
      // rewrite targets
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      f
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
