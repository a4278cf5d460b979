package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers graft's custom functions for SQL users, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works the same as the
  * Column API. */
object Register {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    spark.udf.register("graft_slugify",
      org.apache.spark.sql.functions.udf(Udfs.slugify))
    spark.udf.register("graft_weighted_avg_cents",
      org.apache.spark.sql.functions.udaf(Udfs.WeightedAvgCents))
  }
}
