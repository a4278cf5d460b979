package graft.functions

import org.apache.spark.sql.SparkSession

/** Programmatic registration of graft's custom functions for SQL users, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works the same as the
  * Column API. Config-only deployments use
  * `spark.sql.extensions=graft.GraftExtensions` instead; both paths share
  * the builders in [[graft.GraftExtensions.functions]]. */
object Register {
  def registerAll(spark: SparkSession): Unit = {
    graft.GraftExtensions.functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ident.funcName, builder, "scala_udf")
    }
    spark.udf.register("graft_slugify",
      org.apache.spark.sql.functions.udf(Udfs.slugify))
    spark.udf.register("graft_weighted_avg_cents",
      org.apache.spark.sql.functions.udaf(Udfs.WeightedAvgCents))
  }
}
