package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The user-extension surface (SURVEY §2 B14): scalar Scala UDFs and typed
  * `Aggregator` UDAFs. Built-ins are always preferred (codegen'd); these
  * exist to prove the extension points work and stay deterministic.
  */
object Udfs {

  /** Scalar UDF: slugify a name. (A builtin chain could do this — the point
    * is the registration surface.) */
  val slugify: String => String = s =>
    if (s == null) null else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").stripPrefix("-").stripSuffix("-")

  /** Typed UDAF: exact weighted average in integer cents — value scaled to
    * cents once, then pure long arithmetic, so the buffer merges
    * order-independently with no float drift (same exactness discipline as
    * the decimal sums in [[graft.ops.Relational]]). */
  object WeightedAvgCents extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) = {
      val cents = math.round(a._1 * 100) // value → exact cents
      val w = math.round(a._2) // integer weight
      (b._1 + cents * w, b._2 + w)
    }
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) = (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1.toDouble / (100.0 * b._2.toDouble)
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  /** B14 scalar-UDF query: slugified part names. */
  def udfSlugQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val slug = udf(slugify)
    Tables.part(s, dir)
      .select($"p_partkey", slug($"p_name").as("slug"))
      .orderBy($"p_partkey")
  }

  /** B14 UDAF query: per-returnflag quantity-weighted average price via the
    * typed Aggregator. */
  def udafWeightedAvgQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wavg = udaf(WeightedAvgCents)
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(wavg($"l_extendedprice", $"l_quantity").as("weighted_avg_price"))
      .orderBy($"l_returnflag")
  }

  /** B9 map/JSON functions: parse `events.props` into a MAP, then use map
    * functions. Output flattened to scalars for oracle portability. */
  def mapFuncsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("m", from_json($"props", org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .select($"event_id",
        size($"m").as("n_keys"),
        array_join(map_keys($"m"), ",").as("keys"),
        element_at($"m", "k").as("k_value"))
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b14_udf_slug" -> (udfSlugQuery _),
    "b14_udaf_weighted_avg" -> (udafWeightedAvgQuery _),
    "b09_map_funcs" -> (mapFuncsQuery _),
  )

  val oracles: Map[String, String] = Map(
    "b14_udf_slug" -> """
      SELECT p_partkey,
        trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '-') AS slug
      FROM part ORDER BY p_partkey""",
    "b14_udaf_weighted_avg" -> """
      SELECT l_returnflag,
        CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
          / (100.0 * CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)) AS weighted_avg_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "b09_map_funcs" -> """
      SELECT event_id,
        CAST(1 AS INT) AS n_keys,
        'k' AS keys,
        CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_value
      FROM events ORDER BY event_id""",
  )
}
