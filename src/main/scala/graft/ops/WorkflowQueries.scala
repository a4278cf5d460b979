package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytics over the translation-workflow satellite tables
  * (`translations`/`appeals`, /root/reference/harvest.py:215-249 +
  * README.md:60-106). The reference bootstraps these tables but never
  * populates them — its downstream consumers do — so the queries run on
  * deterministic fixtures derived from `documents`, mirrored exactly in
  * the DuckDB oracle (same derivation SQL).
  */
object WorkflowQueries {

  private val langs = graft.harvest.Schemas.allowedLanguages // nl fr de es it pt
  private val statuses = graft.harvest.Schemas.allowedTranslationStatus

  /** Fixture: one translation row per document. */
  def translations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id".as("id"),
      $"doc_id".as("term_field_id"),
      element_at(array(langs.map(lit): _*), ($"doc_id" % 6).cast("int") + 1).as("language"),
      substring($"text", 1, 30).as("value"),
      element_at(array(statuses.map(lit): _*), ($"doc_id" % 5).cast("int") + 1).as("status"),
      concat(lit("user"), $"doc_id" % 20).as("created_by"))
  }

  /** Fixture: appeals for every 3rd translation, some still open. */
  def appeals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).filter($"doc_id" % 3 === 0).select(
      $"doc_id".as("id"),
      $"doc_id".as("translation_id"),
      concat(lit("user"), $"doc_id" % 20).as("opened_by"),
      expr("timestampadd(DAY, CAST(doc_id % 90 AS INT), TIMESTAMP_NTZ '2026-01-01 00:00:00')")
        .as("opened_at"),
      when($"doc_id" % 4 =!= 0,
        expr("timestampadd(DAY, CAST(doc_id % 90 + doc_id % 30 + 1 AS INT), TIMESTAMP_NTZ '2026-01-01 00:00:00')"))
        .as("closed_at"),
      when($"doc_id" % 4 === 0, "open").otherwise(
        when($"doc_id" % 2 === 0, "resolved").otherwise("closed")).as("status"))
  }

  /** Status × language funnel with per-language shares (A19 domain +
    * windowed ratio). */
  def translationFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = translations(s, dir)
    val counts = t.groupBy($"language", $"status").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"language")
    counts
      .withColumn("lang_total", sum($"n").over(w))
      .withColumn("share", $"n".cast("double") / $"lang_total".cast("double"))
      .orderBy($"language", $"status")
  }

  /** Contributor leaderboard: volume, approvals, approval rate, ranked. */
  def reviewerLeaderboard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = translations(s, dir)
    val agg = t.groupBy($"created_by").agg(
      count(lit(1)).as("n_translations"),
      count(when($"status" === "approved" || $"status" === "merged", 1)).as("n_accepted"))
      .withColumn("accept_rate",
        $"n_accepted".cast("double") / $"n_translations".cast("double"))
    agg.withColumn("rnk",
        rank().over(Window.orderBy($"n_accepted".desc, $"created_by")).cast("int"))
      .filter($"rnk" <= 10)
      .orderBy($"rnk", $"created_by")
  }

  /** Appeal aging: days-to-close per final status; open appeals excluded
    * from aging but counted. */
  def appealAging(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    appeals(s, dir)
      .withColumn("days_to_close", datediff($"closed_at", $"opened_at"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_appeals"),
        count($"days_to_close").as("n_closed"),
        (sum($"days_to_close").cast("double") / count($"days_to_close")).as("avg_days_to_close"))
      .orderBy($"status")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w01_translation_funnel" -> (translationFunnel _),
    "w02_reviewer_leaderboard" -> (reviewerLeaderboard _),
    "w03_appeal_aging" -> (appealAging _),
  )

  private val TFIX = """
    WITH translations AS (
      SELECT doc_id AS id, doc_id AS term_field_id,
        ['nl','fr','de','es','it','pt'][CAST(doc_id % 6 AS INT) + 1] AS language,
        substr(text, 1, 30) AS value,
        ['draft','review','approved','rejected','merged'][CAST(doc_id % 5 AS INT) + 1] AS status,
        'user' || (doc_id % 20) AS created_by
      FROM documents),
    appeals AS (
      SELECT doc_id AS id, doc_id AS translation_id,
        'user' || (doc_id % 20) AS opened_by,
        TIMESTAMP '2026-01-01' + (doc_id % 90) * INTERVAL 1 DAY AS opened_at,
        CASE WHEN doc_id % 4 <> 0
             THEN TIMESTAMP '2026-01-01' + (doc_id % 90 + doc_id % 30 + 1) * INTERVAL 1 DAY END AS closed_at,
        CASE WHEN doc_id % 4 = 0 THEN 'open'
             WHEN doc_id % 2 = 0 THEN 'resolved' ELSE 'closed' END AS status
      FROM documents WHERE doc_id % 3 = 0)
  """

  val oracles: Map[String, String] = Map(
    "w01_translation_funnel" -> s"""$TFIX
      SELECT language, status, n, lang_total,
             CAST(n AS DOUBLE) / CAST(lang_total AS DOUBLE) AS share
      FROM (
        SELECT language, status, COUNT(*) AS n,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY language) AS BIGINT) AS lang_total
        FROM translations GROUP BY language, status)
      ORDER BY language, status""",
    "w02_reviewer_leaderboard" -> s"""$TFIX
      SELECT created_by, n_translations, n_accepted, accept_rate, rnk FROM (
        SELECT *, CAST(RANK() OVER (ORDER BY n_accepted DESC, created_by) AS INT) AS rnk
        FROM (
          SELECT created_by, COUNT(*) AS n_translations,
            COUNT(CASE WHEN status IN ('approved','merged') THEN 1 END) AS n_accepted,
            CAST(COUNT(CASE WHEN status IN ('approved','merged') THEN 1 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS accept_rate
          FROM translations GROUP BY created_by))
      WHERE rnk <= 10 ORDER BY rnk, created_by""",
    "w03_appeal_aging" -> s"""$TFIX
      SELECT status, COUNT(*) AS n_appeals,
        COUNT(date_diff('day', opened_at, closed_at)) AS n_closed,
        CAST(SUM(date_diff('day', opened_at, closed_at)) AS DOUBLE)
          / COUNT(date_diff('day', opened_at, closed_at)) AS avg_days_to_close
      FROM appeals GROUP BY status ORDER BY status""",
  )
}
