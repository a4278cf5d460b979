package graft.harvest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EP1 — the full harvest pipeline (/root/reference/harvest.py:383-485)
  * as one declarative DataFrame DAG:
  *
  *   bindings → validate/filter (A9/A18) → distinct (A5)
  *     → terms upsert (A10/A11/A12/A17)
  *     → melt (A14) → FK join (A13) → insert-if-absent (A15)
  *     → staged atomic write (A21/A22/A23) + stats (A16)
  *
  * The reference's sequential page loop disappears into source
  * partitioning; its per-row SQLite probes become two shuffle joins.
  */
object HarvestJob {

  case class Config(
      collectionUri: String,
      bindingsPath: String,
      storeDir: String,
      /** injected clock (SURVEY §7 H3) — all generated timestamps in one
        * run share this value, like CURRENT_TIMESTAMP in one transaction */
      asOf: java.sql.Timestamp,
      meltVars: Seq[String] = Seq("prefLabel", "altLabel", "definition"))

  case class Result(
      bindingsRead: Long,
      validRows: Long,
      distinctTerms: Long,
      termsInserted: Long,
      termsUpdated: Long,
      fieldsInserted: Long,
      warnings: Seq[String]) {
    /** harvest.py:376-380 summary. */
    def summary: String =
      s"Harvest complete: $bindingsRead bindings, $validRows valid rows, " +
        s"$distinctTerms terms ($termsInserted new, $termsUpdated updated), " +
        s"$fieldsInserted new field values"
  }

  def run(spark: SparkSession, cfg: Config): Result = {
    val warnings = Validate.validateCollectionUri(cfg.collectionUri).toSeq

    val bindings = Source.readBindings(spark, cfg.bindingsPath)
    val valid = Transform.filterValidBindings(Transform.distinctRows(bindings)).cache()
    val asOf: Column = lit(cfg.asOf)

    val existingTerms =
      Store.readTableOr(spark, cfg.storeDir, "terms", Schemas.terms).cache()
    val existingCount = existingTerms.count()

    val terms = Merge.upsertTerms(
      existingTerms, valid.select(col("concept").as("uri")), asOf).cache()

    val melted = Transform.meltAll(valid, cfg.meltVars)
    val resolved = Merge.resolveFk(melted, terms)
    val existingFields =
      Store.readTableOr(spark, cfg.storeDir, "term_fields", Schemas.termFields).cache()
    val existingFieldCount = existingFields.count()
    val allFields = Merge.insertIfAbsent(existingFields, resolved, asOf).cache()

    // A16 statistics — cheap aggregates over cached intermediates.
    val bindingsRead = bindings.count()
    val validRows = valid.count()
    val distinctTerms = valid.select("concept").distinct().count()
    val termCount = terms.count()
    val termsInserted = termCount - existingCount
    val termsUpdated = terms
      .filter(col("updated_at") === asOf && col("created_at") =!= asOf).count()
    val fieldsInserted = allFields.count() - existingFieldCount

    // A19/A20: fail the job (like the reference's sqlite3.Error path,
    // harvest.py:477-479) if the merged store would violate its
    // uniqueness constraints.
    Validate.enforce(Validate.uniqueViolations(terms, Seq("uri")), "terms.uri unique")
    Validate.enforce(
      Validate.uniqueViolations(allFields, Seq("term_id", "field_uri", "original_value")),
      "term_fields(term_id, field_uri, original_value) unique")

    // A21/A22: staged writes, then swap; bootstrap the never-written tables.
    Store.writeTable(terms, cfg.storeDir, "terms")
    Store.writeTable(allFields, cfg.storeDir, "term_fields")
    Store.bootstrap(spark, cfg.storeDir)

    valid.unpersist(); terms.unpersist(); allFields.unpersist()
    existingTerms.unpersist(); existingFields.unpersist()

    Result(bindingsRead, validRows, distinctTerms,
      termsInserted, termsUpdated, fieldsInserted, warnings)
  }
}
