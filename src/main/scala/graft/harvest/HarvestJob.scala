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
      meltVars: Seq[String] = Seq("prefLabel", "altLabel", "definition"),
      /** H4: also export the store as one reference-compatible SQLite
        * file (the reference's `translations.db` deliverable). */
      sqliteArtifact: Option[String] = None)

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

    // A16 stats are collected as the data flows, not as extra jobs:
    // the raw-bindings count rides the first materialization via observe()
    // (the source is read exactly once), and every other statistic is one
    // multi-aggregate pass over an already-cached intermediate.
    val bindingsObs = org.apache.spark.sql.Observation("bindings_read")
    val bindings = Source.readBindings(spark, cfg.bindingsPath)
      .observe(bindingsObs, count(lit(1)).as("n"))
    val valid = Transform.filterValidBindings(Transform.distinctRows(bindings)).cache()
    val asOf: Column = lit(cfg.asOf)

    // (validRows, distinctTerms) in one pass — also materializes the cache,
    // which fires the bindings observation.
    val vRow = valid.agg(count(lit(1)), countDistinct(col("concept"))).head()
    val validRows = vRow.getLong(0)
    val distinctTerms = vRow.getLong(1)
    val bindingsRead = bindingsObs.get("n").asInstanceOf[Long]

    val existingTerms =
      Store.readTableOr(spark, cfg.storeDir, "terms", Schemas.terms).cache()
    // (count, max id) in one pass
    val etRow = existingTerms.agg(count(lit(1)), max(col("id"))).head()
    val existingCount = etRow.getLong(0)
    val nextTermId = (if (etRow.isNullAt(1)) 0L else etRow.getLong(1)) + 1

    // localCheckpoint, not cache (late r12 — the streaming sink's "ledger
    // prune discipline", applied to the batch job too): cache() keeps the
    // lineage back to the CURRENT store's parquet, and the first
    // writeTable swap DELETES those files before the second table is
    // written — on a cluster, recomputing a lost cached partition of
    // `allFields` (whose lineage runs through `terms` → the old terms
    // parquet) would read deleted paths. The eager checkpoint cuts the
    // lineage before any swap runs; single-JVM local mode never hit it
    // (MEMORY_AND_DISK evicts to disk, recompute needs executor loss).
    // Trade-off (r13 ADVICE): localCheckpoint blocks are UNRECOVERABLE
    // on executor loss — this converts the silent wrong-path recompute
    // into a hard job failure (fail-fast; the job re-runs idempotently).
    // Reliable checkpointing would add fault tolerance at the cost of a
    // distributed-FS round-trip per table.
    val terms = Merge.upsertTerms(
      existingTerms, valid.select(col("concept").as("uri")), asOf,
      startId = Some(nextTermId)).localCheckpoint(true)
    // (count, updated-count) in one pass
    val tRow = terms.agg(count(lit(1)),
      count(when(col("updated_at") === asOf && col("created_at") =!= asOf, 1))).head()
    val termsInserted = tRow.getLong(0) - existingCount
    val termsUpdated = tRow.getLong(1)

    val melted = Transform.meltAll(valid, cfg.meltVars)
    val resolved = Merge.resolveFk(melted, terms)
    val existingFields =
      Store.readTableOr(spark, cfg.storeDir, "term_fields", Schemas.termFields).cache()
    val efRow = existingFields.agg(count(lit(1)), max(col("id"))).head()
    val existingFieldCount = efRow.getLong(0)
    val nextFieldId = (if (efRow.isNullAt(1)) 0L else efRow.getLong(1)) + 1
    val allFields = Merge.insertIfAbsent(existingFields, resolved, asOf,
      startId = Some(nextFieldId)).localCheckpoint(true)
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
    cfg.sqliteArtifact.foreach(Store.writeSqliteArtifact(spark, cfg.storeDir, _))

    // terms/allFields are checkpointed, not cached — their blocks free via
    // the ContextCleaner; only the cache()d frames need explicit release
    valid.unpersist()
    existingTerms.unpersist(); existingFields.unpersist()

    Result(bindingsRead, validRows, distinctTerms,
      termsInserted, termsUpdated, fieldsInserted, warnings)
  }
}
