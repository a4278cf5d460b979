package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * in [[queries]]; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle lives in [[oracleSql]] (same column names, same total
  * ordering — the driver hash-compares values after sorting columns by
  * name).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.Relational.queries, ops.Relational.oracles),
      (ops.HarvestQueries.queries, ops.HarvestQueries.oracles),
      (text.TextAnalysis.queries, text.TextAnalysis.oracles),
      (dedup.Dedup.queries, dedup.Dedup.oracles),
      (similarity.Similarity.queries, similarity.Similarity.oracles),
      (streaming.Streaming.queries, streaming.Streaming.oracles),
      (multimodal.Multimodal.queries, multimodal.Multimodal.oracles),
      (functions.Udfs.queries, functions.Udfs.oracles),
      (ops.Relational2.queries, ops.Relational2.oracles),
      (plans.AsOfJoin.queries, plans.AsOfJoin.oracles),
      (ops.WorkflowQueries.queries, ops.WorkflowQueries.oracles),
      (ops.EventAnalytics.queries, ops.EventAnalytics.oracles),
      (ops.PretrainPipeline.queries, ops.PretrainPipeline.oracles),
      (ops.GraphOps.queries, ops.GraphOps.oracles),
      (ops.RagPipeline.queries, ops.RagPipeline.oracles),
      (ops.IngestPipeline.queries, ops.IngestPipeline.oracles),
      (ops.ScaleQueries.queries, ops.ScaleQueries.oracles),
      (ops.TpchQueries.queries, ops.TpchQueries.oracles),
      (ops.TrainPipeline.queries, ops.TrainPipeline.oracles),
      (ops.EvalPipeline.queries, ops.EvalPipeline.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** The queries DELIBERATELY shipped without a DuckDB oracle (engine
    * hash families DuckDB cannot replay) — each has a hash-gated portable
    * twin. This is the EXPLICIT allowlist the registry invariant below
    * checks against: a query can only be oracle-less by appearing here,
    * never by accident (r10, ADVICE: the bench's drift self-check was
    * tautological — `queries` checked against itself; the invariant now
    * crosses two independently-authored registries, the per-module query
    * maps and the per-module oracle maps, plus this list). */
  val noOracleByDesign: Set[String] = Set(
    "b05_approx_stats",   // portable twin: b05_approx_stats_exact
    "b12_minhash_lsh",    // engine minhash; twin: b12_minhash_portable
    "b12_simhash",        // engine xxhash sim; twin: b12_simhash_portable
    "b12_cross_neardup",  // engine minhash; twin: b12_cross_portable
    "b13_bpe_merges",     // iterative train loop; twin: b13_bpe_portable
    "b13_fingerprint")    // engine hash winnowing; twin: b13_fingerprint_portable

  /** Registry invariant, asserted by Bench and the contract spec: every
    * declared query either has an oracle or is on the explicit no-oracle
    * list, and vice versa (no orphan oracles, no stale allowlist rows). */
  def registryInvariant(): Unit = {
    val q = queries.keySet
    val o = oracleSql.keySet
    val unaccounted = q -- o -- noOracleByDesign
    val orphanOracles = o -- q
    val staleAllowlist = noOracleByDesign -- q
    val doubleBooked = noOracleByDesign.intersect(o)
    require(unaccounted.isEmpty && orphanOracles.isEmpty &&
      staleAllowlist.isEmpty && doubleBooked.isEmpty,
      s"registry drift: unaccounted=$unaccounted orphanOracles=$orphanOracles " +
        s"staleAllowlist=$staleAllowlist doubleBooked=$doubleBooked")
  }
}
