package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** E3 (r7): end-to-end INCREMENTAL INGEST pipeline (e03) — the
  * ingestion-day counterpart to e01 (bulk curation) and e02 (serving):
  * a batch of newly-crawled documents lands against an existing corpus,
  * and the job must decide, per arrival, whether it is junk, already
  * held, a near-duplicate of something held, or genuinely new — then
  * account for every arrival in a per-source audit funnel (the report a
  * crawl operator actually reads: which sources are sending us
  * duplicates vs. fresh content).
  *
  * Stages, each the established portable fragment of its standalone
  * operator so the WHOLE composition hash-gates end to end:
  *
  *   1. quality gate     — token count + avg-token-length bounds
  *                         (e01 stage-1 contract)
  *   2. exact cross-dedup — canonicalized sha256 present in the
  *                         reference, plus first-wins within the batch
  *                         (A15 insert-if-absent applied cross-corpus +
  *                         b11 canonical dedup)
  *   3. near-dedup       — portable MinHash-LSH of survivors against
  *                         the REFERENCE ONLY (b12_cross_portable: the
  *                         incoming batch probes reference buckets,
  *                         never ref×ref; hot buckets answer one
  *                         bucket-min witness per arrival)
  *   4. audit funnel     — per-source conditional counts; every arrival
  *                         lands in exactly one bucket, so
  *                         n_arrived = quality_fail + exact_dup +
  *                         near_dup + inserted row-conservation holds
  *                         by construction (spec-pinned)
  *
  * 100 TB shape: stage 1 is a scan-side predicate on the (small)
  * arrival batch; stage 2's reference sha set is one combinable
  * distinct (bucketed/materialized in production, probed via semi-join);
  * stage 3 is batch-sized band probes against the reference bucket
  * table (the [[graft.streaming.Streaming.CrossNearDupSink]] cost
  * argument — per-ingest work scales with the batch, not the corpus);
  * stage 4 is one combinable aggregate over the batch. Nothing iterates,
  * nothing is all-pairs, nothing collects to the driver.
  */
object IngestPipeline {

  /** Arrival slice: doc_id ≡ 3 (mod 7) — "today's crawl" (~14% of the
    * corpus); the rest is the standing reference. Both derived from one
    * table so the oracle replays the split exactly. */
  private val ArrivalMod = 7L
  private val ArrivalRem = 3L

  /** The pipeline over any `(doc_id, text, source)` + reference frame.
    * `refTables` optionally injects PREBUILT reference shingle/band
    * tables (the materialize-once [[graft.SnapshotStore]] seam the
    * gated query uses — at 100 TB the standing corpus' near-dedup index
    * is a bucketed table written once, not re-derived per ingest); when
    * absent (the stress probe's replicated corpora) they derive inline.
    * Content is identical either way. */
  def ingestReport(arrivalsIn: DataFrame, referenceIn: DataFrame,
      refTables: Option[(DataFrame, DataFrame, DataFrame)] = None): DataFrame = {
    val spark = arrivalsIn.sparkSession
    import spark.implicits._
    val arrivals = arrivalsIn.select($"doc_id", $"text", $"source").cache()
    val reference = referenceIn.select($"doc_id", $"text").cache()
    // 1. quality gate — e01 stage-1 arithmetic (cross-engine-proven
    // double compare)
    val nTok = size(split($"text", " "))
    val avgLen = length($"text").cast("double") / nTok.cast("double")
    val qual = arrivals
      .filter(nTok >= 5 && avgLen >= 3.0 && avgLen <= 12.0)
      .select($"doc_id", $"text", sha2(Dedup.canonicalText($"text"), 256).as("sha"))
      .cache()
    // 2. exact cross-dedup: drop arrivals whose canonical sha the
    // reference already holds, and batch-internal copies after the
    // first (min doc_id per sha) — insert-if-absent semantics
    val refSha = reference
      .select(sha2(Dedup.canonicalText($"text"), 256).as("sha")).distinct()
    val batchFirst = qual.groupBy($"sha").agg(min($"doc_id").as("first_id"))
    val exactNew = qual
      .join(batchFirst, Seq("sha"))
      .filter($"doc_id" === $"first_id")
      .join(refSha, Seq("sha"), "left_anti")
      .select($"doc_id", $"text")
      .localCheckpoint(true) // lineage cut before the LSH stage
    // 3. near-dedup vs the reference only
    val hits = (refTables match {
      case Some((shRef, bRef, statsRef)) =>
        Dedup.minHashPortableAcrossWith(exactNew, shRef, bRef,
          statsRef = Some(statsRef))
      case None => Dedup.minHashPortableAcross(exactNew, reference)
    }).select($"new_id".as("doc_id")).distinct()
    // 4. per-source audit funnel — each arrival in exactly one bucket
    val flags = arrivals.select($"doc_id", $"source")
      .join(qual.select($"doc_id", lit(1L).as("q")), Seq("doc_id"), "left_outer")
      .join(exactNew.select($"doc_id", lit(1L).as("e")), Seq("doc_id"), "left_outer")
      .join(hits.select($"doc_id", lit(1L).as("h")), Seq("doc_id"), "left_outer")
    val report = flags.groupBy($"source").agg(
        count(lit(1)).as("n_arrived"),
        sum(when($"q".isNull, 1L).otherwise(0L)).as("n_quality_fail"),
        sum(when($"q".isNotNull && $"e".isNull, 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when($"e".isNotNull && $"h".isNotNull, 1L).otherwise(0L)).as("n_near_dup"),
        sum(when($"e".isNotNull && $"h".isNull, 1L).otherwise(0L)).as("n_inserted"))
      .orderBy($"source")
      .localCheckpoint(true)
    arrivals.unpersist(); reference.unpersist(); qual.unpersist()
    report
  }

  def ingestQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    ingestReport(
      docs.filter(col("doc_id") % ArrivalMod === ArrivalRem),
      docs.filter(col("doc_id") % ArrivalMod =!= ArrivalRem),
      refTables = Some(Dedup.refPortableTables3(s, dir, "ingest_ref",
        col("doc_id") % ArrivalMod =!= ArrivalRem)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e03_incremental_ingest" -> (ingestQuery _),
  )

  /** Composes the canonical-sha fragment (e01's oracle text) with the
    * shared [[Dedup.portableCrossCtes]] LSH chain — every stage one
    * definition with its standalone oracle. */
  private def oracle: String = {
    val canonSha = """sha256(trim(regexp_replace(regexp_replace(lower(text),
                    '[^\w\s]', '', 'g'), '\s+', ' ', 'g')))"""
    val cross = Dedup.portableCrossCtes(
      "doc_id IN (SELECT doc_id FROM ex)", s"doc_id % $ArrivalMod <> $ArrivalRem")
    s"""
      WITH arr AS (SELECT doc_id, text, source FROM documents
                   WHERE doc_id % $ArrivalMod = $ArrivalRem),
      q AS (SELECT doc_id, source, $canonSha AS sha
            FROM arr
            WHERE len(string_split(text, ' ')) >= 5
              AND CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) >= 3.0
              AND CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) <= 12.0),
      refsha AS (SELECT DISTINCT $canonSha AS sha FROM documents
                 WHERE doc_id % $ArrivalMod <> $ArrivalRem),
      bf AS (SELECT sha, MIN(doc_id) AS first_id FROM q GROUP BY sha),
      ex AS (SELECT q.doc_id FROM q JOIN bf USING (sha)
             WHERE q.doc_id = bf.first_id
               AND sha NOT IN (SELECT sha FROM refsha)),
      $cross,
      hits AS (SELECT DISTINCT i.a AS doc_id
               FROM ins i
               JOIN szs na ON na.doc_id = i.a
               JOIN szs nb ON nb.doc_id = i.b
               WHERE i.inter * 2 >= na.n + nb.n - i.inter)
      SELECT a.source,
             CAST(COUNT(*) AS BIGINT) AS n_arrived,
             CAST(SUM(CASE WHEN q.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quality_fail,
             CAST(SUM(CASE WHEN q.doc_id IS NOT NULL AND ex.doc_id IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
             CAST(SUM(CASE WHEN ex.doc_id IS NOT NULL AND h.doc_id IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
             CAST(SUM(CASE WHEN ex.doc_id IS NOT NULL AND h.doc_id IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
      FROM arr a
      LEFT JOIN q ON q.doc_id = a.doc_id
      LEFT JOIN ex ON ex.doc_id = a.doc_id
      LEFT JOIN hits h ON h.doc_id = a.doc_id
      GROUP BY a.source ORDER BY a.source"""
  }

  val oracles: Map[String, String] = Map(
    "e03_incremental_ingest" -> oracle,
  )
}
