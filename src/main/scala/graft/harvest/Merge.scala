package graft.harvest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Merge operators: surrogate-key generation (A12), terms upsert (A11),
  * FK resolution (A13), insert-if-absent append (A15).
  *
  * Replaces the reference's per-row SQLite probes (the N+1 pattern at
  * /root/reference/harvest.py:327,352) with set-based joins — one shuffle
  * instead of 2-3 store round-trips per row.
  */
object Merge {

  /** A12 / SURVEY §7 H1: deterministic, dense, stable surrogate ids.
    *
    * Semantics: `startId + rank(row ordered by keys)` — identical to
    * `ROW_NUMBER() OVER (ORDER BY keys)` but WITHOUT a single-partition
    * window: range-repartition by the keys, sort within partitions, then
    * `zipWithIndex` (partition sizes are counted once; indexes are global
    * ranks because range partitions are ordered). Scales to any row count.
    * NOT `monotonically_increasing_id` — that is partition-layout-dependent
    * and unstable across runs.
    */
  def assignIds(df: DataFrame, keys: Seq[String], startId: Long, idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val kcols = keys.map(col)
    val sorted = df.repartitionByRange(kcols: _*).sortWithinPartitions(kcols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val withIds = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (startId + idx))
    }
    val out = spark.createDataFrame(withIds, schema)
    out.select(col(idCol) +: df.columns.map(col): _*)
  }

  private def maxId(df: DataFrame, idCol: String = "id"): Long = {
    val r = df.agg(max(col(idCol))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** A11: upsert of incoming URIs into `terms` (harvest.py:325-349).
    *
    * - matched rows keep (id, created_at), get `updated_at = asOf`;
    * - existing-but-absent rows pass through untouched;
    * - new rows get dense ids continuing after max(existing.id), with
    *   created_at = updated_at = asOf.
    *
    * One full-outer shuffle join on `uri`; id assignment via [[assignIds]].
    * `startId`: first id for new rows — pass it when the caller already
    * aggregated max(existing.id) (saves the extra scan); defaults to
    * computing it here.
    */
  def upsertTerms(existing: DataFrame, incomingUris: DataFrame, asOf: Column,
                  startId: Option[Long] = None): DataFrame = {
    val inc = incomingUris.select(col("uri")).distinct()
      .withColumn("__incoming", lit(1))
    val joined = existing.join(inc, Seq("uri"), "full_outer")
    val kept = joined.filter(col("id").isNotNull).select(
      col("id"), col("uri"), col("created_at"),
      when(col("__incoming").isNotNull, asOf).otherwise(col("updated_at")).as("updated_at"))
    val newUris = joined.filter(col("id").isNull).select(col("uri"))
    val fresh = assignIds(newUris, Seq("uri"), startId.getOrElse(maxId(existing) + 1))
      .select(col("id"), col("uri"), asOf.as("created_at"), asOf.as("updated_at"))
    kept.unionByName(fresh)
  }

  /** A13: resolve `term_id` by joining melted EAV rows to `terms` on the
    * URI — the set-based replacement for the reference's per-row
    * `SELECT id FROM terms WHERE uri = ?` (harvest.py:352-356).
    *
    * No broadcast hint: `terms` is one row per unique concept, which is
    * small for one collection but unbounded across a federated harvest —
    * a forced broadcast would OOM the driver once terms outgrows executor
    * memory. AQE sizes the join at runtime (broadcast-hash while terms is
    * below the threshold, shuffle-hash beyond it).
    */
  def resolveFk(melted: DataFrame, terms: DataFrame): DataFrame =
    melted.join(terms.select(col("id").as("term_id"), col("uri")),
        melted("concept") === col("uri"))
      .select(col("term_id"), col("field_uri"), col("field_term"), col("original_value"))

  /** SCD2 (type-2 slowly-changing-dimension) merge — the history-keeping
    * big sibling of [[upsertTerms]] (which is type-1: updates overwrite in
    * place, like the reference's `updated_at` bump, harvest.py:340-344).
    * A warehouse tracking how a vocabulary evolves across harvests needs
    * the prior values, not just the latest — this operator keeps every
    * version with its validity interval.
    *
    * `history` carries `keys ++ tracked ++ (valid_from, valid_to,
    * is_current)`; `incoming` carries `keys ++ tracked` (one row per key —
    * duplicate keys in a batch are rejected, there is no deterministic
    * "latest" among them). Per key:
    *  - closed rows (`is_current = false`) pass through untouched;
    *  - current row, key absent from the batch → unchanged;
    *  - current row, batch row with identical tracked values (null-safe)
    *    → unchanged (no spurious versions);
    *  - current row, batch row with any tracked value changed → the old
    *    row closes (`valid_to = asOf`, `is_current = false`) and a new
    *    current row opens at `asOf`;
    *  - new key → a current row opens at `asOf`.
    *
    * One full-outer shuffle join on the keys; everything else is
    * projection plus two key-partitioned window guards (in-plan
    * uniqueness enforcement for the batch AND the history's current
    * rows — corrupt history must fail loudly, not fan out) that ride the
    * join's own key distribution. Same single-key-shuffle scale story as
    * [[upsertTerms]].
    */
  def scd2Merge(history: DataFrame, incoming: DataFrame, keys: Seq[String],
                tracked: Seq[String], asOf: Column): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    val outCols = (keys ++ tracked ++ meta).map(col)
    val closed = history.filter(!col("is_current")).select(outCols: _*)
    val current = history.filter(col("is_current"))
    // IN-PLAN uniqueness guards, folded into the join-presence markers so
    // column pruning can't drop them: a per-key window count raise_errors
    // at execution when (a) the batch carries a duplicate key, or (b) the
    // history carries two CURRENT rows for one key (corrupt history would
    // otherwise fan out through the join and DOUBLE on every merge). No
    // separate validation job scans the inputs, and the window's
    // hash-partitioning on the keys is the distribution the full-outer
    // join needs anyway.
    val wk = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    def guard(side: String) =
      when(count(lit(1)).over(wk) > 1,
        raise_error(concat(
          lit(s"constraint violation (scd2 $side unique on (${keys.mkString(", ")})): key="),
          concat_ws("|", keys.map(c => col(c).cast("string")): _*))).cast("int"))
        .otherwise(lit(1))
    val cur = current.select((keys ++ tracked ++ meta.init).map(col): _*)
      .withColumn("__cur", guard("history current rows"))
    val inc = incoming.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"__i_$c")): _*)
      .withColumn("__inc", guard("incoming batch"))
    val j = cur.join(inc, keys, "full_outer")
    val vtType = history.schema("valid_to").dataType.sql
    val changed = tracked.map(c => !(col(c) <=> col(s"__i_$c"))).reduce(_ || _)
    // current rows that survive as-is: key not in batch, or values identical
    val kept = j.filter(col("__cur").isNotNull && (col("__inc").isNull || !changed))
      .select((keys ++ tracked).map(col) ++
        Seq(col("valid_from"), lit(null).cast(vtType).as("valid_to"),
          lit(true).as("is_current")): _*)
    // current rows superseded by a changed batch row: close the interval
    val retired = j.filter(col("__cur").isNotNull && col("__inc").isNotNull && changed)
      .select((keys ++ tracked).map(col) ++
        Seq(col("valid_from"), asOf.as("valid_to"), lit(false).as("is_current")): _*)
    // opened versions: changed keys and brand-new keys
    val opened = j.filter(col("__inc").isNotNull && (col("__cur").isNull || changed))
      .select(keys.map(col) ++ tracked.map(c => col(s"__i_$c").as(c)) ++
        Seq(asOf.as("valid_from"), lit(null).cast(vtType).as("valid_to"),
          lit(true).as("is_current")): _*)
    closed.unionByName(kept).unionByName(retired).unionByName(opened)
  }

  /** A11+: snapshot diff (CDC) — classify every key across two snapshots
    * of a table as insert / delete / update / unchanged, with old and new
    * tracked values side by side. The audit/change-feed primitive the
    * incremental store implies (the reference detects "no changes" only
    * by git-diffing the whole .db, action.yml:41-44; this is that check
    * as a first-class relational operator, and the input to incremental
    * downstream processing — only `insert`/`update` keys need rework).
    *
    * ONE null-safe full-outer shuffle on the keys, presence markers
    * instead of a second scan, `<=>` per tracked column for null-safe
    * change detection — the same single-key-shuffle scale shape as
    * [[upsertTerms]]/[[scd2Merge]]. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
                   tracked: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("__in_old", lit(1))
    val n = newSnap.select(
      keys.map(col) ++ tracked.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("__in_new", lit(1))
    val changed = tracked.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged").as("change_type")) ++
        tracked.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** A15: `INSERT OR IGNORE` keyed by UNIQUE(term_id, field_uri,
    * original_value) (harvest.py:210,363-372): dedup the batch, anti-join
    * against existing rows, assign ids, append. Existing rows (and their
    * timestamps) are untouched.
    */
  def insertIfAbsent(existingFields: DataFrame, incoming: DataFrame, asOf: Column,
                     startId: Option[Long] = None): DataFrame = {
    val key = Seq("term_id", "field_uri", "original_value")
    val novel = incoming
      .dropDuplicates(key)
      .join(existingFields, key, "left_anti")
    val fresh = assignIds(novel, key, startId.getOrElse(maxId(existingFields) + 1))
      .select(col("id"), col("term_id"), col("field_uri"), col("field_term"),
        col("original_value"), asOf.as("created_at"), asOf.as("updated_at"))
    existingFields.unionByName(fresh)
  }
}
