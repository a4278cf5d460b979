package graft.harvest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** The durable store (A21/A22/A23): one Parquet directory per table under
  * a root dir, with staging-then-rename atomicity per write batch — the
  * engine's analogue of the reference's per-page SQLite transaction
  * (harvest.py:374) and `CREATE TABLE IF NOT EXISTS` bootstrap
  * (harvest.py:161-289).
  */
object Store {

  def tablePath(storeDir: String, name: String): String = s"$storeDir/$name"

  /** A23: open-or-create. Missing table → empty DataFrame with the declared
    * schema (no inference anywhere — determinism requirement). If a crash
    * interrupted a previous swap between the two renames, the retired copy
    * at `_old_<name>` is restored first — the table is never silently
    * treated as empty while data exists on disk.
    */
  def readTableOr(spark: SparkSession, storeDir: String, name: String, schema: StructType): DataFrame = {
    val path = new Path(tablePath(storeDir, name))
    val old = new Path(s"$storeDir/_old_$name")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path) && fs.exists(old)) fs.rename(old, path) // crash recovery
    if (fs.exists(path))
      spark.read.schema(schema).parquet(path.toString)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** A21/A22 + SURVEY §7 H2: write-to-staging then swap. The staging write
    * materializes the new contents while the old files are still readable
    * (read-merge-overwrite on the same path would otherwise tear); the swap
    * is rename-out then rename-in, so a crash at any point leaves either
    * the old table in place or recoverable at `_old_<name>` (see
    * [[readTableOr]]) — never a window where the table is simply gone.
    */
  def writeTable(df: DataFrame, storeDir: String, name: String): Unit = {
    val spark = df.sparkSession
    val target = new Path(tablePath(storeDir, name))
    val staging = new Path(s"$storeDir/_staging_$name")
    val old = new Path(s"$storeDir/_old_$name")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"retiring old $name failed")
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"atomic swap failed for $name")
    fs.delete(old, true)
  }

  /** Bootstrap any missing tables as empty Parquet with the fixed schema —
    * the reference creates all six tables even though the harvest only
    * writes two (harvest.py:215-274 have no INSERTs). */
  def bootstrap(spark: SparkSession, storeDir: String): Unit =
    Schemas.allTables.foreach { case (name, schema) =>
      val path = new Path(tablePath(storeDir, name))
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path))
        writeTable(readTableOr(spark, storeDir, name, schema), storeDir, name)
    }

  // ------------------------------------------------- SQLite artifact (H4)

  /** Reference DDL (harvest.py:188-274) minus index-backed constructs —
    * see the fidelity note on [[Sqlite]]. */
  private val sqliteDdl: Map[String, String] = Map(
    "terms" ->
      """CREATE TABLE terms (
        |    id          INTEGER PRIMARY KEY,
        |    uri         TEXT    NOT NULL,
        |    created_at  DATETIME DEFAULT CURRENT_TIMESTAMP,
        |    updated_at  DATETIME DEFAULT CURRENT_TIMESTAMP
        |)""".stripMargin,
    "term_fields" ->
      """CREATE TABLE term_fields (
        |    id            INTEGER PRIMARY KEY,
        |    term_id       INTEGER NOT NULL REFERENCES terms(id) ON DELETE CASCADE,
        |    field_uri     TEXT    NOT NULL,
        |    field_term    TEXT    NOT NULL,
        |    original_value TEXT   NOT NULL,
        |    created_at    DATETIME DEFAULT CURRENT_TIMESTAMP,
        |    updated_at    DATETIME DEFAULT CURRENT_TIMESTAMP
        |)""".stripMargin,
    "translations" ->
      """CREATE TABLE translations (
        |    id             INTEGER PRIMARY KEY,
        |    term_field_id  INTEGER NOT NULL REFERENCES term_fields(id) ON DELETE CASCADE,
        |    language       TEXT    NOT NULL CHECK(language IN ('nl','fr','de','es','it','pt')),
        |    value          TEXT    NOT NULL,
        |    status         TEXT    NOT NULL DEFAULT 'draft' CHECK(status IN ('draft', 'review', 'approved', 'rejected', 'merged')),
        |    created_at     DATETIME DEFAULT CURRENT_TIMESTAMP,
        |    updated_at     DATETIME DEFAULT CURRENT_TIMESTAMP,
        |    created_by     TEXT    NOT NULL,
        |    modified_at    DATETIME,
        |    modified_by    TEXT,
        |    reviewed_by    TEXT
        |)""".stripMargin,
    "appeals" ->
      """CREATE TABLE appeals (
        |    id              INTEGER PRIMARY KEY,
        |    translation_id  INTEGER NOT NULL REFERENCES translations(id) ON DELETE CASCADE,
        |    opened_by       TEXT    NOT NULL,
        |    opened_at       DATETIME DEFAULT CURRENT_TIMESTAMP,
        |    closed_at       DATETIME,
        |    status          TEXT    NOT NULL DEFAULT 'open' CHECK(status IN ('open', 'closed', 'resolved')),
        |    resolution      TEXT
        |)""".stripMargin,
    "appeal_messages" ->
      """CREATE TABLE appeal_messages (
        |    id          INTEGER PRIMARY KEY,
        |    appeal_id   INTEGER NOT NULL REFERENCES appeals(id) ON DELETE CASCADE,
        |    author      TEXT    NOT NULL,
        |    message     TEXT    NOT NULL,
        |    created_at  DATETIME DEFAULT CURRENT_TIMESTAMP
        |)""".stripMargin,
    "users" ->
      """CREATE TABLE users (
        |    username    TEXT NOT NULL,
        |    reputation  INTEGER DEFAULT 0,
        |    joined_at   DATETIME DEFAULT CURRENT_TIMESTAMP,
        |    extra       TEXT
        |)""".stripMargin)

  /** Ceiling on rows collected to the driver per table for the artifact
    * export. The reference's deliverable is a repo-committed file of a few
    * MB; 10M rows is far beyond any plausible artifact and well within
    * driver memory. Beyond it, the artifact concept itself is wrong — the
    * parquet store is the scale path. */
  val MaxSqliteRowsPerTable = 10000000L

  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** A22/H4: export the store as ONE SQLite database file — the drop-in
    * equivalent of the reference's committed `translations.db`. Driver-side
    * and sequential by design (a single file has no parallel write path);
    * rows stream through `toLocalIterator` so only the encoded pages are
    * held in memory. */
  def writeSqliteArtifact(spark: SparkSession, storeDir: String, dbPath: String): Unit = {
    import org.apache.spark.sql.Row

    def sqlValue(v: Any): Sqlite.V = v match {
      case null => Sqlite.VNull
      case l: Long => Sqlite.VInt(l)
      case i: Int => Sqlite.VInt(i.toLong)
      case s: String => Sqlite.VText(s)
      case t: java.sql.Timestamp => Sqlite.VText(t.toLocalDateTime.format(tsFmt))
      case t: java.time.LocalDateTime => Sqlite.VText(t.format(tsFmt))
      case t: java.time.Instant =>
        Sqlite.VText(java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC).format(tsFmt))
      case d: Double => Sqlite.VReal(d)
      case f: Float => Sqlite.VReal(f.toDouble)
      case b: Array[Byte] => Sqlite.VBlob(b)
      case other => Sqlite.VText(other.toString)
    }

    val tables = Schemas.allTables.map { case (name, schema) =>
      val df = readTableOr(spark, storeDir, name, schema)
      val n = df.count()
      require(n <= MaxSqliteRowsPerTable,
        s"SQLite artifact export: table $name has $n rows (> $MaxSqliteRowsPerTable); " +
          "the single-file artifact is for reference-compatible deliverables — " +
          "use the parquet store at scale")
      val hasId = schema.fieldNames.contains("id")
      // total order: by id where present (id becomes the rowid, preserving
      // the reference's AUTOINCREMENT numbering), else by first column
      val sortCol = if (hasId) "id" else schema.fieldNames.head
      val sorted = df.orderBy(col(sortCol))
      val it = sorted.toLocalIterator()
      var rowSeq = 0L
      val rows = new Iterator[(Long, Seq[Sqlite.V])] {
        override def hasNext: Boolean = it.hasNext
        override def next(): (Long, Seq[Sqlite.V]) = {
          val r: Row = it.next()
          rowSeq += 1
          val rowid = if (hasId) r.getLong(schema.fieldIndex("id")) else rowSeq
          (rowid, schema.fieldNames.toSeq.map(f => sqlValue(r.get(r.fieldIndex(f)))))
        }
      }
      Sqlite.TableData(name, sqliteDdl(name), rows)
    }
    Sqlite.writeFile(new java.io.File(dbPath), tables)
  }
}
