package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md §2). One parquet file per table under the sf dir.
  *
  * All loads are plain `spark.read.parquet` so Catalyst gets native
  * column pruning + predicate pushdown into the scan; no schema
  * inference happens (parquet footers carry the schema).
  */
object Tables {
  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  def region(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "region"))
  def nation(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "nation"))
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "part"))
  def orders(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "orders"))
  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "lineitem"))
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(path(dir, "embeddings"))

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader only
    * accepts as raw int64 (`spark.sql.legacy.parquet.nanosAsLong`, see
    * [[GraftSession]]), truncated here to micros exactly like DuckDB's
    * ns→us read — and plain TIMESTAMP(MICROS), read natively. Both paths
    * land on TIMESTAMP_NTZ like every other testdata timestamp, so the
    * oracle sees identical values either way.
    *
    * Two hardening guarantees (both session-TZ-independent):
    *  - The int64 branch fires only when the parquet footer's logical
    *    type annotation says TIMESTAMP(NANOS) — a genuine BIGINT column
    *    that merely maps to LongType fails fast instead of being
    *    silently divided by 1000.
    *  - Conversion to TIMESTAMP_NTZ goes through `timestampadd` of epoch
    *    micros onto an NTZ literal — pure integer arithmetic, no
    *    instant→local cast — so a session NOT built via
    *    [[GraftSession.configure]] (i.e. not pinned to UTC) still reads
    *    identical values. (`unix_micros` reads the stored instant
    *    directly and is TZ-free.)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val p = path(dir, "events")
    val df = spark.read.parquet(p)
    val microsSql = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        if (!tsAnnotatedNanos(spark, p)) sys.error(
          s"Tables.events: $p column `ts` is INT64 but its parquet logical type " +
          "annotation is not TIMESTAMP(NANOS) — refusing to guess a time unit " +
          "for a raw BIGINT. Convert the column or load it explicitly.")
        "ts div 1000" // ns → us, exactly DuckDB's narrowing read
      case org.apache.spark.sql.types.TimestampType    => "unix_micros(ts)"
      case org.apache.spark.sql.types.TimestampNTZType => null // already NTZ wall-clock
      case other => sys.error(s"Tables.events: unsupported physical type for ts: $other")
    }
    if (microsSql == null) df
    else df.withColumn("ts",
      expr(s"timestampadd(MICROSECOND, $microsSql, TIMESTAMP_NTZ'1970-01-01 00:00:00')"))
  }

  /** Reads EVERY parquet footer under `p` (or the single file) and
    * returns true iff column `ts` is annotated TIMESTAMP(unit=NANOS) in
    * all of them. A directory whose files disagree on the annotation
    * fails fast — otherwise a mixed directory whose first file is NANOS
    * would silently divide the raw-INT64 files by 1000 (the exact
    * rescale bug this gate exists to prevent). Footer reads are
    * driver-side metadata only; no data pass. */
  private def tsAnnotatedNanos(spark: SparkSession, p: String): Boolean = {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val hp = new HPath(p)
    val fs = hp.getFileSystem(conf)
    val files: Seq[HPath] =
      if (fs.getFileStatus(hp).isDirectory) {
        val fp = fs.listStatus(hp).map(_.getPath)
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .sortBy(_.getName).toSeq
        if (fp.isEmpty) sys.error(s"Tables.events: no parquet files under $p")
        fp
      } else Seq(hp)
    def footerNanos(file: HPath): Boolean = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") && (schema.getType(Seq("ts"): _*).getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
      } finally reader.close()
    }
    val verdicts = files.map(f => f -> footerNanos(f))
    val (nanos, notNanos) = verdicts.partition(_._2)
    if (nanos.nonEmpty && notNanos.nonEmpty) sys.error(
      s"Tables.events: parquet files under $p disagree on the `ts` logical type " +
      s"annotation — TIMESTAMP(NANOS): ${nanos.map(_._1.getName).mkString(",")}; " +
      s"not: ${notNanos.map(_._1.getName).mkString(",")}. Refusing a mixed read " +
      "(the ns→us rescale would silently corrupt the non-NANOS files).")
    notNanos.isEmpty
  }
}
