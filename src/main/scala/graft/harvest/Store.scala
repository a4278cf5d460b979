package graft.harvest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
