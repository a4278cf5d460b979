package graft.harvest

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession

/** A25 — CLI entry point with the reference's error taxonomy
  * (/root/reference/harvest.py:383-394,474-485), refined into distinct
  * exit codes per failure class:
  *   2 = invalid input (ValueError analogue)
  *   3 = store/IO failure (sqlite3.Error analogue)
  *   1 = unexpected failure
  *
  * Usage: graft.harvest.Main <collection-uri> <bindings-path> <store-dir> [asOf]
  */
object Main {

  /** A24: run the optional post-write hook (the reference's git-commit
    * step, harvest.py:424-472, generalized to any command). Returns the
    * exit code when a hook ran; a failing hook is reported but does NOT
    * fail the harvest — the store write already committed, matching the
    * reference where a commit failure leaves the database file intact. */
  def runPostWriteHook(cmd: Option[String]): Option[Int] =
    cmd.map { c =>
      val code = new ProcessBuilder("sh", "-c", c).inheritIO().start().waitFor()
      if (code != 0) System.err.println(s"post-write hook exited $code")
      code
    }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.harvest.Main <collection-uri> <bindings-path> <store-dir> [asOf ISO timestamp]")
      sys.exit(2)
    }
    val asOf =
      try {
        if (args.length >= 4) Timestamp.valueOf(args(3).replace('T', ' '))
        else new Timestamp(System.currentTimeMillis())
      } catch {
        case e: IllegalArgumentException =>
          System.err.println(s"input error: bad asOf timestamp '${args(3)}': ${e.getMessage}")
          sys.exit(2)
      }
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try {
      val result = HarvestJob.run(spark,
        HarvestJob.Config(args(0), args(1), args(2), asOf,
          sqliteArtifact = sys.env.get("GRAFT_SQLITE_ARTIFACT")))
      result.warnings.foreach(System.err.println)
      println(result.summary)
      // A24 analogue (harvest.py:424-472): the reference git-commits the
      // store when run inside its CI. That side effect stays OUT of the
      // data plane — an optional post-write hook command, driver-side only.
      Main.runPostWriteHook(sys.env.get("GRAFT_POST_WRITE_CMD"))
    } catch {
      case e: IllegalArgumentException =>
        System.err.println(s"input error: ${e.getMessage}"); sys.exit(2)
      case e: java.io.IOException =>
        System.err.println(s"store error: ${e.getMessage}"); sys.exit(3)
      case e: Throwable =>
        System.err.println(s"error: ${e.getMessage}"); sys.exit(1)
    } finally spark.stop()
  }
}
