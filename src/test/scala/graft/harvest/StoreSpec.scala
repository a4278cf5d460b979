package graft.harvest

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path

class StoreSpec extends SparkSpec {
  import spark.implicits._

  test("writeTable swap preserves readability; rewrite replaces contents (A21/A22/H2)") {
    val dir = Files.createTempDirectory("graft_store_spec").toString
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "uri")
    Store.writeTable(v1, dir, "t")
    assert(spark.read.parquet(s"$dir/t").count() === 2)
    // rewrite derived from the current table (read-merge-overwrite path)
    val v2 = spark.read.parquet(s"$dir/t").union(Seq((3L, "c")).toDF("id", "uri"))
    Store.writeTable(v2, dir, "t")
    assert(spark.read.parquet(s"$dir/t").count() === 3)
    // no staging/old leftovers after a clean swap
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dir/_staging_t")))
    assert(!fs.exists(new Path(s"$dir/_old_t")))
  }

  test("writeTable fence rollback (r12): a writer superseded after retiring " +
    "the current table puts it BACK instead of committing stale data; " +
    "superseded after the swap restores the retired copy") {
    val dir = Files.createTempDirectory("graft_store_fence").toString
    val current = Seq((1L, "current"), (2L, "current")).toDF("id", "uri")
    val stale = Seq((9L, "stale")).toDF("id", "uri")
    Store.writeTable(current, dir, "t")
    def uris() = spark.read.parquet(s"$dir/t").collect().map(_.getString(1)).distinct.toSeq
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fence trips on its 2nd check: AFTER the current table was retired
    // to _old_t, BEFORE the stale staging swapped in — the table must
    // come back and the staging must be cleaned
    var calls = 0
    intercept[IllegalStateException] {
      Store.writeTable(stale, dir, "t", ".e2",
        () => { calls += 1; if (calls == 2) throw new IllegalStateException("fenced") })
    }
    assert(uris() === Seq("current"), "retired table was not rolled back")
    assert(!fs.exists(new Path(s"$dir/_staging_t.e2")) && !fs.exists(new Path(s"$dir/_old_t")))
    // fence trips on its 3rd check: AFTER the stale swap landed — the
    // writer deletes its own superseded copy and restores the retired one
    calls = 0
    intercept[IllegalStateException] {
      Store.writeTable(stale, dir, "t", ".e3",
        () => { calls += 1; if (calls == 3) throw new IllegalStateException("fenced") })
    }
    assert(uris() === Seq("current"), "post-swap supersession did not restore the table")
    assert(!fs.exists(new Path(s"$dir/_old_t")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("writeTable post-swap retraction is ownership-checked (r12 review 2): " +
    "a stale writer stalled between its swap and the fence while a successor " +
    "completed a FULL write must leave the successor's table intact") {
    val dir = Files.createTempDirectory("graft_store_stall").toString
    val base = Seq((1L, "base")).toDF("id", "uri")
    val staleDf = Seq((9L, "stale")).toDF("id", "uri")
    val successor = Seq((5L, "successor"), (6L, "successor")).toDF("id", "uri")
    Store.writeTable(base, dir, "t")
    def uris() = spark.read.parquet(s"$dir/t").collect().map(_.getString(1)).distinct.toSeq
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the stale writer's fence passes its first two checks; on the 3rd
    // (post-swap) the successor has ALREADY claimed and completed a whole
    // write — retiring the stale copy, swapping in its own, and dropping
    // _old_. The old unconditional rollback deleted the successor's table
    // here and found nothing at _old_ to restore: total loss of the live
    // table. The writer-marker check makes the stale writer leave it.
    var calls = 0
    intercept[IllegalStateException] {
      Store.writeTable(staleDf, dir, "t", ".e2",
        () => {
          calls += 1
          if (calls == 3) {
            Store.writeTable(successor, dir, "t", ".e3")
            throw new IllegalStateException("fenced")
          }
        })
    }
    assert(uris() === Seq("successor"),
      "stale writer's post-swap retraction destroyed the successor's table")
    assert(spark.read.parquet(s"$dir/t").count() === 2)
    assert(!fs.exists(new Path(s"$dir/_old_t")))
    // no writer markers leak into the committed table
    assert(fs.listStatus(new Path(s"$dir/t"))
      .forall(!_.getPath.getName.startsWith("_writer_")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("writeTable retraction requires a restorable copy (r13 ADVICE): a " +
    "stale writer whose _old_ was consumed by a fenced successor's rollback " +
    "keeps its own complete table instead of leaving the store with none") {
    val dir = Files.createTempDirectory("graft_store_threew").toString
    Store.writeTable(Seq((1L, "base")).toDF("id", "uri"), dir, "t")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def uris() = spark.read.parquet(s"$dir/t").collect().map(_.getString(1)).distinct.toSeq
    // Z1 swaps its table in (marker inside, _old_t holds the base), then
    // stalls at fence(3). While stalled: successor Z2 deletes _old_t,
    // retires Z1's table, is fenced by Z3 and ROLLS Z1's table back —
    // net disk state at Z1's wake-up: t = Z1's copy (marker and all),
    // _old_t GONE. The pre-r13 retraction deleted t and found nothing to
    // restore: no table at all, and readTableOr bootstraps empty —
    // silent data loss. Now Z1 keeps its own complete copy.
    var calls = 0
    intercept[IllegalStateException] {
      Store.writeTable(Seq((9L, "z1")).toDF("id", "uri"), dir, "t", ".e2",
        () => {
          calls += 1
          if (calls == 3) {
            fs.delete(new Path(s"$dir/_old_t"), true) // Z2's net effect
            throw new IllegalStateException("fenced")
          }
        })
    }
    assert(fs.exists(new Path(s"$dir/t")), "store left with NO table")
    // stale-but-complete beats empty: content-idempotent, the live
    // successor's next write supersedes it
    assert(uris() === Seq("z1"))
    // the writer died before clearing its marker; underscore-prefixed
    // files are invisible to readers — the table must read normally
    assert(spark.read.parquet(s"$dir/t").count() === 1)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("writeTable FIRST-ever write fenced post-swap retracts to 'no table' " +
    "(r13 review: the restorable-copy guard must not keep an uncommitted " +
    "first table)") {
    val dir = Files.createTempDirectory("graft_store_first").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var calls = 0
    intercept[IllegalStateException] {
      Store.writeTable(Seq((1L, "z")).toDF("id", "uri"), dir, "t", ".e2",
        () => { calls += 1; if (calls == 3) throw new IllegalStateException("fenced") })
    }
    // pre-state was "no table"; the fenced first write must restore it
    assert(!fs.exists(new Path(s"$dir/t")),
      "fenced first write left an uncommitted table published")
    assert(!fs.exists(new Path(s"$dir/_old_t")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("readTableOr recovers a table stranded mid-swap at _old_<name>") {
    val dir = Files.createTempDirectory("graft_store_crash").toString
    Store.writeTable(Seq((1L, "a")).toDF("id", "uri"), dir, "t")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between rename-out and rename-in
    assert(fs.rename(new Path(s"$dir/t"), new Path(s"$dir/_old_t")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("uri", org.apache.spark.sql.types.StringType)))
    val recovered = Store.readTableOr(spark, dir, "t", schema)
    assert(recovered.count() === 1) // not silently empty
    assert(fs.exists(new Path(s"$dir/t")) && !fs.exists(new Path(s"$dir/_old_t")))
  }

  test("readTableOr returns typed empty frame for a genuinely missing table (A23)") {
    val dir = Files.createTempDirectory("graft_store_empty").toString
    val df = Store.readTableOr(spark, dir, "terms", Schemas.terms)
    assert(df.count() === 0)
    assert(df.schema === Schemas.terms)
  }
}
