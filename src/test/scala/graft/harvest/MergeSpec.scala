package graft.harvest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val asOf0 = lit("2026-01-01 00:00:00").cast("timestamp_ntz")
  private val asOf1 = lit("2026-02-01 00:00:00").cast("timestamp_ntz")

  test("assignIds is dense, deterministic, ordered by key (A12/H1)") {
    val uris = Seq("c", "a", "b", "d").toDF("uri")
    val ids = Merge.assignIds(uris, Seq("uri"), 10)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ids.toSeq === Seq((10L, "a"), (11L, "b"), (12L, "c"), (13L, "d")))
    // repartitioned input yields identical ids
    val ids2 = Merge.assignIds(uris.repartition(7), Seq("uri"), 10)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ids.toSeq === ids2.toSeq)
  }

  test("upsertTerms keeps matched ids, bumps only matched updated_at, appends new (A11)") {
    val existing = Merge.assignIds(Seq("a", "b").toDF("uri"), Seq("uri"), 1)
      .select($"id", $"uri", asOf0.as("created_at"), asOf0.as("updated_at"))
    val out = Merge.upsertTerms(existing, Seq("b", "c").toDF("uri"), asOf1)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val byUri = out.map(r => r.getString(1) -> r).toMap
    def ldt(r: org.apache.spark.sql.Row, i: Int) = r.getAs[java.time.LocalDateTime](i)
    assert(ldt(byUri("a"), 3) === ldt(byUri("a"), 2)) // untouched
    assert(ldt(byUri("b"), 3).isAfter(ldt(byUri("b"), 2))) // bumped
    assert(ldt(byUri("c"), 2) === ldt(byUri("c"), 3)) // fresh
  }

  test("upsertTerms is idempotent on ids across reruns") {
    val existing = Merge.upsertTerms(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.terms),
      Seq("x", "y").toDF("uri"), asOf0.cast("timestamp"))
    val again = Merge.upsertTerms(existing, Seq("x", "y").toDF("uri"), asOf1.cast("timestamp"))
    assert(again.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      existing.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("insertIfAbsent appends only novel EAV rows and never mutates existing (A15)") {
    val existing = Merge.insertIfAbsent(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.termFields),
      Seq((1L, "u1", "t1", "v1"), (1L, "u1", "t1", "v2"))
        .toDF("term_id", "field_uri", "field_term", "original_value"),
      asOf0.cast("timestamp"))
    assert(existing.count() === 2)
    val rerun = Merge.insertIfAbsent(existing,
      Seq((1L, "u1", "t1", "v1"), (1L, "u1", "t1", "v3"), (1L, "u1", "t1", "v3"))
        .toDF("term_id", "field_uri", "field_term", "original_value"),
      asOf1.cast("timestamp"))
    assert(rerun.count() === 3) // v1 ignored, v3 deduped within batch then added
    assert(rerun.agg(countDistinct($"id")).head().getLong(0) === 3) // dense unique ids
    val v1 = rerun.filter($"original_value" === "v1").head()
    assert(v1.getTimestamp(5).toString.startsWith("2026-01-01")) // untouched timestamp
  }

  test("resolveFk replaces N+1 lookups with one join (A13)") {
    val terms = Merge.assignIds(Seq("u1", "u2").toDF("uri"), Seq("uri"), 1)
    val melted = Seq(("u1", "f", "skos:f", "v"), ("u2", "f", "skos:f", "w"))
      .toDF("concept", "field_uri", "field_term", "original_value")
    val fk = Merge.resolveFk(melted, terms).orderBy("term_id").collect()
    assert(fk.map(r => (r.getLong(0), r.getString(3))).toSeq === Seq((1L, "v"), (2L, "w")))
  }

  test("scd2Merge: keeps, retires, opens, and null-safe change detection (SCD2)") {
    val hist0 = Seq(
      ("u1", Some("a"), "2026-01-01 00:00:00"),
      ("u2", Some("b"), "2026-01-01 00:00:00"),
      ("u3", Option.empty[String], "2026-01-01 00:00:00")
    ).toDF("uri", "label", "vf")
      .select($"uri", $"label", $"vf".cast("timestamp_ntz").as("valid_from"),
        lit(null).cast("timestamp_ntz").as("valid_to"), lit(true).as("is_current"))
    val batch1 = Seq(
      ("u1", Some("a")),        // identical -> no new version
      ("u2", Some("B2")),       // changed -> close + open
      ("u3", Option.empty[String]), // null == null -> no new version
      ("u4", Some("d"))         // new key -> open
    ).toDF("uri", "label")
    val h1 = Merge.scd2Merge(hist0, batch1, Seq("uri"), Seq("label"), asOf1)
    val rows = h1.orderBy($"uri", $"valid_from").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      ("u1", Some("a"), true),
      ("u2", Some("b"), false), ("u2", Some("B2"), true),
      ("u3", None, true),
      ("u4", Some("d"), true)))
    // second merge: closed rows pass through; null -> value is a change
    val asOf2 = lit("2026-03-01 00:00:00").cast("timestamp_ntz")
    val h2 = Merge.scd2Merge(h1, Seq(("u3", Some("now"))).toDF("uri", "label"),
      Seq("uri"), Seq("label"), asOf2)
    val u3 = h2.filter($"uri" === "u3").orderBy($"valid_from").collect()
    assert(u3.map(r => (Option(r.getString(1)), r.getBoolean(4))).toSeq ===
      Seq((None, false), (Some("now"), true)))
    assert(u3(0).get(3) != null) // closed interval carries valid_to (NTZ → LocalDateTime)
    assert(h2.filter($"uri" === "u2").count() === 2) // history untouched
    // exactly one current row per key, always
    assert(h2.filter($"is_current").groupBy($"uri").count().filter($"count" > 1).count() === 0)
  }

  test("scd2Merge rejects duplicate keys in one batch (SCD2)") {
    val hist = Seq(("u1", "a", "2026-01-01 00:00:00")).toDF("uri", "label", "vf")
      .select($"uri", $"label", $"vf".cast("timestamp_ntz").as("valid_from"),
        lit(null).cast("timestamp_ntz").as("valid_to"), lit(true).as("is_current"))
    val dup = Seq(("u1", "x"), ("u1", "y")).toDF("uri", "label")
    // the guard is IN-PLAN (raise_error) → surfaces at materialization
    val e = intercept[Exception] {
      Merge.scd2Merge(hist, dup, Seq("uri"), Seq("label"), asOf1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("unique")), chain(e).mkString(" | "))
  }

  test("snapshotDiff classifies insert/delete/update/unchanged with null-safe compare (CDC)") {
    val oldSnap = Seq(("u1", "a"), ("u2", "b"), ("u3", null), ("u4", "d"))
      .toDF("uri", "label")
    val newSnap = Seq(("u1", "a"), ("u2", "B"), ("u3", null), ("u5", "e"))
      .toDF("uri", "label")
    val out = Merge.snapshotDiff(oldSnap, newSnap, Seq("uri"), Seq("label"))
      .orderBy($"uri").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      ("u1", "unchanged", "a", "a"),
      ("u2", "update", "b", "B"),
      ("u3", "unchanged", null, null), // null <=> null: NOT an update
      ("u4", "delete", "d", null),
      ("u5", "insert", null, "e")))
  }

  test("A13 resolveFk plan shape: the O(batch) melted side is BROADCAST " +
    "against a large terms table — store scanned, never shuffled (late r12 " +
    "scale-shape pin; the anti-join and full-outer legs have no broadcast " +
    "form, verified empirically, so this is the ONE batch-driven join)") {
    import org.apache.spark.sql.functions._
    // terms big enough that broadcasting IT would exceed the 10MB
    // threshold — the planner must broadcast the batch side instead
    val pad = "x" * 96
    val terms = spark.range(300000).select(
      col("id"),
      concat(lit("https://v.example/t/"), col("id"), lit(pad)).as("uri"))
    val melted = Seq(5L, 17L, 99L).toDF("n").select(
      concat(lit("https://v.example/t/"), col("n"), lit(pad)).as("concept"),
      lit("skos:prefLabel").as("field_term"),
      lit("http://www.w3.org/2004/02/skos/core#prefLabel").as("field_uri"),
      lit("v").as("original_value"))
    val out = Merge.resolveFk(melted, terms)
    assert(out.count() === 3L) // executes the plan so AQE finalizes it
    val nodes = graft.plans.PlanAudit.allNodes(out.queryExecution.executedPlan)
    val bhj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "resolveFk did not plan a broadcast-hash join")
    // the BUILD side must be the batch (melted) side: its subtree carries
    // `concept`, never the store's corpus
    assert(bhj.exists { j =>
      val build = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
      }
      build.output.exists(_.name == "concept")
    }, s"broadcast built the STORE side, not the batch: ${bhj.map(_.buildSide)}")
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      "resolveFk shuffled the store (SortMergeJoin) despite a broadcastable batch")
  }

  test("scd2Merge rejects corrupt history with two current rows per key (SCD2)") {
    val hist = Seq(("u1", "a"), ("u1", "b")).toDF("uri", "label")
      .select($"uri", $"label",
        lit("2026-01-01 00:00:00").cast("timestamp_ntz").as("valid_from"),
        lit(null).cast("timestamp_ntz").as("valid_to"), lit(true).as("is_current"))
    val batch = Seq(("u1", "c")).toDF("uri", "label")
    val e = intercept[Exception] {
      Merge.scd2Merge(hist, batch, Seq("uri"), Seq("label"), asOf1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("history current rows")), chain(e).mkString(" | "))
  }
}
