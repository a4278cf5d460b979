package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r11 (VERDICT r10 #1/#2): the failure-semantics half of the streaming
  * refresher lifecycle.
  *
  * RE-DELIVERY pins — Spark's foreachBatch is at-least-once: after a
  * trigger failure the SAME batchId is re-delivered. Every sink must
  * no-op on a re-delivered id; each pin applies the same (batch,
  * batchId) twice and asserts the state equals a clean run's, including
  * the two failure modes the r10 verdict named (band-index double-append
  * breaking extend==rebuild parity; AnnIndexRefresh killed by its own
  * collision guard).
  *
  * RESTART pins — with a `stateDir` ledger, a NEW sink instance on the
  * same directory recovers the committed state, the re-delivered
  * in-flight batch no-ops against it, and the continued run's final
  * state is bit-identical to the never-restarted run. The restart is
  * simulated at the foreachBatch contract boundary (direct update calls
  * with the exact id sequence a checkpointed source re-delivers:
  * ... n−1, CRASH, recover, n−1 again, n ...) — MemoryStream itself is
  * not replayable across JVMs, but the sink only ever sees (batch, id)
  * pairs, so the contract surface is fully exercised.
  */
class StreamingDurabilitySpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$m%02d:$s%02d")
  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case b: Array[_] => b.toSeq
      case x => x
    }).toSeq
  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    rows(df).sortBy(_.mkString("|"))
  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dur_$tag").toString

  // ---- shared fixtures --------------------------------------------------

  private def evt(id: Long, m: Int, u: Long, ty: String = "view", v: Double = 1.0) =
    Evt(id, t(m), u, ty, v)
  private lazy val evB0 = Seq(evt(1, 0, 1, "purchase", 10.0), evt(2, 1, 2, "view", 3.0),
    evt(3, 2, 1, "purchase", 4.0))
  private lazy val evB1 = Seq(evt(4, 3, 3, "purchase", 7.0), evt(5, 4, 1, "click", 2.0))
  private lazy val evB2 = Seq(evt(6, 5, 2, "purchase", 9.0), evt(7, 6, 4, "view", 1.0))

  private lazy val docFix: Seq[(Long, String)] = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").filter($"doc_id" < 90)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(docs.size > 30, "fixture too small")
    docs
  }
  private lazy val docBatches: Seq[Seq[(Long, String)]] =
    (0 until 3).map(r => docFix.filter(_._1 % 3 == r))

  // ---- re-delivery: same (batch, batchId) twice == once ------------------

  test("re-delivery: BandIndexRefresh no-ops a retried batch — extend==rebuild " +
    "parity survives the retry (VERDICT r10 #1)") {
    val clean = new Streaming.BandIndexRefresh(3)
    val retried = new Streaming.BandIndexRefresh(3)
    docBatches.zipWithIndex.foreach { case (g, i) =>
      clean.update(g.toDF("doc_id", "text"), i.toLong)
      retried.update(g.toDF("doc_id", "text"), i.toLong)
      if (i == 1) retried.update(g.toDF("doc_id", "text"), i.toLong) // retry
    }
    assert(sortedRows(retried.shingleIndex.get) === sortedRows(clean.shingleIndex.get))
    assert(sortedRows(retried.bandIndex.get) === sortedRows(clean.bandIndex.get))
    // and the lifecycle pin still holds THROUGH the retry: == fresh one-shot
    assert(sortedRows(retried.shingleIndex.get) ===
      sortedRows(graft.dedup.Dedup.shingleHashes(docFix.toDF("doc_id", "text"), 3)))
  }

  test("re-delivery: AnnIndexRefresh no-ops a retried batch instead of dying " +
    "on its own collision guard (VERDICT r10 #1)") {
    val emb = graft.Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val batches = (0 until 3).map(r => emb.filter($"vec_id" % 3 === r))
    val clean = new Streaming.AnnIndexRefresh(compactEvery = 4)
    val retried = new Streaming.AnnIndexRefresh(compactEvery = 4)
    batches.zipWithIndex.foreach { case (b, i) =>
      clean.update(b.toDF(), i.toLong)
      retried.update(b.toDF(), i.toLong)
      // the r10 code path: re-delivering an applied batch fed duplicate
      // vec_ids into hnswInsert → require() kills the query. Now: no-op.
      retried.update(b.toDF(), i.toLong)
    }
    val a = retried.adjacency.get
    val c = clean.adjacency.get
    assert(a.exceptAll(c).count() === 0L && c.exceptAll(a).count() === 0L)
  }

  test("re-delivery: the aggregate refreshers (series/CMS/AMS/active-users/PPR/" +
    "concurrency/cross-dedup) all no-op a retried batch") {
    // SeriesTrendRefresh — additive: a retry used to double-count cents
    val st1 = new Streaming.SeriesTrendRefresh
    val st2 = new Streaming.SeriesTrendRefresh
    st1.update(evB0.toDF(), 0L); st1.update(evB1.toDF(), 1L)
    st2.update(evB0.toDF(), 0L); st2.update(evB1.toDF(), 1L)
    st2.update(evB1.toDF(), 1L)
    assert(rows(st1.trend.get) === rows(st2.trend.get))
    // CountMinSink — counter matrix cells
    val cm1 = new Streaming.CountMinSink(d = 4, w = 64L)
    val cm2 = new Streaming.CountMinSink(d = 4, w = 64L)
    val keys1 = Seq.fill(40)("7") ++ (1 to 30).map(_.toString)
    val keys2 = (20 to 60).map(_.toString)
    cm1.update(keys1.toDF("k"), 0L); cm1.update(keys2.toDF("k"), 1L)
    cm2.update(keys1.toDF("k"), 0L); cm2.update(keys2.toDF("k"), 1L)
    cm2.update(keys2.toDF("k"), 1L)
    assert(sortedRows(cm1.matrix.get) === sortedRows(cm2.matrix.get))
    // AmsSink — z counters
    val am1 = new Streaming.AmsSink
    val am2 = new Streaming.AmsSink
    val g1 = (1 to 100).map(i => ("g1", s"k${i % 13}"))
    val g2 = (1 to 80).map(i => ("g2", s"k${i % 7}"))
    am1.update(g1.toDF("g", "k"), 0L); am1.update(g2.toDF("g", "k"), 1L)
    am2.update(g1.toDF("g", "k"), 0L); am2.update(g2.toDF("g", "k"), 1L)
    am2.update(g2.toDF("g", "k"), 1L)
    assert(sortedRows(am1.zTable.get) === sortedRows(am2.zTable.get))
    // ActiveUsersRefresh + PprRefresh — distinct folds (content-idempotent,
    // but the retry must not even recompute: state object unchanged)
    val au = new Streaming.ActiveUsersRefresh
    au.update(evB0.toDF(), 0L)
    val auSnap = au.counts.get
    au.update(evB0.toDF(), 0L)
    assert(au.counts.get eq auSnap) // no-op: the very same snapshot instance
    val pp = new Streaming.PprRefresh
    pp.update(Seq((1L, 10L), (2L, 10L)).toDF("u", "v"), 0L)
    val ppSnap = pp.ranks.get
    pp.update(Seq((1L, 10L), (2L, 10L)).toDF("u", "v"), 0L)
    assert(pp.ranks.get eq ppSnap)
    // SessionConcurrencyRefresh — frozen deltas must not double
    val sc1 = new Streaming.SessionConcurrencyRefresh("1 hour")
    val sc2 = new Streaming.SessionConcurrencyRefresh("1 hour")
    sc1.update(evB0.toDF(), 0L); sc1.update(evB1.toDF(), 1L)
    sc2.update(evB0.toDF(), 0L); sc2.update(evB1.toDF(), 1L)
    sc2.update(evB1.toDF(), 1L)
    assert(rows(sc1.curve.get) === rows(sc2.curve.get))
    // CrossNearDupSink — pair emissions must not duplicate
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
    val ref = Seq((101L, base)).toDF("doc_id", "text")
    val cn1 = new Streaming.CrossNearDupSink(ref)
    val cn2 = new Streaming.CrossNearDupSink(ref)
    cn1.update(Seq((1L, nearDup)).toDF("doc_id", "text"), 0L)
    cn2.update(Seq((1L, nearDup)).toDF("doc_id", "text"), 0L)
    cn2.update(Seq((1L, nearDup)).toDF("doc_id", "text"), 0L)
    assert(sortedRows(cn1.pairs.get) === sortedRows(cn2.pairs.get))
    assert(cn2.pairs.get.count() === 1L) // exactly once, not twice
  }

  test("re-delivery: harvestSink skips a committed batch via the store marker") {
    val dir = tmpDir("harvest")
    val mk = (uris: Seq[String]) => uris.toDF("concept")
      .select(col("concept"), lit(null).cast("string").as("prefLabel"),
        lit(null).cast("string").as("altLabel"), lit(null).cast("string").as("definition"))
    val asOf = Timestamp.valueOf("2026-01-01 00:00:00")
    Streaming.harvestSink(dir, asOf)(mk(Seq("https://v.example/t/b")), 0L)
    Streaming.harvestSink(dir, asOf)(
      mk(Seq("https://v.example/t/a", "https://v.example/t/b")), 1L)
    // re-delivery of batch 1: marker says applied → no re-merge, ids stable
    Streaming.harvestSink(dir, asOf)(
      mk(Seq("https://v.example/t/a", "https://v.example/t/b")), 1L)
    val terms = spark.read.parquet(s"$dir/terms").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(terms === Seq((1L, "https://v.example/t/b"), (2L, "https://v.example/t/a")))
  }

  test("harvest store fencing (r12): a zombie writer aborts before the swap " +
    "when a successor claims the store — tables and marker unmoved, a fresh " +
    "trigger converges") {
    val dir = tmpDir("harvest_fence")
    val mk = (uris: Seq[String]) => uris.toDF("concept")
      .select(col("concept"), lit(null).cast("string").as("prefLabel"),
        lit(null).cast("string").as("altLabel"), lit(null).cast("string").as("definition"))
    val asOf = Timestamp.valueOf("2026-01-01 00:00:00")
    Streaming.harvestSink(dir, asOf)(mk(Seq("https://v.example/t/a")), 0L)
    val before = spark.read.parquet(s"$dir/terms").collect().map(_.toSeq).toSeq
    // a successor claims the store INSIDE the zombie's compute-to-swap
    // window (after the merge, before the owner re-check)
    Streaming.onBeforeHarvestSwap = () => {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_epochs/99"), "9".getBytes("UTF-8"))
      Streaming.onBeforeHarvestSwap = () => ()
    }
    try intercept[IllegalStateException] {
      Streaming.harvestSink(dir, asOf)(mk(Seq("https://v.example/t/b")), 1L)
    } finally Streaming.onBeforeHarvestSwap = () => ()
    // the zombie touched NOTHING: tables and marker are the successor's view
    assert(spark.read.parquet(s"$dir/terms").collect().map(_.toSeq).toSeq === before)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_last_batch")), "UTF-8").trim === "0")
    // a fresh trigger (the successor's own delivery of batch 1) claims a
    // higher epoch, converges, and prunes superseded claims
    Streaming.harvestSink(dir, asOf)(mk(Seq("https://v.example/t/b")), 1L)
    val uris = spark.read.parquet(s"$dir/terms").orderBy("id").collect()
      .map(_.getString(1)).toSeq
    assert(uris === Seq("https://v.example/t/a", "https://v.example/t/b"))
    val claims = new java.io.File(s"$dir/_epochs").listFiles().map(_.getName).toSeq
    assert(claims.forall(_.toLong >= 100L), s"superseded claims not pruned: $claims")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("harvest store retention (late r12): a crashed writer's epoch-tagged " +
    "staging dir is swept by the next committed trigger; the batch job's " +
    "bare staging name is never touched") {
    val dir = tmpDir("harvest_sweep")
    val mk = (uris: Seq[String]) => uris.toDF("concept")
      .select(col("concept"), lit(null).cast("string").as("prefLabel"),
        lit(null).cast("string").as("altLabel"), lit(null).cast("string").as("definition"))
    val asOf = Timestamp.valueOf("2026-01-01 00:00:00")
    Streaming.harvestSink(dir, asOf)(mk(Seq("https://v.example/t/a")), 0L)
    // plant the residue a trigger crashed mid-write leaves: its tagged
    // staging dirs (epoch 1, below any future claim) and an in-flight
    // batch-job staging under the bare name
    val staleT = new java.io.File(dir, "_staging_terms.e1")
    val staleF = new java.io.File(dir, "_staging_term_fields.e1")
    val bare = new java.io.File(dir, "_staging_terms")
    Seq(staleT, staleF, bare).foreach { d =>
      d.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(d, "part-0.parquet").toPath, Array[Byte](1))
    }
    Streaming.harvestSink(dir, asOf)(mk(Seq("https://v.example/t/b")), 1L)
    assert(!staleT.exists() && !staleF.exists(),
      "crashed writer's staging dirs not swept — each crash leaks a table copy")
    assert(bare.exists(), "the batch job's bare staging name must be untouched")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  // ---- restart: recover-from-ledger == never-restarted --------------------

  test("restart: BandIndexRefresh recovers segments + compact marker from the " +
    "ledger; final index bit-identical to the continuous run (VERDICT r10 #2)") {
    val dir = tmpDir("band")
    val continuous = new Streaming.BandIndexRefresh(3)
    docBatches.zipWithIndex.foreach { case (g, i) =>
      continuous.update(g.toDF("doc_id", "text"), i.toLong)
      if (i == 0) continuous.compactSegments()
    }
    // durable run: crash after batch 1 (compaction after batch 0 persisted)
    val s1 = new Streaming.BandIndexRefresh(3, Some(dir))
    s1.update(docBatches(0).toDF("doc_id", "text"), 0L)
    s1.compactSegments()
    s1.update(docBatches(1).toDF("doc_id", "text"), 1L)
    // CRASH → new instance, recover; source re-delivers batch 1, then 2
    val s2 = new Streaming.BandIndexRefresh(3, Some(dir)).recover(spark)
    s2.update(docBatches(1).toDF("doc_id", "text"), 1L) // re-delivery: no-op
    s2.update(docBatches(2).toDF("doc_id", "text"), 2L)
    assert(sortedRows(s2.shingleIndex.get) === sortedRows(continuous.shingleIndex.get))
    assert(sortedRows(s2.bandIndex.get) === sortedRows(continuous.bandIndex.get))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("restart: AnnIndexRefresh replays build→insert→compact from the ledger; " +
    "adjacency bit-identical to the continuous run (VERDICT r10 #2)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 400)
    val batches = (0 until 4).map(r => emb.filter($"vec_id" % 4 === r).toDF())
    // compactEvery=3: trigger 0 build, 1-2 insert, 3 compacts
    val continuous = new Streaming.AnnIndexRefresh(compactEvery = 3)
    batches.zipWithIndex.foreach { case (b, i) => continuous.update(b, i.toLong) }
    val dir = tmpDir("ann")
    val s1 = new Streaming.AnnIndexRefresh(compactEvery = 3, Some(dir))
    s1.update(batches(0), 0L); s1.update(batches(1), 1L)
    // CRASH mid-stream (after an INSERT trigger — the deferred-hierarchy
    // state, the hard case: recovery must replay the insert, not rebuild)
    val s2 = new Streaming.AnnIndexRefresh(compactEvery = 3, Some(dir)).recover(spark)
    // recovered state == continuous state after trigger 1 (insert deferral
    // preserved: inserted ids still base-layer-only)
    val ins1 = batches(1).select("vec_id").collect().map(_.getLong(0)).toSet
    val leaked = s2.adjacency.get.filter($"layer" > 0)
      .filter($"src".isin(ins1.toSeq: _*) || $"dst".isin(ins1.toSeq: _*)).count()
    assert(leaked === 0L, s"recovery re-leveled deferred inserts ($leaked rows)")
    s2.update(batches(1), 1L) // re-delivery: no-op (collision guard NOT hit)
    s2.update(batches(2), 2L)
    s2.update(batches(3), 3L) // the scheduled compaction trigger
    val a = s2.adjacency.get
    val c = continuous.adjacency.get
    assert(a.exceptAll(c).count() === 0L && c.exceptAll(a).count() === 0L,
      "restarted lifecycle diverged from the continuous run")
    // and both equal the canonical never-streamed build (compaction landed)
    val canonical = graft.similarity.Similarity.hnswCompact(emb)
    assert(a.exceptAll(canonical).count() === 0L && canonical.exceptAll(a).count() === 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("restart r13 (VERDICT r12 #2): insert recovery LOADS the committed " +
    "adjacency delta — bit-identical to the hnswInsert kernel replay it replaces") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 400)
    val b0 = emb.filter($"vec_id" % 4 === 0).toDF()
    val b1 = emb.filter($"vec_id" % 4 === 1).toDF()
    val dir = tmpDir("anndelta")
    val s1 = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(dir))
    s1.update(b0, 0L) // build — the canonical point
    val adj0 = s1.adjacency.get.localCheckpoint(true)
    s1.update(b1, 1L) // insert — commits the vector segment AND the delta
    // the commit records the delta payload (the branch recover() takes)
    val marker = new java.io.File(new java.io.File(dir, "commits"), "1.e1")
    assert(marker.exists(), "insert commit marker missing")
    assert(new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
      .contains("delta=1"), "insert commit does not declare its delta payload")
    assert(new java.io.File(dir, "data").listFiles()
      .exists(_.getName.startsWith("adjdelta-b1-")), "delta payload dir missing")
    // the kernel replay — the pre-r13 recovery path, kept as cross-check
    val layers = graft.similarity.Similarity.provisionLayers(b0.count())
    val replay = graft.similarity.Similarity.hnswInsert(b0, adj0, b1, Some(layers))
    // delta-load recovery (a fresh instance on the same ledger)
    val s2 = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(dir)).recover(spark)
    val loaded = s2.adjacency.get
    assert(loaded.exceptAll(replay).count() === 0L &&
      replay.exceptAll(loaded).count() === 0L,
      "delta-load recovery diverged from the kernel replay")
    val cont = s1.adjacency.get
    assert(loaded.exceptAll(cont).count() === 0L &&
      cont.exceptAll(loaded).count() === 0L,
      "delta-load recovery diverged from the continuous run")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("bootstrapByRef r13: the pointer seed commit recovers bit-identically " +
    "to the copying bootstrap; a swept seed refuses loudly") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 400)
    val seed = emb.filter($"vec_id" % 4 === 0).toDF()
    val b1 = emb.filter($"vec_id" % 4 === 1).toDF()
    val layers = graft.similarity.Similarity.provisionLayers(seed.count())
    val adj0 = graft.similarity.Similarity.hnswCompact(seed, Some(layers))
      .localCheckpoint(true)
    val seedDir = tmpDir("refseed")
    seed.write.parquet(s"$seedDir/vecs")
    adj0.write.parquet(s"$seedDir/adj")
    // by-ref instance: pointer commit + one insert tick
    val refDir = tmpDir("annref")
    val byRef = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(refDir))
      .bootstrapByRef(spark, s"$seedDir/vecs", s"$seedDir/adj", Some(layers))
    byRef.update(b1, 0L)
    // the pointer commit carries NO payload dirs — O(1) metadata only
    assert(!new java.io.File(refDir, "data").listFiles()
      .exists(_.getName.contains("-b-1-")), "by-ref bootstrap copied payloads")
    // copy-mode twin on the same seed + tick
    val cpDir = tmpDir("anncp")
    val byCopy = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(cpDir))
      .bootstrap(spark.read.parquet(s"$seedDir/vecs"),
        spark.read.parquet(s"$seedDir/adj"), Some(layers))
    byCopy.update(b1, 0L)
    val recRef = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(refDir))
      .recover(spark).adjacency.get
    val recCp = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(cpDir))
      .recover(spark).adjacency.get
    assert(recRef.exceptAll(recCp).count() === 0L &&
      recCp.exceptAll(recRef).count() === 0L,
      "by-ref recovery diverged from copy-mode recovery")
    val cont = byRef.adjacency.get
    assert(recRef.exceptAll(cont).count() === 0L &&
      cont.exceptAll(recRef).count() === 0L,
      "by-ref recovery diverged from the continuous run")
    // sweep the seed: recovery must refuse with the signature message,
    // never serve different data
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$seedDir/adj"))
    val e = intercept[IllegalArgumentException] {
      new Streaming.AnnIndexRefresh(compactEvery = 10, Some(refDir)).recover(spark)
    }
    assert(e.getMessage.contains("changed or vanished"))
    Seq(seedDir, refDir, cpDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  test("bootstrapByRef soak r15 (VERDICT r14 #7): a seed that is a REAL " +
    "SnapshotStore snapshot, legitimately swept mid-ledger-life (the " +
    "version-bump sweep), turns recovery into the changed-or-vanished " +
    "refusal — after insert ticks, and never an NPE") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 400)
    val key = s"refsoak_${System.nanoTime()}"
    // the production shape: the seed IS a materialize-once snapshot
    val seedVecs = graft.SnapshotStore(spark, sfDir, "embeddings.parquet",
      s"${key}_vecs") { emb.filter($"vec_id" % 4 === 0).toDF() }
    val layers = graft.similarity.Similarity.provisionLayers(seedVecs.count())
    val adjDf = graft.similarity.Similarity.hnswCompact(seedVecs, Some(layers))
      .localCheckpoint(true)
    graft.SnapshotStore(spark, sfDir, "embeddings.parquet", s"${key}_adj") { adjDf }
    // the published snapshot DIRS — the exact pointers a by-ref consumer
    // records (already built above, so the builder must never re-run)
    def snapDir(suffix: String): java.io.File = new java.io.File(
      graft.SnapshotStore.path(spark, sfDir, "embeddings.parquet",
        s"${key}_$suffix") { sys.error("snapshot must already be published") })
    val refDir = tmpDir("annrefsoak")
    val byRef = new Streaming.AnnIndexRefresh(compactEvery = 10, Some(refDir))
      .bootstrapByRef(spark, snapDir("vecs").toString, snapDir("adj").toString,
        Some(layers))
    // MID-LEDGER-LIFE: two insert ticks after the pointer seed, so the
    // refusal must fire from the seed re-read inside a recovery that
    // also has insert segments to load
    byRef.update(emb.filter($"vec_id" % 4 === 1).toDF(), 0L)
    byRef.update(emb.filter($"vec_id" % 4 === 2).toDF(), 1L)
    // sanity: recovery works while the snapshot lives
    assert(new Streaming.AnnIndexRefresh(compactEvery = 10, Some(refDir))
      .recover(spark).adjacency.get.count() > 0L)
    // the legitimate sweep: SnapshotStore.sweepOldVersions deletes a
    // superseded version root wholesale — same effect on this
    // snapshot's path, simulated directly against the scratch layout
    val swept = Seq(snapDir("vecs"), snapDir("adj"))
    swept.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    val e = intercept[IllegalArgumentException] {
      new Streaming.AnnIndexRefresh(compactEvery = 10, Some(refDir)).recover(spark)
    }
    assert(e.getMessage != null && e.getMessage.contains("changed or vanished"),
      s"expected the signature refusal, got: $e")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(refDir))
  }

  test("restart: SessionConcurrencyRefresh recovers the bounded snapshot " +
    "(open/frozen/finished-days/carry/frontier); curve bit-identical") {
    def e(id: Long, u: Long, ts: String) = Evt(id, Timestamp.valueOf(ts), u, "view", 0)
    val days = (1 to 4).map { d =>
      val base = (d - 1) * 100L
      Seq(e(base + 1, base + 1, f"2024-03-$d%02d 09:00:00"),
        e(base + 2, base + 1, f"2024-03-$d%02d 09:20:00"),
        e(base + 3, base + 2, f"2024-03-$d%02d 09:10:00"),
        e(base + 4, base + 2, f"2024-03-$d%02d 09:30:00"))
    }
    val continuous = new Streaming.SessionConcurrencyRefresh("1 hour")
    days.zipWithIndex.foreach { case (b, i) => continuous.update(b.toDF(), i.toLong) }
    val dir = tmpDir("conc")
    val s1 = new Streaming.SessionConcurrencyRefresh("1 hour", Some(dir))
    s1.update(days(0).toDF(), 0L); s1.update(days(1).toDF(), 1L)
    val s2 = new Streaming.SessionConcurrencyRefresh("1 hour", Some(dir)).recover(spark)
    // served-immediately-after-restart: curve available BEFORE any batch
    assert(rows(s2.curve.get).nonEmpty)
    s2.update(days(1).toDF(), 1L) // re-delivery: no-op
    s2.update(days(2).toDF(), 2L); s2.update(days(3).toDF(), 3L)
    assert(rows(s2.curve.get) === rows(continuous.curve.get))
    // and both == the batch sweep line on all events (the standing pin)
    assert(rows(s2.curve.get) === rows(Streaming.concurrency(days.flatten.toDF())))
    assert(s2.compactedDays === continuous.compactedDays)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("restart: the delta-ledger refreshers (series/CMS/AMS/active-users/PPR/" +
    "cross-dedup) recover to the continuous state") {
    // SeriesTrendRefresh
    val dirS = tmpDir("series")
    val stc = new Streaming.SeriesTrendRefresh
    Seq(evB0, evB1, evB2).zipWithIndex.foreach { case (b, i) => stc.update(b.toDF(), i.toLong) }
    val st1 = new Streaming.SeriesTrendRefresh(Some(dirS))
    st1.update(evB0.toDF(), 0L); st1.update(evB1.toDF(), 1L)
    val st2 = new Streaming.SeriesTrendRefresh(Some(dirS)).recover(spark)
    st2.update(evB1.toDF(), 1L); st2.update(evB2.toDF(), 2L)
    assert(rows(st2.trend.get) === rows(stc.trend.get))
    assert(rows(st2.seasonal.get) === rows(stc.seasonal.get))
    // CountMinSink
    val dirC = tmpDir("cms")
    val keys1 = Seq.fill(40)("7") ++ (1 to 30).map(_.toString)
    val keys2 = (20 to 60).map(_.toString)
    val cmc = new Streaming.CountMinSink(4, 64L)
    cmc.update(keys1.toDF("k"), 0L); cmc.update(keys2.toDF("k"), 1L)
    val cm1 = new Streaming.CountMinSink(4, 64L, Some(dirC))
    cm1.update(keys1.toDF("k"), 0L)
    val cm2 = new Streaming.CountMinSink(4, 64L, Some(dirC)).recover(spark)
    cm2.update(keys1.toDF("k"), 0L) // re-delivery: no-op
    cm2.update(keys2.toDF("k"), 1L)
    assert(sortedRows(cm2.matrix.get) === sortedRows(cmc.matrix.get))
    // AmsSink
    val dirA = tmpDir("ams")
    val g1 = (1 to 100).map(i => ("g1", s"k${i % 13}"))
    val g2 = (1 to 80).map(i => ("g2", s"k${i % 7}"))
    val amc = new Streaming.AmsSink
    amc.update(g1.toDF("g", "k"), 0L); amc.update(g2.toDF("g", "k"), 1L)
    val am1 = new Streaming.AmsSink(Some(dirA))
    am1.update(g1.toDF("g", "k"), 0L)
    val am2 = new Streaming.AmsSink(Some(dirA)).recover(spark)
    am2.update(g2.toDF("g", "k"), 1L)
    assert(sortedRows(am2.zTable.get) === sortedRows(amc.zTable.get))
    // ActiveUsersRefresh
    val dirU = tmpDir("au")
    val auc = new Streaming.ActiveUsersRefresh
    auc.update(evB0.toDF(), 0L); auc.update(evB2.toDF(), 1L)
    val au1 = new Streaming.ActiveUsersRefresh(Some(dirU))
    au1.update(evB0.toDF(), 0L)
    val au2 = new Streaming.ActiveUsersRefresh(Some(dirU)).recover(spark)
    val auPrefix = new Streaming.ActiveUsersRefresh()
    auPrefix.update(evB0.toDF(), 0L)
    // served right after recover, before any new batch
    assert(rows(au2.counts.get) === rows(auPrefix.counts.get))
    au2.update(evB2.toDF(), 1L)
    assert(rows(au2.counts.get) === rows(auc.counts.get))
    // PprRefresh
    val dirP = tmpDir("ppr")
    val e1 = Seq((1L, 10L), (2L, 10L), (10L, 20L))
    val e2 = Seq((20L, 0L), (4L, 10L))
    val ppc = new Streaming.PprRefresh
    ppc.update(e1.toDF("u", "v"), 0L); ppc.update(e2.toDF("u", "v"), 1L)
    val pp1 = new Streaming.PprRefresh(Some(dirP))
    pp1.update(e1.toDF("u", "v"), 0L)
    val pp2 = new Streaming.PprRefresh(Some(dirP)).recover(spark)
    pp2.update(e2.toDF("u", "v"), 1L)
    assert(rows(pp2.ranks.get) === rows(ppc.ranks.get))
    // CrossNearDupSink
    val dirX = tmpDir("cross")
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
    val ref = Seq((101L, base)).toDF("doc_id", "text")
    val cnc = new Streaming.CrossNearDupSink(ref)
    cnc.update(Seq((1L, nearDup)).toDF("doc_id", "text"), 0L)
    cnc.update(Seq((3L, base)).toDF("doc_id", "text"), 1L)
    val cn1 = new Streaming.CrossNearDupSink(ref, stateDir = Some(dirX))
    cn1.update(Seq((1L, nearDup)).toDF("doc_id", "text"), 0L)
    val cn2 = new Streaming.CrossNearDupSink(ref, stateDir = Some(dirX)).recover(spark)
    cn2.update(Seq((3L, base)).toDF("doc_id", "text"), 1L)
    assert(sortedRows(cn2.pairs.get) === sortedRows(cnc.pairs.get))
    Seq(dirS, dirC, dirA, dirU, dirP, dirX).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  test("restart: AnnIndexRefresh crash AFTER a compaction trigger recovers " +
    "straight from the canonical build (no insert replay)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 400)
    val batches = (0 until 3).map(r => emb.filter($"vec_id" % 3 === r).toDF())
    // compactEvery=2: trigger 0 build, 1 insert, 2 compacts — crash after 2
    val continuous = new Streaming.AnnIndexRefresh(compactEvery = 2)
    batches.zipWithIndex.foreach { case (b, i) => continuous.update(b, i.toLong) }
    val dir = tmpDir("annc")
    val s1 = new Streaming.AnnIndexRefresh(compactEvery = 2, Some(dir))
    batches.zipWithIndex.foreach { case (b, i) => s1.update(b, i.toLong) }
    val s2 = new Streaming.AnnIndexRefresh(compactEvery = 2, Some(dir)).recover(spark)
    s2.update(batches(2), 2L) // re-delivery of the compact trigger: no-op
    val a = s2.adjacency.get
    val c = continuous.adjacency.get
    assert(a.exceptAll(c).count() === 0L && c.exceptAll(a).count() === 0L)
    // recovered state at a compact marker IS the canonical build
    val canonical = graft.similarity.Similarity.hnswCompact(
      batches.reduce(_ unionByName _))
    assert(a.exceptAll(canonical).count() === 0L && canonical.exceptAll(a).count() === 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("bootstrap: seeds the lifecycle from a served index; refuses to seed " +
    "a refresher that already applied a batch") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 300)
    val standing = emb.filter($"vec_id" % 3 =!= 0).localCheckpoint(true)
    val batch = emb.filter($"vec_id" % 3 === 0).localCheckpoint(true)
    val adj = graft.similarity.Similarity.hnswCompact(standing).localCheckpoint(true)
    // bootstrap + one streamed insert == the direct one-shot insert
    val r = new Streaming.AnnIndexRefresh(compactEvery = Int.MaxValue)
      .bootstrap(standing, adj)
    r.update(batch, 0L)
    val got = r.adjacency.get
    val want = graft.similarity.Similarity.hnswInsert(standing, adj, batch)
    assert(got.exceptAll(want).count() === 0L && want.exceptAll(got).count() === 0L)
    // contract: bootstrap must precede the first micro-batch
    val late = new Streaming.AnnIndexRefresh(compactEvery = Int.MaxValue)
    late.update(standing, 0L)
    intercept[IllegalArgumentException] { late.bootstrap(standing, adj) }
  }

  test("bootstrap + DURABLE ledger is recoverable (r12, ADVICE): the seed " +
    "persists as a bootstrap commit, restart replays inserts on top of the " +
    "seeded adjacency — bit-identical to the never-restarted run") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").filter($"vec_id" < 300)
    val standing = emb.filter($"vec_id" % 3 =!= 0).localCheckpoint(true)
    val batch = emb.filter($"vec_id" % 3 === 0).localCheckpoint(true)
    val adj = graft.similarity.Similarity.hnswCompact(standing).localCheckpoint(true)
    val dir = tmpDir("boot_dur")
    val r = new Streaming.AnnIndexRefresh(compactEvery = Int.MaxValue,
      stateDir = Some(dir)).bootstrap(standing, adj)
    r.update(batch, 0L)
    // crash; a fresh instance recovers — the OLD code aborted here
    // (insert segments with no canonical commit): the bootstrap was
    // never in the ledger
    val r2 = new Streaming.AnnIndexRefresh(compactEvery = Int.MaxValue,
      stateDir = Some(dir)).recover(spark)
    val got = r2.adjacency.get
    val want = r.adjacency.get
    assert(got.exceptAll(want).count() === 0L && want.exceptAll(got).count() === 0L)
    // the re-delivered batch no-ops on the recovered instance too
    r2.update(batch, 0L)
    val after = r2.adjacency.get
    assert(after.exceptAll(want).count() === 0L && want.exceptAll(after).count() === 0L)
    // contract: bootstrap refuses a ledger that already holds commits
    intercept[IllegalArgumentException] {
      new Streaming.AnnIndexRefresh(stateDir = Some(dir)).bootstrap(standing, adj)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("restart then INTRADAY triggers: recovered finished-day state survives " +
    "the per-trigger snapshot prune (no dangling reads on pruned commits)") {
    def e(id: Long, u: Long, ts: String) = Evt(id, Timestamp.valueOf(ts), u, "view", 0)
    // batch 0 spans two days, so day 1 FINALIZES (compacted gets a row);
    // batches 1 and 2 stay inside day 2 — no new day compacts, so the
    // recovered `compacted` frame passes through update() unchanged
    // while the prune deletes the commit it was read from. Pre-fix this
    // dangled: curve() re-read pruned parquet.
    val b0 = Seq(e(1, 1, "2024-03-01 09:00:00"), e(2, 1, "2024-03-01 09:20:00"),
      e(3, 2, "2024-03-02 09:00:00"), e(4, 2, "2024-03-02 09:30:00"))
    val b1 = Seq(e(5, 3, "2024-03-02 11:00:00"), e(6, 3, "2024-03-02 11:10:00"))
    val b2 = Seq(e(7, 4, "2024-03-02 13:00:00"), e(8, 4, "2024-03-02 13:05:00"))
    val continuous = new Streaming.SessionConcurrencyRefresh("1 hour")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) => continuous.update(b.toDF(), i.toLong) }
    val dir = tmpDir("intraday")
    val s1 = new Streaming.SessionConcurrencyRefresh("1 hour", Some(dir))
    s1.update(b0.toDF(), 0L)
    assert(s1.compactedDays === 1L, "fixture must finalize day 1 in batch 0")
    val s2 = new Streaming.SessionConcurrencyRefresh("1 hour", Some(dir)).recover(spark)
    s2.update(b1.toDF(), 1L) // prunes commit 0's payloads
    s2.update(b2.toDF(), 2L) // prunes commit 1's payloads
    // the curve still serves (recovered state materialized, not lazy on
    // the pruned files) and equals the continuous run
    assert(rows(s2.curve.get) === rows(continuous.curve.get))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("zombie fencing: a superseded instance's commit throws; a slipped-through " +
    "stale tail is truncated at recovery; the successor's files are untouchable") {
    val dir = tmpDir("fence")
    // A (epoch 1) owns the sink and applies batch 0
    val a = new Streaming.SeriesTrendRefresh(Some(dir))
    a.update(evB0.toDF(), 0L)
    // driver "restart": B recovers — B's construction CLAIMS epoch 2
    val b = new Streaming.SeriesTrendRefresh(Some(dir)).recover(spark)
    b.update(evB1.toDF(), 1L)
    // the zombie A is still alive and tries to flush batch 1 late:
    // its commit must REFUSE (inside foreachBatch that kills the
    // zombie query — the correct outcome), and B's state must not move
    intercept[IllegalStateException] { a.update(evB1.toDF(), 1L) }
    val clean = new Streaming.SeriesTrendRefresh
    clean.update(evB0.toDF(), 0L); clean.update(evB1.toDF(), 1L)
    assert(rows(b.trend.get) === rows(clean.trend.get))
    // TOCTOU residue: simulate a zombie marker that slipped PAST the
    // fence check — a hand-planted epoch-1 commit with an id beyond
    // what epoch 2 adopted (hwAtClaim = 0). Recovery must DROP it: it
    // was never part of the live lineage, and counting it would make
    // the high-water mark skip a real future batch.
    val bogusData = s"$dir/data/daily-b7-e1"
    graft.ops.EventAnalytics.dailyCents(evB2.toDF())
      .write.mode("overwrite").parquet(bogusData)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/commits/7.e1"), Array.empty[Byte])
    val c = new Streaming.SeriesTrendRefresh(Some(dir)).recover(spark)
    // the stale tail is invisible: state == A(0) + B(1), and batch 2
    // still applies (hw did NOT jump to the zombie's 7)
    assert(rows(c.trend.get) === rows(clean.trend.get))
    c.update(evB2.toDF(), 2L)
    val clean3 = new Streaming.SeriesTrendRefresh
    Seq(evB0, evB1, evB2).zipWithIndex.foreach { case (bt, i) => clean3.update(bt.toDF(), i.toLong) }
    assert(rows(c.trend.get) === rows(clean3.trend.get))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("zombie fencing r12: a successor claiming INSIDE the publish window " +
    "triggers retraction — the zombie's marker and payload are gone " +
    "immediately, not at the next recovery (VERDICT r11 #3)") {
    val dir = tmpDir("fence_race")
    val daily = (b: Seq[Evt]) => graft.ops.EventAnalytics.dailyCents(b.toDF())
    val a = new BatchLedger(Some(dir)) // epoch 1
    a.commit(0L, Seq("daily" -> daily(evB0)))
    // the successor B claims epoch 2 in the exact TOCTOU window: after
    // A's pre-publish check + payload write, before A's marker rename
    a.onBeforePublish = () => { new BatchLedger(Some(dir)); () }
    intercept[IllegalStateException] { a.commit(1L, Seq("daily" -> daily(evB1))) }
    // the slipped-through commit is RETRACTED, not left for recovery:
    // no epoch-1 marker for id 1, no epoch-1 payload dir
    assert(!new java.io.File(s"$dir/commits/1.e1").exists(),
      "zombie marker survived the post-publish re-scan")
    assert(!new java.io.File(s"$dir/data/daily-b1-e1").exists(),
      "zombie payload survived the post-publish re-scan")
    // a fresh instance sees exactly the pre-race history
    val c = new BatchLedger(Some(dir))
    assert(c.recovered.map(_.id) === Seq(0L) && c.highWater === 0L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("zombie fencing r12: a commit the successor ADOPTED is NOT retracted — " +
    "the fence still throws but the live lineage keeps the commit (review: " +
    "unconditional retraction erased adopted commits and dangled the " +
    "successor's recovered reads)") {
    val dir = tmpDir("fence_adopt")
    val daily = (b: Seq[Evt]) => graft.ops.EventAnalytics.dailyCents(b.toDF())
    val a = new BatchLedger(Some(dir)) // epoch 1
    a.commit(0L, Seq("daily" -> daily(evB0)))
    // the successor claims epoch 2 inside A's publish window, having
    // ALREADY READ commit 1 (constructed after the marker landed —
    // its claim body records adopted high-water 1)
    a.onBeforePublish = () => {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/epochs/2"), "1".getBytes("UTF-8"))
      a.onBeforePublish = () => ()
    }
    intercept[IllegalStateException] { a.commit(1L, Seq("daily" -> daily(evB1))) }
    // the adopted commit SURVIVES: marker, payload, and recovery all keep it
    assert(new java.io.File(s"$dir/commits/1.e1").exists(),
      "adopted commit's marker was retracted")
    assert(new java.io.File(s"$dir/data/daily-b1-e1").exists(),
      "adopted commit's payload was retracted")
    val c = new BatchLedger(Some(dir))
    assert(c.recovered.map(_.id) === Seq(0L, 1L) && c.highWater === 1L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("payload prune handles negative (bootstrap) ids like the marker parser " +
    "does (r12 review: the old regex silently skipped vecs-b-1-e1 dirs)") {
    val dir = tmpDir("neg_prune")
    val daily = (b: Seq[Evt]) => graft.ops.EventAnalytics.dailyCents(b.toDF())
    val l = new BatchLedger(Some(dir))
    l.commit(-1L, Seq("vecs" -> daily(evB0)), Map("kind" -> "bootstrap"))
    l.commit(0L, Seq("vecs" -> daily(evB1)))
    assert(new java.io.File(s"$dir/data/vecs-b-1-e1").exists())
    // a snapshot-retention sweep keeping from id 0 must drop the −1
    // commit's marker AND its payload dir — not orphan the payload
    l.pruneSnapshotsBelow(0L)
    assert(!new java.io.File(s"$dir/commits/-1.e1").exists())
    assert(!new java.io.File(s"$dir/data/vecs-b-1-e1").exists(),
      "bootstrap payload orphaned by the prune")
    assert(new java.io.File(s"$dir/data/vecs-b0-e1").exists())
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("claim atomicity r12: a visible epoch claim always carries its adopted " +
    "high-water body; a corrupt/empty claim truncates NOTHING (ADVICE)") {
    val dir = tmpDir("claim_atomic")
    val daily = (b: Seq[Evt]) => graft.ops.EventAnalytics.dailyCents(b.toDF())
    val a = new BatchLedger(Some(dir)) // epoch 1, adopted -1
    a.commit(0L, Seq("daily" -> daily(evB0)))
    a.commit(1L, Seq("daily" -> daily(evB1)))
    // the claim body is complete at publish (hard-link publish) and no
    // tmp residue leaks into the epoch namespace
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/epochs/1")), "UTF-8").trim === "-1")
    assert(!new java.io.File(s"$dir/epochs").listFiles().exists(_.getName.endsWith(".tmp")))
    // defense in depth: hand-plant the artifact the OLD code could leave
    // (a claim created but never written — crash between CREATE_NEW and
    // content flush). Recovery must read it as "truncates nothing": the
    // old getOrElse(-1) read it as "adopted nothing" and dropped EVERY
    // earlier-epoch commit — total silent state loss.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/epochs/2"), Array.empty[Byte])
    val c = new BatchLedger(Some(dir)) // epoch 3
    assert(c.recovered.map(_.id) === Seq(0L, 1L),
      "an empty claim erased the committed history")
    assert(c.highWater === 1L)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("claim arbitration (late r12): concurrent racing claims each get a " +
    "UNIQUE epoch with its body intact — create-exclusive hard-link publish " +
    "under real thread contention, no tmp residue") {
    val dir = tmpDir("claim_race")
    val epochsDir = new java.io.File(dir, "epochs")
    val n = 24
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    try {
      (0 until n).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            val e = EpochClaims.claim(epochsDir, s"body-$i")
            results.add(e -> s"body-$i"); ()
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    import scala.jdk.CollectionConverters._
    val claimed = results.asScala.toSeq
    assert(claimed.size === n)
    // every thread got a DISTINCT epoch (the bump-and-retry loop never
    // lets two instances believe they own the same number)
    assert(claimed.map(_._1).distinct.size === n, "duplicate epoch claimed")
    // each claim file carries exactly its claimant's body (hard-link
    // publish: complete-at-visibility, never another thread's content)
    claimed.foreach { case (e, body) =>
      val onDisk = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(epochsDir, e.toString).toPath), "UTF-8")
      assert(onDisk === body, s"epoch $e body mismatch")
    }
    // no in-flight tmp bodies leak into the namespace
    assert(!epochsDir.listFiles().exists(_.getName.endsWith(".tmp")))
    // newest() sees the max claimed epoch by NAME alone
    assert(EpochClaims.newest(epochsDir) === claimed.map(_._1).max)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ledger mechanics: marker-last publish means an UNCOMMITTED payload is " +
    "re-applied, a committed one is skipped (crash-window semantics)") {
    val dir = tmpDir("ledger")
    val st1 = new Streaming.SeriesTrendRefresh(Some(dir))
    st1.update(evB0.toDF(), 0L)
    // simulate a crash BETWEEN payload write and marker publish for batch 1:
    // write the payload dir by hand (as a torn copy) with NO marker
    val torn = new java.io.File(s"$dir/data/daily-b1")
    graft.ops.EventAnalytics.dailyCents(evB1.toDF()).limit(1)
      .write.mode("overwrite").parquet(torn.toString)
    val st2 = new Streaming.SeriesTrendRefresh(Some(dir)).recover(spark)
    st2.update(evB1.toDF(), 1L) // NOT committed → must re-apply (and overwrite)
    val clean = new Streaming.SeriesTrendRefresh
    clean.update(evB0.toDF(), 0L); clean.update(evB1.toDF(), 1L)
    assert(rows(st2.trend.get) === rows(clean.trend.get))
    // and a third instance recovers the full two-batch state
    val st3 = new Streaming.SeriesTrendRefresh(Some(dir)).recover(spark)
    assert(rows(st3.trend.get) === rows(clean.trend.get))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
