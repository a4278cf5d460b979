package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** b12_hnsw_topk / b12_hnsw_recall: structural invariants of the
  * derandomized layered-graph ANN — bounded out-degree, overlap-cell
  * connectivity beyond the entry neighborhood, exact-k well-formed
  * output, and a recall floor against brute force. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, sfDir)

  test("hierarchy adjacency: per-layer out-degree <= R, no self-loops, distinct, nested") {
    val members = Similarity.quantizedWithNorm(emb)
    val adj = Similarity.hnswBuild(members).cache()
    val deg = adj.groupBy($"layer", $"src").agg(count(lit(1)).as("d"))
      .agg(max($"d")).head().getLong(0)
    assert(deg <= Similarity.HnswR, s"max out-degree $deg exceeds R=${Similarity.HnswR}")
    assert(adj.filter($"src" === $"dst").count() === 0L)
    assert(adj.distinct().count() === adj.count())
    // nesting: a vertex with an edge at layer m must draw level >= m
    val lv = Similarity.hnswLeveled(members).select($"vec_id", $"lvl")
    val offLayer = adj.select($"layer", $"src".as("vec_id")).distinct()
      .join(lv, Seq("vec_id")).filter($"lvl" < $"layer").count()
    assert(offLayer === 0L, s"$offLayer adjacency rows sit above their vertex's level")
    adj.unpersist()
  }

  test("search output is well-formed: <= k rows per query, rn dense, cosine ordered") {
    val out = Similarity.hnswTopK(emb, col("vec_id") % 100 === 0).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    for ((q, rows) <- byQ) {
      assert(rows.length <= 10, s"query $q has ${rows.length} rows")
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length), s"query $q rn gaps")
      val cs = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"query $q not ordered")
      assert(rows.forall(_.getLong(1) != q), s"query $q returned itself")
    }
  }

  test("beam escapes the entry neighborhood: results differ across queries") {
    // if navigation were stuck at the fixed entry set, every query
    // would return (nearly) the same ids; real descent personalizes
    val out = Similarity.hnswTopK(emb, col("vec_id") % 100 === 0).collect()
    val sets = out.groupBy(_.getLong(0)).values.map(_.map(_.getLong(1)).toSet).toSeq
    val pairwiseSame = for (a <- sets; b <- sets if a ne b) yield (a intersect b).size
    assert(pairwiseSame.forall(_ < 10), "all queries returned identical top-10")
  }

  test("recall@10 vs brute force clears the acceptance floor") {
    // r9 floor raised 0.5 -> 0.85 with the family norm (VERDICT r8 #4):
    // the re-planned build + widened beam (R=12, Beam0=64, Rounds0=4,
    // EntryN=12) measures mean 0.96 / min 0.90 at the 500-vector corpus
    val rec = Similarity.hnswRecallQuery(spark, sfDir).collect()
      .map(_.getAs[Double]("recall_at_10"))
    assert(rec.nonEmpty)
    val mean = rec.sum / rec.length
    assert(mean >= 0.85, f"mean recall@10 $mean%.2f below the 0.85 floor")
  }

  test("construction + search are deterministic: two runs bit-identical") {
    def run() = Similarity.hnswTopK(emb, col("vec_id") % 100 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(run() === run())
  }

  test("e08 maintenance tick: no stage vacuous — some arrivals gate out as " +
    "near-dups, survivors insert and are reachable, serve answers the " +
    "standing probes over the extended graph (r10)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val arriving = docs.filter($"doc_id" % 10 === 3)
    val standing = docs.filter($"doc_id" % 10 =!= 3)
    val dups = graft.dedup.Dedup.minHashPortableAcross(arriving, standing)
      .select($"new_id").distinct()
    // the query's snapshot-served band gate must equal this inline one
    val (shRef, bRef) = graft.dedup.Dedup.refPortableTables(
      spark, sfDir, "e08_ref", $"doc_id" % 10 =!= 3)
    val snapDups = graft.dedup.Dedup
      .minHashPortableAcrossWith(arriving, shRef, bRef)
      .select($"new_id").distinct()
    assert(dups.exceptAll(snapDups).count() === 0L &&
      snapDups.exceptAll(dups).count() === 0L,
      "snapshot-served near-dup gate diverged from the inline derivation")
    val nArr = arriving.count(); val nDup = dups.count()
    assert(nDup > 0L, "near-dup gate vacuous: no arrival matched the corpus")
    assert(nDup < nArr, "near-dup gate degenerate: every arrival matched")
    val out = Similarity.indexMaintenanceQuery(spark, sfDir).cache()
    val probes = emb.filter($"vec_id" % 100 === 0).count()
    assert(out.select($"query_id").distinct().count() === probes)
    // well-formed per-query top-5
    val byQ = out.collect().groupBy(_.getLong(0))
    for ((q, rows) <- byQ) {
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length))
    }
    // the inserted survivors are genuinely reachable in the extended
    // graph: at least one serve round must be ABLE to surface them —
    // verified structurally on the adjacency (in-edges exist), since
    // top-5 membership depends on geometry
    val emb2 = graft.Tables.embeddings(spark, sfDir)
    val standingVecs = emb2.filter($"vec_id" % 10 =!= 3)
    val survivors = emb2.filter($"vec_id" % 10 === 3)
      .join(dups.withColumnRenamed("new_id", "vec_id"), Seq("vec_id"), "left_anti")
    val adj = Similarity.hnswBuild(Similarity.quantizedWithNorm(standingVecs))
      .localCheckpoint(true)
    val ext = Similarity.hnswInsert(standingVecs, adj, survivors)
    val reachable = ext.join(
      survivors.select($"vec_id".as("dst")), Seq("dst"), "left_semi")
      .select($"dst").distinct().count()
    assert(reachable > 0L, "no inserted vector is an in-edge target")
    out.unpersist()
  }

  test("incremental insert: invariants hold, unaffected edges preserved, " +
    "inserted vectors reachable with recall (r9)") {
    val old = emb.filter($"vec_id" % 10 =!= 3)
    val batch = emb.filter($"vec_id" % 10 === 3)
    val eOld = Similarity.quantizedWithNorm(old)
    val adj = Similarity.hnswBuild(eOld).localCheckpoint(true)
    val ext = Similarity.hnswInsert(old, adj, batch).cache()
    // structural invariants survive the insert (incl. re-pruned anchors)
    val deg = ext.groupBy($"layer", $"src").agg(count(lit(1)).as("d"))
      .agg(max($"d")).head().getLong(0)
    assert(deg <= Similarity.HnswR, s"max out-degree $deg exceeds R after insert")
    assert(ext.filter($"src" === $"dst").count() === 0L)
    assert(ext.distinct().count() === ext.count())
    // O(batch) locality: every non-anchor old edge is bit-identical
    val newIds = batch.select($"vec_id").distinct()
    val anchors = ext.join(newIds.toDF("src"), Seq("src"), "left_semi")
      .select($"dst".as("src")).distinct() // targets of new out-edges
    val oldUntouched = adj.join(anchors, Seq("src"), "left_anti")
    val extUntouched = ext
      .join(newIds.toDF("src"), Seq("src"), "left_anti")
      .join(anchors, Seq("src"), "left_anti")
    assert(extUntouched.exceptAll(oldUntouched).count() === 0L)
    assert(oldUntouched.exceptAll(extUntouched).count() === 0L)
    // reachability: inserted vectors appear as in-edge targets
    val reachable = ext.join(newIds.toDF("dst"), Seq("dst"), "left_semi")
      .select($"dst").distinct().count()
    assert(reachable > 0L, "no inserted vector is an in-edge target")
    // search quality over the EXTENDED corpus clears a floor: queries
    // drawn from the old residue, brute force over old ∪ batch as truth
    val eAll = Similarity.quantizedWithNorm(emb)
    val got = Similarity.hnswDescend(eAll, ext,
      eAll.filter($"vec_id" % 100 === 0).toDF("query_id", "qq", "qnorm"), 10)
      .select($"query_id", $"vec_id")
    val truth = Similarity.bruteForceTopK(emb, col("vec_id") % 100 === 0, k = 10)
      .select($"query_id", $"vec_id")
    val hits = got.join(truth, Seq("query_id", "vec_id")).count().toDouble
    val recall = hits / truth.count()
    assert(recall >= 0.7, f"post-insert recall@10 $recall%.2f below 0.7")
    ext.unpersist()
  }
}
