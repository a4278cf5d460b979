package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Every materialize-once snapshot seam introduced in r8 must be
  * SEMANTICALLY INVISIBLE: the gated query (snapshot-backed index) and
  * the inline build must produce bit-identical rows, or a drifted
  * builder would silently serve a stale/divergent index behind a green
  * plan. One collect-compare per seam at smoke scale. */
class SnapshotParitySpec extends SparkSpec {

  private def rows(df: DataFrame) = df.collect().map(_.toSeq).toSeq

  test("hnsw: snapshot-served layer adjacencies == inline construction") {
    val snap = SparkEntry.queries("b12_hnsw_topk")(spark, sfDir)
    val inline = graft.similarity.Similarity.hnswTopK(
      Tables.embeddings(spark, sfDir), col("vec_id") % 100 === 0)
    assert(rows(snap) === rows(inline))
  }

  test("pq: snapshot-served codebook/codes == inline training") {
    val snap = SparkEntry.queries("b12_pq_topk")(spark, sfDir)
    val inline = graft.similarity.Similarity.pqTopK(
      Tables.embeddings(spark, sfDir), col("vec_id") % 100 === 0)
    assert(rows(snap) === rows(inline))
  }

  test("ivfpq: snapshot-served cells/codebook/codes == inline training") {
    val snap = SparkEntry.queries("b12_ivfpq_topk")(spark, sfDir)
    val inline = graft.similarity.Similarity.ivfPqTopK(
      Tables.embeddings(spark, sfDir), col("vec_id") % 100 === 0)
    assert(rows(snap) === rows(inline))
  }

  test("minhash self-dedup: snapshot-served shingle/band index == inline") {
    val snap = SparkEntry.queries("b12_minhash_portable")(spark, sfDir)
    val inline = graft.dedup.Dedup.minHashPortable(Tables.documents(spark, sfDir))
    assert(rows(snap) === rows(inline))
  }

  test("cross-corpus near-dedup: snapshot-served reference index == inline") {
    val snap = SparkEntry.queries("b12_cross_portable")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val inline = graft.dedup.Dedup.minHashPortableAcross(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0))
    assert(rows(snap) === rows(inline))
  }

  test("e03 ingest: snapshot-served reference index == inline derivation") {
    val snap = SparkEntry.queries("e03_incremental_ingest")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val inline = graft.ops.IngestPipeline.ingestReport(
      docs.filter(col("doc_id") % 7 === 3), docs.filter(col("doc_id") % 7 =!= 3))
    assert(rows(snap) === rows(inline))
  }

  test("xxhash self-dedup: snapshot-served shingle/band index == inline") {
    val snap = SparkEntry.queries("b12_minhash_lsh")(spark, sfDir)
    val inline = graft.dedup.Dedup.minHashNearDup(Tables.documents(spark, sfDir))
    assert(rows(snap) === rows(inline))
  }

  test("xxhash cross-corpus: snapshot-served reference index == inline") {
    val snap = SparkEntry.queries("b12_cross_neardup")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val inline = graft.dedup.Dedup.minHashNearDupAcross(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0))
    assert(rows(snap) === rows(inline))
  }

  test("bpe encode: snapshot-served merge table == inline training") {
    val snap = SparkEntry.queries("b13_bpe_encode")(spark, sfDir)
    val inline = graft.text.TextAnalysis.bpeEncodeOf(Tables.documents(spark, sfDir))
    assert(rows(snap) === rows(inline))
  }

  test("incremental index maintenance: extend-by-batch == full rebuild, " +
    "bit-for-bit (shingle + band tables, r9)") {
    // the add-batch seam (VERDICT r8 #8): per-doc index rows mean the
    // O(batch) append must equal the O(corpus) rebuild EXACTLY — any
    // drift (a batch-dependent constant, a re-hash) breaks ingest
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val sortedSh = (df: DataFrame) => rows(df.orderBy(df.columns.map(col): _*))
    assert(sortedSh(Dedup.extendShingleIndex(Dedup.shingleHashes(corpus, 3), batch, 3))
      === sortedSh(Dedup.shingleHashes(docs, 3)))
    assert(sortedSh(Dedup.extendBandIndex(
        Dedup.lshBands(Dedup.minHashSignaturesRow(corpus, 3)), batch, 3))
      === sortedSh(Dedup.lshBands(Dedup.minHashSignaturesRow(docs, 3))))
    // and the extended index SERVES: near-dup candidates over the
    // extended band table equal the rebuilt table's candidates
    val extended = Dedup.extendBandIndex(
      Dedup.lshBands(Dedup.minHashSignaturesRow(corpus, 3)), batch, 3)
    val rebuilt = Dedup.lshBands(Dedup.minHashSignaturesRow(docs, 3))
    val pairsOf = (b: DataFrame) => rows(Dedup.candidatePairs(b).orderBy(col("a"), col("b")))
    assert(pairsOf(extended) === pairsOf(rebuilt))
  }
}
