package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the e02 RAG pipeline and its BM25 stage (exactness
  * is oracle-gated; these pin the CONTRACTS on real testdata). */
class RagPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: ranks contiguous, scores positive and non-increasing, docs match a term") {
    val out = graft.text.TextAnalysis.bm25Rank(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getInt(0))
    for ((_, rows) <- byQ) {
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.toSeq == (1 to rows.length).toSeq, "ranks must be a contiguous prefix")
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(scores.forall(_ > 0))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
    }
    // every ranked doc contains at least one of its query's terms
    val terms = graft.text.TextAnalysis.Bm25Queries.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val texts = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    for (r <- out) {
      val toks = texts(r.getLong(2)).split(" ").toSet
      assert(terms(r.getInt(0)).exists(toks), s"doc ${r.getLong(2)} matches no term of query ${r.getInt(0)}")
    }
  }

  test("rag: no kept doc is a 3-gram near-dup of a higher-ranked retrieved doc; budget holds") {
    val retrieved = graft.text.TextAnalysis.bm25Rank(spark, sfDir, RagPipeline.RetrieveK)
      .select($"query_id", $"rank", $"doc_id").as[(Int, Int, Long)].collect()
    val kept = RagPipeline.ragRetrieval(spark, sfDir).collect()
    assert(kept.nonEmpty)
    val texts = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def grams(id: Long): Set[String] = {
      val t = texts(id).split(" ")
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    def nearDup(a: Long, b: Long): Boolean = {
      val (ga, gb) = (grams(a), grams(b))
      val inter = (ga & gb).size
      ga.nonEmpty && gb.nonEmpty && 2 * inter >= ga.size + gb.size - inter
    }
    val rankOf = retrieved.map(r => (r._1, r._3) -> r._2).toMap
    for (row <- kept) {
      val q = row.getInt(0); val doc = row.getLong(2)
      val myRank = rankOf((q, doc))
      val higher = retrieved.filter(r => r._1 == q && r._2 < myRank && r._3 != doc)
      assert(!higher.exists(h => nearDup(h._3, doc)),
        s"kept doc $doc of query $q is a near-dup of a higher-ranked retrieved doc")
    }
    // packing invariants: contiguous final ranks, exact running sums, budget
    for ((q, rows0) <- kept.groupBy(_.getInt(0))) {
      val rows = rows0.sortBy(_.getInt(1))
      assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length).toSeq)
      var cum = 0L
      for (r <- rows) {
        cum += r.getLong(4)
        assert(r.getLong(5) == cum, s"cum_toks mismatch for query $q")
      }
      assert(cum <= RagPipeline.TokenBudget)
    }
  }
}
