package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PretrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  // one planted doc per drop reason + clean survivors; ids avoid %50==0
  // except the bench doc (100) and the contaminated-probe pair
  private val base = "the quick brown fox jumps over the lazy dog while the calm river flows past the old mill"
  private def docs = Seq(
    // survives every stage
    (1L, base, "en"),
    // canonical duplicate of 1 (case/punct/whitespace) — dropped at stage 3
    (2L, "The  quick brown fox, jumps over the lazy dog while the calm river flows past the old mill!", "en"),
    // byte-exact duplicate of 1 — dropped at stage 3
    (3L, base, "en"),
    // near-dup of 1 (one appended token, 3-gram Jaccard 18/20) — stage 4
    (4L, base + " tonight", "en"),
    // wrong language — stage 2
    (5L, base, "de"),
    // too short — stage 1
    (6L, "tiny doc here", "en"),
    // avg token length out of range (single-char tokens) — stage 1
    (7L, "a b c d e f g h i j", "en"),
    // bench doc (id % 50 == 0): never ships, defines the eval grams
    (100L, "held out evaluation benchmark prompt alpha beta gamma delta epsilon", "en"),
    // shares an 8-gram with the bench doc — dropped at stage 5
    (8L, "held out evaluation benchmark prompt alpha beta gamma plus unrelated trailing content here", "en"),
    // clean independent survivor
    (9L, "completely unrelated second document about ships and harbors and long voyages across the sea", "en")
  ).toDF("doc_id", "text", "lang")

  test("every stage drops exactly its planted doc; survivors get portable shards (E01)") {
    val out = PretrainPipeline.curateDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(out.map(_._1).toSet === Set(1L, 9L))
    // n_tokens is the real token count
    assert(out.find(_._1 == 1L).get._2 === base.split(" ").length.toLong)
    // shard ids land in range; positions are 1-based and contiguous per shard
    assert(out.forall(t => t._3 >= 0 && t._3 < 8))
    out.groupBy(_._3).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq === (1 to g.size).toSeq)
    }
  }

  test("near-dup stage keeps the SMALLER id of a verified pair (E01)") {
    // drop the exact-dup plants so stage 4 is the only dedup in play
    val only = docs.filter($"doc_id".isin(1L, 4L, 9L))
    val out = PretrainPipeline.curateDocs(only).collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 9L)) // 4 is the larger id of the (1,4) pair
  }

  test("pipeline output is partitioning-invariant (E01)") {
    val a = PretrainPipeline.curateDocs(docs).collect().map(_.toSeq).toSeq
    val b = PretrainPipeline.curateDocs(docs.repartition(7)).collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
