package graft.ops

import graft.SparkSpec

/** Planted-outcome gates for the e03 incremental-ingest composition (the
  * e03_incremental_ingest oracle row covers the data-derived corpus;
  * this pins one arrival per funnel bucket, canonical-equality exact
  * matching, and batch-internal first-wins). */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 29).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val fresh = (100 to 130).map(i => s"new$i").mkString(" ")
  private val fresh2 = (200 to 230).map(i => s"z$i").mkString(" ")
  private val refOther = (300 to 330).map(i => s"w$i").mkString(" ")

  test("each arrival lands in exactly one funnel bucket; counts per source exact") {
    val reference = Seq((1001L, base), (1002L, refOther)).toDF("doc_id", "text")
    val arrivals = Seq(
      (1L, "x y z", "alpha"),          // quality fail: 3 tokens
      (2L, base + "!", "alpha"),       // canonical-exact dup of ref 1001
      (3L, nearDup, "alpha"),          // near-dup of ref 1001
      (4L, fresh, "beta"),             // inserted (batch-first of the pair)
      (5L, fresh, "beta"),             // batch-internal exact dup of 4
      (6L, fresh2, "beta"))            // inserted
      .toDF("doc_id", "text", "source")
    val got = IngestPipeline.ingestReport(arrivals, reference).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got === Map(
      "alpha" -> ((3L, 1L, 1L, 1L, 0L)),
      "beta" -> ((3L, 0L, 1L, 0L, 2L))))
    // row conservation: every arrival in exactly one bucket
    got.values.foreach { case (n, a, b, c, d) => assert(n === a + b + c + d) }
  }

  test("an empty arrival batch produces an empty report, not a failure") {
    val reference = Seq((1001L, base)).toDF("doc_id", "text")
    val arrivals = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(IngestPipeline.ingestReport(arrivals, reference).collect().isEmpty)
  }
}
