package graft.ops

import graft.SparkSpec

/** One planted document per exclusion reason, plus the cap — the
  * PretrainPipelineSpec discipline applied to the e05 eval builder.
  * Source residues: md5("src0") % 100 = 90 (eval pool),
  * md5("src1") % 100 = 22 (train pool) — the b15_group_split contract. */
class EvalPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => f"$prefix$i%02d").mkString(" ")

  test("e05: quality, source leakage, contamination and the cap each exclude (E5, r7)") {
    val shared = words("dup", 10) // 8-gram overlap between docs 3 and 4
    val docs = (Seq(
      (1L, words("alpha", 10), "en", "src0"),   // clean eval doc → selected
      (3L, shared, "en", "src0"),               // contaminated by train twin 4
      (4L, shared, "en", "src1"),               // train source: never in output
      (5L, "bad doc", "en", "src0"),            // quality fail (2 tokens)
      (6L, words("frdoc", 12), "fr", "src0")    // second language survives
    ) ++ (10L to 23L).map(i => (i, words(s"fill$i", 9), "en", "src0")))
      .toDF("doc_id", "text", "lang", "source")
    val out = EvalPipeline.evalSuite(docs, capPerLang = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val ids = out.map(_._3).toSet
    assert(ids.contains(1L) && ids.contains(6L))
    assert(!ids.contains(3L), "contaminated eval doc leaked")
    assert(!ids.contains(4L), "train-source doc leaked into the eval suite")
    assert(!ids.contains(5L), "quality-failed doc leaked")
    // en pool has 15 clean candidates (1 + 14 fillers); the cap keeps 10
    val en = out.filter(_._1 == "en")
    assert(en.length === 10)
    assert(en.map(_._2).toSeq === (1 to 10)) // dense slots
    assert(out.filter(_._1 == "fr").map(_._3).toSeq === Seq(6L))
    // deterministic: selection is a property of the doc ids alone
    val again = EvalPipeline.evalSuite(docs, capPerLang = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(again.toSeq === out.toSeq)
  }

  test("e05: declared gate is language-stratified and within budget at sf0.001") {
    val out = EvalPipeline.evalSuiteQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length <= EvalPipeline.CapPerLang, s"$lang over budget")
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length), s"$lang slots not dense")
    }
  }
}
