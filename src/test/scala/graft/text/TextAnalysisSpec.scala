package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: boilerplate doc fails, diverse doc passes (B13)") {
    val spam = (("buy now" + " ") * 20).trim                 // one bigram dominates
    val diverse = (1 to 40).map(i => s"tok$i").mkString(" ") // all bigrams unique
    val df = Seq((1L, spam), (2L, diverse)).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionOn(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(5), r.getInt(6))).toMap
    val (spamUniq, spamTop, spamPass) = rows(1L)
    val (divUniq, divTop, divPass) = rows(2L)
    assert(spamPass === 0 && spamTop > 0.4 && spamUniq < 0.1)
    assert(divPass === 1 && divTop < 0.05 && divUniq === 1.0)
  }

  test("repetition: single-token docs are excluded (no bigrams)") {
    val df = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    assert(graft.text.TextAnalysis.repetitionOn(df).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }
}
