package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator signature equals a direct per-group computation and is partition-invariant") {
    val agg = udaf(new MinHashAgg(16))
    val rows = Seq((1L, 100L), (1L, 200L), (1L, 300L), (2L, 100L), (2L, 999L))
    val df = rows.toDF("doc_id", "hbase")
    def sigs(d: org.apache.spark.sql.DataFrame) =
      d.groupBy($"doc_id").agg(agg($"hbase").as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = sigs(df)
    val b = sigs(df.repartition(5))
    assert(a === b) // merge order irrelevant
    assert(a(1L).length === 16)
    // identical input multisets → identical signatures
    val c = sigs(Seq((3L, 300L), (3L, 100L), (3L, 200L)).toDF("doc_id", "hbase"))
    assert(c(3L) === a(1L))
    assert(a(1L) !== a(2L))
    // signatures are element-wise minima: doc2 shares hash 100 with doc1
    val solo = sigs(Seq((9L, 100L)).toDF("doc_id", "hbase"))
    assert(a(2L).zip(solo(9L)).forall { case (x, y) => x <= y })
  }
}
