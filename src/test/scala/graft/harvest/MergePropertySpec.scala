package graft.harvest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the merge operators (SURVEY §5.3). */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val asOf0 = lit("2026-01-01 00:00:00").cast("timestamp")
  private val asOf1 = lit("2026-02-01 00:00:00").cast("timestamp")

  private val uriGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.chooseNum(0, 30).map(i => s"https://v.example/t/$i"))

  private def check(prop: Prop, trials: Int = 6): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  private def termRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("id", "uri").collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("property: merge(merge(E,B),B) == merge(E,B) (idempotence modulo updated_at)") {
    check(Prop.forAll(uriGen, uriGen) { (existing, batch) =>
      val e0 = Merge.upsertTerms(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.terms),
        existing.toDF("uri"), asOf0)
      val once = Merge.upsertTerms(e0, batch.toDF("uri"), asOf1)
      val twice = Merge.upsertTerms(once, batch.toDF("uri"), asOf1)
      termRows(once) == termRows(twice)
    })
  }

  test("property: batch order / partitioning never changes assigned ids") {
    check(Prop.forAll(uriGen, Gen.chooseNum(1, 6)) { (uris, parts) =>
      val df = uris.toDF("uri").distinct()
      val a = Merge.assignIds(df, Seq("uri"), 1)
      val b = Merge.assignIds(df.repartition(parts).orderBy(rand(uris.length)), Seq("uri"), 1)
      termRows(a) == termRows(b)
    })
  }

  test("property: ids are dense 1..n and unique") {
    check(Prop.forAll(uriGen) { uris =>
      val df = uris.toDF("uri").distinct()
      val n = df.count()
      val ids = Merge.assignIds(df, Seq("uri"), 1).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      ids == (1L to n).toSeq
    })
  }

  test("property: insert-if-absent is idempotent and union-monotone") {
    val fieldGen = Gen.listOfN(10, for {
      t <- Gen.chooseNum(1L, 4L); u <- Gen.oneOf("u1", "u2"); v <- Gen.chooseNum(0, 6)
    } yield (t, u, "skos:x", s"v$v"))
    check(Prop.forAll(fieldGen) { rows =>
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.termFields)
      val inc = rows.toDF("term_id", "field_uri", "field_term", "original_value")
      val once = Merge.insertIfAbsent(empty, inc, asOf0)
      val twice = Merge.insertIfAbsent(once, inc, asOf1)
      once.count() == twice.count() &&
        once.count() == inc.dropDuplicates("term_id", "field_uri", "original_value").count()
    })
  }
}
