package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[AsOfJoinExec]]: the custom operator must match the declarative
  * left-join + row_number formulation of "latest right row at or before the
  * left time", pick tie rows deterministically, and plan as a co-partitioned
  * merge (no nested loop, no window buffer). */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 50L),
    (4L, 20L, 100L), (5L, 30L, 100L), (6L, 10L, 200L)
  ).toDF("lid", "k", "t")

  private def rightDf = Seq(
    (101L, 10L, 90L), (102L, 10L, 200L), (103L, 10L, 150L),
    (104L, 20L, 101L), (105L, 40L, 10L), (106L, 10L, 200L)
  ).toDF("rid", "ck", "rt")

  private def run(l: DataFrame, r: DataFrame): DataFrame =
    AsOfJoin.asofJoin(l, r, Seq("k" -> "ck"), "t", "rt", tiebreak = Seq("rid"))

  test("latest-at-or-before semantics, deterministic ties, nulls on no match") {
    val got = run(leftDf, rightDf)
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      1L -> Some(101L),  // k=10 t=100: clicks at 90 qualify; 150/200 too late
      2L -> Some(106L),  // t=200: rids 102 and 106 tie at rt=200 -> max rid wins
      3L -> None,        // t=50: earliest right for k=10 is 90
      4L -> None,        // k=20 t=100: right at 101 is after
      5L -> None,        // k=30: no right rows
      6L -> Some(106L))) // same key+time as lid=2 -> same match
  }

  test("plan is the custom exec with co-partitioned exchanges, no nested loop") {
    val df = run(leftDf, rightDf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"))
  }

  test("disjoint column names are required") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(leftDf, leftDf, Seq("k" -> "k"), "t", "t")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("null right times are excluded from matching (SQL comparison semantics)") {
    val l = Seq((1L, 10L, 100L), (2L, 20L, 100L)).toDF("lid", "k", "t")
    val r = Seq(
      (101L, 10L, Option.empty[Long]), // null time: must never match
      (102L, 10L, Some(50L)),
      (103L, 20L, Option.empty[Long])  // null time is the ONLY k=20 row
    ).toDF("rid", "ck", "rt")
    val got = run(l, r).select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> Some(102L), 2L -> None))
  }

  test("empty right side null-pads every left row") {
    val l = Seq((1L, 10L, 100L), (2L, 20L, 100L)).toDF("lid", "k", "t")
    val r = Seq.empty[(Long, Long, Long)].toDF("rid", "ck", "rt")
    val got = run(l, r).select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> None, 2L -> None))
  }

  test("exactly two exchanges (one per side) and SQLMetrics populated") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = run(leftDf, rightDf)
      // collect() executes df's OWN QueryExecution (a write plans a fresh
      // one whose metric instances this test couldn't see)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size === 2, plan.toString)
      val execs = plan.collect { case a: AsOfJoinExec => a }
      assert(execs.size === 1)
      // 6 left rows stream out; 3 of them found a match (lids 1, 2, 6)
      assert(execs.head.metrics("numOutputRows").value === 6L)
      assert(execs.head.metrics("numMatchedRows").value === 3L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("null keys group and match each other (shuffle semantics)") {
    val l = Seq((1L, Some(10L), 100L), (2L, None, 100L))
      .toDF("lid", "k", "t")
    val r = Seq((101L, Some(10L), 50L), (102L, Option.empty[Long], 60L))
      .toDF("rid", "ck", "rt")
    val got = run(l, r).select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> Some(101L), 2L -> Some(102L)))
  }

  test("matches the declarative formulation on real events data") {
    val ev = graft.Tables.events(spark, sfDir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"), $"event_id".as("click_event"))
    val w = Window.partitionBy($"event_id").orderBy($"click_ts".desc, $"click_event".desc)
    val expected = p.join(c, $"user_id" === $"c_user" && $"click_ts" <= $"ts", "left")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"event_id", $"click_event").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(expected.exists(_._2.isDefined)) // the data exercises the match path
    val got = AsOfJoin.joinAsOfExec(spark, sfDir)
      .select($"event_id", $"click_event").as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("property: exec equals declarative plan for random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen = Gen.listOfN(60, for {
      k <- Gen.chooseNum(0L, 5L); t <- Gen.chooseNum(0L, 30L)
    } yield (k, t))
    val prop = Prop.forAll(rowsGen, rowsGen) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val r = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("rid", "ck", "rt")
      val w = Window.partitionBy($"lid").orderBy($"rt".desc, $"rid".desc)
      val expected = l.join(r, $"k" === $"ck" && $"rt" <= $"t", "left")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"lid", $"rid").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      val got = run(l, r).select($"lid", $"rid").as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
