package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[RangeBinJoinRewrite]]: a pure interval join must re-plan to a binned
  * equi-join (when a bin width is configured) with identical results. */
class RangeBinJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 5L), (2L, 42L), (3L, 99L), (4L, 100L), (5L, -7L)).toDF("pid", "x")

  // intervals include: containing several points, empty (lo > hi),
  // negative-range (floor-div correctness), and adjacent boundaries
  private def intervals = Seq(
    (10L, 0L, 50L), (11L, 40L, 44L), (12L, 99L, 99L),
    (13L, 50L, 10L),   // empty: must not error, must match nothing
    (14L, -10L, -1L),  // negative range
    (15L, 100L, 200L)).toDF("iid", "lo", "hi")

  private def naive = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
    .select($"pid", $"iid")

  private def withRule[T](width: Long)(f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeBinJoinRewrite(spark)
    spark.conf.set("spark.graft.rangeJoin.binWidth", width.toString)
    try f finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("without the rule the interval join is a nested-loop product") {
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
  }

  test("rule re-plans to a binned equi-join, same pairs, no nested loop") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(expected === Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L), (4L, 15L), (5L, 14L)))
    withRule(16L) {
      val df = naive
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected) // exactly once per pair: a point has ONE bin
    }
  }

  test("no config, no rewrite; equi-keyed joins untouched") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeBinJoinRewrite(spark)
    try {
      // width unset -> rule is a no-op
      assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"))
    } finally spark.experimental.extraOptimizations = prev
    withRule(16L) {
      val df = points.join(intervals, $"pid" === $"iid" - 9L && $"x" >= $"lo" && $"x" <= $"hi")
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_range_bin"))
    }
  }

  test("autoBinWidth derives a width from the interval sample and rewrites") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeBinJoinRewrite(spark)
    spark.conf.set("spark.graft.rangeJoin.autoBinWidth", "true")
    try {
      RangeBinJoinRewrite.lastDerivedWidth.set(0L)
      val df = naive
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected)
      // non-empty interval lengths in the fixture: 50, 4, 0, 9, 100 -> median 9
      assert(RangeBinJoinRewrite.lastDerivedWidth.get() === 9L)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.autoBinWidth")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("no config at all: one actionable warning per session, plan untouched") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeBinJoinRewrite(spark)
    try {
      RangeBinJoinRewrite.resetWarned()
      assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"))
      assert(RangeBinJoinRewrite.hasWarned)
      // an equi-keyed join must NOT trip the warning
      RangeBinJoinRewrite.resetWarned()
      points.join(intervals, $"pid" === $"iid" - 9L && $"x" >= $"lo" && $"x" <= $"hi")
        .queryExecution.executedPlan
      assert(!RangeBinJoinRewrite.hasWarned)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("autoBinWidth with a planted outlier BEYOND the sample: width self-adjusts " +
    "from the exact full max span, no guard trip, no user intervention (r14)") {
    // 6 short intervals feed the 4-row sample median; the outlier sits
    // last, past the sample prefix — under the old sample-max floor this
    // query raise_error'd at execution time
    val p = (0L to 40L).map(x => (x, x)).toDF("pid", "x")
    val iv = ((1L to 6L).map(i => (i, i * 5L, i * 5L + 2L)) :+ (99L, 0L, 90000000L))
      .toDF("iid", "lo", "hi")
    def q = p.join(iv, $"x" >= $"lo" && $"x" <= $"hi").select($"pid", $"iid")
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeBinJoinRewrite(spark)
    spark.conf.set("spark.graft.rangeJoin.autoBinWidth", "true")
    spark.conf.set("spark.graft.rangeJoin.sampleRows", "4")
    spark.conf.set("spark.graft.rangeJoin.maxBins", "1000")
    try {
      RangeBinJoinRewrite.lastDerivedWidth.set(0L)
      val df = q
      assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected) // no raise_error, same rows
      // the derived width was floored by the OUTLIER's span, which the
      // 4-row sample never saw: 90000000/1000 + 1, not the sample median 2
      assert(RangeBinJoinRewrite.lastDerivedWidth.get() === 90001L)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.autoBinWidth")
      spark.conf.unset("spark.graft.rangeJoin.sampleRows")
      spark.conf.unset("spark.graft.rangeJoin.maxBins")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("an EXPLICIT width spanning more than maxBins bins still fails with " +
    "an actionable error (the user chose that width; auto mode never trips)") {
    withRule(1L) { // width 1 -> the wide interval would need ~1e9 bins
      val p = Seq((1L, 5L)).toDF("pid", "x")
      val iv = Seq((10L, 0L, 1000000000L)).toDF("iid", "lo", "hi")
      val e = intercept[Exception] {
        p.join(iv, $"x" >= $"lo" && $"x" <= $"hi").count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("graft range-bin join")))
    }
  }

  test("property: binned join equals naive join for random intervals and widths") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ptsGen = Gen.listOfN(30, Gen.chooseNum(-100L, 100L))
    val ivGen = Gen.listOfN(12, for {
      a <- Gen.chooseNum(-100L, 100L); len <- Gen.chooseNum(-5L, 40L)
    } yield (a, a + len)) // negative len -> empty interval
    val prop = Prop.forAll(ptsGen, ivGen, Gen.oneOf(1L, 7L, 16L, 1000L)) { (ps, ivs, w) =>
      val p = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("iid", "lo", "hi")
      // build the query FRESH on each side: a DataFrame caches its
      // QueryExecution, so reusing one would skip the rule entirely
      def q = p.join(iv, $"x" >= $"lo" && $"x" <= $"hi").select($"pid", $"iid")
      val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = withRule(w) {
        val df = q
        assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      expected == got
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
