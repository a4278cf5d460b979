package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HammingJoinRewrite]]: a naive `bit_count(a ^ b) <= k` join must
  * re-plan to pigeonhole chunked equi-joins with identical results. */
class HammingJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // id1/id2 differ in chunk 0 only (three equal chunks — the
  // first-equal-chunk branch conditions must still emit the pair once);
  // id3 is 3 bits from id1 spread over three chunks; id4 matches nothing;
  // id5 shares id2's sketch (distinct rows, both must surface)
  private def sigs = Seq(
    (1L, 0x0000000000000000L),
    (2L, 0x0000000000000003L),
    (3L, 0x0001000100010000L),
    (4L, 0xFFFFFFFFFFFFFFFFL),
    (5L, 0x0000000000000003L)).toDF("id", "sig")

  private def naive = {
    val a = sigs.toDF("a", "sa")
    val b = sigs.toDF("b", "sb")
    a.join(b, bit_count($"sa".bitwiseXOR($"sb")) <= 3 && $"a" < $"b")
      .select($"a", $"b")
  }

  private def withRule[T](f: => T): T = withRuleAt("0")(f)

  /** Install the rule with the self-selection threshold pinned to
    * `threshold` (the spec fixtures sit far below the production
    * crossover default, so most tests force the gate open with "0"). */
  private def withRuleAt[T](threshold: String)(f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    val prevThr = spark.conf.getOption(HammingJoinRewrite.MinBytesProductKey)
    spark.experimental.extraOptimizations = prev :+ HammingJoinRewrite(spark)
    spark.conf.set(HammingJoinRewrite.MinBytesProductKey, threshold)
    try f finally {
      spark.experimental.extraOptimizations = prev
      prevThr match {
        case Some(v) => spark.conf.set(HammingJoinRewrite.MinBytesProductKey, v)
        case None => spark.conf.unset(HammingJoinRewrite.MinBytesProductKey)
      }
    }
  }

  test("self-selection (r14): BNL below the estimated-size threshold, " +
    "chunked equi-join union at and above it, same results") {
    def q = {
      val a = sigs.toDF("a", "sa")
      val b = sigs.toDF("b", "sb")
      a.join(b, bit_count($"sa".bitwiseXOR($"sb")) <= 3 && $"a" < $"b")
        .select($"a", $"b")
    }
    // the plan's OWN estimate of this join's size product
    val product = {
      val j = q.queryExecution.optimizedPlan
        .collectFirst { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
      j.left.stats.sizeInBytes * j.right.stats.sizeInBytes
    }
    assert(product > 0)
    val expected = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // threshold just ABOVE the product: the rule declines, BNL survives
    withRuleAt((product * 2).toString) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
        plan.take(1500))
    }
    // threshold just BELOW: the rule fires and results are unchanged
    withRuleAt((product / 2).toString) {
      val df = q
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan.take(1500))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq === expected)
    }
  }

  test("without the rule the hamming join is a nested-loop product") {
    val plan = naive.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
  }

  test("rule re-plans to chunked equi-joins, same pairs, no nested loop") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(expected === Seq((1L, 2L), (1L, 3L), (1L, 5L), (2L, 5L)))
    withRule {
      val df = naive
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got === expected) // exactly once per pair — no duplicate emits
    }
  }

  test("joins that already have an equi key are left alone") {
    withRule {
      val a = sigs.toDF("a", "sa")
      val b = sigs.toDF("b", "sb")
      val df = a.join(b, $"a" === $"b" && bit_count($"sa".bitwiseXOR($"sb")) <= 3)
      assert(!df.queryExecution.optimizedPlan.toString.contains("Union"))
      assert(df.count() === 5)
    }
  }

  test("property: rewrite equals naive join for random sketches and k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // clustered sketches: a handful of centers, most sigs a few flips away,
    // so every k has real matches near the chunk boundaries
    val center = Gen.oneOf(0L, -1L, 0x0123456789ABCDEFL)
    val sigGen = for {
      c <- center
      nFlips <- Gen.chooseNum(0, 9)
      flips <- Gen.listOfN(nFlips, Gen.chooseNum(0, 63))
    } yield flips.foldLeft(c)((v, b) => v ^ (1L << b))
    val prop = Prop.forAll(Gen.listOfN(24, sigGen), Gen.chooseNum(0, 7)) { (ss, k) =>
      val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sig")
      val a = df.toDF("a", "sa"); val b = df.toDF("b", "sb")
      // build the query FRESH on each side: a DataFrame caches its
      // QueryExecution, so reusing one would skip the rule entirely
      def q = a.join(b, bit_count($"sa".bitwiseXOR($"sb")) <= k && $"a" < $"b")
        .select($"a", $"b")
      val naivePairs = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val rulePairs = withRule {
        val rq = q
        assert(!rq.queryExecution.executedPlan.toString.contains("NestedLoop"))
        rq.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      }
      naivePairs == rulePairs
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("declared b12_hamming_join_sql goes THROUGH the rule: chunked " +
    "equi-join union, no nested loop, matches the rule-free join") {
    // the driver-gated query's exact SQL, with the rule active the same
    // way the query activates it — assert the re-planned shape on the
    // un-checkpointed frame (the declared query materializes eagerly, so
    // its own plan is the checkpoint scan)
    graft.dedup.Dedup.simHash63Portable(
        graft.Tables.documents(spark, sfDir))
      .createOrReplaceTempView("graft_hamming_sketches")
    val sql = """
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(a.sim ^ b.sim) AS INT) AS hamming
      FROM graft_hamming_sketches a JOIN graft_hamming_sketches b
        ON a.doc_id < b.doc_id AND bit_count(a.sim ^ b.sim) <= 3"""
    val noRule = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    withRule {
      val df = spark.sql(sql)
      val optimized = df.queryExecution.optimizedPlan.toString
      val physical = df.queryExecution.executedPlan.toString
      assert(optimized.contains("Union"), optimized.take(2000))
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"), physical.take(2000))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      assert(got === noRule)
    }
    // and the declared query itself (checkpointed) returns the same pairs
    val declared = graft.dedup.Dedup.hammingJoinSqlQuery(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(declared === noRule)
  }

  test("k = 0 degenerates to a single equality join") {
    withRule {
      val a = sigs.toDF("a", "sa")
      val b = sigs.toDF("b", "sb")
      val df = a.join(b, bit_count($"sa".bitwiseXOR($"sb")) <= 0 && $"a" < $"b")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      val got = df.select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((2L, 5L)))
    }
  }
}
