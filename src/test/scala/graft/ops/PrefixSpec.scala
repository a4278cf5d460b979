package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-level bin+carry prefix device (r9, VERDICT r8 #6).
  * Equivalence contract: run_v must equal the naive single-window
  * running sum `sum(v).over(partitionBy(part).orderBy(order))` — pinned
  * here on planted frames covering every call-site shape: multi-part,
  * global (empty part), multi-order-column, multi-value, negative
  * values (the concurrency net deltas), empty bins in the axis. */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  private def naiveRun(df: org.apache.spark.sql.DataFrame, part: Seq[String],
      order: Seq[String], v: String) = {
    val w = (if (part.isEmpty) Window.orderBy(order.map(col): _*)
             else Window.partitionBy(part.map(col): _*).orderBy(order.map(col): _*))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(s"naive_$v", sum(col(v)).over(w))
  }

  test("partitioned, two values: run == naive one-window prefix (ks shape)") {
    val df = (1 to 200).map { i =>
      (s"p${i % 3}", i.toLong, (i % 7).toLong, ((i * 13) % 5 - 2).toLong)
    }.toDF("prio", "cents", "ca", "cb").withColumn("bin", expr("cents div 25"))
    val got = Prefix.prefixSum2L(df, Seq("prio"), "bin", Seq($"cents"), Seq("ca", "cb"))
    val want = naiveRun(naiveRun(df, Seq("prio"), Seq("cents"), "ca"),
      Seq("prio"), Seq("cents"), "cb")
    val j = got.join(want, Seq("prio", "cents", "ca", "cb", "bin"))
    assert(j.filter($"run_ca" =!= $"naive_ca" || $"run_cb" =!= $"naive_cb").count() === 0L)
    assert(j.count() === 200L)
  }

  test("global axis, negative values: run and carry (concurrency shape)") {
    val df = (1 to 100).map { i =>
      (i.toLong, if (i % 2 == 0) 1L else -1L)
    }.toDF("ts", "net").withColumn("day", expr("ts div 10"))
    val got = Prefix.prefixSum2L(df, Seq.empty, "day", Seq($"ts"), Seq("net"))
    val want = naiveRun(df, Seq.empty, Seq("ts"), "net")
    val j = got.join(want, Seq("ts", "net", "day"))
    assert(j.filter($"run_net" =!= $"naive_net").count() === 0L)
    // carry = the value at each day's start minus the day's own running
    // contribution: first row of each day has run − net == carry
    val firsts = got.withColumn("rn",
      row_number().over(Window.partitionBy($"day").orderBy($"ts")))
      .filter($"rn" === 1)
    assert(firsts.filter($"run_net" - $"net" =!= $"carry_net").count() === 0L)
  }

  test("multi-column order with ties broken by second key (pps shape)") {
    val df = (1 to 150).map { i =>
      ((i % 12).toLong, i.toLong, (i % 9 + 1).toLong)
    }.toDF("h", "doc_id", "w").withColumn("bin", expr("h div 4"))
    val got = Prefix.prefixSum2L(df, Seq.empty, "bin", Seq($"h", $"doc_id"), Seq("w"))
    val want = naiveRun(df, Seq.empty, Seq("h", "doc_id"), "w")
    val j = got.join(want, Seq("h", "doc_id", "w", "bin"))
    assert(j.filter($"run_w" =!= $"naive_w").count() === 0L)
  }

  test("sparse bins: axis gaps do not break the carry") {
    // bins 0, 5, 9 only — the carry window must sum PRESENT bins
    val df = Seq((0L, 1L), (1L, 2L), (50L, 3L), (51L, 4L), (90L, 5L))
      .toDF("x", "v").withColumn("bin", expr("x div 10"))
    val got = Prefix.prefixSum2L(df, Seq.empty, "bin", Seq($"x"), Seq("v"))
      .orderBy($"x").select($"run_v").as[Long].collect()
    assert(got.toSeq === Seq(1L, 3L, 6L, 10L, 15L))
  }

  test("partition invariance: same result at 3 and 16 shuffle partitions") {
    val df = (1 to 300).map(i => (s"g${i % 2}", i.toLong, (i % 11).toLong))
      .toDF("g", "x", "v").withColumn("bin", expr("x div 30"))
    def run(parts: String) = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Prefix.prefixSum2L(df.repartition(parts.toInt), Seq("g"), "bin",
          Seq($"x"), Seq("v"))
        .orderBy($"g", $"x").select($"g", $"x", $"run_v", $"carry_v")
        .collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    assert(run("3") === run("16"))
  }
}
