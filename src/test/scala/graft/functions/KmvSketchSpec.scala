package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: k > distinct equals COUNT(DISTINCT), duplicates ignored") {
    // 10k rows over 137 distinct values, shuffled across partitions
    val xs = (1 to 10000).map(i => s"v${(i * 7919) % 137}")
    val kmv = udaf(new KmvDistinctAgg(256))
    val est = xs.toDF("v").repartition(8).agg(kmv($"v")).head().getLong(0)
    assert(est === 137L)
  }

  test("partition-invariant even in the lossy regime (set-property buffer)") {
    val xs = (1 to 20000).map(i => s"item${(i * 104729) % 9973}")
    val kmv = udaf(new KmvDistinctAgg(64))
    val a = xs.toDF("v").repartition(3).agg(kmv($"v")).head().getLong(0)
    val b = xs.toDF("v").repartition(17).agg(kmv($"v")).head().getLong(0)
    val c = xs.toDF("v").coalesce(1).agg(kmv($"v")).head().getLong(0)
    assert(a === b && b === c)
  }

  test("lossy regime: estimate within 3 standard errors of the truth") {
    val distinct = 9973
    val xs = (1 to 20000).map(i => s"item${(i * 104729) % distinct}")
    val k = 256
    val kmv = udaf(new KmvDistinctAgg(k))
    val est = xs.toDF("v").repartition(8).agg(kmv($"v")).head().getLong(0)
    val bound = (3.0 / math.sqrt(k - 2) * distinct).toLong // ~19%
    assert(math.abs(est - distinct) <= bound,
      s"estimate $est off true $distinct by more than $bound")
  }

  test("nulls are skipped and empty input reports zero") {
    val kmv = udaf(new KmvDistinctAgg(16))
    val withNulls = Seq("a", null, "b", null, "a").toDF("v")
    assert(withNulls.agg(kmv($"v")).head().getLong(0) === 2L)
    assert(Seq.empty[String].toDF("v").agg(kmv($"v")).head().getLong(0) === 0L)
  }

  // ---- KmvEstimateAgg: the portable-hash twin (r14, VERDICT r13 #2) ----

  private def portableKmv(k: Int) =
    udaf(new KmvEstimateAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[java.lang.Long]())
  private def h($v: org.apache.spark.sql.Column) =
    Md5Prefix(concat(lit("kmv:"), $v.cast("string")), 12)

  test("portable: exact below k, nulls skipped, empty input zero") {
    val kmv = portableKmv(256)
    val xs = (1 to 10000).map(i => s"v${(i * 7919) % 137}")
    assert(xs.toDF("v").repartition(8).agg(kmv(h($"v"))).head().getLong(0) === 137L)
    val withNulls = Seq("a", null, "b", null, "a").toDF("v")
    assert(withNulls.agg(kmv(h($"v"))).head().getLong(0) === 2L)
    assert(Seq.empty[String].toDF("v").agg(kmv(h($"v"))).head().getLong(0) === 0L)
  }

  test("portable: partition-invariant lossy estimate within 3 SE, matches the integer formula") {
    val distinct = 9973
    val xs = (1 to 20000).map(i => s"item${(i * 104729) % distinct}")
    val k = 256
    val kmv = portableKmv(k)
    val a = xs.toDF("v").repartition(3).agg(kmv(h($"v"))).head().getLong(0)
    val b = xs.toDF("v").repartition(17).agg(kmv(h($"v"))).head().getLong(0)
    assert(a === b)
    val bound = (3.0 / math.sqrt(k - 2) * distinct).toLong
    assert(math.abs(a - distinct) <= bound, s"estimate $a off true $distinct by more than $bound")
    // the finish IS the replayable integer formula: (k-1)*2^48 / kth over
    // the bottom-k distinct hashes — recompute it independently
    val kth = xs.map(v => Md5PrefixImpl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("kmv:" + v), 6))
      .distinct.sorted.take(k).last
    assert(a === (k - 1).toLong * (1L << 48) / math.max(kth, 1L))
  }
}
