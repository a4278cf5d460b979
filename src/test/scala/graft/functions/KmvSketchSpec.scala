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
}
