package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Misra-Gries guarantees the DuckDB gate cannot see: the lossy
  * regime's survival + error bounds under arbitrary partitioning, and the
  * exact regime the b05_heavy_hitters query relies on. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: capacity >= distinct reproduces exact counts") {
    val items = Seq.tabulate(1000)(i => s"item_${i % 37}")
    val hh = udaf(new HeavyHittersAgg(64))
    val got = items.toDF("x").repartition(7)
      .agg(hh($"x").as("hh")).select(explode($"hh").as("e"))
      .select($"e._1".as("item"), $"e._2".as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == exact)
  }

  test("lossy regime: planted heavy hitter survives with bounded error, any partitioning") {
    // n = 10_000: one item at 30% + uniform tail of 500 distinct; any item
    // above n/(cap+1) must survive with est within n/(cap+1) of truth
    val heavy = Seq.fill(3000)("HEAVY")
    val tail = Seq.tabulate(7000)(i => s"t_${i % 500}")
    val all = heavy ++ tail
    val n = all.size
    val cap = 100
    val exact = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val hh = udaf(new HeavyHittersAgg(cap))
    for (parts <- Seq(1, 4, 13)) {
      val got = all.toDF("x").repartition(parts)
        .agg(hh($"x").as("hh")).select(explode($"hh").as("e"))
        .select($"e._1".as("item"), $"e._2".as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= cap, s"buffer exceeded capacity at parts=$parts")
      assert(got.contains("HEAVY"), s"heavy hitter evicted at parts=$parts")
      val bound = n.toDouble / (cap + 1)
      got.foreach { case (item, est) =>
        val t = exact(item)
        assert(est <= t && est >= t - bound - 1,
          s"estimate $est for $item outside [${t - bound - 1}, $t] at parts=$parts")
      }
    }
  }

  test("nulls carry no frequency; finish orders by (count desc, item asc)") {
    val hh = udaf(new HeavyHittersAgg(8))
    val rows = Seq(Some("b"), Some("a"), None, Some("b"), None, Some("c"), Some("b"), Some("a"))
    val out = rows.toDF("x")
      .agg(hh($"x").as("hh")).select($"hh").as[Seq[(String, Long)]].head()
    assert(out == Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }
}
