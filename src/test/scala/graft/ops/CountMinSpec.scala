package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees the hash gate cannot express (b05_countmin):
  * the gate proves both engines compute the SAME counter matrix; these pin
  * the matrix's estimator properties — one-sided error, planted-heavy
  * survival, exactness when the geometry dwarfs the key set. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("countMin query: estimates never undercount; most keys exact (B5)") {
    val rows = Relational.countMin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS undercounted key ${r.get(0)}: est=$est exact=$exact")
    }
    // 4×512 cells over ~100 distinct suppliers: collisions are rare, so
    // the estimator is exact for the bulk of the probes (not a guarantee,
    // but a fixed deterministic fact of this hash family + geometry —
    // a regression here means the hash or geometry changed)
    val exactHits = rows.count(r => r.getLong(1) == r.getLong(2))
    assert(exactHits >= rows.length * 9 / 10,
      s"only $exactHits/${rows.length} probes exact")
  }

  test("countMin core: planted heavy key survives a tight 4x64 sketch") {
    val items = (Seq.fill(1000)(7L) ++ (100L until 300L)).toDF("key")
      .select($"key".cast("string").as("k"))
    val probes = (Seq(7L) ++ (100L until 300L)).toDF("key")
    val est = Relational.countMinEstimates(items, probes, d = 4, w = 64L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided error everywhere, even under heavy collision pressure
    assert(est(7L) >= 1000L)
    (100L until 300L).foreach(k => assert(est(k) >= 1L, s"undercount at $k"))
    // CMS error bound: overcount ≤ εn with ε = e/w, n = 1200, at the
    // standard 1 − e^(−d) confidence; with d=4 rows a blown bound on a
    // fixed input is effectively a broken hash, so assert it outright
    val n = 1200L
    val bound = (math.E / 64 * n).toLong + 1
    assert(est(7L) <= 1000L + bound, s"est(hot)=${est(7L)} exceeds +$bound")
  }

  test("countMin core: wide sketch over few keys is collision-free exact") {
    val items = (0L until 20L).flatMap(k => Seq.fill((k + 1).toInt)(k)).toDF("key")
      .select($"key".cast("string").as("k"))
    val probes = (0L until 25L).toDF("key") // incl. 5 absent keys
    val est = Relational.countMinEstimates(items, probes, d = 4, w = 4096L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach(k => assert(est(k) === k + 1, s"key $k"))
    // absent keys: min over 4 huge sparse rows finds an empty cell → 0
    (20L until 25L).foreach(k => assert(est(k) === 0L, s"absent key $k"))
  }
}
