package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** b05_kmv_setops: KMV set-operation estimates (Beyer et al. 2007) —
  * exact-regime equality to true set algebra, lossy-regime error
  * bounds, and full partition invariance of the pair estimates. */
class KmvSetOpsSpec extends SparkSpec {
  import spark.implicits._

  private def items(pairs: Seq[(String, Int)]) =
    pairs.map { case (g, v) => (g, v.toString) }.toDF("g", "v")

  test("exact regime: union/intersection/jaccard equal true set algebra") {
    // |A|=30 (1..30), |B|=30 (21..50): union 50, intersection 10
    val xs = (1 to 30).map(("a", _)) ++ (21 to 50).map(("b", _))
    val row = Relational.kmvSetOpsOf(items(xs), k = 256).head()
    assert(row.getAs[Long]("est_union") === 50L)
    assert(row.getAs[Long]("est_intersection") === 10L)
    assert(row.getAs[Long]("jaccard_ppb") === (10L * 1000000000L) / 50L)
  }

  test("lossy regime: union and jaccard within 3 standard errors") {
    // |A|=|B|=5000, overlap 2500 → union 7500, jaccard 1/3; k=256 lossy
    val k = 256
    val xs = (1 to 5000).map(("a", _)) ++ (2501 to 7500).map(("b", _))
    val row = Relational.kmvSetOpsOf(items(xs).repartition(8), k).head()
    val union = row.getAs[Long]("est_union")
    val bound = (3.0 / math.sqrt(k - 2) * 7500).toLong // ~19%
    assert(math.abs(union - 7500L) <= bound, s"union $union off 7500 > $bound")
    val jac = row.getAs[Long]("jaccard_ppb") / 1e9
    // Jaccard from k merged samples: binomial SE √(p(1−p)/k) ≈ 0.029
    assert(math.abs(jac - 1.0 / 3) <= 3 * math.sqrt(2.0 / 9 / k),
      s"jaccard $jac off 1/3")
    val inter = row.getAs[Long]("est_intersection")
    assert(math.abs(inter - 2500L) <= 2500L / 2, s"intersection $inter off 2500")
  }

  test("property: sketch == brute bottom-k under any split/merge order") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val agg = new graft.functions.KmvSetSketchAgg(16)
    val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 48))
    val cuts = Gen.chooseNum(1, 5)
    val prop = Prop.forAll(gen, cuts) { (xs: List[Long], n: Int) =>
      // fold in arbitrary chunkings, then merge — mergeable-summary
      // contract: result == bottom-k of the whole set
      val parts = xs.grouped(math.max(1, xs.length / n)).toList
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val want = xs.distinct.sorted.take(16)
      agg.finish(merged) == want
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("partition-invariant in the lossy regime (set-property sketches)") {
    val xs = (1 to 4000).map(("a", _)) ++ (3000 to 9000).map(("b", _)) ++
      (500 to 1500).map(("c", _))
    val a = Relational.kmvSetOpsOf(items(xs).repartition(3), 64).collect().toSeq
    val b = Relational.kmvSetOpsOf(items(xs).repartition(17), 64).collect().toSeq
    val c = Relational.kmvSetOpsOf(items(xs).coalesce(1), 64).collect().toSeq
    assert(a === b && b === c)
    assert(a.length === 3) // pairs (a,b) (a,c) (b,c)
  }
}
