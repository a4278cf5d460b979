package graft.ops

import graft.SparkSpec

/** Structural pins for the iterative w-family (exactness is oracle-gated;
  * these pin graph-theoretic properties the hash alone doesn't name). */
class WorkflowQueriesSpec extends SparkSpec {

  test("personalized pagerank: support is exactly the seeds' 3-hop ancestor closure") {
    // graph: u -> u div 2 (u >= 2), outdeg 1 everywhere; seeds: node % 10 == 0.
    // with 3 iterations and positive teleport, a node holds mass iff it is
    // a seed or an ancestor of a seed within 3 halvings — and integer
    // truncation never zeroes a live path (contribution = (r*85) div 100
    // with outdeg 1). Uniform-teleport pagerank has FULL support, so this
    // also pins that the seed restriction actually took effect.
    val out = WorkflowQueries.personalizedPageRank(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = out.keySet
    val seeds = nodes.filter(_ % 10 == 0)
    assert(seeds.nonEmpty, "fixture must contain seed nodes")
    val expected = seeds.flatMap(s => Seq(s, s >> 1, s >> 2, s >> 3)).filter(nodes)
    val support = out.filter(_._2 > 0).keySet
    assert(support === expected)
    // seeds carry the teleport floor; strict ancestors carry less mass
    // than 1.0 (they only receive decayed flow)
    assert(seeds.forall(s => out(s) >= 150000000L))
    assert((expected -- seeds).forall(n => out(n) < 1000000000L))
  }

  test("rater kappa: hand 2x2 table, perfect agreement, degenerate marginals (W9)") {
    import spark.implicits._
    def rows(pairs: Seq[(String, String)]) = pairs.zipWithIndex.map {
      case ((va, vb), i) => (i.toLong, "r1", "r2", va, vb)
    }.toDF("item_id", "rater_a", "rater_b", "verdict_a", "verdict_b")
    // hand fixture: n=100, agree=70 (45 app/app + 25 rej/rej), marginals
    // a+=60, b+=60 → E = 60·60 + 40·40 = 5200; κ = (7000−5200)/(10⁴−5200)
    val mixed = rows(
      Seq.fill(45)(("approve", "approve")) ++ Seq.fill(15)(("approve", "reject")) ++
      Seq.fill(15)(("reject", "approve")) ++ Seq.fill(25)(("reject", "reject")))
    val k = WorkflowQueries.kappaOf(mixed).collect().head
    assert(k.getAs[Long]("kappa_num") === 1800L)
    assert(k.getAs[Long]("kappa_den") === 4800L)
    assert(k.getAs[Double]("kappa") === 1800.0 / 4800.0)
    // perfect mixed-marginal agreement → κ exactly 1
    val perfect = rows(Seq.fill(30)(("approve", "approve")) ++
      Seq.fill(20)(("reject", "reject")))
    assert(WorkflowQueries.kappaOf(perfect).collect().head
      .getAs[Double]("kappa") === 1.0)
    // both raters approve everything: chance == observed == all, den=0 →
    // κ pinned 0 instead of 0/0
    val degen = rows(Seq.fill(10)(("approve", "approve")))
    assert(WorkflowQueries.kappaOf(degen).collect().head
      .getAs[Double]("kappa") === 0.0)
  }
}
