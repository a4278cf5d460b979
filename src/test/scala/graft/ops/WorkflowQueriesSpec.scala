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
}
