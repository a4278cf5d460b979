package graft.ops

import graft.SparkSpec

/** The b09_bitmap_ops oracle replays the bitmap algebra itself, so a
  * semantic bug in the word layout would pass both engines — this pins
  * the bitmap counts against brute-force driver-side set algebra. */
class BitmapOpsSpec extends SparkSpec {

  test("bitmap set algebra equals brute-force distinct-set intersection (B9, r7)") {
    val out = Relational.bitmapOpsQuery(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val sets = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_suppkey").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    out.foreach { case (a, b, shared, na, nb, j) =>
      assert(a < b) // each unordered pair exactly once
      assert(na === sets(a).size.toLong, s"n_a($a)")
      assert(nb === sets(b).size.toLong, s"n_b($b)")
      assert(shared === (sets(a) & sets(b)).size.toLong, s"shared($a,$b)")
      assert(j === shared * 1000000000L / (na + nb - shared))
    }
    // every unordered flag pair is present
    val flags = sets.keys.toSeq.sorted
    assert(out.length === flags.combinations(2).size)
  }
}
