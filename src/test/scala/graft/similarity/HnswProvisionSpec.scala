package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r11 (VERDICT r10 #4): the layer budget self-provisions from the
  * corpus census — layers = max(floor, ⌈log₁₆(n/16)⌉) — instead of the
  * r10 arrangement where the root-cell guard could only WARN that a
  * fixed budget had been outgrown and demand a manual redeploy.
  *
  * A corpus that actually outgrows the production floor of 4 needs
  * >16⁴·16 ≈ 1.05M vectors — not buildable in a unit test — so the pin
  * splits into (a) the provisioning FORMULA at the real boundaries, and
  * (b) an end-to-end build at spec scale where an explicitly
  * under-provisioned override fires the guard while the self-provision
  * keeps it silent and produces the extra layer: the same mechanism,
  * exercised at a corpus size the suite can afford. */
class HnswProvisionSpec extends SparkSpec {
  import spark.implicits._

  test("provisionLayers: the VERDICT formula at its boundaries, floored at 4") {
    // gate regime: everything below ~1.05M provisions to the floor
    assert(Similarity.provisionLayers(1L) === 4)
    assert(Similarity.provisionLayers(1000L) === 4)
    assert(Similarity.provisionLayers(1_000_000L) === 4)
    // past 16^4·16 the budget grows: ceil(log16(n/16))
    assert(Similarity.provisionLayers(2_000_000L) === 5)
    assert(Similarity.provisionLayers(16L * (1L << 40)) > 5) // deep corpus keeps growing
    // monotone in n (spot lattice)
    val ns = Seq(1L, 100L, 10_000L, 1_000_000L, 2_000_000L, 100_000_000L, 16L * (1L << 40))
    val ps = ns.map(Similarity.provisionLayers(_))
    assert(ps === ps.sorted)
    // expected top-layer population n/16^(L-1) stays O(16·16)=bounded:
    // the root-cell linearity argument the guard protects
    ns.foreach { n =>
      val l = Similarity.provisionLayers(n)
      assert(n.toDouble / math.pow(16.0, (l - 1).toDouble) <= 16.0 * 16.0 + 1,
        s"n=$n provisioned $l layers, top layer too fat")
    }
  }

  test("build self-provisions: forced under-provision fires the root-cell " +
    "guard, the auto path stays silent on the same corpus") {
    // ~1k tiny vectors: enough that a 1-layer build's root cell (=all n)
    // blows the 8·48=384 guard, cheap enough for a unit test
    val n = 1000
    val vecs = (0 until n).map(i =>
      (i.toLong, Seq(1f, ((i * 37) % 97).toFloat / 97f, ((i * 61) % 89).toFloat / 89f,
        ((i * 13) % 83).toFloat / 83f))) // leading 1: no zero vector, norm > 0
      .toDF("vec_id", "embedding")
    val e = Similarity.quantizedWithNorm(vecs)
    Similarity.rootCellWarnings.set(0L)
    // control: force 1 layer — everything lands in the root cell
    Similarity.hnswBuild(e, layersOverride = Some(1)).count()
    assert(Similarity.rootCellWarnings.get() > 0L,
      "under-provisioned control build did not fire the guard")
    // auto path on the same corpus: provisioned to the floor, guard silent
    Similarity.rootCellWarnings.set(0L)
    val adj = Similarity.hnswBuild(e).localCheckpoint(true)
    assert(Similarity.rootCellWarnings.get() === 0L,
      "self-provisioned build fired the root-cell guard")
    // the hierarchy really got its upper layers (the md5 draw populates
    // lvl ≥ 1 with ~n/16 ≈ 60 vertices at this n)
    val upper = adj.filter(col("layer") >= 1).count()
    assert(upper > 0L, "self-provisioned build produced no upper layers")
    // and search derives the same geometry from the adjacency it descends
    val (layerN, counts) = Similarity.layerCensus(adj)
    assert(layerN === 4 && counts.keys.max <= 3)
  }

  test("provisioned layer count is the census authority when known (r12, " +
    "ADVICE): a singleton top layer's zero adjacency rows no longer cap " +
    "the entry-level draw below the build's") {
    // the ADVICE scenario in miniature: a build provisioned to 6 layers
    // whose layer-5 drew exactly ONE member emits NO layer-5 rows (a
    // singleton cell has no in-cell neighbors), so the row-tag fallback
    // reads 5 layers — the serving paths now pass the provisioned count
    // they already derive for the snapshot key, and the census honors it
    val adj = Seq((0, 1L, 2L), (0, 2L, 1L), (4, 1L, 2L), (4, 2L, 1L))
      .toDF("layer", "src", "dst")
    val (fallbackN, _) = Similarity.layerCensus(adj)
    assert(fallbackN === 5, "fixture must exhibit the undercount")
    val (authorityN, counts) = Similarity.layerCensus(adj, Some(6))
    assert(authorityN === 6)
    assert(counts === Map(0 -> 2L, 4 -> 2L)) // liveness map unchanged
    // provisionLayers really exceeds the floor past ~16^4·16 vectors —
    // the regime where the authority matters
    assert(Similarity.provisionLayers(2L * 1000 * 1000) === 5)
  }
}
