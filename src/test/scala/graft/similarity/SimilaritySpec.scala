package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters around orthogonal axes + one lone vector.
  private def vec(axis: Int, eps: Float): Seq[Float] =
    (0 until 8).map(d => (if (d == axis) 1.0f else 0.0f) + (if (d == (axis + 1) % 8) eps else 0.0f))
  private def embeddings = Seq(
    (0L, vec(0, 0.00f)), (1L, vec(0, 0.01f)), (2L, vec(0, 0.02f)),
    (10L, vec(3, 0.00f)), (11L, vec(3, 0.01f)),
    (99L, vec(6, 0.40f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks same-cluster vectors first (B12)") {
    val top = Similarity.bruteForceTopK(embeddings, col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(top.map(_._1).toSeq === Seq(1L, 2L)) // cluster mates of 0
    assert(top.forall(_._2 > 0.99))
  }

  test("range search: τ cut keeps cluster mates, drops orthogonal clusters (B12, r7)") {
    val hits = Similarity.rangeSearch(embeddings, col("vec_id") === 0, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // probe 0: its own cluster {1, 2} clears 0.9; clusters 3/6 are ~orthogonal
    assert(hits.map(_._2).toSet === Set(1L, 2L))
    assert(hits.forall(h => h._1 === 0L && h._3 >= 0.9))
    // a looser τ admits nothing extra from orthogonal clusters
    val loose = Similarity.rangeSearch(embeddings, col("vec_id") === 0, 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(loose === Set(1L, 2L))
  }

  test("cosine kernel: exact integer quantization, orthogonal = 0") {
    val e = embeddings.select($"vec_id", Similarity.quantize($"embedding").as("q"))
    val a = e.filter($"vec_id" === 0).toDF("a", "qa")
    val b = e.filter($"vec_id" === 10).toDF("b", "qb")
    val c = a.crossJoin(b)
      .select(Similarity.cosineQ(col("qa"), col("qb"))).head().getDouble(0)
    assert(c === 0.0)
  }

  test("LSH buckets put cluster mates together; near-neighbor join finds them (B12)") {
    val pairs = Similarity.lshNearNeighbors(embeddings, numPlanes = 6, minCosine = 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same-bucket requirement is approximate, but identical-direction vectors
    // always share a bucket:
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L)) || pairs.contains((0L, 2L)))
    assert(pairs.contains((10L, 11L)))
  }

  test("LSH recall vs brute force on the cluster queries") {
    val bf = Similarity.bruteForceTopK(embeddings, col("vec_id") === 10, k = 1)
      .head()
    assert(bf.getLong(1) === 11L)
  }

  test("IVF top-k recalls the true nearest neighbor on clustered data (B12)") {
    // with cells ≈ corpus size every vector is near a centroid; the probe
    // of the query's own cluster must recover its cluster mates
    val ivf = Similarity.ivfTopK(embeddings, col("vec_id") === 0,
      numCells = 4, nprobe = 2, k = 2)
    val got = ivf.collect().map(_.getLong(1)).toSet
    val bf = Similarity.bruteForceTopK(embeddings, col("vec_id") === 0, k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(got.intersect(bf).nonEmpty, s"ivf=$got bf=$bf")
    assert(ivf.count() <= 2)
  }

  test("IVF recall vs nprobe: monotone improvement, boundary queries need multi-probe") {
    // four axis clusters of SIX vectors each (< k=10, so any bridge
    // query's true top-10 MUST span two clusters), plus three BRIDGE
    // queries between adjacent clusters — nprobe=1 structurally caps
    // recall at 6/10 and probing more cells must help.
    // Seeding is the portable md5(vec_id) ordering, so vec_ids are CHOSEN
    // to pin the seeds: each cluster's pure-axis member gets one of the 4
    // smallest-md5 ids (⇒ exactly one seed per cluster, cells == clusters)
    // and every other row gets a largest-md5 id (never seeds).
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val byMd5 = (0L until 4000L).sortBy(id => (md5hex(id.toString), id))
    val anchorIds = byMd5.take(4)          // the 4 seeds, one per cluster
    val poolIds = byMd5.reverseIterator    // largest md5 first — never seed
    val corpus = for (axis <- 0 until 4; i <- 0 until 6) yield {
      val v = (0 until 8).map(d =>
        (if (d == axis) 1.0f else 0.0f) + (if (d == axis + 4) 0.002f * i else 0.0f))
      ((if (i == 0) anchorIds(axis) else poolIds.next()), v)
    }
    val bridgeIds = (0 until 3).map(_ => poolIds.next())
    val bridges = for (a <- 0 until 3) yield {
      val v = (0 until 8).map(d =>
        (if (d == a) 0.74f else 0.0f) + (if (d == a + 1) 0.70f else 0.0f))
      (bridgeIds(a), v)
    }
    val df = (corpus ++ bridges).toDF("vec_id", "embedding")
    val qp = col("vec_id").isin(bridgeIds: _*)
    val bf = Similarity.bruteForceTopK(df, qp, k = 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(p: Int): Double = {
      val ivf = Similarity.ivfTopK(df, qp, numCells = 4, nprobe = p, k = 10)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      ivf.intersect(bf).size.toDouble / bf.size
    }
    val curve = Seq(1, 2, 4).map(recall)
    assert(curve.sliding(2).forall { case Seq(lo, hi) => lo <= hi + 1e-9 },
      s"recall not monotone in nprobe: $curve")
    assert(curve.last > curve.head, s"multi-probe never helped: $curve")
    assert(curve.last >= 0.9, s"full probe should recover ≥90%: $curve")
  }

  test("embedNearDupClusters groups planted near-identical vectors under the min id (B12)") {
    // 0,1,2 near-identical (cosine ≈1); 10,11 identical on another axis;
    // 99 alone — no edge, absent from the output (same contract as the
    // token-shingle cluster path)
    val out = Similarity.embedNearDupClusters(embeddings, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(0L) === 0L && out(1L) === 0L && out(2L) === 0L)
    assert(out(10L) === 10L && out(11L) === 10L)
    assert(!out.contains(99L))
  }

  test("kMeans partitions separable clusters deterministically (B12)") {
    // identical vectors within each cluster (hash-chosen seeds can land
    // anywhere; identical members can never split across distinct
    // centroids) + a shared component so inter-cluster sims are distinct
    // nonzero values, not all-tied zeros
    def cvec(axis: Int): Seq[Float] =
      (0 until 8).map(d => (if (d == axis) 1.0f else 0.0f) + (if (d == 7) 0.1f else 0.0f))
    val km = Seq(
      (0L, cvec(0)), (1L, cvec(0)), (2L, cvec(0)),
      (10L, cvec(3)), (11L, cvec(3)),
      (99L, cvec(5))).toDF("vec_id", "embedding")
    val out = Similarity.kMeans(km, k = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster mates share an id; the two axis clusters must not merge
    assert(out(0L) === out(1L) && out(1L) === out(2L))
    assert(out(10L) === out(11L))
    assert(out(0L) !== out(10L))
    // bit-stable: a second run gives the identical assignment
    val again = Similarity.kMeans(km, k = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  test("semDedup drops later near-identical cluster-mates with the min witness (B12)") {
    // two tight axis families (0,1,2 and 10,11) plus a loner: keep-first
    // drops 1,2 (witness 0) and 11 (witness 10); 0, 10, 99 survive
    def cvec(axis: Int): Seq[Float] =
      (0 until 8).map(d => (if (d == axis) 1.0f else 0.0f) + (if (d == 7) 0.1f else 0.0f))
    val df = Seq(
      (0L, cvec(0)), (1L, cvec(0)), (2L, cvec(0)),
      (10L, cvec(3)), (11L, cvec(3)),
      (99L, cvec(5))).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, k = 3, iters = 2, minCosine = 0.99)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 11L))
    assert(out(1L)._1 === 0L && out(2L)._1 === 0L && out(11L)._1 === 10L)
    // identical vectors: cosine with the witness is exactly 1.0
    out.values.foreach { case (_, c) => assert(math.abs(c - 1.0d) < 1e-12) }
    // keep-first is deterministic: a second run agrees
    val again = Similarity.semDedup(df, k = 3, iters = 2, minCosine = 0.99)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(again === out)
  }

  test("kMeans assigns zero-norm vectors deterministically instead of NULL clusters") {
    val km = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)),
      (9L, Seq(0.0001f, 0.0001f))) // quantizes to the zero vector
      .toDF("vec_id", "embedding")
    val out = Similarity.kMeans(km, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.getLong(1))).toMap
    assert(out.values.forall(!_._1), "no NULL cluster ids")
    assert(out(9L)._2 === out.values.map(_._2).min) // smallest-cid cell
  }

  test("PQ: codes compress, ADC top-k finds the planted cluster mates (B12)") {
    // 16-dim vectors, m=4 subspaces of 4 dims; four tight clusters of 12
    // + one planted query per cluster — PQ's top neighbors must be the
    // query's own cluster despite the 4-byte code compression
    def cvec(axis: Int, i: Int): Seq[Float] =
      (0 until 16).map(d => (if (d == axis * 4) 4.0f else 0.0f) +
        (if (d == axis * 4 + 1) i * 0.01f else 0.0f))
    val rows = for (axis <- 0 until 4; i <- 0 until 12)
      yield ((axis * 100 + i).toLong, cvec(axis, i))
    val df = rows.toDF("vec_id", "embedding")
    val isQuery = col("vec_id") % 100 === 0 // vec 0 of each cluster
    val top = Similarity.pqTopK(df, isQuery, m = 4, dsub = 4, ksub = 8,
        iters = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    for (axis <- 0 until 4) {
      val q = axis * 100L
      val mine = top.filter(_._1 == q)
      assert(mine.length === 5)
      // every returned neighbor is a cluster mate of the query
      assert(mine.forall(t => t._2 / 100 == axis),
        s"query $q leaked neighbors: ${mine.mkString(",")}")
    }
    // deterministic: a second run returns the identical ranking
    val again = Similarity.pqTopK(df, isQuery, m = 4, dsub = 4, ksub = 8,
        iters = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(top.toSeq === again.toSeq)
  }

  test("IVF-PQ: probed-cell ADC finds cluster mates; full probe recovers flat-PQ recall (B12)") {
    // same four tight clusters as the PQ test — wide enough cell budget
    // that each cluster lands in its own coarse cell
    def cvec(axis: Int, i: Int): Seq[Float] =
      (0 until 16).map(d => (if (d == axis * 4) 4.0f else 0.0f) +
        (if (d == axis * 4 + 1) i * 0.01f else 0.0f))
    val rows = for (axis <- 0 until 4; i <- 0 until 12)
      yield ((axis * 100 + i).toLong, cvec(axis, i))
    val df = rows.toDF("vec_id", "embedding")
    val isQuery = col("vec_id") % 100 === 0
    def run(nprobe: Int) = Similarity.ivfPqTopK(df, isQuery, numCells = 8,
        nprobe = nprobe, m = 4, dsub = 4, ksub = 8, iters = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val top = run(2)
    for (axis <- 0 until 4) {
      val q = axis * 100L
      val mine = top.filter(_._1 == q)
      // a partial probe sees only the vectors of its 2 cells (how many
      // of the 11 mates that is depends on how the md5-ordered seed
      // sample fragments the cluster) — but everything it does return
      // must be an in-cluster mate, ranked by residual-PQ ADC
      assert(mine.nonEmpty, s"query $q returned no rows")
      assert(mine.forall(t => t._2 / 100 == axis),
        s"query $q leaked neighbors: ${mine.mkString(",")}")
    }
    // the FULL probe is recall-complete: exactly k rows, all cluster mates
    val full = run(8)
    for (axis <- 0 until 4) {
      val q = axis * 100L
      val mine = full.filter(_._1 == q)
      assert(mine.length === 5, s"query $q returned ${mine.length} rows at full probe")
      assert(mine.forall(t => t._2 / 100 == axis),
        s"query $q leaked neighbors at full probe: ${mine.mkString(",")}")
    }
    // widening nprobe only adds candidates: the best ADC distance per
    // query is non-increasing from nprobe=1 to a full probe
    val bestNarrow = run(1).filter(_._4 == 1).map(t => t._1 -> t._3).toMap
    val bestFull = run(8).filter(_._4 == 1).map(t => t._1 -> t._3).toMap
    bestFull.foreach { case (q, d) =>
      assert(d <= bestNarrow(q), s"query $q: full-probe best $d > nprobe=1 best ${bestNarrow(q)}")
    }
    // deterministic run-to-run
    assert(run(2).toSeq === top.toSeq)
  }

  test("hybridSearch: lexical recall proposes, semantic rerank orders (B12)") {
    // query doc 0 shares TWO rare tokens with doc 1 but only ONE with
    // doc 2; "common" appears in all four docs and is pruned by maxDf=3.
    // doc 3 shares nothing rare -> never a candidate.
    val docs = Seq(
      (0L, "alpha beta gamma common"),
      (1L, "alpha beta delta common"),
      (2L, "alpha epsilon zeta common"),
      (3L, "eta theta iota common")
    ).toDF("doc_id", "text")
    // embeddings invert the lexical order: doc 2 is nearly parallel to
    // the query, doc 1 is a weak mix -> rerank must put 2 first
    val emb = Seq(
      (0L, vec(0, 0.00f)),
      (1L, (0 until 8).map(d => if (d == 0) 0.3f else if (d == 4) 1.0f else 0.0f)),
      (2L, vec(0, 0.01f)),
      (3L, vec(6, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.hybridSearch(docs, emb, col("doc_id") % 100 === 0,
        lexK = 10, k = 5, maxDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(out.map(_._1).forall(_ == 0L))
    assert(out.map(_._2).toSet === Set(1L, 2L), s"candidates: ${out.mkString(",")}")
    // lexical stage: alpha df=3, beta df=2 -> doc1 = 333333+500000, doc2 = 333333
    val lex = out.map(t => t._2 -> t._3).toMap
    assert(lex(1L) === 833333L && lex(2L) === 333333L)
    // semantic rerank overrides lexical order: doc 2 (cosine ~1) first
    assert(out.sortBy(_._5).map(_._2).toSeq === Seq(2L, 1L))
    assert(lex(1L) > lex(2L) && out.find(_._2 == 2L).get._4 > out.find(_._2 == 1L).get._4)
    // the lexical cut is honored: lexK=1 keeps only the lexical winner
    val cut = Similarity.hybridSearch(docs, emb, col("doc_id") % 100 === 0,
        lexK = 1, k = 5, maxDf = 3).collect().map(_.getLong(1))
    assert(cut.toSeq === Seq(1L))
  }

  test("knnClassify: prediction == driver-recomputed majority of brute top-k (B12)") {
    val out = Similarity.knnClassify(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4))).toMap
    assert(out.nonEmpty)
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val top = Similarity.bruteForceTopK(
        graft.Tables.embeddings(spark, sfDir), col("vec_id") % 100 === 0)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for ((q, nbrs) <- top.groupBy(_._1)) {
      val votes = nbrs.map(n => labels(n._2)).groupBy(identity)
        .map { case (l, v) => (l, v.length) }
      val (expLabel, expVotes) = votes.toSeq.minBy { case (l, n) => (-n, l) }
      val (trueL, pred, nv, correct) = out(q)
      assert(pred === expLabel && nv === expVotes.toLong, s"query $q")
      assert(trueL === labels(q))
      assert(correct === (if (pred == trueL) 1 else 0))
    }
  }

  test("inertia: n-scaled closed form equals brute Σ over the assignment (B12, r7)") {
    val out = Similarity.inertiaOf(embeddings, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // brute-force recompute: same assignment, per-cluster n·Σ|x|² − |Σx|²
    val asg = Similarity.kMeans(embeddings, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = embeddings.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(v => math.round(v * 1000).toLong)).toMap
    asg.groupBy(_._2).foreach { case (c, members) =>
      val qs = members.keys.toSeq.map(vecs)
      val n = qs.length.toLong
      val sq2 = qs.map(q => q.map(x => x * x).sum).sum
      val sv = qs.transpose.map(_.sum)
      val expect = n * sq2 - sv.map(x => x * x).sum
      assert(out(c) === ((n, expect)), s"cluster $c")
      assert(expect >= 0L) // Σ|x−μ|² is nonnegative, scaled or not
    }
  }

  test("SQ8: quantized ranking keeps cluster mates first; constant dims harmless (B12, r7)") {
    // the shared two-cluster fixture: probe 0's nearest under ANY
    // monotone distance are its cluster mates 1, 2
    val top = Similarity.sqTopK(embeddings, col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(top.map(_._1).toSeq === Seq(1L, 2L))
    // distances are monotone with the true ordering on this fixture
    assert(top(0)._2 <= top(1)._2)
    // every dimension except the active axes is CONSTANT zero across the
    // corpus (rng = 0) — the encode must not divide by zero and absent
    // axes contribute nothing; determinism across runs
    val again = Similarity.sqTopK(embeddings, col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(again.toSeq === top.toSeq)
  }

  test("MMR: diversity demotes the near-duplicate of an earlier pick (B12, r7)") {
    // probe 0 on axis 0. Candidates: 1 and 2 near-identical tilted
    // vectors (rel ≈ .95/.94, mutual sim ≈ 1), 10 moderately relevant
    // but DIVERSE (rel .6, sim to 1 ≈ .57), 11 orthogonal filler.
    // Pure relevance ranks (1, 2, 10); MMR must pick 1, then 10 —
    // the twin 2's penalty (≈1 against pick 1) buries it to rank 3.
    def mix(ws: (Int, Float)*): Seq[Float] = {
      val m = ws.toMap
      (0 until 8).map(d => m.getOrElse(d, 0.0f))
    }
    val df = Seq(
      (0L, mix(0 -> 1.0f)),
      (1L, mix(0 -> 0.90f, 1 -> 0.30f)),
      (2L, mix(0 -> 0.89f, 1 -> 0.31f)),
      (10L, mix(0 -> 0.6f, 3 -> 0.8f)),
      (11L, mix(3 -> 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(df, col("vec_id") === 0, nCand = 4, k = 3)
      .collect().map(r => (r.getInt(2), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._1).toSeq === Seq(1, 2, 3)) // dense ranks
    assert(out.map(_._2).toSeq === Seq(1L, 10L, 2L)) // relevance alone would give 1, 2, 10
    // rank-1 carries its relevance as the (2x-scaled) mmr score
    assert(out.head._3 === out.head._4)
    // later picks are penalized: mmr strictly below relevance
    out.tail.foreach { case (_, _, rel, mmr) => assert(mmr < rel) }
    // greedy is prefix-stable: k=2 equals the first two rows of k=3
    val k2 = Similarity.mmrSelect(df, col("vec_id") === 0, nCand = 4, k = 2)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    assert(k2.toSeq === out.take(2).map(t => (t._1, t._2)).toSeq)
  }

  test("filtered top-k: predicate bounds candidates, not the ranking (B12, r7)") {
    import org.apache.spark.sql.functions.col
    // probe 0 (label 1): its geometric nearest (1, 2) carry label 2 and
    // MUST NOT appear; the only same-label vectors are the orthogonal
    // 10/11 — a post-filtered plain top-k would instead return nothing
    // once (1, 2) were discarded
    val labeled = Seq(
      (0L, vec(0, 0.00f), 1), (1L, vec(0, 0.01f), 2), (2L, vec(0, 0.02f), 2),
      (10L, vec(3, 0.00f), 1), (11L, vec(3, 0.01f), 1), (99L, vec(6, 0.40f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.filteredTopK(labeled, col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(2), r.getInt(4)))
    assert(out.map(_._1).toSet === Set(10L, 11L))
    assert(out.map(_._2).toSeq === Seq(1, 2))
    // every emitted candidate shares the probe's label by construction
    val all = Similarity.filteredTopK(labeled, col("vec_id") === 0, k = 10)
      .collect().map(_.getLong(2)).toSet
    assert(all === Set(10L, 11L)) // label-1 corpus minus the probe itself
  }

  test("silhouette: brute recompute from the assignment and rebuilt centroids (B12, r7)") {
    val out = Similarity.silhouetteOf(embeddings, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val asg = Similarity.kMeans(embeddings, 2, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = embeddings.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(v => math.round(v * 1000).toLong)).toMap
    // rebuild integer centroids exactly as the chain does (rounded mean)
    val cents = asg.groupBy(_._2).map { case (c, members) =>
      val qs = members.keys.toSeq.map(vecs)
      c -> qs.transpose.map(ds =>
        math.round(ds.sum.toDouble / ds.length)).toSeq
    }
    def d2(q: Seq[Long], c: Seq[Long]): Long =
      q.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    for ((v, (cl, aSq, bSq, s)) <- out) {
      assert(cl === asg(v))
      assert(aSq === d2(vecs(v), cents(cl)))
      val expB = cents.collect { case (c, cq) if c != cl => d2(vecs(v), cq) }.min
      assert(bSq === expB)
      val expS = if (math.max(aSq, bSq) == 0) 0.0
        else (bSq - aSq).toDouble / math.max(aSq, bSq).toDouble
      assert(s === expS)
      assert(s >= -1.0 && s <= 1.0)
    }
    // tight orthogonal clusters separate well: mean silhouette is high
    val mean = out.values.map(_._4).sum / out.size
    assert(mean > 0.5, s"mean silhouette $mean unexpectedly low")
  }

  test("dbscan roles: core/border/noise and min-label attachment (B12, r7)") {
    // path 1-2-3 (2 is core at minPts=2, 1/3 border), triangle 10-11-12
    // (all core, rep 10), isolated edge 20-21 (degree 1, no core
    // neighbor → noise), lone 99 → noise
    val universe = (Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 99L))
      .toDF("vec_id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("a", "b")
    val out = Similarity.dbscanOnEdges(universe, edges, minPts = 2).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(2L) === (("core", 2L)))   // isolated core labels itself
    assert(out(1L) === (("border", 2L)) && out(3L) === (("border", 2L)))
    assert(out(10L) === (("core", 10L)) && out(11L) === (("core", 10L))
      && out(12L) === (("core", 10L)))
    assert(out(20L) === (("noise", -1L)) && out(21L) === (("noise", -1L)))
    assert(out(99L) === (("noise", -1L)))
    // border attaches to the MINIMUM core label when several qualify:
    // at minPts=3 only 12 (deg 3 via 50) and 30 (deg 3 via 50) are core —
    // separate single-vertex clusters — and bridge vertex 50 sees both,
    // so it must take the smaller label 12
    val u2 = Seq(10L, 11L, 12L, 30L, 31L, 32L, 50L).toDF("vec_id")
    val e2 = Seq((10L, 11L), (10L, 12L), (11L, 12L), (30L, 31L), (30L, 32L),
      (31L, 32L), (12L, 50L), (30L, 50L)).toDF("a", "b")
    val out2 = Similarity.dbscanOnEdges(u2, e2, minPts = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out2(12L) === (("core", 12L)) && out2(30L) === (("core", 30L)))
    assert(out2(50L) === (("border", 12L)))
    assert(out2(10L) === (("border", 12L)) && out2(31L) === (("border", 30L)))
  }

  test("dbscan gate regime is mixed on the real corpus (non-vacuous)") {
    val roles = Similarity.dbscanQuery(spark, "/root/testdata/sf0.01")
      .groupBy(col("role")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(roles.getOrElse("core", 0L) > 0L)
    assert(roles.getOrElse("border", 0L) > 0L)
    assert(roles.getOrElse("noise", 0L) > 0L)
  }
}
