package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Relational2Spec extends SparkSpec {
  import spark.implicits._

  test("globalShuffle: deterministic order, dense per-shard positions (B15)") {
    val a = Relational2.globalShuffle(spark, sfDir).collect()
    val b = Relational2.globalShuffle(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq) // engine-independent md5 order → same every run
    // every shard's positions are exactly 1..n — no gaps, no global window
    val byShard = a.groupBy(_.getInt(2))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length))
    }
    assert(byShard.size > 1) // the corpus actually spreads across shards
    // output order is the shuffled order, not doc_id order
    assert(a.map(_.getLong(0)).toSeq !== a.map(_.getLong(0)).sorted.toSeq)
  }

  test("globalShuffle: shard assignment is balanced (chi-square over residues)") {
    // fixture-level: the 8 shard counts must look uniform
    val counts = Relational2.globalShuffle(spark, sfDir).groupBy($"shard_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.size === 8, s"all shards populated: $counts")
    val n = counts.values.sum.toDouble
    val exp = n / 8
    val chi2 = counts.values.map(c => (c - exp) * (c - exp) / exp).sum
    assert(chi2 < 24.3, s"chi2=$chi2 over $counts") // χ²(7df) 99.9% quantile
    // scale-level, same shard expression as globalShuffle: at n=100k the
    // retired ascii(c1)*31+ascii(c2) folding (only 256 reachable combos,
    // residue probs 34/31/32 per 256) lands at E[chi2]≈73 and would FAIL
    // this bound; the 8-hex-digit parse stays at E[chi2]=7
    val big = spark.range(100000)
      .select(md5(concat(lit("42:"), $"id".cast("string"))).as("sk"))
      .select(pmod(conv(substring($"sk", 1, 8), 16, 10).cast("long"), lit(8L)).as("shard"))
      .groupBy($"shard").count().collect().map(_.getLong(1))
    val bigExp = 100000.0 / 8
    val bigChi2 = big.map(c => (c - bigExp) * (c - bigExp) / bigExp).sum
    assert(big.length === 8 && bigChi2 < 24.3, s"chi2=$bigChi2")
  }

  test("stratifiedSample: scan-side filter, no shuffle before the output sort (B15)") {
    val q = Relational2.stratifiedSample(spark, sfDir)
    // execute then unwrap the AQE leaf — a plain executedPlan collect()
    // cannot see inside AdaptiveSparkPlanExec and would be vacuous
    q.write.format("noop").mode("overwrite").save()
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the only exchange is the global output orderBy (range partitioning)
    assert(exchanges.size === 1, finalPlan.toString)
    // per-language rates actually applied: en heavily downsampled
    val counts = q.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") < counts.filterKeys(_ != "en").values.min)
  }

  test("labelCentroids: exact quantized means on a fixture (B12)") {
    val e = Seq(
      (1L, Array(1.0f, -2.0f), 0),
      (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(0.5f, 0.25f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity.labelCentroidsOn(e).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((0, 0)) === ((2L, 4000L, 2000.0)))  // (1000+3000)/2
    assert(out((0, 1)) === ((2L, 2000L, 1000.0)))  // (-2000+4000)/2
    assert(out((1, 0)) === ((1L, 500L, 500.0)))
    assert(out((1, 1)) === ((1L, 250L, 250.0)))
  }

  test("weightedMix: integer weights copy exactly, fractional weights hit E[w] within bound (B15)") {
    import spark.implicits._
    val docs = (0 until 1000).map(i => (i.toLong, if (i % 2 == 0) "whole" else "half"))
      .toDF("doc_id", "source")
    // whole → weight 2.0 (exactly two copies each); half → 0.5 (each doc
    // kept iff its md5 uniform < 0.5: deterministic, ~250 of 500)
    val w = when($"source" === "whole", 2.0).otherwise(0.5)
    val out = Relational2.weightedMix(docs, w).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = out.groupBy(_._1)
    // integer regime: every even doc has copies 1 and 2, nothing else
    (0 until 1000 by 2).foreach { i =>
      assert(byDoc(i.toLong).map(_._3).sorted.toSeq === Seq(1, 2))
    }
    // fractional regime: kept docs have exactly one copy; count ≈ 250
    val halves = out.filter(_._2 == "half")
    assert(halves.forall(_._3 == 1))
    assert(math.abs(halves.length - 250) < 60, s"kept ${halves.length} of 500 at w=0.5")
    // per-doc deterministic: a second run is identical
    val again = Relational2.weightedMix(docs, w).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("temperatureMix: hand-computed isqrt shares flatten the head without dropping it (B15)") {
    // sources A:16 B:4 C:1 docs — sk = 10⁴·√n = 40000/20000/10000,
    // s_total 70000; natural shares 16/21, 4/21, 1/21 become 4/7, 2/7, 1/7
    val docs = ((1 to 16).map(i => (i.toLong, "A")) ++
      (17 to 20).map(i => (i.toLong, "B")) :+ ((21L, "C")))
      .toDF("doc_id", "source")
    val got = Relational2.temperatureMixOf(docs, budget = 70000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("A") === ((16L, 1000000000L * 16 / 21, 1000000000L * 4 / 7, 40000L)))
    assert(got("B") === ((4L, 1000000000L * 4 / 21, 1000000000L * 2 / 7, 20000L)))
    assert(got("C") === ((1L, 1000000000L * 1 / 21, 1000000000L * 1 / 7, 10000L)))
    // the defining property: temperature RAISES every tail share and
    // LOWERS the head share, and shares still sum to ~1
    assert(got("C")._3 > got("C")._2 && got("B")._3 > got("B")._2)
    assert(got("A")._3 < got("A")._2)
    assert(got.values.map(_._3).sum > 999999990L)
  }

  test("groupSplit: every source lands in exactly ONE fold (leakage-safe) (B15)") {
    val out = Relational2.groupSplit(spark, sfDir)
    val perSource = out.groupBy($"source")
      .agg(countDistinct($"split").as("n_folds"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(perSource.nonEmpty && perSource.forall(_._2 == 1L),
      perSource.filter(_._2 != 1L).mkString(","))
    // and at least two folds are populated on the fixture (it IS a split)
    assert(out.select($"split").distinct().count() >= 2)
  }

  test("weightedMix: scan-side plan — only the output sort shuffles (B15)") {
    val q = Relational2.weightedMix(graft.Tables.documents(spark, sfDir),
      expr("(pmod(ascii(substring(source, 1, 1)), 4) + 1) * 0.5"))
    q.write.format("noop").mode("overwrite").save()
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = finalPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size === 1, finalPlan.toString)
  }

  test("sequencePack: contiguous packs, straddling doc lands in its ending pack (B15)") {
    val out = Relational2.sequencePack(spark, sfDir, capacity = 256, numShards = 8)
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getInt(2), r.getLong(3), r.getInt(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val packs = rows.map(_._5)
      // pack ids are contiguous from 1 and non-decreasing in doc order
      assert(packs.min === 1 && packs.toSet === (1 to packs.max).toSet)
      rows.sortBy(_._2).map(_._5).sliding(2).foreach {
        case Array(a, b) => assert(a <= b); case _ => ()
      }
      // each doc's pack = ceil(cumulative/capacity): straddlers end-pack
      rows.foreach { case (_, _, _, cum, pack) =>
        assert(pack === math.ceil(cum / 256.0).toInt)
      }
    }
  }

  test("fuzzyNameJoin: pigeonhole blocking is COMPLETE vs brute force (B3)") {
    // deterministic pseudo-random short strings over a tiny alphabet —
    // dense enough that substitutions, insertions, and deletions all
    // occur among the true pairs
    val rnd = new scala.util.Random(42)
    val names = (1 to 150).map { _ =>
      (1 to (4 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.distinct
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(expected.nonEmpty)
    // the fixture must exercise a cross-length (indel) pair, not just
    // substitutions, or the shift/length windows go untested
    assert(expected.exists { case (a, b) => a.length != b.length })
    val df = names.toDF("name").withColumn("cnt", lit(1L))
    val got = Relational.fuzzyNameJoin(df, maxDist = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected)
    // the hot-key cap is inert on a corpus with no over-full blocks:
    // capped output == uncapped output, bit for bit
    val uncapped = Relational.fuzzyNameJoin(df, maxDist = 1, maxBlock = Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(uncapped === got)
  }

  test("fuzzyNameJoin: hot blocking key is capped — planted template family stays linear (B3)") {
    // a template family: F names sharing their entire first segment
    // ("AAAAAAAAAA" + 5-digit id, length 15 → seg0 = 8 identical 'A's).
    // Uncapped, the seg0 blocking key emits ~F² candidate rows — the
    // quadratic escape; capped, it emits star edges linear in F.
    def family(f: Int) = (1 to f).map(i => f"AAAAAAAAAA$i%05d")
    def df(ns: Seq[String]) = ns.toDF("name").withColumn("cnt", lit(1L))
    def candCount(ns: Seq[String], cap: Int): Long = {
      val names = df(ns)
      val d = 1; val k = 2
      def segLen(l: String, i: Int) = s"(($l) div $k + (CASE WHEN $i < ($l) % $k THEN 1 ELSE 0 END))"
      def segStart(l: String, i: Int) = s"($i * (($l) div $k) + least($i, ($l) % $k))"
      val idxKeys = (0 until k).map { i =>
        val L = "length(name)"
        s"struct(${L} AS plen, $i AS seg, substring(name, ${segStart(L, i)} + 1, ${segLen(L, i)}) AS piece)"
      }.mkString("array(", ", ", ")")
      val probeKeys = (for { dl <- -d to d; i <- 0 until k; sh <- -d to d } yield {
        val Lp = s"(length(name) + $dl)"
        val len = segLen(Lp, i)
        val start = s"(${segStart(Lp, i)} + $sh)"
        s"""CASE WHEN $len > 0 AND $start >= 0 AND $start + $len <= length(name)
              THEN struct($Lp AS plen, $i AS seg, substring(name, $start + 1, $len) AS piece) END"""
      }).mkString("array(", ", ", ")")
      val idx = names.select(col("name").as("name_i"), explode(expr(idxKeys)).as("key"))
      val probe = names.select(col("name").as("name_p"), explode(expr(probeKeys)).as("key"))
        .filter(col("key").isNotNull)
      Relational.fuzzyCandidates(idx, probe, cap).count()
    }
    // small family over the cap: the uncapped join is visibly quadratic,
    // the capped one linear — same inputs, two orders of magnitude apart
    val f600 = family(600)
    val uncapped600 = candCount(f600, Int.MaxValue)
    val capped600 = candCount(f600, Relational.MaxBlock)
    assert(uncapped600 >= 600L * 600 / 4, s"quadratic escape exists uncapped: $uncapped600")
    assert(capped600 <= 10L * 600, s"capped candidates linear in family size: $capped600")
    // full-size family: candidates stay linear (never materialize F²)
    val capped5k = candCount(family(5000), Relational.MaxBlock)
    assert(capped5k <= 10L * 5000, s"5k-family candidates linear: $capped5k")
    // star candidates are still levenshtein-verified: every emitted pair
    // on the planted family is a TRUE ≤1-edit pair (precision untouched)
    val out = Relational.fuzzyNameJoin(df(family(600)), maxDist = 1).collect()
    assert(out.forall { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      a.zip(b).count { case (x, y) => x != y } <= 1 && a.length == b.length
    })
  }

  test("length buckets: batches partition the corpus, buckets are value-ordered, padding exact (B15, r7)") {
    val rows = Relational2.lengthBuckets(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._4).sum === nDocs) // every doc in exactly one batch
    assert(rows.forall { case (_, _, _, n, mx, sm, pad) =>
      n >= 1 && n <= 16 && pad == n * mx - sm && pad >= 0 })
    // buckets are value-ordered: every batch max in bucket i is below
    // every batch max in bucket i+1 (bucket membership is by value)
    val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._5)).toMap
    for (b <- byBucket.keys.toSeq.sorted.dropRight(1) if byBucket.contains(b + 1))
      assert(byBucket(b).max <= byBucket(b + 1).min)
    // batch ids are dense per (bucket, shard) and only the last is partial
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === sorted.indices.toSeq)
      assert(sorted.dropRight(1).forall(_._4 == 16L))
    }
  }

  test("kFold: folds tile the corpus, train budgets are exact complements (B15)") {
    val rows = Relational2.kFold(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === (0L to 4L)) // every fold populated
    val (totalDocs, totalChars) = (rows.map(_._2).sum, rows.map(_._4).sum)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(totalDocs === nDocs) // tiling: no doc dropped or duplicated
    rows.foreach { case (_, nv, nt, vc, tc) =>
      assert(nt === totalDocs - nv)
      assert(tc === totalChars - vc)
    }
    // assignment is keyed, not positional: md5 residue recomputed driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def fold(id: Long): Long = {
      val hex = md.digest(s"kf:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 5
    }
    val expected = graft.Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).groupBy(fold).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (f, nv, _, _, _) => assert(expected(f) === nv, s"fold $f") }
    // no fold starves: balanced within 3x of uniform on this corpus
    assert(rows.map(_._2).min * 3 >= totalDocs / 5)
  }

  test("referential audit: planted orphans surface with exact counts (B2)") {
    import spark.implicits._
    // children 1,2,2,3,9,9,9 vs parents 1,2,3 → orphan rows {9,9,9},
    // orphan keys {9}
    val child = Seq(1L, 2L, 2L, 3L, 9L, 9L, 9L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val r = Relational2.auditRelation("c->p", child, parent).collect().head
    assert(r.getString(0) === "c->p")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((7L, 3L, 1L)))
    // clean load: zeros everywhere on the generated data
    val clean = Relational2.referentialAudit(spark, sfDir).collect()
    assert(clean.length === 4)
    assert(clean.forall(x => x.getLong(2) === 0L && x.getLong(3) === 0L))
  }

  test("k-anonymity: mixed gate regime, risk totals reconstruct (B15)") {
    val out = Relational2.kAnonymity(spark, "/root/testdata/sf0.01").collect()
    assert(out.length === 125)
    val atRisk = out.filter(_.getAs[Int]("is_k_anonymous") == 0)
    assert(atRisk.nonEmpty && atRisk.length < out.length) // non-vacuous
    // flag consistent with the threshold
    assert(out.forall(r =>
      (r.getAs[Long]("class_size") >= 10L) == (r.getAs[Int]("is_k_anonymous") == 1)))
    // the carried at-risk total equals the sum of flagged class sizes
    val expRisk = atRisk.map(_.getAs[Long]("class_size")).sum
    assert(out.forall(_.getAs[Long]("n_rows_at_risk") === expRisk))
  }

  test("systematic PPS sample: brute replay, m-point conservation, " +
    "heavy items always picked (B15, r8)") {
    val m = 200
    val out = Relational2.ppsSampleQuery(spark, sfDir, m).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    // brute: md5-permute, lay weights end to end, count odd points/interval
    val items = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", greatest($"n_chars", lit(1L)).as("w"),
        graft.functions.Md5Prefix($"doc_id".cast("string"), 14).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    val tw = items.map(_._2).sum
    var lo = 0L
    var total = 0L
    for ((id, w, _) <- items) {
      val a = math.max((2L * m * lo + tw - 1) / tw, 1L)
      val b = math.min((2L * m * (lo + w) + tw - 1) / tw - 1, 2L * m - 1)
      val picks = if (b >= a) (b + 1) / 2 - a / 2 else 0L
      if (picks >= 1) {
        assert(out.contains(id), s"doc $id missing")
        assert(out(id) === ((w, lo, picks)), s"doc $id")
        total += picks
      } else assert(!out.contains(id), s"doc $id should not be picked")
      // an interval at least one spacing wide always contains a point
      if (w * m >= tw) assert(picks >= 1, s"heavy doc $id skipped")
      lo += w
    }
    assert(total === m.toLong) // the m selection points are conserved
    assert(out.size < items.length) // non-vacuous: it IS a sample
  }
}
