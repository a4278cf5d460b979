package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("containment: a chunk-aligned prefix scores 10^9; an unrelated doc never pairs (B13, r7)") {
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    // find the long doc's own chunk boundaries, then cut A exactly at one
    val bounds = TextAnalysis.cdcChunksOf(Seq((9L, long)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(bounds.length >= 3, "fixture long doc must chunk")
    val cutAt = (bounds(bounds.length - 2)._1 + bounds(bounds.length - 2)._2 - 1).toInt
    val prefix = long.substring(0, cutAt) // ends ON a content boundary
    val docs = Seq((1L, prefix), (2L, long),
      (3L, (500 to 700).map(i => s"zz$i").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.containmentOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // every chunk of the aligned prefix reappears in the long doc
    assert(got((1L, 2L)) === 1000000000L)
    // the unrelated doc shares no chunk with anything
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("CDC chunks: brute-force boundary equality, exact coverage, " +
    "shifted copy re-aligns chunk-for-chunk (B13, r7)") {
    val t1 = (1 to 100).map(i => s"tok$i").mkString(" ")
    val t2 = "PREFIX INSERTED " + t1 // byte-shifted copy of t1
    val fixtures = Seq((1L, t1), (2L, t2), (3L, "short"))
    val got = TextAnalysis.cdcChunksOf(fixtures.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // brute-force mask-only CDC: boundary after p iff base-31 Horner over
    // the 8 chars ending at p is ≡ 0 mod 64
    def chunksOf(text: String): Seq[(Int, Int)] = {
      val n = text.length
      val bounds = (8 to n).filter { p =>
        (p - 8 until p).foldLeft(0L)((acc, i) => acc * 31 + text.charAt(i).toInt) % 64 == 0
      }
      val starts = 1 +: bounds.filter(_ < n).map(_ + 1)
      val ends = bounds.filter(_ < n) :+ n
      starts.zip(ends).map { case (s, e) => (s, e - s + 1) }
    }
    for ((id, text) <- fixtures) {
      val exp = chunksOf(text)
      val g = got.filter(_._1 == id).sortBy(_._2)
      assert(g.map(_._2).toSeq === g.indices.map(_.toLong)) // dense chunk_idx
      assert(g.map(c => (c._3.toInt, c._4.toInt)).toSeq === exp)
      assert(g.map(_._4).sum === text.length) // chunks tile the doc exactly
    }
    // content re-alignment: every t1 boundary survives the byte shift
    // (window sits fully inside the copied region), and any extra t2
    // boundary lands inside t1's FIRST chunk — so every non-head t1
    // chunk reappears verbatim in t2. Fixed-stride chunking has none of
    // this; it is the point of CDC.
    val h1 = got.filter(t => t._1 == 1L && t._2 > 0).map(_._5).toSet
    val h2 = got.filter(_._1 == 2L).map(_._5).toSet
    assert(h1.nonEmpty) // t1 really has interior boundaries
    assert(h1.subsetOf(h2))
  }

  test("repetition: boilerplate doc fails, diverse doc passes (B13)") {
    val spam = (("buy now" + " ") * 20).trim                 // one bigram dominates
    val diverse = (1 to 40).map(i => s"tok$i").mkString(" ") // all bigrams unique
    val df = Seq((1L, spam), (2L, diverse)).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionOn(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(5), r.getInt(6))).toMap
    val (spamUniq, spamTop, spamPass) = rows(1L)
    val (divUniq, divTop, divPass) = rows(2L)
    assert(spamPass === 0 && spamTop > 0.4 && spamUniq < 0.1)
    assert(divPass === 1 && divTop < 0.05 && divUniq === 1.0)
  }

  test("repetition: single-token docs are excluded (no bigrams)") {
    val df = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    assert(graft.text.TextAnalysis.repetitionOn(df).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("repetition kernel == explode+agg formulation on random docs (exact)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check => scCheck, Parameters}
    val tokGen = Gen.oneOf(Gen.oneOf("a", "b", "ab", "ü", ""), Gen.alphaNumStr.map(_.take(4)))
    val docGen = Gen.chooseNum(0, 15).flatMap(n => Gen.listOfN(n, tokGen)).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(5, docGen)) { texts: List[String] =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val a = TextAnalysis.repetitionOn(docs).collect().map(_.toSeq).toSeq
      val b = TextAnalysis.repetitionOnAgg(docs).collect().map(_.toSeq).toSeq
      a == b
    }
    val res = scCheck(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("oversized doc degrades to the -2 sentinel; job completes; normal rows unchanged") {
    // one row past the MaxBigrams cap: the kernel must report Oversized
    // instead of failing the stage — at 100 TB one poison row must not
    // kill the job
    val nToks = graft.functions.TopBigramCountImpl.MaxBigrams + 2
    val poison = "a ".repeat(nToks - 1) + "a"
    val diverse = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, poison), (2L, "x y x y x"), (3L, diverse)).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionOn(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getInt(6))).toMap
    assert(rows(1L) === ((-2L, 0)))  // quarantined, not crashed
    assert(rows(2L)._1 === 2L)       // normal rows score exactly as before
    assert(rows(3L) === ((1L, 1)))
  }

  test("strict mode keeps the loud failure for fail-fast callers") {
    val nToks = graft.functions.TopBigramCountImpl.MaxBigrams + 2
    val poison = "a ".repeat(nToks - 1) + "a"
    val df = Seq((1L, poison)).toDF("doc_id", "text")
    val e = intercept[Exception](
      df.select(graft.functions.TopBigramCount.strict($"text")).collect())
    def cause(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .exists(_.isInstanceOf[IllegalArgumentException])
    assert(cause(e), s"expected IllegalArgumentException in cause chain: $e")
  }

  test("winnowing: shared ≥w+k−1 run shares a fingerprint; set is sampled, not full") {
    // k=4, w=4 → the guarantee horizon is 7 tokens: a shared 7-token run
    // contains one full window of 4 grams, whose min both docs select
    val shared = (1 to 7).map(i => s"s$i").mkString(" ")
    val d1 = s"prefix one two three $shared tail alpha beta"
    val d2 = s"other words entirely unrelated $shared differing suffix here"
    val d3 = (100 to 140).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val byDoc = TextAnalysis.winnowFingerprints(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty, "winnowing guarantee violated")
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty, "unrelated docs must not collide")
    // density: winnowing samples ~2/(w+1) of grams — far fewer than full
    // shingling (doc 3 has 41-3=38 grams)
    assert(byDoc(3L).size < 38 / 2, s"fingerprints not sampled: ${byDoc(3L).size}")
    // short docs (< k+w-1 tokens) have no full window → excluded entirely
    val short = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    assert(TextAnalysis.winnowFingerprints(short).count() === 0L)
  }

  test("quarantine: planted docs fail the named checks in declaration order (B13)") {
    val docs = Seq(
      (1L, "the cat sat on the mat and looked out of the window", "en"),
      (2L, "hi", "en"),                                      // too_short (+token_len: avg 2.0)
      (3L, "the and of to a is in" + " spam" * 23, "en"),    // repetitive (8/30 distinct), en markers keep lang green
      (4L, "der hund und die katze ist ein freund", "en"),   // lang_mismatch (de text, en label)
      (5L, "reach the admin of the site and write to a1@mail.example.org now ok", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.quarantineRouteOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) === (("", 0, "keep")))
    assert(out(2L)._1.split('|').contains("too_short") && out(2L)._3 == "quarantine")
    assert(out(3L)._1 === "repetitive")
    assert(out(4L)._1 === "lang_mismatch")
    assert(out(5L)._1 === "has_pii")
    // multi-reason docs list ALL failures in declaration order
    val multi = TextAnalysis.quarantineRouteOn(
      Seq((9L, "aa aa aa aa", "fr")).toDF("doc_id", "text", "lang")).collect()(0)
    assert(multi.getString(1) === "too_short|token_len|repetitive|lang_mismatch")
  }

  test("quarantine plan is scan-side — only the output sort shuffles (B13)") {
    val q = TextAnalysis.quarantineRoute(spark, sfDir)
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

  test("repetition production plan has no shuffle before the output sort") {
    // multi-partition input: single-partition plans elide exchanges and
    // would make the comparison vacuous
    val docs = spark.range(64).repartition(4)
      .select($"id".as("doc_id"),
        concat_ws(" ", lit("a"), lit("b"), $"id".cast("string"), lit("a b")).as("text"))
    // AQE wraps any exchange-bearing plan in an AdaptiveSparkPlanExec
    // LEAF that collect() cannot see into, and sparkPlan predates
    // EnsureRequirements (no exchanges yet) — so: execute, then unwrap
    def exchanges(df: org.apache.spark.sql.DataFrame) = {
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
    }
    val kernel = exchanges(TextAnalysis.repetitionOn(docs))
    val agg = exchanges(TextAnalysis.repetitionOnAgg(docs))
    // kernel path: the input repartition + the output orderBy, nothing else
    assert(kernel <= 2, s"kernel path: $kernel exchanges")
    assert(agg >= kernel + 1, s"agg $agg vs kernel $kernel") // aggs add shuffles
  }

  test("filter funnel: cascade arithmetic on planted docs (B13)") {
    val good = "the cat sat of the mat and slept there quietly" // passes all
    val short = "the cat"                                       // fails min_length
    val spam = ("spam " * 20).trim                              // fails not_repetitive
    val wrongLang = "the cat sat of the mat and slept" // en text, labeled 'de'
    val pii = "the cat of a mailbox and wrote to someone@example.com today ok"
    val df = Seq(
      (1L, good, "en"), (2L, short, "en"), (3L, spam, "en"),
      (4L, wrongLang, "de"), (5L, pii, "en")
    ).toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.filterFunnelOn(df).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).toSeq ===
      Seq("min_length", "token_len", "not_repetitive", "lang_match", "no_pii"))
    // entered chains: stage i+1 enters exactly stage i's survivors
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 === a._4) }
    rows.foreach { case (_, _, e, s, r) => assert(e - s === r && s <= e) }
    // each planted doc falls at its intended stage
    assert(rows(0)._3 === 5L && rows(0)._5 === 1L)  // short removed first
    assert(rows(2)._5 === 1L)                        // spam at not_repetitive
    assert(rows(3)._5 === 1L)                        // wrongLang at lang_match
    assert(rows(4)._5 === 1L && rows(4)._4 === 1L)   // pii last; good survives
  }

  test("BPE training: classic fixture produces the hand-computed merge sequence (B13)") {
    // Sennrich et al.'s example vocabulary: low×5 lower×2 newest×6 widest×3.
    // Pair counts: e-s 9, s-t 9, l-o 7, o-w 7, w-e 8, ... tie e-s/s-t
    // breaks lexicographically -> es first; then es-t 9; then l-o 7.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, numMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)))
  }

  test("BPE apply is left-to-right non-overlapping ('aaa' merges once)") {
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    // iter 1: pairs a-a count 2 per word x 1 distinct word ("aaa" x2 -> cnt 2)
    // -> merge (a,a)=aa with weight 4 (two adjacent pairs x 2 occurrences)
    assert(out(0)._2 === "aa" && out(0)._3 === 4L)
    // after merging, each word is [aa, a] -> next best pair is (aa, a) x2
    assert(out(1)._2 === "aaa" && out(1)._3 === 2L)
  }

  test("bpeEncode: token counts match an independent train-then-apply on planted corpora (B13)") {
    // classic Sennrich vocabulary plus a messy corpus with chaining merge
    // sites ("aaa", overlapping runs) — the scalar guarded-separator
    // encode must equal a reference apply (leftmost non-overlapping fold
    // per word, merges in training order)
    val classic = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val messy = "aaa aaab banana bandana abba abab x yz aaa low lowest"
    val docs = Seq((1L, classic), (2L, messy), (3L, "aaaa aa a"),
      (4L, ""), (5L, "   ")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(
        docs.filter($"text".rlike("^[ -~]*$") && !$"text".contains("|")),
        numMerges = 10)
      .collect().map(r => (r.getString(1), r.getString(2)))
    def applyWord(w: String): Seq[String] =
      merges.foldLeft(w.split("").toSeq) { case (syms, (l, r)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
          else out += x
        }
        out.toSeq
      }
    val expected = Seq((1L, classic), (2L, messy), (3L, "aaaa aa a"))
      .map { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty).toSeq
        (id, ws.map(_.length).sum.toLong, ws.length.toLong,
          ws.map(w => applyWord(w).length.toLong).sum)
      }
    val got = TextAnalysis.bpeEncodeOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 4 (empty) and 5 (spaces only) hold no words: excluded
    assert(got.toSeq === expected)
    // and the compression column is the exact integer ratio
    val ppb = TextAnalysis.bpeEncodeOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    expected.foreach { case (id, chars, _, toks) =>
      assert(ppb(id) === 1000000000L * toks / chars)
    }
  }

  test("bpeTrainLocal == bpeTrain merge tables in the exact regime (B13 scale recipe)") {
    // the classic fixture AND a messier corpus (repeats, overlapping
    // runs, singleton symbols) — the vocab-bounded in-memory trainer
    // must reproduce the distributed trainer's merge table exactly:
    // same pairs, same order, same weighted counts
    val classic = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val messy = "aaa aaab banana bandana abba abab x yz aaa low lowest"
    for (text <- Seq(classic, messy)) {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val dist = TextAnalysis.bpeTrain(df, numMerges = 8).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      val local = TextAnalysis.bpeTrainLocal(df, numMerges = 8).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      assert(local.toSeq === dist.toSeq)
    }
  }

  test("bpeTrainLocal maxVocab cap trains on the frequency-mass head (B13)") {
    // top-2 words by (cnt desc, word asc) are "low"(3) and "es"(2):
    // the capped trainer must see ONLY those — merge counts reflect
    // low×3 + es×2 and never touch the singleton tail
    val df = Seq((1L, "low low low es es rare tail")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainLocal(df, numMerges = 2, maxVocab = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // pairs: l-o 3, o-w 3, e-s 2 → (l,o) wins lexicographically, then (lo,w)
    assert(out.toSeq === Seq(("l", "o", 3L), ("lo", "w", 3L)))
  }

  test("quality threshold: per-source exact p25 cutoff keeps upper 75% (B13)") {
    // source A: lengths 1..8 -> rank ceil(8/4)=2 -> cutoff 2 -> keeps 2..8
    // source B: lengths 10,20,30 -> rank ceil(3/4)=1 -> cutoff 10 -> keeps all
    val df = ((1 to 8).map(i => (i.toLong, "A", i.toLong)) ++
      Seq((21L, "B", 10L), (22L, "B", 20L), (23L, "B", 30L)))
      .toDF("doc_id", "source", "n_chars")
    val out = TextAnalysis.qualityThresholdOn(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.count(_._2 == "A") === 7 && out.count(_._2 == "B") === 3)
    assert(out.filter(_._2 == "A").forall(t => t._3 >= 2 && t._4 === 2L))
    assert(out.filter(_._2 == "B").forall(_._4 === 10L))
    assert(!out.exists(_._1 === 1L)) // the p25 straggler is dropped
  }

  test("source-overlap KMV sketch: exact regime on the real corpus, lossy within error") {
    // exact regime: the testdata vocabulary per source is far under k, so
    // |M| = |A∪B| and the estimator must EQUAL the oracle-gated exact twin
    val exact = TextAnalysis.sourceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    val est = TextAnalysis.sourceOverlapSketch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(est.keySet == exact.keySet, "sketch must cover every co-occurring pair")
    for ((k2, e) <- est)
      assert(math.abs(e - exact(k2)) < 1e-12, s"$k2: $e vs ${exact(k2)}")
    // lossy regime: 5000-token vocabularies, true J = 1/3; k = 256 →
    // σ ≈ √(J(1−J)/k) ≈ 0.029 — require within 4σ
    val a = (0 until 5000).map(i => s"t$i").mkString(" ")
    val b = (2500 until 7500).map(i => s"t$i").mkString(" ")
    val docs = Seq(("A", a), ("B", b)).toDF("source", "text")
    val lossy = TextAnalysis.sourceOverlapSketchOn(docs).collect()
    assert(lossy.length == 1)
    val j = lossy(0).getDouble(3)
    assert(math.abs(j - 1.0 / 3) <= 0.12, s"lossy sketch J=$j vs 1/3")
  }

  test("collocations: Dice ranks the always-together pair above the frequent-but-independent one (B13)") {
    // "united states" appears 6 times and its words nowhere apart →
    // dice = 2·6/(6+6) = 1.0 exactly. "of the" appears 8 times but its
    // words also pair with unique fillers (of: 16, the: 16) →
    // dice = 2·8/32 = 0.5. Raw count would rank "of the" first;
    // association must not. All filler pairs stay under minCount.
    val filler = (1 to 8).map(i => s"of x$i the y$i of the z$i").mkString(" ")
    val docs = Seq(
      (1L, (1 to 6).map(i => s"united states f$i").mkString(" ")),
      (2L, filler)).toDF("doc_id", "text")
    val out = TextAnalysis.collocationsOf(docs, k = 5, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(out.head._1 === "united" && out.head._2 === "states")
    assert(out.head._3 === 6L && out.head._4 === 1000000000L)
    val ofThe = out.find(t => t._1 == "of" && t._2 == "the").get
    assert(ofThe._4 < 1000000000L)
    // support floor: pairs under minCount never surface
    assert(out.forall(_._3 >= 5L))
  }

  test("quality calibration: per-source competition ranks, ties share rank, ppb exact (B13)") {
    val out = TextAnalysis.qualityCalibration(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.nonEmpty)
    // recompute ranks driver-side per source
    for ((src, docs) <- out.values.groupBy(_._1)) {
      val scores = docs.map(_._2).toSeq
      val n = scores.length
      for ((_, score, rank, ppb) <- docs) {
        val expRank = scores.count(_ < score) + 1L
        assert(rank === expRank, s"source $src score $score")
        val expPpb = if (n > 1) (expRank - 1) * 1000000000L / (n - 1) else 0L
        assert(ppb === expPpb)
      }
      // ties share the same rank — equal scores map to equal ppb
      val byScore = docs.groupBy(_._2).view.mapValues(_.map(_._4).toSet)
      assert(byScore.values.forall(_.size == 1))
    }
  }

  test("readability plan is scan-side — only the output sort shuffles (B13)") {
    val q = TextAnalysis.readability(graft.Tables.documents(spark, sfDir))
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

  test("vocab growth: hand-computed tokens/types/hapax and ppb ratios (B13)") {
    import spark.implicits._
    val docs = Seq(("s1", "a b a c"), ("s1", "d a"), ("s2", "x x x"))
      .toDF("source", "text")
    val out = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // s1: tokens a,b,a,c,d,a → 6 tokens, 4 types, hapax {b,c,d}=3
    assert(out("s1") === ((6L, 4L, 3L,
      4L * 1000000000L / 6L, 3L * 1000000000L / 4L)))
    // s2: one type repeated → zero hapax, TTR 1/3
    assert(out("s2") === ((3L, 1L, 0L, 1000000000L / 3L, 0L)))
  }

  test("readability: hand-counted words/sentences/syllables and both scores (B13)") {
    import spark.implicits._
    val docs = Seq((1L, "Hello world. It works!"), (2L, "no terminator here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val a = out(1L)
    // 4 ws tokens; 2 sentence runs (. and !); vowel runs e,o,o,I,o = 5
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((4L, 2L, 5L)))
    assert(math.abs(a.getDouble(5) - (0.39 * 2.0 + 11.8 * 1.25 - 15.59)) < 1e-12)
    assert(math.abs(a.getDouble(4) - (206.835 - 1.015 * 2.0 - 84.6 * 1.25)) < 1e-12)
    // no [.!?] at all → sentence count floored at 1, scores finite
    val b = out(2L)
    assert(b.getLong(2) === 1L)
    assert(!b.getDouble(4).isNaN && !b.getDouble(5).isNaN)
  }
}
