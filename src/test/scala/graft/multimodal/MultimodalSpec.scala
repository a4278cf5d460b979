package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asset table: binary payloads with typed metadata") {
    val a = Multimodal.assets(spark, sfDir)
    assert(a.schema("payload").dataType.typeName === "binary")
    val r = a.orderBy("asset_id").head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
  }

  test("batched stub decoder: deterministic 8-dim features, batch call shape") {
    val f1 = Multimodal.stubDecodeBatch(Seq("hello".getBytes, "world".getBytes))
    val f2 = Multimodal.stubDecodeBatch(Seq("hello".getBytes, "world".getBytes))
    assert(f1.map(_.toSeq) === f2.map(_.toSeq))
    assert(f1.forall(_.length === 8))
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sfDir), batchSize = 16)
    val row = feats.orderBy("asset_id").head()
    assert(row.getAs[Seq[Double]]("features").length === 8)
    // no shuffle introduced: partitioning preserved
    assert(feats.rdd.getNumPartitions === Multimodal.assets(spark, sfDir).rdd.getNumPartitions)
  }

  test("resize metadata keeps aspect ratio; frame sampling explodes video rows") {
    val resized = Multimodal.resizeMeta(Multimodal.assets(spark, sfDir), 640)
    assert(resized.filter($"out_width" > 640).count() === 0)
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sfDir))
    assert(frames.groupBy("asset_id").count().filter($"count" =!= 5).count() === 0)
  }

  test("real codec: PNG round-trip gives exact hand-computed pixel features (B14)") {
    // 2×2 image with known channels: (255,0,0) (0,255,0) (0,0,255) (255,255,255)
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Seq((f, decoded)) = Multimodal.decodeBatch(Seq(bos.toByteArray))
    assert(decoded)
    assert(f(0) === 2.0 && f(1) === 2.0)
    // channel means: R = (255+0+0+255)/4, G = (0+255+0+255)/4, B = (0+0+255+255)/4
    assert(f(2) === 127.5 && f(3) === 127.5 && f(4) === 127.5)
    // lumas (per-mille): 255·299, 255·587, 255·114, 255·1000
    val lumas = Seq(299, 587, 114, 1000).map(_ * 255L)
    assert(f(5) === lumas.sum / (1000.0 * 4))
    val mean = lumas.sum.toDouble / 4
    assert(math.abs(f(6) - (lumas.map(l => l.toDouble * l).sum / 4 - mean * mean) / 1e6) < 1e-9)
    assert(f(7) === 0.5) // bright: luma ≥ 128000 — the green and white pixels
  }

  test("real codec: JPEG decodes via the same path; non-image falls back to the stub (B14)") {
    // solid-color JPEG: lossy, but a uniform field decodes near-exactly
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val Seq((fj, okJ)) = Multimodal.decodeBatch(Seq(bos.toByteArray))
    assert(okJ && fj(0) === 8.0 && math.abs(fj(2) - 128.0) < 2.0)
    // text bytes are not an image: stub path, flagged undecoded
    val Seq((fs, okS)) = Multimodal.decodeBatch(Seq("not an image".getBytes))
    assert(!okS && fs.toSeq === Multimodal.stubDecodeBatch(Seq("not an image".getBytes)).head.toSeq)
  }

  test("imageAssets → extractFeaturesReal: every payload is a real decoded PNG, features exact across partitionings (B14)") {
    val feats = Multimodal.extractFeaturesReal(Multimodal.imageAssets(spark, sfDir))
    val rows = feats.select("asset_id", "decoded", "features").collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(1))) // all really decoded
    rows.foreach { r =>
      val f = r.getSeq[Double](2)
      assert(f(0) === 16.0 && f(1) === 12.0)
    }
    // partitioning-invariant: same features after a repartition
    val re = Multimodal.extractFeaturesReal(
        Multimodal.imageAssets(spark, sfDir).repartition(7))
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    rows.foreach(r => assert(re(r.getLong(0)) === r.getSeq[Double](2).toVector))
  }

  test("multimodal pack: modality costs, per-shard sequential fill, budget respected (B14)") {
    val out = Multimodal.multimodalPack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    // cost model spot checks: audio is always rate/160 = 100
    out.filter(_._2 == "audio").foreach(t => assert(t._4 === 100L))
    // image cost for doc_id%8==0: ceil(320/16)*ceil(180/16) = 20*12
    out.find(t => t._2 == "image" && t._1 % 8 == 0).foreach(t => assert(t._4 === 240L))
    out.groupBy(_._3).foreach { case (_, shard) =>
      val sorted = shard.sortBy(_._1)
      // pack ids are non-decreasing in fill order and cum ends in the pack
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 <= b._6)
          assert(b._5 === a._5 + b._4) // cumulative cost is exact
        case _ =>
      }
      sorted.foreach(t => assert(math.ceil(t._5.toDouble / 8192).toInt === t._6))
    }
  }

  test("dHash: decode==formula, a perturbed re-encode stays Hamming-close, a different image is far (B14, r7)") {
    // render one asset the imageAssets way and hash it through the REAL
    // decode; recompute from the closed-form pixels directly
    def render(id: Long, perturb: Boolean = false): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16) {
        val r = ((id * 37 + x * 16) % 256).toInt
        val g = ((id * 11 + y * 21) % 256).toInt
        val b = if ((x * (1 + id % 11) + y * (1 + id % 13) + id) % 5 == 0) 255 else 0
        val rr = if (perturb && x == 5 && y == 5) (r + 3) % 256 else r
        img.setRGB(x, y, (rr << 16) | (g << 8) | b)
      }
      img
    }
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val h7 = Multimodal.imageDHash(Multimodal.decodeImage(png(render(7L))).get)
    // decode == direct-formula hash
    assert(h7 === Multimodal.imageDHash(render(7L)))
    // a 1-pixel perturbation moves at most the 2 bits that straddle it
    val h7p = Multimodal.imageDHash(Multimodal.decodeImage(png(render(7L, perturb = true))).get)
    assert(java.lang.Long.bitCount(h7 ^ h7p) <= 2)
    // a different image is far (the gradient phase shifts every row)
    val h8 = Multimodal.imageDHash(Multimodal.decodeImage(png(render(8L))).get)
    assert(java.lang.Long.bitCount(h7 ^ h8) > 8)
  }

  test("image near-dup clusters: exact-dup groups merge, clusters == brute-force CC (B14, r7)") {
    val out = Multimodal.imageNearDupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // every asset assigned exactly once
    assert(out.size === 500)
    // gradient-identical pair under the r9 render (the id×position blue
    // stripe makes full-pixel periods huge, but the DHASH — adjacent-x
    // luma signs — still collides across ids; 9 and 15 are one such
    // verified pair): exact hash dups must share a cluster whose rep is
    // the smallest member id
    assert(out(9L)._1 === out(15L)._1)
    assert(out(9L)._2 === out(15L)._2)
    assert(out(9L)._2 <= 9L)
    // brute-force reference: group assets by hash, link hashes with
    // Hamming ≤ 6, transitive closure over the (tiny) distinct-hash set
    val byHash = out.toSeq.groupBy(_._2._1)
    val hs = byHash.keys.toArray.sorted
    val parent = scala.collection.mutable.Map(hs.map(h => h -> h): _*)
    def find(h: Long): Long = if (parent(h) == h) h else { val r = find(parent(h)); parent(h) = r; r }
    for (a <- hs; b <- hs if a < b && java.lang.Long.bitCount(a ^ b) <= 6) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = hs.map { h =>
      val members = hs.filter(x => find(x) == find(h))
      val assets = members.flatMap(m => byHash(m).map(_._1))
      h -> (assets.min, assets.length.toLong)
    }.toMap
    out.foreach { case (asset, (h, rep, size)) =>
      assert((rep, size) === expect(h), s"asset $asset hash $h")
    }
    // the near layer is not vacuous on this corpus: some cluster spans
    // MULTIPLE distinct hashes
    assert(hs.exists(x => hs.exists(y => y != x && find(y) == find(x))))
  }

  test("audio: REAL javax.sound WAV decode returns exactly the synthesized " +
    "PCM samples; features match hand computation (B14, r9)") {
    // one asset rendered the audioAssets way, decoded through the real
    // codec, compared sample-by-sample with the closed-form waveform
    val payload = Multimodal.audioAssets(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("asset_id") === 7L)
      .select("payload").head().getAs[Array[Byte]](0)
    val decoded = Multimodal.decodeWav(payload).get
    val amp = ((7L % 8) + 1).toInt * 3000
    val p = ((7L % 37) + 8).toInt
    val want = Array.tabulate(800)(t => if ((t / p) % 2 == 0) amp else -amp)
    assert(decoded.toSeq === want.toSeq, "decode != formula")
    val (n, peak, sabs, ssq, zc) = Multimodal.audioFeatures(decoded)
    assert(n === 800L)
    assert(peak === amp.toLong)
    assert(sabs === 800L * amp)
    assert(ssq === 800L * amp.toLong * amp)
    // square wave: one sign change at every multiple of p in [1, 799]
    assert(zc === (799 / p).toLong)
    // a corrupted payload fails loudly, not silently
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
  }

  test("audio: non-PCM16LE-mono WAVs return None, never Some(garbage) " +
    "(r10 ADVICE: format validated before byte reinterpretation)") {
    // a valid RIFF/WAVE container whose format javax.sound accepts but
    // whose frames are NOT 16-bit mono LE PCM: 8-bit unsigned mono
    def wav(bits: Short, channels: Short, data: Array[Byte]): Array[Byte] = {
      val blockAlign = (bits / 8 * channels).toShort
      val bb = java.nio.ByteBuffer.allocate(44 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels)
        .putInt(8000).putInt(8000 * blockAlign)
        .putShort(blockAlign).putShort(bits)
        .put("data".getBytes("US-ASCII")).putInt(data.length)
        .put(data)
      bb.array()
    }
    // 8-bit mono: previously reinterpreted pairwise as PCM16 garbage
    assert(Multimodal.decodeWav(wav(8, 1, Array.fill[Byte](16)(100))).isEmpty)
    // 16-bit STEREO: interleaved channels are not a mono sample stream
    assert(Multimodal.decodeWav(wav(16, 2, Array.fill[Byte](32)(7))).isEmpty)
    // and the valid shape still decodes
    assert(Multimodal.decodeWav(wav(16, 1, Array.fill[Byte](16)(0))).nonEmpty)
  }

  test("video: constant 8x8 JPEG blocks round-trip EXACTLY at quality 1.0 " +
    "across the full gray range (the closed-form contract, B14 r10)") {
    // every gray value appears in some quadrant across these images
    for (base <- 0 until 256 by 4) {
      val quads = Array(base, (base + 85) % 256, (base + 170) % 256, (base + 255) % 256)
      val jpeg = Multimodal.encodeJpegGray(quads)
      val img = Multimodal.decodeImage(jpeg).get
      for (y <- 0 until 16; x <- 0 until 16) {
        val want = quads((y / 8) * 2 + x / 8)
        val got = img.getRaster.getSample(x, y, 0)
        assert(got === want, s"base=$base ($x,$y)")
      }
    }
  }

  test("video: AVI container round-trips frames byte-identically, including " +
    "odd-length payloads (RIFF pad byte), and rejects malformed input (B14 r10)") {
    // odd + even frame payloads exercise the word-alignment path
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7), Array[Byte](9))
    val avi = Multimodal.buildAvi(frames, 16, 16, fps = 10)
    val parsed = Multimodal.parseAvi(avi).get
    assert(parsed.width === 16 && parsed.height === 16 && parsed.totalFrames === 3)
    assert(parsed.frames.map(_.toSeq) === frames.map(_.toSeq))
    // not RIFF at all
    assert(Multimodal.parseAvi("not a video".getBytes).isEmpty)
    // RIFF but not AVI (a WAV payload must not parse as video)
    val wavLike = Multimodal.audioAssets(spark, sfDir)
      .select("payload").head().getAs[Array[Byte]](0)
    assert(Multimodal.parseAvi(wavLike).isEmpty)
    // declared frame count disagreeing with the movi chunks
    val lying = avi.clone()
    // dwTotalFrames lives 16 bytes into the avih body; find it and bump
    val idx = {
      var i = 0; var found = -1
      while (found < 0 && i < lying.length - 4) {
        if (lying(i) == 'a' && lying(i + 1) == 'v' && lying(i + 2) == 'i' &&
          lying(i + 3) == 'h') found = i
        i += 1
      }
      found + 8 + 16
    }
    lying(idx) = (lying(idx) + 1).toByte
    assert(Multimodal.parseAvi(lying).isEmpty,
      "frame-count mismatch must fail loudly, not return Some")
  }

  test("video: real MJPEG decode returns exactly the synthesized quadrants; " +
    "per-frame stats match hand computation (B14, r10)") {
    val payload = Multimodal.videoAssets(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("asset_id") === 11L)
      .select("payload").head().getAs[Array[Byte]](0)
    val av = Multimodal.parseAvi(payload).get
    assert(av.totalFrames === 4)
    for (f <- 0 until 4) {
      val img = Multimodal.decodeImage(av.frames(f)).get
      val quads = Array.tabulate(4)(k => ((11L * 31 + f * 17 + k * 53) % 256).toInt)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(img.getRaster.getSample(x, y, 0) === quads((y / 8) * 2 + x / 8))
      val (sum, ssq, bright) = Multimodal.grayFrameStats(img)
      assert(sum === 64L * quads.map(_.toLong).sum)
      assert(ssq === 64L * quads.map(q => q.toLong * q).sum)
      assert(bright === 64L * quads.count(_ >= 128))
    }
  }

  test("e07 curation funnel: every asset lands in exactly one bucket, " +
    "no stage vacuous, packs respect capacity (r9)") {
    import org.apache.spark.sql.functions._
    val clustered = Multimodal.imageNearDupClusters(spark, sfDir).cache()
    val total = clustered.count()
    val reps = clustered.filter(col("asset_id") === col("cluster_rep"))
    val gatePass = reps.filter(bit_count(col("dhash")).between(8, 55))
    val packed = Multimodal.multimodalCuration(spark, sfDir).cache()
    // conservation: non-reps + gate-dropped reps + packed == all assets
    val nonReps = total - reps.count()
    val gateDropped = reps.count() - gatePass.count()
    assert(nonReps + gateDropped + packed.count() === total,
      s"funnel leak: $nonReps + $gateDropped + ${packed.count()} != $total")
    // non-vacuity: every stage actually removes something on this corpus
    assert(nonReps > 0L, "near-dup stage dropped nothing")
    assert(packed.count() > 0L, "nothing survived to packing")
    // capacity: within each (shard, pack), the cumulative cost step
    // stays consistent — cum_cost is strictly increasing per shard and
    // pack_id = ceil(cum/8192) by construction
    val bad = packed.filter(
      col("pack_id") =!= ceil(col("cum_cost").cast("double") / 8192).cast("int"))
    assert(bad.count() === 0L)
    clustered.unpersist(); packed.unpersist()
  }
}
