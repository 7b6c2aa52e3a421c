package graft.multimodal

import graft.SparkSuite
import graft.operators.Star
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  val dir = "/root/testdata/sf0.001"

  lazy val media = Multimodal.fromDocuments(
    Star.table(spark, dir, "documents"))

  test("media table carries opaque binary payloads + typed metadata") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val r = media.orderBy("media_id").first()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[String]("format") === "text/plain")
    assert(meta.getAs[Long]("byte_len") ===
      r.getAs[Array[Byte]]("payload").length.toLong)
  }

  test("feature extraction is deterministic, batched, and fixed-width") {
    val f1 = Multimodal.extractFeatures(media.repartition(7), 16)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(2), 16)
      .collect().map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1 === f2, "features must not depend on partitioning")
    assert(f1.values.forall(_.length === 16))
    assert(f1.size === 500)
  }

  test("PNG round-trip: javax.imageio decode recovers the exact closed-form pixels") {
    // real codec both ways: bytes are a genuine PNG stream...
    val bytes = Multimodal.renderPng(42L)
    assert(bytes.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a),
      "payload must carry the PNG signature")
    // ...and the decoded channel sums equal the closed-form formula the
    // SQL oracle evaluates without ever seeing the bytes
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.pngMedia(spark, dir)).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until 16; x <- 0 until 16) {
        sr += (f.media_id * 31 + x * 7 + y * 13) % 256
        sg += (f.media_id * 17 + x * 5 + y * 11) % 256
        sb += (f.media_id * 13 + x * 3 + y * 29) % 256
      }
      assert((f.width, f.height, f.sum_r, f.sum_g, f.sum_b) ===
        ((16L, 16L, sr, sg, sb)), s"media ${f.media_id}")
    }
  }

  test("WAV round-trip: javax.sound decode recovers the exact closed-form PCM") {
    val bytes = Multimodal.renderWav(7L)
    // real container: RIFF....WAVE magic
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.wavMedia(spark, dir)).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      val ss = (0 until 256).map(t =>
        ((f.media_id * 31 + t * 17) % 2048 - 1024) * 16)
      assert((f.n_samples, f.sum_s, f.min_s, f.max_s) ===
        ((256L, ss.sum.toLong, ss.min.toLong, ss.max.toLong)),
        s"media ${f.media_id}")
    }
  }

  test("GIF round-trip: real multi-frame decode recovers exact sampled pixels") {
    // one clip decoded directly, against the closed-form frames
    val payload = Multimodal.renderGif(7L)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload)))
    assert(reader.getNumImages(true) === 8)
    (0 until 8).foreach { f =>
      val img = reader.read(f)
      assert((img.getWidth, img.getHeight) === ((16, 16)))
      for (y <- 0 until 16; x <- 0 until 16) {
        val expected = ((7L * 31 + f * 7 + x * 3 + y * 5) % 256).toInt
        assert((img.getRGB(x, y) & 0xff) === expected, s"f=$f x=$x y=$y")
      }
    }
    reader.dispose()
    // the registered query: every 2nd frame, summed — spot-check one row
    val row = Multimodal.mediaVideo(spark, dir)
      .filter(col("media_id") === 7L).collect().head
    val expectedSum = (for (f <- Seq(0, 2, 4, 6); x <- 0 until 16; y <- 0 until 16)
      yield (7L * 31 + f * 7 + x * 3 + y * 5) % 256).sum
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((8L, 4L, expectedSum)))
  }

  test("JPEG round-trip: real lossy decode keeps bounded distortion") {
    val bytes = Multimodal.renderJpeg(42L)
    // real container: JPEG SOI marker
    assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8,
      "payload must carry the JPEG SOI marker")
    val feats = Multimodal.decodeJpegFeatures(
      Multimodal.jpegMedia(spark, dir)).collect()
    assert(feats.length === 500)
    // dimensions/pixel-count survive the lossy codec exactly...
    assert(feats.forall(f => f.width == 16L && f.height == 16L &&
      f.n_pixels == 256L))
    // ...and the default-quality quantization keeps the mean absolute
    // channel error well inside the high-frequency-pattern worst case
    // (3 channels x 256 pixels = 768 samples per image; bound chosen ~2x
    // above the observed mean so codec-version drift doesn't flake)
    val meanErr = feats.map(_.sum_err.toDouble / 768.0)
    assert(meanErr.max < 48.0,
      s"mean abs channel error ${meanErr.max} exceeds lossy bound")
    assert(meanErr.sum / meanErr.length < 32.0)
  }

  test("frame sampling: zero-byte media yields zero frames, not phantoms") {
    import spark.implicits._
    val m = Multimodal.fromDocuments(
      Seq((1L, "", "en", "s", 0L), (2L, "abcde", "en", "s", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val frames = Multimodal.sampleFrames(m, 2).collect()
    assert(!frames.exists(_.getLong(0) == 1L), "empty payload produced frames")
    assert(frames.count(_.getLong(0) == 2L) === 3) // ceil(5/2)
  }

  test("frame sampling chunks payloads with correct coverage") {
    val frames = Multimodal.sampleFrames(media, 100)
    val agg = frames.groupBy("media_id").agg(
      count(lit(1)).as("n_frames"),
      sum(length(col("frame_payload"))).as("bytes"),
      max("byte_len").as("byte_len"))
    val bad = agg.filter(col("bytes") =!= col("byte_len") ||
      col("n_frames") =!= ceil(col("byte_len") / 100.0)).count()
    assert(bad === 0L)
  }

  test("perceptual-hash dedup finds every planted near-copy within " +
    "hamming 2, through the real PNG codec") {
    val pairs = Multimodal.mediaPhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.operators.Star.table(spark, dir, "documents").count()
    // every id ending in 7 is a one-pixel-perturbed copy of id-1
    val planted = (0L until n).filter(_ % 10 == 7).map(b => (b - 1, b))
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.forall(found.contains),
      s"missed planted pairs: ${planted.filterNot(found.contains)}")
    // a single-pixel edit flips at most its own grid cell's two
    // adjacent comparisons
    val plantedSet = planted.toSet
    assert(pairs.filter(p => plantedSet((p._1, p._2))).forall(_._3 <= 2),
      "planted near-copy exceeded hamming 2")
    // discriminative at this scale: nothing but the planted pairs
    assert(pairs.length === planted.length,
      s"expected ${planted.length} pairs, got ${pairs.length}")
  }

  test("audio-fingerprint dedup finds every planted near-copy within " +
    "hamming 2, through the real WAV codec") {
    val pairs = Multimodal.mediaAudioDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.operators.Star.table(spark, dir, "documents").count()
    // every id ending in 3 is a one-sample-nudged copy of id-1
    val planted = (0L until n).filter(_ % 10 == 3).map(b => (b - 1, b))
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.forall(found.contains),
      s"missed planted pairs: ${planted.filterNot(found.contains)}")
    val plantedSet = planted.toSet
    assert(pairs.filter(p => plantedSet((p._1, p._2))).forall(_._3 <= 2),
      "planted near-copy exceeded hamming 2")
    assert(pairs.length === planted.length,
      s"expected ${planted.length} pairs, got ${pairs.length}")
  }

  test("MJPEG-in-AVI: real RIFF demux + JPEG decode, consistent index, " +
    "bounded distortion") {
    val bytes = Multimodal.renderAviMjpeg(42L)
    // real container facts: RIFF/'AVI ' magic, and every demuxed frame
    // is an actual JPEG the real codec decodes
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "AVI ")
    val v = Multimodal.decodeAviMjpeg(bytes)
    assert(v.frames.size === 6)
    assert(v.declaredFrames === 6L, "avih declared-frame mismatch")
    assert(v.idxEntries === 6L, "idx1 entry-count mismatch")
    assert(v.frames.forall(f => f.getWidth == 16 && f.getHeight == 16))
    // distortion across the fixture corpus: structural facts exact,
    // per-sample lossy error bounded like the plain-JPEG gate
    val feats = Multimodal.decodeMjpegFeatures(
      Multimodal.aviMedia(spark, dir)).collect()
    assert(feats.length === 500)
    assert(feats.forall(f => f.n_frames == 6L && f.declared_frames == 6L &&
      f.idx_entries == 6L && f.n_pixels == 6L * 256L))
    val meanErr = feats.map(_.sum_err.toDouble / (6.0 * 768.0))
    assert(meanErr.max < 48.0,
      s"mean abs channel error ${meanErr.max} exceeds lossy bound")
    assert(meanErr.sum / meanErr.length < 32.0)
  }

  test("IMA ADPCM: real from-the-spec block decode, exact stream facts, " +
    "bounded distortion") {
    val bytes = Multimodal.renderWavAdpcm(42L)
    assert(new String(bytes, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") === "WAVE")
    val a = Multimodal.decodeWavAdpcm(bytes)
    assert(a.nBlocks === 3)
    assert(a.samples.length === 747)
    // block INDEPENDENCE: each block header carries (predictor, index),
    // so block 1's first output sample equals its header predictor —
    // decoding must not need block 0's trailing state
    val feats = Multimodal.decodeAdpcmFeatures(
      Multimodal.adpcmMedia(spark, dir)).collect()
    assert(feats.length === 500)
    assert(feats.forall(f => f.n_samples == 747L && f.n_blocks == 3L))
    // 4-bit differential coding of a slope-bounded signal: mean abs
    // sample error a small fraction of the +-8192 amplitude
    val meanErr = feats.map(_.sum_err.toDouble / 747.0)
    assert(meanErr.max < 400.0,
      s"mean abs sample error ${meanErr.max} exceeds lossy bound")
    assert(meanErr.sum / meanErr.length < 200.0)
  }

  test("fp serve equals the batch twin on shard-arrival pairs and " +
    "reuses the persisted index across runs") {
    val batch = Multimodal.mediaAudioDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 % 10 == 3).toSet
    val serve1 = Multimodal.mediaFpServe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(serve1 === batch,
      s"serve != batch-restricted: lost=${batch -- serve1} " +
        s"extra=${serve1 -- batch}")
    // amortization: the second serve must not rebuild the base index
    // (its decode of the base corpus happens at most once per snapshot)
    val builds0 = graft.sources.IndexStore.buildCount.get()
    val serve2 = Multimodal.mediaFpServe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(graft.sources.IndexStore.buildCount.get() === builds0,
      "second serve run rebuilt the fingerprint index")
    assert(serve2 === serve1)
  }

  test("H.264 I_PCM: decode round-trips the renderer exactly; " +
    "emulation prevention is load-bearing; subset violations throw") {
    // exact facts for a hand-checked id: I_PCM is lossless, so every
    // sample must come back bit-for-bit
    val id = 7L
    val v = Multimodal.decodeH264(Multimodal.renderH264(id))
    assert(v.profileIdc === 66L)
    assert((v.width, v.height) === (32L, 32L))
    assert(v.nNals === 4L) // SPS + PPS + 2 IDR
    assert((v.nFrames, v.nMbs) === (2L, 8L))
    def y(f: Int, x: Int, yy: Int) =
      if (f == 0 && yy == 0 && x < 3) (if (x < 2) 0L else 1L)
      else ((id * 31 + f * 19 + x * 7 + yy * 13) % 256)
    val expLuma = (for (f <- 0 until 2; yy <- 0 until 32; x <- 0 until 32)
      yield y(f, x, yy)).sum
    assert(v.lumaSum === expLuma, "lossless luma must match closed form")
    // emulation prevention is LOAD-BEARING by construction: the first
    // three luma samples are the planted start-code prefix 00 00 01,
    // so every stream must carry at least one escaped 00 00 03 — and a
    // decoder that failed to strip it would see a phantom NAL boundary
    val p = Multimodal.renderH264(id)
    assert((0 until p.length - 2).exists(j =>
      p(j) == 0 && p(j + 1) == 0 && p(j + 2) == 3),
      "planted 00 00 01 PCM prefix must force an emulation-prevention " +
        "byte into the byte stream")
    // subset honesty: garbage and out-of-subset syntax fail loudly
    intercept[Exception] {
      Multimodal.decodeH264(Array[Byte](1, 2, 3, 4, 5))
    }
  }

  test("Exp-Golomb ue/se and fixed-width u(n) round-trip exactly; " +
    "emulation prevention is an exact inverse on adversarial bytes") {
    // entropy-code properties directly, not only through whole streams:
    // a single off-by-one in the Golomb prefix corrupts every later
    // field silently (the whole-stream test can cancel paired bugs)
    val rnd = new scala.util.Random(11)
    val ues = (0L until 64L) ++ Seq(255L, 256L, 65535L, 1000000L) ++
      Seq.fill(200)(rnd.nextInt(1 << 24).toLong)
    val ses = (-40L to 40L) ++ Seq.fill(200)((rnd.nextInt(1 << 20) -
      (1 << 19)).toLong)
    val w = new Multimodal.BitWriter
    ues.foreach(w.ue)
    ses.foreach(w.se)
    w.u(0xA5L, 8); w.u(5L, 3); w.u(1L, 1)
    w.rbspTrailing()
    val r = new Multimodal.BitReader(w.toArray)
    ues.foreach(v => assert(r.ue() === v, s"ue($v) round-trip"))
    ses.foreach(v => assert(r.se() === v, s"se($v) round-trip"))
    assert(r.u(8) === 0xA5L)
    assert(r.u(3) === 5L)
    assert(r.u(1) === 1L)
    // EP transform: every 00 00 {00,01,02,03} run must be escaped and
    // strip back byte-identically, including runs longer than 2 zeros
    // and trailing zeros
    val adversarial = Seq[Array[Byte]](
      Array(0, 0, 0), Array(0, 0, 1), Array(0, 0, 2), Array(0, 0, 3),
      Array(0, 0, 0, 0, 0, 1), Array(1, 0, 0, 3, 0, 0),
      Array.fill(64)(0.toByte),
      Array.tabulate(512)(i => (i % 4).toByte),
      Array.tabulate(300)(_ => rnd.nextInt(4).toByte))
    adversarial.foreach { rbsp =>
      val e = Multimodal.ebspOf(rbsp)
      // no start-code-prefix (00 00 0x, x<=3) may survive in the EBSP
      (0 until e.length - 2).foreach { j =>
        assert(!(e(j) == 0 && e(j + 1) == 0 && (e(j + 2) & 0xff) <= 2),
          s"unescaped 00 00 0${e(j + 2)} at $j in ${e.mkString(",")}")
      }
      val back = Multimodal.rbspOf(e, 0, e.length)
      assert(back.toSeq === rbsp.toSeq,
        s"EP round-trip failed for ${rbsp.mkString(",")}")
    }
  }
}
