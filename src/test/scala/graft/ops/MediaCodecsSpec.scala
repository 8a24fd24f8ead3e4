package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Differential tests for the pure-JVM media decoders: fixtures are
  * ENCODED here, independently of the decoders, from known pixels/samples
  * whose statistics are computed by hand — so an off-by-one in stride,
  * row order, channel order, or chunk walking shows up as a wrong mean,
  * not as a silently-consistent bug.
  */
class MediaCodecsSpec extends SparkSuite {

  // ---- independent encoders (test-side only) -----------------------------

  /** Encode pixels (row-major, top-down, (r,g,b)) as a 24-bit BI_RGB BMP:
    * bottom-up rows, BGR bytes, 4-byte-aligned stride. */
  private def encodeBmp(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val dataSize = stride * h
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M')
    u32(54 + dataSize); u32(0); u32(54) // file size, reserved, data offset
    u32(40); u32(w); u32(h)             // BITMAPINFOHEADER, width, height
    u16(1); u16(24); u32(0)             // planes, bpp, BI_RGB
    u32(dataSize); u32(2835); u32(2835); u32(0); u32(0)
    for (y <- (h - 1) to 0 by -1) {     // bottom-up
      for (x <- 0 until w) {
        val (r, g, b) = px(x, y)
        out.write(b); out.write(g); out.write(r) // BGR
      }
      (w * 3 until stride).foreach(_ => out.write(0)) // row padding
    }
    out.toByteArray
  }

  private def encodePpm(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"P6\n# test fixture\n$w $h\n255\n".getBytes("US-ASCII"))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      out.write(r); out.write(g); out.write(b)
    }
    out.toByteArray
  }

  /** Encode 16-bit PCM samples (per-channel interleaved) as RIFF/WAVE. */
  private def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes); u32(36 + dataLen)
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); u32(16)
    u16(1); u16(channels); u32(sampleRate)
    u32(sampleRate * channels * 2); u16(channels * 2); u16(16)
    out.write("data".getBytes); u32(dataLen)
    samples.foreach(s => u16(s & 0xFFFF))
    out.toByteArray
  }

  /** Encode pixels as PNG/JPEG via ImageIO (the JDK encoder; the decoder
    * under test is [[MediaCodecs.decodeImageIO]] over the same bytes). */
  private def encodeImageIO(fmt: String, w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  // 2x3 test image: left column red-ish, middle green, right blue
  private val W = 3; private val H = 2
  private def pix(x: Int, y: Int): (Int, Int, Int) = x match {
    case 0 => (200, 10 * (y + 1), 0)
    case 1 => (0, 250, 10 * (y + 1))
    case _ => (30 * (y + 1), 0, 220)
  }

  private def expectedImageStats: MediaCodecs.ImageStats = {
    val ps = for (y <- 0 until H; x <- 0 until W) yield pix(x, y)
    val n = ps.size.toDouble
    val lumas = ps.map { case (r, g, b) => 0.299 * r + 0.587 * g + 0.114 * b }
    val lm = lumas.sum / n
    MediaCodecs.ImageStats(W, H,
      ps.map(_._1).sum / n, ps.map(_._2).sum / n, ps.map(_._3).sum / n,
      lm, math.sqrt(lumas.map(l => (l - lm) * (l - lm)).sum / n))
  }

  test("BMP decode recovers exact per-channel and luma statistics " +
    "(bottom-up rows, BGR order, padded stride)") {
    val got = MediaCodecs.decodeBmp(encodeBmp(W, H, pix)).get
    val exp = expectedImageStats
    assert(got.width === W && got.height === H)
    assert(math.abs(got.meanR - exp.meanR) < 1e-9)
    assert(math.abs(got.meanG - exp.meanG) < 1e-9)
    assert(math.abs(got.meanB - exp.meanB) < 1e-9)
    assert(math.abs(got.lumaMean - exp.lumaMean) < 1e-9)
    assert(math.abs(got.lumaStd - exp.lumaStd) < 1e-9)
  }

  test("PPM decode ≡ BMP decode on the same pixels (different container, " +
    "identical statistics)") {
    val a = MediaCodecs.decodeBmp(encodeBmp(W, H, pix)).get
    val b = MediaCodecs.decodePpm(encodePpm(W, H, pix)).get
    assert(a === b)
  }

  test("PNG decode ≡ BMP decode on the same pixels (lossless container, " +
    "identical statistics through the ImageIO path)") {
    val png = encodeImageIO("png", W, H, pix)
    assert(MediaCodecs.sniff(png) === "png")
    val a = MediaCodecs.decodeBmp(encodeBmp(W, H, pix)).get
    val b = MediaCodecs.decodeImageIO(png).get
    assert(a === b)
  }

  test("JPEG decode: exact dimensions, statistics within lossy tolerance") {
    // lossy codec → means move a little; a 16x16 smooth gradient keeps
    // the error small and the fixture realistic
    val side = 16
    def grad(x: Int, y: Int): (Int, Int, Int) =
      ((x * 16) % 256, (y * 16) % 256, ((x + y) * 8) % 256)
    val jpg = encodeImageIO("jpg", side, side, grad)
    assert(MediaCodecs.sniff(jpg) === "jpeg")
    val got = MediaCodecs.decodeImageIO(jpg).get
    val exp = MediaCodecs.decodeBmp(encodeBmp(side, side, grad)).get
    assert(got.width === side && got.height === side)
    assert(math.abs(got.meanR - exp.meanR) < 8.0, s"$got vs $exp")
    assert(math.abs(got.meanG - exp.meanG) < 8.0)
    assert(math.abs(got.meanB - exp.meanB) < 8.0)
    assert(math.abs(got.lumaMean - exp.lumaMean) < 4.0)
  }

  test("perceptual hash accepts JPEG/PNG: PNG bit-identical to BMP of " +
    "the same pixels; JPEG within small Hamming distance") {
    val side = 32
    def grad(x: Int, y: Int): (Int, Int, Int) = {
      val v = (x * 5 + y * 3) % 256; (v, (v + 40) % 256, (v + 80) % 256)
    }
    val hBmp = MediaCodecs.perceptualHash64(encodeBmp(side, side, grad)).get
    val hPng = MediaCodecs.perceptualHash64(
      encodeImageIO("png", side, side, grad)).get
    assert(hPng === hBmp, "PNG is lossless: pHash must match BMP exactly")
    val hJpg = MediaCodecs.perceptualHash64(
      encodeImageIO("jpg", side, side, grad)).get
    val dist = java.lang.Long.bitCount(hJpg ^ hBmp)
    assert(dist <= 10,
      s"JPEG re-encode moved the pHash $dist bits — not a near-dup")
  }

  test("decodeImageIO rejects non-JPEG/PNG and truncated payloads") {
    assert(MediaCodecs.decodeImageIO(encodeBmp(W, H, pix)).isEmpty)
    val png = encodeImageIO("png", W, H, pix)
    assert(MediaCodecs.decodeImageIO(png.take(12)).isEmpty)
    assert(MediaCodecs.decodeImageIO(Array[Byte](0x89.toByte, 'P', 'N',
      'G', 0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3)).isEmpty)
  }

  test("WAV decode: known square wave → exact amplitude/RMS/ZCR") {
    // mono alternating +8192/-8192: |mean| = rms = 0.25, every adjacent
    // pair crosses zero → zcr = 1
    val sq = Array.tabulate[Short](800)(i =>
      if (i % 2 == 0) 8192 else -8192)
    val s = MediaCodecs.decodeWav(encodeWav(8000, 1, sq)).get
    assert(s.sampleRate === 8000 && s.nSamples === 800)
    assert(math.abs(s.meanAbs - 0.25) < 1e-9)
    assert(math.abs(s.rms - 0.25) < 1e-9)
    assert(math.abs(s.zeroCrossRate - 1.0) < 1e-9)
    assert(math.abs(s.durationMs - 100.0) < 1e-9)
  }

  test("WAV decode: stereo channels are averaged per frame") {
    // L = +16384, R = -16384 → per-frame mix 0 → silence statistics
    val st = Array.tabulate[Short](200)(i =>
      if (i % 2 == 0) 16384 else -16384)
    val s = MediaCodecs.decodeWav(encodeWav(16000, 2, st)).get
    assert(s.nSamples === 100)
    assert(s.meanAbs === 0.0 && s.rms === 0.0 && s.zeroCrossRate === 0.0)
  }

  test("malformed and unsupported payloads return None, never throw") {
    val bmp = encodeBmp(W, H, pix)
    assert(MediaCodecs.decodeBmp(bmp.take(30)) === None)  // truncated
    assert(MediaCodecs.decodePpm("P6\n9999 9999\n255\n"
      .getBytes("US-ASCII")) === None)                    // raster missing
    assert(MediaCodecs.decodeWav("RIFFxxxxWAVE".getBytes) === None)
    val bpp8 = bmp.clone(); bpp8(28) = 8                  // unsupported bpp
    assert(MediaCodecs.decodeBmp(bpp8) === None)
  }

  test("extractFeatures runs the real decoders inside the kernel and " +
    "falls back to byte stats for unknown payloads") {
    import spark.implicits._
    val bmp = encodeBmp(W, H, pix)
    val ppm = encodePpm(W, H, pix)
    val wav = encodeWav(8000, 1,
      Array.tabulate[Short](800)(i => if (i % 2 == 0) 8192 else -8192))
    val other = "PAYLOAD:junk".getBytes("UTF-8")
    val assets = Seq(
      (1L, "image", bmp), (2L, "image", ppm),
      (3L, "audio", wav), (4L, "image", other))
      .toDF("asset_id", "kind", "payload")
    val out = Multimodal.extractFeatures(spark, assets)
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("feature")).toMap
    val exp = expectedImageStats
    // BMP: real pixel statistics, image discriminator
    assert(out(1L)(0) === W.toFloat && out(1L)(1) === H.toFloat)
    assert(math.abs(out(1L)(2) - exp.meanR) < 1e-4)
    assert(out(1L)(7) === 1.0f)
    // PPM decodes to the SAME feature as the BMP of the same pixels
    assert(out(2L) === out(1L))
    // WAV: real sample statistics, audio discriminator
    assert(out(3L)(0) === 8000.0f && out(3L)(1) === 800.0f)
    assert(math.abs(out(3L)(3) - 0.25f) < 1e-6)
    assert(out(3L)(7) === 2.0f)
    // unknown container → byte-stats fallback (kernel still total)
    assert(out(4L).length === 8)
    assert(out(4L) !== out(1L))
  }

  test("extractFeatures dispatches JPEG/PNG to the ImageIO decoder") {
    import spark.implicits._
    val png = encodeImageIO("png", W, H, pix)
    val jpg = encodeImageIO("jpg", W, H, pix)
    val assets = Seq((1L, "image", png), (2L, "image", jpg))
      .toDF("asset_id", "kind", "payload")
    val out = Multimodal.extractFeatures(spark, assets)
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("feature")).toMap
    val exp = expectedImageStats
    // PNG: lossless — exact pixel stats, image discriminator
    assert(out(1L)(0) === W.toFloat && out(1L)(1) === H.toFloat)
    assert(math.abs(out(1L)(2) - exp.meanR) < 1e-4)
    assert(out(1L)(7) === 1.0f)
    // JPEG: decoded (not byte-stats fallback) — dims exact, image flag
    assert(out(2L)(0) === W.toFloat && out(2L)(1) === H.toFloat)
    assert(out(2L)(7) === 1.0f)
  }

  // ---- perceptual hash ----------------------------------------------------

  // 64×64 gradient image seeded by `seed` (structured low-frequency
  // content — what a DCT hash discriminates); `flip` changes one pixel
  private def gradPix(seed: Long, flip: Boolean)(
      x: Int, y: Int): (Int, Int, Int) = {
    val v = ((x * ((seed % 7) + 1) + y * ((seed * 3) % 11 + 2)) * 3
      % 200).toInt
    if (flip && x == 3 && y == 3) (255 - v, 0, 7)
    else (v, (v + 40) % 200, (v + 80) % 200)
  }

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("perceptual hash: container-independent, brightness-invariant, " +
    "near-dups close and distinct images far") {
    val S = 64
    val base = MediaCodecs.perceptualHash64(
      encodeBmp(S, S, gradPix(1, flip = false))).get
    // same pixels, different container → identical hash
    val viaPpm = MediaCodecs.perceptualHash64(
      encodePpm(S, S, gradPix(1, flip = false))).get
    assert(viaPpm === base)
    // uniform (non-saturating: values < 200) brightness shift → the DC
    // term moves, the median-relative AC bits do not
    val brighter = MediaCodecs.perceptualHash64(encodeBmp(S, S, (x, y) => {
      val (r, g, b) = gradPix(1, flip = false)(x, y)
      (r + 20, g + 20, b + 20)
    })).get
    assert(ham(base, brighter) <= 2,
      s"brightness shift moved ${ham(base, brighter)} bits")
    // one-pixel change → small distance
    val nearDup = MediaCodecs.perceptualHash64(
      encodeBmp(S, S, gradPix(1, flip = true))).get
    assert(ham(base, nearDup) <= 10,
      s"near-dup at distance ${ham(base, nearDup)}")
    // different gradients → far
    val others = (2L to 9L).map(s => MediaCodecs.perceptualHash64(
      encodeBmp(S, S, gradPix(s, flip = false))).get)
    others.foreach(o =>
      assert(ham(base, o) > 10, s"distinct image at distance ${ham(base, o)}"))
    // undecodable payload → None, never a junk hash
    assert(MediaCodecs.perceptualHash64("not an image".getBytes) === None)
  }

  // ---- audio fingerprint --------------------------------------------------

  /** Seeded 33-note melody (hashed per-note frequency and amplitude),
    * quantized to PCM-16 at amplitude `amp` — the independent test-side
    * analog of the synthetic generator, so gain invariance is exercised
    * through real quantization. */
  private def toneWav(seed: Long, amp: Double, sr: Int = 8000,
      n: Int = 2048): Array[Byte] = {
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val samples = Array.tabulate[Short](n) { i =>
      val k = (i.toLong * 33 / n).toInt
      val hk = mix(seed * 33 + k)
      val freq = 400.0 + java.lang.Long.remainderUnsigned(hk, 12) * 250.0
      val a = 0.45 + java.lang.Long.remainderUnsigned(hk >>> 8, 8) * 0.07
      val t = i.toDouble / sr
      val v = a * math.sin(2 * math.Pi * freq * t)
      math.round(math.max(-1.0, math.min(1.0, v)) * amp).toShort
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes); u32(36 + n * 2); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); u32(16)
    u16(1); u16(1); u32(sr); u32(sr * 2); u16(2); u16(16)
    out.write("data".getBytes); u32(n * 2)
    samples.foreach(s => u16(s & 0xFFFF))
    out.toByteArray
  }

  test("audio fingerprint: gain-invariant, near-dups close, distinct " +
    "recordings far, malformed → None") {
    val base = MediaCodecs.audioFingerprint64(toneWav(1, 30000)).get
    // the same recording re-encoded at 1/3 the gain: energy and ZCR bits
    // compare ratios of like quantities, so only PCM quantization noise
    // can move a bit
    val quiet = MediaCodecs.audioFingerprint64(toneWav(1, 10000)).get
    assert(ham(base, quiet) <= 2,
      s"gain change moved ${ham(base, quiet)} bits")
    // distinct seeds → different envelope and carriers → far
    val others = (2L to 9L).map(s =>
      MediaCodecs.audioFingerprint64(toneWav(s, 30000)).get)
    others.foreach(o => assert(ham(base, o) > 10,
      s"distinct recording at distance ${ham(base, o)}"))
    // too short to window, or not PCM-16 → None
    assert(MediaCodecs.audioFingerprint64(toneWav(1, 30000, n = 40)) === None)
    assert(MediaCodecs.audioFingerprint64("RIFFxxxxWAVE".getBytes) === None)
  }

  test("audioNearDups finds exactly the planted perceptual pairs") {
    import spark.implicits._
    val assets = Multimodal.syntheticWavs(spark,
      spark.range(0, 60).toDF("id"), "id", nearDupEvery = 10)
    val pairs = Multimodal.audioNearDups(spark, assets, maxHamming = 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0) min r.getLong(1),
        r.getLong(0) max r.getLong(1))).toSet
    // ids 10,20,30,40,50 are gain+noise re-recordings of 9,19,29,39,49
    val planted = Set((9L, 10L), (19L, 20L), (29L, 30L), (39L, 40L),
      (49L, 50L))
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${(planted -- pairs).mkString(",")}")
    assert((pairs -- planted).isEmpty,
      s"unexpected pairs: ${(pairs -- planted).mkString(",")}")
  }

  // ---- video (concatenated-PPM stream) ------------------------------------

  test("ppmFrames splits a concatenated P6 stream into exact per-frame " +
    "slices; malformed tails degrade to the frames before them") {
    val f1 = encodePpm(W, H, pix)
    val f2 = encodePpm(4, 4, (x, y) => (x * 50, y * 50, 128))
    val stream = f1 ++ f2 ++ f1
    val frames = MediaCodecs.ppmFrames(stream)
    assert(frames.length === 3)
    assert(frames(0) === f1 && frames(1) === f2 && frames(2) === f1)
    // each slice decodes exactly like the standalone frame
    assert(MediaCodecs.decodePpm(frames(1)) === MediaCodecs.decodePpm(f2))
    // truncated last frame → only the whole frames come back
    assert(MediaCodecs.ppmFrames(stream.dropRight(5)).length === 2)
    assert(MediaCodecs.ppmFrames("not a video".getBytes) === Nil)
  }

  test("sceneChanges finds exactly the planted mid-clip cut; near-dup " +
    "videos match frame-by-frame in videoNearDups") {
    import spark.implicits._
    val assets = Multimodal.syntheticVideos(spark,
      spark.range(0, 60).toDF("id"), "id",
      side = 16, frames = 8, nearDupEvery = 10)
    // every clip has scenes at frames 0-3 and 4-7 → one cut at frame 4
    val cuts = Multimodal.sceneChanges(spark, assets, minHamming = 16)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(cuts.length === 60, s"expected 60 cuts, got ${cuts.length}")
    assert(cuts.forall(_._2 === 4),
      s"cuts off the scene boundary: ${cuts.filter(_._2 != 4).mkString(",")}")
    // near-dup videos: one-pixel-perturbed re-paints of the previous id
    val pairs = Multimodal.videoNearDups(spark, assets,
      maxHamming = 10, minMatchedFrames = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0) min r.getLong(1),
        r.getLong(0) max r.getLong(1))).toSet
    val planted = Set((9L, 10L), (19L, 20L), (29L, 30L), (39L, 40L),
      (49L, 50L))
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${(planted -- pairs).mkString(",")}")
    assert((pairs -- planted).isEmpty,
      s"unexpected pairs: ${(pairs -- planted).mkString(",")}")
  }

  test("imageNearDups finds exactly the planted perceptual pairs") {
    import spark.implicits._
    val assets = Multimodal.syntheticImages(spark,
      spark.range(0, 60).toDF("id"), "id", side = 16, nearDupEvery = 10)
    val pairs = Multimodal.imageNearDups(spark, assets, maxHamming = 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0) min r.getLong(1),
        r.getLong(0) max r.getLong(1))).toSet
    // ids 10,20,30,40,50 are one-pixel variants of 9,19,29,39,49
    val planted = Set((9L, 10L), (19L, 20L), (29L, 30L), (39L, 40L),
      (49L, 50L))
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${(planted -- pairs).mkString(",")}")
    // nothing else collides at this threshold on distinct patterns
    assert((pairs -- planted).isEmpty,
      s"unexpected pairs: ${(pairs -- planted).mkString(",")}")
  }
}
