package graft.ops

/** Pure-JVM media decoders for the multimodal kernel slot: 24-bit
  * uncompressed BMP, binary PPM (P6), and 16-bit PCM WAV. No codec
  * libraries, no native code — each is a single forward pass over the
  * byte array that accumulates the statistics the feature kernel emits,
  * never materializing a decoded pixel/sample buffer (a 100 MP image
  * costs O(1) memory here).
  *
  * Anything malformed or out of the supported profile returns None — the
  * caller falls back to its byte-level fallback feature, so one corrupt
  * asset can never fail a 100 TB extraction job (same failure discipline
  * as the bundle XML path).
  */
object MediaCodecs {

  /** Decoded-image summary: dimensions, per-channel means, and the mean /
    * population-stddev of Rec.601 luma (0.299 R + 0.587 G + 0.114 B). */
  final case class ImageStats(width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double,
      lumaMean: Double, lumaStd: Double)

  /** Decoded-audio summary over channel-averaged PCM samples normalized
    * to [-1, 1]: mean absolute amplitude, RMS, zero-crossing rate, and
    * duration from the fmt-chunk sample rate. */
  final case class AudioStats(sampleRate: Int, nSamples: Int,
      meanAbs: Double, rms: Double, zeroCrossRate: Double) {
    def durationMs: Double =
      if (sampleRate <= 0) 0.0 else nSamples * 1000.0 / sampleRate
  }

  /** Container sniff by magic bytes:
    * "bmp" | "ppm" | "wav" | "jpeg" | "png" | "unknown". */
  def sniff(b: Array[Byte]): String =
    if (b == null) "unknown"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') "ppm"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') "wav"
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) "jpeg"
    else if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G' && (b(4) & 0xFF) == 0x0D &&
      (b(5) & 0xFF) == 0x0A && (b(6) & 0xFF) == 0x1A &&
      (b(7) & 0xFF) == 0x0A) "png"
    else "unknown"

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** One-pass RGB accumulator shared by both image decoders. */
  private final class RgbAcc {
    var n = 0L
    var sr, sg, sb, sl, sl2 = 0.0
    def add(r: Int, g: Int, bl: Int): Unit = {
      n += 1; sr += r; sg += g; sb += bl
      val l = 0.299 * r + 0.587 * g + 0.114 * bl
      sl += l; sl2 += l * l
    }
    def stats(w: Int, h: Int): Option[ImageStats] =
      if (n != w.toLong * h) None
      else {
        val m = sl / n
        Some(ImageStats(w, h, sr / n, sg / n, sb / n, m,
          math.sqrt(math.max(sl2 / n - m * m, 0.0))))
      }
  }

  /** Decode a 24-bit uncompressed (BI_RGB) BMP. Rows are 4-byte aligned
    * and stored bottom-up (negative biHeight = top-down); pixels are
    * accumulated in IMAGE row-major order regardless of storage order, so
    * the same pixels produce bit-identical float statistics from any
    * supported container (pinned by the PPM ≡ BMP differential test). */
  def decodeBmp(b: Array[Byte]): Option[ImageStats] = try {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = i32(b, 10)
    val width = i32(b, 18)
    val rawHeight = i32(b, 22)
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height == 0)
      return None
    val stride = (width * 3 + 3) & ~3
    if (dataOffset.toLong + stride.toLong * height > b.length) return None
    val acc = new RgbAcc
    var row = 0
    while (row < height) {
      val storageRow = if (bottomUp) height - 1 - row else row
      var o = dataOffset + storageRow * stride
      var x = 0
      while (x < width) {
        // BMP stores BGR
        acc.add(b(o + 2) & 0xFF, b(o + 1) & 0xFF, b(o) & 0xFF)
        o += 3; x += 1
      }
      row += 1
    }
    acc.stats(width, height)
  } catch { case _: RuntimeException => None }

  /** Decode a binary PPM (P6, maxval 255): ASCII header (with `#`
    * comments) then raw RGB triplets. */
  def decodePpm(b: Array[Byte]): Option[ImageStats] = try {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var pos = 2
    // read the next ASCII token, skipping whitespace and # comments
    def token(): Option[String] = {
      while (pos < b.length &&
        (Character.isWhitespace(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') while (pos < b.length && b(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < b.length && !Character.isWhitespace(b(pos))) pos += 1
      if (pos > start) Some(new String(b, start, pos - start, "US-ASCII"))
      else None
    }
    val hdr = Seq(token(), token(), token())
    if (hdr.exists(_.isEmpty)) return None
    val Seq(w, h, maxv) = hdr.map(_.get.toInt)
    pos += 1 // exactly one whitespace byte separates header and raster
    if (w <= 0 || h <= 0 || maxv != 255 ||
      pos.toLong + 3L * w * h > b.length) return None
    val acc = new RgbAcc
    var i = 0
    val n = w * h
    while (i < n) {
      val o = pos + i * 3
      acc.add(b(o) & 0xFF, b(o + 1) & 0xFF, b(o + 2) & 0xFF)
      i += 1
    }
    acc.stats(w, h)
  } catch { case _: RuntimeException => None }

  /** Decode a JPEG or PNG through the JDK's built-in `javax.imageio`
    * readers (headless-safe, zero external dependencies) into the same
    * one-pass [[ImageStats]] the hand-rolled BMP/PPM decoders produce —
    * the path a REAL multimodal corpus (overwhelmingly JPEG/PNG) takes.
    *
    * Unlike the streaming BMP/PPM passes this necessarily materializes
    * the decoded raster (ImageIO's contract), so memory is O(pixels) per
    * asset being decoded — bounded per executor core by the
    * one-asset-at-a-time mapPartitions kernels that call it. Pixels are
    * read through `getRGB` (sRGB-converted), so grayscale/palette/alpha
    * sources all land in the same RGB space. Returns None on malformed
    * bytes or any reader error — degrade, never fail. */
  def decodeImageIO(b: Array[Byte]): Option[ImageStats] = try {
    val kind = sniff(b)
    if (kind != "jpeg" && kind != "png") return None
    javax.imageio.ImageIO.setUseCache(false) // no temp-file disk cache
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val acc = new RgbAcc
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        acc.add((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
        x += 1
      }
      y += 1
    }
    acc.stats(w, h)
  } catch { case _: Exception => None }

  /** Decode a RIFF/WAVE file with PCM (format 1) 16-bit samples. Walks
    * the chunk list for `fmt ` and `data`; multi-channel audio is mixed
    * down by per-frame channel averaging before the statistics. */
  def decodeWav(b: Array[Byte]): Option[AudioStats] = try {
    if (sniff(b) != "wav") return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = i32(b, pos + 4)
      if (len < 0 || pos + 8 + len > b.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = u16(b, pos + 8)
        channels = u16(b, pos + 10)
        sampleRate = i32(b, pos + 12)
        bits = u16(b, pos + 22)
        fmtOk = audioFormat == 1
      } else if (id == "data") {
        dataOff = pos + 8; dataLen = len
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (!fmtOk || bits != 16 || channels <= 0 || sampleRate <= 0 ||
      dataOff < 0) return None
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    if (nFrames == 0) return Some(AudioStats(sampleRate, 0, 0.0, 0.0, 0.0))
    var sAbs, s2 = 0.0
    var crossings = 0L
    var prevSign = 0
    var i = 0
    while (i < nFrames) {
      var c = 0
      var acc = 0.0
      val base = dataOff + i * frameBytes
      while (c < channels) {
        acc += u16(b, base + 2 * c).toShort.toInt
        c += 1
      }
      val v = acc / channels / 32768.0
      sAbs += math.abs(v); s2 += v * v
      val sign = java.lang.Double.compare(v, 0.0).sign
      if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
      if (sign != 0) prevSign = sign
      i += 1
    }
    Some(AudioStats(sampleRate, nFrames, sAbs / nFrames,
      math.sqrt(s2 / nFrames),
      if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0))
  } catch { case _: RuntimeException => None }

  /** Split a concatenated binary-PPM stream (the `image2pipe` video
    * interchange format: P6 frames back-to-back) into per-frame byte
    * slices. Stops at the first malformed frame (returning the frames
    * before it); a non-PPM payload yields Nil — degrade, never fail. */
  def ppmFrames(b: Array[Byte]): Seq[Array[Byte]] = try {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos + 2 <= b.length && b(pos) == 'P' && b(pos + 1) == '6') {
      val start = pos
      pos += 2
      def token(): Option[String] = {
        while (pos < b.length &&
          (Character.isWhitespace(b(pos)) || b(pos) == '#')) {
          if (b(pos) == '#') while (pos < b.length && b(pos) != '\n') pos += 1
          else pos += 1
        }
        val s = pos
        while (pos < b.length && !Character.isWhitespace(b(pos))) pos += 1
        if (pos > s) Some(new String(b, s, pos - s, "US-ASCII")) else None
      }
      val hdr = Seq(token(), token(), token())
      if (hdr.exists(_.isEmpty)) return out.toSeq
      val Seq(w, h, maxv) = hdr.map(_.get.toInt)
      pos += 1 // single whitespace byte before the raster
      if (w <= 0 || h <= 0 || maxv != 255 ||
        pos.toLong + 3L * w * h > b.length) return out.toSeq
      pos += 3 * w * h
      out += java.util.Arrays.copyOfRange(b, start, pos)
    }
    out.toSeq
  } catch { case _: RuntimeException => Nil }

  /** 64-bit audio fingerprint over REAL decoded PCM (energy/ZCR-delta
    * family, the pure-JVM shape of a Haitsma–Kalker fingerprint): the
    * channel-averaged signal is split into 33 equal time windows; per
    * window we take mean energy (amplitude envelope) and zero-crossing
    * rate (a crude spectral proxy); bit `2k` is set iff window `k+1` has
    * higher mean energy than window `k`, bit `2k+1` iff it has a higher
    * crossing rate. Both measures compare RATIOS of like quantities, so
    * the fingerprint is invariant under positive gain and robust to mild
    * noise/re-encode — copies of one recording land within a small
    * Hamming distance and drop into the same chunk-LSH banding as
    * SimHash/pHash. Returns None for non-PCM-16 payloads or clips too
    * short to window (< 2 frames per window) — degrade, never fail. */
  def audioFingerprint64(b: Array[Byte]): Option[Long] = try {
    if (sniff(b) != "wav") return None
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val len = i32(b, pos + 4)
      if (len < 0 || pos + 8 + len > b.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        fmtOk = u16(b, pos + 8) == 1
        channels = u16(b, pos + 10)
        sampleRate = i32(b, pos + 12)
        bits = u16(b, pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8; dataLen = len
      }
      pos += 8 + len + (len & 1)
    }
    if (!fmtOk || bits != 16 || channels <= 0 || sampleRate <= 0 ||
      dataOff < 0) return None
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    val W = 33 // 32 adjacent-window deltas × 2 measures = 64 bits
    if (nFrames < 2 * W) return None
    val energy = new Array[Double](W)
    val cross = new Array[Long](W)
    val count = new Array[Long](W)
    var prevSign = 0
    var i = 0
    while (i < nFrames) {
      val w = (i.toLong * W / nFrames).toInt
      var c = 0
      var acc = 0.0
      val base = dataOff + i * frameBytes
      while (c < channels) {
        acc += u16(b, base + 2 * c).toShort.toInt
        c += 1
      }
      val v = acc / channels / 32768.0
      energy(w) += v * v
      count(w) += 1
      val sign = java.lang.Double.compare(v, 0.0).sign
      if (sign != 0 && prevSign != 0 && sign != prevSign) cross(w) += 1
      if (sign != 0) prevSign = sign
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 32) {
      if (energy(k + 1) / count(k + 1) > energy(k) / count(k))
        fp |= (1L << (2 * k))
      if (cross(k + 1).toDouble / count(k + 1) >
        cross(k).toDouble / count(k))
        fp |= (1L << (2 * k + 1))
      k += 1
    }
    Some(fp)
  } catch { case _: RuntimeException => None }

  // ---- perceptual hashing --------------------------------------------------

  /** Random-access luma accessor over a supported image container
    * (24-bit BMP or binary PPM), or None if undecodable. */
  private def lumaAt(b: Array[Byte]): Option[(Int, Int, (Int, Int) => Double)] = {
    def luma(r: Int, g: Int, bl: Int): Double =
      0.299 * r + 0.587 * g + 0.114 * bl
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
      val dataOffset = i32(b, 10)
      val width = i32(b, 18)
      val rawHeight = i32(b, 22)
      val height = math.abs(rawHeight)
      val bottomUp = rawHeight > 0
      if (u16(b, 28) != 24 || i32(b, 30) != 0 || width <= 0 || height == 0)
        return None
      val stride = (width * 3 + 3) & ~3
      if (dataOffset.toLong + stride.toLong * height > b.length) return None
      Some((width, height, (x, y) => {
        val row = if (bottomUp) height - 1 - y else y
        val o = dataOffset + row * stride + x * 3
        luma(b(o + 2) & 0xFF, b(o + 1) & 0xFF, b(o) & 0xFF) // BGR
      }))
    } else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      var pos = 2
      def token(): Option[String] = {
        while (pos < b.length &&
          (Character.isWhitespace(b(pos)) || b(pos) == '#')) {
          if (b(pos) == '#') while (pos < b.length && b(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < b.length && !Character.isWhitespace(b(pos))) pos += 1
        if (pos > start) Some(new String(b, start, pos - start, "US-ASCII"))
        else None
      }
      val hdr = Seq(token(), token(), token())
      if (hdr.exists(_.isEmpty)) return None
      val Seq(w, h, maxv) = hdr.map(_.get.toInt)
      pos += 1
      if (w <= 0 || h <= 0 || maxv != 255 ||
        pos.toLong + 3L * w * h > b.length) return None
      val dataStart = pos
      Some((w, h, (x, y) => {
        val o = dataStart + (y * w + x) * 3
        luma(b(o) & 0xFF, b(o + 1) & 0xFF, b(o + 2) & 0xFF)
      }))
    } else if (sniff(b) == "jpeg" || sniff(b) == "png") {
      // ImageIO path: the decoded raster is materialized once and the
      // accessor reads from it — O(pixels) memory for the duration of
      // the hash computation, then collected (see decodeImageIO doc)
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else Some((img.getWidth, img.getHeight, (x, y) => {
          val p = img.getRGB(x, y)
          luma((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
        }))
      } catch { case _: Exception => None }
    } else None
  }

  /** `g`×`g` luma grid sampled nearest-neighbor from the image (works for
    * images smaller OR larger than the grid; deterministic, no full
    * decoded buffer). Row-major. */
  def lumaGrid(b: Array[Byte], g: Int): Option[Array[Double]] = try {
    lumaAt(b).map { case (w, h, at) =>
      val out = new Array[Double](g * g)
      var i = 0
      while (i < g) {
        val y = i * h / g
        var j = 0
        while (j < g) {
          out(i * g + j) = at(j * w / g, y)
          j += 1
        }
        i += 1
      }
      out
    }
  } catch { case _: RuntimeException => None }

  /** 64-bit DCT perceptual hash (classic pHash shape): 32×32 luma grid →
    * orthonormal 2-D DCT-II → the 8×8 lowest-frequency block → bit i set
    * iff coefficient i exceeds the MEDIAN of the 63 AC coefficients (the
    * DC term is excluded from the median and contributes bit 0 against
    * that same median, so uniform brightness shifts do not flip bits).
    * Near-identical images land within a small Hamming distance; the
    * hash drops into the same chunk-LSH banding as SimHash. */
  def perceptualHash64(b: Array[Byte]): Option[Long] = {
    val G = 32
    lumaGrid(b, G).map { grid =>
      // separable DCT: rows then columns, only the first 8 output
      // frequencies of each dimension are needed
      val K = 8
      val cosTab = Array.tabulate(K, G)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * G)))
      def a(u: Int): Double =
        if (u == 0) math.sqrt(1.0 / G) else math.sqrt(2.0 / G)
      val rows = Array.ofDim[Double](G, K) // row-transformed, 8 freqs
      var y = 0
      while (y < G) {
        var u = 0
        while (u < K) {
          var s = 0.0
          var x = 0
          while (x < G) { s += grid(y * G + x) * cosTab(u)(x); x += 1 }
          rows(y)(u) = a(u) * s
          u += 1
        }
        y += 1
      }
      val coeffs = new Array[Double](K * K)
      var v = 0
      while (v < K) {
        var u = 0
        while (u < K) {
          var s = 0.0
          var yy = 0
          while (yy < G) { s += rows(yy)(u) * cosTab(v)(yy); yy += 1 }
          coeffs(v * K + u) = a(v) * s
          u += 1
        }
        v += 1
      }
      val ac = coeffs.drop(1).sorted
      val median = ac(ac.length / 2) // 63 ACs → element 31
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (coeffs(i) > median) bits |= (1L << i)
        i += 1
      }
      bits
    }
  }
}
