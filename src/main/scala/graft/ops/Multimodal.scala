package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training pipelines.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct.
  * The decode/resize/frame-sample kernels would normally call native codec
  * libraries; those libs are not in this container, so the *kernels* are
  * deterministic fakes (clearly marked) while everything Spark-side — the
  * schema, the batched mapPartitions shape (the Scala analog of
  * `mapInPandas`: iterator-of-batches in, iterator-of-batches out, nothing
  * materialized per-partition), partitioning, and the exploded frame layout —
  * is real and tested.
  */
object Multimodal {

  /** Canonical multimodal asset schema: id + media kind + raw bytes + typed
    * metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType),           // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))))))

  /** Build a deterministic fake asset table from any id column (for tests and
    * for exercising the plumbing without codec libs). */
  def syntheticAssets(spark: SparkSession, ids: DataFrame,
      idCol: String): DataFrame = {
    ids.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      // FAKE payload: deterministic bytes derived from the id
      unbase64(base64(concat(lit("PAYLOAD:"), col(idCol).cast("string"))
        .cast("binary"))).as("payload"),
      struct(
        (pmod(col(idCol).cast("long"), lit(64)) * 16 + 16).cast("int")
          .as("width"),
        (pmod(col(idCol).cast("long"), lit(48)) * 16 + 16).cast("int")
          .as("height"),
        (pmod(col(idCol).cast("long"), lit(120)) * 1000).cast("long")
          .as("duration_ms"),
        lit("application/x-fake").as("mime")).as("meta"))
  }

  /** Feature-extraction output schema. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Batched feature extraction over binary payloads.
    *
    * Shape: `mapPartitions` with an iterator-in/iterator-out kernel — the
    * Scala analog of `mapInPandas` batches. The kernel sniffs the payload's
    * container magic and runs a REAL pure-JVM decoder where one exists
    * ([[MediaCodecs]]: 24-bit BMP, binary PPM, 16-bit PCM WAV — one-pass
    * statistics, no decoded buffer materialized); unrecognized or
    * malformed payloads fall back to the deterministic byte-stats feature
    * (clearly a fake — the slot where a codec library would plug in for
    * formats the JVM can't decode), so a corrupt asset degrades instead of
    * failing the job. Decoded features carry a discriminator in the last
    * slot (1 = image, 2 = audio); fallback features are raw byte stats.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    Similarity.widenForCompute(assets.select("asset_id", "kind", "payload"))
      .mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val payload = r.getAs[Array[Byte]](2)
        val n = if (payload == null) 0 else payload.length
        def imageFeature(s: MediaCodecs.ImageStats): Array[Float] = Array(
          s.width.toFloat, s.height.toFloat, s.meanR.toFloat,
          s.meanG.toFloat, s.meanB.toFloat, s.lumaMean.toFloat,
          s.lumaStd.toFloat, 1.0f)
        val decoded: Option[Array[Float]] = MediaCodecs.sniff(payload) match {
          case "bmp" | "ppm" =>
            (if (payload(0) == 'B') MediaCodecs.decodeBmp(payload)
             else MediaCodecs.decodePpm(payload)).map(imageFeature)
          case "jpeg" | "png" =>
            MediaCodecs.decodeImageIO(payload).map(imageFeature)
          case "wav" => MediaCodecs.decodeWav(payload).map(s => Array(
            s.sampleRate.toFloat, s.nSamples.toFloat, s.meanAbs.toFloat,
            s.rms.toFloat, s.zeroCrossRate.toFloat, s.durationMs.toFloat,
            0.0f, 2.0f))
          case _ => None
        }
        // FAKE fallback kernel: deterministic 8-dim byte-stats feature —
        // the slot where a codec library would plug in for formats the
        // JVM can't decode (MP4/MP3/WebP/...; JPEG+PNG are real via
        // ImageIO, BMP/PPM/WAV via the hand-rolled one-pass decoders).
        val feature = decoded.getOrElse((0 until 8).map { i =>
          if (n == 0) 0.0f
          else payload.iterator.zipWithIndex
            .filter(_._2 % 8 == i).map(_._1.toInt & 0xFF).sum.toFloat / n
        }.toArray)
        Row(id, kind, n, feature)
      }
    }(enc).toDF()
  }

  /** Synthetic REAL 24-bit BMP images keyed by id: a deterministic
    * id-seeded LINEAR GRADIENT (direction and frequency from the id —
    * structured low-frequency content, which is what a DCT perceptual
    * hash discriminates; block noise would make every image look alike
    * to it), with every `nearDupEvery`-th id painting the PREVIOUS id's
    * gradient plus a one-pixel change — planted perceptual
    * near-duplicates for [[imageNearDups]]. The payloads are genuine BMP
    * containers that [[MediaCodecs]] decodes. */
  def syntheticImages(spark: SparkSession, ids: DataFrame, idCol: String,
      side: Int = 16, nearDupEvery: Int = 10): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType))))
    Similarity.widenForCompute(
        ids.select(col(idCol).cast("long").as("asset_id")))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val base = if (id % nearDupEvery == 0 && id > 0) id - 1 else id
          val flip = id % nearDupEvery == 0 && id > 0
          val gx = (base % 7) + 1
          val gy = ((base / 7) % 11) + 2
          Row(id, encodeBmp24(side, side, (x, y) => {
            val v = ((x * gx + y * gy) * 12 % 200).toInt
            if (flip && x == 3 && y == 3) (255 - v, 0, 7)
            else (v, (v + 40) % 200, (v + 80) % 200)
          }))
        }
      }(enc).toDF()
  }

  /** Minimal 24-bit BMP encoder (BI_RGB, bottom-up) for the synthetic
    * image payloads. */
  def encodeBmp24(w: Int, h: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val dataSize = stride * h
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M'); u32(54 + dataSize); u32(0); u32(54)
    u32(40); u32(w); u32(h); u16(1); u16(24); u32(0); u32(dataSize)
    u32(2835); u32(2835); u32(0); u32(0)
    var row = h - 1 // bottom-up storage
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, row)
        out.write(b); out.write(g); out.write(r)
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { out.write(0); pad -= 1 }
      row -= 1
    }
    out.toByteArray
  }

  /** Minimal mono RIFF/WAVE PCM-16 encoder for the synthetic audio
    * payloads. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); u32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); u32(16)
    u16(1); u16(1); u32(sampleRate); u32(sampleRate * 2); u16(2); u16(16)
    out.write("data".getBytes("US-ASCII")); u32(dataLen)
    samples.foreach(s => u16(s & 0xFFFF))
    out.toByteArray
  }

  /** Synthetic REAL PCM-16 WAV clips keyed by id: an id-seeded 33-note
    * "melody" — each note gets a hashed frequency and amplitude, so the
    * fingerprint's zero-crossing bits (frequency steps) and energy bits
    * (amplitude steps) are both high-entropy, the way real audio is; a
    * stationary tone would make every clip look alike to an envelope
    * fingerprint. Every `nearDupEvery`-th id re-records the PREVIOUS id's
    * melody at 0.8× gain plus ~1% deterministic noise — planted
    * perceptual near-duplicates for [[audioNearDups]]. Payloads are
    * genuine WAV containers that [[MediaCodecs]] decodes. */
  def syntheticWavs(spark: SparkSession, ids: DataFrame, idCol: String,
      nSamples: Int = 2048, sampleRate: Int = 8000,
      nearDupEvery: Int = 10): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType))))
    Similarity.widenForCompute(
        ids.select(col(idCol).cast("long").as("asset_id")))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val dup = id % nearDupEvery == 0 && id > 0
          val base = if (dup) id - 1 else id
          val gain = if (dup) 0.8 else 1.0
          var noise = base * 2654435761L + 1 // LCG state, id-seeded
          def mix(x: Long): Long = { // splitmix64 finalizer
            var z = x + 0x9E3779B97F4A7C15L
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            z ^ (z >>> 31)
          }
          val W = 33 // notes aligned with the fingerprint's windows
          val samples = Array.tabulate[Short](nSamples) { i =>
            val k = (i.toLong * W / nSamples).toInt
            val hk = mix(base * W + k)
            val freq = 400.0 + java.lang.Long.remainderUnsigned(hk, 12) * 250.0
            val amp = 0.45 +
              java.lang.Long.remainderUnsigned(hk >>> 8, 8) * 0.07
            val t = i.toDouble / sampleRate
            var v = amp * math.sin(2 * math.Pi * freq * t) * gain
            if (dup) {
              noise = noise * 6364136223846793005L + 1442695040888963407L
              v += ((noise >>> 40).toDouble / (1L << 24) - 0.5) * 0.02
            }
            math.round(math.max(-1.0, math.min(1.0, v)) * 30000).toShort
          }
          Row(id, encodeWavPcm16(sampleRate, samples))
        }
      }(enc).toDF()
  }

  /** 64-bit audio fingerprint per asset (null for payloads no decoder
    * recognizes). Same mapPartitions kernel shape as [[perceptualHashes]]. */
  def audioFingerprints(spark: SparkSession, assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = true))))
    Similarity.widenForCompute(assets.select("asset_id", "payload"))
      .mapPartitions { it =>
      it.map { r =>
        val fp = MediaCodecs.audioFingerprint64(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), fp.map(java.lang.Long.valueOf).orNull)
      }
    }(enc).toDF()
  }

  /** The RELATIONAL TAIL shared by every signature-level media dedup
    * ([[imageNearDups]], [[audioNearDups]], the incremental stream):
    * two-cover 16-bit chunk-LSH banding over 64-bit signatures → capped
    * bucket pair expansion (never a self-join) → exact Hamming verify.
    * Exposed on its own so the tail can be driven — and oracle-verified —
    * from a signature table constructed relationally, independent of the
    * decode kernels (which no SQL engine can run; they are pinned by
    * MediaCodecsSpec instead). Input columns: `id` (long), `sig` (long);
    * output (id_a, id_b, hamming) with id_a < id_b. */
  def nearDupsFromSignatures(sigs: DataFrame, maxHamming: Int = 10,
      maxBucketSize: Int = 2000): DataFrame =
    Dedup.simhashPairsFromSigs(sigs, maxHamming, maxBucketSize)

  /** Perceptual near-duplicate audio pairs: energy/ZCR fingerprint → the
    * same two-cover 16-bit chunk-LSH banding as SimHash/pHash (capped
    * buckets, no self-join) → exact Hamming verify. The audio analog of
    * [[imageNearDups]]: gain-changed / lightly-noised copies of one
    * recording land within a few bits. */
  def audioNearDups(spark: SparkSession, assets: DataFrame,
      maxHamming: Int = 10, maxBucketSize: Int = 2000): DataFrame =
    nearDupsFromSignatures(
      audioFingerprints(spark, assets)
        .where(col("afp").isNotNull)
        .select(col("asset_id").as("id"), col("afp").as("sig")),
      maxHamming, maxBucketSize)

  /** 64-bit DCT perceptual hash per image asset (null for payloads no
    * decoder recognizes — degrade, don't fail). mapPartitions kernel like
    * [[extractFeatures]]: binary in, one long out, nothing Catalyst could
    * express. */
  def perceptualHashes(spark: SparkSession, assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = true))))
    Similarity.widenForCompute(assets.select("asset_id", "payload"))
      .mapPartitions { it =>
      it.map { r =>
        val hash = MediaCodecs.perceptualHash64(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), hash.map(java.lang.Long.valueOf).orNull)
      }
    }(enc).toDF()
  }

  /** Perceptual near-duplicate image pairs: pHash → the same two-cover
    * 16-bit chunk-LSH banding as SimHash (capped buckets, no self-join)
    * → exact Hamming verify. The standard image-dedup shape for a
    * training corpus: re-encoded/recompressed copies of one image land
    * within a few bits of each other. */
  def imageNearDups(spark: SparkSession, assets: DataFrame,
      maxHamming: Int = 10, maxBucketSize: Int = 2000): DataFrame =
    nearDupsFromSignatures(
      perceptualHashes(spark, assets)
        .where(col("phash").isNotNull)
        .select(col("asset_id").as("id"), col("phash").as("sig")),
      maxHamming, maxBucketSize)

  /** Minimal binary-PPM (P6) encoder for synthetic frames. */
  def encodePpm6(w: Int, h: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + 3 * w * h)
    out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      out.write(r); out.write(g); out.write(b)
    }
    out.toByteArray
  }

  /** Synthetic REAL videos keyed by id: concatenated binary-PPM frames
    * (the `image2pipe` stream format [[MediaCodecs.ppmFrames]] splits),
    * `frames` frames per clip in TWO scenes — the first half paints one
    * id-seeded gradient, the second half a different one, so a scene
    * boundary is planted mid-clip for [[sceneChanges]]. Every
    * `nearDupEvery`-th id repaints the PREVIOUS id's frames with a
    * one-pixel change per frame — planted near-duplicate videos for
    * [[videoNearDups]]. */
  def syntheticVideos(spark: SparkSession, ids: DataFrame, idCol: String,
      side: Int = 16, frames: Int = 8, nearDupEvery: Int = 10): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType))))
    Similarity.widenForCompute(
        ids.select(col(idCol).cast("long").as("asset_id")))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val dup = id % nearDupEvery == 0 && id > 0
          val base = if (dup) id - 1 else id
          val out = new java.io.ByteArrayOutputStream()
          var f = 0
          while (f < frames) {
            val scene = if (f < frames / 2) 0 else 1
            val seed = base * 2 + scene
            val gx = (seed % 7) + 1
            val gy = ((seed / 7) % 11) + 2
            // third seeded parameter: sawtooth frequency (an additive
            // offset would be a brightness shift, which pHash ignores)
            val m = 12 + ((seed / 77) % 5) * 7
            out.write(encodePpm6(side, side, (x, y) => {
              val v = ((x * gx + y * gy) * m % 200).toInt
              // a moderate single-pixel shift (full inversion overshoots
              // Hamming 10 on some gradients at this frame size)
              if (dup && x == 3 && y == 3)
                (math.min(v + 90, 255), (v + 40) % 200, (v + 80) % 200)
              else (v, (v + 40) % 200, (v + 80) % 200)
            }))
            f += 1
          }
          Row(id, out.toByteArray)
        }
      }(enc).toDF()
  }

  /** Per-frame 64-bit DCT perceptual hash for video assets: the kernel
    * splits the PPM stream and hashes each REAL decoded frame; one row
    * per (asset, frame index). Undecodable payloads yield no rows —
    * degrade, never fail. */
  def videoFrameHashes(spark: SparkSession, assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("phash", LongType, nullable = false))))
    Similarity.widenForCompute(assets.select("asset_id", "payload"))
      .mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        MediaCodecs.ppmFrames(r.getAs[Array[Byte]](1)).iterator
          .zipWithIndex.flatMap { case (frame, idx) =>
            MediaCodecs.perceptualHash64(frame).map(h => Row(id, idx, h))
          }
      }
    }(enc).toDF()
  }

  /** Scene-change (shot-boundary) detection: a cut is a consecutive
    * frame pair whose perceptual hashes differ by more than
    * `minHamming` bits. After the decode kernel this is pure Catalyst —
    * a per-asset window `lag` and a codegen'd `bit_count(a^b)` — so it
    * scales as one shuffle by asset id. Emits (asset_id, frame_idx,
    * hamming) per boundary frame. */
  def sceneChanges(spark: SparkSession, assets: DataFrame,
      minHamming: Int = 16): DataFrame =
    sceneChangesFromFrameHashes(videoFrameHashes(spark, assets), minHamming)

  /** The relational tail of [[sceneChanges]], over any
    * (asset_id, frame_idx, phash) frame-hash table — per-asset window
    * `lag` + codegen'd `bit_count(a^b)`, one shuffle by asset id. Split
    * out so the tail is oracle-verifiable from relationally-constructed
    * frame hashes (the decode kernel is MediaCodecsSpec's job). */
  def sceneChangesFromFrameHashes(frameHashes: DataFrame,
      minHamming: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("asset_id").orderBy("frame_idx")
    frameHashes
      .withColumn("prev", lag(col("phash"), 1).over(w))
      .where(col("prev").isNotNull)
      .withColumn("hamming", Dedup.hamming64(col("phash"), col("prev")))
      .where(col("hamming") > minHamming)
      .select("asset_id", "frame_idx", "hamming")
  }

  /** Near-duplicate VIDEO pairs by temporal frame matching: each frame's
    * pHash is banded into the two-cover 16-bit chunks KEYED BY ITS FRAME
    * SLOT (so only same-position frames can collide — no cross-time
    * false candidates and no hot buckets from a ubiquitous frame),
    * candidate pairs expand per capped bucket, then an exact per-slot
    * Hamming verify counts matching frames and keeps pairs with at
    * least `minMatchedFrames`. The standard video-dedup shape:
    * re-encoded copies match nearly every slot, unrelated clips none. */
  def videoNearDups(spark: SparkSession, assets: DataFrame,
      maxHamming: Int = 10, minMatchedFrames: Int = 3,
      maxBucketSize: Int = 2000): DataFrame =
    videoNearDupsFromFrameHashes(videoFrameHashes(spark, assets),
      maxHamming, minMatchedFrames, maxBucketSize)

  /** The relational tail of [[videoNearDups]], over any
    * (asset_id, frame_idx, phash) frame-hash table — banding keyed by
    * frame SLOT, capped bucket pair expansion, exact per-slot Hamming
    * verify, matched-frame threshold. Split out so the tail is
    * oracle-verifiable from relationally-constructed frame hashes. */
  def videoNearDupsFromFrameHashes(fh: DataFrame,
      maxHamming: Int = 10, minMatchedFrames: Int = 3,
      maxBucketSize: Int = 2000): DataFrame = {
    val rot = shiftrightunsigned(col("phash"), 8)
      .bitwiseOR(shiftleft(col("phash"), 56))
    val bucketed = fh.select(col("asset_id").as("id"), col("frame_idx"),
      posexplode(array(
        (0 until 4).map(c =>
          shiftright(col("phash"), c * 16).bitwiseAND(0xFFFFL)) ++
        (0 until 4).map(c =>
          shiftright(rot, c * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("id"),
        xxhash64(col("frame_idx"), col("pos"), col("col")).as("bucket"))
    Dedup.candidatePairsFromBuckets(bucketed, maxBucketSize)
      .join(fh.select(col("asset_id").as("id_a"), col("frame_idx"),
        col("phash").as("ph_a")), Seq("id_a"))
      .join(fh.select(col("asset_id").as("id_b"), col("frame_idx"),
        col("phash").as("ph_b")), Seq("id_b", "frame_idx"))
      .where(Dedup.hamming64(col("ph_a"), col("ph_b")) <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("matched_frames"))
      .where(col("matched_frames") >= minMatchedFrames)
  }

  /** Frame sampling for video assets: emit one row per sampled frame at
    * `everyMs` intervals — pure expression layout (sequence + explode), the
    * decode of each frame being the swappable kernel. */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets.where(col("kind") === "video")
      .select(col("asset_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0L), col("meta.duration_ms"),
          lit(everyMs))))
      .select(col("asset_id"), col("pos").as("frame_index"),
        col("col").as("frame_ts_ms"))

  /** Resize metadata transform (the byte-level resample is the stubbed
    * kernel; the metadata math and column flow are real). */
  def resize(assets: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) <= maxDim, lit(1.0))
      .otherwise(lit(maxDim).cast("double") / greatest(w, h))
    assets.withColumn("meta", struct(
      ceil(w * scale).cast("int").as("width"),
      ceil(h * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.mime").as("mime")))
  }
}
