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
    assets.select("asset_id", "kind", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val payload = r.getAs[Array[Byte]](2)
        val n = if (payload == null) 0 else payload.length
        val decoded: Option[Array[Float]] = MediaCodecs.sniff(payload) match {
          case "bmp" | "ppm" =>
            (if (payload(0) == 'B') MediaCodecs.decodeBmp(payload)
             else MediaCodecs.decodePpm(payload)).map(s => Array(
              s.width.toFloat, s.height.toFloat, s.meanR.toFloat,
              s.meanG.toFloat, s.meanB.toFloat, s.lumaMean.toFloat,
              s.lumaStd.toFloat, 1.0f))
          case "wav" => MediaCodecs.decodeWav(payload).map(s => Array(
            s.sampleRate.toFloat, s.nSamples.toFloat, s.meanAbs.toFloat,
            s.rms.toFloat, s.zeroCrossRate.toFloat, s.durationMs.toFloat,
            0.0f, 2.0f))
          case _ => None
        }
        // FAKE fallback kernel: deterministic 8-dim byte-stats feature —
        // the slot where a codec library would plug in for formats the
        // JVM can't decode (JPEG/MP4/...).
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
    ids.select(col(idCol).cast("long").as("asset_id"))
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

  /** 64-bit DCT perceptual hash per image asset (null for payloads no
    * decoder recognizes — degrade, don't fail). mapPartitions kernel like
    * [[extractFeatures]]: binary in, one long out, nothing Catalyst could
    * express. */
  def perceptualHashes(spark: SparkSession, assets: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = true))))
    assets.select("asset_id", "payload").mapPartitions { it =>
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
    Dedup.simhashPairsFromSigs(
      perceptualHashes(spark, assets)
        .where(col("phash").isNotNull)
        .select(col("asset_id").as("id"), col("phash").as("sig")),
      maxHamming, maxBucketSize)

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
