package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surfaces: streaming bundle ingestion equals the
  * batch path, and the production append-mode parquet sink emits closed
  * windows exactly once across checkpointed restarts. */
class StreamsSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streaming bundle ingestion produces the batch rows") {
    import spark.implicits._
    val dir = tmp("bundles_stream")
    val bundle =
      """{"resourceType":"Bundle","type":"collection","entry":[{"resource":{"resourceType":"Patient","id":"sp1","gender":"female"}}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "b1.json"), bundle)
    val stream = Streams.bundleStream(spark, dir, "Patient")
    assert(stream.isStreaming)
    val got = Streams.runToMemory(spark, stream, "patients_stream")
    val batch = graft.fhir.Bundles.extractEntry(spark,
      graft.fhir.Bundles.fromJson(Seq(bundle).toDF("bundle_json"),
        "bundle_json"), "Patient")
    assert(got.collect().toSeq === batch.collect().toSeq)
  }

  test("append-mode parquet sink emits closed windows across restarts") {
    import spark.implicits._
    val in = tmp("events_in")
    val out = tmp("events_out")
    val ckpt = tmp("events_ckpt")
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    // stage 1: events in hour 10
    Seq(("2024-05-01 10:05:00", "click", 1.0),
      ("2024-05-01 10:20:00", "click", 2.0),
      ("2024-05-01 10:40:00", "view", 3.0))
      .toDF("ts", "event_type", "value")
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"))
      .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val agg = Streams.windowedEventAgg(stream, watermark = "30 minutes")
      val q = Streams.runToParquet(agg, out, ckpt)
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    // stage 2: much later events advance the watermark past hour 10, so
    // the restarted (checkpointed) query emits the hour-10 windows
    Seq(("2024-05-01 13:00:00", "click", 9.0))
      .toDF("ts", "event_type", "value")
      .select(col("ts").cast("timestamp"), col("event_type"), col("value"))
      .coalesce(1).write.mode("append").parquet(in)
    runOnce()
    val got = spark.read.parquet(out)
      .where(col("hour") === "2024-05-01 10:00:00")
      .orderBy("event_type")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    assert(got.toSeq === Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("streaming sessionization equals the batch operator on the fixture") {
    import spark.implicits._
    val gap = 1800L
    val events = graft.sources.EventTime.normalize(
      spark.read.parquet(s"$sfDir/events.parquet")) // same path as eventStream
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"))
    val batch = graft.ops.Sessions.sessionStats(events,
      "user_id", "ts", "event_id", gapSeconds = gap)
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("session_start"), col("session_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
    // flush sentinels: one far-future event per user forces the final real
    // session past the gap inside the batch, so every real session is
    // CLOSED and emitted; the sentinel's own session stays open in state
    // and is never emitted (append mode emits finalized sessions only)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 3 * gap * 1000)
    val sentinels = events.select(col("user_id")).distinct()
      .withColumn("ts", lit(flushTs))
      .withColumn("event_id", lit(-1L))
    val in = tmp("sessions_in")
    events.unionByName(sentinels).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("event_id", LongType))))
      .parquet(in)
    val sessions = Streams.sessionStream(stream, gapSeconds = gap)
    val got = Streams.runToMemory(spark, sessions.toDF(), "sessions_stream",
      outputMode = "append", statePartitions = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
    assert(got.nonEmpty)
    assert(got === batch)
  }

  test("incremental dedup stream flags cross-batch near-dups via the " +
      "persisted index") {
    import spark.implicits._
    val in = tmp("incdedup_in")
    val index = s"${tmp("incdedup")}/index"
    val pairs = s"${tmp("incdedup")}/pairs"
    val ckpt = tmp("incdedup_ckpt")
    def writeFile(name: String, mtime: Long,
        rows: Seq[(Long, String)]): Unit = {
      val dir = tmp("incdedup_stage")
      rows.toDF("doc_id", "text").coalesce(1).write
        .mode("overwrite").parquet(dir)
      val src = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, name)
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    // two files with ordered mtimes → two micro-batches (1 file each)
    val t0 = System.currentTimeMillis() - 60000
    writeFile("batch1.parquet", t0, Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an unrelated document about query engines")))
    writeFile("batch2.parquet", t0 + 30000, Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "yet another unrelated piece of text")))
    val docs = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = Streams.incrementalDedupStream(docs, "doc_id", "text",
      index, pairs, ckpt, shingleSize = 2, numHashes = 16, bands = 8)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 1L))) // batch-2 dup of the indexed batch-1 doc
    // the index now holds band buckets for all four documents
    assert(spark.read.parquet(index).select("id").distinct().count() === 4)
  }

  test("incremental media dedup stream finds the planted cross-batch " +
      "perceptual pair via the persisted pHash index") {
    import spark.implicits._
    val in = tmp("incmedia_in")
    val index = s"${tmp("incmedia")}/index"
    val pairs = s"${tmp("incmedia")}/pairs"
    val ckpt = tmp("incmedia_ckpt")
    // synthetic BMPs: id 10 is the planted near-dup of id 9
    val payloads = graft.ops.Multimodal.syntheticImages(spark,
      Seq(9L, 2L, 10L, 25L).toDF("id"), "id",
      side = 16, nearDupEvery = 10)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    def writeFile(name: String, mtime: Long, ids: Seq[Long]): Unit = {
      val dir = tmp("incmedia_stage")
      ids.map(i => (i, payloads(i))).toDF("asset_id", "payload")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val src = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, name)
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    writeFile("batch1.parquet", t0, Seq(9L, 2L))           // indexed
    writeFile("batch2.parquet", t0 + 30000, Seq(10L, 25L)) // arrives later
    val assets = spark.readStream
      .schema(StructType(Seq(
        StructField("asset_id", LongType, nullable = false),
        StructField("payload", BinaryType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = Streams.incrementalMediaDedupStream(assets, index, pairs,
      ckpt, maxHamming = 10)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((9L, 10L))) // batch-2 dup of the indexed batch-1 image
    // the index now holds band buckets for all four assets
    assert(spark.read.parquet(index).select("id").distinct().count() === 4)
  }

  test("late-data audit counts rows behind the replayed event-time " +
    "frontier, one audit row per batch") {
    import spark.implicits._
    val in = tmp("late_in")
    val audit = tmp("late_audit") + "/rows"
    val ckpt = tmp("late_ckpt")
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:$min%02d:00")
    def writeFile(name: String, mtime: Long,
        rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      val dir = tmp("late_stage")
      rows.toDF("event_id", "ts").coalesce(1).write
        .mode("overwrite").parquet(dir)
      val src = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, name)
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    // batch 1: frontier becomes 10:30
    writeFile("b1.parquet", t0, Seq((1L, ts(10)), (2L, ts(30))))
    // batch 2: cutoff = 10:30 − 10min = 10:20 → the 10:05 row is late,
    // the 10:25 row is within the allowed delay, 10:40 is fresh
    writeFile("b2.parquet", t0 + 30000,
      Seq((3L, ts(5)), (4L, ts(25)), (5L, ts(40))))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = Streams.lateDataAudit(stream, "ts", delaySeconds = 600,
      audit, ckpt)
    try q.processAllAvailable() finally q.stop()
    val rows = spark.read.parquet(audit)
      .orderBy("batch_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((2L, 0L), (3L, 1L)))
  }

  test("dedupStream: checkpointed restart mid-feed drops cross-restart " +
    "duplicates and loses nothing") {
    import spark.implicits._
    val in = tmp("dedup_rs_in")
    val out = tmp("dedup_rs_out")
    val ckpt = tmp("dedup_rs_ckpt")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        .toInstant.plusSeconds(sec))
    def stage(name: String, rows: Seq[(Long, Int)]): Unit = {
      val dir = tmp("dedup_rs_stage")
      rows.map { case (k, s) => (k, ts(s)) }.toDF("user_id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val src = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(in, name).toPath)
    }
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = Streams.runToParquet(
        Streams.dedupStream(stream, Seq("user_id"), watermark = "1 hour"),
        out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: keys 1-10, each duplicated within the feed
    stage("b1.parquet", (1L to 10L).flatMap(k =>
      Seq((k, k.toInt), (k, k.toInt + 1))))
    run()
    // stream is DOWN; more data lands: keys 6-15 — 6-10 are duplicates
    // of keys seen BEFORE the restart (only restored state can drop
    // them), 11-15 are new
    stage("b2.parquet", (6L to 15L).map(k => (k, k.toInt + 30)))
    // restart from the same checkpoint and drain
    run()
    val got = spark.read.parquet(out).select("user_id")
      .collect().map(_.getLong(0)).sorted
    assert(got === (1L to 15L).toArray,
      s"expected each key exactly once, got ${got.mkString(",")}")
  }

  test("intervalJoinStream: join state survives a checkpointed restart " +
    "(pre-restart left rows match post-restart right rows)") {
    import spark.implicits._
    val inL = tmp("ij_rs_left")
    val inR = tmp("ij_rs_right")
    val out = tmp("ij_rs_out")
    val ckpt = tmp("ij_rs_ckpt")
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType)))
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        .toInstant.plusSeconds(sec))
    def stage(dir: String, name: String, rows: Seq[(Long, Int)]): Unit = {
      val sdir = tmp("ij_rs_stage")
      rows.map { case (k, s) => (k, ts(s)) }.toDF("key", "ts")
        .coalesce(1).write.mode("overwrite").parquet(sdir)
      val src = new java.io.File(sdir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(dir, name).toPath)
    }
    def run(): Unit = {
      val l = spark.readStream.schema(schema).parquet(inL)
      val r = spark.readStream.schema(schema).parquet(inR)
      val joined = Streams.intervalJoinStream(l, r, "key",
          windowSeconds = 60, watermark = "1 hour")
        .select(col("l.key").as("key"),
          col("l.ts").as("l_ts"), col("r.ts").as("r_ts"))
      val q = Streams.runToParquet(joined, out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: left 1-5 at t+k, right 1-5 at t+k+10 → 5 pairs
    stage(inL, "l1.parquet", (1L to 5L).map(k => (k, k.toInt)))
    stage(inR, "r1.parquet", (1L to 5L).map(k => (k, k.toInt + 10)))
    run()
    // down; new data: fresh keys on both sides AND a right row for key 1
    // whose only match is the PRE-restart left row — restored join state
    // is the only way it can pair
    stage(inL, "l2.parquet", (6L to 8L).map(k => (k, 20)))
    stage(inR, "r2.parquet",
      (6L to 8L).map(k => (k, 25)) :+ (1L -> 31))
    run()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString))
      .sorted
    // batch reference: the same interval join over the full input
    val lAll = ((1L to 5L).map(k => (k, k.toInt)) ++
      (6L to 8L).map(k => (k, 20))).map { case (k, s) => (k, ts(s)) }
      .toDF("key", "ts")
    val rAll = ((1L to 5L).map(k => (k, k.toInt + 10)) ++
      (6L to 8L).map(k => (k, 25)) :+ (1L -> 31))
      .map { case (k, s) => (k, ts(s)) }.toDF("key", "ts")
    val want = lAll.alias("l").join(rAll.alias("r"),
        col("l.key") === col("r.key") &&
          col("r.ts") >= col("l.ts") &&
          col("r.ts") <= col("l.ts") + expr("INTERVAL 60 SECONDS"))
      .select(col("l.key"), col("l.ts"), col("r.ts"))
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString))
      .sorted
    assert(got === want)
    // the cross-restart pair is present
    assert(got.exists { case (k, _, rts) =>
      k == 1L && rts.contains("10:00:31") })
  }

  test("lateDataAudit survives a batch of all-null timestamps") {
    import spark.implicits._
    val in = tmp("latenull_in")
    val audit = tmp("latenull_audit") + "/rows"
    val ckpt = tmp("latenull_ckpt")
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:$min%02d:00")
    def writeFile(name: String, mtime: Long,
        rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      val dir = tmp("latenull_stage")
      rows.toDF("event_id", "ts").coalesce(1).write
        .mode("overwrite").parquet(dir)
      val src = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(in, name)
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    writeFile("b1.parquet", t0, Seq((1L, ts(30))))
    // batch of malformed events: every timestamp null — must append a
    // null-bounded audit row, not NPE the query
    writeFile("b2.parquet", t0 + 30000,
      Seq((2L, null.asInstanceOf[java.sql.Timestamp]),
        (3L, null.asInstanceOf[java.sql.Timestamp])))
    // a later healthy batch proves the frontier replay skips the nulls
    writeFile("b3.parquet", t0 + 60000, Seq((4L, ts(5)), (5L, ts(40))))
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
    val q = Streams.lateDataAudit(stream, "ts", delaySeconds = 600,
      audit, ckpt)
    try q.processAllAvailable() finally q.stop()
    val rows = spark.read.parquet(audit).orderBy("batch_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2),
        r.getAs[java.lang.Long]("min_ts_us") == null))
    // batch 0: 1 row, none late; batch 1: 2 null-ts rows, null bounds,
    // none late; batch 2: frontier 10:30 → cutoff 10:20 → 10:05 is late
    assert(rows.toSeq === Seq((1L, 0L, false), (2L, 0L, true),
      (2L, 1L, false)))
  }

  test("hopping windows equal batch and count every event exactly twice") {
    val stream = Streams.hoppingWindowAgg(Streams.eventStream(spark, sfDir))
    val got = Streams.runToMemory(spark, stream, "hop_stream",
      outputMode = "complete", statePartitions = Some(4))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batchEvents = graft.sources.EventTime.normalize(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val want = batchEvents
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want)
    // window/slide = 2: the hopping fan-out is exactly 2 rows per event
    assert(got.toSeq.map(_._3).sum === 2 * batchEvents.count())
  }

  test("streaming KMV distinct equals batch and is exact below k") {
    val stream = Streams.windowedKmvDistinct(
      Streams.eventStream(spark, sfDir), "user_id")
    val got = Streams.runToMemory(spark, stream, "kmv_stream",
      outputMode = "complete", statePartitions = Some(4))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    val batch = graft.sources.EventTime.normalize(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === batch.keySet && got.nonEmpty)
    got.foreach { case (h, (n, nSketch, est)) =>
      assert(n === batch(h)._1)
      // under-k windows are EXACT; full sketches estimate within the
      // deterministic 4-sigma envelope (~50% at k=64, hash is fixed)
      if (nSketch < 64) assert(est === batch(h)._2, s"window $h")
      else assert(math.abs(est - batch(h)._2.toDouble) <
        0.5 * batch(h)._2, s"window $h: est $est vs ${batch(h)._2}")
    }
  }

  test("streaming funnel emits exactly the batch operator's completions") {
    val st = Streams.funnelStream(Streams.eventStream(spark, sfDir),
      "event_type", Seq("view", "click", "purchase"),
      withinSeconds = Some(30L * 24 * 3600))
    val got = Streams.runToMemory(spark,
      st.select(col("user_id"),
        element_at(col("ts_steps"), 1).as("t1"),
        element_at(col("ts_steps"), 2).as("t2"),
        element_at(col("ts_steps"), 3).as("t3")),
      "funnel_stream", outputMode = "append", statePartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = graft.ops.Sessions.funnel(
      graft.sources.EventTime.normalize(
        spark.read.parquet(s"$sfDir/events.parquet")),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
      withinSeconds = Some(30L * 24 * 3600))
      .where(col("stage") === 3)
      .select("user_id", "t1", "t2", "t3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("scd2Stream: the open run survives a checkpointed restart and " +
    "closes against post-restart changes") {
    import spark.implicits._
    val in = tmp("scd2_rs_in")
    val out = tmp("scd2_rs_out")
    val ckpt = tmp("scd2_rs_ckpt")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        .toInstant.plusSeconds(sec))
    def stage(name: String, rows: Seq[(Long, Int, Long, String)]): Unit = {
      val dir = tmp("scd2_rs_stage")
      rows.map { case (id, s, u, a) => (id, ts(s), u, a) }
        .toDF("event_id", "ts", "user_id", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val src = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(in, name).toPath)
    }
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = Streams.runToParquet(
        Streams.scd2Stream(stream, "event_type").toDF(), out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    // phase 1: user 1 goes a(0s) -> b(60s): one closed run (a), b open
    stage("b1.parquet", Seq((1L, 0, 1L, "a"), (2L, 60, 1L, "b")))
    run()
    // stream DOWN; user 1 changes to c — only RESTORED state knows the
    // open b-run's start and version
    stage("b2.parquet", Seq((3L, 120, 1L, "c")))
    run()
    val got = spark.read.parquet(out)
      .select("attr", "valid_from_us", "valid_to_us", "version")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sortBy(_._4)
    val t0 = ts(0).getTime * 1000L
    assert(got.toSeq === Seq(
      ("a", t0, t0 + 60000000L, 1),
      ("b", t0 + 60000000L, t0 + 120000000L, 2)),
      s"got ${got.mkString(",")}")
  }

  test("streaming scd2 emits exactly the batch operator's closed runs") {
    val stream = Streams.scd2Stream(Streams.eventStream(spark, sfDir),
      "event_type")
    val got = Streams.runToMemory(spark, stream.toDF(), "scd2_stream",
      outputMode = "append", statePartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    val want = graft.ops.Sessions.scd2(
      graft.sources.EventTime.normalize(
        spark.read.parquet(s"$sfDir/events.parquet")),
      "user_id", "ts", "event_id", "event_type")
      .where(col("valid_to_us").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("streaming dedup equals batch distinct on the fixture") {
    val events = Streams.eventStream(spark, sfDir)
    val deduped = Streams.dedupStream(events, Seq("user_id", "event_type"),
      watermark = "30 days")
      .select(col("user_id"), col("event_type"))
    val got = Streams.runToMemory(spark, deduped, "dedup_stream",
      outputMode = "append", statePartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming windowed histogram equals the batch recount") {
    val stream = Streams.windowedHistogram(
      Streams.eventStream(spark, sfDir), "value", binWidth = 50.0,
      nBins = 10)
    val got = Streams.runToMemory(spark, stream, "hist_stream",
      outputMode = "complete", statePartitions = Some(4))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    val want = graft.sources.EventTime.normalize(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"),
        least(greatest(floor(col("value") / 50.0), lit(0)), lit(9))
          .cast("int").as("bin"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("leftOuterIntervalJoinStream: matched rows pair, watermark-" +
      "expired left rows emit null-padded, young left rows stay buffered") {
    import spark.implicits._
    val inL = tmp("loij_left")
    val inR = tmp("loij_right")
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType)))
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        .toInstant.plusSeconds(sec))
    def stage(dir: String, rows: Seq[(Long, Int)]): Unit = {
      val sdir = tmp("loij_stage")
      rows.map { case (k, sec) => (k, ts(sec)) }.toDF("key", "ts")
        .coalesce(1).write.mode("overwrite").parquet(sdir)
      val src = new java.io.File(sdir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(dir, src.getName).toPath)
    }
    // left: k=1 matched, k=2 unmatched-and-old, k=3 unmatched-but-young
    // right: match for k=1 (10s before), far-future rows advancing the
    // watermark (delay 30s, window 60s) past k=1/k=2 but NOT k=3
    stage(inL, Seq((1L, 100), (2L, 100), (3L, 980)))
    stage(inR, Seq((1L, 90), (9L, 1000)))
    val l = spark.readStream.schema(schema).parquet(inL)
    val r = spark.readStream.schema(schema).parquet(inR)
    val joined = Streams.leftOuterIntervalJoinStream(l, r, "key",
        windowSeconds = 60, watermark = "30 seconds")
      .select(col("l.key").as("key"), col("l.ts").as("l_ts"),
        col("r.ts").as("r_ts"))
    val got = Streams.runToMemory(spark, joined, "loij_out",
        outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.getTimestamp(2)).map(_.toString)))
      .sortBy(t => (t._1, t._2))
    // watermark after the batch: min(max_l, max_r) - 30s = 10:16:10.
    // k=1 pairs with its click; k=2 (ts 10:01:40 < wm) emits (2, null);
    // k=3 (ts 10:16:20 >= wm) is still buffered and must NOT appear.
    assert(got === Array(
      (1L, ts(100).toString, Some(ts(90).toString)),
      (2L, ts(100).toString, None)))
  }

  test("fullOuterIntervalJoinStream: matched rows pair, BOTH sides' " +
      "watermark-expired unmatched rows emit null-padded, the right " +
      "side waits out its shifted window") {
    import spark.implicits._
    val inL = tmp("foij_left")
    val inR = tmp("foij_right")
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("ts", TimestampType)))
    def ts(sec: Int) = java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        .toInstant.plusSeconds(sec))
    def stage(dir: String, rows: Seq[(Long, Int)]): Unit = {
      val sdir = tmp("foij_stage")
      rows.map { case (k, sec) => (k, ts(sec)) }.toDF("key", "ts")
        .coalesce(1).write.mode("overwrite").parquet(sdir)
      val src = new java.io.File(sdir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(dir, src.getName).toPath)
    }
    // left: k=1 matched, k=2 unmatched-and-old; right: k=1's partner,
    // k=4 unmatched-and-old (its l.ts window [ts, ts+60] fully below
    // the watermark), k=9 far-future advancing the watermark on both
    stage(inL, Seq((1L, 100), (2L, 100), (9L, 1000)))
    stage(inR, Seq((1L, 90), (4L, 100), (9L, 1000)))
    val l = spark.readStream.schema(schema).parquet(inL)
    val r = spark.readStream.schema(schema).parquet(inR)
    val joined = Streams.fullOuterIntervalJoinStream(l, r, "key",
        windowSeconds = 60, watermark = "30 seconds")
      .select(col("l.key").as("lk"), col("r.key").as("rk"))
    val got = Streams.runToMemory(spark, joined, "foij_out",
        outputMode = "append")
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toSet
    // wm = 10:16:10. (1,1) matched; left 2 expired -> (2, null);
    // right 4 expired (ts+60 = 10:02:40 < wm) -> (null, 4); the 9s
    // match each other (same ts, window inclusive)
    assert(got.contains((Some(1L), Some(1L))))
    assert(got.contains((Some(2L), None)))
    assert(got.contains((None, Some(4L))))
    assert(got.contains((Some(9L), Some(9L))))
    assert(got.size === 4)
  }

  test("hllMaintainStream: streamed register log max-merges to the " +
    "batch registers; replaying a batch changes nothing (idempotent)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = tmp("hll_in"); val regs = tmp("hll_regs")
    val chk = tmp("hll_chk")
    val all = (1 to 500).map(i => ("g1", s"u${i % 211}"))
    all.take(250).toDF("g", "v").coalesce(1)
      .write.mode("overwrite").parquet(in)
    all.drop(250).toDF("g", "v").coalesce(1)
      .write.mode("append").parquet(in)
    val st = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1").parquet(in)
    graft.streaming.Streams.hllMaintainStream(st, "g", "v", regs, chk)
      .awaitTermination()
    val log = spark.read.parquet(regs)
    assert(log.select("batch_id").distinct().count() === 2L)
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g", "bucket").agg(max("m_j").as("m_j"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          r.getInt(2)).toMap
    val merged = regMap(log.select("g", "bucket", "m_j"))
    val direct = regMap(graft.ops.Sketches.hllRegisters(
      all.toDF("g", "v")))
    assert(merged === direct)
    // idempotence: re-appending batch 0's registers moves no register
    val replayed = regMap(log.select("g", "bucket", "m_j").unionByName(
      log.where(col("batch_id") === 0).select("g", "bucket", "m_j")))
    assert(replayed === direct)
  }

  test("cmsMaintainStream: per-batch cell deltas sum-merge to exactly " +
    "the batch sketch; batch_id tags every delta row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = tmp("cms_in"); val cells = tmp("cms_cells")
    val chk = tmp("cms_chk")
    val all = (1 to 300).map(i => i % 37L)
    // two files -> two micro-batches (maxFilesPerTrigger=1)
    all.take(150).toDF("v").coalesce(1)
      .write.mode("overwrite").parquet(in)
    all.drop(150).toDF("v").coalesce(1)
      .write.mode("append").parquet(in)
    val st = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1").parquet(in)
    graft.streaming.Streams.cmsMaintainStream(st, "v", cells, chk)
      .awaitTermination()
    val log = spark.read.parquet(cells)
    assert(log.select("batch_id").distinct().count() === 2L)
    val merged = log.groupBy("row", "col").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val direct = graft.ops.Sketches.cmsCells(all.toDF("v"), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(merged === direct)
  }
}
