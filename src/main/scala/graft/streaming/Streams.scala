package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.fhir.{Bundles, FhirSchemas}

/** Structured Streaming surface — beyond reference parity (the reference has
  * no streaming at all, SURVEY §2.10): streaming bundle ingestion reusing
  * the exact batch `from_json` path, and watermarked windowed event
  * aggregation. At scale this is the continuous-ingest front door: the same
  * compiled schemas and extraction expressions serve batch and stream, so
  * there is one codepath to validate.
  */
object Streams {

  /** Streaming FHIR-bundle source: watch a directory of single-line-JSON
    * bundle files and extract one resource type continuously. The
    * transformation is *identical* to the batch path (Bundles.extractEntry
    * expressions) — only the source is `readStream`. */
  def bundleStream(spark: SparkSession, path: String,
      resourceName: String): DataFrame = {
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(path)
      .withColumnRenamed("value", "bundle_json")
    Bundles.extractEntry(spark, Bundles.fromJson(raw, "bundle_json"),
      resourceName)
  }

  /** Run a streaming DataFrame into an in-memory table until all currently
    * available input is processed; returns the materialized result. Local
    * test/driver harness for the streaming path.
    *
    * `statePartitions`: a stateful query fixes its state-store partition
    * count from `spark.sql.shuffle.partitions` AT START and keeps it for
    * life — size it to the expected distinct-key count (each partition
    * costs a state store to initialize/commit every batch; thousands of
    * windows do not need hundreds of stores). Temporarily applied around
    * query start and restored. */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "append",
      statePartitions: Option[Int] = None): DataFrame = {
    graft.ConfScope.withShuffleWidth(spark, statePartitions) {
      val q: StreamingQuery = stream.writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      // stop in finally: a failed micro-batch must not leak a running
      // query registered under `name` (the next run would refuse to start)
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
  }

  /** Production sink: append-mode partitioned parquet with checkpointing —
    * the shape that runs continuously on a cluster (exactly-once via the
    * checkpoint + file-sink manifest; `complete`+memory is only the local
    * test harness). Watermark closure emits each window once, so the sink
    * receives append-only finalized rows. Returns the running query; caller
    * owns its lifecycle. */
  def runToParquet(stream: DataFrame, outPath: String,
      checkpointPath: String,
      partitionCols: Seq[String] = Nil,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).start()
  }

  /** Watermarked sliding/tumbling window aggregation over an event stream:
    * the Structured Streaming form of the q19 batch bucketing. `complete`
    * output keeps every window so the result equals the batch equivalent on
    * a static directory. */
  def windowedEventAgg(events: DataFrame, watermark: String = "1 hour",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming events source over the testdata parquet layout (ts arrives as
    * TIMESTAMP(NANOS) → long under nanosAsLong, converted to micros). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
  }
}
