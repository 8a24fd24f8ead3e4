package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Reader contract for the events `ts` column — the round-8 postmortem
  * spec. The driver's `events.parquet` has shipped `ts` as nanosecond
  * int64, `timestamp[us]` NTZ, and (potentially) UTC-adjusted
  * `timestamp[us]`; this suite pins that BOTH readers (batch
  * [[EventTime.normalize]] and the streaming
  * [[graft.streaming.Streams.eventStream]] path) land every encoding on
  * identical `TimestampType` values inside the fixture's year — and that
  * a unit misinterpretation (the round-8 silent-corruption mode, which
  * collapsed every stamp to ~1970) now throws loudly instead of
  * producing plausible wrong windows.
  */
class EventTimeSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_evttime_$tag").toString

  // one fixed instant (UTC) + a second one, written in each encoding
  private val isoA = "2024-05-01 10:15:30.123456"
  private val isoB = "2024-05-02 23:59:59.999999"
  private val microsA = Timestamp.valueOf(isoA).getTime * 1000 + 456
  private val microsB = Timestamp.valueOf(isoB).getTime * 1000 + 999

  /** events-shaped frame with `ts` in the given Spark-visible encoding. */
  private def fixture(encoding: String): String = {
    val base = Seq((1L, microsA, 7L), (2L, microsB, 8L))
      .toDF("event_id", "us", "user_id")
    val df = encoding match {
      case "long_nanos" =>
        base.withColumn("ts", expr("us * 1000L")) // int64 column, nanos
      case "ntz_micros" =>
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
      case "utc_micros" =>
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    val dir = tmp(encoding)
    writeSingleFile(df.drop("us"), s"$dir/events.parquet")
    dir
  }

  /** Write `df` as ONE literal parquet file at `path` — the testdata
    * layout (`events.parquet` is a file, and eventStream's
    * pathGlobFilter matches file names, not directories). */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    val stage = tmp("stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private val encodings = Seq("long_nanos", "ntz_micros", "utc_micros")

  test("batch: all three physical encodings normalize to identical UTC timestamps") {
    for (enc <- encodings) {
      val got = EventTime.normalize(
        spark.read.parquet(s"${fixture(enc)}/events.parquet"))
      assert(got.schema("ts").dataType === TimestampType, enc)
      val vals = got.select(unix_micros(col("ts"))).as[Long]
        .collect().sorted.toSeq
      assert(vals === Seq(microsA, microsB), enc)
      // min/max inside the fixture year — the guard's own criterion
      val Array(yMin, yMax) = got
        .agg(min(year(col("ts"))), max(year(col("ts"))))
        .head().toSeq.map(_.asInstanceOf[Int]).toArray
      assert(yMin === 2024 && yMax === 2024, enc)
    }
  }

  test("streaming: eventStream reads all three encodings to identical stamps") {
    for (enc <- encodings) {
      val dir = fixture(enc)
      val stream = graft.streaming.Streams.eventStream(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val got = graft.streaming.Streams.runToMemory(spark, stream,
        s"evttime_$enc")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> microsA, 2L -> microsB), enc)
    }
  }

  test("a unit misinterpretation throws loudly instead of flowing on") {
    // micros mistakenly treated as nanos → 1970-era stamps: the round-8
    // failure. Writing raw micros into an int64 `ts` reproduces it
    // byte-for-byte (normalize assumes int64 = nanos).
    val dir = tmp("bad_unit")
    Seq((1L, microsA)).toDF("event_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val bad = EventTime.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    val e = intercept[Exception] { bad.select(col("ts")).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("event ts outside")),
      s"wanted the EventTime guard, got: $e")
  }

  test("streaming guard: out-of-range event time fails the micro-batch") {
    val dir = tmp("bad_unit_stream")
    writeSingleFile(Seq((1L, microsA)).toDF("event_id", "ts"),
      s"$dir/events.parquet")
    val stream = graft.streaming.Streams.eventStream(spark, dir)
    val e = intercept[Exception] {
      graft.streaming.Streams.runToMemory(spark, stream, "evttime_bad")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("event ts outside")),
      s"wanted the EventTime guard, got: $e")
  }

  test("null ts passes the guard untouched") {
    val df = Seq((1L, Some(microsA)), (2L, None))
      .toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = EventTime.normalize(df)
    assert(got.where(col("ts").isNull).count() === 1L)
  }
}
