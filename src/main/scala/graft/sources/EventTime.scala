package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Event-time normalization for the `events` table.
  *
  * The driver's `events.parquet` has shipped `ts` under three different
  * physical encodings across rounds:
  *
  *   - parquet TIMESTAMP(NANOS) — Spark 4 only reads it with
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, surfacing a raw
  *     nanosecond `LongType`;
  *   - parquet `timestamp[us]` with `isAdjustedToUTC=false` — Spark reads
  *     `TIMESTAMP_NTZ`;
  *   - parquet `timestamp[us]` UTC-adjusted — Spark reads `TIMESTAMP`.
  *
  * Every event-time operator (sessions, interval joins, z-order, streaming
  * windows) wants one canonical type: `TimestampType` under the UTC
  * session. This object is the single place that mapping lives — the batch
  * reader ([[graft.SparkEntry]]) and the streaming reader
  * ([[graft.streaming.Streams.eventStream]]) both normalize through it, so
  * a future encoding change cannot fix one path and silently corrupt the
  * other (round 8 shipped exactly that failure: batch threw, streaming
  * divided microseconds by 1000 and produced plausible 1970 windows).
  *
  * Every normalized read also carries a codegen'd range guard: a `ts`
  * outside [1990, 2100) throws with the offending value instead of
  * flowing on. A unit misinterpretation is never off by less than 10^3,
  * which lands decades outside any fixture's range — so the guard turns
  * the silent-corruption mode into a loud failure at first read, in both
  * batch and streaming (it is a per-row projection, no aggregation, so it
  * runs identically under micro-batches).
  */
object EventTime {

  /** Guard bounds: generous enough for any plausible fixture, narrow
    * enough that any unit mix-up (ns read as us, us read as ms, ...)
    * lands outside. */
  private val LoBound = "1990-01-01 00:00:00"
  private val HiBound = "2100-01-01 00:00:00"

  /** Normalize a `ts` column of physical type `dt` to `TimestampType`.
    * `name` must be the column's resolvable name (the integral `div` is
    * built by SQL text: Column's `/` divides as DOUBLE, and 2024-era
    * nanosecond stamps (~1.7e18) exceed 2^53, so a double round trip
    * perturbs individual stamps by ±1us — caught by the q70 funnel
    * oracle, which exposes raw per-user micros). */
  def normalizeTs(name: String, dt: DataType): Column = dt match {
    case LongType          => timestamp_micros(expr(s"`$name` div 1000"))
    case TimestampNTZType  => col(name).cast(TimestampType)
    case TimestampType     => col(name)
    case other => throw new IllegalArgumentException(
      s"events.$name: unsupported physical type $other — expected " +
        "nanosecond LongType, TIMESTAMP_NTZ, or TIMESTAMP")
  }

  /** Wrap a normalized timestamp column in the loud range guard. */
  def guarded(c: Column): Column = {
    val lo = lit(LoBound).cast(TimestampType)
    val hi = lit(HiBound).cast(TimestampType)
    val ok = c.isNull || (c >= lo && c < hi)
    // assert_true is null when ok (so `when` yields c) and throws with
    // the offending stamp otherwise — whole-stage-codegen friendly,
    // works identically in batch and streaming projections.
    when(assert_true(ok, concat(
      lit(s"event ts outside [$LoBound, $HiBound): "),
      c.cast("string"),
      lit(" — events.parquet timestamp unit changed again? " +
        "See graft.sources.EventTime."))).isNull, c)
  }

  /** Normalize (and guard) the `ts` column of an events DataFrame read
    * from any of the three physical encodings. Frames without a `ts`
    * column pass through untouched. */
  def normalize(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) =>
        df.withColumn("ts", guarded(normalizeTs("ts", f.dataType)))
      case None => df
    }

  /** The physical `ts` type a streaming read must declare for `path`,
    * probed from the parquet footer (driver-side, one cheap read — the
    * stream's schema contract requires knowing it up front). */
  def probeSchema(spark: org.apache.spark.sql.SparkSession,
      path: String, logical: StructType): StructType = {
    val physical = spark.read.parquet(path).schema
    StructType(logical.fields.map { f =>
      if (f.name == "ts")
        f.copy(dataType = physical.find(_.name == "ts")
          .map(_.dataType).getOrElse(f.dataType))
      else f
    })
  }
}
