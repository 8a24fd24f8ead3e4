package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based event sessionization — the standard clickstream/trace
  * transform: within each user, a gap longer than `gapSeconds` starts a
  * new session.
  *
  * Plan shape at 100 TB: one shuffle keyed by user (high cardinality —
  * parallelism scales with users, no global ordering anywhere), then two
  * window passes over each user's locally-sorted events (lag + running
  * sum, same window frame so one sort). Deterministic: ties on ts broken
  * by event id. */
object Sessions {

  /** Per-event session assignment: adds `session_id` (1-based, per user,
    * in time order). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val prevTs = lag(col(tsCol), 1).over(w)
    // exact integer microseconds (unix_timestamp would truncate to seconds
    // and disagree with engines that keep sub-second precision)
    val newSession = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L,
      lit(1)).otherwise(lit(0))
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Session-level rollup: event count and bounds per (user, session). */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
