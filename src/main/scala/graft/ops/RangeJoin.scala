package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join via interval binning — the
  * standard trick for the join Spark would otherwise plan as a
  * broadcast-nested-loop over `p BETWEEN s AND e`: each interval explodes
  * to the fixed-width bins it covers, each point lands in exactly ONE bin,
  * and the candidates come from a plain equi-join on the bin key with the
  * exact BETWEEN as a residual filter.
  *
  * Because a point has a single bin, every true (point, interval) pair is
  * produced exactly once — no post-join dedupe. `binWidth` trades interval
  * fan-out (long intervals explode to many bins) against candidate
  * precision (wide bins admit more same-bin misses); pick it near the
  * median interval length. Both sides shuffle on the bin key, so the plan
  * scales like any hash join and AQE absorbs bin skew — nothing quadratic,
  * no broadcast of the big side, unlike the nested-loop plan Catalyst
  * falls back to for a raw range predicate.
  */
object RangeJoin {

  /** Joins each point to every interval containing it (inclusive both
    * ends). `pointCol`/`startCol`/`endCol` are numeric (e.g. epoch
    * micros). Intervals with end < start are dropped. Returns
    * (point_id, interval_id, p, s, e). */
  def pointInInterval(points: DataFrame, pointId: String, pointCol: String,
      intervals: DataFrame, intervalId: String, startCol: String,
      endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.select(col(pointId).as("point_id"),
      col(pointCol).as("p"),
      floor(col(pointCol) / binWidth).cast("long").as("bin"))
    val iv = intervals.select(col(intervalId).as("interval_id"),
        col(startCol).as("s"), col(endCol).as("e"))
      .where(col("e") >= col("s"))
      .withColumn("bin", explode(sequence(
        floor(col("s") / binWidth).cast("long"),
        floor(col("e") / binWidth).cast("long"))))
    p.join(iv, Seq("bin"))
      .where(col("p") >= col("s") && col("p") <= col("e"))
      .select(col("point_id"), col("interval_id"), col("p"), col("s"),
        col("e"))
  }

  /** Interval-overlap join: every (left, right) pair whose inclusive
    * [start, end] ranges intersect. Both sides explode to their covered
    * bins; a true pair shares every bin in the intersection, so to emit
    * it exactly once WITHOUT a dedupe shuffle each pair is claimed by the
    * "responsibility bin" — the bin containing max(left.start,
    * right.start), the first bin where both intervals are present. The
    * join itself is a plain equi-join on the bin key with the overlap
    * test and the responsibility predicate as residual filters — same
    * scale behavior as [[pointInInterval]]. Returns
    * (left_id, right_id). */
  def intervalOverlap(lefts: DataFrame, leftId: String, leftStart: String,
      leftEnd: String, rights: DataFrame, rightId: String,
      rightStart: String, rightEnd: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, id: String, s: String, e: String,
        p: String): DataFrame =
      df.select(col(id).as(s"${p}_id"), col(s).as(s"${p}_s"),
          col(e).as(s"${p}_e"))
        .where(col(s"${p}_e") >= col(s"${p}_s"))
        .withColumn("bin", explode(sequence(
          floor(col(s"${p}_s") / binWidth).cast("long"),
          floor(col(s"${p}_e") / binWidth).cast("long"))))
    binned(lefts, leftId, leftStart, leftEnd, "l")
      .join(binned(rights, rightId, rightStart, rightEnd, "r"), Seq("bin"))
      .where(col("l_s") <= col("r_e") && col("r_s") <= col("l_e") &&
        col("bin") ===
          floor(greatest(col("l_s"), col("r_s")) / binWidth).cast("long"))
      .select(col("l_id").as("left_id"), col("r_id").as("right_id"))
  }
}
