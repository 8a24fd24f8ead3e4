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

  /** Data-driven bin width for [[pointInInterval]] — the knob SCALE
    * stress runs showed is the one that matters: a FIXED width that is
    * right at sf0.1 produces quadratic same-bin candidate volume at sf1+
    * because density grows with data size while the time span does not.
    * This picks the width from the same cheap statistics
    * [[graft.ops.Profiling.joinSizeEstimate]] uses — counts, span, mean
    * interval length — WITHOUT running the join.
    *
    * Width policy, validated by a measured width sweep at 10x bench
    * scale (SCALE_r10): **w = max(L, sqrt(L·span/n_p))**, L = mean
    * interval length.
    *   - `w = L` is the asymptotically safe anchor: explode volume is
    *     ≤ 2 bins per interval and false candidates (n_p·n_i·w/span)
    *     equal the TRUE pair volume (n_p·n_i·L/span) — i.e. total work
    *     is within 2x of the join's unavoidable output at ANY density,
    *     which no fixed width can guarantee (a fixed width 60x the true
    *     interval length costs 60x false candidates).
    *   - The sqrt term (from minimizing explode n_i·L/w + candidates
    *     n_p·n_i·w/span) only exceeds L when points are SPARSE
    *     (span/n_p > L); there, wider bins cut explode volume that
    *     would otherwise dominate the tiny output.
    *   - Narrower than L is never chosen: the sweep showed exploded
    *     rows cost ~40x a codegen'd candidate-probe row (sequence +
    *     explode + shuffle + sort vs a hash probe), so trading explode
    *     for candidate precision loses even when the row-count model
    *     says otherwise.
    * A hard `maxFanout` floor (w ≥ L/maxFanout) bounds exploded volume
    * under adversarial stats (and the 2^31 `sequence` element limit);
    * the TRUE pair set is unaffected by w entirely (exact residual
    * filter).
    *
    * Cost: ONE two-row aggregation job (both sides unioned, grouped by
    * side; count/min/max/mean-length per side), collected to the driver
    * — a planning statistic, same class as AQE's runtime stats, not a
    * data-scale collect. Result is deterministic for a given input.
    * Returns a width in [1, span], or `fallback` when either side is
    * empty. */
  def autoBinWidth(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      maxFanout: Long = 1024L,
      fallback: Long = 3600L * 1000000L): Long = {
    require(maxFanout > 0, s"maxFanout must be positive, got $maxFanout")
    sideStats(points.select(col(pointCol).as("s"), col(pointCol).as("e")),
        intervals.select(col(startCol).as("s"), col(endCol).as("e"))) match {
      case Some(((np, pLo, pHi, _), (_, iLo, iHi, len))) =>
        val span = math.max(1.0, math.max(pHi, iHi) - math.min(pLo, iLo))
        val w = math.max(len, math.sqrt(len * span / np))
        clampWidth(w, len, span, maxFanout)
      case None => fallback
    }
  }

  /** [[autoBinWidth]] for [[intervalOverlap]]: anchored at the LONGER
    * side's mean length (shared-bin multiplicity for a pair is
    * ~overlap/w + 1, so w ≥ max(L_l, L_r) keeps it ≤ 2); the sparse-side
    * sqrt term sqrt(span·(L_l/n_r + L_r/n_l)) widens it when either side
    * is small. */
  def autoBinWidthIntervals(lefts: DataFrame, leftStart: String,
      leftEnd: String, rights: DataFrame, rightStart: String,
      rightEnd: String, maxFanout: Long = 1024L,
      fallback: Long = 3600L * 1000000L): Long = {
    require(maxFanout > 0, s"maxFanout must be positive, got $maxFanout")
    sideStats(lefts.select(col(leftStart).as("s"), col(leftEnd).as("e")),
        rights.select(col(rightStart).as("s"),
          col(rightEnd).as("e"))) match {
      case Some(((nl, lLo, lHi, ll), (nr, rLo, rHi, lr))) =>
        val span = math.max(1.0, math.max(lHi, rHi) - math.min(lLo, rLo))
        val w = math.max(math.max(ll, lr),
          math.sqrt(span * (ll / nr + lr / nl)))
        clampWidth(w, math.max(ll, lr), span, maxFanout)
      case None => fallback
    }
  }

  /** Clamp a model width into [max(1, L/maxFanout), span]: the floor
    * bounds per-interval explode volume, the ceiling keeps at least one
    * bin of data. */
  private def clampWidth(w: Double, len: Double, span: Double,
      maxFanout: Long): Long = {
    val floor = math.max(1.0, len / maxFanout)
    math.max(floor, math.min(span, w)).toLong max 1L
  }

  /** One aggregation job over both sides (unioned, grouped by side tag):
    * per side (count, min start, max end, mean length). None when either
    * side is empty. */
  private def sideStats(a: DataFrame, b: DataFrame)
      : Option[((Double, Double, Double, Double),
                (Double, Double, Double, Double))] = {
    val rows = a.where(col("e") >= col("s"))
      .select(lit(0).as("side"), col("s"), col("e"))
      .unionAll(b.where(col("e") >= col("s"))
        .select(lit(1).as("side"), col("s"), col("e")))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"), min(col("s")).as("lo"),
        max(col("e")).as("hi"), avg(col("e") - col("s")).as("len"))
      .collect()
    def num(v: Any): Double = v match {
      case l: java.lang.Long => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case d: java.lang.Double => d
      case d: java.math.BigDecimal => d.doubleValue()
      case other => other.toString.toDouble
    }
    val bySide = rows.map(r => r.getInt(0) ->
      ((r.getLong(1).toDouble, num(r.get(2)), num(r.get(3)),
        math.max(0.0, num(r.get(4)))))).toMap
    for (x <- bySide.get(0); y <- bySide.get(1)) yield (x, y)
  }
}
