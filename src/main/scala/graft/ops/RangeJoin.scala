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
    * Uniform-density model: a bin of width w holds ~ n_p·w/span points
    * and ~ n_i·(L+w)/span intervals (L = mean interval length), so
    * expected candidate pairs per bin ≈ (n_p·w/span)·(n_i·(L+w)/span).
    * Solving pairsPerBin = target for w gives the positive root of
    * w² + L·w − C = 0, C = target·span²/(n_p·n_i): wide bins when data
    * is sparse (fewer exploded rows), narrow bins when dense (bounded
    * per-bin work, so AQE-sized tasks stay even). Candidate volume per
    * bin is then ~target at ANY scale factor — the property a fixed
    * width cannot have.
    *
    * Cost: ONE two-row aggregation job (both sides unioned, grouped by
    * side; count/min/max/mean-length per side), collected to the driver
    * — a planning statistic, same class as AQE's runtime stats, not a
    * data-scale collect. Result is deterministic for a given input.
    * Returns a width in [1, span], or `fallback` when either side is
    * empty. */
  def autoBinWidth(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      targetPairsPerBin: Long = 4096L,
      fallback: Long = 3600L * 1000000L): Long = {
    require(targetPairsPerBin > 0,
      s"targetPairsPerBin must be positive, got $targetPairsPerBin")
    sideStats(points.select(col(pointCol).as("s"), col(pointCol).as("e")),
        intervals.select(col(startCol).as("s"), col(endCol).as("e"))) match {
      case Some(((np, pLo, pHi, _), (ni, iLo, iHi, len))) =>
        val span = math.max(1.0, math.max(pHi, iHi) - math.min(pLo, iLo))
        val c = targetPairsPerBin.toDouble * span * span / (np * ni)
        val w = (-len + math.sqrt(len * len + 4.0 * c)) / 2.0
        math.max(1L, math.min(span.toLong, w.toLong))
      case None => fallback
    }
  }

  /** [[autoBinWidth]] for [[intervalOverlap]]: pairs per bin ≈
    * (n_l·(L_l+w)/span)·(n_r·(L_r+w)/span); the positive root of
    * (w+L_l)(w+L_r) = C, C = target·span²/(n_l·n_r). */
  def autoBinWidthIntervals(lefts: DataFrame, leftStart: String,
      leftEnd: String, rights: DataFrame, rightStart: String,
      rightEnd: String, targetPairsPerBin: Long = 4096L,
      fallback: Long = 3600L * 1000000L): Long = {
    require(targetPairsPerBin > 0,
      s"targetPairsPerBin must be positive, got $targetPairsPerBin")
    sideStats(lefts.select(col(leftStart).as("s"), col(leftEnd).as("e")),
        rights.select(col(rightStart).as("s"),
          col(rightEnd).as("e"))) match {
      case Some(((nl, lLo, lHi, ll), (nr, rLo, rHi, lr))) =>
        val span = math.max(1.0, math.max(lHi, rHi) - math.min(lLo, rLo))
        val c = targetPairsPerBin.toDouble * span * span / (nl * nr)
        val disc = (ll - lr) * (ll - lr) + 4.0 * c
        val w = (-(ll + lr) + math.sqrt(disc)) / 2.0
        math.max(1L, math.min(span.toLong, w.toLong))
      case None => fallback
    }
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
