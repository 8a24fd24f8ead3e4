package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (point-in-time lookup): for every left row, the
  * most recent right row at-or-before its timestamp within the same key —
  * the standard event-to-dimension alignment (latest price before a trade,
  * last config before a request, most recent purchase before a click).
  *
  * Plan shape at 100 TB: tag both sides, union, ONE shuffle keyed by the
  * join key, then a single per-key window sort carrying the last-seen
  * right row forward (`last(_, ignoreNulls = true)` over an
  * unbounded-preceding frame) — the canonical single-sort merge as-of.
  * A naive `l.key = r.key AND l.ts >= r.ts` theta join would explode to
  * all qualifying pairs per key (quadratic) before picking the max; this
  * shape touches each row exactly once and parallelism scales with keys,
  * like sessionization ([[Sessions]]).
  *
  * Determinism: right rows sort before left rows at equal timestamps
  * (as-of is inclusive), and the right side must be unique per (key, ts)
  * — pre-aggregate if it is not — which is also what makes an external
  * engine's ASOF JOIN reproduce the result exactly.
  */
object AsOf {

  /** Left as-of join. Output: every left row with its columns, plus
    * `asof_ts` (the matched right timestamp) and `asof_<v>` for each
    * requested right value column — all null when no right row is at or
    * before the left timestamp. */
  def asOfJoin(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val r0 = right.select(col(rightKey).as("__k"),
      col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(col(rightTs).as("asof_ts") +:
        rightVals.map(c => col(c).as(s"asof_$c")): _*).as("__r"))
    val lStruct = left.select(struct(lCols.map(col): _*).as("__l"))
      .schema("__l").dataType
    val rStruct = r0.schema("__r").dataType
    val l = left.select(col(leftKey).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = r0.withColumn("__l", lit(null).cast(lStruct))
      .select("__k", "__ts", "__side", "__l", "__r")
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rFields = "asof_ts" +: rightVals.map(c => s"asof_$c")
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        rFields.map(f => col("__m").getField(f).as(f)): _*)
  }

  /** NEAREST as-of join with tolerance — the full pandas
    * `merge_asof(direction='nearest', tolerance=…)` surface: for every
    * left row, the right row (same key) closest in time, looking BOTH
    * ways, matched only within `toleranceMicros`. Ties: an equal-time
    * right row has distance 0 via the backward pass; equal non-zero
    * distances prefer the backward (earlier) row — deterministic,
    * documented.
    *
    * Same single-shuffle union shape as [[asOfJoin]], ONE per-key sort
    * serving two carries: the backward last-non-null over the preceding
    * frame (inclusive of equal timestamps — right sorts before left)
    * and the forward first-non-null over the strictly-following frame
    * (equal-ts rights sort before the left row, so the forward match is
    * strictly later; the backward pass already owns the tie). The right
    * side must be unique per (key, ts).
    *
    * Output: left columns + `asof_dir` ('b'/'f', null = no match in
    * tolerance), `asof_ts`, `asof_dist_micros`, and `asof_<v>` per
    * requested right value column. */
  def asOfNearest(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      rightVals: Seq[String], toleranceMicros: Long): DataFrame = {
    require(toleranceMicros >= 0, "tolerance must be >= 0")
    val lCols = left.columns.toSeq
    val r0 = right.select(col(rightKey).as("__k"),
      col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(col(rightTs).as("asof_ts") +:
        rightVals.map(c => col(c).as(s"asof_$c")): _*).as("__r"))
    val lStruct = left.select(struct(lCols.map(col): _*).as("__l"))
      .schema("__l").dataType
    val rStruct = r0.schema("__r").dataType
    val l = left.select(col(leftKey).as("__k"), col(leftTs).as("__ts"),
      lit(1).as("__side"), struct(lCols.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = r0.withColumn("__l", lit(null).cast(lStruct))
      .select("__k", "__ts", "__side", "__l", "__r")
    val ord = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
    val wB = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val rFields = "asof_ts" +: rightVals.map(c => s"asof_$c")
    val tagged = l.unionByName(r)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wF))
      .where(col("__side") === 1)
    val lt = unix_micros(col("__ts"))
    val bd = lt - unix_micros(col("__b.asof_ts"))
    val fd = unix_micros(col("__f.asof_ts")) - lt
    val bOk = col("__b").isNotNull && bd <= toleranceMicros
    val fOk = col("__f").isNotNull && fd <= toleranceMicros
    val useB = bOk && (!fOk || bd <= fd)
    val useF = fOk && !useB
    val dir = when(useB, lit("b")).when(useF, lit("f"))
      .otherwise(lit(null).cast("string"))
    val m = when(useB, col("__b")).when(useF, col("__f"))
      .otherwise(lit(null).cast(rStruct))
    val dist = when(useB, bd).when(useF, fd)
    tagged
      .withColumn("__m", m).withColumn("__dir", dir)
      .withColumn("__dist", dist)
      .select(lCols.map(c => col("__l").getField(c).as(c)) ++
        Seq(col("__dir").as("asof_dir"),
          col("__dist").as("asof_dist_micros")) ++
        rFields.map(f => col("__m").getField(f).as(f)): _*)
  }
}
