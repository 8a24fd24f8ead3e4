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
}
