package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key salting for shuffled equi-joins.
  *
  * A shuffled join hashes rows to reducers BY KEY, so one key with 10⁸
  * rows is one reducer with 10⁸ rows no matter how many executors exist.
  * Salting splits each HOT key into `salts` synthetic sub-keys on the
  * fact side and replicates only the hot keys' dimension rows across
  * those sub-keys — cold keys pay nothing, the hot reducers become
  * `salts`-way parallel, and the join result is IDENTICAL (every fact
  * row still meets every matching dim row exactly once).
  *
  * AQE's skew-join split handles many batch cases automatically; the
  * manual form remains necessary when the skewed exchange feeds a
  * stateful/streaming operator, when the skew is in the AGGREGATION
  * after the join, or when the optimizer's stats miss the hot key.
  * The salt is derived from the fact row's unique id via the portable
  * hash — deterministic, so the operator is oracle-checkable (the
  * oracle runs the PLAIN join: salting must not change the answer). */
object Skew {

  private def portable60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Profile of keys whose fact-side row count exceeds `hotThreshold` —
    * a BOUNDED frame (at most totalRows/hotThreshold keys), safe to
    * broadcast. One partial-aggregated pass. */
  def hotKeys(facts: DataFrame, key: String,
      hotThreshold: Long): DataFrame =
    facts.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .where(col("__n") > hotThreshold)
      .select(col(key))

  /** Inner equi-join `facts ⋈ dim` on `key`, with rows of keys in `hot`
    * spread over `salts` sub-keys. `rowIdCol` must be unique per fact
    * row (drives the deterministic salt). The dim side replicates ONLY
    * hot-key rows `salts`-fold; cold keys join on salt 0 untouched. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      rowIdCol: String, hot: DataFrame, salts: Int): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val hotMark = broadcast(hot.withColumn("__hot", lit(1)))
    val f = facts.join(hotMark, Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull,
          pmod(portable60(col(rowIdCol).cast("string")), lit(salts))
            .cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val d = dim.join(hotMark, Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot").isNotNull,
          sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    f.hint("merge").join(d, Seq(key, "__salt")).drop("__salt")
  }
}
