package graft

import org.apache.spark.sql.SparkSession

/** Temporarily override a session conf around a block, always restoring.
  *
  * Iterative fixpoint loops and stateful streaming queries materialize with
  * whatever `spark.sql.shuffle.partitions` says at execution time; sizing
  * that to the ITERATION/STATE data instead of the session's generic
  * parallelism removes fixed per-round scheduling overhead that AQE will
  * not coalesce away (minPartitionNum floor). One shared implementation so
  * the save/set/restore policy cannot drift between call sites. */
private[graft] object ConfScope {

  def withShuffleWidth[T](spark: SparkSession,
      partitions: Option[Int])(body: => T): T = partitions match {
    case None => body
    case Some(n) =>
      val key = "spark.sql.shuffle.partitions"
      val previous = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try body finally spark.conf.set(key, previous)
  }

  /** Generic scoped conf override (save/set/restore). Used by the
    * iterative fixpoint family to pin `spark.sql.adaptive.enabled=false`
    * for the loop: a checkpointed round's `LogicalRDD` only CAPTURES its
    * physical outputPartitioning when the plan is not wrapped in
    * `AdaptiveSparkPlan` (AQE reports unknown partitioning at checkpoint
    * time), and that captured partitioning is what makes the next round's
    * state join exchange-free. The loop plans are small and fixed-shape —
    * partial aggregation already absorbs key skew map-side — so giving up
    * AQE inside the loop costs nothing and saves one O(N) state shuffle
    * per round. */
  def withConf[T](spark: SparkSession, key: String, value: String)(
      body: => T): T = {
    val previous = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally previous match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
