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
}
