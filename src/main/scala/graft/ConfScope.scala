package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temporarily override a session conf around a block, always restoring.
  *
  * Iterative fixpoint loops and stateful streaming queries materialize with
  * whatever `spark.sql.shuffle.partitions` says at execution time; sizing
  * that to the ITERATION/STATE data instead of the session's generic
  * parallelism removes fixed per-round scheduling overhead that AQE will
  * not coalesce away (minPartitionNum floor). One shared implementation so
  * the save/set/restore policy cannot drift between call sites. */
private[graft] object ConfScope {

  /** Per-round shuffle width for an iterative loop, derived from the
    * loop's input row count (r12 directive #8): ceil(rows /
    * rowsPerPartition) clamped to [1, sessionWidth]. A fixpoint loop
    * pays its width in task-scheduling overhead EVERY round, so a
    * 3-edge fixture must not run 200-task rounds; conversely the
    * session width is the cluster-tuned ceiling and is never exceeded —
    * at 100 TB the clamp leaves the operator at full cluster width.
    * Always applied on an ISOLATED child session, never the caller's. */
  def autoLoopPartitions(rows: Long, sessionWidth: Int,
      rowsPerPartition: Long = 250000L): Int = {
    require(sessionWidth >= 1 && rowsPerPartition >= 1,
      s"bad width inputs: session=$sessionWidth per=$rowsPerPartition")
    math.max(1L, math.min(sessionWidth.toLong,
      (rows + rowsPerPartition - 1L) / rowsPerPartition)).toInt
  }

  /** The session's current shuffle width as an Int. */
  def sessionShuffleWidth(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily overridden (None = no-op); always restores. */
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

  /** Run an iterative fixpoint loop on an ISOLATED child session — same
    * SparkContext (shared executors, block manager, checkpoint dir),
    * fresh SQL-conf state — so a loop-scoped override like
    * `adaptive.enabled=false` can NEVER be observed by a concurrent
    * query on the caller's session (the shared-session caveat the
    * [[withConf]] call sites documented; a save/set/restore on a shared
    * conf is only safe single-threaded).
    *
    * `body` receives the child session and a `rebind` function that
    * hands a caller-session DataFrame across via a global temp view —
    * the supported cross-session plan hand-off: the view stores the
    * ANALYZED logical plan, so scan pushdown and column pruning survive
    * intact, no data movement happens. Views are dropped on exit; by
    * then every fixpoint loop has checkpointed its state into
    * LogicalRDDs that no longer reference them. The frame `body`
    * returns belongs to the child session (only conf resolution
    * differs; both sessions share one SparkContext), which also means
    * its final actions run under the loop's conf — the intended
    * behavior for a loop result. */
  def withIsolatedSession[T](spark: SparkSession,
      confs: (String, String)*)(
      body: (SparkSession, DataFrame => DataFrame) => T): T = {
    val iso = spark.newSession()
    // COPY the caller's explicitly-set runtime conf: a bare newSession()
    // starts from context defaults, silently dropping workload tuning
    // the caller applied at runtime (AQE skew thresholds, broadcast
    // limits, codegen knobs) — isolation means the loop's WRITES stay
    // private, not that the caller's READS stop applying. Entries that
    // are static/non-modifiable on a live session are skipped; fatal
    // errors (OOM, interrupt) must still propagate, so only NonFatal
    // is swallowed.
    spark.conf.getAll.foreach { case (k, v) =>
      try iso.conf.set(k, v) catch { case NonFatal(_) => () }
    }
    confs.foreach { case (k, v) => iso.conf.set(k, v) }
    val views = scala.collection.mutable.ArrayBuffer.empty[String]
    val rebind: DataFrame => DataFrame = df =>
      if (df.sparkSession eq iso) df
      else {
        val nm = "graft_iso_" +
          java.util.UUID.randomUUID().toString.replaceAll("-", "")
        df.createOrReplaceGlobalTempView(nm)
        views += nm
        iso.table(s"global_temp.$nm")
      }
    try body(iso, rebind)
    finally views.foreach { nm =>
      try spark.catalog.dropGlobalTempView(nm)
      catch { case NonFatal(_) => () }
    }
  }
}
