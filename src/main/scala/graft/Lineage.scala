package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operator family (transitive
  * closure, PageRank, connected components, BFS, semi-naive deltas, …)
  * with a cluster-grade fault-tolerance switch.
  *
  * Every fixpoint loop in this library truncates its growing lineage once
  * per round — otherwise round k re-executes rounds 1..k-1 and the job is
  * quadratic in round count. `Dataset.localCheckpoint()` does that with
  * zero external storage, but the blocks live on executor-local disk/
  * memory: on a REAL cluster, losing one executor mid-job discards blocks
  * that have no lineage to recompute from, and the whole job dies. That
  * is fine at local[32] (one JVM — if it dies, everything dies anyway)
  * and wrong at 1000 executors on a 100 TB run.
  *
  * Setting `graft.checkpoint.dir` (session conf) switches every loop in
  * the library to RELIABLE `Dataset.checkpoint()` into that directory
  * (HDFS/S3/any Hadoop FS): blocks survive executor loss and the job
  * continues. Unset (the default), behavior is unchanged
  * (`localCheckpoint`). One shared implementation so the policy cannot
  * drift between call sites.
  *
  * Both forms preserve the physical `outputPartitioning` of the child
  * plan (Spark captures it into the `LogicalRDD`), so co-partitioned
  * iterative joins (e.g. PageRank state partitioned by node against the
  * src-partitioned edge list) keep their exchange-free shape across
  * rounds under either mode.
  */
object Lineage {

  /** Session conf key: when set to a non-empty path, [[truncate]] uses
    * reliable `checkpoint()` into it instead of `localCheckpoint()`. */
  val CheckpointDirKey = "graft.checkpoint.dir"

  implicit final class DataFrameLineageOps(private val df: DataFrame)
      extends AnyVal {
    /** Truncate lineage: reliable `checkpoint(eager)` when
      * `graft.checkpoint.dir` is set, `localCheckpoint(eager)` otherwise.
      * `eager = false` defers materialization so the checkpoint fuses
      * with the next action instead of costing its own job. */
    def truncateLineage(eager: Boolean = true): DataFrame = {
      val spark = df.sparkSession
      val dir = try spark.conf.get(CheckpointDirKey, "")
        catch { case _: Throwable => "" }
      if (dir.isEmpty) df.localCheckpoint(eager)
      else {
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      }
    }
  }
}
