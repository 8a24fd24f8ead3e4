package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.closure.TransitiveClosure

/** Contract for [[Lineage]] — the fault-tolerance switch the iterative
  * family (closure, PageRank, connected components, BFS) depends on at
  * cluster scale: with `graft.checkpoint.dir` set, every loop round
  * checkpoints to RELIABLE storage (survives executor loss); unset, the
  * zero-infrastructure `localCheckpoint` path is used. Both must produce
  * identical results; the reliable mode must actually write checkpoint
  * files into the configured directory. */
class LineageSpec extends SparkSuite {

  private def closurePairs(): Set[(Long, Long)] = {
    import spark.implicits._
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("parent", "child")
    TransitiveClosure.closureLong(spark, edges)
      .as[(Long, Long)].collect().toSet
  }

  test("reliable checkpoint mode: same closure, files on disk") {
    val dir = Files.createTempDirectory("graft-ckpt").toFile
    val expected = closurePairs() // default local mode
    spark.conf.set(Lineage.CheckpointDirKey, dir.getAbsolutePath)
    try {
      val got = closurePairs()
      assert(got === expected)
      def countFiles(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(countFiles).sum
        else 1
      assert(countFiles(dir) > 0,
        s"expected reliable checkpoint files under $dir")
    } finally {
      spark.conf.unset(Lineage.CheckpointDirKey)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("pagerank identical under both checkpoint modes") {
    import graft.Lineage._
    val edges = spark.range(200).select(
      (col("id") % 50).as("src"), ((col("id") * 7 + 3) % 50).as("dst"))
    def run(): Map[Long, Long] =
      graft.ops.Graphs.pageRankFixedPoint(spark, edges, iterations = 3)
        .select(col("node"), col("rank")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run()
    val dir = Files.createTempDirectory("graft-ckpt-pr").toFile
    spark.conf.set(Lineage.CheckpointDirKey, dir.getAbsolutePath)
    try assert(run() === local)
    finally {
      spark.conf.unset(Lineage.CheckpointDirKey)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }
}
