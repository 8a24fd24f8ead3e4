package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The meta EVOLUTION contract (r16 directive #7), pinned against
  * hand-written legacy meta dirs — the rules every future meta column
  * must follow (documented on `Similarity.readMetaRow`):
  *   1. a new column ships with a default equal to the historical
  *      behavior, so legacy roots reopen under what they were built
  *      with;
  *   2. a column without a default is REQUIRED and a meta missing it
  *      fails loudly, never inventing a value;
  *   3. unknown extra columns (a newer writer's meta) are ignored on
  *      read. */
class MetaEvolutionSpec extends SparkSuite {

  private val dims = 8

  private def vec(seed: Long): Seq[Float] =
    (0 until dims).map { i =>
      val h = ((seed * 2654435761L + i * 40503L) % 1000L + 1000L) % 1000L
      (h.toFloat - 500f) / 250f
    }

  private def tmpDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"metaevo_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private lazy val corpus = {
    import spark.implicits._
    (0L until 50L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
  }

  /** Replace the root's meta dir with a hand-written single-row frame —
    * the shape an index written by an OLDER (or newer) library version
    * left on disk. */
  private def replaceMeta(path: String,
      row: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val meta = new Path(path + "/meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(meta, true)
    row.coalesce(1).write.parquet(meta.toString)
  }

  private def freshPqRoot(tag: String): String = {
    val seeds = Similarity.hashSeeds(corpus, "vec_id", "embedding", 4)
    val path = tmpDir(tag)
    Similarity.writeIvfPqIndex(Similarity.buildIvfPqIndex(corpus,
      "vec_id", "embedding", seeds, "sid", "svec",
      codebookIds = Seq(1L, 2L, 3L, 4L), inDims = dims, nSub = 2), path)
    path
  }

  test("rule 1: a legacy meta without the defaulted column reopens " +
    "under the historical default (PQ and raw)") {
    import spark.implicits._
    val pqPath = freshPqRoot("legacy")
    // a meta written before two_level_threshold existed
    replaceMeta(pqPath, Seq((dims, 2, 10000))
      .toDF("in_dims", "n_sub", "quant_scale"))
    val back = Similarity.readIvfPqIndex(spark, pqPath)
    assert((back.inDims, back.nSub, back.quantScale,
      back.twoLevelThreshold) === (dims, 2, 10000, 4096))
    // raw twin: quant_scale-only meta → (qs, 4096)
    val seeds = Similarity.hashSeeds(corpus, "vec_id", "embedding", 4)
    val rawPath = tmpDir("legacyraw")
    Similarity.writeIvfIndex(Similarity.buildIvfIndex(corpus, "vec_id",
      "embedding", seeds, "sid", "svec", quantScale = 5000), rawPath)
    replaceMeta(rawPath, Seq(Tuple1(5000)).toDF("quant_scale"))
    val rawBack = Similarity.readIvfIndex(spark, rawPath)
    assert((rawBack.quantScale, rawBack.twoLevelThreshold) ===
      (5000, 4096))
  }

  test("rule 2: a meta missing a REQUIRED (undefaulted) column fails " +
    "loudly instead of inventing a value") {
    import spark.implicits._
    val pqPath = freshPqRoot("required")
    // quant_scale has no pre-history (the meta file has always carried
    // it) — a meta without it is a broken root, not a legacy one
    replaceMeta(pqPath, Seq((dims, 2, 4096))
      .toDF("in_dims", "n_sub", "two_level_threshold"))
    val ex = intercept[IllegalStateException] {
      Similarity.readIvfPqIndex(spark, pqPath)
    }
    assert(ex.getMessage.contains("required field quant_scale"))
  }

  test("rule 3: unknown extra columns from a newer writer are ignored " +
    "and the known values round-trip") {
    import spark.implicits._
    val pqPath = freshPqRoot("forward")
    replaceMeta(pqPath, Seq((dims, 2, 10000, 4096, 7))
      .toDF("in_dims", "n_sub", "quant_scale", "two_level_threshold",
        "future_flag"))
    val back = Similarity.readIvfPqIndex(spark, pqPath)
    assert((back.inDims, back.nSub, back.quantScale,
      back.twoLevelThreshold) === (dims, 2, 10000, 4096))
    // the index still serves probes under the (unchanged) geometry
    assert(Similarity.probeIvfPqIndex(back,
      corpus.where(col("vec_id") < 2), "vec_id", "embedding", k = 3,
      nprobe = 4).count() > 0)
  }
}
