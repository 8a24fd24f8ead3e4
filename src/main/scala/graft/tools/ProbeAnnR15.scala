package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** One-off scale probe for the round-15 index surfaces (q292–q298
  * evidence): at each corpus size N over the synthetic 64-dim vectors it
  * measures (a) capped vs uncapped [[Similarity.annNearDupPairs]] on a
  * 10k batch against a persisted ⌈√N⌉-cell index — wall, emitted rows,
  * and the exact drop accounting; (b) [[Similarity.ivfRecallAudit]] over
  * 32 sampled queries at several probe budgets — wall + the recall
  * curve; (c) PQ codes compaction after three appends — file counts and
  * probe wall before/after. Claims under test: the cap bounds the EMIT
  * (not the probe work) with exact accounting; the recall audit costs
  * one brute-force pass over the corpus (map-side, queries broadcast)
  * plus nprobe DPP probes; code compaction restores one-file-per-cell
  * and the probe wall tracks files opened.
  *
  * Driver-side evidence tooling (like ProbeAnnIndex), not library
  * surface. Usage: runMain graft.tools.ProbeAnnR15 [n1 n2 ...] */
object ProbeAnnR15 {
  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(250000L, 1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def synth(from: Long, until: Long): DataFrame =
      spark.range(from, until).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => sin(col("id") * 1.37 + j * 0.61).cast("float"))
          .as("embedding"))

    def timeIt[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    def filesUnder(p: String): Int = {
      def walk(f: java.io.File): Int = {
        val kids = f.listFiles()
        if (kids == null) 0
        else kids.map(k => if (k.isDirectory) walk(k)
          else if (k.getName.endsWith(".parquet")) 1 else 0).sum
      }
      walk(new java.io.File(p))
    }

    sizes.foreach { n =>
      val cells = math.ceil(math.sqrt(n.toDouble)).toInt
      val path = s"/tmp/annr15_$n"
      val corpus = synth(0L, n)
      val seeds = Similarity.hashSeeds(corpus, "vec_id", "embedding",
        cells)
      Similarity.writeIvfIndex(Similarity.buildIvfIndex(corpus, "vec_id",
        "embedding", seeds, "sid", "svec", twoLevelThreshold = 1), path)
      val idx = Similarity.readIvfIndex(spark, path)
      val batch = synth(n, n + 10000L)

      // (a) dense-batch dedup: uncapped emit vs top-8 cap + accounting
      val (tUncapped, nUncapped) = timeIt {
        Similarity.annNearDupPairs(idx, batch, "vec_id", "embedding",
          thresholdPpm = 500000L, nprobe = 4).count()
      }
      val (tCapped, nCapped) = timeIt {
        Similarity.annNearDupPairs(idx, batch, "vec_id", "embedding",
          thresholdPpm = 500000L, nprobe = 4, maxPairsPerNew = 8).count()
      }
      val (tReport, rep) = timeIt {
        Similarity.annNearDupDropReport(idx, batch, "vec_id",
          "embedding", thresholdPpm = 500000L, maxPairsPerNew = 8,
          nprobe = 4).collect().head
      }

      // (b) recall audit: 32 sampled queries, three probe budgets
      val queries = corpus.where(col("vec_id") < 32)
      val (tAudit, audit) = timeIt {
        Similarity.ivfRecallAudit(idx, corpus, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 10,
          nprobes = Seq(1, 4, 16))
          .collect().map(r => r.getAs[Int]("nprobe") ->
            r.getAs[Long]("recall_ppm")).sortBy(_._1)
      }

      // (c) PQ codes compaction after three 10k appends
      val pqPath = s"/tmp/annr15pq_$n"
      val pq = Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding",
        seeds, "sid", "svec", codebookIds = 0L until 256L,
        inDims = 64, nSub = 8, twoLevelThreshold = 1)
      Similarity.writeIvfPqIndex(pq, pqPath)
      graft.Lineage.retireDependents(pq.codes)
      (0 until 3).foreach { i =>
        Similarity.appendToIvfPqIndex(spark, pqPath,
          synth(n + i * 10000L, n + (i + 1) * 10000L), "vec_id",
          "embedding")
      }
      val filesBefore = filesUnder(pqPath + "/codes")
      val pqQueries = corpus.where(col("vec_id") < 16)
      def pqProbe(): Long = Similarity.probeIvfPqIndex(
        Similarity.readIvfPqIndex(spark, pqPath), pqQueries, "vec_id",
        "embedding", k = 10, nprobe = 4).count()
      val (tProbePre, _) = timeIt(pqProbe())
      val (tCompact, _) =
        timeIt(Similarity.compactIvfPqIndex(spark, pqPath))
      val filesAfter = filesUnder(pqPath + "/codes")
      val (tProbePost, _) = timeIt(pqProbe())

      println(s"""{"n":$n,"cells":$cells,""" +
        f""""dedup_uncapped_sec":$tUncapped%.2f,""" +
        s""""dedup_uncapped_pairs":$nUncapped,""" +
        f""""dedup_capped_sec":$tCapped%.2f,""" +
        s""""dedup_capped_pairs":$nCapped,""" +
        f""""drop_report_sec":$tReport%.2f,""" +
        s""""drop_report":{"n_new_rows_paired":${rep.getLong(0)},""" +
        s""""n_pairs":${rep.getLong(1)},""" +
        s""""n_pairs_kept":${rep.getLong(2)},""" +
        s""""n_pairs_dropped":${rep.getLong(3)},""" +
        s""""dropped_pair_share_ppm":${rep.getLong(4)}},""" +
        f""""recall_audit_sec":$tAudit%.2f,""" +
        s""""recall_ppm_by_nprobe":{${
          audit.map { case (np, r) => s"\"$np\":$r" }.mkString(",")}},""" +
        s""""pq_code_files_after_3_appends":$filesBefore,""" +
        f""""pq_probe_pre_compact_sec":$tProbePre%.2f,""" +
        f""""pq_compact_sec":$tCompact%.2f,""" +
        s""""pq_code_files_after_compact":$filesAfter,""" +
        f""""pq_probe_post_compact_sec":$tProbePost%.2f}""")
    }
    spark.stop()
  }
}
