package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** One-off scale probe for the persisted IVF index lifecycle
  * (q286–q288 evidence): at each corpus size N it builds and persists a
  * ⌈√N⌉-cell index over synthetic 64-dim vectors, appends a 10k delta,
  * probes 16 queries with dynamic partition pruning ON and OFF, and
  * compacts — printing one JSON line per N with the walls and the
  * postings file counts. The claims under test: build scales with one
  * corpus pass + one shuffle; append scales with the DELTA, not the
  * corpus; a DPP probe's read tracks probed cells, not N; the write
  * layout stays one-file-per-cell.
  *
  * Driver-side evidence tooling (like ProbeIvf), not library surface.
  * Usage: runMain graft.tools.ProbeAnnIndex [n1 n2 ...] */
object ProbeAnnIndex {
  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(200000L, 1000000L)
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

    def postingsFiles(path: String): Int = {
      def walk(f: java.io.File): Int = {
        val kids = f.listFiles()
        if (kids == null) 0
        else kids.map(k => if (k.isDirectory) walk(k)
          else if (k.getName.endsWith(".parquet")) 1 else 0).sum
      }
      walk(new java.io.File(path + "/postings"))
    }

    sizes.foreach { n =>
      val cells = math.ceil(math.sqrt(n.toDouble)).toInt
      val path = s"/tmp/annprobe_$n"
      val corpus = synth(0L, n)
      val seeds = Similarity.hashSeeds(corpus, "vec_id", "embedding",
        cells)
      // assignment-only walls, flat exact vs the two-level router, then
      // the persisted build (assignment + cell shuffle + write) on the
      // two-level route — the configuration a corpus this size runs.
      // The forcing action must AGGREGATE the cell column: a bare
      // count() lets column pruning drop the argmax projection entirely
      // (measured 0.12 s for 4M rows — nothing ran)
      val idxFlat = Similarity.buildIvfIndex(corpus, "vec_id",
        "embedding", seeds, "sid", "svec")
      val (tAssignFlat, _) = timeIt {
        idxFlat.postings.agg(sum(col("cell"))).collect()
      }
      val idx2 = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
        seeds, "sid", "svec", twoLevelThreshold = 1)
      val (tAssignTwoLevel, _) = timeIt {
        idx2.postings.agg(sum(col("cell"))).collect()
      }
      val (tBuild, _) = timeIt { Similarity.writeIvfIndex(idx2, path) }
      val filesAfterBuild = postingsFiles(path)
      val (tAppend, _) = timeIt {
        // routing parameters come from the index's persisted meta
        Similarity.appendToIvfIndex(spark, path, synth(n, n + 10000L),
          "vec_id", "embedding")
      }
      val filesAfterAppend = postingsFiles(path)
      val queries = synth(0L, 16L)
      // files/bytes actually READ by the postings scan — the metric the
      // pruning claim is about (at fixture scale the tiny per-cell files
      // coalesce into a handful of splits, so WALL barely moves; at
      // cell sizes worth indexing the byte cut is the probe cost)
      def probedScan(df0: => DataFrame): (Long, Long, Long) =
        // AQE query stages hide executed scans from plan.collect; the
        // probe measurement runs non-adaptive so the scan metrics are
        // reachable (DPP inserts with or without AQE)
        graft.ConfScope.withConf(spark, "spark.sql.adaptive.enabled",
          "false") {
          val df = df0
          // collect() (not count()) so the metrics are read from the
          // SAME queryExecution that ran — count() plans a separate agg
          val n = df.collect().length.toLong
          val scans = df.queryExecution.executedPlan.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.output.exists(_.name == "cnorm") => s
          }
          val files = scans.map(_.metrics("numFiles").value).sum
          val bytes = scans.map(_.metrics("filesSize").value).sum
          (n, files, bytes)
        }
      val (tProbe, (nProbeRows, filesDpp, bytesDpp)) = timeIt {
        probedScan(Similarity.probeIvfIndex(
          Similarity.readIvfIndex(spark, path),
          queries, "vec_id", "embedding", k = 10, nprobe = 4))
      }
      val (tProbeNoDpp, (_, filesFull, bytesFull)) = timeIt {
        graft.ConfScope.withConf(spark,
          "spark.sql.optimizer.dynamicPartitionPruning.enabled",
          "false") {
          probedScan(Similarity.probeIvfIndex(
            Similarity.readIvfIndex(spark, path),
            queries, "vec_id", "embedding", k = 10, nprobe = 4))
        }
      }
      val (tCompact, _) = timeIt { Similarity.compactIvfIndex(spark, path) }
      val filesAfterCompact = postingsFiles(path)
      // PQ at-rest comparison: same corpus/seeds, codes instead of
      // vectors (256-code codebook, 8 subspaces)
      val pqPath = s"/tmp/annpq_$n"
      val (tPqBuild, _) = timeIt {
        Similarity.writeIvfPqIndex(Similarity.buildIvfPqIndex(corpus,
          "vec_id", "embedding", seeds, "sid", "svec",
          codebookIds = 0L until 256L, inDims = 64, nSub = 8,
          twoLevelThreshold = 1), pqPath)
      }
      def dirBytes(p: String): Long = {
        def walk(f: java.io.File): Long = {
          val kids = f.listFiles()
          if (kids == null) f.length()
          else kids.map(walk).sum
        }
        walk(new java.io.File(p))
      }
      val rawBytes = dirBytes(path + "/postings")
      val pqBytes = dirBytes(pqPath + "/codes")
      val (tPqProbe, _) = timeIt {
        Similarity.probeIvfPqIndex(Similarity.readIvfPqIndex(spark,
          pqPath), queries, "vec_id", "embedding", k = 10, nprobe = 4)
          .count()
      }
      println(s"""{"n":$n,"cells":$cells,""" +
        f""""assign_flat_sec":$tAssignFlat%.2f,""" +
        f""""assign_two_level_sec":$tAssignTwoLevel%.2f,""" +
        f""""build_write_sec":$tBuild%.2f,""" +
        s""""files_after_build":$filesAfterBuild,""" +
        f""""append_10k_sec":$tAppend%.2f,""" +
        s""""files_after_append":$filesAfterAppend,""" +
        f""""probe16_dpp_sec":$tProbe%.2f,""" +
        s""""probe_files_read_dpp":$filesDpp,""" +
        s""""probe_bytes_read_dpp":$bytesDpp,""" +
        f""""probe16_full_scan_sec":$tProbeNoDpp%.2f,""" +
        s""""probe_files_read_full":$filesFull,""" +
        s""""probe_bytes_read_full":$bytesFull,""" +
        f""""compact_sec":$tCompact%.2f,""" +
        s""""files_after_compact":$filesAfterCompact,""" +
        f""""pq_build_write_sec":$tPqBuild%.2f,""" +
        s""""raw_postings_bytes":$rawBytes,""" +
        s""""pq_codes_bytes":$pqBytes,""" +
        f""""pq_probe16_sec":$tPqProbe%.2f,""" +
        s""""probe_rows":$nProbeRows}""")
    }
    spark.stop()
  }
}
