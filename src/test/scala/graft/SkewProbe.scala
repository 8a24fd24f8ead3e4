package graft

/** Skew-stress probe for the iterative graph family (r12 directive #4):
  * uniform vs power-law-ish fixtures at equal edge count — one hub node
  * owning ~10% of the edges as src, as dst, and as a component hub for
  * the near-dup clustering loop. Prints one JSON line per (op, fixture,
  * scale) with wall seconds, for SCALE_r13 evidence.
  *
  * Not a correctness test (results are checked by each op's oracle row);
  * run manually:
  *   sbt -batch "Test/runMain graft.SkewProbe [edges] [mult]"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the Bench JVM-hygiene bounds (r11 directive #1): without them
      // the app-status stores retain per-execution plan graphs across
      // the 24 loop runs and the probe OOMs at 8g on the LAST fixture —
      // nearDupClusters on the same fixture runs in 49s in a fresh JVM
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val baseE = args.headOption.map(_.toLong).getOrElse(2000000L)
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)

    def edges(e: Long, hub: String) = {
      val n = math.max(1L, e / 10L) // avg degree 10
      val r = spark.range(e)
      val uSrc = pmod(xxhash64(lit("s"), col("id")), lit(n))
      val uDst = pmod(xxhash64(lit("d"), col("id")), lit(n))
      val isHub = pmod(xxhash64(lit("h"), col("id")), lit(10)) === 0
      val (s, d) = hub match {
        case "uniform" => (uSrc, uDst)
        case "hub_src" => (when(isHub, lit(0L)).otherwise(uSrc), uDst)
        case "hub_dst" => (uSrc, when(isHub, lit(0L)).otherwise(uDst))
      }
      // persist (NOT localCheckpoint): unpersist below actually frees
      // the blocks between fixtures — six 20M-row checkpoint leftovers
      // OOMed the first probe run
      val df = r.select(s.as("src"), d.as("dst")).persist()
      df.count()
      df
    }

    def time(what: => Long): Double = {
      val t0 = System.nanoTime(); val n = what
      val sec = (System.nanoTime() - t0) / 1e9
      require(n >= 0); sec
    }

    for (scale <- Seq(1, mult); fixture <- Seq("uniform", "hub_src",
        "hub_dst")) {
      val e = edges(baseE * scale, fixture)
      val ops = Seq[(String, () => Long)](
        "pagerank_5it" -> (() => graft.ops.Graphs
          .pageRankFixedPoint(spark, e, iterations = 5).count()),
        "kcore_k8" -> (() => graft.ops.Graphs.kCore(spark, e, 8).count()),
        "bfs_d3" -> (() => graft.ops.Graphs.multiSourceBfs(spark, e,
          Seq(1L, 2L, 3L), maxDepth = 3).count()),
        "neardup_clusters" -> (() => graft.ops.Dedup.nearDupClusters(
          e.select(col("src").as("id_a"), col("dst").as("id_b")))
          .count()))
      ops.foreach { case (name, run) =>
        val sec = time(run())
        println(f"""{"op":"$name","fixture":"$fixture",""" +
          f""""edges":${baseE * scale},"sec":$sec%.2f}""")
        // GC settle (the Bench hygiene pattern): each loop's final state
        // checkpoint is reaped by the ContextCleaner only after the
        // DataFrame object is garbage-collected — force that between ops
        // so 24 consecutive loop runs fit one JVM
        System.gc(); Thread.sleep(300)
      }
      e.unpersist()
    }
    spark.stop()
  }
}
