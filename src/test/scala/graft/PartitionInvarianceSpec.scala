package graft

/** Whole-surface determinism sweep: every SparkEntry query must return
  * the SAME multiset of rows when the session's shuffle width changes —
  * the property the DuckDB oracle implicitly depends on (a result that
  * varies with partitioning can never hash-match a single-threaded
  * recomputation), asserted here directly so a partition-sensitive
  * operator (an order-dependent float reduction, a first()-style
  * aggregate, a spark_partition_id leak) fails in CI rather than as a
  * flaky correctness row.
  *
  * Streaming entries are excluded: a stateful query pins its state-store
  * partitioning at start by design (they set their own width via
  * runToMemory) and their determinism is covered by the batch-equivalence
  * tests in StreamsSpec.
  */
class PartitionInvarianceSpec extends SparkSuite {

  private val streaming = Set(
    "q29_stream_window", "q43_stream_dedup", "q68_stream_enrich",
    "q73_stream_interval_join", "q91_stream_fhir_ingest",
    "q113_stream_media_dedup", "q120_stream_hopping_window",
    "q134_stream_scd2", "q138_stream_kmv_distinct",
    "q141_stream_funnel", "q149_stream_histogram",
    "q162_stream_scd2_enrich")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols.map(c => s"`$c`"): _*)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .toSeq.sorted
  }

  test("every batch query returns identical rows at shuffle widths " +
      "4 and 7") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keysIterator.filterNot(streaming).foreach { name =>
      val at4 = graft.ConfScope.withShuffleWidth(spark, Some(4)) {
        canon(SparkEntry.queries(name)(spark, sfDir))
      }
      val at7 = graft.ConfScope.withShuffleWidth(spark, Some(7)) {
        canon(SparkEntry.queries(name)(spark, sfDir))
      }
      if (at4 != at7) bad += name
    }
    assert(bad.isEmpty,
      s"partition-sensitive results in: ${bad.toList}")
  }
}
