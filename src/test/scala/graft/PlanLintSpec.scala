package graft

/** Whole-surface plan lint: every SparkEntry query's physical plan is
  * swept for the patterns that kill 100 TB runs. Individual PlanSpec
  * tests pin the plans we designed; THIS suite guards the queries nobody
  * wrote a pin for yet — a new query entry with a cartesian join or a
  * global-rank window fails here by default and must either be fixed or
  * explicitly justified in an allowlist below.
  */
class PlanLintSpec extends SparkSuite {

  // Queries allowed to contain BroadcastNestedLoopJoin: all of them
  // attach a ONE-ROW (or k-row, k tiny and fixed) statistics/threshold
  // frame via broadcast cross join — constant-size build side by
  // construction, so the "nested loop" is a map-side constant lookup.
  private val oneRowBroadcastCross = Set(
    "q44_quality_quantile", // percentile threshold row
    "q48_mixing_plan", "q50_temperature_mixing", // corpus totals row
    "q51_apply_mixture", // rates frame (one row per source)
    "q288_ann_index_compact_stats", // postings-total row (share_ppm)
    "q295_stream_index_maintenance", // postings-total row (share_ppm)
    "q296_ann_pq_compact_stats", // codes-total row (share_ppm)
    "q297_stream_pq_maintenance", // codes-total row (share_ppm)
    "q298_ann_pq_recall_audit", // one-row truth-count frame
    "q294_ann_index_recall_audit", // one-row truth-count frame
    "q302_ann_adc_prefilter_report", // one-row candidate/kept/pairs
                                     // count frames (exact report)
    "q304_ann_delete_compact", // postings-total row (share_ppm)
    "q306_ann_filtered_recall_audit", // one-row truth-count frames
                                      // (recallOverlap, per band)
    "q55_prototypicality", // centroid list (k cells)
    "q49_semantic_dedup", // centroid TABLE broadcast (k rows by
                          // contract; within-cell pairs are capped —
                          // the quadratic path is bounded elsewhere)
    "q65_zorder_key", // min/max stats row
    "q66_key_skew", // totals row
    "q56_corpus_report", // totals row
    "q26_ann_bruteforce", // the ANN query set (k rows, broadcast by
                          // design: corpus never shuffles, map-side TopK)
    "q311_bm25_retrieval", // one-row (N, total-tokens) stats frame
    "q312_hybrid_retrieval", // q311's stats row + q26's broadcast
                             // query set (both constant-size)
    "q313_bm25_index_probe", // the same one-row stats frame, read
                             // from the index meta
    "q112_margin_mining", // exact-kernel variant: the mining query set
                          // broadcasts (corpus never shuffles); the
                          // 100 TB path feeds IVF/LSH candidates into
                          // the same margin instead
    "q85_bigram_lm_quality", // one-row vocab-size frame
    "q94_heldout_lm", // one-row vocab-size frame
    "q87_source_overlap", // K-row source-size frames (pair completeness)
    "q93_curriculum_order", // one-row quantile-boundaries frame
    "q95_length_histogram", // one-row totals frame
    "q123_sketch_overlap", // G-row sketch frames (G = corpus count): the
                          // pairwise < join runs on O(k) sketches, the
                          // data itself is touched once by the sketch agg
    "q137_knn_label_prop", // the held-out query set broadcasts (q26's
                          // pattern): corpus scored map-side, bounded
                          // top-k reduce
    "q142_triangle_count", // three ONE-ROW census frames stitched by
                          // broadcast cross join
    "q143_pareto_frontier", // one-row percentile-boundaries frame
    "q284_ann_ivfpq_two_level", // the √N-row centroid TABLE broadcasts
                          // to rank the (small-by-contract) query batch
                          // over all cells — the whole point of the
                          // two-level quantizer is moving centroids out
                          // of the plan literal and onto the broadcast
                          // data path; the corpus side joins it KEYED
                          // (by super-cell), never nested-loop
    "q150_sorted_neighborhood", // one-row band-boundaries frame
    "q148_heavy_hitters", // one-row totals frame for the N/k threshold
    "q154_phrase_lift",   // one-row corpus token-total frame
    "q160_negative_sampling", // one-row item-domain-bounds frame
    "q188_association_rules", // one-row n_baskets totals frame
    "q198_t_closeness", // sensitive-domain grid (bounded categories) +
                        // one-row totals frame
    "q200_stream_heavy_hitters", // one-row n_total frame (q148's
                                 // threshold attach, streaming phase 1)
    "q204_chi_square", // category-domain contingency grid (bounded) +
                       // one-row totals frame
    "q211_embedding_drift", // two ONE-ROW frames (dim-sums dots +
                            // cohort counts) stitched by key join
    "q228_conformance_audit", // one-row transition-total frame
    "q166_ind_discovery",  // one-row ndv/missing count frames
    "q167_degree_assortativity", // one-row correlation-sums frame
    "q171_kmv_rollup",     // rolled-away dims fold to literal NULLs, so
                           // the per-level count⨝sketch stitch (one row
                           // per level cell, |cells| tiny) loses its
                           // equi-keys at the coarser levels
    "q172_benford_audit",  // one-row share-denominator totals frame
    "q176_join_size_estimate", // one-row totals/ndv/hot-stats frames
    "q181_partition_agreement", // one-row contingency-summary frames
    "q182_quantization_recall", // the ANN query set broadcasts (q26's
                           // pattern): corpus scored map-side once for
                           // both precisions, bounded top-k reduce
    "q240_life_table",     // one-row censoring-frontier frame
    "q246_zonemap_report", // 3-row literal predicate frame on the
                           // O(buckets) zone table
    "q251_word_subsample", // one-row corpus-total frame
    "q252_bloom_fpr",      // one-row member/bit/probe stat frames
    "q253_rle_audit",      // one-row totals x one-row distincts stitch
    "q261_split_balance",  // one-row grand-total frame
    "q270_linkage_patterns" // one-row pair-marginals frame attached to
                           // the <=2^k-row pattern table
  )

  // Streaming entries run a query to a memory sink when invoked; their
  // returned frame is a memory-table scan, so plan text is not the
  // micro-batch plan. They are covered by StreamsSpec equivalences.
  private val streaming = Set(
    "q29_stream_window", "q43_stream_dedup", "q68_stream_enrich",
    "q73_stream_interval_join", "q91_stream_fhir_ingest",
    "q120_stream_hopping_window", "q134_stream_scd2",
    "q138_stream_kmv_distinct", "q141_stream_funnel",
    "q149_stream_histogram", "q162_stream_scd2_enrich")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.keysIterator
      .filterNot(streaming)
      .map { name =>
        name -> SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString()
      }.toMap

  test("no query plans a cartesian product") {
    val bad = plans.collect {
      case (name, p) if p.contains("CartesianProduct") => name
    }
    assert(bad.isEmpty, s"cartesian product in: $bad")
  }

  test("nested-loop joins only where a constant-size frame is attached") {
    val bad = plans.collect {
      case (name, p) if p.contains("BroadcastNestedLoopJoin") &&
        !oneRowBroadcastCross(name) => name
    }
    assert(bad.isEmpty,
      s"unexpected BroadcastNestedLoopJoin in: $bad — fix the plan or " +
        "justify the query in oneRowBroadcastCross")
  }

  test("no window function runs on a single-partition exchange") {
    // an ORDER BY window with no PARTITION BY plans as
    // Exchange SinglePartition → Window: the whole input serializes
    // through one task. Checked per WINDOW SUBTREE (the first Exchange
    // below each Window node), not per whole-plan substring — a one-row
    // global aggregate elsewhere in the plan legitimately uses a
    // SinglePartition exchange and must not trip this.
    def windowOnSinglePartition(p: String): Boolean = {
      val lines = p.linesIterator.toArray
      def depth(l: String): Int = l.indexWhere(_.isLetter) match {
        case -1 => Int.MaxValue
        case i => i
      }
      lines.indices.exists { i =>
        val l = lines(i)
        l.contains("Window [") && {
          val d = depth(l)
          var j = i + 1
          var firstExchange: Option[String] = None
          while (j < lines.length && depth(lines(j)) > d &&
            firstExchange.isEmpty) {
            if (lines(j).contains("Exchange "))
              firstExchange = Some(lines(j))
            j += 1
          }
          firstExchange.exists(_.contains("SinglePartition"))
        }
      }
    }
    val bad = plans.collect {
      case (name, p) if windowOnSinglePartition(p) => name
    }
    assert(bad.isEmpty, s"single-partition window in: $bad")
  }

  test("every parquet scan prunes columns (no full-schema reads of wide " +
      "tables)") {
    // lineitem is the widest table: a scan reading l_comment when no
    // query output needs it marks a missing projection pushdown
    val bad = plans.collect {
      case (name, p) if p.contains("l_comment") &&
        name != "q01_scan_pushdown" => name
    }
    assert(bad.isEmpty, s"unpruned lineitem scan in: $bad")
  }
}
