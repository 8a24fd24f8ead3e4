package graft

/** Plan-shape regression tests: the physical plans ARE the product at
  * 100 TB, so the scale-critical properties — filters reaching the parquet
  * scan, map-side partial top-k, bounded bucket aggregation, broadcast
  * small-side joins — are asserted here and fail loudly if a refactor
  * silently degrades them. */
class PlanSpec extends SparkSuite {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir)
      .queryExecution.executedPlan.toString()

  test("q01: filters are pushed to the parquet scan") {
    val p = plan("q01_scan_pushdown")
    assert(p.contains("PushedFilters:"), p.take(2000))
    assert(p.contains("GreaterThan(l_quantity") &&
      p.contains("EqualTo(l_returnfl")) // toString truncates long lists
    // column pruning: only the needed columns are read
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("q26: top-k is a partial (map-side) aggregate, not a global window") {
    val p = plan("q26_ann_bruteforce")
    assert(p.contains("partial_topk_by_score"))
    assert(!p.contains("Window"), "a window would single-reduce each query")
  }

  test("q23: bucket aggregation is the bounded collect set") {
    val p = plan("q23_minhash_pairs")
    assert(p.contains("bounded_collect_set"))
    assert(p.contains("partial_bounded_collect_set")) // map-side partial
  }

  test("q98: valueset membership is Catalyst-visible (no UDF) and " +
    "composed filters still reach the parquet scan") {
    val p = plan("q98_in_valueset_column")
    assert(!p.contains("UDF") && !p.contains("in_valueset"),
      "membership must be plain Column expressions, not an opaque UDF:\n" +
        p.take(2000))
    // a conjunct added on top of the membership predicate must still
    // push down to the scan — the property the UDF form cannot give
    val composed = SparkEntry.queries("q98_in_valueset_column")(
        spark, sfDir)
      .where(org.apache.spark.sql.functions.col("doc_id") < 100)
      .queryExecution.executedPlan.toString()
    assert(composed.contains("LessThan(doc_id,100)"),
      composed.take(2000))
  }

  test("q09: small dimension side is broadcast") {
    val p = plan("q09_join_agg")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("q02: point lookup pushes the key predicate") {
    val p = plan("q02_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"))
  }

  test("q14: grouped aggregation has a map-side partial phase") {
    val p = plan("q14_group_agg")
    assert(p.contains("partial_sum") || p.contains("Partial"))
  }

  test("q34: near-dup plan has no quadratic join anywhere") {
    // the shipped q34/q35 path is the banded-LSH candidate pipeline; the
    // all-pairs `a.id < b.id` kernel (BroadcastNestedLoopJoin) exists ONLY
    // as the oracle/differential reference. A regression that reintroduces
    // a nested-loop or cartesian stage into the shipped plan fails here.
    val p = plan("q34_cosine_neardups")
    assert(!p.contains("NestedLoopJoin"), "quadratic join in the scale path")
    assert(!p.contains("CartesianProduct"), "cartesian stage in the scale path")
    // candidate generation is the capped bucket aggregate with a map-side
    // partial, joined back by equi-join on id
    assert(p.contains("partial_bounded_collect_set"))
  }

  test("q38: seeded IVF probes are broadcast; corpus is never shuffled " +
      "for the join") {
    val p = plan("q38_ann_ivf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("partial_topk_by_score"))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q39: split assignment is a pure projection — zero shuffles") {
    val p = plan("q39_split")
    assert(!p.contains("Exchange"), "split must not shuffle:\n" + p.take(2000))
    assert(!p.contains("Window"))
  }

  test("q40: packing never plans a single-partition global window") {
    val p = plan("q40_pack")
    // the running sum must be partitioned by the range block — a plain
    // ORDER BY window would serialize the whole corpus through one task
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("SinglePartition"),
      "global-order window detected:\n" + p.take(2000))
  }

  test("q41: incremental dedup joins batch to index by equi-join only") {
    val p = plan("q41_incremental_minhash")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"))
    // candidate generation is bucket equi-join, not pair expansion, so the
    // bounded-collect aggregate of the batch path must NOT appear
    assert(!p.contains("bounded_collect_set"))
  }

  test("q44: quantile threshold is broadcast back, not collected") {
    val p = plan("q44_quality_quantile")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q45: repetition shares are map-side-combined aggregations") {
    val p = plan("q45_repetition")
    assert(p.contains("partial_count") || p.contains("Partial"),
      p.take(2000))
    assert(!p.contains("SinglePartition"))
  }

  test("q46: benchmark side of the decontamination join is broadcast") {
    val p = plan("q46_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "corpus must not shuffle on the gram key")
  }

  test("q47: keeper selection is an aggregate, not a window") {
    val p = plan("q47_dedup_pipeline")
    assert(p.contains("max_by") || p.contains("partial_max_by"), p.take(2000))
    assert(!p.contains("Window"),
      "keeper per cluster must not serialize cluster members via a window")
  }

  test("q48: mixing stats materialize once; totals attach by broadcast") {
    val p = plan("q48_mixing_plan")
    // the per-source stats frame is localCheckpoint'ed, so BOTH branches
    // (totals scalar + output crossJoin) read the materialized RDD — the
    // corpus is scanned exactly once, in the checkpoint's own job (the
    // un-checkpointed shape scanned documents once PER branch: the
    // branches prune different columns, so ReuseExchange never fires)
    assert(p.contains("ExistingRDD"), p.take(2000))
    assert(!p.contains("FileScan"),
      "a FileScan here means a branch re-derived the corpus scan")
    // corpus totals come from the tiny stats frame via a broadcast cross
    // join, NOT a global window
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("Window"))
  }

  test("q49: semantic dedup pairs come from the capped bucket expansion; " +
    "the only nested loop is the k-row centroid broadcast") {
    val p = plan("q49_semantic_dedup")
    assert(!p.contains("CartesianProduct"))
    // within-cell pairs: bounded collect per cell + explode — NOT a
    // corpus self-join (the pre-round-7 quadratic shape)
    assert(p.contains("bounded_collect_set"), p.take(2000))
    // the only nested-loop joins are the k-row centroid TABLE attaches —
    // the `assigned` subtree appears twice uncached (pair phase + final
    // output), so the SAME broadcast shows up at most twice; any more
    // would mean pair generation regressed to a product
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj >= 1 && nlj <= 2, s"expected the centroid broadcast NLJ " +
      s"(1-2 occurrences), got $nlj:\n" + p.take(2000))
  }

  test("q53: quota sample is a partial top-k aggregate, not a window") {
    val p = plan("q53_quota_sample")
    assert(p.contains("partial_topk_by_score"), p.take(2000))
    assert(!p.contains("Window"),
      "per-stratum quota must not serialize strata through row_number")
  }

  test("q57: as-of join is a single-sort merge, not a range join") {
    val p = plan("q57_asof_join")
    // the whole operator is union + keyed window — no join node at all,
    // so no theta/range pair explosion is even possible
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"))
    assert(!p.contains("SinglePartition"),
      "as-of window must partition by key:\n" + p.take(2000))
  }

  test("q58: range join is a hash equi-join on bins, never nested-loop") {
    val p = plan("q58_range_join")
    assert(!p.contains("NestedLoopJoin"),
      "range predicate fell back to nested-loop:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      p.take(2000))
  }

  test("q121: bucketed join is a shuffle-free SortMergeJoin over " +
    "co-located bucketed scans") {
    val df = SparkEntry.queries("q121_bucketed_join")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("Bucketed: true"),
      "scans must read bucket metadata:\n" + p.take(3000))
    // the ONLY exchange is the tiny post-join groupBy(segment); neither
    // join side shuffles — that is the entire point of the layout
    val exchanges = "(?<!Broadcast)Exchange".r
      .findAllMatchIn(p.replace("ReusedExchange", "")).size
    assert(exchanges <= 2, // partial+final agg exchange markers
      s"join sides must not shuffle ($exchanges exchanges):\n" +
        p.take(3000))
    assert(!p.contains("BroadcastHashJoin"),
      "the merge hint must keep the co-located SMJ:\n" + p.take(3000))
  }

  test("q127: the salted join runs the SMJ on (key, salt) — hot keys " +
    "actually spread") {
    val p = SparkEntry.queries("q127_salted_join")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("__salt"),
      "join keys must include the salt column:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q135: the bucket-key equality filter scans one bucket of 16") {
    val p = SparkEntry.queries("q135_bucket_pruning")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("SelectedBucketsCount: 1 out of 16"),
      "point lookup must prune to one bucket:\n" + p.take(3000))
  }

  test("q136: the day-equality read prunes to one partition directory") {
    val p = SparkEntry.queries("q136_partition_pruning")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters: [isnotnull(day"),
      "day filter must be a partition filter:\n" + p.take(3000))
    // the executed plan's file index reports exactly one matching
    // partition directory for the fixture's day
    assert(!p.contains("PartitionFilters: []"), p.take(3000))
  }

  test("q60: the optimizer rule plans the raw BETWEEN join hash-based") {
    val p = plan("q60_range_join_rewrite")
    assert(!p.contains("NestedLoopJoin"),
      "RangeJoinRewrite did not fire in the gate plan:\n" + p.take(2000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      p.take(2000))
  }

  test("q61: chunking is a pure map-side generate — zero shuffles") {
    val p = plan("q61_chunk_text")
    assert(!p.contains("Exchange"),
      "chunking must not shuffle:\n" + p.take(2000))
    assert(p.contains("Generate"))
  }

  test("q59: interval overlap is a hash equi-join on bins") {
    val p = plan("q59_interval_overlap")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      p.take(2000))
  }

  test("q56: corpus report is one partial-aggregated pass, no window") {
    val p = plan("q56_corpus_report")
    assert(p.contains("partial_count") || p.contains("Partial"), p.take(2000))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("q55: prototypicality is a pure map-side projection") {
    val p = plan("q55_prototypicality")
    assert(!p.contains("Exchange"),
      "centroid scoring must not shuffle:\n" + p.take(2000))
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("q54: repeated-span counting is partial-aggregated, equi-joined") {
    val p = plan("q54_repeated_spans")
    assert(p.contains("partial_count") || p.contains("Partial"), p.take(2000))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(!p.contains("Window"))
  }

  test("q51: mixture application is a broadcast join + map-side fan-out") {
    val p = plan("q51_apply_mixture")
    // the documents side must never shuffle on source: rates are tiny
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "documents shuffled on the rate key:\n" + p.take(2000))
    // the epoch fan-out is a Generate (explode), not a join against a
    // per-epoch table
    assert(p.contains("Generate"), p.take(2000))
  }

  test("q62: line dedup joins the pre-filtered boilerplate set, no " +
      "cartesian") {
    val p = plan("q62_line_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // reassembly buffers are doc-bounded collect_list aggregates
    assert(p.contains("collect_list"), p.take(2000))
  }

  test("q63: heavy hitters run the bounded top-k aggregate, not a global " +
      "sort-limit or window") {
    val p = plan("q63_frequent_ngrams")
    assert(p.contains("partial_topk_by_score"), p.take(2000))
    assert(!p.contains("Window"),
      "a rank window would single-reduce the gram table:\n" + p.take(2000))
    // winners broadcast back onto the stats frame
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q64: global shuffle rank windows are PARTITIONED (two-phase " +
      "prefix count, no single-reducer rank)") {
    val p = plan("q64_global_shuffle")
    assert(p.contains("Window"), p.take(2000))
    // a bare global row_number plans as Exchange SinglePartition before
    // the window — the 100 TB killer this operator exists to avoid
    assert(!p.contains("SinglePartition"), p.take(3000))
  }

  test("q65: z-value stats attach by broadcast; the table itself never " +
      "joins shuffled") {
    val p = plan("q65_zorder_key")
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q66: key-skew profile is a bounded top-k aggregate, not a " +
      "global sort or window") {
    val p = plan("q66_key_skew")
    assert(p.contains("partial_topk_by_score"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("q111: blocklist filter is a broadcast LEFT ANTI — the document " +
      "side never shuffles on the domain key") {
    val p = plan("q111_domain_filter")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "blocklist must broadcast, not shuffle the corpus")
  }

  test("q112: margin mining broadcasts the query sides; the corpus is " +
      "scored map-side, reduced by the bounded top-k aggregate") {
    val p = plan("q112_margin_mining")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("partial_topk_by_score"), p.take(2000))
    assert(!p.contains("Window"),
      "top-k must be the bounded aggregate, never a global window")
  }

  test("q142: triangles close via in-row adjacency intersection — no " +
    "wedge-row join in the plan") {
    val p = SparkEntry.queries("q142_triangle_count")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("array_intersect"),
      "expected the adjacency-intersection form:\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q153: the concurrency sweep windows are partitioned per hour, " +
    "never a single global ordered window") {
    val p = SparkEntry.queries("q153_peak_concurrency")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("Window"), p.take(2000))
    assert(p.contains("hashpartitioning(hour"),
      "running sum must partition by hour:\n" + p.take(3000))
  }

  test("q161: 2-hop reach runs two bounded KMV aggregations — the " +
    "quadratic pair set never materializes") {
    val p = SparkEntry.queries("q161_two_hop_reach")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.sliding("partial_kmin_values".length)
      .count(_ == "partial_kmin_values") >= 2,
      "expected two map-side-combined kmin_values rounds:\n" +
        p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q157: the naive levenshtein join plans as the blocked equi-join " +
    "(optimizer rule), never a nested loop") {
    val p = SparkEntry.queries("q157_edit_join_rewrite")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("NestedLoopJoin"),
      "EditDistanceJoinRewrite did not fire:\n" + p.take(3000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert(p.contains("deletion_variants"),
      "blocking keys must come from the codegen'd kernel:\n" +
        p.take(3000))
  }

  test("q185: RFM quintiles use blocked (metric, bit-length) windows — " +
    "no single-partition rank exchange, no ntile") {
    val p = SparkEntry.queries("q185_rfm_segments")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("ntile"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      "rank must not serialize through one reducer:\n" + p.take(3000))
  }

  test("q193: business-day lag is a pure projection over the natural " +
    "orderkey join — no calendar-dimension join, no window") {
    val p = SparkEntry.queries("q193_business_day_lag")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("Window"), "no window expected:\n" + p.take(3000))
    // exactly the one equi-join (orders x lineitem)
    assert(p.split("Join").length - 1 <= 2, p.take(3000))
  }

  test("q203: burst dedup windows are keyed by (user, type) — never a " +
    "global-order exchange") {
    val p = SparkEntry.queries("q203_burst_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      p.take(3000))
  }

  test("q209: the delete-cascade probes are broadcast joins — the " +
    "lineitem side never shuffles") {
    val p = SparkEntry.queries("q209_delete_audit")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "cascade probe must not shuffle the fact tables:\n" + p.take(3000))
  }

  test("pagerank round: state co-partitioned with edges — exactly ONE " +
    "shuffle per round (the inherent src→dst contribution regroup)") {
    import org.apache.spark.sql.functions._
    // same construction as pageRankFixedPoint: edges partitioned by src,
    // state by node, both checkpointed so the LogicalRDDs carry their
    // outputPartitioning into the next round's plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try {
      val edges = spark.range(500).select((col("id") % 80).as("src"),
          ((col("id") * 13 + 7) % 80).as("dst"))
        .repartition(col("src")).localCheckpoint()
      val state = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg"),
          lit(1000000L).as("rank"), lit(150000L).as("base"))
        .repartition(col("node")).localCheckpoint()
      graft.ops.Graphs.pageRankRound(edges, state)
        .queryExecution.executedPlan.toString()
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(p).size
    assert(exchanges === 1,
      s"expected 1 exchange per pagerank round, got $exchanges:\n" +
        p.take(4000))
  }

  test("q263: the IVF-PQ candidate join carries codes, never vectors — " +
    "the O(codes) index memory claim, pinned in the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val df = SparkEntry.queries("q263_ann_ivfpq")(spark, sfDir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: Join => j }
    val cellJoin = joins.find(_.left.output.exists(_.name == "codes"))
      .getOrElse(fail("no join with a codes-carrying corpus side found"))
    // the corpus (streamed) side of the candidate join must hold ONLY
    // the code table — any float/double array here means the raw
    // embeddings are being shuffled/scanned past the encode projection
    val floaty = cellJoin.left.output.filter(_.dataType match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    })
    assert(floaty.isEmpty,
      s"vector-typed columns cross the candidate join: " +
        s"${floaty.map(a => a.name + ": " + a.dataType.simpleString)}")
    assert(cellJoin.left.output.map(_.name).toSet ===
      Set("corpus_id", "cell", "codes"))
  }
}
