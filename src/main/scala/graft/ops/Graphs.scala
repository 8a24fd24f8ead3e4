package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph centrality for corpus curation.
  *
  * Domain/document authority is a standard quality prior in large-scale
  * training-data pipelines (weight pages by the authority of what links
  * to them, not just by their own features). PageRank is the classic
  * instance; the implementation below is the Spark-native shape — an
  * edge-partitioned power iteration where every round is one keyed join +
  * one keyed aggregation, both shuffling on the node key, with lineage
  * truncated per round exactly like the transitive-closure family
  * (closure/TransitiveClosure.scala).
  *
  * Determinism: ranks are FIXED-POINT bigints (scale 10^12), all updates
  * are integral (`div`), so the result is bit-identical regardless of
  * partitioning, reduction order, or engine — floating-point PageRank is
  * famously non-associative and cannot be hash-compared across engines;
  * this one can, and the DuckDB oracle re-runs the identical iteration.
  */
object Graphs {

  /** Fixed-point PageRank over a directed edge list `(src, dst)` (bigint
    * node ids; for an undirected graph pass each edge in both
    * directions).
    *
    * Per iteration: `contrib(e) = rank(src) div deg(src)` flows along
    * each edge, sums per dst, and
    * `rank' = (15·S) div (100·N) + (85·sum) div 100` with S = 10^12.
    * Nodes are the distinct edge sources (an isolated node has no rank
    * mass to give or get). All arithmetic is nonnegative bigint, so
    * Spark's truncating `div` and the oracle's floor division agree.
    *
    * Scale shape: the edge list is the big side and is shuffled ONCE by
    * `src` (persisted reuse each round); each round then shuffles only
    * the O(N) rank frame — join on src, aggregate on dst,
    * `localCheckpoint` to stop the 3-deep lineage from re-running prior
    * rounds. On a cluster the checkpoint goes to reliable storage and
    * both sides pre-partition on the node key. */
  def pageRankFixedPoint(spark: SparkSession, edges: DataFrame,
      iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .repartition(col("src")).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    // One-row N attaches by broadcast; base rank and teleport term are
    // integral divisions evaluated per node row (an empty graph has no
    // node rows, so the n=0 division never evaluates).
    var state = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"), col("deg"),
        expr(s"$scale div n").as("rank"),
        expr(s"(15 * $scale) div (100 * n)").as("base"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = e.join(state, e("src") === state("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("acc"))
      state = state.join(contrib, state("node") === contrib("dst"), "left")
        .select(col("node"), col("deg"), col("base"),
          (col("base") +
            expr("(85 * coalesce(acc, CAST(0 AS BIGINT))) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
    e.unpersist()
    state
  }

  /** The customer–supplier interaction graph: an undirected bipartite
    * edge per distinct (o_custkey, l_suppkey) trading pair, encoded
    * customers = 2k, suppliers = 2k+1. */
  def customerSupplierEdges(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    pairs.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
      .unionAll(pairs.select((col("s") * 2 + 1).as("src"),
        (col("c") * 2).as("dst")))
  }
}
