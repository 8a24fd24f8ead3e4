package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class GraphsSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000000000L

  /** Reference single-threaded fixed-point PageRank — the independent
    * model the distributed plan must match bit-for-bit. */
  private def model(edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = (15 * S) / (100 * n)
    var rank = nodes.map(v => v -> S / n).toMap
    for (_ <- 1 to iters) {
      val acc = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(v => v -> (base + 85 * acc.getOrElse(v, 0L) / 100))
        .toMap
    }
    rank
  }

  test("fixed-point pagerank matches the sequential model bit-for-bit") {
    // A 5-node graph with asymmetric degrees: a hub (1) pointed at by
    // everyone, plus a 2<->3 pair and a dangling-ish chain through 4/5.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
    val edges = und ++ und.map(_.swap)
    val got = Graphs.pageRankFixedPoint(spark,
        edges.toDF("src", "dst"), iterations = 3)
      .select("node", "rank").as[(Long, Long)].collect().toMap
    assert(got === model(edges, 3))
    // rank mass stays close to S (integral-div truncation only loses ulps)
    val total = got.values.sum
    assert(total <= S && total > S - 1000 * got.size)
    // the hub outranks every other node
    assert(got(1L) === got.values.max)
  }

  test("pagerank is invariant to edge-list partitioning") {
    val und = (1L to 40L).map(i => (i, i % 7 + 100L))
    val edges = und ++ und.map(_.swap)
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df13 = edges.toDF("src", "dst").repartition(13)
    val a = Graphs.pageRankFixedPoint(spark, df1, 2)
      .select("node", "rank").as[(Long, Long)].collect().toMap
    val b = Graphs.pageRankFixedPoint(spark, df13, 2)
      .select("node", "rank").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("customer-supplier edges are symmetric and distinct") {
    val orders = Seq((1L, 10L), (2L, 11L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((1L, 5L), (1L, 5L), (1L, 6L), (2L, 5L))
      .toDF("l_orderkey", "l_suppkey")
    val e = Graphs.customerSupplierEdges(orders, li)
      .as[(Long, Long)].collect().toSet
    // pairs: (10,5) (10,6) (11,5) -> encoded both directions
    assert(e === Set((20L, 11L), (20L, 13L), (22L, 11L),
      (11L, 20L), (13L, 20L), (11L, 22L)))
  }
}
