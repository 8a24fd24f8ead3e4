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

  test("triangle census: K4 and a hub with one closed wedge") {
    // K4: 6 edges, every node deg 3 -> 12 wedges, 4 triangles
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toDF("src", "dst")
    val r1 = Graphs.triangleStats(k4)
      .as[(Long, Long, Long, Long)].head()
    assert(r1 === ((4L, 6L, 12L, 4L)))
    // star hub 0 with leaves 1..5 plus the single closing edge (1,2):
    // 6 edges, hub deg 5 + two deg-2 nodes -> 10+1+1 = 12 wedges,
    // exactly 1 triangle (0,1,2)
    val star = ((1L to 5L).map(v => (0L, v)) :+ (1L, 2L))
      .toDF("src", "dst")
    val r2 = Graphs.triangleStats(star)
      .as[(Long, Long, Long, Long)].head()
    assert(r2 === ((6L, 6L, 12L, 1L)))
  }

  test("degreeAssortativity: star is exactly -1, regular graph null") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r1 = Graphs.degreeAssortativity(star)
      .as[(Long, Long, Option[Double])].head()
    assert(r1 === ((3L, 6L, Some(-1.0))))
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val r2 = Graphs.degreeAssortativity(triangle)
      .as[(Long, Long, Option[Double])].head()
    assert(r2 === ((3L, 6L, None)))
  }

  test("twoHopReach: exact below k; chain and star reaches") {
    // path 1-2-3-4-5: closed 2-hop reach = 3 (ends), 4 (next-to-end),
    // 5 (middle); star 10-{11,12,13}: hub 4, leaves 4
    val e = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)) ++
      Seq((10L, 11L), (10L, 12L), (10L, 13L))).toDF("src", "dst")
    val got = Graphs.twoHopReach(e, k = 32)
      .select("node", "reach2_est").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 4L, 3L -> 5L, 4L -> 4L,
      5L -> 3L, 10L -> 4L, 11L -> 4L, 12L -> 4L, 13L -> 4L))
  }

  test("dagDepth: longest path wins on a diamond; cycle throws") {
    // diamond 1->2->4, 1->3, 3->5->4: depth(4) = 3 via the long arm
    val e = Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 5L), (5L, 4L))
      .toDF("parent", "child")
    val got = Graphs.dagDepth(spark, e)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 5L -> 2L,
      4L -> 3L))
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("parent", "child")
    intercept[IllegalStateException] {
      Graphs.dagDepth(spark, cyc, maxIterations = 8)
    }
  }

  test("itemItemTopK: neighbor ranks by count desc then id asc, " +
      "bounded at k") {
    // node 1 co-occurs: with 2 three times, with 3 twice, with 4 twice,
    // with 5 once -> top-3 = [2(n=3), 3(n=2), 4(n=2)]
    val edges = (Seq.fill(3)((1L, 2L)) ++ Seq.fill(2)((1L, 3L)) ++
      Seq.fill(2)((4L, 1L)) ++ Seq((5L, 1L)) ++ Seq((2L, 3L)))
      .toDF("src", "dst")
    val got = Graphs.itemItemTopK(edges, k = 3)
      .where(col("part") === 1L)
      .orderBy("rank")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1, 2L, 3L), (1L, 2, 3L, 2L),
      (1L, 3, 4L, 2L)))
  }

  test("triangle census is invariant to direction, duplicates, " +
      "self-loops, and partitioning") {
    val canon = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val messy = (canon ++ canon.map(_.swap) ++ canon ++
      Seq((2L, 2L), (4L, 4L)))
    val a = Graphs.triangleStats(canon.toDF("src", "dst").repartition(1))
      .as[(Long, Long, Long, Long)].head()
    val b = Graphs.triangleStats(messy.toDF("src", "dst").repartition(7))
      .as[(Long, Long, Long, Long)].head()
    assert(a === b)
    // degrees 2,2,3,1 -> wedges 1+1+3+0 = 5; one triangle (1,2,3)
    assert(a === ((4L, 4L, 5L, 1L)))
  }

  test("subtreeRollup: hand-computed totals on a 3-level tree; " +
    "multi-row nodes aggregate before expansion") {
    import spark.implicits._
    //        1(10)
    //       /    \
    //     2(20)  3(30+5: two rows)
    //     /
    //   4(40)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("parent", "child")
    val values = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (3L, 5.0),
      (4L, 40.0)).toDF("node", "bal")
    val out = Graphs.subtreeRollup(spark, edges, values, "node", "bal")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map(
      1L -> (5L, 105.0), 2L -> (2L, 60.0), 3L -> (2L, 35.0),
      4L -> (1L, 40.0)))
  }

  /** Sequential personalized-PageRank model: teleport mass confined to
    * the seed set, otherwise identical integral rounds. */
  private def pprModel(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keys.toSeq.sorted
    val nS = seeds.size.toLong
    val seedSet = seeds.toSet
    var rank = nodes.map(v =>
      v -> (if (seedSet(v)) S / nS else 0L)).toMap
    val base = nodes.map(v =>
      v -> (if (seedSet(v)) (15 * S) / (100 * nS) else 0L)).toMap
    for (_ <- 1 to iters) {
      val acc = edges.groupBy(_._2).view.mapValues(
        _.map { case (sr, _) => rank(sr) / deg(sr) }.sum).toMap
      rank = nodes.map(v =>
        v -> (base(v) + 85 * acc.getOrElse(v, 0L) / 100)).toMap
    }
    rank
  }

  test("personalized pagerank matches the sequential model; mass " +
      "concentrates near the seed; far node gets none in few rounds") {
    // chain 1-2-3-4-5 (undirected) with seed {1}: after 2 rounds node 5
    // is still unreachable from the seed's mass
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = und ++ und.map(_.swap)
    val got = Graphs.personalizedPageRank(spark,
        edges.toDF("src", "dst"), seeds = Seq(1L), iterations = 2)
      .select("node", "rank").as[(Long, Long)].collect().toMap
    assert(got === pprModel(edges, Seq(1L), 2))
    // 2 rounds reach at most distance 2 from the seed: nodes 4 and 5
    // hold zero mass; total mass never exceeds what the seed teleports
    assert(got(4L) === 0L && got(5L) === 0L)
    assert(got.values.forall(_ >= 0L))
    // a seed with no out-edges drops its mass but doesn't crash
    val got2 = Graphs.personalizedPageRank(spark,
        edges.toDF("src", "dst"), seeds = Seq(1L, 99L), iterations = 1)
      .select("node", "rank").as[(Long, Long)].collect().toMap
    assert(got2 === pprModel(edges, Seq(1L, 99L), 1)
      .filter { case (k, _) => k != 99L })
  }

  test("kCore: triangle survives the 2-core, pendant chain peeled; " +
    "star cascade needs a second round; 1-core keeps the path") {
    import spark.implicits._
    def sym(e: Seq[(Long, Long)]) = (e ++ e.map(_.swap)).toDF("src", "dst")
    // triangle 1-2-3 plus chain 3-4-5 hanging off it
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val core2 = Graphs.kCore(spark, g, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // star: hub 0 with 5 leaves — hub has degree 5 >= 2, but leaves die
    // in round 1 and the hub must die in round 2 (cascade correctness)
    val star = sym((1L to 5L).map(i => (0L, i)))
    assert(Graphs.kCore(spark, star, k = 2).count() === 0L)
    // 1-core of a path keeps every node at its original degree
    val path = sym(Seq((1L, 2L), (2L, 3L)))
    val core1 = Graphs.kCore(spark, path, k = 1)
      .as[(Long, Long)].collect().toMap
    assert(core1 === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("kCore oracle unroll-depth guard: the q243 fixture converges " +
    "before the oracle's 7 fixed peel levels (level 6 == level 5)") {
    // q243's DuckDB oracle unrolls peeling to exactly 7 levels while the
    // engine iterates to true fixpoint. If a fixture ever needs MORE than
    // 7 peel rounds, the two desync even though both are "correct". This
    // guard peels the real fixture graph a fixed number of levels and
    // asserts the survivor set is already stable one level before the
    // oracle's unroll depth — so a deeper-peeling fixture fails HERE,
    // loudly, instead of surfacing as an inscrutable hash mismatch.
    val edges = Graphs.customerSupplierEdges(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
    def peel(levels: Int): Set[Long] = {
      var surv = edges.groupBy(col("src"))
        .agg(count(lit(1)).as("deg")).where(col("deg") >= 40)
        .select(col("src").as("node"))
      for (_ <- 1 to levels) {
        surv = edges
          .join(surv.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(surv.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .where(col("deg") >= 40)
          .select(col("src").as("node"))
          .localCheckpoint()
      }
      surv.as[Long].collect().toSet
    }
    val l5 = peel(5)
    val l6 = peel(6)
    assert(l6 === l5,
      "q243 fixture needs more than the oracle's 7 unrolled peel " +
        "levels — deepen the oracle SQL's sN chain to match")
    // and the engine's fixpoint agrees with the stable unrolled set
    val fix = Graphs.kCore(spark, edges, k = 40)
      .select("node").as[Long].collect().toSet
    assert(fix === l6)
  }

  test("negativeSamples: no true edges or self-loops, at most k per " +
    "source, drawn from the destination universe, reproducible") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L),
      (10L, 1L)).toDF("src", "dst")
    val got = Graphs.negativeSamples(edges, k = 4)
      .as[(Long, Long, Long)].collect()
    val trueEdges = Set((1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L),
      (10L, 1L))
    val universe = Set(10L, 11L, 12L, 1L)
    got.foreach { case (s, _, d) =>
      assert(!trueEdges.contains((s, d)), s"true edge sampled: $s->$d")
      assert(s !== d)
      assert(universe.contains(d), s"$d not in the dst universe")
    }
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.length <= 4, s"src $s got ${rows.length} > k")
      assert(rows.map(_._2).distinct.length === rows.length)
    }
    // deterministic: a second run is bit-identical
    val again = Graphs.negativeSamples(edges, k = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // empty edges -> empty result, no division by zero
    assert(Graphs.negativeSamples(
      Seq.empty[(Long, Long)].toDF("src", "dst"), k = 3).count() === 0L)
  }

  test("kCore: empty edge list and k above the max degree return " +
    "empty cores without looping") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(Graphs.kCore(spark, g, k = 5).count() === 0L)
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.kCore(spark, empty, k = 1).count() === 0L)
  }
}
