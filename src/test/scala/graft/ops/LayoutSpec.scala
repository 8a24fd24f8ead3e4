package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSuite {

  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; i <- xs.indices)
      z |= ((xs(i) >> b) & 1L) << (b * xs.size + i)
    z
  }

  test("interleaveBits matches the reference morton code") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val out = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.interleaveBits(Seq(col("a"), col("b"), col("c")), 8)
          .as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(3) ===
        mortonRef(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 8))
    }
  }

  test("quantize maps range endpoints to grid endpoints, degenerate to 0") {
    import spark.implicits._
    val out = Seq((0L, 0L, 100L), (100L, 0L, 100L), (50L, 0L, 100L),
      (7L, 7L, 7L))
      .toDF("x", "lo", "hi")
      .select(Layout.quantize(col("x"), col("lo"), col("hi"), 8).as("q"))
      .collect().map(_.getLong(0))
    assert(out === Array(0L, 255L, 127L, 0L))
  }

  test("zorder layout bounds per-partition spans on BOTH dimensions") {
    import spark.implicits._
    // deterministic 64x64 grid
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    def avgSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .select(col("x"), col("y"), spark_partition_id().as("p"))
        .groupBy(col("p"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .agg(avg(col("sx")), avg(col("sy"))).head()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zx, zy) = avgSpans(
      Layout.zorderBy(grid, Seq("x", "y"), bits = 6,
        partitions = Some(16)).drop("zval"))
    val (sx, sy) = avgSpans(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    // x-sort gives perfect x locality but NO y locality; z-order bounds
    // both: each of 16 partitions covers ~1/16 of z-space = a box of
    // ~1/4 x-range x 1/4 y-range
    assert(sy > 55.0, s"x-sorted layout should have no y locality: $sy")
    assert(zx < 32.0 && zy < 32.0,
      s"z-order should bound both spans, got x=$zx y=$zy")
    assert(zy < sy / 2, s"z-order y span $zy vs x-sort y span $sy")
  }

  test("compactionGroups: cumulative target-sized windows") {
    import spark.implicits._
    // cumulative starts 0,60,90,340,380 at target 100 → groups 0,0,0,3,3:
    // the 250-byte file overfills group 0, the next file opens group 3
    val files = Seq((1L, 60L), (2L, 30L), (3L, 250L), (4L, 40L), (5L, 80L))
      .toDF("fid", "sz")
    val out = Layout.compactionGroups(files, "fid", col("sz"), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // cumulative starts: 0, 60, 90, 340, 380
    assert(out === Array((1L, 60L, 0L), (2L, 30L, 0L), (3L, 250L, 0L),
      (4L, 40L, 3L), (5L, 80L, 3L)))
    // groups are contiguous in id order and non-decreasing
    assert(out.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("compactionGroups rejects non-numeric id columns loudly") {
    import spark.implicits._
    val files = Seq(("a/part-0.parquet", 10L)).toDF("path", "sz")
    val e = intercept[IllegalArgumentException] {
      Layout.compactionGroups(files, "path", col("sz"), 100L)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("withZValue: stats attach by broadcast, zval agrees with explicit " +
      "quantization") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1000L), (2L, 20L, 2000L), (3L, 30L, 3000L))
      .toDF("id", "a", "b")
    val out = Layout.withZValue(df, Seq("a", "b"), bits = 8)
      .select("id", "zval").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a,b ranges [10,30] / [1000,3000]: quantized 0/127/255 each
    assert(out(1L) === mortonRef(Seq(0L, 0L), 8))
    assert(out(2L) === mortonRef(Seq(127L, 127L), 8))
    assert(out(3L) === mortonRef(Seq(255L, 255L), 8))
    val plan = Layout.withZValue(df, Seq("a", "b"), bits = 8)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1500))
  }

  test("withHilbertValue: bijection onto 0..4^bits-1 and the Hilbert " +
    "continuity invariant (consecutive keys are grid-adjacent)") {
    import spark.implicits._
    val n = 16 // bits = 4 -> 16x16 grid, 256 cells
    val cells = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong,
      y.toLong)).toDF("hx", "hy")
    val got = Layout.withHilbertValue(cells, "hx", "hy", bits = 4)
      .select("hval", "hx", "hy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // bijection: every key 0..255 exactly once
    assert(got.map(_._1).toSeq === (0L until 256L))
    // continuity: the curve never jumps — Manhattan distance 1 between
    // consecutive keys (this is what Z-order lacks and the whole point
    // of the operator)
    got.sliding(2).foreach { case Array((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump before d=$d2")
    }
    // first corner pins of the classic orientation
    assert(got(0)._2 === ((0L, 0L)))
    assert(got(255)._2 === ((15L, 0L)))
  }

  test("zoneMapReport: aligned layout prunes disjoint buckets, shuffled " +
    "layout prunes nothing, counts and efficiency exact") {
    import spark.implicits._
    // values 0..99; aligned layout: bucket = v div 10 (zones [0,9],
    // [10,19], ...); scrambled layout: bucket = v % 10 (every zone
    // spans ~[b, 90+b] -> nothing prunable)
    val df = (0L to 99L).map(v => (v, v)).toDF("v", "x")
    val preds = Seq(("mid", 30L, 39L), ("none", 200L, 300L))
    val aligned = Layout.zoneMapReport(df, "aligned",
      expr("v div 10"), col("v"), preds)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // "mid" prunes 9 of 10 buckets, skips 90 rows, matches 10,
    // efficiency = 10/10 = 1e6 ppm
    assert(aligned("mid") === ((10L, 9L, 90L, 10L, 1000000L)))
    // "none": zones all disjoint from [200,300] -> everything pruned,
    // 0 matches; efficiency 0 over the greatest(1,...) guard
    assert(aligned("none") === ((10L, 10L, 100L, 0L, 0L)))
    val scrambled = Layout.zoneMapReport(df, "scrambled",
      expr("v % 10"), col("v"), preds)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // every bucket's zone covers [b, 90+b] -> "mid" prunes nothing,
    // scans all 100 rows for 10 matches
    assert(scrambled("mid") === ((10L, 0L, 0L, 10L, 100000L)))
  }

  test("rleRunsReport: runs merge across a block GAP, a same-value " +
    "boundary does not split, null runs count, distinct floor exact") {
    import spark.implicits._
    // order o=1,2,3 (block 0), o=7,8 (block 2; block 1 EMPTY):
    // col a: a a b | b c  -> runs a, b (spans the gap), c = 3
    // col x: x null null | null x -> runs x, null(spans), x = 3
    val df = Seq(
      (1L, "a", Some("x")), (2L, "a", None), (3L, "b", None),
      (7L, "b", None), (8L, "c", Some("x")))
      .toDF("o", "va", "vx")
    val got = Layout.rleRunsReport(df, expr("o div 3"), col("o"),
        col("o"), Seq("va" -> col("va"), "vx" -> col("vx")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("va") === ((5L, 3L, 3L, 600000L)))
    assert(got("vx") === ((5L, 3L, 1L, 600000L)))
    // fully sorted single column: runs == distinct
    val sorted = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("o", "v")
    val g2 = Layout.rleRunsReport(sorted, expr("o div 2"), col("o"),
      col("o"), Seq("v" -> col("v"))).head()
    assert(g2.getLong(2) === 2L && g2.getLong(3) === 2L)
  }
}
