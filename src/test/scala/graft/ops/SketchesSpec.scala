package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("kmv sketch is exact below k and estimates above k") {
    // group "small": 10 distinct values (< k) -> exact count.
    // group "big": 5000 distinct values (>> k) -> estimate within the
    // ~1/sqrt(k-2) relative-error envelope (k=64 -> sigma ~12.7%; 4 sigma
    // is a deterministic bound here since the hash is fixed).
    val small = (1 to 10).map(i => ("small", s"tok$i"))
    val big = (1 to 5000).map(i => ("big", s"word$i"))
    val df = (small ++ big ++ small ++ big) // duplicates must not matter
      .toDF("source", "tok")
      .groupBy("source").agg(collect_list("tok").as("toks"))
    val out = Sketches.kmvDistinct(df, "source", col("toks"), k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(4))).toMap

    val (nSmallVals, nSmallSketch, nSmallEst) = out("small")
    assert(nSmallVals === 20L) // 2 copies of 10 tokens
    assert(nSmallSketch === 10)
    assert(nSmallEst === 10L) // exact below k

    val (nBigVals, nBigSketch, nBigEst) = out("big")
    assert(nBigVals === 10000L)
    assert(nBigSketch === 64)
    assert(math.abs(nBigEst - 5000.0) / 5000.0 < 0.5,
      s"estimate $nBigEst too far from 5000")
  }

  test("kmv sketch merge equals single-pass sketch (mergeability)") {
    // The same values split into two halves, sketched per half with the
    // aggregate, then re-aggregated: identical to one global sketch.
    // This is THE property that lets per-partition/per-day sketches be
    // persisted and unioned without rescanning.
    val vals = (1 to 2000).map(i => s"v$i")
    val whole = Seq(("g", vals)).toDF("g", "toks")
    val halves = Seq(("g", vals.take(1000)), ("g", vals.drop(1000)))
      .toDF("g", "toks")
    val a = Sketches.kmvDistinct(whole, "g", col("toks"), k = 32)
      .select("kth_min", "est_distinct").head()
    val b = Sketches.kmvDistinct(halves, "g", col("toks"), k = 32)
      .select("kth_min", "est_distinct").head()
    assert(a === b)
  }

  test("exactQuantiles: order statistics match a sorted array at every " +
    "fraction; invariant to partitioning") {
    import spark.implicits._
    val vals = (1 to 997).map(i => (i * 7919) % 1000)
    val df = vals.toDF("v")
    val ps = Seq((1, 100), (1, 4), (1, 2), (3, 4), (99, 100), (1, 1))
    val out = Sketches.exactQuantiles(df, "v", ps)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val sorted = vals.sorted
    ps.foreach { case (num, den) =>
      val rk = ((num.toLong * 997 + den - 1) / den - 1).toInt
      assert(out((num, den)) === ((rk.toLong, sorted(rk).toLong)),
        s"fraction $num/$den")
    }
    val wide = Sketches.exactQuantiles(df.repartition(13), "v", ps)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(wide === out)
  }

  test("kmv rollup: merged level sketches equal direct sketches") {
    // 3 days x 2 types, values overlapping across cells so the rollup
    // actually merges (distinct-of-union != sum of cell distincts).
    val rows = for {
      d <- 1 to 3; t <- Seq("a", "b"); i <- 1 to 400
    } yield (s"d$d", t, s"v${(d * 137 + i) % 700}")
    val df = rows.toDF("day", "typ", "v")
    val rolled = Sketches.kmvRollup(df, "day", "typ", col("v"), k = 16)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getInt(4), r.getLong(5), r.getLong(6))).toMap
    assert(rolled.size === 3 * 2 + 3 + 2 + 1)
    // Direct sketch of the whole data == the 'total' merged row.
    val direct = Sketches.kmvDistinct(
      df.select(lit("g").as("g"), array(col("v")).as("vs")),
      "g", col("vs"), k = 16).head()
    val total = rolled(("total", null, null))
    assert(total === ((direct.getLong(1), direct.getInt(2),
      direct.getLong(3), direct.getLong(4))))
    // Direct sketch of one day == that day's merged row.
    val d1direct = Sketches.kmvDistinct(
      df.where(col("day") === "d1")
        .select(lit("g").as("g"), array(col("v")).as("vs")),
      "g", col("vs"), k = 16).head()
    val d1 = rolled(("day", "d1", null))
    assert(d1 === ((d1direct.getLong(1), d1direct.getInt(2),
      d1direct.getLong(3), d1direct.getLong(4))))
  }

  test("kmv overlap estimates a planted Jaccard and is exact below k") {
    // Big case: A = 1..1200, B = 601..1800 -> |A∩B| = 600, |A∪B| = 1800,
    // J = 1/3. k = 64 -> sigma(J) ~ sqrt(J(1-J)/k) ~ 6%; assert a loose
    // deterministic envelope (the hash is fixed, so this cannot flake).
    import spark.implicits._
    val a = (1 to 1200).map(i => ("A", s"t$i"))
    val b = (601 to 1800).map(i => ("B", s"t$i"))
    val big = (a ++ b).toDF("source", "tok")
      .groupBy("source").agg(collect_list("tok").as("toks"))
    val r = Sketches.kmvOverlap(big, "source", col("toks"), 64).head()
    assert(r.getString(0) === "A" && r.getString(1) === "B")
    val (unionEst, interEst, jEst) =
      (r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(math.abs(unionEst - 1800.0) / 1800.0 < 0.4, s"union $unionEst")
    assert(math.abs(jEst - 1.0 / 3) < 0.25, s"jaccard $jEst")
    assert(interEst > 0 && interEst < 1800)

    // Small case (both groups < k): everything exact
    val sa = (1 to 20).map(i => ("A", s"s$i"))
    val sb = (11 to 25).map(i => ("B", s"s$i"))
    val small = (sa ++ sb).toDF("source", "tok")
      .groupBy("source").agg(collect_list("tok").as("toks"))
    val s = Sketches.kmvOverlap(small, "source", col("toks"), 64).head()
    assert(s.getLong(3) === 25L)       // exact union
    assert(s.getLong(4) === 10L)       // exact intersection (11..20)
    assert(s.getDouble(5) === 10.0 / 25)
  }

  test("columnStats reports counts, bounds and exact small ndv") {
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, Some("y")), (3L, None),
      (10L, Some("x"))).toDF("k", "s")
    val out = Profiling.columnStats(df, Seq("k", "s"), k = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    val kRow = out("k")
    assert(kRow.getLong(1) === 4L && kRow.getLong(2) === 0L) // rows/nulls
    // lexicographic bounds: "1" < "10" < "2" < "3"
    assert(kRow.getString(3) === "1" && kRow.getString(4) === "3")
    assert(kRow.getLong(5) === 1L && kRow.getLong(6) === 10L) // numeric
    assert(kRow.getLong(7) === 4L) // exact ndv below k
    val sRow = out("s")
    assert(sRow.getLong(2) === 1L) // one null
    assert(sRow.isNullAt(5) && sRow.isNullAt(6)) // no numeric bounds
    assert(sRow.getLong(7) === 2L) // x, y
  }

  test("kAnonymityAudit flags only under-k quasi-identifier groups") {
    import spark.implicits._
    val df = (1 to 10).map(u => ("big", u.toLong)) ++
      Seq(("tiny", 1L), ("tiny", 1L), ("tiny", 2L))
    val out = Profiling.kAnonymityAudit(df.toDF("grp", "uid"),
      Seq(col("grp")), "uid", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("tiny", 2L, 3L))) // 2 users < 5, 3 rows
  }

  test("vocabCoverage ranks by frequency and accumulates to 1.0") {
    import spark.implicits._
    // "a" x4, "b" x2, "c" x1, "d" x1 (d ties c, token asc tie-break)
    val df = Seq("a a b c", "a a b d").toDF("text")
    val out = TextAnalysis.vocabCoverage(df, "text", v = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, "a", 4L, 0.5), (2, "b", 2L, 0.75),
      (3, "c", 1L, 0.875), (4, "d", 1L, 1.0)))
  }

  test("mostCommonValues ranks per column with exact shares") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1))
      .toDF("s", "i")
    val out = Profiling.mostCommonValues(df, Seq("s", "i"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("s", 1)) === ("a", 3L, 0.75))
    assert(out(("s", 2)) === ("b", 1L, 0.25))
    assert(out(("i", 1)) === ("1", 3L, 0.75))
    assert(out(("i", 2)) === ("2", 1L, 0.25))
  }

  test("orphanAudit counts orphans and null fks, once each") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = Profiling.orphanAudit(fact, "fk", dim, "pk", "t").head()
    assert(r.getString(0) === "t")
    assert(r.getLong(1) === 4L) // rows
    assert(r.getLong(2) === 1L) // 99 is orphan; NULL fk is NOT
    assert(r.getLong(3) === 1L) // one null fk
  }

  test("completenessGaps finds exactly the silent hours") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // type x active on one day at hours 0 and 2 -> hour 1 (and 3..23)
    // missing; type y active at hour 5 only
    val ev = (Seq(ts("2024-01-01 00:10:00"), ts("2024-01-01 02:10:00"))
      .map(t => (t, "x")) :+ ((ts("2024-01-01 05:00:00"), "y")))
      .toDF("ts", "event_type")
    val gaps = Sessions.completenessGaps(ev, "ts", "event_type")
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(!gaps.contains(("x", 0)) && !gaps.contains(("x", 2)))
    assert(gaps.contains(("x", 1)) && gaps.contains(("x", 23)))
    assert(!gaps.contains(("y", 5)) && gaps.contains(("y", 0)))
    assert(gaps.size === (24 - 2) + (24 - 1))
  }

  test("equiDepthHistogram buckets tile ranks with exact counts") {
    import spark.implicits._
    // 16 distinct values, one row each -> 4 buckets of exactly 4
    val even = (1 to 16).map(v => ("e", v)).toDF("source", "n_chars")
    val h1 = Profiling.equiDepthHistogram(even, "source", "n_chars", 4)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(h1.toSeq === Seq((0, 1.0, 4.0, 4L), (1, 5.0, 8.0, 4L),
      (2, 9.0, 12.0, 4L), (3, 13.0, 16.0, 4L)))
    // a value with heavy duplicate mass stays in ONE bucket
    val skew = ((1 to 10).map(_ => ("s", 5)) ++ Seq(("s", 1), ("s", 9)))
      .toDF("source", "n_chars")
    val h2 = Profiling.equiDepthHistogram(skew, "source", "n_chars", 4)
      .collect().map(r => (r.getInt(1), r.getLong(4))).toMap
    assert(h2.values.sum === 12L)
    assert(h2(0) === 11L) // 1 and all ten 5s (first rank of 5 is rank 1)
  }

  test("kmv estimate matches the relational reconstruction bit-for-bit") {
    // In-engine differential for the oracle formula: k-th smallest
    // DISTINCT portable hash via a window, floor((k-1)*2^60/kth) — the
    // exact computation the DuckDB oracle runs.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 64
    val sketch = Sketches.kmvDistinct(docs, "source",
      Dedup.tokens(col("text")), k)
    val hashed = docs.select(col("source"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .select(col("source"),
        conv(substring(md5(col("tok").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val relational = hashed
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("h")))
      .where(col("rk") <= k)
      .groupBy("source")
      .agg(count(lit(1)).cast("int").as("n_sketch"),
        max("h").as("kth_min"))
      .select(col("source"), col("n_sketch"), col("kth_min"),
        when(col("n_sketch") < k, col("n_sketch").cast("long"))
          .otherwise(floor(lit((k - 1).toDouble * math.scalb(1.0, 60)) /
            col("kth_min").cast("double")).cast("long"))
          .as("est_distinct"))
    val l = sketch.select("source", "n_sketch", "kth_min", "est_distinct")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val r = relational.collect().map(r => r.getString(0) -> r.toSeq.tail)
      .toMap
    assert(l === r)
  }

  test("heavy hitters equal the brute-force threshold answer under " +
      "skew, many partitions, and adversarial ordering") {
    // heavy values at three magnitudes + a long tail of singletons, so
    // k=2 keeps only "a", k=5 adds "b", k=40 adds "warm"
    val rows = scala.util.Random.shuffle(
      Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ Seq.fill(60)("warm") ++
        (1 to 200).map(i => s"tail$i"))
    for (parts <- Seq(1, 7, 16)) {
      val df = rows.toDF("v").repartition(parts)
      for (k <- Seq(2, 5, 40)) {
        val got = Sketches.heavyHitters(df, col("v"), k)
          .select("value", "cnt").as[(String, Long)].collect().toSet
        val n = rows.size
        val want = rows.groupBy(identity).view.mapValues(_.size.toLong)
          .filter { case (_, c) => c * k > n }
          .map { case (v, c) => (v, c) }.toSet
        assert(got === want, s"parts=$parts k=$k")
      }
    }
  }

  test("sampledQuantiles: k >= group size degrades to exact order " +
      "statistics, invariant to partitioning") {
    // group "a": values 1..10 (ids shuffled); k=64 > 10 -> sample is
    // the whole group, p50 = ceil(0.5*10)=5th order stat = 5
    val rows = ((1 to 10).map(i => ("a", i.toLong, i.toLong * 10)) ++
      (1 to 3).map(i => ("b", 100L + i, i.toLong))).toDF("g", "id", "v")
    for (parts <- Seq(1, 8)) {
      val out = Sketches.sampledQuantiles(rows.repartition(parts), "g",
        "id", "v", k = 64, ps = Seq((1, 4), (1, 2), (9, 10)))
        .orderBy("g")
        .as[(String, Long, Int, Long, Long, Long)].collect().toSeq
      // a: ceil(10/4)=3rd=30, ceil(10/2)=5th=50, ceil(9)=9th=90
      // b: ceil(3/4)=1st=1, ceil(3/2)=2nd=2, ceil(27/10)=3rd=3
      assert(out === Seq(("a", 10L, 10, 30L, 50L, 90L),
        ("b", 3L, 3, 1L, 2L, 3L)), s"parts=$parts")
    }
  }

  test("heavy hitters: empty input and nothing-qualifies cases") {
    val empty = Seq.empty[String].toDF("v")
    assert(Sketches.heavyHitters(empty, col("v"), 10).count() === 0)
    // uniform 50 distinct values each twice: cnt*k = 2*10 = 20 < N=100
    // -> nothing crosses the strict threshold
    val uniform = (1 to 100).map(i => s"u${i % 50}").toDF("v")
    assert(Sketches.heavyHitters(uniform, col("v"), 10).count() === 0)
  }

  test("weightedQuantiles: cumulative-weight rank containment equals " +
    "the expanded-row reference, zero weights dropped") {
    import spark.implicits._
    // values with weights: expanding (v,w) to w copies of v, the
    // weighted p-quantile is the plain order statistic of the copies
    val df = Seq((10L, 3L), (20L, 1L), (30L, 6L), (40L, 0L))
      .toDF("v", "wt")
    val ps = Seq((1, 4), (1, 2), (3, 4), (1, 1))
    val got = Sketches.weightedQuantiles(df, "v", "wt", ps)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val expanded = Seq.fill(3)(10L) ++ Seq(20L) ++ Seq.fill(6)(30L)
    for ((num, den) <- ps) {
      val rk = (num.toLong * expanded.size + den - 1) / den
      assert(got((num, den)) ===
        ((rk, expanded.sorted.apply(rk.toInt - 1), 10L)),
        s"$num/$den")
    }
  }

  test("exactQuantilesByGroup: per-group order statistics equal the " +
    "sorted-array reference, groups independent, ties exact") {
    import spark.implicits._
    // group a: 1..101 (odd n); group b: heavy ties; group c: one row
    val a = (1 to 101).map(v => ("a", v.toLong))
    val b = (1 to 90).map(v => ("b", (v % 3).toLong * 10))
    val c = Seq(("c", 42L))
    val df = (a ++ b ++ c).toDF("g", "v")
    val ps = Seq((1, 4), (1, 2), (99, 100))
    val got = Sketches.exactQuantilesByGroup(df, "g", "v", ps)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    def ref(vs: Seq[Long], num: Int, den: Int): (Long, Long, Long) = {
      val s = vs.sorted; val n = s.size.toLong
      val rk = (num * n + den - 1) / den - 1
      (rk, s(rk.toInt), n)
    }
    for ((g, vs) <- Seq("a" -> a.map(_._2), "b" -> b.map(_._2),
        "c" -> c.map(_._2)); (num, den) <- ps) {
      assert(got((g, num, den)) === ref(vs, num, den), s"$g $num/$den")
    }
    assert(got.size === 9)
  }

  test("hllDistinct: estimate within the m=64 error envelope, exact " +
    "companion column, duplicate- and partition-invariant registers") {
    import spark.implicits._
    val vals = (1 to 4000).map(i => ("big", s"user$i"))
    val df = vals.toDF("g", "v")
    val row = Sketches.hllDistinct(df, "g", col("v"))
      .select("n_used", "s_total", "hll_est", "n_exact").head()
    assert(row.getLong(3) === 4000L)
    // raw-HLL sigma ~ 1.04/sqrt(64) = 13%; fixed hash => deterministic,
    // allow 3 sigma
    assert(math.abs(row.getDouble(2) - 4000.0) / 4000.0 < 0.39,
      s"estimate ${row.getDouble(2)} too far from 4000")
    assert(row.getLong(0) === 64L) // all registers touched at 4000 keys

    // registers are max-based: duplicating the input and shuffling its
    // partitioning must not move a single register (the mergeability
    // property that lets per-day sketches union without rescanning)
    val doubled = Sketches.hllDistinct(
      df.union(df).repartition(7), "g", col("v"))
      .select("n_used", "s_total", "hll_est").head()
    assert(doubled.getLong(0) === row.getLong(0))
    assert(doubled.getLong(1) === row.getLong(1))
    assert(doubled.getDouble(2) === row.getDouble(2))
  }

  test("hllDistinct: groups are independent; rho handles the all-zero " +
    "remainder (r=0 => rho=55) without overflow") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("a", s"x$i")) ++ Seq(("b", "only")))
      .toDF("g", "v")
    val out = Sketches.hllDistinct(df, "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out === Map("a" -> 100L, "b" -> 1L))
    // s_total always in (0, 64*2^55]
    Sketches.hllDistinct(df, "g", col("v")).select("s_total").collect()
      .foreach { r =>
        assert(r.getLong(0) > 0L && r.getLong(0) <= 64L * (1L << 55))
      }
  }

  test("hll register merge: disjoint AND overlapping snapshot sketches " +
    "max-merge to bit-identical registers vs one pass over the union") {
    import spark.implicits._
    def shaped(vals: Seq[String]) =
      vals.map(("g", _)).toDF("g", "v")
    val a = (1 to 800).map(i => s"u$i")
    val b = (500 to 1500).map(i => s"u$i") // overlaps a on 500..800
    val whole = Sketches.hllEstimate(
      Sketches.hllRegisters(shaped((a ++ b).distinct)))
      .select("n_used", "s_total").head()
    val merged = Sketches.hllEstimate(Sketches.hllMergeRegisters(
      Sketches.hllRegisters(shaped(a)),
      Sketches.hllRegisters(shaped(b))))
      .select("n_used", "s_total").head()
    assert(merged === whole)
    // idempotence: re-merging the merged table with one input is a no-op
    val remerged = Sketches.hllEstimate(Sketches.hllMergeRegisters(
      Sketches.hllMergeRegisters(
        Sketches.hllRegisters(shaped(a)), Sketches.hllRegisters(shaped(b))),
      Sketches.hllRegisters(shaped(a))))
      .select("n_used", "s_total").head()
    assert(remerged === whole)
  }

  test("cms: point estimates never underestimate, are exact sans " +
    "collision, and cells merge by sum across corpus halves") {
    import spark.implicits._
    val rows = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val df = rows.toDF("x")
    val cells = Sketches.cmsCells(df, col("x"), d = 4, w = 256)
    assert(cells.agg(sum("cnt")).head().getLong(0) === 4L * rows.size)
    val keys = (1 to 50).map(i => s"k$i").toDF("v")
    val est = Sketches.cmsPointEstimates(cells, keys, d = 4, w = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size }
    // CMS guarantee: est >= exact always; with 50 keys in 256 columns x
    // 4 rows, expect most keys exact (min over rows kills most collisions)
    (1 to 50).foreach { i =>
      assert(est(s"k$i") >= exact(s"k$i").toLong, s"k$i underestimated")
    }
    assert((1 to 50).count(i => est(s"k$i") === exact(s"k$i").toLong) >= 45)

    // mergeability: cellwise SUM of per-half sketches == whole-corpus cells
    val (h1, h2) = rows.splitAt(rows.size / 2)
    val mergedCells = Sketches.cmsCells(h1.toDF("x"), col("x"))
      .unionByName(Sketches.cmsCells(h2.toDF("x"), col("x")))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
    val direct = cells.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = mergedCells.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === direct)

    // unseen key probes to 0 unless every row collides (never negative)
    val unseen = Sketches.cmsPointEstimates(cells,
      Seq("never-inserted-xyz").toDF("v")).head().getLong(1)
    assert(unseen >= 0L)
  }
}
