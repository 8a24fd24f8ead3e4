package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic splitting/sampling and sequence packing. */
class SplitsPackingSpec extends SparkSuite {

  import org.apache.spark.sql.DataFrame

  private lazy val ids: DataFrame = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
  }

  test("split: assignment is deterministic, total, and near the weights") {
    val a = Splits.assignSplit(ids, "id").cache()
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts.keySet === Set("train", "val", "test"))
    // hash-uniformity: within ~4 sigma of the weights on 2000 rows
    assert(math.abs(counts("train") - 1600L) < 80,
      s"train=${counts("train")}")
    assert(math.abs(counts("val") - 200L) < 60)
    // re-evaluation gives the identical assignment (no rand() anywhere)
    val b = Splits.assignSplit(ids, "id")
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // a different salt re-draws: some rows move
    val c = Splits.assignSplit(ids, "id", salt = "v2")
    assert(c.except(a).count() > 0)
    a.unpersist()
  }

  test("split: weights validated, custom weights respected") {
    intercept[IllegalArgumentException] {
      Splits.assignSplit(ids, "id", Seq("x" -> 0.5, "y" -> 0.2))
    }
    val two = Splits.assignSplit(ids, "id", Seq("l" -> 0.5, "r" -> 0.5))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two.keySet === Set("l", "r"))
    assert(math.abs(two("l") - 1000L) < 90)
  }

  test("deterministic sample: stable subset of the right size") {
    val s = Splits.deterministicSample(ids, "id", 0.3)
    val n = s.count()
    assert(math.abs(n - 600L) < 90, s"n=$n")
    assert(s.except(Splits.deterministicSample(ids, "id", 0.3)).count() === 0)
    // monotone: a smaller fraction is a subset of a larger one
    val s01 = Splits.deterministicSample(ids, "id", 0.1)
    assert(s01.except(s).count() === 0)
  }

  test("stratified sample: per-stratum fractions, absent strata dropped") {
    val s = Splits.stratifiedSample(ids, "id", "stratum",
      Map("a" -> 0.5, "b" -> 0.1)).cache()
    val byStratum = s.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("a") - 500L) < 90, s"a=${byStratum("a")}")
    assert(math.abs(byStratum("b") - 100L) < 60, s"b=${byStratum("b")}")
    val none = Splits.stratifiedSample(ids, "id", "stratum",
      Map("a" -> 0.5))
    assert(none.where(col("stratum") === "b").count() === 0)
    s.unpersist()
  }

  private lazy val docs: DataFrame = {
    import spark.implicits._
    Seq((10L, 100L), (11L, 0L), (12L, 600L), (13L, 200L), (14L, 512L),
      (15L, 1L)).toDF("doc_id", "n_tok")
  }

  test("packing: chunk spans equal the single-reducer global cumsum") {
    val got = Packing.packChunks(docs, "doc_id", col("n_tok"),
      capacity = 512, buckets = 3)
    // naive oracle: one global window (fine on 6 rows)
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("first_chunk", floor(col("start_tok") / 512))
      .withColumn("last_chunk",
        when(col("n_tok") > 0,
          floor((col("start_tok") + col("n_tok") - 1) / 512))
          .otherwise(col("first_chunk")))
      .select(col("doc_id").as("id"), col("n_tok").as("n_tokens"),
        col("start_tok"), col("first_chunk").cast("long"),
        col("last_chunk").cast("long"))
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("packing: zero-token docs keep an address; spans match capacity") {
    val rows = Packing.packChunks(docs, "doc_id", col("n_tok"),
      capacity = 512, buckets = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 100 tokens from offset 0 → chunk 0 only
    assert(rows(10L) === ((100L, 0L, 0L, 0L)))
    // zero tokens at offset 100 → first == last
    assert(rows(11L) === ((0L, 100L, 0L, 0L)))
    // 600 tokens from offset 100 → spans chunks 0 and 1
    assert(rows(12L) === ((600L, 100L, 0L, 1L)))
    // exactly hitting a boundary: 512 tokens from 900 → chunks 1..2
    assert(rows(14L) === ((512L, 900L, 1L, 2L)))
    val fan = Packing.chunkAssignments(
      Packing.packChunks(docs, "doc_id", col("n_tok"), 512, 2))
    assert(fan.where(col("id") === 12L).select("chunk_id").collect()
      .map(_.getLong(0)).sorted === Array(0L, 1L))
  }

  test("packing: empty input returns empty result") {
    assert(Packing.packChunks(docs.where(col("doc_id") < 0), "doc_id",
      col("n_tok"), 512).count() === 0)
  }

  test("incremental minhash: batch joins index without re-pairing index") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an unrelated document about distributed query engines"),
      (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (4L, "another unrelated piece of text entirely different"))
      .toDF("doc_id", "text")
    def buckets(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandBuckets(d, "doc_id", "text", shingleSize = 2,
        numHashes = 16, bands = 8)
    val got = Dedup.incrementalMinhashCandidates(
      buckets(corpus.where(col("doc_id") <= 2)),
      buckets(corpus.where(col("doc_id") >= 3)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((3L, 1L))) // new dup found against the index
    assert(!got.exists { case (n, i) => n <= 2 || i >= 3 }) // direction
    assert(!got.contains((4L, 2L))) // unrelated pair not produced
  }

  test("incremental minhash equals the batch cross-boundary pairs " +
      "on the fixture") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def b(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandBuckets(d, "doc_id", "text", shingleSize = 2,
        numHashes = 16, bands = 8)
    val inc = Dedup.incrementalMinhashCandidates(
      b(docs.where(col("doc_id") < 25)), b(docs.where(col("doc_id") >= 25)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch pairs are (id_a < id_b); incremental reports (new, old)
    val cross = full.collect {
      case (a, n) if a < 25 && n >= 25 => (n, a)
    }
    assert(full.nonEmpty, "fixture has no candidate pairs at all")
    assert(inc === cross)
  }

  test("incremental minhash: hot index buckets are dropped") {
    import spark.implicits._
    // 30 identical index docs → every band bucket holds 30 entries > cap 10
    val index = (1L to 30L).map(i => (i, "same same text here"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, "same same text here")).toDF("doc_id", "text")
    def buckets(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandBuckets(d, "doc_id", "text", shingleSize = 2,
        numHashes = 16, bands = 8)
    val got = Dedup.incrementalMinhashCandidates(
      buckets(index), buckets(batch), maxBucketSize = 10)
    assert(got.count() === 0)
  }

  test("leakageSafeSplit: clusters move as one unit, singletons unchanged") {
    import spark.implicits._
    // 0-2 form one near-dup cluster (rep 0); 10-11 another (rep 10)
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val out = Splits.leakageSafeSplit(ids.select("id"), "id", clusters)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 2000)
    assert(Set(out(0L), out(1L), out(2L)).size === 1, "cluster 0 split")
    assert(Set(out(10L), out(11L)).size === 1, "cluster 10 split")
    // members inherit the REPRESENTATIVE's bucket…
    val plain = Splits.assignSplit(ids.select("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === plain(0L) && out(11L) === plain(10L))
    // …and every non-clustered row keeps its per-id assignment
    assert(out.filterNot(kv => Set(1L, 2L, 11L)(kv._1)) ===
      plain.filterNot(kv => Set(1L, 2L, 11L)(kv._1)))
  }

  test("deterministicShuffle: dense total order matching the global sort, " +
      "stable under physical layout") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val out = Splits.deterministicShuffle(ids, "doc_id", buckets = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions are a dense permutation 0..N-1
    assert(out.map(_._3).sorted === (0L until 500L).toArray)
    // and equal the rank in a plain (key, id) sort
    val expected = out.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((id, _, _), i) => id -> i.toLong }.toMap
    assert(out.forall(t => expected(t._1) === t._3))
    // re-partitioning the input must not move anyone
    val shuffled = Splits.deterministicShuffle(
      ids.repartition(13), "doc_id", buckets = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.forall(t => shuffled(t._1) === t._3))
    // a different salt is a different permutation
    val reseeded = Splits.deterministicShuffle(ids, "doc_id", salt = "v2")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.exists(t => reseeded(t._1) !== t._3))
  }

  test("weightedSample: keep rate tracks weight, deterministic, " +
      "null/negative weights drop") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 4 == 0) 2.0 else 0.2)).toDF("id", "w")
    val kept = Splits.weightedSample(rows, "id", col("w"), scale = 0.5)
      .collect().map(_.getLong(0)).toSet
    // w=2.0 scale 0.5 → threshold 1.0 → always kept
    assert((0L until 2000L by 4).forall(kept))
    // w=0.2 scale 0.5 → p=0.1: expect ~150 of 1500, loose band
    val light = kept.count(_ % 4 != 0)
    assert(light > 80 && light < 250, s"kept $light of 1500 at p=0.1")
    // deterministic
    val again = Splits.weightedSample(rows, "id", col("w"), scale = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(again === kept)
    // null / negative weights never survive
    val bad = Seq((1L, Option.empty[Double]), (2L, Some(-5.0)))
      .toDF("id", "w")
    assert(Splits.weightedSample(bad, "id", col("w"), 1.0).count() === 0)
  }

  test("deterministicShuffle: empty input yields empty output") {
    import spark.implicits._
    val out = Splits.deterministicShuffle(
      Seq.empty[Long].toDF("doc_id"), "doc_id")
    assert(out.count() === 0)
    assert(out.columns === Array("id", "shuffle_key", "position"))
  }

  test("quotaSample: n per stratum by hash order, matches a window ref") {
    val q = Splits.quotaSample(ids, "id", "stratum", n = 25).cache()
    val counts = q.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 25L, "b" -> 25L))
    // ranks are 1..n within each stratum
    assert(q.where(col("rank") < 1 || col("rank") > 25).count() === 0)
    // differential: the bounded aggregate must equal the row_number()
    // window reference it replaces (same hash, same tie order)
    val h = conv(substring(md5(concat(lit("graft:"), col("stratum"),
      lit("/"), col("id").cast("string"))), 1, 13), 16, 10).cast("long")
    val ref = ids.withColumn("h", h)
      .withColumn("rank", row_number().over(
        Window.partitionBy("stratum").orderBy(col("h"), col("id"))))
      .where(col("rank") <= 25)
      .select(col("stratum"), col("id"), col("rank"))
    assert(q.except(ref).count() === 0 && ref.except(q).count() === 0)
    // small strata yield all their rows, not an error
    val tiny = Splits.quotaSample(ids.where(col("id") < 3), "id",
      "stratum", n = 25)
    assert(tiny.count() === 3)
    q.unpersist()
  }

  test("neymanSample: allocation proportional to N_h*S_h, zero-variance " +
    "stratum gets ~nothing, caps at stratum size, checksum pins " +
    "membership") {
    import spark.implicits._
    // stratum a: 100 rows, values alternate 0/1000 (huge variance);
    // stratum b: 100 rows, constant (zero variance -> w=0);
    // stratum c: 4 rows, alternating (tiny but high variance).
    val rows =
      (1 to 100).map(i => ("a", i.toLong, if (i % 2 == 0) 1000.0
        else 0.0)) ++
      (101 to 200).map(i => ("b", i.toLong, 500.0)) ++
      (201 to 204).map(i => ("c", i.toLong, if (i % 2 == 0) 1000.0
        else 0.0))
    val df = rows.toDF("g", "id", "v")
    val got = Splits.neymanSample(df, "g", "id", "v", totalN = 50)
      .collect().map(r => r.getString(0) -> r).toMap
    // w_a = sqrt(100*sum(y4^2) - sum(y4)^2): y4 in {0, 1e7}:
    // = sqrt(100*50*1e14 - (5e8)^2) = sqrt(5e17 - 2.5e17) = 5e8
    assert(got("a").getAs[Long]("neyman_w") === 500000000L)
    // zero variance -> weight 0 -> allocation 0 -> absent from output
    assert(!got.contains("b"))
    // w_c = sqrt(4*2*1e14 - (2e7)^2) = sqrt(8e14 - 4e14) = 2e7
    assert(got("c").getAs[Long]("neyman_w") === 20000000L)
    // allocation: floor(50*5e8/5.2e8) = 48, floor(50*2e7/5.2e8) = 1;
    // leftover 1 goes to the larger remainder; c caps at nh=4
    val aAlloc = got("a").getAs[Int]("alloc_n")
    val cAlloc = got("c").getAs[Int]("alloc_n")
    assert(aAlloc + cAlloc === 50 ||
      (cAlloc === 4 && aAlloc >= 46), s"a=$aAlloc c=$cAlloc")
    assert(got("a").getAs[Long]("sampled_n") === aAlloc.toLong)
    assert(got("c").getAs[Long]("sampled_n") === cAlloc.toLong)
    // membership is the n smallest (hash, id) — recompute directly
    val hashes = df.where(col("g") === "a").select(col("id"),
        conv(substring(md5(concat(lit("graft:"), col("g"), lit("/"),
          col("id").cast("string"))), 1, 15), 16, 10).cast("long")
          .as("h"))
      .as[(Long, Long)].collect().sortBy { case (id, h) => (h, id) }
    val wantSum = hashes.take(aAlloc).map(_._1).sum
    assert(got("a").getAs[Long]("id_checksum") === wantSum)
  }
}
