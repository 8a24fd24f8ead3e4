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
}
