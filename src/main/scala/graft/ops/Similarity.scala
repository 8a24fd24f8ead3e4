package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k baseline plus an
  * LSH-bucketed approximate variant as the scale path.
  *
  * Embeddings are `array<float>` columns; dot products are
  * `functions.aggregate`/`zip_with` expressions so the whole scoring stage
  * is codegen'd — no UDF per row.
  */
object Similarity {

  /** Dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Brute-force cosine top-k: for each query row, the k most similar corpus
    * rows. The corpus→query comparison is a broadcast of the (small) query
    * set against the (large) corpus — the corpus is never shuffled, only
    * scored map-side and reduced with a per-query top-k window.
    *
    * At 1000-executor scale: queries broadcast once; scoring is map-local;
    * the only shuffle is the final top-k per query (k rows per partition per
    * query after partial aggregation).
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus.select(col(corpusId).as("corpus_id"),
        col(corpusVec).as("cvec"))
      .join(broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("qvec"))))
      .withColumn("score", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `numPlanes` deterministic pseudo-random ±1 hyperplanes. Vectors in the
    * same bucket are likely cosine-similar; search then only scores within
    * the query's bucket (and optionally neighboring probes).
    *
    * The sign matrix is built once on the driver (deterministic murmur mix
    * of (plane, dim)) and shipped as a literal — per-row work is just
    * numPlanes dot products over the bound vector, nothing recomputed.
    */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val signs: Seq[Double] = (0 until dim).map { i =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, i))
        if ((h & 1) == 1) 1.0 else -1.0
      }
      val proj = aggregate(zip_with(vec, typedLit(signs), (v, s) => v * s),
        lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k: bucket the corpus once (reusable,
    * write-out-able as a partitioned table at scale), bucket the queries,
    * then score only within matching buckets. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, numPlanes: Int = 8): DataFrame = {
    val bCorpus = corpus.select(col(corpusId).as("corpus_id"),
      col(corpusVec).as("cvec"),
      hyperplaneBucket(col(corpusVec), dim, numPlanes).as("bucket"))
    val bQueries = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"),
      hyperplaneBucket(col(queryVec), dim, numPlanes).as("bucket"))
    val scored = bCorpus.join(broadcast(bQueries), Seq("bucket"))
      .withColumn("score", cosine(col("cvec"), col("qvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  /** Embedding-cosine near-duplicate pairs within one dataset, via LSH
    * buckets (exact within-bucket scoring, a-id < b-id dedup). */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, numPlanes: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneBucket(col(vecCol), dim, numPlanes).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("score", cosine(col("a.vec"), col("b.vec")))
      .where(col("score") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("score"))
  }
}
