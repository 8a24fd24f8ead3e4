package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Embedding similarity search: brute-force cosine top-k baseline plus an
  * LSH-bucketed approximate variant as the scale path.
  *
  * Embeddings are `array<float>` columns; dot products and LSH signatures
  * are native codegen'd Catalyst expressions (graft.functions) — one kernel
  * call per row, no interpreted per-element lambdas, no UDF boxing.
  */
object Similarity {

  /** Dot product of two array<float> or array<double> columns (native). */
  def dot(a: Column, b: Column): Column = GraftFunctions.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. Prefer the
    * precomputed-norm forms below inside joins. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  private def cosinePre(dotAB: Column, normA: Column, normB: Column): Column =
    when(normA * normB === 0, lit(0.0)).otherwise(dotAB / (normA * normB))

  /** Brute-force cosine top-k: for each query row, the k most similar corpus
    * rows. The (small) query set is broadcast against the (large) corpus —
    * the corpus is never shuffled, only scored map-side and reduced with a
    * per-query top-k window. Norms are computed once per row on each side
    * *before* the join, so the pair loop does one dot product only.
    *
    * At 1000-executor scale: queries broadcast once; scoring is map-local;
    * the only shuffle is the final top-k per query (k rows per partition per
    * query after partial aggregation).
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("corpus_id"),
      col(corpusVec).as("cvec"), norm(col(corpusVec)).as("cnorm"))
    val q = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"), norm(col(queryVec)).as("qnorm"))
    val scored = c.join(broadcast(q))
      .withColumn("score",
        cosinePre(dot(col("cvec"), col("qvec")), col("cnorm"), col("qnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "corpus_id", "score", "rank")
  }

  /** Random-hyperplane LSH bucket id — native HyperplaneLsh expression
    * (sign bits of projections onto `numPlanes` deterministic pseudo-random
    * ±1 hyperplanes). */
  def hyperplaneBucket(vec: Column, dim: Int, numPlanes: Int): Column =
    GraftFunctions.hyperplaneLsh(vec, numPlanes)

  /** LSH-bucketed approximate top-k: bucket the corpus once (reusable,
    * write-out-able as a partitioned table at scale), bucket the queries,
    * then score only within matching buckets. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, numPlanes: Int = 8): DataFrame = {
    val bCorpus = corpus.select(col(corpusId).as("corpus_id"),
      col(corpusVec).as("cvec"), norm(col(corpusVec)).as("cnorm"),
      hyperplaneBucket(col(corpusVec), dim, numPlanes).as("bucket"))
    val bQueries = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"), norm(col(queryVec)).as("qnorm"),
      hyperplaneBucket(col(queryVec), dim, numPlanes).as("bucket"))
    val scored = bCorpus.join(broadcast(bQueries), Seq("bucket"))
      .withColumn("score",
        cosinePre(dot(col("cvec"), col("qvec")), col("cnorm"), col("qnorm")))
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
      norm(col(vecCol)).as("nrm"),
      hyperplaneBucket(col(vecCol), dim, numPlanes).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("score", cosinePre(dot(col("a.vec"), col("b.vec")),
        col("a.nrm"), col("b.nrm")))
      .where(col("score") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("score"))
  }

  /** Exact all-pairs cosine near-duplicates, decimal-exact scoring (for
    * oracle-parity with DuckDB: the per-element products and their sum are
    * DECIMAL(38,12), so reduction order cannot change bits). Quadratic in
    * the filtered id range — the scale path is `cosineNearDups`. */
  def cosineNearDupsExact(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val d = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<decimal(20,9)>").as("vec"))
    val pairs = d.as("a").join(d.as("b"), col("a.id") < col("b.id"))
    pairs
      .withColumn("dotd", aggregate(
        zip_with(col("a.vec"), col("b.vec"), (x, y) => x * y),
        lit(0).cast("decimal(38,12)"),
        (acc, v) => acc + coalesce(v, lit(0)).cast("decimal(38,12)")))
      .withColumn("na", aggregate(
        transform(col("a.vec"), x => x * x),
        lit(0).cast("decimal(38,12)"),
        (acc, v) => acc + coalesce(v, lit(0)).cast("decimal(38,12)")))
      .withColumn("nb", aggregate(
        transform(col("b.vec"), x => x * x),
        lit(0).cast("decimal(38,12)"),
        (acc, v) => acc + coalesce(v, lit(0)).cast("decimal(38,12)")))
      .where(col("na") > 0 && col("nb") > 0)
      .withColumn("cos2_num", col("dotd") * col("dotd"))
      .withColumn("cos2_den", col("na") * col("nb"))
      // dot>0 and dot² >= t²·na·nb  ⇔  cosine >= t (exact integer-ish compare)
      .where(col("dotd") > 0 &&
        col("cos2_num") >= col("cos2_den") * lit(threshold * threshold))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }
}
