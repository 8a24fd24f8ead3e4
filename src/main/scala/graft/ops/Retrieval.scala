package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Lineage._
import graft.functions.GraftFunctions

/** Lexical (BM25) and hybrid lexical+vector retrieval over a document
  * corpus — the query-serving counterpart of the dedup/similarity
  * family: candidate recall for RAG-style training-data mining, nearest
  * lexical neighbors for decontamination checks, and rank fusion of the
  * two modalities.
  *
  * Scale shape (both operators): the corpus is tokenized and aggregated
  * with map-side-combined shuffles exactly like the TF-IDF family
  * ([[TextAnalysis.topTerms]]); the query set — small by contract, like
  * every serving batch in [[Similarity]] — is broadcast, so corpus
  * posting rows are never shuffled by query. Per-query results are
  * reduced with the bounded [[graft.functions.TopKByScore]] aggregate
  * (O(k) partial buffers), never a row_number window over all scored
  * rows.
  *
  * Determinism/oracle contract: per-(query,term,doc) BM25 weights are
  * rounded to 6dp and summed in DECIMAL — the per-document score is an
  * order-independent exact decimal sum, so ranking (score desc, doc_id
  * asc) is reproducible by any engine; only the per-term ln() lives in
  * IEEE doubles (the q42 precedent). Fusion ranks use exact integer
  * floor-ppm RRF contributions — no doubles at all.
  */
object Retrieval {

  /** Whitespace tokens of `text`, lowercased, empties dropped —
    * identical to the TF-IDF family's rule so lexical operators share
    * one vocabulary. */
  private def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** BM25 top-k retrieval: for each query row, the `topK` highest-BM25
    * documents. Okapi BM25 with the non-negative idf variant
    * `ln(1 + (N - df + 0.5) / (df + 0.5))` and the standard length
    * normalization `tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`,
    * summed over the query's DISTINCT terms.
    *
    * Plan: tokenize → per-(doc,term) tf and per-doc length (two
    * map-side-combined shuffles over the corpus, the TF-IDF plan
    * family); document frequencies are semi-joined down to the query
    * vocabulary and broadcast BACK with the query terms, so scoring is
    * a map-side hash join against the tf table — the corpus never
    * shuffles on a query key. One one-row (N, total token count) stats
    * frame rides a broadcast cross join.
    *
    * Returns (query_id, doc_id, bm25, rank) — bm25 is the exact
    * decimal sum of 6dp-rounded per-term weights cast to double, rank
    * is 1-based per query (score desc, doc_id asc). */
  def bm25Retrieve(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    require(k1 > 0 && b >= 0 && b <= 1, s"need k1 > 0, 0 <= b <= 1")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // one row: corpus size and total token count (avgdl = total / n;
    // docs with zero tokens count toward N, exactly like the oracle)
    val stats = docs.select(count(lit(1)).as("n"))
      .crossJoin(toks.select(count(lit(1)).as("total")))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(tokens(col(queryTextCol))).as("term")).distinct()
    // document frequency only for the query vocabulary: the corpus-wide
    // df table is cut down by a broadcast semi-join BEFORE it travels
    val qdf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val qside = qterms.join(qdf, Seq("term"))
    // map-side scoring joins: tf (corpus-keyed) gains (query_id, df)
    // from the broadcast query side, dl by doc_id, stats by cross
    val scored = tf
      .join(broadcast(qside), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
    val nD = col("n").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val avgdl = col("total").cast("double") / nD
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val w = idf * (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / avgdl))
    // 6dp-round each per-term weight, then sum EXACTLY in decimal:
    // the document score is independent of addition order, so ranking
    // is engine-reproducible (ln ulp noise cannot reorder a sum)
    val perTerm = scored.select(col("query_id"), col("doc_id"),
      round(w, 6).cast(DecimalType(18, 6)).as("wd"))
    val bm = perTerm.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("wd")).as("bm_dec"))
    bm.groupBy(col("query_id"))
      .agg(GraftFunctions.topKByScore(col("bm_dec").cast("double"),
        col("doc_id"), topK).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").as("bm25"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical list
    * and the exact cosine vector list, per query. Each list contributes
    * `1000000 div (kConst + rank)` ppm — exact integer arithmetic, so
    * the fused ordering is engine-reproducible given the two input
    * rankings (ties broken by doc_id asc).
    *
    * Scale: both lists are bounded (|queries| × perListK rows), so
    * everything after the two retrieval kernels runs on tiny frames;
    * the corpus is scanned by each kernel exactly as documented on
    * [[bm25Retrieve]] and [[Similarity.bruteForceTopK]].
    *
    * Returns (query_id, doc_id, fused_rank, rrf_ppm, n_lists,
    * best_rank) for the per-query top `topN`. */
  def hybridRrfRetrieve(docs: DataFrame, idCol: String, textCol: String,
      vecCol: String, queries: DataFrame, queryIdCol: String,
      queryTextCol: String, queryVecCol: String, perListK: Int,
      topN: Int, kConst: Int = 60): DataFrame = {
    require(perListK >= 1 && topN >= 1 && kConst >= 1,
      s"need perListK/topN/kConst >= 1, got $perListK/$topN/$kConst")
    val lex = bm25Retrieve(docs, idCol, textCol, queries, queryIdCol,
      queryTextCol, perListK)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"))
    val vec = Similarity.bruteForceTopK(docs, idCol, vecCol, queries,
      queryIdCol, queryVecCol, perListK)
      .select(col("query_id"), col("corpus_id").as("doc_id"),
        col("rank").cast("long").as("rank"))
    val contrib = lex.unionByName(vec)
    // fused is referenced twice (top-N aggregate + detail join-back);
    // without a lineage barrier BOTH retrieval kernels would re-scan
    // the corpus for each reference (the annNearDupScored lesson). The
    // frame is bounded (|queries| × 2·perListK rows), so the barrier
    // is O(results), not O(corpus).
    val fused = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        min(col("rank")).as("best_rank"),
        sum(expr(s"1000000L div ($kConst + rank)")).as("rrf_ppm"))
      .truncateLineage(eager = false)
    fused.groupBy(col("query_id"))
      .agg(GraftFunctions.topKByScore(col("rrf_ppm").cast("double"),
        col("doc_id"), topN).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("fused_rank"))
      .join(fused, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("fused_rank"),
        col("rrf_ppm"), col("n_lists"), col("best_rank"))
  }
}
