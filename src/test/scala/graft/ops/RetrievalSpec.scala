package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite

class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox"),
    (2L, "lorem ipsum dolor sit amet"),
    (3L, "quick quick quick brown"),
    (4L, "a completely unrelated document about spark engines"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("bm25: a document is its own best match, term-absent docs " +
    "never score, empty docs never appear") {
    val queries = docs.where($"doc_id" === 1L)
      .select($"doc_id".as("qid"), $"text".as("qtext"))
    val got = Retrieval.bm25Retrieve(docs, "doc_id", "text",
      queries, "qid", "qtext", topK = 10)
      .orderBy($"rank").collect()
    // doc 1 contains every query term at full idf weight with the
    // shortest length — rank 1
    assert(got.head.getLong(got.head.fieldIndex("doc_id")) === 1L)
    val ids = got.map(_.getLong(1)).toSet
    assert(!ids.contains(2L) && !ids.contains(4L) && !ids.contains(5L),
      s"docs sharing no term with the query must not appear: $ids")
    // scores strictly ordered by construction of rank
    val scores = got.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("bm25: length normalization — same tf, shorter doc wins") {
    val d = Seq(
      (10L, "alpha beta"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val q = Seq((0L, "alpha")).toDF("qid", "qtext")
    val got = Retrieval.bm25Retrieve(d, "doc_id", "text", q, "qid",
      "qtext", topK = 2).orderBy($"rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(10L, 11L))
  }

  test("hybrid: fuses both lists with exact integer rrf and bounded " +
    "top-n; a doc in both lists outranks single-list docs at equal " +
    "ranks") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(0.8f, 0.2f)),
      (4L, Array(-1f, 0f)), (5L, Array(0.5f, 0.5f))
    ).toDF("vid", "vec")
    val corpus = docs.join(vecs, $"doc_id" === $"vid")
      .select($"doc_id", $"text", $"vec")
    val queries = corpus.where($"doc_id" === 1L)
      .select($"doc_id".as("qid"), $"text".as("qtext"),
        $"vec".as("qvec"))
    val got = Retrieval.hybridRrfRetrieve(corpus, "doc_id", "text",
      "vec", queries, "qid", "qtext", "qvec", perListK = 4, topN = 3)
      .orderBy($"fused_rank").collect()
    assert(got.length === 3)
    // doc 1 is rank 1 on BOTH lists: rrf = 2 * (1000000 div 61)
    val top = got.head
    assert(top.getLong(top.fieldIndex("doc_id")) === 1L)
    assert(top.getLong(top.fieldIndex("rrf_ppm")) === 2L * (1000000L / 61L))
    assert(top.getLong(top.fieldIndex("n_lists")) === 2L)
    assert(top.getLong(top.fieldIndex("best_rank")) === 1L)
    // fused ppm non-increasing down the ranks
    val ppm = got.map(r => r.getLong(r.fieldIndex("rrf_ppm")))
    assert(ppm.sameElements(ppm.sortBy(-_)))
  }

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("bm25 index: probe over the persisted index emits exactly the " +
    "direct path's rows, and the query buckets land in the postings " +
    "scan's partition filters") {
    val queries = docs.where($"doc_id" < 2)
      .select($"doc_id".as("qid"), $"text".as("qtext"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank").collect().toSeq
    val direct = rows(Retrieval.bm25Retrieve(docs, "doc_id", "text",
      queries, "qid", "qtext", topK = 10))
    val path = tmpDir("bm25idx")
    Retrieval.writeBm25Index(
      Retrieval.buildBm25Index(docs, "doc_id", "text", numBuckets = 4),
      path)
    val probe = Retrieval.probeBm25Index(spark, path, queries, "qid",
      "qtext", topK = 10)
    assert(rows(probe) === direct)
    // pruning: the bucket filter must reach the scan as a PARTITION
    // filter (pruned directories, not a post-scan predicate)
    val physical = probe.queryExecution.executedPlan.toString
    val scans = physical.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(scans.exists(l => l.contains("bucket") &&
      (l.contains(" IN ") || l.contains("isin") || l.contains("in("))),
      s"no bucket partition filter in any scan; plan:\n$physical")
  }

  test("bm25 index: meta is required and loud — a root without meta " +
    "fails, a probe on a fresh index matches a same-stats rebuild") {
    val path = tmpDir("bm25meta")
    intercept[Exception] {
      Retrieval.readBm25Index(spark, path)
    }
    Retrieval.writeBm25Index(
      Retrieval.buildBm25Index(docs, "doc_id", "text", numBuckets = 2),
      path)
    val idx = Retrieval.readBm25Index(spark, path)
    assert(idx.nDocs === 6L && idx.numBuckets === 2)
    assert(idx.totalTokens ===
      docs.select(explode(split(lower(trim($"text")), "\\s+")))
        .where(length($"col") > 0).count())
  }

  test("bm25 index: token-less queries return an empty frame in the " +
    "probe's derived schema") {
    val path = tmpDir("bm25empty")
    Retrieval.writeBm25Index(
      Retrieval.buildBm25Index(docs, "doc_id", "text", numBuckets = 2),
      path)
    val q = Seq((0L, "   ")).toDF("qid", "qtext")
    val out = Retrieval.probeBm25Index(spark, path, q, "qid", "qtext",
      topK = 5)
    assert(out.count() === 0L)
    assert(out.columns.toSeq ===
      Seq("query_id", "doc_id", "bm25", "rank"))
  }

  test("bm25 determinism: two runs emit identical rows") {
    val queries = docs.where($"doc_id" < 2)
      .select($"doc_id".as("qid"), $"text".as("qtext"))
    def run(): Array[Row] =
      Retrieval.bm25Retrieve(docs, "doc_id", "text", queries, "qid",
        "qtext", topK = 5)
        .orderBy($"query_id", $"rank").collect()
    assert(run().toSeq === run().toSeq)
  }
}
