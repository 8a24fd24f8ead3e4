package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import graft.Lineage._
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All are pure `org.apache.spark.sql.functions` column expressions — no
  * UDFs — so every operator stays inside whole-stage codegen and is
  * pushdown/prune-friendly at 100 TB scale.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: alphanumeric runs + each ASCII symbol as
    * separate tokens (a cheap proxy for BPE vocab tokenization). The
    * pattern is engine-portable BY CONSTRUCTION: explicit ASCII ranges
    * only — no `\s` (Java includes \x0B, RE2 does not) and no negated
    * classes that would count astral characters differently under UTF-16
    * (Java) vs UTF-8 (RE2) — so the identical regex verifies in the SQL
    * oracle. */
  val SubwordPattern = "[A-Za-z0-9]+|[!-/:-@\\[-`{-~]"

  /** BPE-ish subword count: tokens split at letter/digit/punctuation boundaries. */
  def subwordCount(text: Column): Column =
    when(text.isNull, lit(0))
      .otherwise(regexp_count(text, lit(SubwordPattern)))

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = total - length(regexp_replace(text, "[\\p{Punct}]", ""))
    when(total === 0, lit(0.0)).otherwise(punct.cast("double") / total)
  }

  /** Ratio of uppercase letters to letters. */
  def upperRatio(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^A-Za-z]", ""))
    val uppers = length(regexp_replace(text, "[^A-Z]", ""))
    when(letters === 0, lit(0.0)).otherwise(uppers.cast("double") / letters)
  }

  /** English stopword hit ratio over whitespace tokens (language-ID /
    * quality signal). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "was",
    "for", "on", "are", "with", "as", "at", "be", "this", "have", "or")

  /** Fraction of whitespace tokens that are stopwords (0.0 for empty text). */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    val total = tokenCount(text)
    when(total === 0, lit(0.0)).otherwise(hits.cast("double") / total)
  }

  /** Mean whitespace-token length. */
  def meanTokenLength(text: Column): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  /** Composite quality score in [0,1]: length, punctuation, stopword and
    * casing signals (Gopher/C4-style heuristic filters, re-expressed as one
    * codegen'd expression). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(10, 100000), lit(1.0))
      .otherwise(when(nTok > 0, lit(0.3)).otherwise(lit(0.0)))
    val punctOk = when(punctRatio(text) <= 0.3, lit(1.0)).otherwise(lit(0.2))
    val stopOk = when(stopwordRatio(text) >= 0.05, lit(1.0)).otherwise(lit(0.5))
    val caseOk = when(upperRatio(text) <= 0.5, lit(1.0)).otherwise(lit(0.4))
    (lenOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + caseOk * 0.2)
  }

  /** Very light n-gram language-ID heuristic: scores text against per-language
    * stopword lists and returns the argmax (or 'und' when nothing matches).
    * Real systems use trained n-gram profiles; the *shape* (per-language
    * score columns + greatest) is what matters for the pipeline. */
  val LanguageStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "una", "por", "con", "para", "del"))

  /** N-gram-heuristic language id over the stopword profiles: best-scoring language label, 'und' when nothing matches. */
  def languageId(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = LanguageStopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(toks, t => t.isInCollection(sw))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Deterministic 64-bit document fingerprint: polynomial rolling hash over
    * the text bytes (content-addressable dedup key that is reproducible
    * across engines, unlike Spark's internal hash). */
  def fingerprint64(text: Column): Column = {
    // xxhash64 is Spark-native, stable across versions/platforms, codegen'd
    xxhash64(text)
  }

  /** C4-style scrubbing for training corpora: replace emails and URLs with
    * placeholder tokens (RE2-compatible patterns — no lookarounds — so the
    * exact same regexes verify in the SQL oracle and port to other
    * engines). Pure regexp_replace: codegen'd, pushdown-friendly. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\n\\r]+"

  /** Replace detected PII spans (emails, phones, SSNs, cards, IPs) with type tags. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, UrlPattern, "<URL>"),
      EmailPattern, "<EMAIL>")

  /** Count of redactable spans (cheap corpus-quality signal). */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)) +
      regexp_count(text, lit(UrlPattern))

  /** Host part of a URL: the authority between `scheme://` and the first
    * `/`, `:` (port) or end. Pure regexp — codegen'd, engine-portable
    * (explicit classes only). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Registrable domain (eTLD+1) of a host, with the common two-level
    * public suffixes handled explicitly (`co.uk`-style). The full public
    * suffix list is a data file a production deployment would broadcast;
    * the anchored-alternation regexp is the same plan shape and keeps the
    * whole operator inside codegen. Unmatched hosts (single-label,
    * IP-ish) yield the empty string — degrade, never fail. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host,
      "([^.]+\\.(?:co\\.uk|ac\\.uk|co\\.jp|com\\.au|com\\.br)|[^.]+\\.[^.]+)$",
      1)

  /** Per-domain corpus report: document count, mean length, distinct
    * languages and sources — the aggregation behind domain-level curation
    * decisions (C4/RefinedWeb-style). One map-side-combined shuffle on
    * the domain key. A `domain` column already present on the input (the
    * [[blocklistFilter]] output contract) is trusted as-is, so the
    * filter → report pipeline extracts each document's domain once, not
    * once per stage. */
  def domainStats(docs: DataFrame, urlCol: String): DataFrame =
    (if (docs.columns.contains("domain")) docs
     else docs.withColumn("domain",
       registrableDomain(urlHost(col(urlCol)))))
      .where(col("domain") =!= "")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))

  /** Domain-blocklist filter: drop every document whose registrable
    * domain appears in `blockedDomains` (one `domain` column). A
    * broadcast LEFT ANTI join — the blocklist is small (UT1-style lists
    * are ~1M rows) and never shuffles the 100 TB fact side. */
  def blocklistFilter(docs: DataFrame, urlCol: String,
      blockedDomains: DataFrame): DataFrame =
    docs.withColumn("domain", registrableDomain(urlHost(col(urlCol))))
      .join(broadcast(blockedDomains.select(col("domain")).distinct()),
        Seq("domain"), "left_anti")

  /** Per-document top-k TF-IDF terms — keyword extraction for corpus
    * exploration and near-dup triage. Shape at scale: one shuffle for the
    * per-(doc, term) counts (map-side combined), one for the document
    * frequencies, then the bounded top-k aggregate per document (string
    * ids, O(k) buffers). Smoothed idf = ln((N+1)/(df+1)) + 1. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.select(col(idCol)).distinct().count()
    tf.join(docFreq, Seq("term"))
      .withColumn("weight", col("tf") *
        (log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0))
      .groupBy(col("doc_id"))
      .agg(graft.functions.GraftFunctions
        .topKByScore(col("weight"), col("term"), k).as("topk"))
      .select(col("doc_id"), posexplode(col("topk")))
      .select(col("doc_id"), col("col.id").as("term"),
        col("col.score").as("weight"), (col("pos") + 1).as("rank"))
  }

  /** Gopher-style repetition signals — the standard pretraining filters for
    * boilerplate/spam: fraction of tokens that are repeats of an earlier
    * token (`dup_token_ratio`), the most frequent token's share
    * (`top_token_ratio`), and the most frequent word-bigram's share
    * (`top_bigram_ratio`). Documents with no tokens report 0 everywhere.
    *
    * Shape at scale: explode → per-(doc, term) counts → per-doc maxima,
    * all map-side-combined aggregations (same plan family as TF-IDF) —
    * NOT a per-row higher-order-function scan over distinct tokens, which
    * would be O(tokens × distinct) interpreted work per document. */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ids = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    def shareAgg(grams: DataFrame): DataFrame =
      grams.groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("f"))
        .groupBy(col("doc_id"))
        .agg(sum(col("f")).as("total"), count(lit(1)).as("nd"),
          max(col("f")).as("top"))
    val tok = shareAgg(ids.select(col("doc_id"),
        explode(Dedup.tokens(col("text"))).as("gram")))
      .select(col("doc_id"), col("total").as("n_tokens"),
        (lit(1.0) - col("nd").cast("double") / col("total"))
          .as("dup_token_ratio"),
        (col("top").cast("double") / col("total")).as("top_token_ratio"))
    val bi = shareAgg(ids.select(col("doc_id"),
        explode(Dedup.wordShingles(col("text"), 2)).as("gram")))
      .select(col("doc_id"),
        (col("top").cast("double") / col("total")).as("top_bigram_ratio"))
    ids.select(col("doc_id"))
      .join(tok, Seq("doc_id"), "left")
      .join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dup_token_ratio"), lit(0.0)).as("dup_token_ratio"),
        coalesce(col("top_token_ratio"), lit(0.0)).as("top_token_ratio"),
        coalesce(col("top_bigram_ratio"), lit(0.0)).as("top_bigram_ratio"))
  }

  /** Per-source "dataset card" summary — the corpus-audit table a
    * training run starts from: document/token volume, language spread,
    * PII incidence and mean quality per source. One groupBy(source)
    * shuffle; every per-document signal is computed map-side in the same
    * pass, and the quality mean is summed in DECIMAL(18,4) (exact,
    * order-independent) before the final divide, so the rounded result is
    * engine-reproducible (the q44 trick). */
  def corpusReport(df: DataFrame, textCol: String, sourceCol: String,
      langCol: String): DataFrame =
    df.select(col(sourceCol).as("source"), col(langCol).as("lang"),
        tokenCount(col(textCol)).cast("long").as("n_tok"),
        qualityScore(col(textCol)).cast("decimal(18,4)").as("q"),
        (piiCount(col(textCol)) > 0).cast("int").as("has_pii"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("has_pii")).cast("long").as("pii_docs"),
        round(sum(col("q")).cast("double") / count(lit(1)), 4)
          .as("mean_quality"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 4)
          .as("mean_tokens"))

  /** Sliding-window text chunking with overlap — the RAG/embedding
    * pipeline splitter: chunk k covers tokens [k·stride, k·stride+window)
    * of the lower-cased whitespace tokenization ([[Dedup.tokens]]), so
    * consecutive chunks overlap by (window − stride) tokens. The final
    * chunk may be shorter; empty documents produce no chunks. Pure
    * map-side generate (one posexplode over the chunk indices, token
    * array bound ONCE per row before the lambda), zero shuffles. Returns
    * (doc_id, chunk_id, n_chunk_tokens, chunk_text). */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens >= 1 && strideTokens >= 1 &&
      strideTokens <= windowTokens,
      s"need 1 <= stride <= window, got $strideTokens/$windowTokens")
    df.select(col(idCol).as("doc_id"),
        graft.ops.Dedup.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) > 0)
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(0L),
          floor((size(col("tk")) - 1) / strideTokens).cast("long"))))
      .select(col("doc_id"), col("col").cast("int").as("chunk_id"),
        slice(col("tk"), col("col").cast("int") * strideTokens + 1,
          lit(windowTokens)).as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).as("n_chunk_tokens"),
        concat_ws(" ", col("ck")).as("chunk_text"))
  }

  /** CCNet/RefinedWeb-style line-level dedup: strips lines that repeat
    * across the corpus at least `minCount` times (navigation chrome,
    * cookie banners, unsubscribe footers — the boilerplate that survives
    * document-level dedup because every HOSTING page differs). Blank /
    * whitespace-only lines are structure, not content: they are never
    * counted and never removed. Returns one row per input document:
    * (doc_id, n_lines, n_removed, clean_text) with surviving lines
    * rejoined in original order (empty string when nothing survives).
    *
    * Shape at scale: lines join the frequency table AS STRINGS (the
    * Dedup.jaccard precedent — oracle-portable; hash them first at
    * extreme scale), but the frequency side is pre-filtered to lines at
    * or above `minCount`, so the join's build side is only the
    * boilerplate set — small enough that AQE turns the join broadcast —
    * and the corpus-wide line table crosses the wire once for the count
    * and once for the doc-reassembly groupBy. `collect_list` buffers are
    * document-bounded (one doc's lines), never corpus-bounded. */
  def removeDuplicateLines(df: DataFrame, idCol: String, textCol: String,
      minCount: Int): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val lines = df.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val dup = lines.where(length(trim(col("line"))) > 0)
      .groupBy(col("line")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
    lines.join(dup, Seq("line"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(col("n")).as("n_removed"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("n").isNull,
            struct(col("pos"), col("line"))))),
          s => s.getField("line"))).as("clean_text"))
  }

  /** Vocabulary coverage curve: the top `v` tokens by corpus frequency
    * with each prefix's CUMULATIVE share of all token occurrences — the
    * table a tokenizer design reads off ("a 512-word vocab covers X% of
    * running text; the OOV rate at size r is 1 − cum_share(r)").
    *
    * Shape: token counts are one map-side-combined aggregation; the
    * top-v selection is the bounded `topk_by_score` aggregate (O(v)
    * buffers, no global sort), and the cumulative shares are computed by
    * prefix-summing INSIDE the one-row top-v array — no
    * Exchange-SinglePartition window anywhere. The O(v²) interpreted
    * prefix fold runs once on one row. */
  def vocabCoverage(df: DataFrame, textCol: String, v: Int): DataFrame = {
    require(v >= 1, s"need v >= 1, got $v")
    val counts = df
      .select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val one = counts.groupBy()
      .agg(graft.functions.GraftFunctions.topKByScore(
          col("n").cast("double"), col("tok"), v).as("top"),
        sum(col("n")).as("total"))
    one
      .select(explode(transform(col("top"), (x, i) =>
        struct((i + 1).cast("int").as("rank"),
          x.getField("id").as("token"),
          x.getField("score").cast("long").as("n_occurrences"),
          (aggregate(slice(col("top"), lit(1), i + 1), lit(0.0),
            (acc, y) => acc + y.getField("score")) /
            col("total")).as("cum_share")))).as("e"))
      .select(col("e.rank"), col("e.token"), col("e.n_occurrences"),
        col("e.cum_share"))
  }

  /** Corpus-wide heavy hitters: the k most frequent word n-grams with
    * occurrence and document counts — the audit table behind boilerplate
    * detection, stopword-list induction and contamination triage. Ties
    * break by gram ascending (deterministic). N-gram construction is
    * [[Dedup.wordShingles]] (a document shorter than n tokens contributes
    * its whole token string as one gram).
    *
    * Shape at scale: explode → one map-side-combined groupBy(gram) for
    * (count, doc-count), then the bounded [[graft.functions.TopKByScore]]
    * aggregate — O(k) partial buffers per map task, k×partitions rows
    * into the single final reducer — NOT a global ORDER BY ... LIMIT,
    * which would sort the full gram table. The k winners broadcast back
    * onto the stats frame for their doc counts; Catalyst's ReuseExchange
    * evaluates the underlying gram aggregation once. */
  def frequentNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got $n/$k")
    // token-less documents shingle to [""] — drop those, or a corpus
    // with many empty docs ranks "" as a top heavy hitter
    val grams = df.select(col(idCol).as("doc_id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .where(length(col("gram")) > 0)
    val stats = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
    val top = stats.groupBy()
      .agg(graft.functions.GraftFunctions.topKByScore(
        col("n_occurrences").cast("double"), col("gram"), k).as("topk"))
      .select(posexplode(col("topk")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("gram"))
    stats.join(broadcast(top), Seq("gram"))
      .select(col("rank"), col("gram"), col("n_occurrences"),
        col("n_docs"))
  }

  /** Per-document novelty: the fraction of a document's distinct word
    * n-grams that appear in NO other document — the inverse signal of
    * boilerplate/near-dup coverage (low novelty → the document is mostly
    * assembled from corpus-common text; a training-data pruning signal
    * complementary to [[Dedup]]'s pair detection, which only fires on
    * concentrated overlap with a single partner). Documents with no
    * tokens report 0 novelty and 0 grams.
    *
    * Shape at scale: distinct (doc, gram) pairs → one map-side-combined
    * groupBy(gram) for document frequency → per-doc ratio of df=1 grams;
    * the same two-shuffle plan family as TF-IDF, shuffling only hashes
    * and counts — never text — after the first projection. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(col(idCol).as("doc_id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .where(length(col("gram")) > 0)
      .distinct()
    val dfreq = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
    val perDoc = grams.join(dfreq, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        round(when(col("n_grams").isNull, lit(0.0))
          .otherwise(col("n_unique").cast("double") / col("n_grams")), 4)
          .as("novelty"))
  }

  /** Cross-source n-gram overlap matrix: for every unordered pair of
    * sources, the Jaccard similarity of their distinct word-n-gram sets —
    * the corpus-composition report that surfaces mirror/scrape overlap
    * between ingestion sources (near-identical sources inflate effective
    * epochs) and cross-source contamination before a mixture is planned.
    *
    * Shape at scale: one scan → distinct (source, gram) — map-side
    * combined — then a gram-keyed self-join whose per-gram fan-out is
    * bounded by the SOURCE count (tens), not the corpus; the result
    * aggregates to K² rows. Pair completeness (zero-overlap pairs
    * included) comes from a K-row×K-row broadcast cross of the size
    * frames. With thousands of sources, swap the exact gram sets for the
    * per-source MinHash signatures ([[Dedup.minhashBandBuckets]]) — same
    * report, sketched.
    *
    * `jaccard` is emitted as the RAW double quotient of two exact counts
    * (one correctly-rounded IEEE divide) — bit-identical on any engine,
    * no rounding step to disagree on. */
  def sourceOverlap(df: DataFrame, sourceCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = df.select(col(sourceCol).as("source"),
        explode(Dedup.wordShingles(col(textCol), n)).as("gram"))
      .where(length(col("gram")) > 0)
      .distinct()
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = grams.select(col("gram"), col("source").as("source_a"))
      .join(grams.select(col("gram"), col("source").as("source_b")),
        Seq("gram"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    val pairs = broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("n_a")))
      .crossJoin(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("n_b"))))
      .where(col("source_a") < col("source_b"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_common"), lit(0L))))
          .as("jaccard"))
  }

  /** Self-trained bigram language-model quality score — the CCNet /
    * perplexity-filter family: documents whose token transitions are
    * improbable under the corpus's own bigram statistics (gibberish,
    * boilerplate soup, wrong-language fragments) score low and are
    * pruned or bucketed before training. Per document: the mean add-one-
    * smoothed conditional log-probability of its bigrams,
    * `mean(ln((c(w1,w2)+1) / (c(w1,·)+V)))` with V = corpus distinct
    * token count.
    *
    * Scale shape: the corpus scans once into an exploded (doc, w1,
    * bigram) table; bigram and context counts are map-side-combined
    * groupBys over it, and scoring joins the exploded table back on
    * those SHUFFLE-keyed count tables — the vocabulary is never
    * broadcast and never driver-collected (a 100 TB corpus has billions
    * of bigrams; both count tables are reusable artifacts a pipeline
    * persists). V attaches as a one-row broadcast frame.
    *
    * Determinism: each bigram's log-term is rounded to 6 decimals and
    * exact-summed in DECIMAL(18,6) before the final division, so the
    * per-document mean does not depend on float reduction order.
    * Documents with fewer than 2 tokens have no bigrams: n_bigrams 0,
    * null score. */
  def bigramLmScore(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scoreWithBigramLm(trainBigramLm(df, textCol), df, idCol, textCol)

  /** A trained bigram LM: the two count tables plus the vocab-size frame.
    * These are the PERSISTABLE artifacts of the pipeline — train once on
    * the reference corpus, write `bigrams`/`contexts` partitioned by
    * their key, then score any number of target corpora against them. */
  final case class BigramLm(bigrams: DataFrame, contexts: DataFrame,
      vocab: DataFrame)

  private def docBigrams(df: DataFrame, idC: Column,
      textCol: String): DataFrame =
    df.select(idC.as("doc_id"),
        Dedup.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), posexplode(
        zip_with(col("t"),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("b")))))
      .where(col("col.b").isNotNull) // zip_with pads the longer side
      .select(col("doc_id"), col("col.w1").as("w1"), col("col.b").as("b"))

  /** Train the corpus bigram statistics: bigram counts, context
    * (bigram-start) counts, and the distinct-token vocab size — two
    * map-side-combined groupBys and one count-distinct over a single
    * tokenization pass's stream. */
  def trainBigramLm(df: DataFrame, textCol: String): BigramLm = {
    val bg = docBigrams(df, lit(0L), textCol) // ids irrelevant to counts
    BigramLm(
      bigrams = bg.groupBy(col("b")).agg(count(lit(1)).as("cb")),
      contexts = bg.groupBy(col("w1")).agg(count(lit(1)).as("cw")),
      vocab = df.select(explode(Dedup.tokens(col(textCol))).as("tok"))
        .agg(countDistinct(col("tok")).as("v")))
  }

  /** Score a (possibly different) corpus under a trained model — the
    * held-out CCNet shape: train on the trusted corpus, score the crawl.
    * Bigrams/contexts the model never saw contribute the smoothed floor
    * `ln(1 / (cw + V))` with cw = 0 (left joins + coalesce), so unseen
    * text scores LOW instead of erroring or dropping rows. */
  def scoreWithBigramLm(model: BigramLm, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bg = docBigrams(df, col(idCol), textCol)
    val scored = bg
      .join(model.bigrams, Seq("b"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("doc_id"),
        round(log((coalesce(col("cb"), lit(0L)) + lit(1.0)) /
          (coalesce(col("cw"), lit(0L)) + col("v"))), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round((sum(col("term")).cast("double") / count(lit(1))), 4)
          .as("mean_logprob"))
    df.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_logprob"))
  }

  /** Hashing-trick text features: each document's tokens hash into
    * `dims` buckets and the per-bucket counts are the document's sparse
    * bag-of-words vector — the vectorizer that needs NO fitted
    * vocabulary (no second pass, no dictionary broadcast), which is what
    * makes it the 100 TB featurizer. Emitted exploded as
    * (doc_id, bucket, count) — the natural sparse representation; pivot
    * downstream if a dense array is wanted. The bucket is the
    * engine-portable md5-derived hash mod dims, so external engines
    * reproduce the exact feature indices. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    df.select(col(idCol).as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("tok")), 1, 15), 16, 10)
          .cast("long"), lit(dims.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("count"))
  }

  /** Zipf-law slope per group — the corpus-health diagnostic that
    * separates natural language (slope ≈ −1 in log-log rank/frequency
    * space) from template spam, boilerplate floods, and synthetic
    * gibberish (much flatter or steeper). Fit = ordinary least squares
    * of ilog2(freq) on ilog2(rank) over the group's vocabulary.
    *
    * Exactness discipline: logs are INTEGER bit-lengths
    * (`ilog2(n) = length(bin(n)) − 1`), so all four OLS sums are exact
    * bigints and the slope is a single IEEE division of two exactly-
    * computed doubles — bit-reproducible by any engine, unlike
    * `regr_slope` over `ln()` doubles whose summation order varies.
    *
    * Shape: one token-explode groupBy (map-side combined) to the
    * (group, token, freq) vocabulary; ranks are a per-group window over
    * vocabulary rows (vocab << corpus — this never touches raw token
    * volume); the OLS reduction is one more groupBy. */
  def zipfSlope(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df
      .select(col(groupCol).as("g"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
    val rank = row_number().over(Window.partitionBy(col("g"))
      .orderBy(col("c").desc, col("tok"))).cast("long")
    val pts = freq.select(col("g"), col("c"),
      (length(bin(rank)) - 1).cast("long").as("x"),
      (length(bin(col("c"))) - 1).cast("long").as("y"))
    pts.groupBy(col("g"))
      .agg(count(lit(1)).as("n_vocab"), sum(col("c")).as("n_tokens"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("g").as(groupCol), col("n_vocab"), col("n_tokens"),
        when(col("n_vocab") * col("sxx") - col("sx") * col("sx") =!= 0,
          (col("n_vocab") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("n_vocab") * col("sxx") - col("sx") * col("sx"))
              .cast("double"))
          .as("zipf_slope"))
  }

  /** Collocation / phrase mining by exact integer lift: the top-k word
    * bigrams whose co-occurrence beats independence —
    * `lift_ppm = (n_ab · N · 10^6) div (n_a · n_b)` over corpus unigram
    * and bigram counts. The phrase detector every tokenizer-prep
    * pipeline runs ("new york" → one unit), scored WITHOUT `log()`:
    * integer arithmetic end to end, so ranking and values are
    * engine-exact. `minCount` suppresses the noise floor (a rare pair
    * seen once has huge lift and zero evidence).
    *
    * Shape: two map-side-combined groupBys (unigrams, bigrams), two
    * vocab-sized hash joins to attach endpoint counts, one bounded
    * global topk_by_score (never a global sort), then a k-row broadcast
    * join to re-attach counts to the winners. */
  def phraseLift(df: DataFrame, textCol: String, k: Int,
      minCount: Long): DataFrame = {
    val toks = df.select(explode(Dedup.tokens(col(textCol))).as("tok"))
      .truncateLineage(eager = false)
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("n1"))
    val totals = toks.agg(count(lit(1)).as("n_total"))
    val bi = df.select(
        explode(Dedup.wordShingles(col(textCol), 2)).as("gram"))
      .where(size(split(col("gram"), " ")) === 2)
      .groupBy(col("gram")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
      .select(col("gram"), col("n_ab"),
        split(col("gram"), " ").getItem(0).as("w1"),
        split(col("gram"), " ").getItem(1).as("w2"))
    val scored = bi
      .join(uni.select(col("tok").as("w1"), col("n1").as("na")),
        Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("n1").as("nb")),
        Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("gram"), col("n_ab"), col("na"), col("nb"),
        expr("(n_ab * n_total * 1000000L) div (na * nb)")
          .as("lift_ppm"))
    val top = scored
      .agg(graft.functions.GraftFunctions.topKByScore(
        col("lift_ppm").cast("double"), col("gram"), k).as("tops"))
      .select(posexplode(col("tops")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("gram"))
    scored.join(broadcast(top), Seq("gram"))
      .select(col("rank"), col("gram"), col("n_ab"), col("na"),
        col("nb"), col("lift_ppm"))
  }

  /** All signals as one struct-per-row projection. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_chars_computed", length(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("mean_token_len", meanTokenLength(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_id", languageId(t))
      .withColumn("fingerprint", fingerprint64(t))
  }

  /** First-iteration BPE merge statistics: the weighted frequency of
    * every adjacent character pair over the corpus vocabulary — the
    * table a byte-pair-encoding tokenizer trainer consults to pick its
    * next merge (Sennrich et al. 2016's counting step, as a query).
    *
    * The classic trainer trick is what makes this scale: pairs are
    * counted over the AGGREGATED vocabulary (distinct word × corpus
    * frequency), not the raw token stream — the explode runs over
    * |vocab| rows, orders of magnitude smaller than the corpus, and the
    * corpus itself is touched exactly once by the word-count
    * aggregation. Top-k by (weighted count desc, pair asc): a total
    * order, so the boundary is deterministic; the plan is a
    * TakeOrderedAndProject over the pair aggregate, never a global
    * sort. */
  def bpePairStats(docs: DataFrame, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val vocab = docs
      .select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // adjacent char pairs of each distinct word, weighted by corpus
    // freq; `w` is a plain column, so the substring lambda is cheap
    // (see the higher-order-function note on Dedup.shingles)
    vocab
      .where(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n_weighted"))
      .orderBy(col("n_weighted").desc, col("pair").asc)
      .limit(topK)
  }

  /** Gopher-style quality-rule audit (Rae et al. 2021's rule family,
    * as an exact relational report): per source, how many documents
    * violate each hygiene rule and how many pass ALL of them — the
    * go/no-go table a curation pipeline reads before mixing a source
    * in.
    *
    * Every rule is integer-exact (ratio thresholds are cross-
    * multiplied, never divided), so the audit is bit-reproducible:
    *   r1  word count in [minWords, maxWords]
    *   r2  mean word length in [3, 10] chars (3n ≤ Σlen ≤ 10n)
    *   r3  symbol characters ('#', '*') ≤ 10% of chars (10·sym ≤ chars)
    *   r4  at least 2 stopword hits ([[EnglishStopwords]])
    *   r5  digit-only words ≤ 20% of words (5·dig ≤ n)
    * One scan, one source-keyed aggregation; the token array is built
    * once per row and every rule reads it (plain column inside the
    * lambdas — cheap per the Dedup.shingles note). */
  def qualityRulesAudit(docs: DataFrame, textCol: String,
      sourceCol: String, minWords: Int = 10,
      maxWords: Int = 1000): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"),
        col(textCol).as("t"), Dedup.tokens(col(textCol)).as("tk"))
      .select(col("source"),
        length(col("t")).cast("long").as("n_chars"),
        (length(col("t")) -
          length(translate(col("t"), "#*", ""))).cast("long").as("n_sym"),
        size(col("tk")).cast("long").as("n_words"),
        expr("aggregate(tk, CAST(0 AS BIGINT), " +
          "(a, x) -> a + char_length(x))").as("sum_len"),
        size(filter(col("tk"), x => x.rlike("^[0-9]+$")))
          .cast("long").as("n_dig"),
        size(filter(col("tk"), x => x.isInCollection(EnglishStopwords)))
          .cast("long").as("n_stop"))
    val v1 = col("n_words") < minWords || col("n_words") > maxWords
    val v2 = lit(3L) * col("n_words") > col("sum_len") ||
      col("sum_len") > lit(10L) * col("n_words")
    val v3 = lit(10L) * col("n_sym") > col("n_chars")
    val v4 = col("n_stop") < 2
    val v5 = lit(5L) * col("n_dig") > col("n_words")
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        cnt(v1).as("v_wordcount"), cnt(v2).as("v_meanwordlen"),
        cnt(v3).as("v_symbols"), cnt(v4).as("v_stopwords"),
        cnt(v5).as("v_numeric"),
        cnt(!v1 && !v2 && !v3 && !v4 && !v5).as("n_pass"))
  }

  /** Readability-input report per source: the exact integer sums behind
    * Flesch reading-ease / Flesch–Kincaid grade (words, sentences,
    * syllables, polysyllabic "complex" words à la Gunning fog). The
    * formulas themselves are ratios of these sums — left to the reader
    * so the report is bit-reproducible.
    *
    * Syllables use the standard corpus-scale approximation: maximal
    * vowel runs ([aeiouy]+) per word — counted on the lowercased whole
    * text, which equals the per-word sum because whitespace breaks any
    * run. Sentences = maximal [.!?]+ runs. Complex words = tokens with
    * ≥ 3 vowel runs. One scan, one source-keyed aggregation; every
    * count is a plain long so partial aggregation is exact in any
    * order. */
  def readabilityReport(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val base = docs.select(col(sourceCol).as("source"),
        col(textCol).as("t"), Dedup.tokens(col(textCol)).as("tk"))
      .select(col("source"),
        size(col("tk")).cast("long").as("n_words"),
        regexp_count(col("t"), lit("[.!?]+")).cast("long")
          .as("n_sentences"),
        regexp_count(lower(col("t")), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"),
        size(filter(col("tk"),
          w => regexp_count(w, lit("[aeiouy]+")) >= 3))
          .cast("long").as("n_complex"))
    base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_sentences")).as("n_sentences"),
        sum(col("n_syllables")).as("n_syllables"),
        sum(col("n_complex")).as("n_complex"))
  }

  /** Heaps'-law vocabulary growth curve: for each literal prefix
    * boundary b (documents ordered by id), the exact token occurrences
    * and DISTINCT vocabulary seen in documents with id < b — the
    * "does the corpus still teach new words" curve that sizes
    * tokenizer vocabularies and diminishing-returns cutoffs.
    *
    * Two passes, both keyed: token first-occurrence (groupBy token,
    * min doc id) and per-doc token counts — then every boundary is a
    * conditional sum over those aggregated frames in ONE aggregate
    * each (a column per boundary, melted with stack; the q246
    * no-row-multiplication pattern). Boundaries are literals, so the
    * curve never sorts or windows anything globally. */
  def vocabGrowthCurve(docs: DataFrame, idCol: String, textCol: String,
      boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty, "need at least one boundary")
    val toks = docs.select(col(idCol).cast("long").as("id"),
        explode(Dedup.tokens(col(textCol))).as("tok"))
      .where(col("id").isNotNull)
    val firstOcc = toks.groupBy(col("tok"))
      .agg(min(col("id")).as("first_id"))
    val perDoc = toks.groupBy(col("id"))
      .agg(count(lit(1)).as("n_tok"))
    def melt(df: DataFrame, valueOf: Long => Column,
        outName: String): DataFrame = {
      val aggs = boundaries.zipWithIndex.map { case (b, i) =>
        valueOf(b).as(s"__b$i")
      }
      val stackArgs = boundaries.zipWithIndex
        .map { case (b, i) => s"${b}L, __b$i" }.mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .select(expr(s"stack(${boundaries.size}, $stackArgs) " +
          s"AS (prefix_docs, $outName)"))
    }
    val vocab = melt(firstOcc,
      b => coalesce(sum(when(col("first_id") < b, 1L).otherwise(0L)),
        lit(0L)), "vocab")
    val occ = melt(perDoc,
      b => coalesce(sum(when(col("id") < b, col("n_tok")).otherwise(0L)),
        lit(0L)), "n_token_occurrences")
    occ.join(vocab, Seq("prefix_docs"))
      .select(col("prefix_docs"), col("n_token_occurrences"),
        col("vocab"))
  }

  /** URL canonicalization — the C4/CommonCrawl dedup key: lowercase the
    * scheme://host[:port] prefix, drop default ports (:80/:443), strip
    * the fragment, strip utm_* tracking parameters (with separator
    * cleanup), drop a trailing "?" and collapse a trailing slash on a
    * bare path. Pure codegen'd regexp/string expressions — no UDF. */
  def canonicalizeUrl(url: Column): Column = {
    // strip fragment first (everything after #)
    val noFrag = regexp_replace(url, "#.*$", "")
    // drop utm_* params wherever they sit; then tidy separators
    val noUtm = regexp_replace(noFrag, "[?&]utm_[^&#]*", "?")
    val tidy0 = regexp_replace(noUtm, "\\?[?&]*", "?")
    val tidy1 = regexp_replace(tidy0, "[?&]+$", "")
    // lowercase the scheme://host[:port] prefix, drop default ports
    val pfx = regexp_extract(tidy1, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = substring(tidy1, length(pfx) + 1, lit(1000000))
    val canonPfx = regexp_replace(lower(pfx), ":(80|443)$", "")
    // bare "/" path with no query collapses to the host itself
    val canonRest = when(rest === "/", lit("")).otherwise(rest)
    when(pfx === "", tidy1)
      .otherwise(concat(canonPfx, canonRest))
  }

  /** Extended PII audit with CHECKSUM validation — the step beyond the
    * regex-only q36 family: card-number candidates (16 contiguous
    * digits) are split into Luhn-valid and Luhn-invalid (mod-10
    * checksum, the validation every real PII scrubber runs to keep the
    * false-positive rate of "any 16 digits" usable), plus NANP-style
    * phone numbers and IPv4 literals split into syntactic candidates vs
    * octet-valid addresses.
    *
    * Everything is per-row projection — regexp_extract_all plus a
    * per-candidate Luhn fold (interpreted HOF over the handful of
    * candidates a document carries, never over tokens) — so the
    * operator is one scan, zero shuffles, and every count is an exact
    * integer an external engine reproduces from the same regexes and
    * checksum arithmetic. */
  def piiAuditExtended(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__cards",
        expr("regexp_extract_all(__t, '\\\\b[0-9]{16}\\\\b', 0)"))
    // Luhn mod-10: digits at odd distance from the RIGHT (position i
    // with (16 - i) odd) double, 9-subtract on overflow
    val luhn = base.withColumn("__sums", expr(
      """transform(__cards, s -> aggregate(sequence(1, 16), 0,
        |(acc, i) -> acc + (CASE WHEN pmod(16 - i, 2) = 1
        |  THEN (CASE WHEN 2 * CAST(substring(s, i, 1) AS INT) > 9
        |    THEN 2 * CAST(substring(s, i, 1) AS INT) - 9
        |    ELSE 2 * CAST(substring(s, i, 1) AS INT) END)
        |  ELSE CAST(substring(s, i, 1) AS INT) END)))""".stripMargin
        .replace("\n", " ")))
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    luhn.select(col("doc_id"),
      size(col("__cards")).cast("long").as("n_card_candidates"),
      expr("size(filter(__sums, x -> pmod(x, 10) = 0))").cast("long")
        .as("n_card_valid"),
      expr("size(regexp_extract_all(__t, " +
        "'\\\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}', 0))").cast("long")
        .as("n_phone"),
      expr("size(regexp_extract_all(__t, " +
        "'\\\\b([0-9]{1,3}\\\\.){3}[0-9]{1,3}\\\\b', 0))").cast("long")
        .as("n_ip_candidates"),
      size(regexp_extract_all(col("__t"),
        lit(s"\\b($octet\\.){3}$octet\\b"), lit(0))).cast("long")
        .as("n_ip_valid"))
  }

  /** Hashing-trick linear text classifier INFERENCE — the fastText-style
    * quality/domain classifier every corpus-curation pipeline runs over
    * 100 TB once a small model is trained offline: features are the
    * md5-portable token hash mod `dim` (no vocabulary, no dictionary
    * broadcast — [[hashedFeatures]]' trick), the model is `weights`
    * (class × dim integer matrix) folded into the plan as literals, and
    * a document's class score is the exact integer Σ over its tokens of
    * w_class[bucket(token)] (bag-of-words, repeats count).
    *
    * Output: (doc_id, best_class, score_best, margin) — argmax with
    * ties to the LOWEST class id, margin = best − runner-up (the
    * confidence gate: route low-margin docs to review / higher-cost
    * scoring). One scan, zero shuffles, fully replayable by any engine
    * with md5. */
  def hashingTrickClassifier(df: DataFrame, idCol: String,
      textCol: String, weights: Seq[Seq[Long]]): DataFrame = {
    require(weights.nonEmpty && weights.map(_.size).distinct.size == 1,
      "weights must be a non-empty class x dim matrix")
    val dim = weights.head.size
    val nC = weights.size
    val b = df.select(col(idCol).as("doc_id"),
        Dedup.tokens(col(textCol)).as("__tk"))
      // bucket list bound ONCE as a named column (the interpreted-HOF
      // binding rule): nC score folds below re-read it
      .withColumn("__bk", transform(col("__tk"), t =>
        pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"),
          lit(dim.toLong)).cast("int")))
    val scoreCols = (0 until nC).map { c =>
      val w = typedLit(weights(c))
      aggregate(col("__bk"), lit(0L),
        (acc, bk) => acc + element_at(w, bk + 1)).as(s"__s$c")
    }
    val scored = b.select(col("doc_id") +: scoreCols: _*)
    val arr = array((0 until nC).map(c => col(s"__s$c")): _*)
    scored.select(col("doc_id"),
        (array_position(arr, array_max(arr)) - 1).cast("int")
          .as("best_class"),
        array_max(arr).as("score_best"),
        (array_max(arr) - element_at(reverse(array_sort(arr)),
          if (nC >= 2) 2 else 1)).as("margin"))
  }
}
