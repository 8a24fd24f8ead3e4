package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import graft.Lineage._
import org.apache.spark.sql.functions._

/** Corpus mixture planning for training pipelines: per-source statistics
  * and deterministic sampling rates that hit a token budget under a target
  * mixture — the "data mixing" step that sits between dedup/quality
  * filtering and the actual split/packing stages (see [[Splits]] and
  * [[Packing]]).
  *
  * Scale design: one `groupBy(source)` shuffle produces the per-source
  * stats (map-side partial aggregation makes this cheap even at 100 TB —
  * the shuffled payload is one row per source, not per document); the
  * corpus totals then come from a scalar aggregate over that already-tiny
  * stats frame, attached with a broadcast cross join. No window over an
  * unpartitioned frame (a single-partition sort at scale), no second pass
  * over the documents, no driver-side collect.
  *
  * Rates are plain `double` columns rounded to 4 decimals so any engine
  * reproduces them bit-exactly (DECIMAL-vs-double reduction differences
  * stay below 1e-5 for these single-division formulas); the q48 oracle is
  * a full rows+schema+hash check. Applying a rate deterministically is
  * [[Splits.stratifiedSample]] — hash-salted, engine-portable — so the
  * plan → apply chain never touches `rand()`.
  */
object Mixing {

  /** Per-source stats: document count, total weight (e.g. token count) and
    * the source's share of the corpus total. `weight` is any non-negative
    * integral column expression (token count, char count, byte size). */
  def sourceStats(df: DataFrame, sourceCol: String,
      weight: Column): DataFrame = {
    // The stats frame is tiny (one row per source) but feeds TWO branches
    // (the totals scalar + the output crossJoin), and the branches prune
    // different columns, so their exchanges never canonicalize equal and
    // ReuseExchange cannot dedupe them — without materializing, the FULL
    // corpus scan + groupBy runs once per branch (verified on the final
    // adaptive plan: two FileScans). The lazy localCheckpoint costs one
    // extra tiny job locally and halves the corpus scans at scale — the
    // same fix as marginMining's top-k frame (r8 scale-stress commit).
    val s = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(weight.cast("long")).as("tokens"))
      .truncateLineage(eager = false)
    val totals = s.agg(sum(col("tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    s.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") /
          col("total_tokens").cast("double"), 4).as("share"),
        col("total_tokens"), col("n_sources"))
  }

  /** Sampling rate per source for a uniform target mixture under a total
    * token budget: each source gets `targetTokens / n_sources` of budget,
    * `rate = min(maxRate, budget / tokens)`. A rate above 1 means the
    * source must be upsampled (repeated epochs) to fill its slice;
    * `maxRate` bounds the epoch count so a tiny source cannot be repeated
    * without limit (the LLaMA/Gopher-style mixing cap). `expect_tokens` is
    * the resulting per-source contribution. */
  def samplingRates(df: DataFrame, sourceCol: String, weight: Column,
      targetTokens: Long, maxRate: Double = 4.0): DataFrame =
    sourceStats(df, sourceCol, weight)
      .select(col("source"), col("n_docs"), col("tokens"), col("share"),
        round(least(lit(maxRate),
          (lit(targetTokens).cast("double") / col("n_sources")) /
            col("tokens").cast("double")), 4).as("rate"))
      .withColumn("expect_tokens",
        round(col("rate") * col("tokens")).cast("long"))

  /** Temperature-based mixture (the multilingual-sampling standard): the
    * target share of source i is pᵢᵅ / Σⱼ pⱼᵅ where pᵢ is its natural
    * share — α = 1 keeps the natural mixture, α → 0 approaches uniform,
    * in between it upweights the tail without flattening the head. The
    * per-source rate is the one that hits `targetTokens · targetShare`
    * tokens, capped at `maxRate` epochs like [[samplingRates]].
    *
    * Same plan shape as [[samplingRates]]: the power/normalize math runs
    * on the one-row-per-source stats frame, with the Σ pᵅ normalizer
    * attached by a second broadcast cross join of a scalar aggregate —
    * the documents are still scanned exactly once. */
  def temperatureRates(df: DataFrame, sourceCol: String, weight: Column,
      targetTokens: Long, alpha: Double,
      maxRate: Double = 4.0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val s = sourceStats(df, sourceCol, weight)
      .withColumn("pw",
        pow(col("tokens").cast("double") /
          col("total_tokens").cast("double"), alpha))
    val z = s.agg(sum(col("pw")).as("z"))
    s.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("tokens"), col("share"),
        round(col("pw") / col("z"), 4).as("target_share"),
        round(least(lit(maxRate),
          lit(targetTokens).cast("double") * (col("pw") / col("z")) /
            col("tokens").cast("double")), 4).as("rate"))
      .withColumn("expect_tokens",
        round(col("rate") * col("tokens")).cast("long"))
  }

  /** Applies a per-source rate plan deterministically: each document is
    * emitted `floor(rate)` times, plus one more copy iff its salted
    * portable hash bucket (the [[Splits]] scheme — stable under retries,
    * re-partitioning and engines, `rand()`-free) falls below the
    * fractional part. Output rows carry an `epoch` column (0-based copy
    * index) so downstream packing/shuffling can distinguish repeats.
    *
    * Scale design: the rates frame is one row per source and broadcast;
    * the epoch fan-out is a map-side `explode(sequence(...))` — no
    * shuffle anywhere, so this composes with [[Splits.assignSplit]] and
    * [[Packing]] without adding an exchange. Rows from sources absent in
    * `rates` are dropped (rate 0). */
  def applyMixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: DataFrame, salt: String = "graft"): DataFrame = {
    val r = rates.select(col("source").as(sourceCol),
      col("rate").cast("double").as("rate"))
    val whole = floor(col("rate")).cast("int")
    val fracBuckets =
      round((col("rate") - floor(col("rate"))) * Splits.Buckets).cast("long")
    val copies = (whole +
      when(Splits.splitBucket(
        concat(col(sourceCol), lit("/"), col(idCol).cast("string")), salt)
        < fracBuckets, 1).otherwise(0)).as("copies")
    df.join(broadcast(r), Seq(sourceCol))
      .withColumn("copies", copies)
      .where(col("copies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), col("copies") - 1)))
      .drop("rate", "copies")
  }

  /** word2vec-style frequent-word subsampling audit (Mikolov et al.
    * 2013): occurrence o of token w is KEPT iff u < sqrt(t·N/f(w)),
    * u a deterministic per-occurrence hash in [0,1) — frequent tokens
    * are thinned toward sqrt(t·N/f) of their mass, rare tokens pass
    * untouched. The square root never executes: with u as the top 30
    * bits of the md5-60 (u30), the test is u30²·f·tDen < N·tNum·2⁶⁰
    * in DECIMAL(38,0) — exact integer cross-multiplication, engine-
    * portable bit-for-bit (t = tNum/tDen, default 1e-4).
    *
    * Output per source: exact occurrences, kept occurrences, kept share
    * in ppm — the corpus-thinning preview before a tokenizer run.
    * One token explode + one (token) freq join (broadcast-size vocab
    * aggregates on the build side), one 1-row total frame. */
  def wordSubsampleAudit(docs: DataFrame, idCol: String,
      sourceCol: String, textCol: String, tNum: Long = 1L,
      tDen: Long = 10000L): DataFrame = {
    require(tNum > 0 && tDen > 0, s"bad threshold $tNum/$tDen")
    val occ = docs.select(col(idCol).cast("long").as("id"),
        col(sourceCol).as("source"), col(textCol).as("t"))
      .select(col("id"), col("source"), posexplode(Dedup.tokens(col("t"))))
      .select(col("id"), col("source"), col("pos"), col("col").as("tok"))
    val freq = occ.groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val total = freq.agg(sum(col("f")).as("n_total"))
    val u30 = expr(
      """cast(conv(substring(md5(cast(concat(id, ':', pos, ':', tok)
         as binary)), 1, 15), 16, 10) as bigint) div 1073741824""")
    occ.join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("u30", u30)
      .withColumn("keep",
        (col("u30").cast("decimal(38,0)") * col("u30") * col("f") *
          lit(tDen)) <
        (col("n_total").cast("decimal(38,0)") * lit(tNum) *
          lit(1152921504606846976L))) // 2^60
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_occurrences"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_occurrences"), col("n_kept"),
        expr("n_kept * 1000000 div n_occurrences").as("kept_ppm"))
  }
}
