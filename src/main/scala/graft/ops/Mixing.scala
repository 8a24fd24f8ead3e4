package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val s = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(weight.cast("long")).as("tokens"))
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
}
