package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed-table persistence for co-located joins.
  *
  * At 100 TB the biggest recurring cost of dedup/similarity pipelines is
  * re-shuffling the same corpus by the same key for every run. Writing the
  * corpus (or its shingle/embedding index) bucketed-and-sorted by that key
  * makes every subsequent equi-join/aggregation on it exchange-free: both
  * sides arrive pre-partitioned, so the sort-merge join reads buckets
  * directly (see TablesSpec, which asserts the joined plan contains no
  * shuffle exchange). */
object Tables {

  /** Persist `df` bucketed and sorted by `key` into `numBuckets` buckets
    * as a managed table. `numBuckets` should approximate the cluster's
    * target parallelism at the data's full scale. */
  def saveBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit = {
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Salted equi-join for skewed keys (when AQE's runtime skew split is
    * not available or not enough — e.g. a single hot key carrying a large
    * fraction of the fact side): the fact side gets a deterministic salt
    * in [0, saltFactor), the dimension side is replicated saltFactor
    * times, and the join runs on (key, salt) — spreading each hot key over
    * saltFactor reducers. The dimension side grows saltFactor-fold, so use
    * this for genuinely small dimensions.
    *
    * `factSaltExpr` defaults to a hash of ALL fact columns mod saltFactor
    * (uniform, deterministic, no rand() — reproducible runs). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, factSaltExpr: Option[Column] = None): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val salt = factSaltExpr.getOrElse(
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(saltFactor)))
    val saltedFact = fact.withColumn("__salt", salt)
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until saltFactor)
        .map(i => lit(i)): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered join — the runtime-filter pattern for SELECTIVE
    * joins, made explicit: when the dim side keeps few keys, most fact
    * rows can be discarded AT THE SCAN (before the join's shuffle) by a
    * Bloom membership test on the key. The filter's false positives are
    * removed by the exact join that follows, so the result is EXACTLY the
    * plain inner join (the q92 oracle is the plain SQL join) — the Bloom
    * only moves work earlier. This is what Spark's own
    * `InjectRuntimeFilter` does for some shapes; the explicit operator
    * covers the shapes it doesn't reach and makes the behavior testable.
    *
    * The filter builds with Spark's native `BloomFilterAggregate`
    * (map-side combined; bitset OR is order-independent, so the bytes
    * are deterministic) and lands in the plan as a literal via one
    * driver action — small by contract: `numBits` caps it (1 MiB
    * default), the same contract as the broadcast valueset builders.
    * At 100 TB this is the difference between shuffling the full fact
    * table and shuffling the ~selectivity fraction that can match. */
  def bloomPrefilteredJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bloomAgg = GraftShim.column(new BloomFilterAggregate(
      GraftShim.expression(xxhash64(col(dimKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bytes = dim.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val prefiltered =
      if (bytes == null) fact.where(lit(false)) // empty dim → empty join
      else fact.where(GraftShim.column(BloomFilterMightContain(
        Literal.create(bytes,
          org.apache.spark.sql.types.BinaryType),
        GraftShim.expression(xxhash64(col(factKey))))))
    // Bind each key to its own frame so a fact/dim column-name collision
    // stays unambiguous; when the key NAMES collide too, drop the dim's
    // copy (it equals the fact's by the join predicate).
    val joined = prefiltered.join(dim,
      prefiltered.col(factKey) === dim.col(dimKey))
    if (factKey == dimKey) joined.drop(dim.col(dimKey)) else joined
  }
}
