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
}
