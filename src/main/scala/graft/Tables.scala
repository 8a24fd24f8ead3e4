package graft

import org.apache.spark.sql.DataFrame

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
}
