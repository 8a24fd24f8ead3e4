package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout: the shuffle-you-pay-once pattern.
  *
  * A join between two 100 TB-scale tables shuffles BOTH sides on every
  * query. Writing each side `bucketBy(n, key)` pays that shuffle once at
  * write time; every subsequent equi-join (or aggregation) on the bucket
  * key reads co-located buckets and plans a SortMergeJoin with ZERO
  * shuffle exchanges — the scan itself satisfies the join's distribution
  * requirement. This is the batch analog of q65's z-order layout: layout
  * work at write time buys plan work at read time, and it is the single
  * biggest lever for a repeatedly-joined fact/dimension pair.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted by `key`.
    * The pre-write `repartition(buckets, key)` makes each write task own
    * whole buckets, so every bucket lands in ONE file — which is what
    * lets the bucketed scan also satisfy the join's SORT requirement
    * (multi-file buckets force a per-partition sort; single-file buckets
    * need none). Returns the qualified table name. */
  def writeBucketed(spark: SparkSession, df: DataFrame, database: String,
      table: String, key: String, buckets: Int): String = {
    graft.terminology.TableWrites.validateName(database)
    graft.terminology.TableWrites.validateName(table)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    graft.terminology.TableWrites.reclaimOrphanLocation(spark, database,
      table)
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(s"$database.$table")
    s"$database.$table"
  }

  /** Bucket-pruned point read: an equality filter on the bucket key scans
    * exactly ONE bucket (`SelectedBucketsCount: 1 out of n`) — the other
    * payoff of the layout: an n-fold scan cut before a single row is
    * read. Spark's `DisableUnnecessaryBucketedScan` rule would silently
    * throw this away (it re-enables plain scans whenever no downstream
    * operator needs the hash distribution, ignoring bucket PRUNING), so
    * this call turns auto-disable off for the session: the only plans it
    * can affect are bucketed scans with no interesting partition — i.e.
    * exactly the pruning case it would otherwise break. */
  def prunedPointRead(spark: SparkSession, table: String, key: String,
      value: Long): DataFrame = {
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.table(table).where(col(key) === value)
  }

  /** Equi-join two tables bucketed on `key` with matching bucket counts:
    * plans as a SortMergeJoin whose children are the bucketed scans
    * directly — no ShuffleExchange on either side (the merge hint only
    * rules out a broadcast plan so the co-location is actually
    * exercised; it adds nothing the bucketing doesn't already satisfy). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), Seq(key))
}
