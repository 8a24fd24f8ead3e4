package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: fold an upsert/delete change log into
  * a base snapshot — the MERGE INTO of every lakehouse ingestion path
  * (Debezium/CDC feeds, dimension refreshes, GDPR deletes), as a plain
  * deterministic batch operator.
  *
  * Semantics (standard last-writer-wins MERGE):
  *   - a key only in the base survives unchanged;
  *   - a key whose LATEST change is an upsert takes the change's value
  *     (whether or not the key existed — upsert = update + insert);
  *   - a key whose latest change is a delete is dropped.
  *
  * Shape at scale: the log collapses FIRST (per-key latest via a window
  * over the log only — the log is the small, recent side; the base is
  * never windowed), then ONE outer join on the key against the snapshot.
  * At 100 TB the base side stays partition-pruned/bucketed on the key and
  * only the collapsed log shuffles.
  */
object Cdc {

  /** `base(key, value)` ⊕ `log(key, op, value, ts, tie)` → next snapshot
    * `(key, value, origin)` with origin ∈ base|upsert.
    * `opCol` values: "D" deletes; anything else upserts. `tieCol` breaks
    * equal-timestamp changes (latest (ts, tie) wins, both compared
    * ascending). */
  def applyLog(base: DataFrame, keyCol: String, valueCol: String,
      log: DataFrame, logKeyCol: String, opCol: String,
      logValueCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val latest = log
      .select(col(logKeyCol).as("__k"), col(opCol).as("__op"),
        col(logValueCol).as("__v"), col(tsCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__k"), col("__op"), col("__v"))
    base.select(col(keyCol).as("key"), col(valueCol).as("__bv"))
      .join(latest, col("key") === col("__k"), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(coalesce(col("key"), col("__k")).as("key"),
        when(col("__op").isNotNull, col("__v")).otherwise(col("__bv"))
          .as("value"),
        when(col("__op").isNotNull, lit("upsert")).otherwise(lit("base"))
          .as("origin"))
  }
}
