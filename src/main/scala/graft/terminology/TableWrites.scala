package graft.terminology

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Append helper for the partitioned terminology tables.
  *
  * `insertInto` matches columns POSITIONALLY, while
  * `partitionBy(...).saveAsTable(...)` moves the partition columns to the
  * END of the catalog schema — so appending a case-class-ordered DataFrame
  * (partition keys first) silently rotates every value into the wrong
  * column. All columns are strings, so nothing fails: the table is just
  * corrupt. Reference semantics (S11, AbstractValueSets.java:620-633) write
  * through explicit column-ordered SQL DDL and avoid this; we align the
  * DataFrame to the live catalog schema before every insert instead.
  */
private[graft] object TableWrites {

  /** Database/table-name guard before SQL interpolation — the reference
    * enforces the same shape with a regex plus a ';' check
    * (AbstractValueSets.createValuesTable :569-610 TABLE_NAME_PATTERN). */
  def validateName(name: String): String = {
    require(name != null && name.matches("[A-Za-z0-9_]+"),
      s"Invalid database/table name: $name")
    name
  }

  /** True when the optimizer can PROVE `ds` is empty (it folds to an
    * empty LocalRelation via empty-relation propagation). Lets the
    * duplicate-membership checks skip their intersect job on a fresh
    * collection — the `getEmpty(...).with...` flow every import starts
    * from — without weakening the check anywhere it could matter. */
  def knownEmpty(ds: org.apache.spark.sql.Dataset[_]): Boolean =
    ds.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.isEmpty
      case _ => false
    }

  /** Select `cols` (name → SQL type), substituting typed nulls for columns
    * absent from `df` — so metadata tables written before the schema gained
    * name/status/publisher/date still load instead of failing analysis. */
  def selectOrNull(df: DataFrame, cols: Seq[(String, String)]): DataFrame =
    df.select(cols.map { case (c, t) =>
      if (df.columns.contains(c)) col(c) else lit(null).cast(t).as(c)
    }: _*)

  /** Delete a managed-table LOCATION that outlived its catalog entry —
    * the in-memory catalog dies with the session, the warehouse
    * directory does not, and the next `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS. Only acts when the catalog has NO such
    * table, so a live table's data is never touched. */
  def reclaimOrphanLocation(spark: SparkSession, database: String,
      table: String): Unit =
    if (!spark.catalog.tableExists(s"$database.$table")) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"${database.toLowerCase}.db/${table.toLowerCase}")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) { fs.delete(loc, true); () }
    }

  /** Append `df` to `table` with columns aligned to the table's schema order. */
  def appendAligned(spark: SparkSession, df: DataFrame, table: String): Unit = {
    val catalogOrder = spark.table(table).columns
    df.select(catalogOrder.map(col).toSeq: _*)
      .write.mode(SaveMode.Append).format("parquet").insertInto(table)
  }
}
