package graft.terminology

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** An immutable collection of FHIR-style ValueSets: a dataset of valueset
  * metadata rows plus a flattened dataset of member [[Value]]s.
  *
  * Reference: /root/reference/bunsen-spark/.../codes/base/AbstractValueSets.java
  * and bunsen-spark-stu3/.../ValueSets.java. Divergences (SURVEY §4):
  * latest-version uses `groupBy.agg(max)` instead of the RDD reduceByKey
  * detour (AbstractValueSets.java:138-163), and directory import reads in
  * parallel instead of `wholeTextFiles(path, 1)`.
  */
class ValueSets private (
    val spark: SparkSession,
    /** One row per valueset version: (url, version, experimental). The
      * reference keeps the full encoded ValueSet resource row; we keep the
      * metadata needed for the query surface and can round-trip the rest via
      * the fhir module. */
    val valueSets: DataFrame,
    val values: Dataset[Value]) {

  import spark.implicits._

  /** All value rows across the loaded value sets. */
  def getValues: Dataset[Value] = values

  /** Values of one valueset version — prunes (valueSetUri, valueSetVersion)
    * partitions when read from a table (AbstractValueSets.java:198-202). */
  def getValues(uri: String, version: String): Dataset[Value] =
    values.where($"valueSetUri" === uri && $"valueSetVersion" === version)

  /** Values for a uri→version map; implemented as a broadcast semi-join
    * against a literal dataset rather than an opaque FilterFunction
    * (AbstractValueSets.java:210-222) so Catalyst can see and prune it. */
  def getValues(versions: Map[String, String]): Dataset[Value] = {
    val wanted = versions.toSeq.toDF("valueSetUri", "valueSetVersion")
    values.join(broadcast(wanted), Seq("valueSetUri", "valueSetVersion"),
      "left_semi").as[Value]
  }

  /** Point lookup (AbstractValueSets.getValueSet :242-266). */
  def getValueSet(uri: String, version: String): Option[Row] =
    valueSets.where($"url" === uri && $"version" === version)
      .head(1).headOption

  /** Distinct (url, version) pairs of the loaded value sets. */
  def getUrlAndVersions: Dataset[UrlAndVersion] =
    valueSets.select($"url", $"version").distinct().as[UrlAndVersion]

  /** Latest version per url, optionally including experimental valuesets.
    * Experimental filter: keep when experimental is null or false
    * (AbstractValueSets.java:146-147); string-compare max. */
  def getLatestVersions(includeExperimental: Boolean): Dataset[UrlAndVersion] = {
    val filtered =
      if (includeExperimental) valueSets
      else valueSets.where(coalesce(!$"experimental", lit(true)))
    filtered.groupBy($"url").agg(max($"version").as("version"))
      .as[UrlAndVersion]
  }

  /** url -> latest version (lexicographic max, experimental filtered per flag). */
  def getLatestVersionsMap(includeExperimental: Boolean): Map[String, String] =
    getLatestVersions(includeExperimental)
      .as[(String, String)].collect().toMap

  private def hasDuplicates(newMembers: Dataset[UrlAndVersion]): Boolean =
    !TableWrites.knownEmpty(getUrlAndVersions) &&
      !getUrlAndVersions.intersect(newMembers).isEmpty

  /** Append new valuesets (metadata + values). Duplicate (url, version) is an
    * error (ValueSets.java:149-175). */
  def withValueSets(
      newValueSets: DataFrame,
      newValues: Dataset[Value]): ValueSets = {
    val newMembers = newValueSets.select($"url", $"version")
      .distinct().as[UrlAndVersion]
    // count-based dup detection within the batch (ConceptMaps.java:304-311)
    if (newValueSets.count() != newMembers.count()) {
      throw new IllegalArgumentException(
        "Cannot add multiple valuesets with the same url and version")
    }
    if (hasDuplicates(newMembers)) {
      throw new IllegalArgumentException(
        "Cannot add valuesets having duplicate url and version")
    }
    new ValueSets(spark,
      valueSets.unionByName(newValueSets, allowMissingColumns = true),
      values.union(newValues))
  }

  /** Convenience: build a valueset from explicit (system, code) pairs. */
  def withValueSet(
      uri: String,
      version: String,
      codes: Seq[(String, String)],
      experimental: Boolean = false): ValueSets = {
    val vs = Seq((uri, version, experimental))
      .toDF("url", "version", "experimental")
    val vals = codes.map { case (system, code) =>
      Value(uri, version, system, null, code)
    }.toDS()
    withValueSets(vs, vals)
  }

  /** Disjoint directory-style import: keep only (url, version) not already
    * present, via LEFT ANTI join (AbstractValueSets.java:372-387 J1). */
  def withDisjointValueSets(
      newValueSets: DataFrame,
      newValues: Dataset[Value]): ValueSets = {
    val current = getUrlAndVersions.toDF()
    val disjointVs = newValueSets
      .join(broadcast(current), Seq("url", "version"), "left_anti")
    val keep = disjointVs.select($"url".as("valueSetUri"),
      $"version".as("valueSetVersion")).distinct()
    val disjointValues = newValues
      .join(broadcast(keep), Seq("valueSetUri", "valueSetVersion"),
        "left_semi").as[Value]
    new ValueSets(spark,
      valueSets.unionByName(disjointVs, allowMissingColumns = true),
      values.union(disjointValues))
  }

  /** Persist: `db.valuesets` metadata (timestamp-stamped) + `db.values`
    * partitioned by (valueSetUri, valueSetVersion)
    * (AbstractValueSets.java:499-633, S11/S12). */
  def writeToDatabase(database: String): Unit = {
    TableWrites.validateName(database)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    val valuesTable = s"$database.${ValueSets.ValuesTable}"
    val metaTable = s"$database.${ValueSets.ValueSetsTable}"
    if (spark.catalog.tableExists(valuesTable)) {
      val stored = spark.table(valuesTable)
        .select($"valueSetUri".as("url"), $"valueSetVersion".as("version"))
        .distinct().as[UrlAndVersion]
      if (!stored.intersect(getUrlAndVersions).isEmpty) {
        throw new IllegalArgumentException(
          "Cannot write valuesets already present in the database")
      }
      TableWrites.appendAligned(spark, values.toDF(), valuesTable)
    } else {
      values.toDF().write.partitionBy("valueSetUri", "valueSetVersion")
        .format("parquet").saveAsTable(valuesTable)
    }
    val stamped = valueSets.withColumn("timestamp",
      current_timestamp().cast("timestamp"))
    if (spark.catalog.tableExists(metaTable)) {
      TableWrites.appendAligned(spark, stamped, metaTable)
    } else {
      stamped.write.partitionBy("timestamp").format("parquet")
        .saveAsTable(metaTable)
    }
  }
}

object ValueSets {
  val ValuesTable = "values"
  val ValueSetsTable = "valuesets"

  /** Metadata row columns — the queryable scalars of the full ValueSet
    * resource the reference stores (AbstractValueSets.java:242-266). */
  val MetaColumns: Seq[String] =
    Seq("url", "version", "name", "status", "experimental", "publisher",
      "date")

  /** An empty ValueSets container bound to the session. */
  def getEmpty(spark: SparkSession): ValueSets = {
    import spark.implicits._
    val emptyMeta = Seq.empty[
        (String, String, String, String, Boolean, String, String)]
      .toDF(MetaColumns: _*)
    new ValueSets(spark, emptyMeta, spark.emptyDataset[Value])
  }

  /** Load value sets persisted by [[writeToDatabase]] from the given database. */
  def getFromDatabase(spark: SparkSession, database: String): ValueSets = {
    import spark.implicits._
    val values = spark.table(s"$database.$ValuesTable").as[Value]
    // tolerant read: tables persisted before the metadata widening load
    // with nulls for the newer columns
    val meta = TableWrites.selectOrNull(
      spark.table(s"$database.$ValueSetsTable"),
      MetaColumns.map(c => c -> (if (c == "experimental") "boolean"
        else "string")))
    new ValueSets(spark, meta, values)
  }
}
