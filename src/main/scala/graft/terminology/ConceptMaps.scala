package graft.terminology

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** An immutable collection of FHIR-style ConceptMaps: metadata rows plus a
  * flattened dataset of [[Mapping]]s.
  *
  * Reference: /root/reference/bunsen-spark/.../codes/base/AbstractConceptMaps.java
  * and bunsen-spark-stu3/.../ConceptMaps.java. Latest-version computed with
  * `groupBy.agg(max)` (string compare) instead of the reference's RDD
  * reduceByKey detour (AbstractConceptMaps.java:469-492).
  */
class ConceptMaps private (
    val spark: SparkSession,
    /** One row per concept map version: (url, version, source, target,
      * experimental). */
    val conceptMaps: DataFrame,
    val mappings: Dataset[Mapping]) {

  import spark.implicits._

  /** All mapping rows (system/value -> system/value pairs per map version). */
  def getMappings: Dataset[Mapping] = mappings

  /** Mappings of one map version (partition-pruned when table-backed;
    * AbstractConceptMaps.java:406-410). */
  def getMappings(uri: String, version: String): Dataset[Mapping] =
    mappings.where($"conceptMapUri" === uri && $"conceptMapVersion" === version)

  /** Mappings for a uri→version map, as a broadcast semi-join
    * (AbstractConceptMaps.java:418-430 P3, made Catalyst-visible). */
  def getMappings(versions: Map[String, String]): Dataset[Mapping] = {
    val wanted = versions.toSeq.toDF("conceptMapUri", "conceptMapVersion")
    mappings.join(broadcast(wanted),
      Seq("conceptMapUri", "conceptMapVersion"), "left_semi").as[Mapping]
  }

  /** Point lookup (AbstractConceptMaps.getConceptMap :350-375). */
  def getConceptMap(uri: String, version: String): Option[Row] =
    conceptMaps.where($"url" === uri && $"version" === version)
      .head(1).headOption

  /** Distinct (url, version) pairs of the loaded concept maps. */
  def getUrlAndVersions: Dataset[UrlAndVersion] =
    conceptMaps.select($"url", $"version").distinct().as[UrlAndVersion]

  /** Latest version per url; experimental rows kept only when included
    * (AbstractConceptMaps.java:469-492). */
  def getLatestVersions(includeExperimental: Boolean): Dataset[UrlAndVersion] = {
    val filtered =
      if (includeExperimental) conceptMaps
      else conceptMaps.where(coalesce(!$"experimental", lit(true)))
    filtered.groupBy($"url").agg(max($"version").as("version"))
      .as[UrlAndVersion]
  }

  /** url -> latest version (lexicographic max, experimental filtered per flag). */
  def getLatestVersionsMap(includeExperimental: Boolean): Map[String, String] =
    getLatestVersions(includeExperimental).as[(String, String)].collect().toMap

  private def hasDuplicates(newMembers: Dataset[UrlAndVersion]): Boolean =
    !TableWrites.knownEmpty(getUrlAndVersions) &&
      !getUrlAndVersions.intersect(newMembers).isEmpty

  /** Append new concept maps. Duplicates are an error
    * (ConceptMaps.withConceptMaps :304-311). */
  def withConceptMaps(
      newMaps: DataFrame,
      newMappings: Dataset[Mapping]): ConceptMaps = {
    val newMembers = newMaps.select($"url", $"version")
      .distinct().as[UrlAndVersion]
    if (newMaps.count() != newMembers.count()) {
      throw new IllegalArgumentException(
        "Cannot add multiple concept maps with the same url and version")
    }
    if (hasDuplicates(newMembers)) {
      throw new IllegalArgumentException(
        "Cannot add concept maps having duplicate url and version")
    }
    new ConceptMaps(spark,
      conceptMaps.unionByName(newMaps, allowMissingColumns = true),
      mappings.union(newMappings))
  }

  /** Convenience: one map from (sourceSystem, sourceValue, targetSystem,
    * targetValue, equivalence) tuples. */
  def withConceptMap(
      uri: String,
      version: String,
      entries: Seq[(String, String, String, String, String)],
      source: String = null,
      target: String = null,
      experimental: Boolean = false): ConceptMaps = {
    val meta = Seq((uri, version, source, target, experimental))
      .toDF("url", "version", "source", "target", "experimental")
    val maps = entries.map { case (ss, sv, ts, tv, eq) =>
      Mapping(uri, version, source, target, ss, sv, ts, tv, eq)
    }.toDS()
    withConceptMaps(meta, maps)
  }

  /** Disjoint import via LEFT ANTI join (AbstractConceptMaps.java:220-234). */
  def withDisjointConceptMaps(
      newMaps: DataFrame,
      newMappings: Dataset[Mapping]): ConceptMaps = {
    val current = getUrlAndVersions.toDF()
    val disjoint = newMaps
      .join(broadcast(current), Seq("url", "version"), "left_anti")
    val keep = disjoint.select($"url".as("conceptMapUri"),
      $"version".as("conceptMapVersion")).distinct()
    val keepMappings = newMappings
      .join(broadcast(keep), Seq("conceptMapUri", "conceptMapVersion"),
        "left_semi").as[Mapping]
    new ConceptMaps(spark,
      conceptMaps.unionByName(disjoint, allowMissingColumns = true),
      mappings.union(keepMappings))
  }

  /** Persist to `db.mappings` partitioned by (conceptMapUri,
    * conceptMapVersion) + timestamped `db.conceptmaps` metadata
    * (AbstractConceptMaps.java:515-678). */
  def writeToDatabase(database: String): Unit = {
    TableWrites.validateName(database)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    val mappingsTable = s"$database.${ConceptMaps.MappingsTable}"
    val metaTable = s"$database.${ConceptMaps.ConceptMapsTable}"
    if (spark.catalog.tableExists(mappingsTable)) {
      val stored = spark.table(mappingsTable)
        .select($"conceptMapUri".as("url"),
          $"conceptMapVersion".as("version"))
        .distinct().as[UrlAndVersion]
      if (!stored.intersect(getUrlAndVersions).isEmpty) {
        throw new IllegalArgumentException(
          "Cannot write concept maps already present in the database")
      }
      TableWrites.appendAligned(spark, mappings.toDF(), mappingsTable)
    } else {
      mappings.toDF().write
        .partitionBy("conceptMapUri", "conceptMapVersion")
        .format("parquet").saveAsTable(mappingsTable)
    }
    val stamped = conceptMaps.withColumn("timestamp",
      current_timestamp().cast("timestamp"))
    if (spark.catalog.tableExists(metaTable)) {
      TableWrites.appendAligned(spark, stamped, metaTable)
    } else {
      stamped.write.partitionBy("timestamp").format("parquet")
        .saveAsTable(metaTable)
    }
  }
}

object ConceptMaps {
  val MappingsTable = "mappings"
  val ConceptMapsTable = "conceptmaps"

  /** Metadata row columns — the queryable scalars of the full ConceptMap
    * resource the reference stores (AbstractConceptMaps.java:350-375). */
  val MetaColumns: Seq[String] =
    Seq("url", "version", "name", "status", "source", "target",
      "experimental", "publisher", "date")

  /** An empty ConceptMaps container bound to the session. */
  def getEmpty(spark: SparkSession): ConceptMaps = {
    import spark.implicits._
    val emptyMeta = Seq.empty[(String, String, String, String, String,
        String, Boolean, String, String)]
      .toDF(MetaColumns: _*)
    new ConceptMaps(spark, emptyMeta, spark.emptyDataset[Mapping])
  }

  /** Load concept maps persisted by [[writeToDatabase]] from the given database. */
  def getFromDatabase(spark: SparkSession, database: String): ConceptMaps = {
    import spark.implicits._
    val mappings = spark.table(s"$database.$MappingsTable").as[Mapping]
    // tolerant read: tables persisted before the metadata widening load
    // with nulls for the newer columns
    val meta = TableWrites.selectOrNull(
      spark.table(s"$database.$ConceptMapsTable"),
      MetaColumns.map(c => c -> (if (c == "experimental") "boolean"
        else "string")))
    new ConceptMaps(spark, meta, mappings)
  }
}
