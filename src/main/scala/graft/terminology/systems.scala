package graft.terminology

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** LOINC multiaxial hierarchy reader.
  *
  * Reference: /root/reference/bunsen-spark/.../codes/systems/Loinc.java:36-59 —
  * header CSV, keep (IMMEDIATE_PARENT, CODE), drop null/empty rows.
  */
object Loinc {
  val SystemUri = "http://loinc.org"
  val HierarchyUri: String = Hierarchies.uriForName("loinc-multiaxial")

  /** Parse a LOINC multiaxial hierarchy CSV into (ancestor, descendant) rows (reference: Loinc.java). */
  def readMultiaxialHierarchyFile(spark: SparkSession,
      path: String): Dataset[HierarchicalElement] = {
    import spark.implicits._
    spark.read.option("header", "true").csv(path)
      .select(
        lit(SystemUri).as("ancestorSystem"),
        col("IMMEDIATE_PARENT").as("ancestorValue"),
        lit(SystemUri).as("descendantSystem"),
        col("CODE").as("descendantValue"))
      .where($"ancestorValue".isNotNull && $"ancestorValue" =!= "" &&
        $"descendantValue".isNotNull && $"descendantValue" =!= "")
      .as[HierarchicalElement]
  }

  /** Hierarchies with the LOINC multiaxial hierarchy appended from a CSV path. */
  def withLoincHierarchy(spark: SparkSession, hierarchies: Hierarchies,
      path: String, version: String): Hierarchies =
    hierarchies.withHierarchyElements(HierarchyUri, version,
      readMultiaxialHierarchyFile(spark, path))
}

/** SNOMED RF2 relationship reader.
  *
  * Reference: /root/reference/bunsen-spark/.../codes/systems/Snomed.java:40-66 —
  * tab-delimited, keep is-a (typeId=116680003) active rows,
  * (destinationId → sourceId) edges.
  */
object Snomed {
  val SystemUri = "http://snomed.info/sct"
  val HierarchyUri: String = Hierarchies.uriForName("snomed")
  val IsaRelationshipType = "116680003"

  /** Parse a SNOMED RF2 relationship file into active is-a (ancestor, descendant) rows (reference: Snomed.java). */
  def readRelationshipFile(spark: SparkSession,
      path: String): Dataset[HierarchicalElement] = {
    import spark.implicits._
    spark.read.option("header", "true").option("delimiter", "\t").csv(path)
      .where(col("typeId") === IsaRelationshipType && col("active") === "1")
      .select(
        lit(SystemUri).as("ancestorSystem"),
        col("destinationId").as("ancestorValue"),
        lit(SystemUri).as("descendantSystem"),
        col("sourceId").as("descendantValue"))
      .where($"ancestorValue".isNotNull && $"ancestorValue" =!= "" &&
        $"descendantValue".isNotNull && $"descendantValue" =!= "")
      .as[HierarchicalElement]
  }

  /** Hierarchies with the SNOMED is-a relationships appended from an RF2 path. */
  def withRelationships(spark: SparkSession, hierarchies: Hierarchies,
      path: String, version: String): Hierarchies =
    hierarchies.withHierarchyElements(HierarchyUri, version,
      readRelationshipFile(spark, path))
}
