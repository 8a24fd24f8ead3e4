package graft.fhir

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Pins the semantics of the FHIR-under-the-oracle queries (q82/q83/q84)
  * beyond the DuckDB hash compare: the scrub/hoist/synthesis behaviors
  * they exist to exercise, and JSON⇄XML ingestion equivalence.
  */
class FhirOracleQueriesSpec extends SparkSuite {

  private lazy val q82 =
    SparkEntry.queries("q82_fhir_patient_bundles")(spark, sfDir)
  private lazy val q83 =
    SparkEntry.queries("q83_fhir_obs_roundtrip")(spark, sfDir)
  private lazy val q84 =
    SparkEntry.queries("q84_fhir_xml_ingest")(spark, sfDir)

  test("q82: bound-code '?' scrubs to null for gender AND the hoisted " +
    "birthSex extension") {
    // c_custkey % 3 == 2 rows carry "?" in both slots
    val scrubbed = q82.where(expr("CAST(substr(patient_id, 2) AS BIGINT) " +
      "% 3 = 2"))
    assert(scrubbed.count() > 0)
    assert(scrubbed.where(col("gender").isNotNull ||
      col("birth_sex").isNotNull).count() == 0)
    // and the non-"?" rows survive untouched
    val male = q82.where(expr("CAST(substr(patient_id, 2) AS BIGINT) " +
      "% 3 = 0"))
    assert(male.where(col("gender") =!= "male" ||
      col("birth_sex") =!= "M").count() == 0)
  }

  test("q82: one row per customer with nested name fields flattened") {
    val n = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(q82.count() == n)
    val r = q82.where(col("patient_id") === "p1").head()
    assert(r.getAs[String]("family_name").startsWith("Customer#"))
    assert(r.getAs[String]("given_name") != null)
  }

  test("q83: relative-reference patientId synthesis survives the " +
    "toJson → re-ingest round trip") {
    val bad = q83.where(col("patient_id").isNull ||
      concat(lit("Patient/"), col("patient_id")) =!= col("subject_ref"))
    assert(bad.count() == 0)
    assert(q83.count() ==
      spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("q84: XML ingestion produces exactly the JSON-path rows") {
    val fromJson = q82.select("patient_id", "gender", "birth_date",
      "family_name", "given_name")
    assert(q84.exceptAll(fromJson).isEmpty && fromJson.exceptAll(q84).isEmpty)
  }
}
