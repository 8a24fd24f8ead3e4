package graft.fhir

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Schema-compiler + bundle-ingestion semantics, mirroring the reference's
  * SparkRowConverterTest / BundlesTest matrix (SURVEY §5) for the JSON path. */
class FhirSpec extends SparkSuite {

  test("schema: decimal(12,4), lexical dates, choice expansion") {
    val obs = FhirSchemas.schemaFor("Observation")
    val vq = obs("valueQuantity").dataType.asInstanceOf[StructType]
    assert(vq("value").dataType === DecimalType(12, 4))
    assert(obs("effectiveDateTime").dataType === StringType)
    assert(obs.fieldNames.contains("valueString")) // choice alternative
    assert(obs.fieldNames.contains("valueCodeableConcept"))
  }

  test("schema: reference gets synthetic target-type id fields") {
    val obs = FhirSchemas.schemaFor("Observation")
    val subject = obs("subject").dataType.asInstanceOf[StructType]
    assert(subject.fieldNames.toSet ===
      Set("reference", "display", "patientId", "groupId"))
  }

  test("merged parse schema has a single consistent type per field") {
    // would throw on conflict
    assert(FhirSchemas.mergedResourceParseSchema.fieldNames
      .contains("resourceType"))
  }

  private val bundleJson = Seq(
    """{"resourceType":"Bundle","type":"collection","entry":[
      {"resource":{"resourceType":"Patient","id":"p1","gender":"?",
        "name":[{"family":"Smith","given":["Ann","B"]}]}},
      {"resource":{"resourceType":"Observation","id":"o1","status":"final",
        "code":{"coding":[{"system":"http://loinc.org","code":"8867-4"}]},
        "subject":{"reference":"Patient/p1"},
        "valueQuantity":{"value":74.5,"unit":"bpm"}}},
      {"resource":{"resourceType":"Condition","id":"c1",
        "code":{"coding":[{"system":"http://snomed.info/sct","code":"44054006"}]},
        "subject":{"reference":"Patient/p1"}}}]}""")

  test("bundles: extractEntry projects typed per-resource rows") {
    import spark.implicits._
    val bundles = Bundles.fromJson(bundleJson.toDF("bundle_json"),
      "bundle_json")
    val obs = Bundles.extractEntry(spark, bundles, "Observation")
    val row = obs.collect().head
    assert(obs.count() === 1)
    assert(row.getAs[String]("id") === "o1")
    val vq = row.getAs[org.apache.spark.sql.Row]("valueQuantity")
    assert(vq.getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("74.5")) === 0)
  }

  test("bundles: synthetic patientId extracted from relative reference") {
    import spark.implicits._
    val bundles = Bundles.fromJson(bundleJson.toDF("bundle_json"),
      "bundle_json")
    val obs = Bundles.extractEntry(spark, bundles, "Observation")
    val subject = obs.collect().head
      .getAs[org.apache.spark.sql.Row]("subject")
    assert(subject.getAs[String]("reference") === "Patient/p1")
    assert(subject.getAs[String]("patientId") === "p1")
  }

  test("bundles: bound-code '?' scrubbed to null (EnumConverter semantics)") {
    import spark.implicits._
    val bundles = Bundles.fromJson(bundleJson.toDF("bundle_json"),
      "bundle_json")
    val p = Bundles.extractEntry(spark, bundles, "Patient").collect().head
    assert(p.getAs[String]("gender") === null)
    assert(p.getAs[String]("id") === "p1")
  }

  test("bundles: multi-valued elements come back as arrays") {
    import spark.implicits._
    val bundles = Bundles.fromJson(bundleJson.toDF("bundle_json"),
      "bundle_json")
    val p = Bundles.extractEntry(spark, bundles, "Patient").collect().head
    val names = p.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("name")
    assert(names.length === 1)
    assert(names.head.getAs[scala.collection.Seq[String]]("given") ===
      Seq("Ann", "B"))
  }

  test("bundles: saveAsDatabase writes one table per resource type") {
    import spark.implicits._
    // clear any stale warehouse left by a previous JVM (the in-memory
    // catalog is fresh but the filesystem location persists)
    spark.sql("DROP DATABASE IF EXISTS fhir_test CASCADE")
    val wh = new java.io.File("spark-warehouse/fhir_test.db")
    if (wh.exists()) {
      import scala.reflect.io.Directory
      new Directory(wh).deleteRecursively()
    }
    val bundles = Bundles.fromJson(bundleJson.toDF("bundle_json"),
      "bundle_json")
    Bundles.saveAsDatabase(spark, bundles, "fhir_test",
      Seq("Patient", "Observation", "Condition"))
    assert(spark.table("fhir_test.observation").count() === 1)
    assert(spark.table("fhir_test.patient").count() === 1)
    assert(spark.table("fhir_test.condition").count() === 1)
  }

  test("toJson round-trips non-null fields") {
    import spark.implicits._
    val bundles = Bundles.fromJson(bundleJson.toDF("bundle_json"),
      "bundle_json")
    val obs = Bundles.extractEntry(spark, bundles, "Observation")
    val json = Bundles.toJson(obs, "Observation").as[String].collect().head
    assert(json.contains(""""id":"o1""""))
    assert(json.contains(""""code":"8867-4""""))
    assert(!json.contains("valueString")) // nulls dropped
  }

  test("flagship entry() flow returns heart-rate rows") {
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[String]("patient_id")).sorted === Array("p1", "p2"))
  }
}
