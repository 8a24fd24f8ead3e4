package graft.fhir

import graft.SparkSuite
import org.apache.avro.Schema
import org.apache.spark.sql.functions._

/** Avro backend: schema compile + binary and container-file round-trips
  * (the reference's AvroConverterTest matrix shape, over the shared IR). */
class FhirAvroSpec extends SparkSuite {

  private val obsJson =
    """{"resourceType":"Observation","id":"o1","status":"final",
       "code":{"coding":[{"system":"http://loinc.org","code":"8867-4",
         "display":"Heart rate"}]},
       "subject":{"reference":"Patient/p1","display":"P One"},
       "effectiveDateTime":"2020-01-02T03:04:05Z",
       "valueQuantity":{"value":74.5,"unit":"beats/min"}}"""

  private def observations = {
    import spark.implicits._
    Seq(obsJson).toDF("j")
      .select(from_json(col("j"),
        FhirSchemas.parseSchemaFor("Observation")).as("r"))
      .select(FhirSchemas.postParseTransform("Observation", col("r")).as("r"))
  }

  test("avro schema mirrors the Spark schema field-for-field") {
    val avro = FhirAvro.avroSchemaFor("Observation")
    val sparkSchema = FhirSchemas.schemaFor("Observation")
    assert(avro.getType === Schema.Type.RECORD)
    assert(avro.getFields.size === sparkSchema.fields.length)
    sparkSchema.fieldNames.foreach { n =>
      assert(avro.getField(n) != null, s"avro field $n missing")
    }
    // decimal logical type on the quantity value
    val vq = avro.getField("valueQuantity").schema().getTypes.get(1)
    val value = vq.getField("value").schema().getTypes.get(1)
    assert(value.getType === Schema.Type.BYTES)
    assert(value.getLogicalType.getName === "decimal")
    // synthetic reference ids present in the reference record
    val subj = avro.getField("subject").schema().getTypes.get(1)
    assert(subj.getField("patientId") != null)
  }

  test("binary encode/decode round-trips rows exactly") {
    val original = observations.collect()
    val roundTrip = FhirAvro.decodeColumn(
      FhirAvro.encodeColumn(observations, "r", "Observation"),
      "r", "Observation").collect()
    assert(roundTrip.toSeq === original.toSeq)
    // spot-check the payload really is Avro binary, not a passthrough
    val bytes = FhirAvro.encodeColumn(observations, "r", "Observation")
      .head().getAs[Array[Byte]]("r")
    assert(bytes.nonEmpty)
    val decoded = FhirAvro.codecFor("Observation").decode(bytes)
    assert(decoded.getAs[String]("id") === "o1")
    assert(decoded.getAs[org.apache.spark.sql.Row]("subject")
      .getAs[String]("patientId") === "p1")
    assert(decoded.getAs[org.apache.spark.sql.Row]("valueQuantity")
      .getAs[java.math.BigDecimal]("value")
      .compareTo(new java.math.BigDecimal("74.5000")) === 0)
  }

  test("container-file write/read round-trips a DataFrame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString
    FhirAvro.writeAvroFiles(observations.select("r.*"), "Observation", dir)
    assert(new java.io.File(dir).listFiles(
      (_, n) => n.endsWith(".avro")).nonEmpty)
    val back = FhirAvro.readAvroFiles(spark, "Observation", dir)
    assert(back.schema === observations.schema("r").dataType)
    val origRows = observations.select("r.*").collect().toSeq
    assert(back.collect().toSeq === origRows)
  }

  test("schema fingerprints are stable across sessions (pinned) and " +
    "record fullnames deterministic") {
    // Pinned canonical fingerprints: a change here is a WIRE FORMAT break
    // for persisted Avro payloads — deliberate schema evolution must
    // update these literals consciously, nothing else may move them.
    // (The reference pins the same contract via specific-record compile
    // equality in AvroConverterTest.testCompile.)
    assert(FhirAvro.schemaFingerprint64("Patient") === -1389798029577062611L)
    assert(FhirAvro.schemaFingerprint64("Observation") === 903068666488046307L)
    assert(FhirAvro.schemaFingerprint64("Condition") === -3912960473010098884L)
    assert(FhirAvro.schemaFingerprint64("Quantity") === -4450502070697982481L)
    // a second compile (fresh Schema objects) agrees — no object-identity
    // or insertion-order dependence
    assert(FhirAvro.schemaFingerprint64("Patient") ===
      FhirAvro.schemaFingerprint64("Patient"))
    val obs = FhirAvro.avroSchemaFor("Observation")
    assert(obs.getFullName === "graft.fhir.avro.Observation")
    assert(obs.getField("code").schema().getTypes.get(1).getFullName ===
      "graft.fhir.avro.Observation_code")
  }

  test("JSON-compiled registries drive the avro backend too") {
    val defsDir = "/root/reference/bunsen-uscore-resources-stu3/" +
      "src/main/resources/definitions"
    if (!new java.io.File(defsDir).isDirectory) cancel("definitions absent")
    val reg = StructureDefinitions.fromDirectory(defsDir).registry
    val avro = FhirAvro.avroSchemaFor("CarePlan", reg)
    assert(avro.getField("status") != null)
    assert(avro.getField("activity").schema().getTypes.get(1).getType ===
      Schema.Type.ARRAY)
  }
}
