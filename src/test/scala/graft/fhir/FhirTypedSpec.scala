package graft.fhir

import graft.SparkSuite

/** Typed Dataset[T] surface: the case classes must resolve by name
  * against every column the schema compiler emits (this spec is the
  * drift alarm between `model` and `FhirSchemas`), and typed lambdas
  * must see the post-parse transform results (scrubbed codes, synthetic
  * reference ids, hoisted extensions).
  */
class FhirTypedSpec extends SparkSuite {

  private lazy val bundles = {
    import spark.implicits._
    Seq(
      """{"resourceType":"Bundle","type":"collection","entry":[
        {"resource":{"resourceType":"Patient","id":"p1","gender":"female",
          "birthDate":"1980-04-01","active":true,
          "name":[{"family":"Hart","given":["Ada","Jo"]}],
          "extension":[{"url":"http://hl7.org/fhir/us/core/StructureDefinition/us-core-birthsex","valueCode":"F"}]}},
        {"resource":{"resourceType":"Patient","id":"p2","gender":"?"}},
        {"resource":{"resourceType":"Observation","id":"o1","status":"final",
          "code":{"coding":[{"system":"http://loinc.org","code":"8867-4"}]},
          "subject":{"reference":"Patient/p1"},
          "valueQuantity":{"value":74.5,"unit":"beats/min"}}},
        {"resource":{"resourceType":"Condition","id":"c1",
          "clinicalStatus":"active","subject":{"reference":"Patient/p2"},
          "onsetDateTime":"2020-01-02"}}]}"""
    ).toDF("bundle_json")
  }

  test("patients: typed extraction with scrub, hoist, and nested names") {
    val ps = model.patients(spark, bundles)
    val byId = ps.collect().map(p => p.id -> p).toMap
    assert(byId.keySet === Set("p1", "p2"))
    val p1 = byId("p1")
    assert(p1.gender === "female" && p1.active === Some(true))
    assert(p1.name.head.family === "Hart")
    assert(p1.name.head.given === Seq("Ada", "Jo"))
    assert(p1.birthSex === "F")
    assert(byId("p2").gender === null) // "?" scrubbed before the encoder
  }

  test("observations: synthetic patientId and decimal Quantity survive " +
    "the typed view; typed lambdas compose") {
    val obs = model.observations(spark, bundles)
    val o1 = obs.filter(_.status == "final").collect().head
    assert(o1.subject.patientId === "p1")
    assert(o1.valueQuantity.value ===
      new java.math.BigDecimal("74.5000")) // decimal(12,4) scale kept
    assert(o1.code.coding.head.code === "8867-4")
    // typed groupByKey runs on the same plan
    import spark.implicits._
    val n = obs.groupByKey(_.subject.patientId).count().collect().toMap
    assert(n === Map("p1" -> 1L))
  }

  test("conditions: single-target reference shape") {
    val c = model.conditions(spark, bundles).collect().head
    assert(c.id === "c1" && c.subject.patientId === "p2")
    assert(c.onsetDateTime === "2020-01-02")
  }
}
