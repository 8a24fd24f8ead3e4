package graft.fhir

import graft.SparkSuite
import org.apache.spark.sql.types._

/** Specific-record codegen analog (reference AvroConverterTest.testCompile,
  * bunsen-avro/.../AvroConverterTest.java:434): generated case-class
  * source must COMPILE (ToolBox, same scalac as the build) and the
  * encoder schema derived from the compiled classes must match the
  * schema compiler's StructType field-for-field — for the hand DSL and
  * for JSON-compiled US-Core profiles alike. */
class FhirCodegenSpec extends SparkSuite {

  // tb.define promotes the generated classes to TOP-LEVEL symbols (block-
  // local classes have no TypeTags, so Encoders.product would not resolve)
  private def defineAll(src: String): (scala.tools.reflect.ToolBox[
      scala.reflect.runtime.universe.type], String) = {
    import scala.tools.reflect.ToolBox
    val tb = scala.reflect.runtime.currentMirror.mkToolBox()
    val sym = tb.define(tb.parse(s"object Gen {\n$src\n}")
      .asInstanceOf[tb.u.ImplDef])
    (tb, sym.fullName)
  }

  // Spark's encoder reflection resolves classes through the thread
  // context classloader; the generated classes live in the toolbox's —
  // run `body` with the context pointed there (exactly what a cluster
  // does for classes shipped in the application jar).
  private def withLoader[T](cl: ClassLoader)(body: => T): T = {
    val prev = Thread.currentThread().getContextClassLoader
    Thread.currentThread().setContextClassLoader(cl)
    try body finally Thread.currentThread().setContextClassLoader(prev)
  }

  private def loaderOf(tb: scala.tools.reflect.ToolBox[
      scala.reflect.runtime.universe.type], owner: String,
      root: String): ClassLoader =
    tb.eval(tb.parse(s"classOf[$owner.$root].getClassLoader"))
      .asInstanceOf[ClassLoader]

  private def compileAndSchema(src: String, root: String): StructType = {
    val (tb, owner) = defineAll(src)
    withLoader(loaderOf(tb, owner, root)) {
      tb.eval(tb.parse(
        s"org.apache.spark.sql.Encoders.product[$owner.$root].schema"))
        .asInstanceOf[StructType]
    }
  }

  /** Field names must match exactly at every level; leaf types must agree
    * up to encoder-vs-compiler representation differences (encoders give
    * decimal(38,18) where the compiler pins decimal(12,4)). */
  private def assertMatches(enc: DataType, compiled: DataType,
      at: String): Unit = (enc, compiled) match {
    case (ArrayType(a, _), ArrayType(b, _)) => assertMatches(a, b, s"$at[]")
    case (a: StructType, b: StructType) =>
      assert(a.fieldNames.toSeq === b.fieldNames.toSeq,
        s"field set drift at $at")
      a.fields.zip(b.fields).foreach { case (f, g) =>
        assertMatches(f.dataType, g.dataType, s"$at.${f.name}")
      }
    case (_: DecimalType, _: DecimalType) => ()
    case (a, b) => assert(a === b, s"leaf type mismatch at $at")
  }

  test("generated Patient source compiles; encoder schema == schema " +
    "compiler output (incl. hoisted race/birthSex extensions)") {
    val src = FhirCodegen.caseClassSource("Patient")
    assert(src.contains("final case class Patient("))
    assert(src.contains("race: RaceExtension"))
    assert(src.contains("birthSex: String"))
    val enc = compileAndSchema(src, "Patient")
    assertMatches(enc, FhirSchemas.schemaFor("Patient"), "Patient")
  }

  test("generated source for a JSON-compiled profile compiles: " +
    "us-core-medicationrequest through the Dosage/Timing chain") {
    val reg = StructureDefinitions.shipped.registryFor(
      "http://hl7.org/fhir/us/core/StructureDefinition/us-core-medicationrequest")
    val src = FhirCodegen.caseClassSource("MedicationRequest", reg)
    assert(src.contains("dosageInstruction: Seq[Dosage]"))
    assert(src.contains("final case class Timing("))
    assert(src.contains("asNeededBoolean: Option[Boolean]"))
    val enc = compileAndSchema(src, "MedicationRequest")
    assertMatches(enc,
      FhirSchemas.schemaFor("MedicationRequest", reg), "MedicationRequest")
  }

  test("generated CarePlan (JSON-compiled) round-trips rows through its " +
    "own encoder") {
    import org.apache.spark.sql.functions._
    import scala.tools.reflect.ToolBox
    val reg = StructureDefinitions.shipped.registry
    val src = FhirCodegen.caseClassSource("CarePlan", reg)
    val (tb, owner) = defineAll(src)
    val cl = loaderOf(tb, owner, "CarePlan")
    val enc = withLoader(cl) {
      tb.eval(tb.parse(
        s"org.apache.spark.sql.Encoders.product[$owner.CarePlan]"))
        .asInstanceOf[org.apache.spark.sql.Encoder[Any]]
    }
    import spark.implicits._
    val bundle =
      """{"resourceType":"Bundle","type":"collection","entry":[
         {"resource":{"resourceType":"CarePlan","id":"cp1","status":"active",
           "intent":"plan","subject":{"reference":"Patient/p1"},
           "activity":[{"detail":{"status":"scheduled","description":"walk"}}]}}]}"""
    val df = Bundles.extractEntry(spark,
      Seq(bundle).toDF("bundle_json"), "CarePlan", Nil, reg)
    val row = withLoader(cl) { df.as(enc).collect().head }
    // reflective access — the class exists only in the toolbox loader
    def get(o: Any, f: String): Any =
      o.getClass.getMethod(f).invoke(o)
    assert(get(row, "id") === "cp1")
    assert(get(row, "status") === "active")
    assert(get(get(row, "subject"), "patientId") === "p1")
  }

  test("recursive profiles are rejected loudly") {
    val q =
      """{"resourceType":"StructureDefinition",
         "url":"http://example.org/StructureDefinition/Questionnaire",
         "kind":"resource","type":"Questionnaire",
         "snapshot":{"element":[
           {"path":"Questionnaire","max":"1"},
           {"path":"Questionnaire.id","max":"1","type":[{"code":"id"}]},
           {"path":"Questionnaire.item","max":"*",
            "type":[{"code":"BackboneElement"}]},
           {"path":"Questionnaire.item.linkId","max":"1",
            "type":[{"code":"string"}]},
           {"path":"Questionnaire.item.item","max":"*",
            "contentReference":"#Questionnaire.item"}]}}"""
    val reg = StructureDefinitions.compile(Seq(q)).registry
    val e = intercept[IllegalArgumentException] {
      FhirCodegen.caseClassSource("Questionnaire", reg)
    }
    assert(e.getMessage.contains("recursive"))
  }
}
