package graft.fhir

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FHIR-style schema compiler: element-definition DSL → Spark `StructType`.
  *
  * Replaces the reference's HAPI-driven visitor (Stu3StructureDefinitions →
  * DefinitionToSparkVisitor, /root/reference/bunsen-core-stu3/.../
  * Stu3StructureDefinitions.java:260-434 + bunsen-spark/.../
  * DefinitionToSparkVisitor.java:400-641) with a pure-Scala compiler over
  * hand-authored definitions, because the build is offline (no HAPI).
  * Semantics preserved:
  *
  *  - primitive mapping incl. `decimal → DecimalType(12,4)` and FHIR
  *    dates/instants kept as lexical strings (DefinitionToSparkVisitor
  *    .java:400-419);
  *  - multi-valued elements → `ArrayType` (`max != "1"`,
  *    Stu3StructureDefinitions.java:287-289);
  *  - choice `value[x]` → struct of one lower-cased field per allowed type,
  *    at most one non-null (DefinitionToSparkVisitor.java:580-636) — which in
  *    FHIR JSON is exactly how the fields appear, so `from_json` needs no
  *    reshaping;
  *  - `Reference` → (reference, display) plus synthetic per-target-type
  *    relative-id fields (`patientId`, …) computed by stripping the type
  *    prefix (DefinitionToSparkVisitor.java:342-378,476-519) — applied as a
  *    column transform post-parse;
  *  - recursion cut by a per-(type, path) occurrence budget of 1
  *    (Stu3StructureDefinitions.java:88-114).
  */
object FhirSchemas {

  sealed trait FhirType
  case object FString extends FhirType   // string, uri, id, markdown, xhtml, base64Binary, time
  case object FCode extends FhirType     // bound code; "?" ⇄ null scrub
  case object FDate extends FhirType     // date/dateTime/instant — lexical string
  case object FDecimal extends FhirType  // DecimalType(12,4)
  case object FInt extends FhirType
  case object FBool extends FhirType
  /** Named composite type, resolved via [[complexTypes]] or [[resources]]. */
  final case class FComplex(name: String) extends FhirType
  /** Choice value[x]: field名 base + capitalized type name per alternative. */
  final case class FChoice(base: String, alternatives: Seq[(String, FhirType)])
      extends FhirType
  /** Reference with declared target resource types (for synthetic ids). */
  final case class FReference(targets: Seq[String]) extends FhirType

  /** One element: name, type, multi-valued? */
  final case class FField(name: String, tpe: FhirType, multi: Boolean = false)

  final case class FDefinition(name: String, fields: Seq[FField])

  // ---- core complex types (subset of the FHIR datatypes the reference's
  // test matrix exercises; SURVEY §5) -------------------------------------
  val complexTypes: Map[String, FDefinition] = Seq(
    FDefinition("Coding", Seq(
      FField("id", FString), FField("system", FString),
      FField("version", FString), FField("code", FCode),
      FField("display", FString), FField("userSelected", FBool))),
    FDefinition("CodeableConcept", Seq(
      FField("id", FString),
      FField("coding", FComplex("Coding"), multi = true),
      FField("text", FString))),
    FDefinition("Quantity", Seq(
      FField("id", FString), FField("value", FDecimal),
      FField("comparator", FCode), FField("unit", FString),
      FField("system", FString), FField("code", FCode))),
    FDefinition("Period", Seq(
      FField("id", FString), FField("start", FDate), FField("end", FDate))),
    FDefinition("Identifier", Seq(
      FField("id", FString), FField("use", FCode),
      FField("system", FString), FField("value", FString))),
    FDefinition("HumanName", Seq(
      FField("id", FString), FField("use", FCode), FField("text", FString),
      FField("family", FString), FField("given", FString, multi = true),
      FField("prefix", FString, multi = true),
      FField("suffix", FString, multi = true))),
    FDefinition("Address", Seq(
      FField("id", FString), FField("use", FCode),
      FField("line", FString, multi = true), FField("city", FString),
      FField("state", FString), FField("postalCode", FString),
      FField("country", FString))),
    FDefinition("Meta", Seq(
      FField("id", FString), FField("versionId", FString),
      FField("lastUpdated", FDate),
      FField("profile", FString, multi = true))),
    FDefinition("Annotation", Seq(
      FField("id", FString), FField("text", FString),
      FField("time", FDate))),
  ).map(d => d.name -> d).toMap

  /** The choice type used by Observation.value[x] and friends. */
  def valueChoice: FChoice = FChoice("value", Seq(
    "Quantity" -> FComplex("Quantity"),
    "CodeableConcept" -> FComplex("CodeableConcept"),
    "String" -> FString,
    "Boolean" -> FBool,
    "Integer" -> FInt,
    "DateTime" -> FDate,
    "Period" -> FComplex("Period")))

  // ---- core resources ----------------------------------------------------
  val resources: Map[String, FDefinition] = Seq(
    FDefinition("Patient", Seq(
      FField("id", FString), FField("meta", FComplex("Meta")),
      FField("identifier", FComplex("Identifier"), multi = true),
      FField("active", FBool),
      FField("name", FComplex("HumanName"), multi = true),
      FField("gender", FCode), FField("birthDate", FDate),
      FField("deceasedBoolean", FBool),
      FField("address", FComplex("Address"), multi = true),
      FField("multipleBirthBoolean", FBool))),
    FDefinition("Observation", Seq(
      FField("id", FString), FField("meta", FComplex("Meta")),
      FField("status", FCode),
      FField("category", FComplex("CodeableConcept"), multi = true),
      FField("code", FComplex("CodeableConcept")),
      FField("subject", FReference(Seq("Patient", "Group"))),
      FField("encounter", FReference(Seq("Encounter"))),
      FField("effectiveDateTime", FDate),
      FField("issued", FDate),
      FField("valueQuantity", FComplex("Quantity")),
      FField("valueCodeableConcept", FComplex("CodeableConcept")),
      FField("valueString", FString),
      FField("interpretation", FComplex("CodeableConcept")),
      FField("note", FComplex("Annotation"), multi = true))),
    FDefinition("Condition", Seq(
      FField("id", FString), FField("meta", FComplex("Meta")),
      FField("clinicalStatus", FCode),
      FField("verificationStatus", FCode),
      FField("category", FComplex("CodeableConcept"), multi = true),
      FField("severity", FComplex("CodeableConcept")),
      FField("code", FComplex("CodeableConcept")),
      FField("subject", FReference(Seq("Patient"))),
      FField("context", FReference(Seq("Encounter"))),
      FField("onsetDateTime", FDate),
      FField("abatementDateTime", FDate))),
    FDefinition("Encounter", Seq(
      FField("id", FString), FField("meta", FComplex("Meta")),
      FField("status", FCode),
      FField("class", FComplex("Coding")),
      FField("type", FComplex("CodeableConcept"), multi = true),
      FField("priority", FComplex("CodeableConcept")),
      FField("subject", FReference(Seq("Patient"))),
      FField("period", FComplex("Period")))),
    FDefinition("Medication", Seq(
      FField("id", FString), FField("meta", FComplex("Meta")),
      FField("code", FComplex("CodeableConcept")),
      FField("status", FCode))),
    FDefinition("MedicationRequest", Seq(
      FField("id", FString), FField("meta", FComplex("Meta")),
      FField("status", FCode), FField("intent", FCode),
      FField("medicationReference", FReference(Seq("Medication"))),
      FField("medicationCodeableConcept", FComplex("CodeableConcept")),
      FField("subject", FReference(Seq("Patient"))),
      FField("authoredOn", FDate))),
  ).map(d => d.name -> d).toMap

  /** Max times one (type, path-element) pair may repeat on the traversal
    * stack — reference getMaxDepth == 1 (Stu3StructureDefinitions:88-114). */
  val MaxDepth = 1

  def lowerFirst(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toLowerCase + s.substring(1)

  /** Compile a named resource/complex type to its Spark schema. */
  def schemaFor(name: String): StructType = {
    val d = resources.getOrElse(name, complexTypes.getOrElse(name,
      throw new IllegalArgumentException(s"Unknown FHIR type: $name")))
    compileComposite(d, Map(name -> 1)).asInstanceOf[StructType]
  }

  private def compileComposite(d: FDefinition,
      seen: Map[String, Int]): DataType = {
    val fields = d.fields.flatMap(f => compileField(f, seen))
    StructType(fields)
  }

  private def compileField(f: FField,
      seen: Map[String, Int]): Seq[StructField] = {
    def wrap(dt: DataType): Seq[StructField] = {
      val t = if (f.multi) ArrayType(dt, containsNull = true) else dt
      Seq(StructField(f.name, t, nullable = true))
    }
    f.tpe match {
      case FString | FCode | FDate => wrap(StringType)
      case FDecimal => wrap(DecimalType(12, 4))
      case FInt => wrap(IntegerType)
      case FBool => wrap(BooleanType)
      case FReference(targets) =>
        // (reference, display) + synthetic <type>Id columns
        val base = Seq(
          StructField("reference", StringType),
          StructField("display", StringType)) ++
          targets.map(t => StructField(lowerFirst(t) + "Id", StringType))
        wrap(StructType(base))
      case FChoice(_, alternatives) =>
        // one field per alternative, named base + TypeName (FHIR JSON style)
        alternatives.flatMap { case (suffix, tpe) =>
          compileField(FField(f.name + suffix, tpe), seen)
        }
      case FComplex(name) =>
        // recursion budget: drop the field once the type already appears on
        // the traversal stack MaxDepth times (Stu3StructureDefinitions:88-114)
        val count = seen.getOrElse(name, 0)
        if (count >= MaxDepth && seen.contains(name)) Nil
        else {
          val d = complexTypes.getOrElse(name, resources(name))
          wrap(compileComposite(d, seen.updated(name, count + 1)))
        }
    }
  }

  /** Parse-time schema (no synthetic reference-id fields — those are filled
    * by [[postParseTransform]]). */
  def parseSchemaFor(name: String): StructType = {
    val d = resources.getOrElse(name, complexTypes(name))
    StructType(parseFields(d, Map(name -> 1)))
  }

  private def parseFields(d: FDefinition,
      seen: Map[String, Int]): Seq[StructField] =
    d.fields.flatMap(f => parseField(f, seen))

  private def parseField(f: FField,
      seen: Map[String, Int]): Seq[StructField] = {
    def wrap(dt: DataType): Seq[StructField] = {
      val t = if (f.multi) ArrayType(dt, containsNull = true) else dt
      Seq(StructField(f.name, t, nullable = true))
    }
    f.tpe match {
      case FString | FCode | FDate => wrap(StringType)
      case FDecimal => wrap(DecimalType(12, 4))
      case FInt => wrap(IntegerType)
      case FBool => wrap(BooleanType)
      case FReference(_) =>
        wrap(StructType(Seq(
          StructField("reference", StringType),
          StructField("display", StringType))))
      case FChoice(_, alternatives) =>
        alternatives.flatMap { case (suffix, tpe) =>
          parseField(FField(f.name + suffix, tpe), seen)
        }
      case FComplex(name) =>
        val count = seen.getOrElse(name, 0)
        if (count >= MaxDepth && seen.contains(name)) Nil
        else {
          val d = complexTypes.getOrElse(name, resources(name))
          wrap(StructType(parseFields(d, seen.updated(name, count + 1))))
        }
    }
  }

  /** Bundle-envelope parse schema: `entry.resource` is the *merged* schema of
    * every registered resource type plus the `resourceType` discriminator.
    * FHIR JSON field names are disjoint-or-identically-typed across our
    * resource set, so one `from_json` parses every entry and per-type
    * extraction is a filter + column subset — replacing the reference's
    * opaque `JavaRDD<BundleContainer>` with JSON-string reserialization on
    * every shuffle (Bundles.java:35-91). */
  lazy val mergedResourceParseSchema: StructType = {
    val merged = scala.collection.mutable.LinkedHashMap[String, StructField](
      "resourceType" -> StructField("resourceType", StringType))
    resources.keys.foreach { r =>
      parseSchemaFor(r).fields.foreach { sf =>
        merged.get(sf.name) match {
          case None => merged(sf.name) = sf
          case Some(existing) =>
            require(existing.dataType == sf.dataType,
              s"Conflicting parse type for field ${sf.name}: " +
                s"${existing.dataType} vs ${sf.dataType} (resource $r)")
        }
      }
    }
    StructType(merged.values.toSeq)
  }

  lazy val bundleEnvelopeSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("entry", ArrayType(StructType(Seq(
      StructField("fullUrl", StringType),
      StructField("resource", mergedResourceParseSchema)))))))

  /** Column transform: scrub bound-code "?" to null recursively
    * (EnumConverter.java:12-28 semantics) and fill synthetic reference id
    * fields by stripping 'Type/' prefixes from relative references
    * (RelativeValueConverter, DefinitionToSparkVisitor.java:342-378). */
  def postParseTransform(resourceName: String, c: Column): Column =
    transformFor(resources(resourceName), resourceName, c)

  private def transformFor(d: FDefinition, name: String, c: Column): Column = {
    val cols = d.fields.flatMap { f =>
      f.tpe match {
        case FChoice(_, alternatives) =>
          alternatives.map { case (suffix, tpe) =>
            val n = f.name + suffix
            transformLeaf(FField(n, tpe, f.multi), c)
          }
        case _ => Seq(transformLeaf(f, c))
      }
    }
    when(c.isNotNull, struct(cols: _*))
  }

  private def transformLeaf(f: FField, parent: Column): Column = {
    val child = parent.getField(f.name)
    val out: Column = f.tpe match {
      case FCode =>
        if (f.multi) transform(child, x => when(x === "?", null).otherwise(x))
        else when(child === "?", lit(null)).otherwise(child)
      case FReference(targets) =>
        def refStruct(x: Column): Column = when(x.isNotNull, struct(
          (Seq(x.getField("reference").as("reference"),
            x.getField("display").as("display")) ++
            targets.map { t =>
              val prefix = t + "/"
              val r = x.getField("reference")
              when(r.startsWith(prefix),
                expr_substring_after(r, prefix)).as(lowerFirst(t) + "Id")
            }): _*))
        if (f.multi) transform(child, refStruct(_)) else refStruct(child)
      case FComplex(n) =>
        val d = complexTypes.getOrElse(n, resources.get(n).orNull)
        if (d == null) child
        else if (f.multi) transform(child, x => transformFor(d, n, x))
        else transformFor(d, n, child)
      case _ => child
    }
    out.as(f.name)
  }

  private def expr_substring_after(c: Column, prefix: String): Column =
    substring(c, prefix.length + 1, Int.MaxValue)
}
