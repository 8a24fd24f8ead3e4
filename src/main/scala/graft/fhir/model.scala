package graft.fhir

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Typed `Dataset[T]` surface over the compiled FHIR schemas — the
  * Spark-idiomatic analog of the reference's Avro specific-record
  * compilation (`AvroConverter.generateClasses`,
  * /root/reference/bunsen-avro/.../AvroConverter.java:24-206): where the
  * reference emits Java classes from schemas at build time, Spark's
  * `Encoder` derivation gives the same compile-time field safety from
  * plain case classes, resolved BY NAME against the runtime DataFrame —
  * so these stay automatically in sync with the schema compiler (the
  * round-trip spec fails if either drifts).
  *
  * Nullability mapping: FHIR elements are all optional, so JVM
  * primitives appear as `Option[_]` and reference types use null —
  * exactly what `Encoders.product` derives as nullable columns.
  */
object model {

  final case class Coding(id: String, system: String, version: String,
      code: String, display: String, userSelected: Option[Boolean])

  final case class CodeableConcept(id: String, coding: Seq[Coding],
      text: String)

  final case class Quantity(id: String, value: java.math.BigDecimal,
      comparator: String, unit: String, system: String, code: String)

  final case class Period(id: String, start: String, end: String)

  final case class Identifier(id: String, use: String, system: String,
      value: String)

  final case class HumanName(id: String, use: String, text: String,
      family: String, given: Seq[String], prefix: Seq[String],
      suffix: Seq[String])

  final case class Address(id: String, use: String, line: Seq[String],
      city: String, state: String, postalCode: String, country: String)

  final case class Meta(id: String, versionId: String,
      lastUpdated: String, profile: Seq[String])

  final case class Annotation(id: String, text: String, time: String)

  /** Hoisted us-core race parent extension (ombCategory + text). */
  final case class RaceExtension(ombCategory: Seq[Coding], text: String)

  /** Reference shapes carry one synthetic relative-id field per declared
    * target type (`patientId`, …) — mirroring the column transform. */
  final case class PatientReference(reference: String, display: String,
      patientId: String)
  final case class PatientGroupReference(reference: String,
      display: String, patientId: String, groupId: String)
  final case class EncounterReference(reference: String, display: String,
      encounterId: String)

  final case class Patient(
      id: String, meta: Meta, identifier: Seq[Identifier],
      active: Option[Boolean], name: Seq[HumanName], gender: String,
      birthDate: String, deceasedBoolean: Option[Boolean],
      address: Seq[Address], multipleBirthBoolean: Option[Boolean],
      race: RaceExtension, birthSex: String)

  final case class Observation(
      id: String, meta: Meta, status: String,
      category: Seq[CodeableConcept], code: CodeableConcept,
      subject: PatientGroupReference, encounter: EncounterReference,
      effectiveDateTime: String, issued: String,
      valueQuantity: Quantity, valueCodeableConcept: CodeableConcept,
      valueString: String, valueBoolean: Option[Boolean],
      valueInteger: Option[Int], valueDateTime: String,
      valuePeriod: Period, interpretation: CodeableConcept,
      note: Seq[Annotation])

  final case class Condition(
      id: String, meta: Meta, clinicalStatus: String,
      verificationStatus: String, category: Seq[CodeableConcept],
      severity: CodeableConcept, code: CodeableConcept,
      subject: PatientReference, context: EncounterReference,
      onsetDateTime: String, abatementDateTime: String)

  /** Typed extraction entry points: the untyped [[Bundles.extractEntry]]
    * pipeline (restricted envelope, post-parse transforms) followed by a
    * by-name `as[T]` — no extra pass over the data, the Encoder fuses
    * into the same plan. */
  def patients(spark: SparkSession,
      bundles: org.apache.spark.sql.DataFrame): Dataset[Patient] =
    Bundles.extractEntry(spark, bundles, "Patient")
      .as(Encoders.product[Patient])

  /** Typed Dataset[Observation] extraction from a bundles frame. */
  def observations(spark: SparkSession,
      bundles: org.apache.spark.sql.DataFrame): Dataset[Observation] =
    Bundles.extractEntry(spark, bundles, "Observation")
      .as(Encoders.product[Observation])

  /** Typed Dataset[Condition] extraction from a bundles frame. */
  def conditions(spark: SparkSession,
      bundles: org.apache.spark.sql.DataFrame): Dataset[Condition] =
    Bundles.extractEntry(spark, bundles, "Condition")
      .as(Encoders.product[Condition])
}
