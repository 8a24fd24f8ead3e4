package graft.terminology

import java.util.ArrayDeque

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.api.java.{UDF2, UDF3}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, StringType, StructField, StructType}

/** SQL UDF surface over broadcast terminology.
  *
  * `in_valueset(codeable, 'ref')` — true iff the CodeableConcept struct (or
  * array of CodeableConcepts) has any coding whose (system, code) is in the
  * broadcast valueset registered under 'ref'. Null input → false; unknown
  * reference name → IllegalArgumentException.
  *
  * Reference: /root/reference/bunsen-spark/.../ValueSetUdfs.java:32-209
  * (struct path :32-61, array path :69-100, stack push/pop :124-209). The
  * reference reads `coding` positionally (getList(1)); we resolve it by field
  * name so any CodeableConcept-shaped struct works regardless of field order.
  */
object ValueSetUdfs {

  private val stack = new ArrayDeque[Broadcast[BroadcastableValueSets]]()

  private def codingInValueSets(
      codeable: Row, name: String, vs: BroadcastableValueSets): Boolean = {
    val idx = codeable.fieldIndex("coding")
    val codings = codeable.getAs[scala.collection.Seq[Row]](idx)
    codings != null && codings.exists { c =>
      c != null && vs.hasCode(name,
        Option(c.getAs[String]("system")).orNull,
        Option(c.getAs[String]("code")).orNull)
    }
  }

  private final class InValuesetUdf(
      broadcast: Broadcast[BroadcastableValueSets])
      extends UDF2[AnyRef, String, java.lang.Boolean] {
    override def call(input: AnyRef, name: String): java.lang.Boolean =
      input match {
        case null => false
        case r: Row => codingInValueSets(r, name, broadcast.value)
        case seq: scala.collection.Seq[_] =>
          seq.exists {
            case r: Row => codingInValueSets(r, name, broadcast.value)
            case _ => false
          }
        case other =>
          throw new IllegalArgumentException(
            "in_valueset expects a CodeableConcept struct or array, got " +
              other.getClass.getName)
      }
  }

  /** Plain-code variant for flat schemas: in_valueset_code(system, code, ref). */
  private final class InValuesetCodeUdf(
      broadcast: Broadcast[BroadcastableValueSets])
      extends UDF3[String, String, String, java.lang.Boolean] {
    override def call(system: String, code: String, name: String): java.lang.Boolean =
      broadcast.value.hasCode(name, system, code)
  }

  /** Broadcast the valuesets and (re-)register the UDFs, pushing onto the
    * stack so popUdf can restore the previous registration
    * (ValueSetUdfs.pushUdf :124-158). */
  def pushUdf(spark: SparkSession, valueSets: BroadcastableValueSets): Unit =
    synchronized {
      val b = spark.sparkContext.broadcast(valueSets)
      stack.push(b)
      register(spark, b)
    }

  /** Destroy the current broadcast and restore the previous one
    * (ValueSetUdfs.popUdf :160-209). */
  def popUdf(spark: SparkSession): Boolean = synchronized {
    if (stack.isEmpty) false
    else {
      val popped = stack.pop()
      popped.destroy()
      if (!stack.isEmpty) register(spark, stack.peek())
      true
    }
  }

  /** The value sets currently bound to the in_valueset UDF stack top (None when unbound). */
  def currentValueSets: Option[BroadcastableValueSets] =
    Option(stack.peek()).map(_.value)

  private def register(spark: SparkSession,
      b: Broadcast[BroadcastableValueSets]): Unit = {
    spark.udf.register("in_valueset", new InValuesetUdf(b), BooleanType)
    spark.udf.register("in_valueset_code", new InValuesetCodeUdf(b),
      BooleanType)
  }

  /** Catalyst-VISIBLE membership predicate (SURVEY §4 v2 option): the
    * valueset is embedded as a literal map<system, array<code>> and the
    * check is `exists(coding, …)` + `array_contains` — plain Column
    * expressions the optimizer can reason about (and ship inside the plan,
    * no broadcast variable or opaque UDF). Same null semantics as the UDF:
    * null codeable/coding → false. Best for small-to-medium valuesets; the
    * UDF + broadcast path remains the choice for very large ones. */
  def inValueSetColumn(codeable: Column, referenceName: String,
      valueSets: BroadcastableValueSets): Column = {
    val bySystem: Map[String, Seq[String]] =
      valueSets.valueSets.getOrElse(referenceName,
        throw new IllegalArgumentException(
          s"Unknown value set reference name: $referenceName"))
        .map { case (s, codes) => s -> codes.toSeq }
    val lmap = typedLit(bySystem)
    coalesce(
      exists(codeable.getField("coding"), c =>
        array_contains(
          // try_element_at: explicitly null (not ANSI-error) on systems
          // absent from the map
          coalesce(try_element_at(lmap, c.getField("system")),
            array().cast("array<string>")),
          c.getField("code"))),
      lit(false))
  }

  private val translateResultType = ArrayType(StructType(Seq(
    StructField("system", StringType), StructField("value", StringType))))

  /** Register `translate(system, code)` for a broadcast concept map: returns
    * array<struct<system,value>> of translation targets (U3; programmatic
    * getTarget made SQL-visible). */
  def registerTranslate(spark: SparkSession, name: String,
      conceptMap: BroadcastableConceptMap): Unit = {
    val b = spark.sparkContext.broadcast(conceptMap)
    val fn = new UDF2[String, String, Array[Row]] {
      override def call(system: String, code: String): Array[Row] =
        b.value.getTarget(system, code)
          .map(cv => Row(cv.system, cv.value)).toArray
    }
    spark.udf.register(name, fn, translateResultType)
  }
}
