package graft.terminology

/** Flat terminology record types.
  *
  * Mirrors the reference's bean classes (see
  * /root/reference/bunsen-spark/src/main/java/com/cerner/bunsen/spark/codes/
  * Mapping.java:31-47, Value.java:12-20, UrlAndVersion.java:8-10,
  * Ancestor.java:12-22, Hierarchies.java:546-651) as Scala case classes so
  * Spark derives product encoders (Catalyst-native, codegen-friendly) instead
  * of the reference's reflective bean encoders.
  */

/** One concept mapping inside a ConceptMap. */
final case class Mapping(
    conceptMapUri: String,
    conceptMapVersion: String,
    sourceValueSet: String,
    targetValueSet: String,
    sourceSystem: String,
    sourceValue: String,
    targetSystem: String,
    targetValue: String,
    equivalence: String)

object Mapping {
  /** Equivalence values that are semantically safe to use for translation;
    * reference: ConceptMaps.broadcast equivalence whitelist
    * (bunsen-spark-stu3/.../ConceptMaps.java:348-353). */
  val TranslatableEquivalences: Seq[String] =
    Seq("equivalent", "equals", "wider", "subsumes")
}

/** One code member of a ValueSet version. */
final case class Value(
    valueSetUri: String,
    valueSetVersion: String,
    system: String,
    version: String,
    value: String)

/** (url, version) identity of a terminology resource. */
final case class UrlAndVersion(url: String, version: String)

/** Transitive ancestor fact: `descendant` is-a (transitively) `ancestor`
  * within hierarchy (uri, version). */
final case class Ancestor(
    uri: String,
    version: String,
    descendantSystem: String,
    descendantValue: String,
    ancestorSystem: String,
    ancestorValue: String)

/** One direct parent-child edge of a code hierarchy. */
final case class HierarchicalElement(
    ancestorSystem: String,
    ancestorValue: String,
    descendantSystem: String,
    descendantValue: String)
