package graft.terminology

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-built, executor-shipped lookup structures for valueset membership
  * and concept-map translation.
  *
  * Reference: /root/reference/bunsen-spark/.../broadcast/
  * BroadcastableValueSets.java:26-371 and BroadcastableConceptMap.java:22-125.
  * The nested-map layout (reference name → system → set of codes) is kept so
  * per-row membership checks are O(1) hash lookups executor-side; the builder
  * joins run on the cluster and only the final (small) lookup rows are
  * collected.
  */
final case class BroadcastableValueSets(
    valueSets: Map[String, Map[String, Set[String]]]) extends Serializable {

  /** True iff (system, code) is in the valueset registered under
    * `referenceName`. Unknown reference → IllegalArgumentException; null
    * system/code → false (ValueSetUdfs.java:69-77,
    * BroadcastableValueSets.java:358-371). */
  def hasCode(referenceName: String, system: String, code: String): Boolean =
    valueSets.get(referenceName) match {
      case None =>
        throw new IllegalArgumentException(
          s"Unknown value set reference name: $referenceName")
      case Some(bySystem) =>
        system != null && code != null &&
          bySystem.get(system).exists(_.contains(code))
    }

  /** Names of concept maps this mapping delegates to (reference resolution inputs). */
  def getReferenceNames: Set[String] = valueSets.keySet
}

object BroadcastableValueSets {

  /** Fresh builder for a broadcastable mapping set. */
  def newBuilder(): Builder = new Builder

  /** Accumulates explicit codes, valueset references, and descendants-of
    * requests; `build` resolves them with cluster-side joins
    * (BroadcastableValueSets.Builder, reference :68-335). */
  final class Builder private[terminology] () {
    private var codes = Vector.empty[(String, String, String)] // (ref, system, code)
    private var references = Vector.empty[(String, String, String)] // (ref, uri, version)
    private var ancestorValues = Vector.empty[(String, String, String, String)] // (ref, uri, version, system) -> value packed below
    private var ancestors = Vector.empty[(String, String, String, String, String)] // (ref, uri, version, system, value)

    /** Explicit (system, code) membership under a reference name. */
    def addCode(referenceName: String, system: String, code: String): Builder = {
      codes :+= ((referenceName, system, code)); this
    }

    /** All codes of a valueset version (version=null → latest at build). */
    def addReference(referenceName: String, valueSetUri: String,
        valueSetVersion: String = null): Builder = {
      references :+= ((referenceName, valueSetUri, valueSetVersion)); this
    }

    /** The code and all of its descendants in a hierarchy version
      * (version=null → latest at build). */
    def addDescendantsOf(referenceName: String, system: String, value: String,
        hierarchyUri: String, hierarchyVersion: String = null): Builder = {
      ancestors :+= ((referenceName, hierarchyUri, hierarchyVersion,
        system, value))
      this
    }

    def build(spark: SparkSession, valueSets: ValueSets,
        hierarchies: Hierarchies): BroadcastableValueSets = {
      import spark.implicits._

      var resolved: Seq[(String, String, String)] = codes

      if (references.nonEmpty) {
        val latest = valueSets.getLatestVersionsMap(includeExperimental = true)
        val want = references.map { case (ref, uri, v) =>
          val version = Option(v).orElse(latest.get(uri)).getOrElse(
            throw new IllegalArgumentException(
              s"Unknown valueset $uri (no version found)"))
          (ref, uri, version)
        }.toDF("referenceName", "valueSetUri", "valueSetVersion")
        // J2: values ⋈ references on uri+version, project, collect
        // (BroadcastableValueSets.java:267-287)
        val rows = valueSets.getValues.toDF()
          .join(broadcast(want), Seq("valueSetUri", "valueSetVersion"))
          .select($"referenceName", $"system", $"value")
          .as[(String, String, String)].collect()
        resolved ++= rows
      }

      if (ancestors.nonEmpty) {
        val latest = hierarchies.getLatestVersions
        val want = ancestors.map { case (ref, uri, v, system, value) =>
          val version = Option(v).orElse(latest.get(uri)).getOrElse(
            throw new IllegalArgumentException(
              s"Unknown hierarchy $uri (no version found)"))
          (ref, uri, version, system, value)
        }
        val wantDf = want.toDF("referenceName", "uri", "version",
          "ancestorSystem", "ancestorValue")
        // J3: ancestors ⋈ ancestorValues 4-column equi-join
        // (BroadcastableValueSets.java:295-324)
        val rows = hierarchies.getAncestors.toDF()
          .join(broadcast(wantDf),
            Seq("uri", "version", "ancestorSystem", "ancestorValue"))
          .select($"referenceName", $"descendantSystem", $"descendantValue")
          .as[(String, String, String)].collect()
        resolved ++= rows
        // the ancestor includes itself (reference :316-323)
        resolved ++= want.map { case (ref, _, _, system, value) =>
          (ref, system, value)
        }
      }

      val nested = resolved
        .groupBy(_._1)
        .map { case (ref, rows) =>
          ref -> rows.groupBy(_._2)
            .map { case (system, ss) => system -> ss.map(_._3).toSet }
        }
      BroadcastableValueSets(nested)
    }
  }
}

/** Broadcastable concept-map translation structure with delegation.
  *
  * Reference: BroadcastableConceptMap.java:22-125 — nested
  * sourceSystem → sourceValue → targets lookup, with an optional delegate
  * map consulted when the source code is unmapped (group.unmapped
  * mode=other-map semantics).
  */
final case class CodeValue(system: String, value: String) extends Serializable

final class BroadcastableConceptMap(
    val conceptMapUri: String,
    lookup: Map[String, Map[String, List[CodeValue]]],
    delegate: Option[BroadcastableConceptMap]) extends Serializable {

  /** Targets for a source (system, value); falls back to the delegate map
    * when absent (BroadcastableConceptMap.getTarget :99-125). */
  def getTarget(sourceSystem: String, sourceValue: String): List[CodeValue] = {
    val direct = lookup.get(sourceSystem).flatMap(_.get(sourceValue))
    direct.getOrElse(
      delegate.map(_.getTarget(sourceSystem, sourceValue)).getOrElse(Nil))
  }
}

object BroadcastableConceptMap {

  /** Build from mappings, keeping only semantically safe equivalences
    * (ConceptMaps.broadcast :348-353, P5). */
  def apply(uri: String, mappings: Seq[Mapping],
      delegate: Option[BroadcastableConceptMap] = None): BroadcastableConceptMap = {
    val filtered = mappings.filter(m =>
      Mapping.TranslatableEquivalences.contains(m.equivalence))
    val lookup = filtered.groupBy(_.sourceSystem).map { case (ss, rows) =>
      ss -> rows.groupBy(_.sourceValue).map { case (sv, rs) =>
        sv -> rs.map(r => CodeValue(r.targetSystem, r.targetValue)).toList
      }
    }
    new BroadcastableConceptMap(uri, lookup, delegate)
  }
}

/** Driver-side topological sort of concept maps by their delegation
  * dependencies (other-map references), reference ConceptMaps.sortMapsToLoad
  * (bunsen-spark-stu3/.../ConceptMaps.java:390-441, G2). Map counts are
  * small, so this stays on the driver by design. */
object ConceptMapDependencies {
  /** Topologically sort concept maps so every delegation target loads before its delegator (cycle = error). */
  def sortMapsToLoad(requested: Seq[String],
      children: String => Seq[String]): Seq[String] = {
    val ordered = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(uri: String, stack: Set[String]): Unit = {
      if (stack.contains(uri)) {
        throw new IllegalStateException(
          s"Cyclic concept-map delegation involving $uri")
      }
      if (!ordered.contains(uri)) {
        children(uri).foreach(visit(_, stack + uri))
        ordered += uri
      }
    }
    requested.foreach(visit(_, Set.empty))
    ordered.toSeq
  }
}
