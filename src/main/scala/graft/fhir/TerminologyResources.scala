package graft.fhir

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.terminology.{BroadcastableConceptMap, ConceptMapDependencies, ConceptMaps, Mapping, Value, ValueSets}

/** Import/export of FHIR ValueSet and ConceptMap *resources* (JSON) into the
  * flat terminology datasets, and reconstruction of the nested resource
  * shape from the flat rows.
  *
  * Reference: S7 directory import (AbstractValueSets.valueSetDatasetFromDirectory
  * /root/reference/bunsen-spark/.../AbstractValueSets.java:427-465,
  * AbstractConceptMaps.java:162-194), value/mapping expansion
  * (ValueSets.expandValues bunsen-spark-stu3/.../ValueSets.java:200-234,
  * ConceptMaps.expandMappings ConceptMaps.java:207-275), and the sorted
  * group-reconstruction O1/O2 (ConceptMaps.addToConceptMap :135-199,
  * ValueSets.addToValueSet :237-287).
  *
  * Divergences: parsing is `from_json` against a compiled schema on a
  * parallel `wholetext` read (the reference parses with HAPI on a
  * 1-partition RDD, AbstractValueSets.java:458-460), and reconstruction is
  * `array_sort(collect_list(struct(...)))` aggregation instead of a
  * driver-side streamed fold — both fully cluster-side.
  */
object TerminologyResources {

  /** Parse schema for a FHIR ValueSet resource (the subset the flat model
    * round-trips; FIXTURES.md §6). */
  val valueSetSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("version", StringType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("experimental", BooleanType),
    StructField("publisher", StringType),
    StructField("date", StringType),
    StructField("compose", StructType(Seq(
      StructField("include", ArrayType(StructType(Seq(
        StructField("system", StringType),
        StructField("version", StringType),
        StructField("concept", ArrayType(StructType(Seq(
          StructField("code", StringType),
          StructField("display", StringType))))))))))))))

  /** Parse schema for a FHIR ConceptMap resource. */
  val conceptMapSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("url", StringType),
    StructField("version", StringType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("experimental", BooleanType),
    StructField("publisher", StringType),
    StructField("date", StringType),
    StructField("sourceUri", StringType),
    StructField("targetUri", StringType),
    StructField("group", ArrayType(StructType(Seq(
      StructField("source", StringType),
      StructField("target", StringType),
      StructField("unmapped", StructType(Seq(
        StructField("mode", StringType),
        StructField("url", StringType)))),
      StructField("element", ArrayType(StructType(Seq(
        StructField("code", StringType),
        StructField("display", StringType),
        StructField("target", ArrayType(StructType(Seq(
          StructField("code", StringType),
          StructField("display", StringType),
          StructField("equivalence", StringType)))))))))))))))

  // FAIL-FAST on malformed XML: terminology directories are small curated
  // inputs — a corrupt ValueSet/ConceptMap must abort the import (the
  // reference's behavior), not silently vanish and skew every membership
  // check or translation built from the collection. (The lenient
  // null-on-parse-error policy is reserved for the Bundles bulk-ingest
  // path.)
  private val vsXmlUdf = udf((s: String) =>
    if (s == null) null else FhirXml.resourceXmlToJson(s, valueSetSchema))
  private val cmXmlUdf = udf((s: String) =>
    if (s == null) null else FhirXml.resourceXmlToJson(s, conceptMapSchema))

  /** Read every file; `.xml` files are converted to JSON executor-side so
    * one `from_json` handles both formats (reference parses either by
    * extension, AbstractValueSets.java:427-448 ToValueSet.call). */
  private def readDir(spark: SparkSession, path: String,
      xmlUdf: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumn("source_file", input_file_name())
      .select(when(col("source_file").endsWith(".xml"), xmlUdf(col("value")))
        .otherwise(col("value")).as("resource_json"))

  /** S7: directory of ValueSet JSON/XML files → (metadata DF, values DS). */
  def valueSetsFromDirectory(spark: SparkSession,
      path: String): (DataFrame, Dataset[Value]) = {
    import spark.implicits._
    val parsed = readDir(spark, path, vsXmlUdf)
      .select(from_json(col("resource_json"), valueSetSchema).as("vs"))
      .where(col("vs.resourceType") === "ValueSet")
    // full resource metadata row (AbstractValueSets stores the whole
    // encoded resource, AbstractValueSets.java:242-266; we keep the
    // queryable scalar fields)
    val meta = parsed.select(
      col("vs.url").as("url"), col("vs.version").as("version"),
      col("vs.name").as("name"), col("vs.status").as("status"),
      coalesce(col("vs.experimental"), lit(false)).as("experimental"),
      col("vs.publisher").as("publisher"), col("vs.date").as("date"))
    // expandValues (ValueSets.java:200-234): explode include → concept
    val values = parsed.select(
      col("vs.url").as("valueSetUri"),
      col("vs.version").as("valueSetVersion"),
      explode(col("vs.compose.include")).as("inc"))
      .select(col("valueSetUri"), col("valueSetVersion"),
        col("inc.system").as("system"), col("inc.version").as("version"),
        explode(col("inc.concept")).as("c"))
      .select(col("valueSetUri"), col("valueSetVersion"), col("system"),
        col("version"), col("c.code").as("value"))
      .as[Value]
    (meta, values)
  }

  /** Merge a directory of ValueSet resources into a collection (duplicates
    * rejected — withValueSetsFromDirectory semantics). */
  def withValueSetsFromDirectory(spark: SparkSession, valueSets: ValueSets,
      path: String): ValueSets = {
    val (meta, values) = valueSetsFromDirectory(spark, path)
    valueSets.withValueSets(meta, values)
  }

  /** Disjoint variant (J1 semantics). */
  def withDisjointValueSetsFromDirectory(spark: SparkSession,
      valueSets: ValueSets, path: String): ValueSets = {
    val (meta, values) = valueSetsFromDirectory(spark, path)
    valueSets.withDisjointValueSets(meta, values)
  }

  /** S7: directory of ConceptMap JSON/XML files → (metadata DF, mappings DS). */
  def conceptMapsFromDirectory(spark: SparkSession,
      path: String): (DataFrame, Dataset[Mapping]) = {
    import spark.implicits._
    val parsed = readDir(spark, path, cmXmlUdf)
      .select(from_json(col("resource_json"), conceptMapSchema).as("cm"))
      .where(col("cm.resourceType") === "ConceptMap")
    val meta = parsed.select(
      col("cm.url").as("url"), col("cm.version").as("version"),
      col("cm.name").as("name"), col("cm.status").as("status"),
      col("cm.sourceUri").as("source"), col("cm.targetUri").as("target"),
      coalesce(col("cm.experimental"), lit(false)).as("experimental"),
      col("cm.publisher").as("publisher"), col("cm.date").as("date"))
    // expandMappings (ConceptMaps.java:207-275)
    val mappings = parsed.select(
      col("cm.url").as("conceptMapUri"),
      col("cm.version").as("conceptMapVersion"),
      col("cm.sourceUri").as("sourceValueSet"),
      col("cm.targetUri").as("targetValueSet"),
      explode(col("cm.group")).as("g"))
      .select(col("conceptMapUri"), col("conceptMapVersion"),
        col("sourceValueSet"), col("targetValueSet"),
        col("g.source").as("sourceSystem"), col("g.target").as("targetSystem"),
        explode(col("g.element")).as("e"))
      .select(col("conceptMapUri"), col("conceptMapVersion"),
        col("sourceValueSet"), col("targetValueSet"), col("sourceSystem"),
        col("e.code").as("sourceValue"), col("targetSystem"),
        explode(col("e.target")).as("t"))
      .select(col("conceptMapUri"), col("conceptMapVersion"),
        col("sourceValueSet"), col("targetValueSet"), col("sourceSystem"),
        col("sourceValue"), col("targetSystem"),
        col("t.code").as("targetValue"), col("t.equivalence").as("equivalence"))
      .as[Mapping]
    (meta, mappings)
  }

  /** ConceptMaps with every map found under `path` (JSON + XML) appended. */
  def withConceptMapsFromDirectory(spark: SparkSession,
      conceptMaps: ConceptMaps, path: String): ConceptMaps = {
    val (meta, mappings) = conceptMapsFromDirectory(spark, path)
    conceptMaps.withConceptMaps(meta, mappings)
  }

  /** G2: other-map delegate urls per concept-map url, from the parsed
    * `group.unmapped{mode,url}` (ConceptMaps.getMapChildren,
    * /root/reference/bunsen-spark-stu3/.../ConceptMaps.java:447-455). */
  def conceptMapDelegates(spark: SparkSession,
      path: String): Map[String, Seq[String]] = {
    import spark.implicits._
    readDir(spark, path, cmXmlUdf)
      .select(from_json(col("resource_json"), conceptMapSchema).as("cm"))
      .where(col("cm.resourceType") === "ConceptMap")
      .select(col("cm.url").as("url"), explode(col("cm.group")).as("g"))
      .where(col("g.unmapped.mode") === "other-map" &&
        col("g.unmapped.url").isNotNull)
      .select(col("url"), col("g.unmapped.url").as("delegate"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
  }

  /** G2 end-to-end: load `uri` and its other-map delegation closure from a
    * directory, dependency-ordered (ConceptMaps.sortMapsToLoad :390-441),
    * and build the chained broadcastable lookup — unmapped source codes
    * fall through to the delegate map at translate time. */
  def broadcastConceptMapFromDirectory(spark: SparkSession, path: String,
      uri: String): BroadcastableConceptMap = {
    val children = conceptMapDelegates(spark, path)
    val order = ConceptMapDependencies.sortMapsToLoad(Seq(uri),
      u => children.getOrElse(u, Nil))
    val (_, mappings) = conceptMapsFromDirectory(spark, path)
    // small-by-contract driver collect (the reference collects every
    // broadcast map the same way, ConceptMaps.broadcast :330-385)
    val byUri = mappings.collect().toSeq.groupBy(_.conceptMapUri)
    val built = order.foldLeft(
      Map.empty[String, BroadcastableConceptMap]) { (acc, u) =>
      val delegate = children.getOrElse(u, Nil).headOption.flatMap(acc.get)
      acc + (u -> BroadcastableConceptMap(u,
        byUri.getOrElse(u, Nil), delegate))
    }
    built.getOrElse(uri, throw new IllegalArgumentException(
      s"Concept map $uri not found in $path"))
  }

  /** Like [[withConceptMapsFromDirectory]] but skips (url, version) pairs already loaded (J1 anti-join semantics). */
  def withDisjointConceptMapsFromDirectory(spark: SparkSession,
      conceptMaps: ConceptMaps, path: String): ConceptMaps = {
    val (meta, mappings) = conceptMapsFromDirectory(spark, path)
    conceptMaps.withDisjointConceptMaps(meta, mappings)
  }

  /** O2/U5: rebuild the nested ValueSet resource JSON for one (uri, version)
    * from the flat values — canonical (system, version, value) ordering via
    * array_sort, matching the reference's sort-then-rebuild
    * (ValueSets.java:237-287). */
  def valueSetAsJson(valueSets: ValueSets, uri: String,
      version: String): Option[String] = {
    import valueSets.spark.implicits._
    val nested = valueSets.getValues(uri, version).toDF()
      .groupBy(col("system"), col("version"))
      .agg(array_sort(collect_list(struct(col("value").as("code"))))
        .as("concept"))
      .groupBy()
      .agg(array_sort(collect_list(
        struct(col("system"), col("version"), col("concept")))).as("include"))
      // unknown (uri, version) → None, not a hollow document
      .where(size(col("include")) > 0)
      .select(to_json(struct(
        lit("ValueSet").as("resourceType"),
        lit(uri).as("url"), lit(version).as("version"),
        struct(col("include")).as("compose"))).as("json"))
    nested.as[String].collect().headOption
  }

  /** O1/U5: rebuild the nested ConceptMap resource JSON for one (uri,
    * version) — groups keyed by (sourceSystem, targetSystem), elements and
    * targets canonically sorted (ConceptMaps.addToConceptMap :135-199). */
  def conceptMapAsJson(conceptMaps: ConceptMaps, uri: String,
      version: String): Option[String] = {
    import conceptMaps.spark.implicits._
    val nested = conceptMaps.getMappings(uri, version).toDF()
      .groupBy(col("sourceSystem"), col("targetSystem"),
        col("sourceValue"))
      .agg(array_sort(collect_list(struct(
        col("targetValue").as("code"),
        col("equivalence")))).as("target"))
      .groupBy(col("sourceSystem"), col("targetSystem"))
      .agg(array_sort(collect_list(struct(
        col("sourceValue").as("code"), col("target")))).as("element"))
      .groupBy()
      .agg(array_sort(collect_list(struct(
        col("sourceSystem").as("source"),
        col("targetSystem").as("target"),
        col("element")))).as("group"))
      .where(size(col("group")) > 0)
      .select(to_json(struct(
        lit("ConceptMap").as("resourceType"),
        lit(uri).as("url"), lit(version).as("version"),
        col("group"))).as("json"))
    nested.as[String].collect().headOption
  }

  /** get_value_set_as_xml parity (reference
    * python/bunsen/codes/__init__.py:301-318): the canonical JSON renest
    * serialized as a FHIR XML document. The output re-imports through the
    * XML directory reader to the identical values dataset
    * (TerminologyResourcesSpec round trip). */
  def valueSetAsXml(valueSets: ValueSets, uri: String,
      version: String): Option[String] =
    valueSetAsJson(valueSets, uri, version)
      .map(FhirJson.resourceJsonToXml)

  /** get_map_as_xml parity (python/bunsen/codes/__init__.py:126-143). */
  def conceptMapAsXml(conceptMaps: ConceptMaps, uri: String,
      version: String): Option[String] =
    conceptMapAsJson(conceptMaps, uri, version)
      .map(FhirJson.resourceJsonToXml)
}
