/** Graft — a Spark-native analytics engine with the query and
  * data-processing surface of cerner/bunsen, re-expressed as idiomatic
  * DataFrame/Catalyst code, plus the operator families a large-scale
  * training-data pipeline needs (dedup, similarity search, text
  * analysis, sketches, profiling, layout, streaming).
  *
  * ==Namespace index==
  *
  *   - [[graft.fhir]] — FHIR bundle ingestion (JSON/XML/Avro), resource
  *     extraction, composite encode/decode, profile-driven schemas,
  *     codegen'd specific-record analogs.
  *   - [[graft.terminology]] — value sets, concept maps, hierarchies:
  *     loaders (LOINC CSV, SNOMED RF2, FHIR resources), persistence
  *     (partitioned tables, guarded inserts), broadcast membership /
  *     translation UDFs and their Catalyst forms.
  *   - [[graft.closure]] — distributed transitive closure
  *     (prefix-doubling, cycle-safe, incremental `addEdges`).
  *   - [[graft.ops]] — the batch operator library: dedup, similarity,
  *     text analysis, sketches, graphs, profiling, splits/mixing,
  *     layout, range/as-of joins, media. See the per-object Scaladoc;
  *     every public method documents its scale shape.
  *   - [[graft.streaming]] — Structured Streaming forms: windowed and
  *     session aggregation, streaming dedup/enrichment, interval joins,
  *     SCD2, mergeable-sketch maintenance, funnels.
  *   - [[graft.functions]] — native Catalyst expressions and bounded
  *     aggregates (codegen'd hash kernels, bounded_collect_set,
  *     topk_by_score, KMV) shared by the operator families.
  *   - [[graft.plans]] — optimizer rules (range-join and
  *     edit-distance-join rewrites) registered via
  *     `SparkSessionExtensions`.
  *   - [[graft.sources]] — input normalization (event-time physical
  *     encodings).
  *
  * ==Conventions==
  *
  *   - Exact integer arithmetic (bigint / decimal(38,0) with floor-ppm
  *     ratios) wherever an external engine must reproduce results
  *     hash-exactly; doubles only at documented output boundaries.
  *   - Iterative fixpoints truncate lineage per round ([[graft.Lineage]]),
  *     retire superseded checkpoints, run on isolated child sessions
  *     (`graft.ConfScope`, library-internal) with loop-sized shuffle
  *     widths, and switch to reliable checkpoints via the
  *     `graft.checkpoint.dir` conf.
  *   - Bounded state everywhere: LSH buckets are capped (with drop
  *     accounting and recursive refinement), aggregation buffers are
  *     O(k), driver-side collects are constant-size by construction.
  */
package object graft
