package graft

/** Structured Streaming forms of the batch operators
  * ([[graft.streaming.Streams]]): windowed/hopping/session aggregation,
  * streaming dedup and enrichment, interval joins (inner/left/full),
  * SCD2 maintenance, mergeable sketch upkeep (KMV/HLL/CMS), funnels,
  * heavy hitters, FHIR ingest, media dedup, eval-set decontamination,
  * and the persisted-ANN-index serving pair (probe stream + incremental
  * semantic dedup). State is watermark- or sketch-bounded; sketch
  * maintenance is append-only mergeable and idempotent under
  * at-least-once replay.
  */
package object streaming
