package graft

/** Structured Streaming forms of the batch operators
  * ([[graft.streaming.Streams]]): windowed/hopping/session aggregation,
  * streaming dedup and enrichment, interval joins (inner/left/full),
  * SCD2 maintenance, mergeable sketch upkeep (KMV/HLL/CMS), funnels,
  * heavy hitters, FHIR ingest, media dedup, eval-set decontamination,
  * and the persisted-ANN-index serving trio (probe stream, incremental
  * semantic dedup, append+compact maintenance). State is watermark- or
  * sketch-bounded; sketch maintenance is append-only mergeable and
  * idempotent under at-least-once replay.
  *
  * ==State-store sizing and the RocksDB mode==
  *
  * Every stateful operator here bounds its state BY DESIGN, but the
  * bound's variable differs — that variable, times row width, is what
  * has to fit the store. Per family:
  *
  *  - '''O(open windows)''' — windowed/hopping aggregation,
  *    `windowedKmvDistinct` (O(k) longs per open window), windowed
  *    sketch upkeep: state = windows inside the watermark, independent
  *    of key cardinality. Stays comfortably on-heap at any corpus size;
  *    the default HDFS-backed provider is fine.
  *  - '''O(distinct keys inside the watermark)''' — `streamingDedup`,
  *    the media dedup index, streaming enrichment's keyed caches: state
  *    grows with UNIQUE keys seen per watermark span. At 100 TB-scale
  *    firehoses (billions of keys/day) this is the family that outgrows
  *    executor heap first.
  *  - '''O(open entities)''' — `scd2Stream` (exactly the open run per
  *    key), funnels and sessionization (one accumulator per key with an
  *    open session/funnel): bounded by LIVE entities, not events. Heap
  *    is fine until live-entity counts reach hundreds of millions.
  *  - '''O(watermark band)''' — stream-stream interval joins buffer
  *    both sides inside the band: state = arrival rate × band width.
  *    Widening the band to hours on a dense stream is the classic
  *    state blow-up; prefer narrowing the band over growing the store.
  *  - '''O(1) / stateless''' — decontamination (literal projection),
  *    the ANN probe/dedup/maintenance trio (all index state lives in
  *    the PERSISTED index on disk, not the state store), FHIR ingest:
  *    no store pressure at any scale.
  *
  * Flip to RocksDB ([[graft.streaming.Streams.withRocksDbState]], or
  * set `spark.sql.streaming.stateStore.providerClass` to
  * [[graft.streaming.Streams.RocksDbProviderClass]]) when the keyed
  * families — O(distinct keys), O(open entities), or a wide interval
  * band — are projected past ~50% of executor heap: the provider keeps
  * state off-heap/on-disk with the same exact semantics (the entire
  * ≡-batch suite passes under it, StreamsRocksDbSpec), trading ~10-30%
  * per-batch commit latency for a state ceiling bounded by local disk
  * instead of heap. The O(open windows)/O(1) families gain nothing from
  * the swap — leave them on the default provider. Operational notes:
  * RocksDB state lives under `spark.local.dir` (size it), and
  * changelog checkpointing keeps commit latency flat as state grows.
  * The state-store PARTITION count is fixed at query start from
  * `spark.sql.shuffle.partitions` (see `memorySink`'s doc) — size it to
  * key cardinality before first start; it cannot be changed without a
  * new checkpoint.
  */
package object streaming
