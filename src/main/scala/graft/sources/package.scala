package graft

/** Input normalization ([[graft.sources.EventTime]]): the events
  * table's `ts` column has shipped in three physical parquet encodings
  * (int64 nanos, timestamp_ntz micros, UTC-adjusted timestamp);
  * `EventTime.normalize` reads all three into one canonical timestamp
  * column so every downstream operator sees a single type.
  */
package object sources
