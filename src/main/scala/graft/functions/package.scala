package graft

/** Native Catalyst expressions and bounded aggregates shared by the
  * operator families — every kernel is codegen'd (`doGenCode`) and has
  * an md5-derived PORTABLE twin where an external engine must reproduce
  * results bit-exactly.
  *
  *   - [[graft.functions.GraftFunctions]] — the Column-facing API:
  *     minhash bands, shingle hashes, simhash, hyperplane LSH (single
  *     and multi-table), vector dot, index pairs, bounded_collect_set,
  *     topk_by_score, k-min-values.
  *   - [[graft.functions.GraftHashImpl]] — the scalar kernels behind
  *     them (one-pass shingling, band folding, portable md5-60 family).
  */
package object functions
