package graft

/** Distributed transitive closure
  * ([[graft.closure.TransitiveClosure]]): prefix-doubling (or linear)
  * fixpoint with cycle-safe self-loop elimination, reliable-checkpoint
  * support, per-round retirement, loud non-convergence, and semi-naive
  * incremental maintenance (`addEdges`) for code-system updates.
  */
package object closure
