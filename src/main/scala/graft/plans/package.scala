package graft

/** Catalyst optimizer rules, registered via `SparkSessionExtensions`:
  *
  *   - [[graft.plans.RangeJoinRewrite]] — plans range/interval
  *     predicates as binned equi-joins (bin width from an O(1) bounded
  *     planning probe, never a full scan).
  *   - [[graft.plans.EditDistanceJoinRewrite]] — plans
  *     `levenshtein(a,b) <= 1` joins as deletion-variant blocked
  *     equi-joins.
  */
package object plans
