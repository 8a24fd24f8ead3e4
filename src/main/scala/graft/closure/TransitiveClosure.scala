package graft.closure

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed transitive closure over a parent-child edge list.
  *
  * The reference computes ancestor expansion entirely on the driver — it
  * collects every edge, walks an in-memory graph per node, and re-parallelizes
  * the result in 100k-row slices (Hierarchies.expandElements,
  * /root/reference/bunsen-spark/.../codes/Hierarchies.java:314-391). That is
  * driver-memory-bound and cannot scale past a few million edges.
  *
  * This implementation keeps the computation on the cluster as an iterative
  * self-join with *prefix doubling*: after iteration i, `closure` holds every
  * path of length <= 2^i, so the number of rounds is O(log(longest path))
  * instead of O(longest path). Each round:
  *
  *   closure' = distinct(closure ∪ (closure ⋈ closure))
  *
  * joined on closure.ancestor == closure.descendant. `distinct` makes the
  * iteration cycle-safe (a cycle just stops producing new rows) and is the
  * fixpoint test. Results are localCheckpoint()ed every round to truncate the
  * exponentially growing lineage — without it Catalyst replans the whole
  * history each iteration.
  *
  * At 100 TB scale: the join is an equi-join on (system, value) pairs so it
  * shuffles by key, partial aggregation (distinct) is map-side combined, and
  * AQE can rebalance skewed hub codes. No driver materialization at any point.
  */
object TransitiveClosure {

  /** Generic closure over a two-column (ancestor, descendant) edge DataFrame.
    *
    * @param edges  DataFrame with columns (ancestorSystem, ancestorValue,
    *               descendantSystem, descendantValue)
    * @param maxIterations  hard stop (2^n path length) as a safety bound
    * @return DataFrame with the same four columns, containing every
    *         transitive (ancestor, descendant) pair, paths of length >= 1.
    */
  def closure(
      spark: SparkSession,
      edges: Dataset[_],
      maxIterations: Int = 25): org.apache.spark.sql.DataFrame = {
    val cols = Seq("ancestorSystem", "ancestorValue",
      "descendantSystem", "descendantValue")
    var current = edges.toDF().select(cols.map(col): _*)
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .distinct()
      .localCheckpoint(eager = true)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // closure ⋈ closure: (a isAncestorOf m) and (m isAncestorOf d) => (a, d)
      val left = current.select(
        col("ancestorSystem"), col("ancestorValue"),
        col("descendantSystem").as("midSystem"),
        col("descendantValue").as("midValue"))
      val right = current.select(
        col("ancestorSystem").as("midSystem"),
        col("ancestorValue").as("midValue"),
        col("descendantSystem"), col("descendantValue"))
      val extended = left.join(right, Seq("midSystem", "midValue"))
        .select(cols.map(col): _*)
      val next = current.union(extended)
        // drop self-loops introduced by cycles: a node is not its own ancestor
        .where(!(col("ancestorSystem") === col("descendantSystem") &&
          col("ancestorValue") === col("descendantValue")))
        .distinct()
        .localCheckpoint(eager = true)
      val prevCount = current.count()
      val nextCount = next.count()
      current.unpersist()
      current = next
      converged = nextCount == prevCount
      i += 1
    }
    current
  }

  /** Closure over arbitrary (parent, child) long-keyed edges — used by the
    * relational-analog correctness queries. Output columns (ancestor,
    * descendant). */
  def closureLong(
      spark: SparkSession,
      edges: org.apache.spark.sql.DataFrame, // columns: parent, child
      maxIterations: Int = 25): org.apache.spark.sql.DataFrame = {
    var current = edges
      .select(col("parent").as("ancestor"), col("child").as("descendant"))
      .where(col("parent").isNotNull && col("child").isNotNull)
      .distinct()
      .localCheckpoint(eager = true)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val extended = current.as("l")
        .join(current.as("r"), col("l.descendant") === col("r.ancestor"))
        .select(col("l.ancestor").as("ancestor"),
          col("r.descendant").as("descendant"))
      val next = current.union(extended)
        .where(col("ancestor") =!= col("descendant"))
        .distinct()
        .localCheckpoint(eager = true)
      val prevCount = current.count()
      val nextCount = next.count()
      current.unpersist()
      current = next
      converged = nextCount == prevCount
      i += 1
    }
    current
  }
}
