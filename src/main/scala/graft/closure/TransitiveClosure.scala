package graft.closure

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Lineage._
import org.apache.spark.sql.functions._

/** Distributed transitive closure over a parent-child edge list.
  *
  * The reference computes ancestor expansion entirely on the driver — it
  * collects every edge, walks an in-memory graph per node, and re-parallelizes
  * the result in 100k-row slices (Hierarchies.expandElements,
  * /root/reference/bunsen-spark/.../codes/Hierarchies.java:314-391). That is
  * driver-memory-bound and cannot scale past a few million edges.
  *
  * This implementation keeps the computation on the cluster as an iterative
  * self-join, with two strategies:
  *
  *  - **Prefix doubling** (default): after round i, `closure` holds every
  *    path of length <= 2^i, so the round count is O(log d) for depth d.
  *    Each round joins closure ⋈ closure — whose build side keyed on
  *    `ancestor` is skewed at hub nodes (a root is the ancestor of every
  *    descendant), which AQE skew-splitting must absorb. Right choice for
  *    DEEP graphs (chains, DAG closures) where d is large.
  *  - **Linear** (`linear = true`): each round extends paths by ONE edge:
  *    closure ⋈ edges on closure.descendant == edge.parent. The probe side
  *    is keyed by descendant (≤ d rows per key — no hub skew), the build
  *    side is the original edge list (often broadcastable), and rounds = d.
  *    Right choice for SHALLOW hierarchies — real code systems (LOINC,
  *    SNOMED) are 10–20 deep, so d rounds of a skew-free join beat log₂(d)
  *    rounds of a skewed one.
  *
  * Both are cycle-safe (`distinct` + self-loop drop reach a fixpoint) and
  * localCheckpoint() every round to truncate the growing lineage. The
  * fixpoint test carries the previous round's count forward, so each round
  * runs exactly ONE counting job.
  *
  * At 100 TB scale: equi-joins shuffle by key, `distinct` partially
  * aggregates map-side, AQE rebalances; no driver materialization anywhere.
  */
object TransitiveClosure {

  /** Closure over (ancestorSystem, ancestorValue, descendantSystem,
    * descendantValue) edges; returns every transitive pair, paths >= 1. */
  def closure(
      spark: SparkSession,
      edges: org.apache.spark.sql.Dataset[_],
      maxIterations: Int = 25,
      linear: Boolean = false,
      shufflePartitions: Option[Int] = None): DataFrame =
    shufflePartitions match {
      case None =>
        // derive the loop width from the edge count (r12 directive #8)
        // and re-enter through the isolated-session branch; a 3-edge
        // fixture then runs 1-task rounds while the session width stays
        // the ceiling for big graphs (and the session conf untouched).
        // Checkpoint-then-count (r13 advice): counting the raw caller
        // plan would re-execute the (possibly expensive) edge pipeline
        // a second time when closureImpl builds cleanEdges — the exact
        // double-execution nearDupClusters/pageRankFixedPoint fixed
        // (measured +27% on q47). The checkpoint is retired once the
        // loop's own checkpoints carry the result.
        val ck = edges.toDF().truncateLineage(eager = false)
        val out = closure(spark, ck, maxIterations, linear,
          Some(graft.ConfScope.autoLoopPartitions(ck.count(),
            graft.ConfScope.sessionShuffleWidth(spark))))
        graft.Lineage.retire(ck)
        out
      case Some(n) =>
        // isolated child session: the width override can never be
        // observed by a concurrent query on the caller's session
        graft.ConfScope.withIsolatedSession(spark,
          "spark.sql.shuffle.partitions" -> n.toString) { (iso, rebind) =>
          closureImpl(iso, rebind(edges.toDF()), maxIterations, linear)
        }
    }

  private def closureImpl(
      spark: SparkSession,
      edges: org.apache.spark.sql.Dataset[_],
      maxIterations: Int,
      linear: Boolean): DataFrame = {
    val cols = Seq("ancestorSystem", "ancestorValue",
      "descendantSystem", "descendantValue")
    val cleanEdges = edges.toDF().select(cols.map(col): _*)
      .where(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .distinct()
      .truncateLineage(eager = false)
    var current = cleanEdges
    var prevCount = current.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val left = current.select(
        col("ancestorSystem"), col("ancestorValue"),
        col("descendantSystem").as("midSystem"),
        col("descendantValue").as("midValue"))
      // prefix doubling: closure ⋈ closure; linear: closure ⋈ edges
      val rightSrc = if (linear) cleanEdges else current
      val right = rightSrc.select(
        col("ancestorSystem").as("midSystem"),
        col("ancestorValue").as("midValue"),
        col("descendantSystem"), col("descendantValue"))
      val extended = left.join(right, Seq("midSystem", "midValue"))
        .select(cols.map(col): _*)
      // lazy checkpoint: the count() below is the materializing action, so
      // each round runs exactly one job (checkpoint + fixpoint test fused)
      val next = current.union(extended)
        // drop self-loops introduced by cycles: a node is not its own ancestor
        .where(!(col("ancestorSystem") === col("descendantSystem") &&
          col("ancestorValue") === col("descendantValue")))
        .distinct()
        .truncateLineage(eager = false)
      val nextCount = next.count()
      // round k's frame is dead once round k+1 materialized (but the
      // initial edge frame feeds EVERY round in linear mode — never it)
      if (!(current eq cleanEdges)) graft.Lineage.retire(current)
      current = next
      converged = nextCount == prevCount
      prevCount = nextCount
      i += 1
    }
    requireConverged(converged, linear, maxIterations)
    // the cleaned edge frame is dead once the final round checkpointed
    // (it fed every round in linear mode; the result no longer reads
    // it): retire its blocks so repeated closures on one session don't
    // accumulate edge-frame checkpoints
    if (!(current eq cleanEdges)) graft.Lineage.retire(cleanEdges)
    current
  }

  /** A truncated closure is silently-wrong data: in linear mode the depth
    * budget is maxIterations+1 hops (realistic to exceed), so non-
    * convergence must fail loudly instead of returning partial ancestors. */
  private def requireConverged(converged: Boolean, linear: Boolean,
      maxIterations: Int): Unit = {
    if (!converged) {
      val reach = if (linear) s"${maxIterations + 1} hops"
        else s"2^$maxIterations hops"
      throw new IllegalStateException(
        s"Transitive closure did not converge within $maxIterations rounds " +
          s"($reach); raise maxIterations for deeper graphs")
    }
  }

  /** Closure over arbitrary (parent, child) long-keyed edges — used by the
    * relational-analog correctness queries. Output columns (ancestor,
    * descendant). */
  def closureLong(
      spark: SparkSession,
      edges: DataFrame, // columns: parent, child
      maxIterations: Int = 25,
      linear: Boolean = false,
      shufflePartitions: Option[Int] = None): DataFrame =
    shufflePartitions match {
      case None =>
        // checkpoint-then-count: same double-execution fix as [[closure]]
        val ck = edges.truncateLineage(eager = false)
        val out = closureLong(spark, ck, maxIterations, linear,
          Some(graft.ConfScope.autoLoopPartitions(ck.count(),
            graft.ConfScope.sessionShuffleWidth(spark))))
        graft.Lineage.retire(ck)
        out
      case Some(n) =>
        graft.ConfScope.withIsolatedSession(spark,
          "spark.sql.shuffle.partitions" -> n.toString) { (iso, rebind) =>
          closureLongImpl(iso, rebind(edges), maxIterations, linear)
        }
    }

  private def closureLongImpl(
      spark: SparkSession,
      edges: DataFrame,
      maxIterations: Int,
      linear: Boolean): DataFrame = {
    val cleanEdges = edges
      .select(col("parent").as("ancestor"), col("child").as("descendant"))
      .where(col("parent").isNotNull && col("child").isNotNull)
      .distinct()
      .truncateLineage(eager = false)
    var current = cleanEdges
    var prevCount = current.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val rightSrc = if (linear) cleanEdges else current
      val extended = current.as("l")
        .join(rightSrc.as("r"), col("l.descendant") === col("r.ancestor"))
        .select(col("l.ancestor").as("ancestor"),
          col("r.descendant").as("descendant"))
      // lazy checkpoint: count() materializes it — one job per round
      val next = current.union(extended)
        .where(col("ancestor") =!= col("descendant"))
        .distinct()
        .truncateLineage(eager = false)
      val nextCount = next.count()
      // round k's frame is dead once round k+1 materialized (but the
      // initial edge frame feeds EVERY round in linear mode — never it)
      if (!(current eq cleanEdges)) graft.Lineage.retire(current)
      current = next
      converged = nextCount == prevCount
      prevCount = nextCount
      i += 1
    }
    requireConverged(converged, linear, maxIterations)
    // the cleaned edge frame is dead once the final round checkpointed
    // (it fed every round in linear mode; the result no longer reads
    // it): retire its blocks so repeated closures on one session don't
    // accumulate edge-frame checkpoints
    if (!(current eq cleanEdges)) graft.Lineage.retire(cleanEdges)
    current
  }

  /** Incremental closure maintenance: given an already-CLOSED relation
    * `closure` (ancestor, descendant) and a batch of NEW edges `delta`
    * (parent, child), returns the closure of the combined graph WITHOUT
    * recomputing from the base edges — the view-maintenance form a
    * terminology service needs when a code system ships an update (the
    * reference recomputes hierarchies wholesale on import; at 100 TB of
    * ancestry pairs that is a full re-closure for a handful of edges).
    *
    * Semi-naive: every genuinely new path uses ≥ 1 delta edge, so seed
    * M = (C+I) ∘ D ∘ (C+I) — each delta edge pre/post-extended through
    * the OLD closure (three bounded joins) — then prefix-double M on
    * itself (chains of MULTIPLE delta edges) until fixpoint, and union
    * with C. Rounds = ⌈log₂(max delta edges on any path)⌉, typically 1-2
    * for a code-system update, vs the full re-closure's depth-of-graph
    * rounds over ALL pairs; every join is keyed, nothing is driver-side.
    */
  def addEdges(
      spark: SparkSession,
      closure: DataFrame, // columns: ancestor, descendant (closed)
      delta: DataFrame, // columns: parent, child
      maxIterations: Int = 25,
      shufflePartitions: Option[Int] = None): DataFrame =
    graft.ConfScope.withIsolatedSession(spark) { (iso, rebind) =>
      addEdgesImpl(iso, rebind(closure), rebind(delta), maxIterations,
        shufflePartitions)
    }

  /** TWO shuffle widths (r13 advice): the prefix-doubling loop iterates
    * a DELTA-sized frame and is sized by it, but the semi-naive seed
    * joins (cd/dc/cdc) and the final union each touch the FULL closure —
    * sizing those by a handful of delta edges would run one reducer
    * over the entire closure. Seed joins and the final union run at the
    * large-side width; only the loop rounds narrow to the seed's actual
    * row count. An explicit `fixedWidth` pins both (caller knows best). */
  private def addEdgesImpl(
      iso: SparkSession,
      closure: DataFrame,
      delta: DataFrame,
      maxIterations: Int,
      fixedWidth: Option[Int]): DataFrame = {
      val sessW = graft.ConfScope.sessionShuffleWidth(iso)
      val c = closure.select(col("ancestor"), col("descendant"))
        .distinct().truncateLineage(eager = false)
      // the delta feeds FOUR plan branches (d, cd, dc, m's union) — the
      // checkpoint also stops 4x re-execution of the caller's delta plan
      val d = delta
        .select(col("parent").as("ancestor"),
          col("child").as("descendant"))
        .where(col("parent").isNotNull && col("child").isNotNull)
        .distinct().truncateLineage(eager = false)
      val joinW = fixedWidth.getOrElse(
        graft.ConfScope.autoLoopPartitions(math.max(c.count(), d.count()),
          sessW))
      iso.conf.set("spark.sql.shuffle.partitions", joinW.toString)
      val cd = c.as("c").join(d.as("d"),
          col("c.descendant") === col("d.ancestor"))
        .select(col("c.ancestor").as("ancestor"),
          col("d.descendant").as("descendant"))
      val dc = d.as("d").join(c.as("c"),
          col("d.descendant") === col("c.ancestor"))
        .select(col("d.ancestor").as("ancestor"),
          col("c.descendant").as("descendant"))
      val cdc = cd.as("l").join(c.as("c2"),
          col("l.descendant") === col("c2.ancestor"))
        .select(col("l.ancestor").as("ancestor"),
          col("c2.descendant").as("descendant"))
      var m = d.unionAll(cd).unionAll(dc).unionAll(cdc)
        .where(col("ancestor") =!= col("descendant"))
        .distinct().truncateLineage(eager = false)
      // the seed's count materializes it AT the large-side width; the
      // loop then narrows to the seed's true size
      var prevCount = m.count()
      iso.conf.set("spark.sql.shuffle.partitions", fixedWidth.getOrElse(
        graft.ConfScope.autoLoopPartitions(prevCount, sessW)).toString)
      graft.Lineage.retire(d)
      var converged = false
      var i = 0
      while (!converged && i < maxIterations) {
        val ext = m.as("l").join(m.as("r"),
            col("l.descendant") === col("r.ancestor"))
          .select(col("l.ancestor").as("ancestor"),
            col("r.descendant").as("descendant"))
        val next = m.union(ext)
          .where(col("ancestor") =!= col("descendant"))
          .distinct()
          .truncateLineage(eager = false)
        val nextCount = next.count()
        graft.Lineage.retire(m)
        m = next
        converged = nextCount == prevCount
        prevCount = nextCount
        i += 1
      }
      requireConverged(converged, linear = false, maxIterations)
      // the final union reads the FULL closure again — restore the
      // large-side width before handing the lazy result to the caller
      // (its terminal action materializes under the session's width)
      iso.conf.set("spark.sql.shuffle.partitions", joinW.toString)
      c.unionAll(m).distinct()
  }
}
