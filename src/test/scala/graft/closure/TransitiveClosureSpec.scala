package graft.closure

import graft.SparkSuite
import graft.terminology.HierarchicalElement

/** Distributed closure vs an in-memory DFS oracle, including cycles —
  * mirrors the reference's cycle test
  * (ValueSetUdfsTest.testHasCyclicAncestor:234-248). */
class TransitiveClosureSpec extends SparkSuite {

  /** In-memory oracle: DFS with visited set per node (the reference's
    * driver-side algorithm, Hierarchies.java:295-307). */
  private def dfsOracle(edges: Seq[(Int, Int)]): Set[(Int, Int)] = {
    val parents = edges.groupMap(_._2)(_._1) // child -> parents
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.flatMap { n =>
      val visited = scala.collection.mutable.Set.empty[Int]
      def walk(c: Int): Unit = parents.getOrElse(c, Nil).foreach { p =>
        if (!visited.contains(p)) { visited += p; walk(p) }
      }
      walk(n)
      (visited - n).map(a => (a, n))
    }.toSet
  }

  private def run(edges: Seq[(Int, Int)],
      linear: Boolean = false): Set[(Int, Int)] = {
    import spark.implicits._
    val df = edges.toDF("parent", "child")
    TransitiveClosure.closureLong(spark, df, linear = linear)
      .as[(Long, Long)].collect().map { case (a, d) => (a.toInt, d.toInt) }
      .toSet
  }

  test("chain closure") {
    assert(run(Seq(1 -> 2, 2 -> 3, 3 -> 4)) ===
      Set((1, 2), (2, 3), (3, 4), (1, 3), (1, 4), (2, 4)))
  }

  test("diamond closure") {
    val edges = Seq(1 -> 2, 1 -> 3, 2 -> 4, 3 -> 4)
    assert(run(edges) === dfsOracle(edges))
  }

  test("cycle-safe: closure of a cycle terminates and excludes self-loops") {
    val got = run(Seq(1 -> 2, 2 -> 3, 3 -> 1))
    // every distinct ordered pair is in the closure, no self-pairs
    assert(got === Set((1, 2), (2, 3), (3, 1), (1, 3), (2, 1), (3, 2)))
  }

  test("typed hierarchy closure (system+value keys)") {
    import spark.implicits._
    val edges = Seq(
      HierarchicalElement("s", "a", "s", "b"),
      HierarchicalElement("s", "b", "s", "c")).toDS()
    val got = TransitiveClosure.closure(spark, edges)
      .as[HierarchicalElement].collect().toSet
    assert(got === Set(
      HierarchicalElement("s", "a", "s", "b"),
      HierarchicalElement("s", "b", "s", "c"),
      HierarchicalElement("s", "a", "s", "c")))
  }

  test("property: closure matches DFS oracle on random graphs (incl cycles)") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(12)((rnd.nextInt(8), rnd.nextInt(8)))
        .filter(e => e._1 != e._2).distinct
      assert(run(edges) === dfsOracle(edges), s"seed=$seed edges=$edges")
    }
  }

  test("linear mode produces the same closure as prefix doubling") {
    (10 to 13).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(14)((rnd.nextInt(9), rnd.nextInt(9)))
        .filter(e => e._1 != e._2).distinct
      assert(run(edges, linear = true) === dfsOracle(edges),
        s"seed=$seed edges=$edges")
    }
    // deep chain exercises many linear rounds
    val chain = (1 until 12).map(i => i -> (i + 1))
    assert(run(chain, linear = true) === dfsOracle(chain))
  }
}
