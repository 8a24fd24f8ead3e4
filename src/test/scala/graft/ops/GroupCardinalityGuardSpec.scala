package graft.ops

import graft.SparkSuite

/** Loud-failure guard for the O(groups) driver collects (r13 directive
  * #6): [[Sketches.exactQuantilesByGroup]] and
  * [[Profiling.giniConcentration]] hold groups × ≤65 block subtotals on
  * the driver — the right contract for corpus stats over a handful of
  * sources, an OOM trap if someone passes a row-scale group column. A
  * high-cardinality group column must fail with the fix spelled out,
  * BEFORE the collect, not as a driver OOM. */
class GroupCardinalityGuardSpec extends SparkSuite {

  private def wide = {
    import spark.implicits._
    (0 until 2000).map(i => (s"user_$i", i.toLong)).toDF("g", "v")
  }

  test("exactQuantilesByGroup fails loudly above maxGroups") {
    val e = intercept[IllegalArgumentException] {
      Sketches.exactQuantilesByGroup(wide, "g", "v", Seq((1, 2)),
        maxGroups = 100)
    }
    assert(e.getMessage.contains("2000 distinct"))
    assert(e.getMessage.contains("maxGroups=100"))
  }

  test("giniConcentration fails loudly above maxGroups") {
    val e = intercept[IllegalArgumentException] {
      Profiling.giniConcentration(wide, "g", "v", maxGroups = 100)
    }
    assert(e.getMessage.contains("2000 distinct"))
    assert(e.getMessage.contains("maxGroups=100"))
  }

  test("a deliberately raised cap still computes") {
    val out = Sketches.exactQuantilesByGroup(wide, "g", "v",
      Seq((1, 2)), maxGroups = 4096)
    assert(out.count() === 2000L)
  }
}
