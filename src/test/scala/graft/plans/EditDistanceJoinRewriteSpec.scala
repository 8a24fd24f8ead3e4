package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimizer rule must turn a naive `levenshtein(a,b) <= 1` join into
  * the deletion-neighborhood equi-join — identical ROWS (multiplicity
  * included), no nested-loop node — skip hash-plannable joins, and honor
  * its kill switch. */
class EditDistanceJoinRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(EditDistanceJoinRewrite))
      spark.experimental.extraOptimizations =
        extra :+ EditDistanceJoinRewrite
    try f
    finally spark.conf.unset(EditDistanceJoinRewrite.EnabledKey)
  }

  private lazy val names: DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")
      .limit(300)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
      .localCheckpoint()

  private def naiveJoin(): DataFrame = {
    val a = names.select(col("id").as("ia"), col("s").as("sa"))
    val b = names.select(col("id").as("ib"), col("s").as("sb"))
    a.join(b, levenshtein(col("sa"), col("sb")) <= 1 &&
      col("ia") < col("ib"))
  }

  test("rewrites the naive levenshtein join: equi-join plan, " +
      "identical pairs, no duplicates") {
    val want = naiveJoin().select("ia", "ib").as[(Long, Long)]
      .collect().toSet
    assert(want.nonEmpty)
    withRule {
      val df = naiveJoin()
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("NestedLoopJoin"),
        "rule did not fire:\n" + plan.take(2000))
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
      val got = df.select("ia", "ib").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, "duplicated pairs")
      assert(got.toSet === want)
    }
  }

  test("equal strings and duplicate input rows keep naive multiplicity") {
    withRule {
      val l = Seq((1L, "same"), (2L, "same"), (2L, "same"))
        .toDF("il", "sl")
      val r = Seq((7L, "same"), (8L, "sam")).toDF("ir", "sr")
      val df = l.join(r, levenshtein(col("sl"), col("sr")) <= 1)
        .select("il", "ir")
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("NestedLoopJoin"), plan.take(2000))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.sorted
      // every (l-row, r-row) pair exactly once: 3 left rows x 2 right
      assert(got === Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 7L),
        (2L, 8L), (2L, 8L)))
    }
  }

  test("reversed operand orientation rewrites too") {
    withRule {
      val a = names.select(col("id").as("ia"), col("s").as("sa"))
      val b = names.select(col("id").as("ib"), col("s").as("sb"))
      // lev(right-side, left-side) and the k on the left of >=
      val df = a.join(b, lit(1) >= levenshtein(col("sb"), col("sa")) &&
        col("ia") < col("ib"))
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("NestedLoopJoin"), plan.take(2000))
      val got = df.select("ia", "ib").as[(Long, Long)].collect().toSet
      val want = naiveJoin().select("ia", "ib").as[(Long, Long)]
        .collect().toSet
      assert(got === want)
    }
  }

  test("joins that already have an equi key are left alone") {
    withRule {
      val a = names.select(col("id").as("ia"), col("s").as("sa"))
      val b = names.select(col("id").as("ib"), col("s").as("sb"))
      val df = a.join(b, col("sa") === col("sb") &&
        levenshtein(col("sa"), col("sb")) <= 1)
      val plan = df.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("__graft_edv"),
        "rule fired on a hash-plannable join:\n" + plan.take(2000))
    }
  }

  test("kill switch disables the rewrite") {
    withRule {
      spark.conf.set(EditDistanceJoinRewrite.EnabledKey, "false")
      val plan = naiveJoin().queryExecution.optimizedPlan.toString()
      assert(!plan.contains("__graft_edv"))
    }
  }

  test("matches editOneJoin on the fixture") {
    withRule {
      val viaRule = naiveJoin().select("ia", "ib").as[(Long, Long)]
        .collect().toSet
      val viaOp = graft.ops.Dedup.editOneJoin(
        names.withColumnRenamed("id", "c_custkey")
          .withColumnRenamed("s", "c_name"), "c_custkey", "c_name")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(viaRule === viaOp)
    }
  }
}
