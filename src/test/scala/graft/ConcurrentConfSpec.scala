package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

/** Session isolation for loop-scoped conf overrides (r11 directive #8).
  *
  * Every iterative fixpoint loop pins `spark.sql.adaptive.enabled=false`
  * (checkpoints only capture outputPartitioning without the AQE
  * wrapper). A save/set/restore on the SHARED session conf would leak
  * that override to any concurrent query on the same session — fine for
  * the single-threaded bench, wrong for a shared library session. The
  * loops therefore run on `spark.newSession()` via
  * [[ConfScope.withIsolatedSession]]; these tests pin the isolation
  * with a real two-thread race and the rebind hand-off semantics.
  */
class ConcurrentConfSpec extends SparkSuite {
  import spark.implicits._

  test("a concurrent query observes adaptive.enabled=true while " +
    "PageRank iterates with it off") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    // ring + chords, enough iterations that the loop is genuinely
    // mid-flight while the main thread samples the shared session conf
    val n = 200
    val edges = (0 until n).flatMap { i =>
      Seq((i.toLong, ((i + 1) % n).toLong),
        (i.toLong, ((i + 7) % n).toLong))
    }.toDF("src", "dst")
    // Sampling is driven by the loop's OWN job starts (a SparkListener),
    // not wall-clock polling: a 12-iteration loop launches >= 12 jobs
    // no matter how fast the machine is, so the "did a concurrent
    // observation actually land mid-flight" assertion cannot flake on a
    // warmed-up runner the way a sleep-counted loop can. In the
    // regression world (save/set/restore on the SHARED session conf)
    // the override is visible for the loop's whole span, so
    // job-start-time samples catch it.
    val sampled = new java.util.concurrent.atomic.AtomicInteger(0)
    val leaked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (spark.conf.get("spark.sql.adaptive.enabled") == "true")
          sampled.incrementAndGet()
        else leaked.set(true)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val ranks = Future {
        graft.ops.Graphs.pageRankFixedPoint(spark, edges,
          iterations = 12).count()
      }
      while (!ranks.isCompleted) {
        // the caller-session conf must NEVER show the loop's override
        assert(spark.conf.get("spark.sql.adaptive.enabled") === "true",
          "loop conf override leaked to the shared session")
        // and a real concurrent query on the shared session still runs
        assert(spark.range(100).where(col("id") % 10 === 0)
          .count() === 10L)
      }
      assert(Await.result(ranks, 1.minute) === n.toLong)
      // bounded drain of the async listener bus (the loop provably ran
      // >= 12 jobs; their events just need delivery), then assert
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (sampled.get() <= 5 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(!leaked.get(),
        "a job started while the shared session showed the loop's " +
          "adaptive.enabled=false override")
      assert(sampled.get() > 5, s"expected >5 job-start conf samples " +
        s"from a 12-iteration loop, saw ${sampled.get()}")
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("withIsolatedSession: override visible inside, never outside; " +
    "rebind hands the frame across with its data intact; views dropped") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val out = ConfScope.withIsolatedSession(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "graft.test.marker" -> "inside") { (iso, rebind) =>
      assert(iso.conf.get("spark.sql.adaptive.enabled") === "false")
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
      val r = rebind(df)
      assert(r.sparkSession ne spark)
      assert(r.orderBy("id").collect().map(_.getLong(0)).toSeq ===
        Seq(1L, 2L))
      r.count()
    }
    assert(out === 2L)
    assert(spark.conf.getOption("graft.test.marker").isEmpty)
    // the hand-off views were dropped on exit
    assert(spark.sql("SHOW TABLES IN global_temp").collect()
      .map(_.getString(1)).forall(!_.startsWith("graft_iso_")))
  }

  test("shufflePartitions override runs isolated for closure and " +
    "near-dup clustering (results unchanged, no session leak)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("parent", "child")
    val c = graft.closure.TransitiveClosure.closureLong(spark, edges,
        shufflePartitions = Some(3))
      .as[(Long, Long)].collect().toSet
    assert(c === Set((1L, 2L), (2L, 3L), (1L, 3L)))
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = graft.ops.Dedup.nearDupClusters(pairs,
        shufflePartitions = Some(3))
      .as[(Long, Long)].collect().toMap
    assert(cl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }
}
