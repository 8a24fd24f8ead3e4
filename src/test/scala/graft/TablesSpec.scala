package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location: a join between two tables bucketed on the
  * join key must run with NO shuffle exchange on either side. */
class TablesSpec extends SparkSuite {

  test("salted join returns exactly the plain join's rows") {
    import spark.implicits._
    // 90% of fact rows carry one hot key — the salting target
    val fact = (0 until 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 999L, s"v$i")).toDF("k", "payload")
    val dim = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (5L, "f"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "label").collect().toSet
    val salted = Tables.saltedJoin(fact, dim, "k", saltFactor = 8)
      .select("k", "payload", "label").collect().toSet
    assert(salted === plain)
    // the salt spreads the hot key: distinct (k, salt) combos > distinct k
    val spread = Tables.saltedJoin(fact, dim, "k", saltFactor = 8,
      factSaltExpr = None)
    assert(spread.count() === plain.size)
  }

  test("bloom-prefiltered join returns exactly the plain join's rows, " +
    "filters BEFORE the join, and handles an empty dim") {
    import spark.implicits._
    // parquet-backed fact: on a LocalRelation Catalyst folds the
    // membership filter away at planning, which would make the
    // plan-shape assertion vacuous
    val factDir = java.nio.file.Files
      .createTempDirectory("graft_bloom_fact").toString
    (0L until 5000L).map(i => (i % 500, s"p$i"))
      .toDF("fk", "payload").write.mode("overwrite").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    val dim = Seq((3L, "a"), (77L, "b"), (499L, "c")).toDF("dk", "label")
    val out = Tables.bloomPrefilteredJoin(fact, "fk", dim, "dk",
      expectedItems = 10L)
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(out.select("fk", "payload", "label").collect().toSet ===
      plain.select("fk", "payload", "label").collect().toSet)
    // the membership test must sit UNDER the join (scan-side prefilter)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), plan.take(1500))
    // empty dim → empty result without scanning the fact side
    val empty = Tables.bloomPrefilteredJoin(fact, "fk",
      dim.where(lit(false)), "dk")
    assert(empty.count() === 0)
    assert(!empty.queryExecution.executedPlan.toString()
      .contains("parquet")) // fact side never scanned
  }

  test("co-bucketed join plans contain no shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_bkt_docs")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_scores")
    val docs = (0L until 1000L).map(i => (i, s"doc-$i")).toDF("id", "body")
    val scores = (0L until 1000L).map(i => (i, i * 0.5)).toDF("id", "score")
    Tables.saveBucketed(docs, "graft_bkt_docs", "id", 4)
    Tables.saveBucketed(scores, "graft_bkt_scores", "id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_docs")
        .join(spark.table("graft_bkt_scores"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free co-bucketed join, got:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_docs")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_scores")
    }
  }
}
