package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling/plan-inspection main (not part of the driver contract).
  * Usage: sbt "runMain graft.Prof [explain|time]". */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = args.headOption.getOrElse("time")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    import graft.ops._
    if (mode == "explain") {
      println("=== q26 bruteForceTopK plan ===")
      Similarity.bruteForceTopK(e, "vec_id", "embedding",
        e.where(col("vec_id") < 5), "vec_id", "embedding", 10)
        .explain("formatted")
      println("=== q23 minhashCandidatePairs plan ===")
      Dedup.minhashCandidatePairs(df, "doc_id", "text", 2, 16, 8)
        .explain("formatted")
    } else {
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
      }
      time("warmup count") { df.count() }
      time("jaccard exact") { println(Dedup.jaccardNearDupsExact(df, "doc_id", "text", 3, 0.5).count()) }
      time("jaccard exact(2)") { println(Dedup.jaccardNearDupsExact(df, "doc_id", "text", 3, 0.5).count()) }
      time("minhash pairs") { println(Dedup.minhashCandidatePairs(df, "doc_id", "text", 2, 16, 8).count()) }
      time("minhash pairs(2)") { println(Dedup.minhashCandidatePairs(df, "doc_id", "text", 2, 16, 8).count()) }
      time("minhash neardups") { println(Dedup.minhashNearDups(df, "doc_id", "text", 2, 16, 8, 0.2).count()) }
      time("simhash neardups") { println(Dedup.simhashNearDups(df, "doc_id", "text", 3, 2).count()) }
      time("ann brute") { println(Similarity.bruteForceTopK(e, "vec_id", "embedding", e.where(col("vec_id") < 5), "vec_id", "embedding", 10).count()) }
      time("ann lsh") { println(Similarity.lshTopK(e, "vec_id", "embedding", e.where(col("vec_id") < 5), "vec_id", "embedding", 64, 10, 6).count()) }
    }
    spark.stop()
  }
}
