package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** One-off scale probe for the IVF-PQ coarse-quantizer family (r13
  * directive #3 evidence): times the FLAT N-scaled assignment
  * ([[Similarity.ivfPqTopKScaled]], O(N·√N·dims), √N plan literal)
  * against the TWO-LEVEL route ([[Similarity.ivfPqTopKTwoLevel]],
  * O(N·∜N·dims), ∜N literal + broadcast centroid groups) on each given
  * embeddings directory, printing one JSON line per (dir, variant) with
  * the cell count and the per-1k-row wall — the flat form's per-row cost
  * grows with √N while the two-level form's stays near-flat.
  *
  * Driver-side evidence tooling (like ProbeQ58), not library surface.
  * Usage: runMain graft.tools.ProbeIvf <dir1> <dir2> ... */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timeIt(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    args.foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count()
      val cells = Similarity.defaultIvfCells(n)
      // warm the scan
      e.limit(1).count()
      val q = e.where(col("vec_id") < 5)
      // ---- ASSIGN-STAGE-ONLY timings (the directive's actual claim:
      // flat per-row assign cost grows with √N, two-level stays ~flat;
      // the full-query numbers below carry the shared PQ tail) --------
      val quant = transform(col("embedding"),
        x => round(x.cast("double") * 10000))
      val valid = e.select(col("vec_id").cast("long").as("id"),
          quant.as("qv"))
        .where(col("qv").isNotNull && size(col("qv")) === 64)
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
      valid.count()
      val seedTab = Similarity.hashSeeds(
          e.select(col("vec_id").as("__id"), col("embedding").as("__v")),
          "__id", "__v", cells)
        .select(transform(col("svec"),
          x => round(x.cast("double") * 10000)).as("cv"))
        .collect().map(_.getSeq[Double](0).toArray)
      val cn = seedTab.map(v => v.map(x => x * x).sum)
      val centsSeq: Seq[Seq[Double]] = seedTab.map(_.toSeq).toSeq
      val scorer = transform(typedLit(centsSeq), (c, i) =>
        graft.functions.GraftFunctions.vectorDot(c, col("qv")) * 2 -
          element_at(typedLit(cn.toSeq), i + 1))
      val (interpSec, _) = timeIt {
        valid.withColumn("s", scorer)
          .select((array_position(col("s"), array_max(col("s"))) - 1)
            .cast("int").as("cell"))
          .agg(count(col("cell"))).head(); n
      }
      val (nativeFlatSec, _) = timeIt {
        valid.select(graft.functions.GraftFunctions.ivfArgmaxCell(
            col("qv"), seedTab, cn, null, null, null).as("cell"))
          .agg(count(col("cell"))).head(); n
      }
      val superCount = math.max(1,
        math.ceil(math.sqrt(seedTab.length.toDouble)).toInt)
      def md5hex15(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .substring(0, 15)
      val superIdx = seedTab.indices
        .sortBy(ci => (md5hex15(s"ivf2:$ci"), ci)).take(superCount)
      val superCents = superIdx.map(seedTab).toArray
      val superCn = superIdx.map(cn).toArray
      def superOf(v: Array[Double]): Int =
        (0 until superCount).maxBy { j =>
          val s = superCents(j)
          var d = 0.0; var i = 0
          while (i < v.length) { d += v(i) * s(i); i += 1 }
          (2.0 * d - superCn(j), -j)
        }
      val c2g = seedTab.map(superOf)
      val memberCells = Array.tabulate(superCount)(g =>
        seedTab.indices.filter(ci => c2g(ci) == g).toArray)
      val (nativeTwoSec, _) = timeIt {
        valid.select(graft.functions.GraftFunctions.ivfArgmaxCell(
            col("qv"), superCents, superCn, memberCells, seedTab, cn)
          .as("cell"))
          .agg(count(col("cell"))).head(); n
      }
      valid.unpersist()
      println(s"""{"dir":"$dir","stage":"assign_only","n_vectors":$n,""" +
        s""""cells":$cells,"supers":$superCount,""" +
        s""""interp_flat_sec":$interpSec,""" +
        s""""interp_flat_us_per_row":${interpSec * 1e6 / n},""" +
        s""""native_flat_sec":$nativeFlatSec,""" +
        s""""native_flat_us_per_row":${nativeFlatSec * 1e6 / n},""" +
        s""""native_two_level_sec":$nativeTwoSec,""" +
        s""""native_two_level_us_per_row":${nativeTwoSec * 1e6 / n}}""")
      val (flatSec, fr) = timeIt {
        graft.Lineage.scoped(Similarity.ivfPqTopKScaled(e, "vec_id",
          "embedding", q, "vec_id", "embedding",
          codebookIds = 16L to 23L, inDims = 64, nSub = 8, k = 10,
          trainer = "hash"))(_.count())
      }
      val (twoSec, tr) = timeIt {
        graft.Lineage.scoped(Similarity.ivfPqTopKTwoLevel(e, "vec_id",
          "embedding", q, "vec_id", "embedding",
          codebookIds = 16L to 23L, inDims = 64, nSub = 8, k = 10))(
          _.count())
      }
      println(s"""{"dir":"$dir","n_vectors":$n,"cells":$cells,""" +
        s""""flat_sec":$flatSec,"flat_us_per_row":${flatSec * 1e6 / n},""" +
        s""""two_level_sec":$twoSec,""" +
        s""""two_level_us_per_row":${twoSec * 1e6 / n},""" +
        s""""flat_rows":$fr,"two_level_rows":$tr}""")
    }
    spark.stop()
  }
}
