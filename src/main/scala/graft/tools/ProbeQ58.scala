package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc q58 cost breakdown (not part of the driver contract): times the
  * bounded planning probe and the join separately, repeated, at sf0.1. */
object ProbeQ58 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val hourUs = 3600L * 1000000L
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val ev = graft.sources.EventTime.normalize(
      spark.read.parquet(s"$dir/events.parquet"))
    ev.limit(1).count()
    for (i <- 1 to 3) {
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          unix_micros(col("ts")).as("pt"))
      val windows = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("window_id"),
          unix_micros(col("ts")).as("ws"),
          (unix_micros(col("ts")) + hourUs).as("we"))
      val w = t(s"probe $i") {
        graft.ops.RangeJoin.autoBinWidth(clicks, "pt", windows, "ws",
          "we", fallback = hourUs)
      }
      println(s"  width=$w (hour=$hourUs)")
      t(s"join  $i") {
        graft.ops.RangeJoin.pointInInterval(clicks, "click_id", "pt",
          windows, "window_id", "ws", "we", binWidth = w).count()
      }
    }
    spark.stop()
  }
}
