package graft
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1"))
    val ev = graft.sources.EventTime.normalize(spark.read.parquet(dir + "/events.parquet"))
    val hourUs = 3600L * 1000000L
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), unix_micros(col("ts")).as("pt"))
      .localCheckpoint()
    val windows = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("window_id"), unix_micros(col("ts")).as("ws"),
        (unix_micros(col("ts")) + hourUs).as("we")).localCheckpoint()
    def win(kind: String, idAs: String) =
      ev.where(col("event_type") === kind)
        .select(col("event_id").as(idAs),
          unix_micros(col("ts")).as(s"${idAs}_s"),
          (unix_micros(col("ts")) + hourUs).as(s"${idAs}_e")).localCheckpoint()
    val p = win("purchase", "pid"); val e = win("error", "eid")
    for (w <- Seq(hourUs/16, hourUs/8, hourUs/4, hourUs/2, hourUs, 2*hourUs, 4*hourUs)) {
      val t0 = System.nanoTime()
      val n = graft.ops.RangeJoin.pointInInterval(clicks, "click_id", "pt",
        windows, "window_id", "ws", "we", binWidth = w).count()
      val t1 = System.nanoTime()
      val n2 = graft.ops.RangeJoin.intervalOverlap(p, "pid", "pid_s", "pid_e",
        e, "eid", "eid_s", "eid_e", binWidth = w).count()
      val t2 = System.nanoTime()
      println(f"w=$w%12d  q58=${(t1-t0)/1e9}%6.2f s n=$n  q59=${(t2-t1)/1e9}%6.2f s n=$n2")
    }
    val auto = graft.ops.RangeJoin.autoBinWidth(clicks, "pt", windows, "ws", "we")
    val autoIv = graft.ops.RangeJoin.autoBinWidthIntervals(p, "pid_s", "pid_e", e, "eid_s", "eid_e")
    println(s"autoBinWidth=$auto autoIntervals=$autoIv hour=$hourUs")
    spark.stop()
  }
}
