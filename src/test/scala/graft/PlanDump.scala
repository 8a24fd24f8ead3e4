package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
