package graft
object PlanScratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    val n = df.collect().length
    val ex = df.queryExecution.executedPlan.toString
    println("ROWS=" + n)
    println("REUSED_EXCHANGE=" + ex.contains("ReusedExchange"))
    println("GENERATES=" + "Generate".r.findAllIn(ex).length)
  }
}
