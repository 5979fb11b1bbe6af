package graft
object PlanScratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // fresh plan per run
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"FRESH$i=${(System.nanoTime()-t0)/1e9}%.3f")
    }
    // one plan, repeated action
    val df = SparkEntry.queries(args(0))(spark, sf)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"REUSE$i=${(System.nanoTime()-t0)/1e9}%.3f")
    }
  }
}
