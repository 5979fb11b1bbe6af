package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** One-off analysis: shuffle bytes + exchange count for every query. */
object ShuffleSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        df.queryExecution.executedPlan.execute()
          .foreachPartition((_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
        val nodes = graft.plans.PlanWalk.flatten(
          df.queryExecution.executedPlan, intoReusedExchange = false)
        val accs = nodes
          .collect { case s: ShuffleExchangeExec => s.metrics.get("shuffleBytesWritten") }
          .flatten.distinctBy(_.id)
        println(f"SWEEP $name%-28s exchanges=${accs.size}%2d bytes=${accs.map(_.value).sum}%10d")
      } catch { case e: Throwable =>
        println(s"SWEEP $name ERROR ${e.toString.take(160)}")
      }
    }
  }
}
