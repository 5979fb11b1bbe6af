package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the noop sink so
  * every plan executes fully (a count() would let Catalyst prune most
  * of the work).
  *
  * Alongside wall times (host weather, even as min-of-n) the line
  * carries per-query `shuffle_bytes` — total bytes written by every
  * shuffle exchange in the executed plan. Shuffle volume is a PLAN
  * property: deterministic for a given query + data, so readers can
  * diff plans numerically across rounds where timings only suggest.
  */
object Bench {

  /** Sum of shuffle-write bytes over the executed plan (the shared
    * [[graft.plans.PlanWalk]] traversal, reused exchanges not entered),
    * deduped by the metric accumulator — a reused exchange shares its
    * child's metrics, so counting both would double. */
  private def shuffleBytes(plan: SparkPlan): Long =
    graft.plans.PlanWalk.flatten(plan, intoReusedExchange = false)
      .collect { case s: ShuffleExchangeExec => s.metrics.get("shuffleBytesWritten") }
      .flatten.distinctBy(_.id).map(_.value).sum
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // normalize the usual env-toggle spellings; SQLConf only accepts
      // literal true/false and would abort the whole bench otherwise
      .config("spark.sql.adaptive.enabled",
        (!Set("false", "0", "off", "no").contains(
          sys.env.getOrElse("SPARK_GRAFT_AQE", "true").toLowerCase)).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM + parquet footers so timings measure the plans
    SparkEntry.queries("q01_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()

    // INTERLEAVED min-of-n: the full query list runs round-robin
    // `rounds` times in one JVM, so slow ambient phases (this host
    // drifts 2x between same-day runs) hit every query roughly equally
    // instead of biasing whichever query ran during the spike; the
    // per-query minimum then reflects the plan. The max-min spread is
    // emitted alongside so a reader can tell a real regression (min
    // moved) from VM weather (spread exploded). A failed run must not
    // masquerade as a fast one: only successful attempts count, and a
    // query with no successful attempt reports -1 and lands in "errors".
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val names = SparkEntry.benchQueries
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to rounds; name <- names) {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name: $e")
      }
    }
    // one untimed metrics pass per query: executing the retained
    // QueryExecution (instead of the noop writer's internal one) leaves
    // its SQL metrics readable, so the plan's shuffle volume can be
    // summed after the job completes (accumulators are merged on the
    // driver before a job returns)
    val shuffled = names.map { name =>
      name -> (try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan.execute()
          .foreachPartition((_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
        shuffleBytes(df.queryExecution.executedPlan)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name shuffle metrics: $e"); -1L
      })
    }
    val results = names.map(n => n -> times(n))
    val failed = results.collect { case (k, v) if v.isEmpty => "\"" + k + "\"" }
    def jsonMap(f: Vector[Double] => Double): String = results
      .map { case (k, v) =>
        "\"" + k + "\":" + f"${if (v.isEmpty) -1.0 else f(v)}%.3f" }
      .mkString("{", ",", "}")
    val qs = jsonMap(_.min)
    val spread = jsonMap(v => v.max - v.min)
    val shuf = shuffled
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = f"${results.flatMap(_._2.minOption).sum}%.3f"
    val errs = failed.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""spread":$spread,"shuffle_bytes":$shuf,"rounds":$rounds,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
