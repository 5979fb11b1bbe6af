package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the noop sink so
  * every plan executes fully (a count() would let Catalyst prune most
  * of the work).
  */
object Bench {
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

    // best of 2 runs per query: the second run reuses warmed parquet
    // footers/JIT, so the minimum reflects the plan, not ambient noise.
    // A failed run must not masquerade as a fast one: only successful
    // attempts count, and a query with no successful attempt reports -1
    // and lands in "errors".
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name: $e"); None
        }
      }
      name -> times.minOption.getOrElse(-1.0)
    }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).filter(_ >= 0).sum}%.3f"
    val errs = failed.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
