package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Round-21 measurement tooling (guide §1: measure first).
  *
  * Both mains build a BENCH-SHAPED session (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so what they report is what the
  * driver's bench runs, not the 4-core test session.
  */
object R21Tools {
  def benchSession(tag: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"r21-$tag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.TestScratch.dir(s"r21-$tag-wh"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Dump `.explain("formatted")` for the named queries (default: the
  * bench set) into a directory as <query>_<suffix>.txt. Usage:
  *   Test/runMain graft.R21PlanDump <outDir> <suffix> [q1,q2,...] [sfDir]
  */
object R21PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").toSeq
      else SparkEntry.benchQueries
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(Paths.get(outDir))
    val spark = R21Tools.benchSession("plandump")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}

/** Time EVERY SparkEntry query once (or N times, reporting the min)
  * through the noop sink, bench-shaped session. Prints a sorted table so
  * the expensive non-bench operators are visible. Usage:
  *   Test/runMain graft.R21TimingSweep [sfDir] [rounds] [prefixes]
  */
object R21TimingSweep {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 1
    val prefixes =
      if (args.length > 2) args(2).split(",").toSeq.filter(_.nonEmpty)
      else Seq.empty
    val spark = R21Tools.benchSession("timing")
    def selected(n: String) =
      prefixes.isEmpty || prefixes.exists(n.startsWith)
    // warm JVM/parquet footers like Bench does
    SparkEntry.queries("q01_agg")(spark, sf)
      .write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(selected)
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to rounds; name <- names) {
      spark.sparkContext.setJobDescription(s"r21-sweep:$name")
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = times(name) :+ dt
        println(f"[sweep] $name $dt%.3f")
      } catch { case e: Throwable =>
        println(s"[sweep] $name FAILED: ${e.toString.take(200)}")
      }
    }
    val sorted = names.map(n => n -> times(n))
      .collect { case (n, v) if v.nonEmpty => n -> v.min }
      .sortBy(-_._2)
    println("=== r21 timing sweep (min of %d) sf=%s ===".format(rounds, sf))
    sorted.foreach { case (n, t) => println(f"$t%8.3f  $n") }
    println(f"TOTAL ${sorted.map(_._2).sum}%.3f over ${sorted.size} queries")
    spark.stop()
  }
}
