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

/** Generate an sf1 ANALOG under /root/sf1 by key-shifted 10x copies of
  * sf0.1 — for the scaling slope spot-check only (the driver's real
  * generator is not in the repo, so this preserves per-key densities
  * and distributions rather than matching bytes; correctness gates
  * never read it). Dimension tables (region, nation) stay fixed, the
  * TPC-H convention.
  *
  * Payload perturbation (r22 — fixes the r21 "verbatim twins"
  * artifact, VERDICT #6): copy i's document text is CAESAR-SHIFTED by
  * i over [a-z]/[A-Z] — token counts, token lengths, line structure,
  * and the within-copy duplicate/near-dup structure are all EXACTLY
  * preserved (one bijection applied to the whole copy), while no
  * shingle/token/line hash collides across copies — so the text-dedup
  * slopes (d06–d08, d40…) measure a 10x corpus instead of a corpus of
  * 10x exact twins (r21's d07 shuffled 65x for 10x data because every
  * doc had 9 twins). Copy i's embeddings are CYCLICALLY ROTATED by
  * (i*7) % 64 dimensions — norms and all within-copy cosines are
  * exactly preserved (the rotation is orthogonal and shared by the
  * copy), while cross-copy cosine falls to the vectors'
  * autocorrelation at that lag (generically far below any near-dup
  * threshold), so d09/e-family slopes measure real block growth.
  * Usage: Test/runMain graft.R21Sf1Gen [outDir]
  */
object R21Sf1Gen {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val out = if (args.length > 0) args(0) else "/root/sf1"
    val src = "/root/testdata/sf0.1"
    val spark = R21Tools.benchSession("sf1gen")
    def rd(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def off(n: String, c: String): Long =
      rd(n).agg(max(col(c))).collect()(0).getLong(0) + 1
    val (oC, oS, oP, oO, oE, oU, oD, oV) = (
      off("customer", "c_custkey"), off("supplier", "s_suppkey"),
      off("part", "p_partkey"), off("orders", "o_orderkey"),
      off("events", "event_id"),
      rd("events").agg(max(col("user_id"))).collect()(0).getLong(0) + 1,
      off("documents", "doc_id"), off("embeddings", "vec_id"))
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def caesar(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c
      else translate(c, lower + upper,
        lower.drop(i % 26) + lower.take(i % 26) +
          upper.drop(i % 26) + upper.take(i % 26))
    def rot(c: org.apache.spark.sql.Column, i: Int, dim: Int) = {
      val k = (i * 7) % dim
      if (k == 0) c
      else concat(slice(c, k + 1, dim - k), slice(c, 1, k))
    }
    def tenfold(n: String, shifts: Map[String, Long],
        perturb: (org.apache.spark.sql.DataFrame, Int) =>
          org.apache.spark.sql.DataFrame = (df, _) => df): Unit = {
      val base = rd(n)
      val copies = (0 until 10).map { i =>
        perturb(shifts.foldLeft(base) { case (df, (c, o)) =>
          df.withColumn(c, col(c) + lit(i * o)) }, i)
      }
      copies.reduce(_ union _).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[sf1gen] $n x10")
    }
    Seq("region", "nation").foreach { n =>
      rd(n).coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[sf1gen] $n (fixed dim)")
    }
    tenfold("customer", Map("c_custkey" -> oC))
    tenfold("supplier", Map("s_suppkey" -> oS))
    tenfold("part", Map("p_partkey" -> oP))
    tenfold("orders", Map("o_orderkey" -> oO, "o_custkey" -> oC))
    tenfold("lineitem",
      Map("l_orderkey" -> oO, "l_partkey" -> oP, "l_suppkey" -> oS))
    tenfold("events", Map("event_id" -> oE, "user_id" -> oU))
    tenfold("documents", Map("doc_id" -> oD),
      (df, i) => df.withColumn("text", caesar(col("text"), i)))
    tenfold("embeddings", Map("vec_id" -> oV),
      (df, i) => df.withColumn("embedding", rot(col("embedding"), i, 64)))
    spark.stop()
  }
}
