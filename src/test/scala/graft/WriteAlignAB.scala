package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement main: cost of the writeTable task-align
  * repartition (RawVault.writeTable) on a realistic satellite batch.
  *
  * Same-session INTERLEAVED A/B (the SCALING.md bench-variance method):
  * the v02-shaped satellite batch at the given sf is computed once and
  * cached, then appended as a bucketed table N times per variant,
  * alternating aligned (repartition on the bucket keys before the
  * bucketed write — production behavior) and unaligned (raw bucketed
  * write, one file per task×bucket). Reports per-variant wall times
  * and the resulting file counts, which is the entire trade: the
  * exchange costs one batch-sized shuffle, the explosion costs
  * task×bucket small files on every load forever.
  *
  *   sbt 'Test/runMain graft.WriteAlignAB /root/testdata/sf0.1'
  */
object WriteAlignAB {

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = 32
    val warehouse = graft.TestScratch.dir("graft-ab-wh")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    implicit val c: graft.vault.Conventions = graft.vault.Conventions.default

    // the v02 satellite batch: staged CDC events -> new satellite rows
    val staged = graft.sources.Tables.events(spark, sf)
      .withColumn(c.operation,
        when(col("event_type") === "signup", graft.vault.CdcOp.Create)
          .when(col("event_type") === "error", graft.vault.CdcOp.Delete)
          .when(col("event_type") === "purchase", graft.vault.CdcOp.Update)
          .when(col("event_type") === "view", graft.vault.CdcOp.BeforeUpdate)
          .otherwise(graft.vault.CdcOp.Snapshot))
      .withColumn(c.loadDate, unix_millis(date_trunc("MILLISECOND", col("ts"))))
      .withColumn(c.cdcLoadDate, col(c.loadDate))
      .withColumn(c.recordSource, lit("events"))
      .withColumn(c.hkey, graft.vault.Dv.hash(Seq(col("user_id"))))
    val existing = staged
      .filter(col("event_id") % 3 === 0 &&
        col(c.operation).isin(graft.vault.CdcOp.Create,
          graft.vault.CdcOp.Update, graft.vault.CdcOp.Snapshot))
      .select(col(c.hkey), col(c.loadDate))
    val batch = graft.vault.RawVaultOps
      .newSatelliteRows(staged, existing, Seq("event_type", "props"))
      .cache()
    val rows = batch.count() // materialize once: the A/B times the WRITE

    spark.sql(s"CREATE DATABASE ab LOCATION '$warehouse/ab.db'")

    def fileCount(table: String): Int = {
      val loc = java.nio.file.Paths.get(s"$warehouse/ab.db/$table")
      val s = java.nio.file.Files.walk(loc)
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }

    def write(table: String, aligned: Boolean): Double = {
      val df = if (aligned)
        batch.repartition(buckets, col(c.hkey), col(c.loadDate))
      else batch
      val t0 = System.nanoTime()
      df.write.bucketBy(buckets, c.hkey, c.loadDate)
        .mode("append").saveAsTable(s"ab.$table")
      (System.nanoTime() - t0) / 1e9
    }

    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "5").toInt
    val results = (1 to rounds).flatMap { r =>
      // alternate which variant goes first so ambient drift cancels
      val order = if (r % 2 == 0) Seq(true, false) else Seq(false, true)
      order.map { aligned =>
        val t = write(s"ab_${if (aligned) "a" else "u"}_$r", aligned)
        (aligned, t)
      }
    }
    val (a, u) = results.partition(_._1)
    def stats(xs: Seq[Double]) = {
      val s = xs.sorted
      // true median: average the middle pair on even counts
      val med = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      f"min=${s.head}%.3f median=$med%.3f max=${s.last}%.3f"
    }
    println(s"AB rows=$rows buckets=$buckets rounds=$rounds")
    println(s"AB aligned   ${stats(a.map(_._2))} files=${fileCount("ab_a_1")}")
    println(s"AB unaligned ${stats(u.map(_._2))} files=${fileCount("ab_u_1")}")
    spark.stop()
  }
}
