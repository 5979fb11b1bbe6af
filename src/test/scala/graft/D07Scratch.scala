package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** One-off d07 regression investigation (VERDICT r2 item 2): time the
  * engine's hinted band self-join against an unhinted variant, 5 runs
  * each, interleaved, in one JVM.
  */
object D07Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, sfDir)

    def hinted() = Dedup.lshCandidateCounts(docs, "text", "doc_id", k = 6, bandWidth = 2)

    def unhinted() = {
      val banded = Dedup.lshBands(
        Dedup.minHashSignatures(docs, "text", "doc_id", 6, 3), "doc_id", 6, 2)
      val a = banded.select(col("doc_id").as("a_id"), col("band").as("a_band"))
      val b = banded.select(col("doc_id").as("b_id"), col("band").as("b_band"))
      a.join(b, col("a_band") === col("b_band") && col("a_id") =!= col("b_id"))
        .select(col("a_id").as("doc_id"), col("b_id"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    }

    def time(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    time(hinted()) // warm footers + JIT
    val h = collection.mutable.Buffer[Double]()
    val u = collection.mutable.Buffer[Double]()
    for (i <- 1 to 5) {
      h += time(hinted())
      u += time(unhinted())
    }
    println(f"HINTED   min=${h.min}%.3f med=${h.sorted.apply(2)}%.3f all=${h.map(x => f"$x%.3f").mkString(",")}")
    println(f"UNHINTED min=${u.min}%.3f med=${u.sorted.apply(2)}%.3f all=${u.map(x => f"$x%.3f").mkString(",")}")
    spark.stop()
  }
}
