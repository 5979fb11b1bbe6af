package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Phase timing for d11 at sf0.1: pairs pipeline vs iteration vs output. */
object D11Scratch {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d11] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      val pairs = t(s"run$i pairs-construct")(
        Dedup.lshCandidatePairs(Tables.documents(spark, sfDir), "text", "doc_id",
          k = 6, bandWidth = 2))
      val n = t(s"run$i pairs-count")(pairs.count())
      println(s"[d11] run$i n_pairs=$n")
      val groups = t(s"run$i groups-construct+iterate")(Dedup.nearDupGroups(pairs))
      t(s"run$i output-write")(
        groups.write.format("noop").mode("overwrite").save())
    }

    // inline copy of the iteration with per-round timing
    {
      val pairs = Dedup.lshCandidatePairs(Tables.documents(spark, sfDir),
        "text", "doc_id", k = 6, bandWidth = 2).persist()
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .persist()
      var labels = t("init-labels")(
        edges.groupBy("src").agg(min("dst").as("lbl"))
          .select(col("src").as("id"), least(col("src"), col("lbl")).as("lbl"))
          .localCheckpoint(true))
      var converged = false; var round = 0
      while (!converged && round < 20) {
        val viaNeighbors = edges.join(labels, edges("dst") === labels("id"))
          .select(edges("src").as("id"), col("lbl").as("lbl"),
            lit(null).cast("long").as("old"))
        val folded = t(s"round$round folded")(
          labels.select(col("id").as("id"), col("lbl").as("lbl"), col("lbl").as("old"))
            .union(viaNeighbors)
            .groupBy("id").agg(min("lbl").as("lbl"), min("old").as("old"))
            .localCheckpoint(true))
        val jumped = t(s"round$round jumped")(
          folded.alias("a").join(folded.alias("b"), col("a.lbl") === col("b.id"), "left")
            .select(col("a.id").as("id"),
              least(col("a.lbl"), coalesce(col("b.lbl"), col("a.lbl"))).as("lbl"),
              col("a.old").as("old"))
            .localCheckpoint(true))
        converged = t(s"round$round check")(
          jumped.filter(col("lbl") =!= col("old")).isEmpty)
        labels = jumped.drop("old")
        round += 1
      }
      println(s"[d11] rounds=$round")
    }
    spark.stop()
  }
}
