package graft

import graft.sources.Tables

/** Manual smoke driver: reads the fixture tables through the public
  * reader API. Run: sbt "Test/runMain graft.Smoke [sfDir]". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = TestSpark.spark
    val li = Tables.lineitem(spark, sfDir)
    li.show(3)
    println("LINEITEM_ROWS=" + li.count())
    val emb = Tables.embeddings(spark, sfDir)
    emb.printSchema()
    println("EMB_ROWS=" + emb.count())
    val bad = util.Try(Tables.table(spark, sfDir, "nope").count()).isFailure
    println("MISSING_TABLE_FAILS=" + bad)

    // persist + probe the bucketed IVF similarity index
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val base = Similarity.withNorm(Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    val assigned = Similarity.assignToCentroids(
      base, base.filter(col("vec_id") % 50 === 0), "vec_id")
    spark.sql("CREATE DATABASE IF NOT EXISTS smoke_idx")
    Similarity.buildIvfIndex(assigned, "smoke_idx.ivf", buckets = 4)
    val probe = Similarity.probeIvfIndex(spark, "smoke_idx.ivf",
      col("vec_id") < 3, "vec_id", 3)
    probe.show(9)
    println("IVF_PROBE_ROWS=" + probe.count())
    spark.stop()
  }
}
