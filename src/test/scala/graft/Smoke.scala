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
    spark.stop()
  }
}
