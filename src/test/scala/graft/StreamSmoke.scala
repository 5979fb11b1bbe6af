package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.CdcStream
import graft.vault._

/** Manual driver for the streaming CDC loader path. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stagingDir = graft.TestScratch.dir("ss-stg")
    val config = RawVaultConfig(stagingDir, "ss_stg", "ss_raw", partitionSize = 2)
    val vault = new RawVault(spark, config, "ss",
      lit(Timestamp.valueOf("2026-01-01 00:00:00")))
    vault.initializeDatabase()
    vault.createHub("THINGS", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createSatellite("THINGS", Seq(ColumnDefinition("V", StringType)))
    val sat = SatelliteDefinition("SAT__THINGS", Seq(ColumnDefinition("V", StringType)))

    val input = MemoryStream[(Int, Timestamp, String, String)]
    val stream = input.toDF().toDF("OPERATION", "LOAD_DATE", "PublicID", "V")
    val query = CdcStream.foreachBatchLoader(stream) { batch =>
      System.err.println(s"[smoke] batch rows=${batch.count()} cols=${batch.columns.mkString(",")}")
      val staged = RawVaultOps.prepareStaged(batch, "ss",
        "LOAD_DATE", "OPERATION", Seq("PublicID"))(config.conventions)
      vault.loadHub(staged, "THINGS", Seq("PublicID"), Seq(sat))
      System.err.println(s"[smoke] hub now=${spark.table("ss_raw.`HUB__THINGS`").count()}")
    }.start()

    input.addData((2, Timestamp.valueOf("2024-01-01 00:00:00"), "x1", "v1"))
    query.processAllAvailable()
    System.err.println(s"[smoke] after batch1: ${query.status}")
    query.stop()
    println("FINAL_HUB=" + spark.table("ss_raw.`HUB__THINGS`").count())
    spark.stop()
  }
}
