package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.vault._

/** Manual end-to-end driver for the Data Vault API: stages a CDC batch
  * with an FK re-point, loads hub/sat/effectivity/link, prints the vault
  * state. Run: sbt "Test/runMain graft.VaultSmoke". */
object VaultSmoke {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val stg = graft.TestScratch.dir("vault-smoke")
    val config = RawVaultConfig(stg, "smoke_stg", "smoke_raw", partitionSize = 2)
    val vault = new RawVault(spark, config, "smoke",
      lit(Timestamp.valueOf("2026-01-01 00:00:00")))
    implicit val c: Conventions = config.conventions

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-02 00:00:00")
    val schema = StructType(Seq(
      StructField("OPERATION", IntegerType, false),
      StructField("LOAD_DATE", TimestampType, false),
      StructField("PublicID", StringType, false),
      StructField("FK", IntegerType, true),
      StructField("V", StringType, false)))
    val target = StructType(Seq(
      StructField("OPERATION", IntegerType, false),
      StructField("LOAD_DATE", TimestampType, false),
      StructField("PublicID", StringType, false),
      StructField("ID", IntegerType, false)))
    def write(name: String, rows: Seq[Row], sch: StructType): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), sch)
        .write.mode("overwrite").parquet(s"$stg/$name.parquet")

    vault.initializeDatabase()
    vault.createHub("LEFT", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createHub("RIGHT", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createSatellite("LEFT", Seq(ColumnDefinition("FK", IntegerType, true),
      ColumnDefinition("V", StringType)))
    vault.createSatellite("RIGHT", Seq(ColumnDefinition("ID", IntegerType)))
    vault.createLink("LEFT__RIGHT", Seq("LEFT_HKEY", "RIGHT_HKEY"))

    val sat = SatelliteDefinition("SAT__LEFT",
      Seq(ColumnDefinition("FK", IntegerType, true), ColumnDefinition("V", StringType)))
    val rsat = SatelliteDefinition("SAT__RIGHT", Seq(ColumnDefinition("ID", IntegerType)))
    val fk = ForeignKey("FK", ColumnReference("RIGHT", "ID"))

    // batch 1: e1 -> r1
    write("LEFT", Seq(Row(0, t0, "e1", 1, "x")), schema)
    write("RIGHT", Seq(Row(0, t0, "r1", 1), Row(0, t0, "r2", 2)), target)
    vault.loadHubFromSourceTable("LEFT", "LEFT", Seq("PublicID"), Seq(sat))
    vault.loadHubFromSourceTable("RIGHT", "RIGHT", Seq("PublicID"), Seq(rsat))
    vault.loadLinkForLinkedSourceTablesFromSourceTables(
      "LEFT", fk, "LEFT__RIGHT", "LEFT_HKEY", "RIGHT_HKEY", Seq("PublicID"))

    // batch 2: e1 re-pointed to r2
    write("LEFT", Seq(Row(4, t1, "e1", 2, "y")), schema)
    vault.loadHubFromSourceTable("LEFT", "LEFT", Seq("PublicID"), Seq(sat))
    vault.loadLinkForLinkedSourceTablesFromSourceTables(
      "LEFT", fk, "LEFT__RIGHT", "LEFT_HKEY", "RIGHT_HKEY", Seq("PublicID"))

    println("=== LNK__LEFT__RIGHT ===")
    spark.table("smoke_raw.`LNK__LEFT__RIGHT`").show(false)
    println("=== SAT__EFFECTIVITY_LEFT__RIGHT ===")
    spark.table("smoke_raw.`SAT__EFFECTIVITY_LEFT__RIGHT`")
      .orderBy("$__LOAD_DATE").show(false)
    println("LINK_ROWS=" + spark.table("smoke_raw.`LNK__LEFT__RIGHT`").count())
    println("EFF_DELETED=" + spark.table("smoke_raw.`SAT__EFFECTIVITY_LEFT__RIGHT`")
      .filter(col("$__DELETED") === true).count())

    // business vault with a SEPARATE derived-table database
    val business = new BusinessVault(spark, "smoke_raw", Some("smoke_biz"))
    business.initializeDatabase()
    business.createPointInTimeTableForSingleSatellite("LEFT", "LEFT")
    println("PIT_IN_BIZ_DB=" + spark.table("smoke_biz.`PIT__LEFT`").count())
    val latest = business.readDataFromHub("LEFT", Seq("PublicID", "V"))
      .orderBy(col("$__LOAD_DATE").desc).head()
    println("LATEST_V=" + latest.getAs[String]("V"))
    spark.stop()
  }
}
