package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.vault._

/** Manual driver for the metadata-driven vault: schema JSON + mapping
  * YAML generate create/load calls; prints resulting vault state.
  * Run: sbt "Test/runMain graft.MetaSmoke". */
object MetaSmoke {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val stg = graft.TestScratch.dir("meta-smoke")
    val config = RawVaultConfig(stg, "ms_stg", "ms_raw", partitionSize = 2)
    val vault = new RawVault(spark, config, "ms",
      lit(Timestamp.valueOf("2026-01-01 00:00:00")))

    val schema = VaultMetadata.parseSchema(
      """{"name":"demo","tables":[
        {"name":"items","columns":[{"name":"ID","type":"text"},
          {"name":"OWNER","type":"text"},{"name":"PRICE","type":"numeric"}],
         "primaryKey":["ID"],"foreignKeys":[
          {"column":"OWNER","foreignColumn":{"table":"owners","column":"ID"}}]},
        {"name":"owners","columns":[{"name":"ID","type":"text"},
          {"name":"NAME","type":"text"}],"primaryKey":["ID"],"foreignKeys":[]}]}""")
    val mapping = VaultMetadata.parseMapping(
      """hubs:
        |  - {name: HUB__ITEMS, source_table: items, business_keys: [ID]}
        |  - {name: HUB__OWNERS, source_table: owners, business_keys: [ID]}
        |links:
        |  - name: LNK__ITEMS__OWNERS
        |    source_table: items
        |    to:
        |      - {raw_column: ITEMS_HKEY, source_column: ID,
        |         source_foreign_key: {table: items, column: ID}}
        |      - {raw_column: OWNERS_HKEY, source_column: OWNER,
        |         source_foreign_key: {table: owners, column: ID}}
        |satellites:
        |  - {hub: HUB__ITEMS, name: SAT__ITEMS, source_table: items}
        |""".stripMargin)

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def write(name: String, sch: StructType, rows: Row*): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), sch)
        .write.mode("overwrite").parquet(s"$stg/$name.parquet")
    val base = Seq(StructField("OPERATION", IntegerType, false),
      StructField("LOAD_DATE", TimestampType, false))
    write("items", StructType(base ++ Seq(StructField("ID", StringType, false),
      StructField("OWNER", StringType, true), StructField("PRICE", LongType, true))),
      Row(0, t0, "i1", "o1", java.lang.Long.valueOf(10)),
      Row(0, t0, "i2", "o1", java.lang.Long.valueOf(20)))
    write("owners", StructType(base ++ Seq(StructField("ID", StringType, false),
      StructField("NAME", StringType, true))), Row(0, t0, "o1", "ann"))

    val meta = new MetadataVault(vault, schema, mapping)
    meta.createAll()
    meta.loadAll()
    spark.table("ms_raw.`LNK__ITEMS__OWNERS`").show(false)
    println("HUB_ITEMS=" + spark.table("ms_raw.`HUB__ITEMS`").count())
    println("LNK=" + spark.table("ms_raw.`LNK__ITEMS__OWNERS`").count())

    // probe: mapping referencing a table absent from the schema must fail loudly
    val badMapping = VaultMetadata.parseMapping(
      "hubs:\n  - {name: HUB__NOPE, source_table: nope, business_keys: [ID]}\nlinks: []\nsatellites: []\n")
    val failed = util.Try(new MetadataVault(vault, schema, badMapping).createAll()).isFailure
    println("BAD_MAPPING_FAILS=" + failed)
    spark.stop()
  }
}
