package graft.vault

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Metadata-driven vault construction (schema JSON + mapping YAML →
  * generated create/load calls) and the derived SCD2 satellite view.
  * Formats follow features/imdb-schema.json + features/imdb-mapping.yaml.
  */
class MetadataSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schemaJson =
    """{
      "name": "imdb",
      "tables": [
        {"name": "movies",
         "columns": [
           {"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
           {"name": "YEAR", "type": "integer"}, {"name": "DIRECTOR", "type": "text"},
           {"name": "RATING", "type": "numeric"}],
         "primaryKey": ["ID"],
         "foreignKeys": [{"column": "DIRECTOR",
           "foreignColumn": {"table": "directors", "column": "ID"}}]},
        {"name": "directors",
         "columns": [{"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"}],
         "primaryKey": ["ID"], "foreignKeys": []},
        {"name": "castings",
         "columns": [{"name": "MOVIE_ID", "type": "text"}, {"name": "ACTOR_ID", "type": "text"}],
         "primaryKey": ["MOVIE_ID", "ACTOR_ID"], "foreignKeys": []},
        {"name": "actors",
         "columns": [{"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"}],
         "primaryKey": ["ID"], "foreignKeys": []}
      ]}"""

  private val mappingYaml =
    """hubs:
      |  - name: HUB__MOVIES
      |    source_table: movies
      |    business_keys: [ID]
      |  - name: HUB__DIRECTORS
      |    source_table: directors
      |    business_keys: [ID]
      |  - name: HUB__ACTORS
      |    source_table: actors
      |    business_keys: [ID]
      |links:
      |  - name: LNK__MOVIES__DIRECTORS
      |    source_table: movies
      |    to:
      |      - raw_column: MOVIES_HKEY
      |        source_column: ID
      |        source_foreign_key: {table: movies, column: ID}
      |      - raw_column: DIRECTORS_HKEY
      |        source_column: DIRECTOR
      |        source_foreign_key: {table: directors, column: ID}
      |  - name: LNK__CASTINGS
      |    source_table: castings
      |    to:
      |      - raw_column: MOVIE_HKEY
      |        source_column: MOVIE_ID
      |        source_foreign_key: {table: movies, column: ID}
      |      - raw_column: ACTOR_HKEY
      |        source_column: ACTOR_ID
      |        source_foreign_key: {table: actors, column: ID}
      |satellites:
      |  - hub: HUB__MOVIES
      |    name: SAT__MOVIES
      |    source_table: movies
      |  - hub: HUB__DIRECTORS
      |    name: SAT__DIRECTORS
      |    source_table: directors
      |""".stripMargin

  test("schema and mapping documents parse") {
    val schema = VaultMetadata.parseSchema(schemaJson)
    assert(schema.tables.map(_.name) === Seq("movies", "directors", "castings", "actors"))
    assert(schema.table("movies").column("YEAR").dataType === IntegerType)
    assert(schema.table("movies").column("RATING").dataType === LongType)
    assert(schema.table("movies").foreignKeys.head.toTable === "directors")

    val mapping = VaultMetadata.parseMapping(mappingYaml)
    assert(mapping.hubs.map(_.name) ===
      Seq("HUB__MOVIES", "HUB__DIRECTORS", "HUB__ACTORS"))
    assert(mapping.links.head.to.map(_.rawColumn) ===
      Seq("MOVIES_HKEY", "DIRECTORS_HKEY"))
    assert(mapping.satellites.size === 2)

    // the reference format's link-level self-leg (raw_column next to
    // source_table) must normalize into a leg, not be dropped
    val refStyle = VaultMetadata.parseMapping(
      """hubs: []
        |links:
        |  - name: LNK__MOVIES_DIRECTORS
        |    raw_column: MOVIES__HKEY
        |    source_column: ID
        |    source_table: movies
        |    to:
        |      - raw_column: DIRECTORS__HKEY
        |        source_column: DIRECTOR
        |        source_foreign_key: {table: directors, column: ID}
        |satellites: []
        |""".stripMargin)
    assert(refStyle.links.head.to.map(_.rawColumn) ===
      Seq("MOVIES__HKEY", "DIRECTORS__HKEY"))
    assert(refStyle.links.head.to.head.fkTable === "movies")
  }

  test("metadata drives create + load end to end") {
    val t0 = Timestamp.valueOf("2024-05-01 00:00:00")
    val stagingDir = graft.TestScratch.dir("graft-meta")
    val config = RawVaultConfig(stagingDir, "meta_stg", "meta_raw", partitionSize = 2)
    val vault = new RawVault(spark, config, "meta_test",
      lit(Timestamp.valueOf("2026-01-01 00:00:00")))

    def write(name: String, schema: StructType, rows: Row*): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .write.mode("overwrite").parquet(s"$stagingDir/$name.parquet")

    def srcSchema(cols: (String, DataType)*): StructType = StructType(
      Seq(StructField("OPERATION", IntegerType, false),
        StructField("LOAD_DATE", TimestampType, false)) ++
        cols.map { case (n, t) => StructField(n, t, true) })

    write("movies", srcSchema("ID" -> StringType, "NAME" -> StringType,
      "YEAR" -> IntegerType, "DIRECTOR" -> StringType, "RATING" -> LongType),
      Row(0, t0, "m1", "Heat", Integer.valueOf(1995), "d1", java.lang.Long.valueOf(82)),
      Row(0, t0, "m2", "Ronin", Integer.valueOf(1998), "d1", java.lang.Long.valueOf(79)))
    write("directors", srcSchema("ID" -> StringType, "NAME" -> StringType),
      Row(0, t0, "d1", "Mann"))
    write("actors", srcSchema("ID" -> StringType, "NAME" -> StringType),
      Row(0, t0, "a1", "De Niro"), Row(0, t0, "a2", "Pacino"))
    write("castings", srcSchema("MOVIE_ID" -> StringType, "ACTOR_ID" -> StringType),
      Row(0, t0, "m1", "a1"), Row(0, t0, "m2", "a1"), Row(0, t0, "m2", "a2"))

    val meta = new MetadataVault(vault,
      VaultMetadata.parseSchema(schemaJson), VaultMetadata.parseMapping(mappingYaml))
    meta.createAll()
    meta.loadAll()

    assert(spark.table("meta_raw.`HUB__MOVIES`").count() === 2)
    assert(spark.table("meta_raw.`HUB__DIRECTORS`").count() === 1)
    assert(spark.table("meta_raw.`HUB__ACTORS`").count() === 2)
    assert(spark.table("meta_raw.`SAT__MOVIES`").count() === 2)
    assert(spark.table("meta_raw.`LNK__MOVIES__DIRECTORS`").count() === 2)
    assert(spark.table("meta_raw.`LNK__CASTINGS`").count() === 3)

    // link effectivity satellites load alongside the links
    assert(spark.table("meta_raw.`SAT__EFFECTIVITY_CASTINGS`").count() === 3)

    // replay is still idempotent through the generated calls
    meta.loadAll()
    assert(spark.table("meta_raw.`HUB__MOVIES`").count() === 2)
    assert(spark.table("meta_raw.`LNK__CASTINGS`").count() === 3)
    assert(spark.table("meta_raw.`SAT__EFFECTIVITY_CASTINGS`").count() === 3)

    // SCD2 derived view over a versioned satellite
    write("movies", srcSchema("ID" -> StringType, "NAME" -> StringType,
      "YEAR" -> IntegerType, "DIRECTOR" -> StringType, "RATING" -> LongType),
      Row(4, Timestamp.valueOf("2024-06-01 00:00:00"), "m1", "Heat", Integer.valueOf(1995),
        "d1", java.lang.Long.valueOf(90)))
    meta.loadHubsFor("movies")
    implicit val c: Conventions = config.conventions
    val scd2 = BusinessVaultOps.scd2View(spark.table("meta_raw.`SAT__MOVIES`"))
    val m1 = scd2.filter(col("NAME") === "Heat").orderBy(c.loadDate).collect()
    assert(m1.length === 2)
    assert(m1(0).getAs[Timestamp](c.loadEndDate) === m1(1).getAs[Timestamp](c.loadDate))
    assert(m1(1).getAs[Timestamp](c.loadEndDate) === null)
    val current = BusinessVaultOps.scd2Current(spark.table("meta_raw.`SAT__MOVIES`"))
    assert(current.filter(col("NAME") === "Heat").head().getAs[Long]("RATING") === 90L)
  }

  test("initializeDatabase honors an explicit warehouse LOCATION") {
    val loc = graft.TestScratch.dir("graft-loc")
    val config = RawVaultConfig(loc, "loc_stg", "loc_raw", partitionSize = 2,
      stagingPreparedBasePath = Some(s"$loc/stg.db"),
      rawBasePath = Some(s"$loc/raw.db"))
    val vault = new RawVault(spark, config, "loc_test")
    vault.initializeDatabase()
    val dbLoc = spark.sql("DESCRIBE DATABASE loc_raw")
      .filter(col("info_name") === "Location").head().getString(1)
    assert(dbLoc.endsWith("raw.db"))
    // created tables land under the explicit database location
    vault.createHub("THINGS", Seq(ColumnDefinition("ID", StringType)))
    val tblLoc = spark.sql("DESCRIBE EXTENDED loc_raw.`HUB__THINGS`")
      .filter(col("col_name") === "Location").head().getString(1)
    assert(tblLoc.contains("raw.db"))

    val bv = new BusinessVault(spark, "loc_raw",
      businessDatabase = Some("loc_biz"),
      basePath = Some(s"$loc/biz.db"))(config.conventions)
    bv.initializeDatabase()
    val bizLoc = spark.sql("DESCRIBE DATABASE loc_biz")
      .filter(col("info_name") === "Location").head().getString(1)
    assert(bizLoc.endsWith("biz.db"))
  }
}
