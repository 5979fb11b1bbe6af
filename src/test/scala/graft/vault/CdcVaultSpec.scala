package graft.vault

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end CDC load semantics over a movie domain: three batches with
  * interleaved SNAPSHOT/CREATE/DELETE/BEFORE_UPDATE/UPDATE operations,
  * asserting the vault-layer invariants the reference's test suite
  * encodes (hub uniqueness, satellite versioning, effectivity flags,
  * link re-point/null handling, PIT intervals, idempotent replay).
  * Reference scenario: cdc/test_datavault.py:454-954.
  */
class CdcVaultSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-01-02 00:00:00")
  private val t2 = Timestamp.valueOf("2024-01-03 03:17:00")
  private val t3 = Timestamp.valueOf("2024-01-03 04:00:00")
  private val t4 = Timestamp.valueOf("2024-01-04 10:00:00")
  private val t5 = Timestamp.valueOf("2024-01-05 10:42:00")
  private val loadClock = Timestamp.valueOf("2026-01-01 00:00:00")

  private val SNAP = 0; private val DEL = 1; private val CRE = 2
  private val BUPD = 3; private val UPD = 4

  private lazy val stagingDir =
    graft.TestScratch.dir("graft-stg")

  private lazy val config = RawVaultConfig(
    stagingBasePath = stagingDir,
    stagingPreparedDatabase = "stg_prepared",
    rawDatabase = "raw_vault",
    partitionSize = 2)

  private lazy val vault =
    new RawVault(spark, config, "cdc_test", lit(loadClock))
  private implicit lazy val c: Conventions = config.conventions
  private lazy val business = {
    vault // force init
    new BusinessVault(spark, config.rawDatabase)
  }

  private val movieSchema = StructType(Seq(
    StructField("OPERATION", IntegerType, false),
    StructField("LOAD_DATE", TimestampType, false),
    StructField("PublicID", StringType, false),
    StructField("NAME", StringType, false),
    StructField("YEAR", IntegerType, false),
    StructField("DIRECTOR_ID", IntegerType, true),
    StructField("RATING", DoubleType, false),
    StructField("RANK", IntegerType, false),
    StructField("retired", IntegerType, false)))

  private val directorSchema = StructType(Seq(
    StructField("OPERATION", IntegerType, false),
    StructField("LOAD_DATE", TimestampType, false),
    StructField("PublicID", StringType, false),
    StructField("ID", IntegerType, false),
    StructField("NAME", StringType, false)))

  private val castingSchema = StructType(Seq(
    StructField("OPERATION", IntegerType, false),
    StructField("LOAD_DATE", TimestampType, false),
    StructField("MOVIE_ID", StringType, false),
    StructField("ACTOR_ID", StringType, false)))

  private def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private def writeBatch(name: String, data: DataFrame): Unit =
    data.write.mode("overwrite").parquet(s"$stagingDir/$name.parquet")

  private val movieSat = SatelliteDefinition(
    "SAT__MOVIES",
    Seq(ColumnDefinition("NAME", StringType), ColumnDefinition("YEAR", IntegerType),
      ColumnDefinition("DIRECTOR_ID", IntegerType, nullable = true),
      ColumnDefinition("RATING", DoubleType), ColumnDefinition("RANK", IntegerType),
      ColumnDefinition("retired", IntegerType)))

  private val directorSat = SatelliteDefinition(
    "SAT__DIRECTORS",
    Seq(ColumnDefinition("ID", IntegerType), ColumnDefinition("NAME", StringType)))

  private def raw(name: String): DataFrame =
    spark.table(s"${config.rawDatabase}.`$name`")

  private def hk(values: Any*): String = {
    // md5(concat_ws(',', ...)) — the engine's hash, recomputed indepenently
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(values.map(String.valueOf).mkString(",").getBytes("UTF-8"))
    bytes.map("%02x".format(_)).mkString
  }

  test("setup: databases and vault tables") {
    vault.initializeDatabase()
    vault.createHub("MOVIES", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createHub("DIRECTORS", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createHub("ACTORS", Seq(ColumnDefinition("PublicID", StringType)))
    vault.createSatellite("MOVIES", movieSat.attributes)
    vault.createSatellite("DIRECTORS", directorSat.attributes)
    vault.createLink("MOVIES__DIRECTORS", Seq("MOVIES_HKEY", "DIRECTORS_HKEY"))
    vault.createLink("MOVIES__ACTORS", Seq("MOVIES_HKEY", "ACTORS_HKEY"))
    assert(raw("HUB__MOVIES").count() === 0)
    assert(raw("SAT__EFFECTIVITY_MOVIES").count() === 0)
    assert(raw("LNK__MOVIES__DIRECTORS").count() === 0)
  }

  test("batch 1: snapshot creates hubs, satellites, effectivity") {
    writeBatch("MOVIES", df(movieSchema,
      Row(SNAP, t0, "m1", "Heat", 1995, 1, 8.2, 12, 0),
      Row(SNAP, t0, "m2", "Ronin", 1998, 1, 7.9, 40, 0),
      Row(SNAP, t0, "m3", "Blow", 2001, null, 7.4, 77, 0)))
    writeBatch("DIRECTORS", df(directorSchema,
      Row(SNAP, t0, "d1", 1, "Mann"),
      Row(SNAP, t0, "d2", 2, "Frankenheimer")))

    vault.loadHubFromSourceTable("MOVIES", "MOVIES", Seq("PublicID"), Seq(movieSat))
    vault.loadHubFromSourceTable("DIRECTORS", "DIRECTORS", Seq("PublicID"), Seq(directorSat))

    val hub = raw("HUB__MOVIES")
    assert(hub.count() === 3)
    assert(hub.select(c.hkey).distinct().count() === 3)
    assert(hub.filter(col("PublicID") === "m1").select(c.hkey).head().getString(0) === hk("m1"))

    val sat = raw("SAT__MOVIES")
    assert(sat.count() === 3)
    assert(sat.filter(col(c.hkey) === hk("m1")).select("RATING").head().getDouble(0) === 8.2)

    val eff = raw("SAT__EFFECTIVITY_MOVIES")
    assert(eff.count() === 3)
    assert(eff.filter(col(c.deleted) === true).count() === 0)
  }

  test("batch 1 replay is idempotent") {
    val counts = Seq("HUB__MOVIES", "SAT__MOVIES", "SAT__EFFECTIVITY_MOVIES")
      .map(t => t -> raw(t).count()).toMap
    vault.loadHubFromSourceTable("MOVIES", "MOVIES", Seq("PublicID"), Seq(movieSat))
    counts.foreach { case (t, n) => assert(raw(t).count() === n, s"table $t grew on replay") }
  }

  test("batch 1: FK link MOVIES -> DIRECTORS") {
    vault.loadLinkForLinkedSourceTablesFromSourceTables(
      "MOVIES", ForeignKey("DIRECTOR_ID", ColumnReference("DIRECTORS", "ID")),
      "MOVIES__DIRECTORS", "MOVIES_HKEY", "DIRECTORS_HKEY",
      Seq("PublicID"))

    val lnk = raw("LNK__MOVIES__DIRECTORS")
    // m1->d1, m2->d1; m3 has null FK -> no link row
    assert(lnk.count() === 2)
    val expected = Set(hk(hk("m1"), hk("d1")), hk(hk("m2"), hk("d1")))
    assert(lnk.select(c.hkey).collect().map(_.getString(0)).toSet === expected)

    val eff = raw("SAT__EFFECTIVITY_MOVIES__DIRECTORS")
    assert(eff.filter(col(c.deleted) === true).count() === 0)
    assert(eff.count() === 2)
  }

  test("batch 2: update, delete, link re-point and FK nulling") {
    writeBatch("MOVIES", df(movieSchema,
      Row(BUPD, t2, "m1", "Heat", 1995, 1, 8.2, 12, 0),
      Row(UPD, t2, "m1", "Heat", 1995, 2, 8.3, 9, 0), // re-point d1 -> d2
      Row(DEL, t3, "m2", "Ronin", 1998, 1, 7.9, 40, 0),
      Row(BUPD, t2, "m3", "Blow", 2001, null, 7.4, 77, 0),
      Row(UPD, t2, "m3", "Blow", 2001, null, 7.6, 60, 0)))

    vault.loadHubFromSourceTable("MOVIES", "MOVIES", Seq("PublicID"), Seq(movieSat))

    // hub unchanged (no new business keys)
    assert(raw("HUB__MOVIES").count() === 3)

    // BEFORE_UPDATE rows are excluded: m1 has exactly 2 versions (t0, t2)
    val satM1 = raw("SAT__MOVIES").filter(col(c.hkey) === hk("m1"))
    assert(satM1.count() === 2)
    val latest = satM1.orderBy(col(c.loadDate).desc).head()
    assert(latest.getAs[Double]("RATING") === 8.3)
    assert(latest.getAs[Int]("RANK") === 9)

    // delete shows up as effectivity flag, not as row removal
    val effM2 = raw("SAT__EFFECTIVITY_MOVIES").filter(col(c.hkey) === hk("m2"))
    assert(effM2.filter(col(c.deleted) === true).count() === 1)
    assert(raw("SAT__MOVIES").filter(col(c.hkey) === hk("m2")).count() === 1)

    // link load: m1 re-pointed to d2, m2 deleted (FK gone from batch view)
    vault.loadLinkForLinkedSourceTablesFromSourceTables(
      "MOVIES", ForeignKey("DIRECTOR_ID", ColumnReference("DIRECTORS", "ID")),
      "MOVIES__DIRECTORS", "MOVIES_HKEY", "DIRECTORS_HKEY",
      Seq("PublicID"))

    val lnk = raw("LNK__MOVIES__DIRECTORS")
    assert(lnk.count() === 3) // (m1,d1), (m2,d1), (m1,d2)
    val effLnk = raw("SAT__EFFECTIVITY_MOVIES__DIRECTORS")
    val m1d1 = hk(hk("m1"), hk("d1"))
    val m1d2 = hk(hk("m1"), hk("d2"))
    // old m1->d1 pair end-dated, new m1->d2 pair live
    val m1d1Latest = effLnk.filter(col(c.hkey) === m1d1)
      .orderBy(col(c.loadDate).desc).head()
    assert(m1d1Latest.getAs[Boolean](c.deleted) === true)
    val m1d2Rows = effLnk.filter(col(c.hkey) === m1d2)
    assert(m1d2Rows.count() === 1)
    assert(m1d2Rows.head().getAs[Boolean](c.deleted) === false)
  }

  test("batch 3: re-create after delete") {
    writeBatch("MOVIES", df(movieSchema,
      Row(CRE, t4, "m2", "Ronin", 1998, 2, 8.0, 31, 0)))
    vault.loadHubFromSourceTable("MOVIES", "MOVIES", Seq("PublicID"), Seq(movieSat))

    assert(raw("HUB__MOVIES").count() === 3) // m2 hub row not duplicated
    val effM2 = raw("SAT__EFFECTIVITY_MOVIES").filter(col(c.hkey) === hk("m2"))
      .orderBy(col(c.loadDate).desc)
    assert(effM2.head().getAs[Boolean](c.deleted) === false) // alive again
    assert(effM2.count() === 3) // t0 created, t3 deleted, t4 re-created
    val satM2 = raw("SAT__MOVIES").filter(col(c.hkey) === hk("m2"))
      .orderBy(col(c.loadDate).desc)
    assert(satM2.head().getAs[Double]("RATING") === 8.0)
  }

  test("multilink: castings resolve hub keys through hub lookup") {
    writeBatch("ACTORS", df(directorSchema,
      Row(SNAP, t0, "a1", 10, "De Niro"),
      Row(SNAP, t0, "a2", 11, "Pacino")))
    vault.loadHubFromSourceTable("ACTORS", "ACTORS", Seq("PublicID"), Nil)

    writeBatch("CASTINGS", df(castingSchema,
      Row(SNAP, t1, "m1", "a1"),
      Row(SNAP, t1, "m1", "a2"),
      Row(SNAP, t1, "m2", "a1")))
    vault.loadLinkFromSourceTable("CASTINGS",
      Seq(
        LinkedHubDefinition("MOVIES", "MOVIES_HKEY",
          ForeignKey("MOVIE_ID", ColumnReference("HUB__MOVIES", "PublicID"))),
        LinkedHubDefinition("ACTORS", "ACTORS_HKEY",
          ForeignKey("ACTOR_ID", ColumnReference("HUB__ACTORS", "PublicID")))),
      "MOVIES__ACTORS")

    val lnk = raw("LNK__MOVIES__ACTORS")
    assert(lnk.count() === 3)
    assert(lnk.filter(col("MOVIES_HKEY") === hk("m1")).count() === 2)
    assert(lnk.select(c.hkey).head().getString(0).length === 32)
    // replay: no growth
    vault.loadLinkFromSourceTable("CASTINGS",
      Seq(
        LinkedHubDefinition("MOVIES", "MOVIES_HKEY",
          ForeignKey("MOVIE_ID", ColumnReference("HUB__MOVIES", "PublicID"))),
        LinkedHubDefinition("ACTORS", "ACTORS_HKEY",
          ForeignKey("ACTOR_ID", ColumnReference("HUB__ACTORS", "PublicID")))),
      "MOVIES__ACTORS")
    assert(raw("LNK__MOVIES__ACTORS").count() === 3)
  }

  test("reference tables: plain and code (grouped) with replay") {
    val tlSchema = StructType(Seq(
      StructField("OPERATION", IntegerType, false),
      StructField("LOAD_DATE", TimestampType, false),
      StructField("ID", StringType, false),
      StructField("DESCRIPTION", StringType, false)))
    vault.createReferenceTable("TYPELIST_1",
      ColumnDefinition("ID", StringType),
      Seq(ColumnDefinition("DESCRIPTION", StringType)))
    vault.createCodeReferenceTable("TYPELISTS",
      ColumnDefinition("ID", StringType),
      Seq(ColumnDefinition("DESCRIPTION", StringType)))

    writeBatch("TYPELIST_1", df(tlSchema,
      Row(SNAP, t0, "tl1", "genre: action"),
      Row(SNAP, t0, "tl2", "genre: drama")))
    vault.loadReferencesFromSourceTable("TYPELIST_1", "TYPELIST_1", "ID", Seq("DESCRIPTION"))
    assert(raw("REF__TYPELIST_1").count() === 2)
    vault.loadReferencesFromSourceTable("TYPELIST_1", "TYPELIST_1", "ID", Seq("DESCRIPTION"))
    assert(raw("REF__TYPELIST_1").count() === 2)

    vault.loadCodeReferencesFromSourceTable("TYPELIST_1", "TYPELISTS", "ID", Seq("DESCRIPTION"))
    val ref = raw("REF__TYPELISTS")
    assert(ref.count() === 2)
    assert(ref.select(c.group).distinct().head().getString(0) === "typelist_1")
  }

  test("PIT intervals: versions closed by successor or delete") {
    business.createPointInTimeTableForSingleSatellite("MOVIES", "MOVIES")
    val pit = raw("PIT__MOVIES")

    // m1: [t0, t2), [t2, max)
    val m1 = pit.filter(col(c.hkey) === hk("m1")).orderBy(c.loadDate).collect()
    assert(m1.length === 2)
    assert(m1(0).getAs[Timestamp](c.loadDate) === t0)
    assert(m1(0).getAs[Timestamp](c.loadEndDate) === t2)
    assert(m1(1).getAs[Timestamp](c.loadEndDate).after(t5))

    // m2: [t0, t3=delete), [t4, max)
    val m2 = pit.filter(col(c.hkey) === hk("m2")).orderBy(c.loadDate).collect()
    assert(m2.length === 2)
    assert(m2(0).getAs[Timestamp](c.loadEndDate) === t3)
    assert(m2(1).getAs[Timestamp](c.loadDate) === t4)
    assert(m2(1).getAs[Timestamp](c.loadEndDate).after(t5))
  }

  test("business vault read path: latest attributes through hub+sat+pit") {
    val data = business.readDataFromHub("MOVIES",
      Seq("PublicID", "NAME", "RATING", "RANK"))
    val m1Latest = data.filter(col("PublicID") === "m1")
      .orderBy(col(c.loadDate).desc).head()
    assert(m1Latest.getAs[Double]("RATING") === 8.3)
    assert(m1Latest.getAs[Int]("RANK") === 9)
    val m2Latest = data.filter(col("PublicID") === "m2")
      .orderBy(col(c.loadDate).desc).head()
    assert(m2Latest.getAs[Double]("RATING") === 8.0)
  }

  test("golden tables: exact SAT__MOVIES and effectivity contents after all batches") {
    // feature-file style assertion (features/raw-vault.feature): the
    // exact row multiset, including computed HDIFFs
    def satRow(pid: String, t: Timestamp, name: String, year: Int,
        director: Option[Int], rating: Double, rank: Int): (String, String, Timestamp) = {
      val attrs = Seq(name, year.toString) ++ director.map(_.toString) ++
        Seq(rating.toString, rank.toString, "0")
      (hk(pid), hk(attrs: _*), t)
    }
    val expectedSat = Set(
      satRow("m1", t0, "Heat", 1995, Some(1), 8.2, 12),
      satRow("m1", t2, "Heat", 1995, Some(2), 8.3, 9),
      satRow("m2", t0, "Ronin", 1998, Some(1), 7.9, 40),
      satRow("m2", t4, "Ronin", 1998, Some(2), 8.0, 31),
      satRow("m3", t0, "Blow", 2001, None, 7.4, 77),
      satRow("m3", t2, "Blow", 2001, None, 7.6, 60))
    val actualSat = raw("SAT__MOVIES")
      .select(col(c.hkey), col(c.hdiff), col(c.loadDate)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2))).toSet
    assert(actualSat === expectedSat)

    val expectedEff = Set(
      (hk("m1"), t0, false), (hk("m2"), t0, false), (hk("m3"), t0, false),
      (hk("m2"), t3, true), (hk("m2"), t4, false))
    val actualEff = raw("SAT__EFFECTIVITY_MOVIES")
      .select(col(c.hkey), col(c.loadDate), col(c.deleted)).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getBoolean(2))).toSet
    assert(actualEff === expectedEff)
  }

  test("link traversal: joinLinkedHubs zips movie and director histories") {
    business.createPointInTimeTableForSingleSatellite("DIRECTORS", "DIRECTORS")
    val joined = business.joinLinkedHubs("MOVIES", "DIRECTORS", "MOVIES__DIRECTORS",
      "MOVIES_HKEY", "DIRECTORS_HKEY",
      fromAttributes = Seq("PublicID", "RATING"), toAttributes = Seq("NAME"))
    // m1 carries both link rows (d1 then re-pointed d2) across both of
    // its versions — links persist, deletions live in link effectivity
    val m1 = joined.filter(col("PublicID") === "m1")
    assert(m1.count() === 4)
    assert(m1.select("NAME").distinct().collect().map(_.getString(0)).toSet ===
      Set("Mann", "Frankenheimer"))
    // every emitted interval is a genuine overlap
    assert(joined.filter(col(c.loadDate) >= col(c.loadEndDate)).count() === 0)
  }

  test("zip-historized join: movie versions x link validity") {
    // join the historized movie read with itself on PublicID as a
    // smoke-check of overlap semantics: every version overlaps itself
    val left = business.readDataFromHub("MOVIES", Seq("PublicID", "RATING"))
    val right = business.readDataFromHub("MOVIES", Seq("PublicID", "RANK"))
      .withColumnRenamed("PublicID", "PublicID_r")
    val zipped = BusinessVaultOps.zipHistorizedDataframes(
      left, right, left("PublicID") === right("PublicID_r"), "inner")
    // m1 has 2 versions; self-overlap yields the 2 diagonal intervals
    val m1 = zipped.filter(col("PublicID") === "m1")
    assert(m1.count() === 2)
    assert(m1.filter(col(c.loadDate) >= col(c.loadEndDate)).count() === 0)
  }
}
