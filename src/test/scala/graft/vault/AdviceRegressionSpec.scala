package graft.vault

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Regression tests for the round-2 advisor findings:
  *
  *  1. FK resolution must ignore BEFORE_UPDATE rows (they carry the
  *     PRE-update business keys at the same CDC instant as the UPDATE)
  *     and order staged candidates at sub-second precision.
  *  2. In the 2-leg reconcile path, an FK that is PRESENT but fails to
  *     resolve must be skipped — only a genuinely null FK (or a DELETE)
  *     may end-date the currently-live pair.
  *  3. reconcileLinkStates must converge to at most one live pair per
  *     from-entity even when prior effectivity state is contradictory
  *     (two live pairs for one entity).
  */
class AdviceRegressionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def hk(values: Any*): String = {
    val bytes = java.security.MessageDigest.getInstance("MD5")
      .digest(values.map(String.valueOf).mkString(",").getBytes("UTF-8"))
    bytes.map("%02x".format(_)).mkString
  }

  // ---- 3: reconcileLinkStates convergence from contradictory state ----

  private implicit val c: Conventions = Conventions.default
  private val FROM = "FROM_HKEY"
  private val TO = "TO_HKEY"

  private def linkRow(f: String, t: String, ld: Timestamp): Row =
    Row(hk(f, t), ld, "test", f, t)
  private def effRow(f: String, t: String, ld: Timestamp, deleted: Boolean): Row =
    Row(hk(f, t), hk(deleted), ld, deleted)

  private val linkSchema = StructType(Seq(
    StructField(c.hkey, StringType), StructField(c.loadDate, TimestampType),
    StructField(c.recordSource, StringType),
    StructField(FROM, StringType), StructField(TO, StringType)))
  private val effSchema = StructType(Seq(
    StructField(c.hkey, StringType), StructField(c.hdiff, StringType),
    StructField(c.loadDate, TimestampType), StructField(c.deleted, BooleanType)))
  private val evtSchema = StructType(Seq(
    StructField(FROM, StringType), StructField(TO, StringType, true),
    StructField(c.loadDate, TimestampType)))

  private def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private val rt1 = Timestamp.valueOf("2024-02-01 00:00:00")
  private val rt2 = Timestamp.valueOf("2024-02-02 00:00:00")
  private val rt3 = Timestamp.valueOf("2024-02-03 00:00:00")
  private val clock = Timestamp.valueOf("2026-01-01 00:00:00")

  /** Latest deleted-flag per pair hkey across prior + new eff rows. */
  private def finalState(eff: DataFrame, newEff: DataFrame): Map[String, Boolean] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(c.hkey)
      .orderBy(col(c.loadDate).desc, col(c.deleted).desc)
    eff.union(newEff.select(eff.columns.map(col).toSeq: _*))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
  }

  test("reconcile converges: two contradictory live pairs both end-dated") {
    val link = df(linkSchema, linkRow("X", "A", rt1), linkRow("X", "B", rt2))
    val eff = df(effSchema,
      effRow("X", "A", rt1, deleted = false),
      effRow("X", "B", rt2, deleted = false))
    val events = df(evtSchema, Row("X", "C", rt3))

    val (newLinks, newEff) = RawVaultOps.reconcileLinkStates(
      events, link, eff, FROM, TO, "test", lit(clock))

    assert(newLinks.select(c.hkey).collect().map(_.getString(0)).toSet ===
      Set(hk("X", "C")))
    val state = finalState(eff, newEff)
    assert(state(hk("X", "A")) === true, "older surplus live pair must be end-dated")
    assert(state(hk("X", "B")) === true, "newest prior live pair must be end-dated")
    assert(state(hk("X", "C")) === false)
  }

  test("reconcile converges: event re-affirming a surplus pair keeps it live") {
    val link = df(linkSchema, linkRow("X", "A", rt1), linkRow("X", "B", rt2))
    val eff = df(effSchema,
      effRow("X", "A", rt1, deleted = false),
      effRow("X", "B", rt2, deleted = false))
    val events = df(evtSchema, Row("X", "A", rt3))

    val (_, newEff) = RawVaultOps.reconcileLinkStates(
      events, link, eff, FROM, TO, "test", lit(clock))

    val state = finalState(eff, newEff)
    assert(state(hk("X", "A")) === false, "re-affirmed pair must end up live")
    assert(state(hk("X", "B")) === true, "superseded seed must be end-dated")
    // converged history: A superseded when B was recorded (rt2), then
    // re-established by the rt3 event — two rows, ending live
    val aRows = newEff.filter(col(c.hkey) === hk("X", "A"))
      .orderBy(c.loadDate).collect()
    assert(aRows.map(r => (r.getTimestamp(2), r.getBoolean(3))).toSeq ===
      Seq((rt2, true), (rt3, false)))
  }

  test("reconcile converges: late-arriving event older than the live pairs") {
    // the rt1 event predates BOTH recorded live pairs: its pair C is
    // created at rt1 and end-dated at rt2 (A's recording), A is
    // end-dated at rt3 (B's recording), and only B stays live
    val link = df(linkSchema, linkRow("X", "A", rt2), linkRow("X", "B", rt3))
    val eff = df(effSchema,
      effRow("X", "A", rt2, deleted = false),
      effRow("X", "B", rt3, deleted = false))
    val events = df(evtSchema, Row("X", "C", rt1))

    val (_, newEff) = RawVaultOps.reconcileLinkStates(
      events, link, eff, FROM, TO, "test", lit(clock))

    val state = finalState(eff, newEff)
    assert(state(hk("X", "C")) === true, "late event's pair must not stay live")
    assert(state(hk("X", "A")) === true, "contradictory older pair must be end-dated")
    assert(state(hk("X", "B")) === false, "newest recorded pair wins")
  }

  // ---- 1 + 2: metadata-driven FK resolution, end to end ----

  private val schemaJson =
    """{
      "name": "adv",
      "tables": [
        {"name": "movies2",
         "columns": [{"name": "PublicID", "type": "text"},
                     {"name": "DIRECTOR", "type": "integer"}],
         "primaryKey": ["PublicID"],
         "foreignKeys": [{"column": "DIRECTOR",
           "foreignColumn": {"table": "directors2", "column": "ID"}}]},
        {"name": "directors2",
         "columns": [{"name": "PublicID", "type": "text"},
                     {"name": "ID", "type": "integer"},
                     {"name": "NAME", "type": "text"}],
         "primaryKey": ["PublicID"], "foreignKeys": []}
      ]}"""

  private val mappingYaml =
    """hubs:
      |  - name: HUB__MOVIES2
      |    source_table: movies2
      |    business_keys: [PublicID]
      |  - name: HUB__DIRECTORS2
      |    source_table: directors2
      |    business_keys: [PublicID]
      |links:
      |  - name: LNK__MOVIES2__DIRECTORS2
      |    source_table: movies2
      |    to:
      |      - raw_column: MOVIES2_HKEY
      |        source_column: PublicID
      |        source_foreign_key: {table: movies2, column: PublicID}
      |      - raw_column: DIRECTORS2_HKEY
      |        source_column: DIRECTOR
      |        source_foreign_key: {table: directors2, column: ID}
      |satellites:
      |  - hub: HUB__MOVIES2
      |    name: SAT__MOVIES2
      |    source_table: movies2
      |  - hub: HUB__DIRECTORS2
      |    name: SAT__DIRECTORS2
      |    source_table: directors2
      |""".stripMargin

  private val SNAP = 0; private val DEL = 1; private val CRE = 2
  private val BUPD = 3; private val UPD = 4

  private lazy val stagingDir =
    graft.TestScratch.dir("graft-adv")
  private lazy val config =
    RawVaultConfig(stagingDir, "adv_stg", "adv_raw", partitionSize = 2)
  private lazy val vault = new RawVault(spark, config, "adv_test", lit(clock))
  private lazy val meta = new MetadataVault(vault,
    VaultMetadata.parseSchema(schemaJson), VaultMetadata.parseMapping(mappingYaml))

  private val movieSchema = StructType(Seq(
    StructField("OPERATION", IntegerType, false),
    StructField("LOAD_DATE", TimestampType, false),
    StructField("PublicID", StringType, false),
    StructField("DIRECTOR", IntegerType, true)))
  private val directorSchema = StructType(Seq(
    StructField("OPERATION", IntegerType, false),
    StructField("LOAD_DATE", TimestampType, false),
    StructField("PublicID", StringType, false),
    StructField("ID", IntegerType, false),
    StructField("NAME", StringType, false)))

  private def writeBatch(name: String, data: DataFrame): Unit =
    data.write.mode("overwrite").parquet(s"$stagingDir/$name.parquet")

  private def effLnk: DataFrame =
    spark.table("adv_raw.`SAT__EFFECTIVITY_MOVIES2__DIRECTORS2`")
  private def latestDeleted(pairHkey: String): Boolean =
    effLnk.filter(col(c.hkey) === pairHkey)
      .orderBy(col(c.loadDate).desc, col(c.deleted).desc)
      .head().getAs[Boolean](c.deleted)

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00")
  // same second, 100ms apart: orders correctly only at sub-second precision
  private val tU1 = Timestamp.valueOf("2024-03-02 00:00:05.1")
  private val tU2 = Timestamp.valueOf("2024-03-02 00:00:05.2")
  private val t3 = Timestamp.valueOf("2024-03-03 00:00:00")
  private val t4 = Timestamp.valueOf("2024-03-04 00:00:00")

  test("metadata link setup: initial load links m1 -> d-old") {
    writeBatch("directors2", df(directorSchema, Row(CRE, t0, "d-old", 7, "Mann")))
    writeBatch("movies2", df(movieSchema, Row(CRE, t0, "m1", 7)))
    meta.createAll()
    meta.loadAll()
    assert(spark.table("adv_raw.`LNK__MOVIES2__DIRECTORS2`").count() === 1)
    assert(latestDeleted(hk(hk("m1"), hk("d-old"))) === false)
  }

  test("FK resolver ignores BEFORE_UPDATE and orders at sub-second precision") {
    // business key changes twice within one second; BEFORE_UPDATE rows
    // repeat the pre-update keys at the same instant as each UPDATE.
    // md5("d-old") < md5("d-new"), so a seconds-truncated min-hkey
    // tiebreak would resolve FK 7 to the STALE d-old entity.
    writeBatch("directors2", df(directorSchema,
      Row(BUPD, tU1, "d-old", 7, "Mann"),
      Row(UPD, tU1, "d-mid", 7, "Mann"),
      Row(BUPD, tU2, "d-mid", 7, "Mann"),
      Row(UPD, tU2, "d-new", 7, "Mann")))
    writeBatch("movies2", df(movieSchema, Row(UPD, tU2, "m1", 7)))
    meta.loadAll()

    val lnk = spark.table("adv_raw.`LNK__MOVIES2__DIRECTORS2`")
    val pairs = lnk.select("DIRECTORS2_HKEY").collect().map(_.getString(0)).toSet
    assert(pairs.contains(hk("d-new")), "FK 7 must resolve to the post-update entity")
    assert(!pairs.contains(hk("d-mid")), "intra-second intermediate state must lose")
    assert(latestDeleted(hk(hk("m1"), hk("d-old"))) === true)
    assert(latestDeleted(hk(hk("m1"), hk("d-new"))) === false)
  }

  test("present-but-unresolvable FK is skipped, not treated as FK->null") {
    val before = effLnk.count()
    writeBatch("movies2", df(movieSchema, Row(UPD, t3, "m1", 99)))
    meta.loadLinksFor("movies2")
    assert(effLnk.count() === before, "unresolved FK must not emit eff rows")
    assert(latestDeleted(hk(hk("m1"), hk("d-new"))) === false,
      "live pair must survive an unresolvable FK")
  }

  test("genuinely null FK still end-dates the live pair") {
    writeBatch("movies2", df(movieSchema, Row(UPD, t4, "m1", null)))
    meta.loadLinksFor("movies2")
    assert(latestDeleted(hk(hk("m1"), hk("d-new"))) === true)
  }

  test("replaying the last link batch adds no rows (seed deletes stay idempotent)") {
    val lnkBefore = spark.table("adv_raw.`LNK__MOVIES2__DIRECTORS2`").count()
    val effBefore = effLnk.count()
    meta.loadLinksFor("movies2")
    assert(spark.table("adv_raw.`LNK__MOVIES2__DIRECTORS2`").count() === lnkBefore)
    assert(effLnk.count() === effBefore)
  }
}
