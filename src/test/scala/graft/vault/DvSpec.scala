package graft.vault

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unit + property tests of the hashing/temporal core and the loader
  * dedup invariants (pure RawVaultOps functions, no catalog). The
  * properties run over seeded random batches — deterministic, but
  * exploring shapes no hand-written fixture covers.
  */
class DvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit val c: Conventions = Conventions.default

  test("hash is md5 of comma-joined values") {
    val out = Seq(("a", "b")).toDF("x", "y")
      .select(Dv.hashNames(Seq("x", "y")).as("h")).head().getString(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a,b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out === expected)
  }

  test("hash skips nulls (observable reference behavior: collisions)") {
    val rows = Seq(("a", Option.empty[String]), ("a", Some("x")))
      .toDF("x", "y").select(col("x"), col("y"), Dv.hashNames(Seq("x", "y")).as("h"))
      .collect()
    val hashOfJustA = java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.find(_.isNullAt(1)).get.getString(2) === hashOfJustA)
    assert(rows.find(!_.isNullAt(1)).get.getString(2) !== hashOfJustA)
  }

  test("parseTimestamp reads ISO-8601 Z format") {
    val out = Seq("2024-03-05T06:07:08Z").toDF("s")
      .select(Dv.parseTimestamp(col("s")).as("t")).head().getTimestamp(0)
    assert(out === Timestamp.valueOf("2024-03-05 06:07:08"))
  }

  test("maxTimestamp sentinel is after any practical date") {
    val out = Seq(1).toDF("i")
      .select(Dv.maxTimestamp.as("t")).head().getTimestamp(0)
    assert(out.after(Timestamp.valueOf("9000-01-01 00:00:00")))
  }

  test("derived names agree between create (source name) and load (vault name) paths") {
    assert(c.effectivitySatName("CC_POLICY") === c.effectivitySatName("LNK__POLICY"))
    assert(c.effectivitySatName("CC_POLICY") === "SAT__EFFECTIVITY_POLICY")
    assert(c.pitName("SAT__MOVIES") === c.pitName("MOVIES"))
    assert(c.effectivitySatName("MOVIES") === "SAT__EFFECTIVITY_MOVIES")
    // idempotent on already-derived names (reference startswith guard)
    assert(c.effectivitySatName("SAT__EFFECTIVITY_POLICY") === "SAT__EFFECTIVITY_POLICY")
  }

  test("PIT closes a version at the EARLIEST delete when several fall inside it") {
    val ts = (s: String) => Timestamp.valueOf(s)
    val sat = Seq(
      ("h1", ts("2024-01-01 00:00:00")),
      ("h1", ts("2024-01-10 00:00:00"))).toDF(c.hkey, c.loadDate)
    val eff = Seq(
      ("h1", ts("2024-01-03 00:00:00"), true),
      ("h1", ts("2024-01-05 00:00:00"), true)).toDF(c.hkey, c.loadDate, c.deleted)
    val pit = BusinessVaultOps.pitFromSatAndEff(sat, eff).collect()
    assert(pit.length === 2, "one PIT row per version, not one per matching delete")
    val v1 = pit.find(_.getAs[Timestamp](c.loadDate) === ts("2024-01-01 00:00:00")).get
    assert(v1.getAs[Timestamp](c.loadEndDate) === ts("2024-01-03 00:00:00"))
  }

  test("property: hub load is idempotent — replay appends nothing") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val users = List.fill(30)(rnd.nextInt(8) + 1)
      val staged = users.zipWithIndex
        .map { case (u, i) => (s"u$u", i.toLong) }
        .toDF("bk", "seq")
        .withColumn(c.hkey, Dv.hashNames(Seq("bk")))
        .withColumn(c.loadDate, col("seq"))
        .withColumn(c.recordSource, lit("prop"))
      val empty = staged.filter(lit(false))
        .select(col(c.hkey), col(c.loadDate), col(c.recordSource), col("bk"))
      val firstLoad = RawVaultOps.newHubRows(staged, empty, Seq("bk"))
      // a hub row per distinct business key...
      assert(firstLoad.select("bk").distinct().count() === users.map("u" + _).distinct.size)
      // ...and replaying against the loaded hub appends nothing
      val replay = RawVaultOps.newHubRows(staged, firstLoad, Seq("bk"))
      assert(replay.count() === 0)
    }
  }

  test("property: satellite dedup admits only new (hkey, load_date) pairs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val pairs = List.fill(25)((rnd.nextInt(5) + 1, rnd.nextInt(7)))
      val staged = pairs.map { case (k, t) => (s"k$k", t.toLong, 0, s"v$t") }
        .toDF("bk", "ld", "op", "attr")
        .withColumn(c.hkey, Dv.hashNames(Seq("bk")))
        .withColumn(c.operation, col("op"))
        .withColumn(c.loadDate, col("ld"))
        .withColumn(c.cdcLoadDate, col("ld"))
      val empty = staged.filter(lit(false)).select(col(c.hkey), col(c.loadDate))
      val loaded = RawVaultOps.newSatelliteRows(staged, empty, Seq("attr"))
      // one row per distinct (key, load date)
      assert(loaded.count() === pairs.distinct.size)
      val replay = RawVaultOps.newSatelliteRows(staged,
        loaded.select(col(c.hkey), col(c.loadDate)), Seq("attr"))
      assert(replay.count() === 0)
    }
  }
}
