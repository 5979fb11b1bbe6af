package graft.vault

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Port of the reference's BDD golden-table suite
  * (features/raw-vault.feature:1-452 + imdb-schema.json +
  * imdb-mapping.yaml) as table-driven ScalaTest: three CDC batches of
  * the movie domain loaded through the metadata-driven API, asserted
  * against the feature file's exact-cardinality and
  * exactly-once-golden-row expectations.
  *
  * The feature suite was never executable in the reference (the modules
  * it imports do not exist, features/steps/raw_vault.py:20-23) — it is
  * the intended-semantics spec, including link-effectivity behavior the
  * v3 engine does not implement (entity deletes ending links, no
  * back-dated deletes for later-born links). Two counts in the
  * WIP "Test" scenario are internally inconsistent and asserted at
  * their event-derived values instead (see the effectivity-count test).
  */
class GoldenVaultSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Background dates: t1 = t0+1d, t2 = t1+3h, t3 = t2+42m, t4 = t3+6h,
  // t5 = t4+1d (features/raw-vault.feature:4-10)
  private val t0 = Timestamp.valueOf("2024-05-01 00:00:00")
  private val t1 = Timestamp.valueOf("2024-05-02 00:00:00")
  private val t2 = Timestamp.valueOf("2024-05-02 03:00:00")
  private val t3 = Timestamp.valueOf("2024-05-02 03:42:00")
  private val t4 = Timestamp.valueOf("2024-05-02 09:42:00")
  private val t5 = Timestamp.valueOf("2024-05-03 09:42:00")
  private val loadClock = Timestamp.valueOf("2026-02-02 00:00:00")

  private val SNAP = 0; private val DEL = 1; private val CRE = 2
  private val BUPD = 3; private val UPD = 4

  private def hk(vals: String*): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(vals.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val schemaJson =
    """{"name": "imdb", "tables": [
      {"name": "movies", "columns": [
        {"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
        {"name": "YEAR", "type": "text"}, {"name": "DIRECTOR", "type": "text"},
        {"name": "RATING", "type": "text"}, {"name": "RANK", "type": "text"},
        {"name": "LAST_UPDATE", "type": "text"}],
       "primaryKey": ["ID"],
       "foreignKeys": [{"column": "DIRECTOR",
         "foreignColumn": {"table": "directors", "column": "ID"}}]},
      {"name": "actors", "columns": [
        {"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
        {"name": "COUNTRY", "type": "text"}, {"name": "LAST_UPDATE", "type": "text"}],
       "primaryKey": ["ID"], "foreignKeys": []},
      {"name": "directors", "columns": [
        {"name": "ID", "type": "text"}, {"name": "NAME", "type": "text"},
        {"name": "COUNTRY", "type": "text"}, {"name": "LAST_UPDATE", "type": "text"}],
       "primaryKey": ["ID"], "foreignKeys": []},
      {"name": "castings", "columns": [
        {"name": "MOVIE_ID", "type": "text"}, {"name": "ACTOR_ID", "type": "text"},
        {"name": "LAST_UPDATE", "type": "text"}],
       "primaryKey": ["MOVIE_ID", "ACTOR_ID"], "foreignKeys": []}
    ]}"""

  // imdb-mapping.yaml verbatim structure (movies hub keyed on NAME+YEAR)
  private val mappingYaml =
    """hubs:
      |  - name: HUB__MOVIES
      |    source_table: movies
      |    business_keys: [NAME, YEAR]
      |  - name: HUB__ACTORS
      |    source_table: actors
      |    business_keys: [ID]
      |  - name: HUB__DIRECTORS
      |    source_table: directors
      |    business_keys: [ID]
      |links:
      |  - name: LNK__MOVIES_DIRECTORS
      |    raw_column: MOVIES__HKEY
      |    source_table: movies
      |    source_column: NAME
      |    to:
      |      - raw_column: DIRECTORS__HKEY
      |        source_column: DIRECTOR
      |        source_foreign_key: {table: directors, column: ID}
      |  - name: LNK__CASTINGS
      |    source_table: castings
      |    to:
      |      - raw_column: MOVIE_ID
      |        source_column: MOVIE_ID
      |        source_foreign_key: {table: movies, column: ID}
      |      - raw_column: ACTOR_ID
      |        source_column: ACTOR_ID
      |        source_foreign_key: {table: actors, column: ID}
      |satellites:
      |  - {hub: HUB__MOVIES, name: SAT__MOVIES, source_table: movies}
      |  - {hub: HUB__ACTORS, name: SAT__ACTORS, source_table: actors}
      |  - {hub: HUB__DIRECTORS, name: SAT__DIRECTORS, source_table: directors}
      |""".stripMargin

  // (op, cdc time, ID, NAME, YEAR, DIRECTOR, RATING, RANK) — movies
  private val moviesBatches: Seq[Seq[(Int, Timestamp, String, String, String, String, String, String)]] = Seq(
    Seq(
      (SNAP, t0, "1", "The Shawshank Redemption", "1994", "1", "9.3", "64"),
      (SNAP, t0, "2", "The Godfather", "1972", "2", "9.2", "94"),
      (SNAP, t0, "3", "The Dark Knight", "2008", "3", "9.0", "104"),
      (SNAP, t0, "4", "Star Wars: Episode V", "1980", "4", "8.7", "485")),
    Seq(
      (CRE, t1, "5", "Pulp Fiction", "1994", "5", "8.9", "138"),
      (BUPD, t1, "4", "Star Wars: Episode V", "1980", "4", "8.7", "485"),
      (UPD, t1, "4", "Star Wars: Episode V", "1980", "4", "8.4", "344"),
      (BUPD, t1, "2", "The Godfather", "1972", "2", "9.2", "94"),
      (UPD, t1, "2", "The Godfather", "1972", "2", "9.1", "104"),
      (BUPD, t2, "2", "The Godfather", "1972", "2", "9.1", "104"),
      (UPD, t2, "2", "The Godfather", "1972", null, "9.1", "104"),
      (DEL, t3, "2", "The Godfather", "1972", null, "9.1", "104"),
      (BUPD, t1, "1", "The Shawshank Redemption", "1994", "1", "9.3", "64"),
      (UPD, t1, "1", "The Shawshank Redemption", "1994", "1", "9.6", "5"),
      (BUPD, t2, "1", "The Shawshank Redemption", "1994", "1", "9.6", "5"),
      (UPD, t2, "1", "The Shawshank Redemption", "1994", null, "9.6", "5"),
      (BUPD, t3, "1", "The Shawshank Redemption", "1994", null, "9.6", "5"),
      (UPD, t3, "1", "The Shawshank Redemption", "1994", "2", "9.6", "5"),
      (BUPD, t4, "1", "The Shawshank Redemption", "1994", "2", "9.6", "5"),
      (UPD, t4, "1", "The Shawshank Redemption", "1994", "1", "9.6", "5"),
      (BUPD, t1, "3", "The Dark Knight", "2008", "3", "9.0", "104"),
      (UPD, t1, "3", "The Dark Knight", "2008", "3", "9.3", "45"),
      (DEL, t2, "3", "The Dark Knight", "2008", "3", "9.3", "45"),
      (CRE, t3, "3", "The Dark Knight", "2008", "3", "9.0", "104")),
    Seq(
      (DEL, t5, "5", "Pulp Fiction", "1994", "5", "8.9", "138")))

  // (op, t, ID, NAME, COUNTRY) — actors / directors
  private val actorsBatches = Seq(
    (1 to 8).map(i => (SNAP, t0, i.toString,
      Seq("Tim Robbins", "Morgan Freeman", "Bob Gunton", "William Sadler",
        "Marlon Brando", "Al Pacino", "James Caan", "Christian Bale")(i - 1), "USA")),
    Seq((CRE, t1, "9", "John Travolta", "USA"), (CRE, t1, "10", "Liam Neeson", "USA")),
    Seq((DEL, t5, "9", "John Travolta", "USA"), (DEL, t5, "10", "Liam Neeson", "USA")))

  private val directorsBatches = Seq(
    Seq((SNAP, t0, "1", "Frank Darabont", "USA"),
      (SNAP, t0, "2", "Francis Ford Coppola", "USA"),
      (SNAP, t0, "3", "Christopher Nolan", "USA"),
      (SNAP, t0, "4", "Irvin Kershner", "USA")),
    Seq((CRE, t1, "5", "Quentin Terintino", "USA")),
    Seq((DEL, t5, "5", "Quentin Terintino", "USA")))

  // (op, t, MOVIE_ID, ACTOR_ID) — castings
  private val castingsBatches = Seq(
    Seq(("1", "1"), ("1", "2"), ("2", "3"), ("2", "4"), ("3", "5"), ("3", "6"),
      ("4", "7"), ("4", "8")).map { case (m, a) => (SNAP, t0, m, a) },
    Seq((CRE, t1, "5", "9"), (CRE, t1, "5", "10")),
    Seq((DEL, t5, "5", "9"), (DEL, t5, "5", "10")))

  private lazy val stagingDir =
    graft.TestScratch.dir("graft-golden")

  private lazy val loaded: Unit = {
    val config = RawVaultConfig(
      stagingBasePath = stagingDir,
      stagingPreparedDatabase = "golden_stg",
      rawDatabase = "golden_raw",
      partitionSize = 2)
    val vault = new RawVault(spark, config, "imdb",
      org.apache.spark.sql.functions.lit(loadClock))
    val mv = new MetadataVault(vault,
      VaultMetadata.parseSchema(schemaJson), VaultMetadata.parseMapping(mappingYaml))
    mv.createAll()
    (0 until 3).foreach { b =>
      moviesBatches(b)
        .toDF("OPERATION", "LOAD_DATE", "ID", "NAME", "YEAR", "DIRECTOR", "RATING", "RANK")
        .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
        .write.mode("overwrite").parquet(s"$stagingDir/movies.parquet")
      actorsBatches(b).toDF("OPERATION", "LOAD_DATE", "ID", "NAME", "COUNTRY")
        .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
        .write.mode("overwrite").parquet(s"$stagingDir/actors.parquet")
      directorsBatches(b).toDF("OPERATION", "LOAD_DATE", "ID", "NAME", "COUNTRY")
        .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
        .write.mode("overwrite").parquet(s"$stagingDir/directors.parquet")
      castingsBatches(b).toDF("OPERATION", "LOAD_DATE", "MOVIE_ID", "ACTOR_ID")
        .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
        .write.mode("overwrite").parquet(s"$stagingDir/castings.parquet")
      mv.loadAll()
    }
  }

  private def table(name: String): Array[Row] = {
    loaded
    spark.table(s"golden_raw.`$name`").collect()
  }

  /** "to contain the following entries exactly once" — count rows whose
    * projection onto the golden columns matches. */
  private def exactlyOnce(name: String, golden: Seq[Map[String, Any]]): Unit = {
    val rows = table(name)
    golden.foreach { g =>
      val n = rows.count(r => g.forall { case (k, v) =>
        val actual = r.getAs[Any](k)
        if (v == null) actual == null else actual == v
      })
      assert(n === 1, s"$name: expected exactly once ${g}, found $n")
    }
  }

  private val hkMovie = Map(
    "shawshank" -> hk("The Shawshank Redemption", "1994"),
    "godfather" -> hk("The Godfather", "1972"),
    "darkknight" -> hk("The Dark Knight", "2008"),
    "starwars" -> hk("Star Wars: Episode V", "1980"),
    "pulpfiction" -> hk("Pulp Fiction", "1994"))
  private def hkDir(id: Int) = hk(id.toString)
  private def lnk(movie: String, dir: Int) = hk(hkMovie(movie), hkDir(dir))

  test("scenario 1: table cardinalities after three batches") {
    assert(table("HUB__MOVIES").length === 5)
    assert(table("HUB__ACTORS").length === 10)
    assert(table("HUB__DIRECTORS").length === 5)
    assert(table("LNK__MOVIES_DIRECTORS").length === 6)
    assert(table("SAT__MOVIES").length === 14)
    assert(table("SAT__ACTORS").length === 10)
    assert(table("SAT__DIRECTORS").length === 5)
    assert(table("SAT__EFFECTIVITY_MOVIES_DIRECTORS").length === 13)
  }

  test("scenario 2: simple update without deletion (Star Wars)") {
    val m = hkMovie("starwars")
    exactlyOnce("HUB__MOVIES", Seq(
      Map("$__HKEY" -> m, "NAME" -> "Star Wars: Episode V", "YEAR" -> "1980")))
    exactlyOnce("HUB__DIRECTORS", Seq(Map("$__HKEY" -> hkDir(4), "ID" -> "4")))
    exactlyOnce("LNK__MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("starwars", 4),
        "MOVIES__HKEY" -> m, "DIRECTORS__HKEY" -> hkDir(4))))
    exactlyOnce("SAT__MOVIES", Seq(
      Map("$__HKEY" -> m, "ID" -> "4", "DIRECTOR" -> "4", "RATING" -> "8.7",
        "RANK" -> "485", "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> m, "ID" -> "4", "DIRECTOR" -> "4", "RATING" -> "8.4",
        "RANK" -> "344", "$__LOAD_DATE" -> t1)))
    exactlyOnce("SAT__EFFECTIVITY_MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("starwars", 4), "$__DELETED" -> false, "$__LOAD_DATE" -> t0)))
  }

  test("scenario 3: simple delete (Pulp Fiction)") {
    val m = hkMovie("pulpfiction")
    exactlyOnce("HUB__MOVIES", Seq(
      Map("$__HKEY" -> m, "NAME" -> "Pulp Fiction", "YEAR" -> "1994")))
    exactlyOnce("SAT__MOVIES", Seq(
      Map("$__HKEY" -> m, "ID" -> "5", "DIRECTOR" -> "5", "RATING" -> "8.9",
        "RANK" -> "138", "$__LOAD_DATE" -> t1)))
    exactlyOnce("SAT__EFFECTIVITY_MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("pulpfiction", 5), "$__DELETED" -> false, "$__LOAD_DATE" -> t1),
      Map("$__HKEY" -> lnk("pulpfiction", 5), "$__DELETED" -> true, "$__LOAD_DATE" -> t5)))
  }

  test("scenario 4: update, delete and re-create (The Dark Knight)") {
    val m = hkMovie("darkknight")
    exactlyOnce("SAT__MOVIES", Seq(
      Map("$__HKEY" -> m, "RATING" -> "9.0", "RANK" -> "104", "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> m, "RATING" -> "9.3", "RANK" -> "45", "$__LOAD_DATE" -> t1),
      Map("$__HKEY" -> m, "RATING" -> "9.0", "RANK" -> "104", "$__LOAD_DATE" -> t3)))
    exactlyOnce("SAT__EFFECTIVITY_MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("darkknight", 3), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> lnk("darkknight", 3), "$__DELETED" -> true, "$__LOAD_DATE" -> t2),
      Map("$__HKEY" -> lnk("darkknight", 3), "$__DELETED" -> false, "$__LOAD_DATE" -> t3)))
  }

  test("scenario 5: FK set to null deletes the link (The Godfather)") {
    val m = hkMovie("godfather")
    exactlyOnce("SAT__MOVIES", Seq(
      Map("$__HKEY" -> m, "DIRECTOR" -> "2", "RATING" -> "9.2", "RANK" -> "94",
        "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> m, "DIRECTOR" -> "2", "RATING" -> "9.1", "RANK" -> "104",
        "$__LOAD_DATE" -> t1),
      Map("$__HKEY" -> m, "DIRECTOR" -> null, "RATING" -> "9.1", "RANK" -> "104",
        "$__LOAD_DATE" -> t2)))
    exactlyOnce("SAT__EFFECTIVITY_MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("godfather", 2), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> lnk("godfather", 2), "$__DELETED" -> true, "$__LOAD_DATE" -> t2)))
  }

  test("scenario 6: FK null then re-point then back (Shawshank)") {
    val m = hkMovie("shawshank")
    exactlyOnce("SAT__MOVIES", Seq(
      Map("$__HKEY" -> m, "DIRECTOR" -> "1", "RATING" -> "9.3", "RANK" -> "64",
        "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> m, "DIRECTOR" -> "1", "RATING" -> "9.6", "RANK" -> "5",
        "$__LOAD_DATE" -> t1),
      Map("$__HKEY" -> m, "DIRECTOR" -> null, "RATING" -> "9.6", "RANK" -> "5",
        "$__LOAD_DATE" -> t2),
      Map("$__HKEY" -> m, "DIRECTOR" -> "2", "RATING" -> "9.6", "RANK" -> "5",
        "$__LOAD_DATE" -> t3),
      Map("$__HKEY" -> m, "DIRECTOR" -> "1", "RATING" -> "9.6", "RANK" -> "5",
        "$__LOAD_DATE" -> t4)))
    exactlyOnce("LNK__MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("shawshank", 1), "MOVIES__HKEY" -> m,
        "DIRECTORS__HKEY" -> hkDir(1)),
      Map("$__HKEY" -> lnk("shawshank", 2), "MOVIES__HKEY" -> m,
        "DIRECTORS__HKEY" -> hkDir(2))))
    exactlyOnce("SAT__EFFECTIVITY_MOVIES_DIRECTORS", Seq(
      Map("$__HKEY" -> lnk("shawshank", 1), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> lnk("shawshank", 1), "$__DELETED" -> true, "$__LOAD_DATE" -> t2),
      Map("$__HKEY" -> lnk("shawshank", 1), "$__DELETED" -> false, "$__LOAD_DATE" -> t4),
      Map("$__HKEY" -> lnk("shawshank", 2), "$__DELETED" -> false, "$__LOAD_DATE" -> t3),
      Map("$__HKEY" -> lnk("shawshank", 2), "$__DELETED" -> true, "$__LOAD_DATE" -> t4)))
  }

  test("association rows resolve FKs to entities from EARLIER batches") {
    loaded
    // batch 4: ONLY a new casting arrives — movies.parquet is removed
    // entirely (nothing changed, the orchestrator delivers no file), so
    // movie 1's hash key must resolve through the satellite fallback
    // alone (the hub is keyed on NAME+YEAR, not ID)
    val t6 = Timestamp.valueOf("2024-05-04 00:00:00")
    Seq((CRE, t6, "1", "3"))
      .toDF("OPERATION", "LOAD_DATE", "MOVIE_ID", "ACTOR_ID")
      .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
      .write.mode("overwrite").parquet(s"$stagingDir/castings.parquet")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stagingDir/movies.parquet"), true)
    val config = RawVaultConfig(
      stagingBasePath = stagingDir,
      stagingPreparedDatabase = "golden_stg",
      rawDatabase = "golden_raw",
      partitionSize = 2)
    val vault = new RawVault(spark, config, "imdb",
      org.apache.spark.sql.functions.lit(loadClock))
    new MetadataVault(vault,
      VaultMetadata.parseSchema(schemaJson), VaultMetadata.parseMapping(mappingYaml))
      .loadLinksFor("castings")
    val rows = spark.table("golden_raw.`LNK__CASTINGS`").collect()
      .map(r => (r.getAs[String]("MOVIE_ID"), r.getAs[String]("ACTOR_ID")))
    assert(rows.contains((hkMovie("shawshank"), hk("3"))),
      "casting for a not-redelivered movie must resolve via the satellite")
    assert(!rows.exists { case (m, a) => m == null || a == null },
      "no casting row may carry an unresolved (null) leg")
    // restore the batch-3 staging fixtures so later tests (and any
    // future castings assertions) see the golden three-batch state
    castingsBatches(2).toDF("OPERATION", "LOAD_DATE", "MOVIE_ID", "ACTOR_ID")
      .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
      .write.mode("overwrite").parquet(s"$stagingDir/castings.parquet")
    moviesBatches(2)
      .toDF("OPERATION", "LOAD_DATE", "ID", "NAME", "YEAR", "DIRECTOR", "RATING", "RANK")
      .withColumn("LAST_UPDATE", org.apache.spark.sql.functions.lit("t0"))
      .write.mode("overwrite").parquet(s"$stagingDir/movies.parquet")
  }

  test("same-instant create+delete collapses to the last event's state") {
    implicit val c: Conventions = Conventions.default
    import org.apache.spark.sql.functions.{col, lit}
    // entity f: live pair A from t0; at t1 (same ms) CREATE→B then
    // DELETE — delete sorts last via tieBreak, so B must end up dead
    // with NO contradictory same-instant rows
    val fkEvents = Seq(
      ("f", "B", 1000L, 0), // create→B
      ("f", null.asInstanceOf[String], 1000L, 1)) // delete, tieBreak last
      .toDF("F", "T", c.loadDate, "op")
    val linkDf = Seq((hk("f", "A"), 0L, "src", "f", "A"))
      .toDF(c.hkey, c.loadDate, c.recordSource, "F", "T")
    val effDf = Seq((hk("f", "A"), "x", 0L, false))
      .toDF(c.hkey, c.hdiff, c.loadDate, c.deleted)
    val (_, newEff) = RawVaultOps.reconcileLinkStates(
      fkEvents, linkDf, effDf, "F", "T", "src",
      clock = lit(0L), tieBreak = col("op"))
    val rows = newEff.collect()
      .map(r => (r.getAs[String](c.hkey), r.getAs[Long](c.loadDate),
        r.getAs[Boolean](c.deleted)))
    // pair A ends at t1; pair B: at most one same-instant row survives,
    // and the survivor is the delete (last event wins)
    assert(rows.count(_._1 == hk("f", "A")) === 1)
    assert(rows.filter(_._1 == hk("f", "A")).head === ((hk("f", "A"), 1000L, true)))
    val bRows = rows.filter(_._1 == hk("f", "B"))
    assert(bRows.length === 1, s"contradictory same-instant rows: ${bRows.toSeq}")
    assert(bRows.head._3 === true)
  }

  test("hub effectivity satellites carry the event-derived state history") {
    // feature "Test" scenario golden rows for SAT__EFFECTIVITY_MOVIES (9)
    exactlyOnce("SAT__EFFECTIVITY_MOVIES", Seq(
      Map("$__HKEY" -> hkMovie("shawshank"), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> hkMovie("godfather"), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> hkMovie("godfather"), "$__DELETED" -> true, "$__LOAD_DATE" -> t3),
      Map("$__HKEY" -> hkMovie("darkknight"), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> hkMovie("darkknight"), "$__DELETED" -> true, "$__LOAD_DATE" -> t2),
      Map("$__HKEY" -> hkMovie("darkknight"), "$__DELETED" -> false, "$__LOAD_DATE" -> t3),
      Map("$__HKEY" -> hkMovie("starwars"), "$__DELETED" -> false, "$__LOAD_DATE" -> t0),
      Map("$__HKEY" -> hkMovie("pulpfiction"), "$__DELETED" -> false, "$__LOAD_DATE" -> t1),
      Map("$__HKEY" -> hkMovie("pulpfiction"), "$__DELETED" -> true, "$__LOAD_DATE" -> t5)))
    assert(table("SAT__EFFECTIVITY_MOVIES").length === 9)
    // the feature's WIP "Test" scenario claims 10/5 here, equal to the
    // hub cardinalities — internally inconsistent with its own batch
    // data (2 actor deletes and 1 director delete at t5 add rows).
    // Event-derived: 8+2 creates + 2 deletes = 12; 4+1 creates + 1 = 6.
    assert(table("SAT__EFFECTIVITY_ACTORS").length === 12)
    assert(table("SAT__EFFECTIVITY_DIRECTORS").length === 6)
  }
}
