package graft.vault

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One output field of a curated view (Curated.py:12-30). */
final case class FieldDefinition(
    fromTable: String,
    fromFieldName: String,
    toFieldName0: Option[String] = None,
    isTypelist: Boolean = false,
    typelistTableName: Option[String] = None,
    foreignKey: Boolean = false,
    foreignKeyToTableName: Option[String] = None) {
  val toFieldName: String = toFieldName0.getOrElse(fromFieldName)
}

/** Typelist lookup configuration (Curated.py:33-55). */
final case class TypelistsConfig(
    typelists: DataFrame,
    idColumn: String = "ID",
    typecodeColumn: String = "typecode",
    nameColumn: String = "name",
    deColumn: String = "L_de")

/** Curated layer: flat, renamed, FK/typelist/user-resolved views over the
  * business vault (Curated.py:72-317). */
class Curated(
    val spark: SparkSession,
    val businessVault: BusinessVault,
    val typelists: TypelistsConfig,
    val curatedDatabase: String,
    val rawDatabase: String,
    val basePath: Option[String] = None)(implicit val conventions: Conventions) {
  private val c = conventions

  /** Create the curated database, optionally at an explicit warehouse
    * LOCATION (Curated.py:114-118). */
  def initializeDatabase(): Unit =
    spark.sql(VaultSql.createDatabase(curatedDatabase, basePath))

  /** Drop retired rows when the column exists (Curated.py:87-97). */
  def filterRetired(df: DataFrame): DataFrame =
    if (df.columns.contains("retired")) df.filter(df("retired") === 0) else df

  def getEntityNameFromSourceTableName(sourceTableName: String): String =
    conventions.entityName(sourceTableName)

  /** Enrich a typelist-referencing column with its en/de display values
    * (Curated.py:167-194). Positional splice: the reference replaces the
    * column in place, inserting `_en`/`_de` right after it. */
  def joinTypelist(df: DataFrame, typelistReferenceColumn: String,
      typelistName: String): DataFrame = {
    val enColumn = s"${typelistReferenceColumn}_en"
    val deColumn = s"${typelistReferenceColumn}_de"
    val tl = typelists.typelists
      .select(col(c.group), col(typelists.idColumn), col(typelists.typecodeColumn),
        col(typelists.nameColumn), col(typelists.deColumn))
      .withColumnRenamed(typelists.typecodeColumn, typelistReferenceColumn)
      .withColumnRenamed(typelists.nameColumn, enColumn)
      .withColumnRenamed(typelists.deColumn, deColumn)

    val idx = df.columns.indexOf(typelistReferenceColumn)
    val dfCols = df.columns.toSeq.map(df(_))
    val selected = dfCols.take(idx) ++
      Seq(tl(typelistReferenceColumn), tl(enColumn), tl(deColumn)) ++
      dfCols.drop(idx + 1)

    df.join(tl,
        (df(typelistReferenceColumn) === tl(typelists.idColumn)) &&
          (tl(c.group) === typelistName),
        "left")
      .select(selected: _*)
  }

  /** Replace a technical FK id with the target entity's PublicID via the
    * link table (Curated.py:273-317). */
  def replaceIdWithPublicId(fromDf: DataFrame, columnName: String,
      toDf: DataFrame, lnkTableName: String, lnkFromHkeyColumnName: String,
      lnkToHkeyColumnName: String, fromDfHkey: Option[Column] = None,
      toDfHkey: Option[Column] = None): DataFrame = {
    val fromHk = fromDfHkey.getOrElse(fromDf(c.hkey))
    val toHk = toDfHkey.getOrElse(toDf(c.hkey))
    val lnkRaw = spark.table(s"$rawDatabase.`$lnkTableName`")

    val lnk = lnkRaw
      .join(toDf, lnkRaw(lnkToHkeyColumnName) === toHk, "left")
      .withColumnRenamed("PublicID", columnName)
      .drop(lnkRaw(c.hkey))
      .drop(lnkRaw(c.recordSource))
      .select(lnkRaw(lnkFromHkeyColumnName), col(columnName))
      .distinct()

    val idx = fromDf.columns.indexOf(columnName)
    val dfCols = fromDf.columns.toSeq.map(fromDf(_))
    val selected = dfCols.take(idx) ++ Seq(lnk(columnName)) ++ dfCols.drop(idx + 1)

    fromDf
      .join(lnk, fromHk === lnk(lnkFromHkeyColumnName), "left")
      .select(selected: _*)
  }

  /** The latest (ID, PublicID, UserName) row per user — the reference's
    * groupBy-max + self-join (Curated.py:149-154); the user dimension is
    * tiny so it broadcast-joins. Memoized and cached ONCE per Curated
    * instance: a curated view commonly has several *UserID columns, and
    * repeated builds must not each pin a fresh copy in executor storage.
    * Release with [[releaseUserInfoCache]] (the linkLoad
    * unpersist-handle pattern) once enrichment passes are done.
    *
    * Cache coherence: every engine write ends in
    * `spark.catalog.refreshTable`, which re-caches dependent plans — so
    * loads that land AFTER this cache is built still surface here
    * (pinned by the CuratedSpec coherence test). Only writes that bypass
    * the engine (and its refresh) require an explicit release. */
  private var userInfoCache: Option[DataFrame] = None

  /** Unpersist the memoized user lookup; the next enrichment rebuilds it. */
  def releaseUserInfoCache(): Unit = synchronized {
    userInfoCache.foreach(_.unpersist(blocking = false))
    userInfoCache = None
  }

  private def latestUserInfo(): DataFrame = synchronized {
    userInfoCache.getOrElse {
      val built = buildLatestUserInfo()
      userInfoCache = Some(built)
      built
    }
  }

  private def buildLatestUserInfo(): DataFrame = {
    val dfUser0 = businessVault.readDataFromHub("USER", Seq("ID", "PublicID"), includeHkey = true)
    val dfCredential = businessVault.readDataFromHub("CREDENTIAL", Seq("UserName"), includeHkey = true)
    val dfUserJoined = businessVault.joinLinkedDataframes(
      dfUser0, dfCredential, "LNK__USER__CREDENTIAL", "USER_HKEY", "CREDENTIAL_HKEY")
    // latest-per-ID as one row_number window (the engine's standard
    // rewrite of the reference's groupBy-max + self-join, Curated.py's
    // idiom) — one exchange, and the full tiebreak keeps the picked row
    // deterministic even if two rows share the max load date
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ID"))
      .orderBy(col(c.loadDate).desc, col("PublicID"), col("UserName"))
    dfUserJoined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("ID"), col("PublicID"), col("UserName"))
      .cache()
  }

  /** Enrich `*UserID` columns with the user's PublicID + UserName
    * (Curated.py:121-165). */
  def joinUserInformation(df: DataFrame, column: Option[String] = None): DataFrame = {
    val user = latestUserInfo()
    def enrich(acc: DataFrame, colName: String): DataFrame = {
      val columns = acc.columns
      val idx = columns.indexOf(colName)
      val outCols = columns.take(idx) ++ Seq(colName, s"${colName}_UserName") ++
        columns.drop(idx + 1)
      // fresh aliases per column: repeated joins against the one cached
      // user lookup must not share attribute ids across join rounds
      val uid = s"__user_id_$colName"
      val userEnriched = user.select(col("ID").as(uid),
        col("PublicID").as(colName), col("UserName").as(s"${colName}_UserName"))
      acc.join(userEnriched, acc(colName) === userEnriched(uid), "left")
        .drop(acc(colName))
        .select(outCols.toSeq.map(col): _*)
    }
    column match {
      case None =>
        df.columns.filter(_.endsWith("UserID")).foldLeft(df)(enrich)
      case Some(colName) => enrich(df, colName)
    }
  }

  /** Map field definitions to a flat curated view (Curated.py:196-271):
    * per-table hub reads, renames, FK→PublicID resolution, temporal
    * zip-joins across tables, projection, typelist + user enrichment. */
  def mapToCurated(fields: Seq[FieldDefinition]): DataFrame = {
    val rootTable = fields.head.fromTable
    val entityNames = fields.map(f =>
      f.fromTable -> getEntityNameFromSourceTableName(f.fromTable)).toMap

    var sources: Map[String, DataFrame] = entityNames.keys.map { table =>
      val attributes = fields.filter(_.fromTable == table).map(_.fromFieldName) :+ "retired"
      val df = businessVault.readDataFromHub(entityNames(table), attributes, includeHkey = true)
      table -> filterRetired(df)
    }.toMap

    // renames
    fields.filter(f => f.toFieldName != f.fromFieldName).foreach { f =>
      sources += f.fromTable ->
        sources(f.fromTable).withColumnRenamed(f.fromFieldName, f.toFieldName)
    }

    // FK → PublicID
    fields.filter(_.foreignKey).foreach { f =>
      val linkedEntity = getEntityNameFromSourceTableName(f.foreignKeyToTableName.get)
      val linkedHub = businessVault.readDataFromHub(linkedEntity, Seq("PublicID"), includeHkey = true)
      val lnkName = s"LNK__${entityNames(f.fromTable)}__$linkedEntity"
      sources += f.fromTable -> replaceIdWithPublicId(
        sources(f.fromTable), f.toFieldName, linkedHub, lnkName,
        s"${entityNames(f.fromTable)}_HKEY", s"${linkedEntity}_HKEY",
        Some(sources(f.fromTable)(c.hkey)), Some(linkedHub(c.hkey)))
    }

    // temporal zip-join of non-root tables onto the root
    var result = sources(rootTable)
    entityNames.keys.filter(_ != rootTable).foreach { table =>
      val linkName = s"LNK__${entityNames(rootTable)}__${entityNames(table)}"
      result = BusinessVaultOps.joinLinkedDataframes(
        result, sources(table),
        spark.table(s"$rawDatabase.`$linkName`"),
        s"${entityNames(rootTable)}_HKEY", s"${entityNames(table)}_HKEY",
        fromDfHkey = Some(sources(rootTable)(c.hkey)),
        toDfHkey = Some(sources(table)(c.hkey)),
        fromLoadDate = Some(result(c.loadDate)),
        fromLoadEndDate = Some(result(c.loadEndDate)),
        toLoadDate = Some(sources(table)(c.loadDate)),
        toLoadEndDate = Some(sources(table)(c.loadEndDate)),
        loadDateColumn = Some(c.loadDate),
        loadEndDateColumn = Some(c.loadEndDate),
        includeHkeys = true)
        .drop(sources(table)(c.hkey))
    }

    // projection to requested fields + validity interval
    val projected = result.select(
      fields.map(f => sources(f.fromTable)(f.toFieldName)) ++
        Seq(col(c.loadDate), col(c.loadEndDate)): _*)

    // typelist enrichment
    val withTypelists = fields.filter(_.isTypelist).foldLeft(projected)(
      (acc, f) => joinTypelist(acc, f.toFieldName, f.typelistTableName.get))

    joinUserInformation(withTypelists)
  }
}
