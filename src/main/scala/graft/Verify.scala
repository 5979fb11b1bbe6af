package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A query that throws is caught (one broken query must not hide the
  * other results from the gate) but the run ENDS LOUDLY: failures are
  * written to `_failures.json` in the out dir and main exits non-zero.
  * In r11 two queries that failed to plan were only logged to stderr, so
  * a 92-query surface silently became a 90-row all-green correctness
  * file; the loud ending makes a narrowed gate impossible to miss.
  */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query's result + the oracle SQL + (when the out dir
    * holds any failed query) `_failures.json` under `outDir`. Returns
    * THIS run's (name, error) failure list so main can exit non-zero
    * and VerifyContractSpec can assert the loud-failure contract
    * without a sys.exit killing the JVM.
    *
    * The failure record is kept per query (`_failures/<name>.txt`) and
    * `_failures.json` is re-aggregated from it each run, because out
    * dirs are REUSED (the documented workflow writes /tmp/verify_out)
    * and runs can be prefix-scoped: a green full run must clear a
    * stale record, but a green `d`-prefixed run must NOT un-condemn an
    * out dir whose w-query failure it never re-ran — it clears only
    * its own entries and the summary reflects the union. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String]): Seq[(String, String)] = {
    new java.io.File(outDir).mkdirs()
    val fdir = Paths.get(s"$outDir/_failures")
    Files.createDirectories(fdir)
    val failures = queries.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Files.deleteIfExists(fdir.resolve(s"$name.txt"))
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}".take(500)
        Files.writeString(fdir.resolve(s"$name.txt"), msg)
        Some(name -> msg)
      }
    }
    val json = oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // aggregate the record: this run's failures plus any still-standing
    // entries from queries this (possibly prefix-scoped) run skipped
    val listing = Files.list(fdir)
    val standingPaths =
      try listing.iterator().asScala.toList finally listing.close()
    val standing = standingPaths
      .filter(_.toString.endsWith(".txt")).sortBy(_.getFileName.toString)
      .map(p => p.getFileName.toString.stripSuffix(".txt") ->
        Files.readString(p))
    if (standing.isEmpty) {
      Files.deleteIfExists(Paths.get(s"$outDir/_failures.json"))
      // best-effort: a stray non-.txt entry (filtered out of `standing`)
      // would make this DirectoryNotEmptyException — an all-green run
      // must not crash on it, so leave the dir in place instead
      try Files.deleteIfExists(fdir)
      catch { case _: java.io.IOException => () }
    } else {
      val fj = standing.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/_failures.json"), fj)
      System.err.println(
        s"[verify] ${standing.size} quer${if (standing.size == 1) "y" else "ies"} " +
          s"FAILED (incl. prior runs into this dir): " +
          standing.map(_._1).mkString(", "))
    }
    failures
  }

  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated name prefixes — dump only the
    // matching queries (and their oracle SQL), e.g. "d,e" for the
    // dedup/ANN families in a one-off larger-scale sweep. The driver
    // always calls with two args and gets the full set.
    val (sfDir, outDir, prefixes) = args match {
      case Array(s, o)    => (s, o, Seq.empty[String])
      case Array(s, o, p) => (s, o, p.split(",").toSeq.filter(_.nonEmpty))
      case _ => sys.error(
        s"usage: graft.Verify <sfDir> <outDir> [namePrefixes] — got ${args.length} args")
    }
    def selected(name: String): Boolean =
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    // a typo'd prefix must fail loudly, not dump zero queries and let
    // the downstream compare report a vacuous "0 pass, 0 fail"
    prefixes.foreach { p =>
      require(SparkEntry.queries.keys.exists(_.startsWith(p)),
        s"prefix '$p' matches no query in SparkEntry.queries")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // fresh warehouse per run: catalog-writing queries (v10, e07)
      // otherwise trip over managed-table locations orphaned by a
      // previous run's metastore under ./spark-warehouse. Reuse-keyed
      // (wipe + recreate) rather than createTempDirectory so repeated
      // verify runs in one session don't accumulate orphan dirs.
      .config("spark.sql.warehouse.dir",
        graft.sources.Scratch.dir("verify-wh", outDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = dump(spark, sfDir, outDir,
      SparkEntry.queries.filter(kv => selected(kv._1)),
      SparkEntry.oracleSql.filter(kv => selected(kv._1)))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
