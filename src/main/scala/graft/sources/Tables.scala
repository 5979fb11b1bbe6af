package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md). One parquet file per table under the sf directory.
  *
  * At 100 TB each of these would be a partitioned/bucketed catalog table;
  * the single-file layout is the driver's fixture, so the reader stays a
  * plain parquet scan — filters and column pruning still push down to the
  * scan (verified via explain in QuerySpec).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet's `ts` column has shipped in two physical forms
    * across fixture generations: INT64 nanoseconds (read as LongType
    * under spark.sql.legacy.parquet.nanosAsLong=true — Spark 4 rejects
    * ns-precision outright without the flag) and, since 2026-08,
    * `timestamp[us]` without a timezone (read as TIMESTAMP_NTZ).
    * [[normalizeTs]] maps every form to one canonical session-local
    * TimestampType so downstream code (windows, unix_millis, watermarks)
    * sees a single type regardless of fixture vintage. Sessions pin
    * spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast is the
    * identity on the underlying epoch micros.
    *
    * The legacy ns flag must be set at session construction (Bench,
    * Verify, TestSpark all do) — setting it here as a read side effect
    * would silently change how every other ns-parquet in the session is
    * read, and save/restore is unsound because the physical scan
    * re-reads the conf at planning time, after this method returned.
    */
  private def eventsWithTs(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(eventsRaw(spark, sfDir))

  /** The RAW events read, no ts canonicalization — the stream-replay
    * queries (w02/w04) need the file bytes' own schema. Spark 4 rejects
    * the legacy int64-ns physical form outright ("Illegal Parquet
    * type") unless spark.sql.legacy.parquet.nanosAsLong=true was set at
    * SESSION CONSTRUCTION, which would otherwise surface as a raw
    * parser error with no hint at the fix; translate it into the
    * actionable guidance here, the same named place normalizeTs fails
    * for an unknown fourth form. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    try table(spark, sfDir, "events")
    catch {
      case e: Throwable if Option(e.getMessage).exists(m =>
          m.contains("NANOS") || m.contains("Illegal Parquet type")) =>
        throw new IllegalStateException(
          "events.parquet carries the legacy int64-nanosecond ts form; " +
            "build the session with spark.sql.legacy.parquet.nanosAsLong=true " +
            "(Bench, Verify and TestSpark all do) so it reads as LongType " +
            "for Tables.normalizeTs to canonicalize", e)
    }

  /** Normalize an events-shaped frame's `ts` to TimestampType, whatever
    * physical form it was read in. Shared with code that must consume
    * the RAW file bytes first (the w02 stream replay) and only then
    * canonicalize. Fails loudly on an unrecognized type so the next
    * fixture-format drift breaks HERE, in one named place, instead of
    * deep inside two query plans (the r11 lesson). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      // legacy int64-ns under nanosAsLong=true: exact integer division
      // (ns epochs overflow double, so no floating-point path) to µs
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other => sys.error(
        s"events.ts arrived as unsupported physical type $other — " +
          "teach graft.sources.Tables.normalizeTs the new fixture form")
    }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsWithTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
