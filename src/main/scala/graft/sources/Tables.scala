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

  /** events.parquet carries ns-precision timestamps, which Spark 4
    * rejects outright. Read them as raw nanos (legacy long mode) and
    * convert with exact integer division (ns epochs overflow double, so
    * no floating-point path) to the µs timestamps Spark can process.
    *
    * The legacy flag must be set at session construction (Bench, Verify,
    * TestSpark all do) — setting it here as a read side effect would
    * silently change how every other ns-parquet in the session is read,
    * and save/restore is unsound because the physical scan re-reads the
    * conf at planning time, after this method returned.
    */
  private def eventsWithTs(spark: SparkSession, sfDir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet is ns-precision: build the SparkSession with " +
        "spark.sql.legacy.parquet.nanosAsLong=true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
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
