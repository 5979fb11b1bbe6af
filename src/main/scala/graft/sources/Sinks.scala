package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File sinks beyond plain parquet: hive-style partitioned parquet
  * layouts plus CSV and JSON-lines interchange formats, each with the
  * matching reader so a write→read roundtrip is one call.
  *
  * Partitioned layout is the 100 TB default: `partitionBy` turns the
  * partition column into directory structure, so a reader filtering on
  * it prunes whole directories at planning time (PartitionFilters in the
  * scan — pinned by QueryPlanSpec) and never opens the files. CSV/JSON
  * exist for interchange with non-parquet producers/consumers; both
  * write one file per task (no driver funnel) and read back with an
  * explicit schema — inference would re-scan the data and guess types.
  */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCols` (hive-style
    * `col=value/` directories). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read a partitioned parquet layout; partition-column filters applied
    * by the caller prune directories, not rows. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write `df` as quoted, headered CSV. Spark's writer quotes and
    * escapes embedded delimiters/quotes/newlines, so string columns
    * survive the roundtrip byte-exact. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read CSV written by [[writeCsv]] with the given schema (pass the
    * source frame's schema — never infer on the read path). */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Write `df` as ORC — the columnar interchange format of the
    * Hive/Trino-adjacent stacks. Spark's built-in ORC source keeps the
    * parquet-grade properties (vectorized reads, predicate pushdown,
    * per-task files), so the roundtrip contract matches [[writePartitioned]]. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC written by [[writeOrc]]; the schema travels in the files. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write `df` as JSON lines (one object per row). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON lines with an explicit schema. */
  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
