package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Oracle-checked coverage of graft.sources.Sinks: each query writes a
  * fixture table through a sink format into a scratch directory, reads
  * it back, and aggregates — the oracle runs the same aggregate on the
  * original parquet, so a hash match proves the write→read roundtrip is
  * lossless. Text integrity rides an order-insensitive digest (md5 over
  * the sorted per-row md5 list); counts/sums cover the numeric columns.
  */
object SinkOps {

  /** Scratch dir keyed by query name AND sf directory: a path shared
    * across scale factors would let a concurrent Verify run at another
    * sf clobber the files this plan is about to read. */
  private def scratch(name: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-sinks/${new java.io.File(sfDir).getName}/$name"

  /** Per-lang rollup with a text-integrity digest, used by both
    * roundtrip queries so CSV and JSON prove the same contract. */
  private def docsRollup(df: DataFrame): DataFrame =
    df.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("sum_chars"),
      md5(concat_ws(",", sort_array(collect_list(md5(col("text")))))).as("texts_md5"))

  private val docsRollupSql =
    """SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
       md5(array_to_string(list_sort(list(md5(text))), ',')) AS texts_md5
       FROM documents GROUP BY lang"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hive-partitioned parquet sink: write documents partitioned by
    // lang, read back filtering one partition — the filter must prune
    // directories at planning time (PartitionFilters, pinned by
    // QueryPlanSpec), not scan-and-drop rows.
    "f01_partitioned_prune" -> ((s, d) => {
      val path = scratch("f01", d)
      Sinks.writePartitioned(Tables.documents(s, d), path, "lang")
      Sinks.readPartitioned(s, path)
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    }),

    "f02_csv_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val path = scratch("f02", d)
      Sinks.writeCsv(docs, path)
      docsRollup(Sinks.readCsv(s, path, docs.schema))
    }),

    "f03_json_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val path = scratch("f03", d)
      Sinks.writeJson(docs, path)
      docsRollup(Sinks.readJson(s, path, docs.schema))
    }),

    // Z-order clustered layout: lineitem written partitioned by the
    // Morton bucket of (l_partkey, l_suppkey), then a 2-D range query
    // read through the intersecting-bucket set (directory pruning,
    // plan-pinned) + residual filter — must equal the plain filtered
    // rollup over the unclustered table.
    "f05_zorder_prune" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val mx = li.agg(max("l_partkey"), max("l_suppkey")).head
      val (xm, ym) = (mx.getLong(0), mx.getLong(1))
      val path = scratch("f05", d)
      graft.operators.ZOrder.writeZOrdered(li, path,
        "l_partkey", "l_suppkey", xm, ym)
      graft.operators.ZOrder.readPruned(s, path, "l_partkey", "l_suppkey",
          (xm / 4, xm / 2), (ym / 4, ym / 2), xm, ym)
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
    }),

    // ORC columnar roundtrip: the same losslessness contract as
    // f02/f03 through Spark's built-in ORC source (schema travels in
    // the files — no explicit-schema read needed).
    "f04_orc_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val path = scratch("f04", d)
      Sinks.writeOrc(docs, path)
      docsRollup(Sinks.readOrc(s, path))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "f01_partitioned_prune" ->
      """SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
         FROM documents WHERE lang = 'en' GROUP BY source""",
    "f02_csv_roundtrip" -> docsRollupSql,
    "f03_json_roundtrip" -> docsRollupSql,
    "f04_orc_roundtrip" -> docsRollupSql,
    // the z-machinery is semantics-transparent: bucket enumeration is
    // a superset of the rectangle and the residual filter is exact, so
    // the oracle is the plain rollup with the same integer-div bounds
    "f05_zorder_prune" ->
      """WITH m AS (SELECT max(l_partkey) AS xm, max(l_suppkey) AS ym
           FROM lineitem)
         SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem, m
         WHERE l_partkey BETWEEN xm // 4 AND xm // 2
           AND l_suppkey BETWEEN ym // 4 AND ym // 2"""
  )
}
