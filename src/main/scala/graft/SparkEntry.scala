package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` covers one operator family from SURVEY §2
  * (relational core, Data Vault loaders/derivations through the real
  * engine code) or a north-star pipeline operator (dedup, similarity
  * search, text analysis, multimodal). `oracleSql` holds the DuckDB
  * equivalent run by the correctness gate over the same parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ VaultQueries.queries ++ TextOps.queries ++
      VectorOps.queries ++ MultimodalQueries.queries ++ SinkOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ VaultQueries.oracleSql ++ TextOps.oracleSql ++
      VectorOps.oracleSql ++ MultimodalQueries.oracleSql ++ SinkOps.oracleSql

  /** Headline subset timed by Bench (one per operator family). */
  def benchQueries: Seq[String] = Seq(
    "q01_agg", "q03_join_broadcast", "q04_star_join", "q06_anti_join",
    "q09_latest_per_key", "q15_theta_join", "q16_zip_join", "q19_pit",
    "v02_sat_rows", "d06_jaccard_pairs", "d07_minhash_lsh", "d08_simhash",
    "e01_knn_brute", "e02_knn_ivf", "d09_embed_neardup", "mm01_media_features")
}
