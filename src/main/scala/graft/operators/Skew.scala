package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation and salted replicated
  * joins. AQE's skew-join split handles most shuffle skew at runtime;
  * these are for the cases it cannot re-plan — a groupBy where one key
  * holds most rows, or a join against a hot key — by spreading each hot
  * key over `buckets` sub-keys and re-combining.
  *
  * Salts derive from xxhash64 of a deterministic row expression, never
  * rand(): results must be reproducible across retries and engines.
  */
object Skew {

  private def salt(saltSource: Column, buckets: Int): Column =
    pmod(xxhash64(saltSource), lit(buckets)).cast("int")

  /** Two-phase sum: partial per (keys, salt), final per keys. Identical
    * result to a direct groupBy-sum, but the first exchange spreads hot
    * keys over `buckets` reducers. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltSource: Column, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(saltSource, buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(s"${valueCol}_sum"))

  /** Two-phase count per key group. */
  def saltedCount(df: DataFrame, keyCols: Seq[String],
      saltSource: Column, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(saltSource, buckets))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as("n"))

  /** Skew-safe equi-join: the big side gets a deterministic salt, the
    * small side is replicated once per salt bucket, and the join runs on
    * (key, salt) — a hot key's rows land on `buckets` tasks instead of
    * one. Result equals the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      saltSource: Column, buckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(saltSource, buckets))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until buckets).toArray)))
    saltedBig.join(replicated,
        saltedBig("__salt") === replicated("__salt") &&
          saltedBig(keyCol) === replicated(keyCol))
      .drop(saltedBig("__salt")).drop(replicated("__salt"))
      .drop(replicated(keyCol))
  }
}
