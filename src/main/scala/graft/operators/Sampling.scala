package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset-split operators for training-data
  * pipelines. Everything keys off a stable md5 hash of the row id, so:
  *
  *  - assignments are reproducible across runs, engines, and cluster
  *    sizes (no RNG, no partition-order dependence — `df.sample` gives
  *    neither);
  *  - splits are CONSISTENT under corpus growth: a document keeps its
  *    split when new data arrives, which is what keeps eval sets
  *    uncontaminated across pipeline re-runs;
  *  - every operator is a narrow codegen'd projection/filter — no
  *    shuffle, no driver round-trip, pushdown-friendly at any scale.
  *
  * The hash bucket is the first 48 bits of md5(id) mod `buckets` —
  * identical to DuckDB's `('0x' || substr(md5(id::VARCHAR), 1, 12))::BIGINT`,
  * so an external oracle reproduces assignments bit-for-bit.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the id rendered as a
    * decimal string. 48 bits keeps the value exact in a signed 64-bit
    * long (and in DuckDB's BIGINT parse of the same hex). */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Split assignment from integer weights over a `buckets`-wide hash
    * space, e.g. Seq("train" -> 80, "val" -> 10, "test" -> 10) with
    * buckets = 100. Weights must sum to `buckets` so every row lands in
    * exactly one split. */
  def assignSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)], buckets: Int = 100,
      bucketCol: String = "bucket", splitCol: String = "split"): DataFrame = {
    require(weights.map(_._2).sum == buckets,
      s"split weights ${weights.map(_._2).sum} != bucket count $buckets")
    val bounds = weights.scanLeft(0)(_ + _._2).tail
    val b = col(bucketCol)
    val split = weights.zip(bounds).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), els) => when(b < hi, name).otherwise(els)
    }
    df.withColumn(bucketCol, hashBucket(col(idCol), buckets))
      .withColumn(splitCol, split)
  }

  /** Deterministic ~`num`/`den` sample: keeps rows whose hash bucket
    * (over `den` buckets) falls below `num`. Stable under re-runs and
    * corpus growth; the filter is a codegen'd projection that pushes
    * past column pruning like any other predicate. */
  def sampleByHash(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame =
    df.filter(hashBucket(col(idCol), den) < num)

  /** Per-stratum deterministic sampling: `fractions` maps a stratum
    * value (of `stratumCol`) to num-out-of-`den` keep rates; strata
    * absent from the map are dropped. The keep decision still keys off
    * the ID hash only, so a row's fate is independent of which strata
    * exist — adding a stratum never resamples another. */
  def sampleStratified(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Int], den: Int): DataFrame = {
    val b = hashBucket(col(idCol), den)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (s, num)) =>
      acc || (col(stratumCol) === s && b < num)
    }
    df.filter(keep)
  }
}
