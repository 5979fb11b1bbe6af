package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** One-off measurement: what does appendToIvfIndex's point-lookup plan
  * COST at the `maxBatchIds` cap (2^20 keys as planning-time literals)?
  *
  * The idempotence check deliberately turns the micro-batch's (cid, id)
  * pairs into `isin` literal lists so the index scan bucket-prunes
  * instead of shuffling the corpus (Similarity.scala, freshIndexRows).
  * That trades a planning-time cost that grows with the batch for an
  * execution-time cost that no longer grows with the corpus — the right
  * trade at 100 TB, but the planning side had never been measured at
  * the cap (r11 carried cosmetic). This main times, at batch sizes up
  * to the cap: the driver-side key collect, the plan build
  * (analysis → optimized → executedPlan, where the literal lists live),
  * and the anti-join execution against a small seeded index; plus the
  * retained size of the literal-bearing plan. Numbers land in
  * SCALING.md ("IVF append at the cap").
  *
  * Usage: `Test/runMain graft.IvfAppendPlanCost [maxExp]` (default 20 —
  * i.e. measure at 2^14, 2^16, 2^18, 2^20).
  */
object IvfAppendPlanCost {
  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(20)
    val spark = TestSpark.spark
    import spark.implicits._
    val dim = 8
    val table = "ivf_plan_cost_idx"

    // small seeded index: the lookup target. Bucket layout matches the
    // production shape; its size is irrelevant to PLANNING cost (the
    // literals come from the batch side).
    def mkBatch(n: Int, offset: Long) =
      spark.range(n).select((col("id") + offset).as("vec_id"),
        array((0 until dim).map(j =>
          ((hash(col("id") * (j + 1)) % 1000) / 100.0).cast("float")): _*)
          .as("embedding"))
    def normed(n: Int, offset: Long) = Similarity.withNorm(
      mkBatch(n, offset), "vec_id", "embedding")
    val centroids = normed(32, 10_000_000L)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.buildIvfIndex(
      Similarity.assignToCentroids(normed(1000, 20_000_000L), centroids,
        "vec_id"), table)

    // plan + execute under the SAME conf appendToIvfIndex applies in
    // production (autoBucketedScan off — under the default heuristic
    // the In(cid) bucket pruning is discarded and the check reads
    // every bucket), so the published numbers measure the real path
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try for (exp <- 14 to maxExp by 2) {
      val n = 1 << exp
      val batch = normed(n, 0L)
      val t0 = System.nanoTime()
      val (fresh, release) = Similarity.freshIndexRows(batch, table,
        centroids, "vec_id")
      val tCollect = (System.nanoTime() - t0) / 1e9 // assign + collect
      val t1 = System.nanoTime()
      val plan = fresh.queryExecution.executedPlan // analyze + optimize + plan
      val tPlan = (System.nanoTime() - t1) / 1e9
      val planChars = plan.toString.length // retained textual footprint
      val t2 = System.nanoTime()
      val rows = fresh.count() // execute the anti-join
      val tExec = (System.nanoTime() - t2) / 1e9
      release()
      println(f"PLANCOST n=$n%8d collect=$tCollect%7.2fs plan=$tPlan%7.2fs " +
        f"exec=$tExec%7.2fs fresh_rows=$rows%8d plan_chars=$planChars%9d")
    } finally spark.conf.set(key, old)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
