package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** A/B for the r15 BPE-training re-shape: per-merge-iteration cost of
  * the old corpus-scan pair count vs the histogram-scan form, on the
  * same documents fixture. Run:
  * `Test/runMain graft.BpeTrainAB [sfDir] [iters]`. */
object BpeTrainAB {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 8
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf)
    val merges = TextAnalysis.defaultBpeMerges.take(8)
    val m = array(merges.map { case (l, r) => array(lit(l), lit(r)) }: _*)
      .cast("array<array<string>>")

    def corpusIter(): Unit = docs
      .select(explode(call_function("graft_bpe_pairs", col("text"), m)).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("p").asc).limit(1).collect()

    val hist = TextAnalysis.bpeWordHistogram(docs, "text").persist()
    val nWords = hist.count()
    val nDocs = docs.count()
    def histIter(): Unit = TextAnalysis.bpePairCounts(hist, merges)
      .orderBy(col("c").desc, col("p").asc).limit(1).collect()

    // warm both paths once, then alternate
    corpusIter(); histIter()
    var tc = 0.0; var th = 0.0
    (1 to iters).foreach { _ =>
      val t0 = System.nanoTime(); corpusIter()
      val t1 = System.nanoTime(); histIter()
      val t2 = System.nanoTime()
      tc += (t1 - t0) / 1e9; th += (t2 - t1) / 1e9
    }
    println(f"DOCS=$nDocs VOCAB=$nWords CORPUS_PER_ITER=${tc / iters}%.3f " +
      f"HIST_PER_ITER=${th / iters}%.3f SPEEDUP=${tc / th}%.2f")
    hist.unpersist()
  }
}
