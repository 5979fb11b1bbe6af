package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hashed-bigram LM perplexity (d38/p06): the integer quantized log2
  * against floating truth, edge handling, signal direction, and the
  * one-exchange scoring plan. */
class LmSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withQuantizedLog2 tracks log2 within ~2 quanta on random ratios") {
    val rnd = new scala.util.Random(7)
    val cases = (0 until 500).map { _ =>
      val n = 1L + rnd.nextInt(1 << 20)
      val d = n + rnd.nextInt(1 << 22)
      (d, n)
    } ++ Seq((1L, 1L), (2L, 1L), (3L, 2L), (1L << 40, 1L),
      ((1L << 40) + 7, (1L << 20) + 3))
    val got = TextAnalysis.withQuantizedLog2(
        cases.toDF("d", "n"), "d", "n", "q")
      .select("d", "n", "q").as[(Long, Long, Long)].collect()
    got.foreach { case (d, n, q) =>
      val truth = math.log(d.toDouble / n) / math.log(2.0) * 1024
      assert(math.abs(q - truth) <= 2.5,
        s"qlog2($d/$n) = $q vs ${truth.round} (${q - truth})")
    }
  }

  test("sub-2-token docs score 0 and stay in the output") {
    val docs = Seq((1L, "alpha beta alpha beta"), (2L, "single"),
      (3L, "")).toDF("doc_id", "text")
    val stats = TextAnalysis.localizeStats(
      TextAnalysis.lmStats(docs, "text", 64, 256))
    val got = TextAnalysis.lmPerplexity(docs, "text", "doc_id", stats, 64, 256)
      .select("doc_id", "n_trans", "ppl_q")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == ((0L, 0L)))
    assert(got(1L)._1 == 3L && got(1L)._2 > 0L)
  }

  test("scoring against a mismatched bucket/order config fails loudly") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    // the config rides the artifact through localizeStats
    val stats = TextAnalysis.localizeStats(
      TextAnalysis.lmStats(docs, "text", 64, 256))
    for ((cb, pb, ord) <- Seq((128, 256, 2), (64, 512, 2), (64, 256, 3))) {
      val e = intercept[IllegalArgumentException] {
        TextAnalysis.lmPerplexity(docs, "text", "doc_id", stats, cb, pb,
          order = ord)
      }
      assert(e.getMessage.contains("trained with"), e.getMessage)
    }
    // matched config passes; a bare metadata-free artifact skips the check
    TextAnalysis.lmPerplexity(docs, "text", "doc_id", stats, 64, 256).collect()
    val bare = stats.select(col("kind"), col("bucket"),
      col("cnt").cast("long").as("cnt"))
    TextAnalysis.lmPerplexity(docs, "text", "doc_id", bare, 999, 999).collect()
  }

  test("in-domain text scores lower perplexity than unseen text") {
    val train = Seq.tabulate(50)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val stats = TextAnalysis.localizeStats(
      TextAnalysis.lmStats(train, "text", 1024, 16384))
    val probe = Seq((1L, "the cat sat on the mat"),
      (2L, "zxq wvu ponm lkj ihg fed")).toDF("doc_id", "text")
    val got = TextAnalysis
      .lmPerplexity(probe, "text", "doc_id", stats, 1024, 16384)
      .select("doc_id", "ppl_q").as[(Long, Long)].collect().toMap
    assert(got(1L) < got(2L),
      s"in-domain ${got(1L)} should beat OOV ${got(2L)}")
  }

  test("order-5 model (the published CCNet order) separates in-domain text") {
    val train = Seq.tabulate(50)(i =>
      (i.toLong, "the cat sat on the mat and then slept"))
      .toDF("doc_id", "text")
    val stats = TextAnalysis.localizeStats(
      TextAnalysis.lmStats(train, "text", 16384, 16384, order = 5))
    val probe = Seq((1L, "the cat sat on the mat and then slept"),
      (2L, "zxq wvu ponm lkj ihg fed cba zyx wvu")).toDF("doc_id", "text")
    val got = TextAnalysis
      .lmPerplexity(probe, "text", "doc_id", stats, 16384, 16384, order = 5)
      .select("doc_id", "ppl_q").as[(Long, Long)].collect().toMap
    assert(got(1L) < got(2L),
      s"in-domain ${got(1L)} should beat OOV ${got(2L)} at order 5")
    // a 4-token doc has no 5-gram transition: scores 0, stays present
    val short = Seq((9L, "one two three four")).toDF("doc_id", "text")
    val g9 = TextAnalysis
      .lmPerplexity(short, "text", "doc_id", stats, 16384, 16384, order = 5)
      .select("doc_id", "n_trans", "ppl_q")
      .as[(Long, Long, Long)].collect()
    assert(g9.toSeq == Seq((9L, 0L, 0L)))
  }

  test("scoring plan: one exchange (the per-doc rollup), no train scan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = graft.queries.TextOps.queries("d38_lm_perplexity")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val nodes = graft.plans.PlanWalk.flatten(df.queryExecution.executedPlan)
    val ex = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(ex.size == 1, s"expected 1 exchange (doc rollup), got ${ex.size}")
    // the localized artifact means the documents scan appears ONCE:
    // the training pass ran at artifact-build time, not in this plan
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("documents"))
        => f
    }
    assert(scans.size == 1, s"documents scanned ${scans.size}x in the scoring plan")
  }
}
