package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The d47 model-based quality classifier: one-pass Naive Bayes
  * training to a config-sized artifact, integer quantized-log2 nll
  * scoring, margin decision rule — and the one-exchange scoring plan. */
class NbSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureStats(buckets: Int = 64) = {
    val train = Seq(
      (1L, "good clean prose with varied words", true),
      (2L, "another fine well formed document", true),
      (3L, "spam spam spam buy now spam", false),
      (4L, "junk junk click here junk", false)
    ).toDF("doc_id", "text", "is_hq")
    TextAnalysis.localizeStats(
      TextAnalysis.nbStats(train, "text", "is_hq", buckets))
  }

  test("artifact is config-sized with a prior row and carried config") {
    val stats = fixtureStats(64)
    assert(stats.count() <= 65)
    val prior = stats.filter(col("bucket") === -1)
      .select("n_pos", "n_neg").as[(Long, Long)].collect()
    assert(prior.toSeq == Seq((2L, 2L)), "doc counts ride bucket -1")
    val m = stats.schema.fields.find(_.name == "n_pos").get.metadata
    assert(m.getLong("buckets") == 64L)
    // token totals: 6 + 5 = 11 per class in the fixture
    val tot = stats.filter(col("bucket") >= 0)
      .agg(sum("n_pos"), sum("n_neg")).as[(Long, Long)].head()
    assert(tot == ((11L, 11L)))
  }

  test("mismatched bucket config fails loudly; bare artifact skips") {
    val stats = fixtureStats(64)
    val docs = Seq((1L, "good prose")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.nbScore(docs, "text", "doc_id", stats, buckets = 128)
    }
    assert(e.getMessage.contains("trained with buckets=64"), e.getMessage)
    val bare = stats.select(col("bucket"),
      col("n_pos").cast("long").as("n_pos"), col("n_neg"))
    TextAnalysis.nbScore(docs, "text", "doc_id", bare, buckets = 128)
      .collect()
  }

  test("class-marker text classifies to its class; margin separates") {
    val stats = fixtureStats(256)
    val probe = Seq(
      (1L, "good clean prose with fine words"),
      (2L, "spam junk buy now click here spam junk")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.nbScore(probe, "text", "doc_id", stats, 256)
      .select("doc_id", "margin_q", "pred_hq")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3, s"hq probe predicted junk: ${got(1L)}")
    assert(!got(2L)._3, s"junk probe predicted hq: ${got(2L)}")
    assert(got(1L)._2 > got(2L)._2)
  }

  test("token-less and OOV docs survive and score on the prior alone") {
    // priors 2 vs 2 docs and equal class token totals -> for tokens
    // hashing to UNOCCUPIED buckets both nll terms are equal -> margin
    // exactly 0 (4096 buckets so the fixture's 22 tokens leave the
    // probe's buckets empty — deterministic under the fixed hash)
    val stats = fixtureStats(4096)
    val probe = Seq((1L, ""), (2L, "zzz qqq vvv")).toDF("doc_id", "text")
    val got = TextAnalysis.nbScore(probe, "text", "doc_id", stats, 4096)
      .select("doc_id", "n_tok", "margin_q")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // empty text still splits to one (empty) token — bare space-split,
    // identical to the LM chain's tokenizer
    assert(got(1L)._1 == 1L)
    assert(got.contains(2L), "OOV doc must stay in the output")
    // OOV tokens hit no bucket on either side: per-token nll terms are
    // equal ((N+B)/1 both classes, equal totals here), margin 0
    assert(got(2L)._2 == 0L, s"symmetric-fixture OOV margin: ${got(2L)}")
  }

  test("scoring plan: one exchange (the doc rollup), no train rescan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = graft.queries.TextOps.queries("d47_quality_classifier")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val nodes = graft.plans.PlanWalk.flatten(df.queryExecution.executedPlan)
    val ex = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(ex.size == 1, s"expected 1 exchange (doc rollup), got ${ex.size}")
    // the localized artifact means the documents scan appears ONCE:
    // training ran at artifact-build time, not in this plan
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("documents"))
        => f
    }
    assert(scans.size == 1, s"documents scanned ${scans.size}x in scoring plan")
  }
}
