package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Near-dup group resolution: connected components over candidate pairs. */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def groupsOf(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Dedup.nearDupGroups(pairs.toDF("a_id", "b_id"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("components resolve to min-id labels with sizes") {
    // two components: {1,2,3,9} (star + extra edge) and {5,6}
    val g = groupsOf(Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)))
    assert(g === Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 9L -> (1L, 4L),
      5L -> (5L, 2L), 6L -> (5L, 2L)))
  }

  test("long chain converges in logarithmic rounds") {
    // a 64-node chain needs ~6 pointer-jumping rounds, far under the cap
    val chain = (1L until 64L).map(i => (i, i + 1))
    val g = groupsOf(chain)
    assert(g.size === 64)
    assert(g.values.map(_._1).toSet === Set(1L))
    assert(g(64L) === (1L, 64L))
  }

  test("pipeline near-dup stage drops non-representatives") {
    val filler = (0 until 30).map(i => s"tok$i").mkString(" ")
    // two near-identical docs (share almost all trigrams) + one distinct
    val docs = Seq(
      (1L, s"the quick brown fox jumps over the lazy dog $filler"),
      (2L, s"the quick brown fox jumps over the lazy dog $filler end"),
      (3L, ("zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg " +
        "ff ee dd cc bb aa a1 a2 a3 a4 a5"))).toDF("doc_id", "text")
    val cleaned = Pipeline.cleanCorpus(docs, "text", "doc_id",
      thresholds = Pipeline.QualityThresholds(minTokens = 5, maxStopwordRatio = 1.0),
      nearDup = Some(Pipeline.NearDupConfig()))
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && ids.contains(3L))
    assert(!ids.contains(2L), "near-dup non-representative must be dropped")
  }
}
