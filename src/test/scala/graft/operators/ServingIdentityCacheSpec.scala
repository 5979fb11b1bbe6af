package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Tables

/** The serving-identity session cache (r22): a repeat external probe
  * of the same index with the same codebook frame must run ZERO
  * identity derivations (no fingerprint collect, no codebook-table
  * read) — the per-probe driver jobs the high-QPS serving loop was
  * paying — while a rebuild invalidates and a drifted codebook still
  * fails loudly.
  */
class ServingIdentityCacheSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val base =
    Similarity.withNorm(Tables.embeddings(spark, sf), "vec_id", "embedding")
  private def cents = base.filter(col("vec_id") % 50 === 0)

  private def derivations = Similarity.servingIdentityDerivations.get()

  test("repeat IVF external probe runs zero identity derivations") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_vecstore")
    val tbl = "graft_vecstore.spec_servcache_ivf"
    val c = cents
    Similarity.buildIvfIndex(
      Similarity.assignToCentroids(base.filter(col("vec_id") >= 5), c,
        "vec_id"), tbl, buckets = 4)
    val q = base.filter(col("vec_id") < 5)
    val first = Similarity.probeIvfIndexExternal(spark, tbl, q, c,
      "vec_id", 3).collect().toSet
    val before = derivations
    val second = Similarity.probeIvfIndexExternal(spark, tbl, q, c,
      "vec_id", 3).collect().toSet
    assert(derivations === before,
      "a repeat probe with the same codebook frame must hit the cache")
    assert(second === first, "cache hit must not change the verdicts")
    // a REBUILD drops the entry: the next probe re-derives
    Similarity.buildIvfIndex(
      Similarity.assignToCentroids(base.filter(col("vec_id") >= 5), c,
        "vec_id"), tbl, buckets = 4)
    Similarity.probeIvfIndexExternal(spark, tbl, q, c, "vec_id", 3)
      .collect()
    assert(derivations > before,
      "a rebuild must invalidate the serving-identity cache")
  }

  test("repeat PQ external probe runs zero identity derivations and " +
      "a drifted codebook still fails loudly") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_vecstore")
    val tbl = "graft_vecstore.spec_servcache_pq"
    val c = cents
    val corpus = base.filter(col("vec_id") >= 5)
    val codebooks = Similarity.pqTrainSampled(corpus, "vec_id", m = 8,
      maxCodewords = 4)
    Similarity.buildPqIndex(
      Similarity.pqEncode(
        Similarity.assignToCentroids(corpus, c, "vec_id"),
        "vec_id", codebooks),
      "vec_id", tbl, codebooks, c, buckets = 4)
    val q = base.filter(col("vec_id") < 5)
    val first = Similarity.probePqIndexExternal(spark, tbl, q, c,
      "vec_id", 3).collect().toSet
    val before = derivations
    val second = Similarity.probePqIndexExternal(spark, tbl, q, c,
      "vec_id", 3).collect().toSet
    assert(derivations === before,
      "a repeat PQ probe must re-derive neither fingerprint nor codebooks")
    assert(second === first)
    // a DIFFERENT codebook frame misses the cache and fails the stamp
    // check loudly — the guard the cache must not weaken
    val drifted = base.filter(col("vec_id") % 50 === 1)
    val e = intercept[IllegalArgumentException] {
      Similarity.probePqIndexExternal(spark, tbl, q, drifted, "vec_id", 3)
    }
    assert(e.getMessage.contains("is not the one"), e.getMessage)
  }
}
