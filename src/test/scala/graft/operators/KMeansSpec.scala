package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** kmeansFit invariants: separable clusters converge, updates are
  * partition-independent (the exact-quantized-sum contract), empty
  * clusters retain their centroid, and the guards fire.
  */
class KMeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, Seq[Float])]) = Similarity.withNorm(
    rows.toDF("vec_id", "embedding"), "vec_id", "embedding")

  // two tight direction-separated groups: ids 1-3 near +x, ids 4-6 near +y
  private val separable = Seq(
    (1L, Seq(1.0f, 0.05f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(1.1f, 0.0f)),
    (4L, Seq(0.05f, 1.0f)), (5L, Seq(0.1f, 0.9f)), (6L, Seq(0.0f, 1.1f)))

  test("separable clusters converge to the two directions") {
    // md5-order seeds for ids 1..6 are ids 6 and 4 — both in the +y
    // group — so convergence to a balanced split requires the mean
    // update to actually move a centroid toward +x once the +x points
    // win the cosine argmax
    val m = Similarity.kmeansFit(frame(separable), "vec_id",
      k = 2, iters = 3, dim = 2)
    val byCluster = m.assignment.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byCluster.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(byCluster(1L), byCluster(2L), byCluster(3L)).size === 1)
    assert(Set(byCluster(4L), byCluster(5L), byCluster(6L)).size === 1)
    assert(byCluster(1L) !== byCluster(4L))
  }

  test("centroids are bit-identical under different partitionings") {
    // the whole point of quantized long accumulation: the distributed
    // mean must not depend on how rows are split across tasks
    val df = separable.toDF("vec_id", "embedding")
    val a = Similarity.kmeansFit(Similarity.withNorm(
      df.repartition(1), "vec_id", "embedding"), "vec_id", 2, 2, 2)
    val b = Similarity.kmeansFit(Similarity.withNorm(
      df.repartition(5, col("vec_id")), "vec_id", "embedding"), "vec_id", 2, 2, 2)
    assert(a.centroids.map(_.toSeq) === b.centroids.map(_.toSeq))
    assert(a.norms === b.norms)
  }

  test("an empty cluster keeps its previous centroid") {
    // md5 order for ids 1,2,3 coincides with id order (checked in the
    // seeding spec below), so the seeds are ids 1 and 2 — two identical
    // seed vectors, so seed 1 (higher index) never wins a tie
    // (first-wins argmax) and must survive untouched
    val dup = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f)))
    val m = Similarity.kmeansFit(frame(dup), "vec_id", k = 2, iters = 2, dim = 2)
    // round 1 assigns everything to cluster 0 (exact ties go first-wins),
    // so cluster 1 is empty and must keep the raw seed
    assert(m.centroids(1).toSeq === Seq(1.0f, 0.0f))
    // after cluster 0's centroid moves to the 3-point mean, the two
    // exact-(1,0) vectors now strictly prefer the retained seed — the
    // kept centroid participates in later rounds, it isn't dead
    val byCluster = m.assignment.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byCluster === Map(1L -> 1, 2L -> 1, 3L -> 0))
  }

  test("trained model composes into the IVF serving path") {
    // the point of e08: kmeansFit output is assignToCentroids-shaped,
    // so the trained assignment feeds index build + probe unchanged
    val base = Similarity.withNorm(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding")
    val m = Similarity.kmeansFit(base, "vec_id", k = 4, iters = 2, dim = 64)
    assert(m.assignment.count() === base.count())
    val inMem = Similarity.knnIvf(m.assignment, col("vec_id") < 3, "vec_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inMem.nonEmpty)
    spark.sql("CREATE DATABASE IF NOT EXISTS km_idx")
    Similarity.buildIvfIndex(m.assignment, "km_idx.ivf_trained", buckets = 2)
    val probed = Similarity.probeIvfIndex(spark, "km_idx.ivf_trained",
        col("vec_id") < 3, "vec_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(probed === inMem)
  }

  test("seeding follows (md5(id), id) hash order, not ingestion order") {
    // the scenario md5 seeding exists for: the k lowest ids all sit in
    // one cluster (one source, one crawl slice) — id-ordered seeding
    // would start Lloyd from a single direction; hash-ordered seeding
    // must pick a decorrelated pseudo-random sample instead
    val lowIdCluster = (1L to 8L).map(i => (i, Seq(1.0f, 0.01f * i)))
    val highIdCluster = (100L to 107L).map(i => (i, Seq(0.01f * (i - 99), 1.0f)))
    val seeds = Similarity.kmeansSeeds(
      frame(lowIdCluster ++ highIdCluster), "vec_id", k = 2, dim = 2)
    // expected order computed independently of the engine
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byHash = (lowIdCluster ++ highIdCluster)
      .sortBy { case (id, _) => (md5Hex(id.toString), id) }
    assert(seeds.map(_.toSeq) === byHash.take(2).map(_._2),
      "seeds must be the 2 smallest by (md5(id), id)")
    // and for this fixture hash order genuinely decorrelates: ids 6 and
    // 101 — one seed per cluster, where id order would give 1 and 2
    assert(byHash.take(2).map(_._1) === Seq(6L, 101L))
    // the dup-seed test above depends on md5 order 1 < 2 < 3
    assert(Seq("1", "2", "3").map(md5Hex) === Seq("1", "2", "3").map(md5Hex).sorted)
  }

  test("headroom guard rejects quantized sums that could wrap") {
    // quantized components ~±4e18 with MIXED signs: the actual sum
    // (~4e18) fits in 64 bits, so neither ANSI arithmetic nor the
    // oracle would notice — but cnt * maxAbs = 3 * 4e18 exceeds
    // Long.MaxValue, so a different sign mix WOULD wrap. The sentry
    // must reject the configuration, not trust the lucky cancellation
    val huge = Seq((1L, Seq(4.0e15f, 0.0f)), (2L, Seq(-4.0e15f, 0.1f)),
      (3L, Seq(4.0e15f, 0.05f)))
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansFit(frame(huge), "vec_id", k = 1, iters = 1, dim = 2)
    }
    assert(e.getMessage.contains("headroom"))
  }

  test("headroom guard sees components past long range (abs-wrap regression)") {
    // 1e17f * quantScale(1000) = 1e20 > 2^63. Under ANSI (this
    // session's default) the bigint cast itself throws — already loud.
    // The dangerous environment is ansi=false, where the cast CLAMPS to
    // Long.MinValue and abs(Long.MinValue) wraps negative, so a
    // long-domain max sentry never saw this component and the sum
    // wrapped silently; the double-domain sentry must reject it loudly
    val past = Seq((1L, Seq(1.0e17f, 0.0f)), (2L, Seq(0.5f, 0.1f)))
    val key = "spark.sql.ansi.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val e = intercept[IllegalArgumentException] {
        Similarity.kmeansFit(frame(past), "vec_id", k = 1, iters = 1, dim = 2)
      }
      assert(e.getMessage.contains("headroom"))
    } finally spark.conf.set(key, old)
  }

  test("corpus smaller than k seeds only the available vectors") {
    val m = Similarity.kmeansFit(frame(separable.take(2)), "vec_id",
      k = 5, iters = 1, dim = 2)
    assert(m.centroids.length === 2)
  }

  test("guards: k, iters, dim, and empty input") {
    val f = frame(separable)
    intercept[IllegalArgumentException] {
      Similarity.kmeansFit(f, "vec_id", k = 0, iters = 1, dim = 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansFit(f, "vec_id", k = 2, iters = 0, dim = 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansFit(f, "vec_id", k = 2, iters = 1, dim = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.kmeansFit(frame(Seq.empty), "vec_id", k = 2, iters = 1, dim = 2)
    }
    // a dim that matches no vector must fail loudly at seeding, not
    // train against truncated sums or return a silently empty model
    intercept[IllegalArgumentException] {
      Similarity.kmeansFit(frame(separable), "vec_id", k = 2, iters = 1, dim = 3)
    }
  }
}
