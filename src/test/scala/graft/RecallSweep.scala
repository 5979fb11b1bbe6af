package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Recall@k sweep of every ANN variant against brute-force ground
  * truth — the approximation-QUALITY measurement the oracle gate
  * cannot provide (the e-query oracles replay the same approximation,
  * proving determinism, never closeness to the true neighbors).
  *
  * Usage: `Test/runMain graft.RecallSweep [sfDir] [nq] [k]`
  * (defaults /root/testdata/sf0.1, 50 queries, recall@10). Prints one
  * `RECALL method=… <tunables> recall=…` line per configuration; the
  * sf0.1 table lives in SCALING.md ("ANN recall", r11). Everything is
  * deterministic — corpus, seeds, hashes — so the numbers are exact
  * and re-runnable, and SimilaritySpec pins floors for the shipped
  * e-query configurations.
  */
object RecallSweep {

  /** recall@k = |ann top-k ∩ brute top-k| / |brute top-k|, micro-
    * averaged over queries (both frames: (qid, neighbor_id, rank)). */
  def recallAt(truth: DataFrame, ann: DataFrame, k: Int): Double = {
    val t = truth.filter(col("rank") <= k).select("qid", "neighbor_id")
    val a = ann.filter(col("rank") <= k).select("qid", "neighbor_id")
    t.join(a, Seq("qid", "neighbor_id")).count().toDouble / t.count()
  }

  /** Deterministic CLUSTERED corpus: `blobs` Gaussian blobs around unit
    * seed centers, point i in blob i % blobs, per-point RNG seeded by a
    * mix of (seed, i) so the data is identical regardless of
    * generation order. The fixture embeddings are isotropic noise —
    * the ANN WORST case, where recall ≈ scanned fraction no matter how
    * good the blocking is, so a silently-broken bucketing could hide
    * there. On a clustered corpus true neighbors share a blob, so
    * working blocking must capture them (recall far above the scanned
    * fraction) and a blocking bug collapses recall — the shape where
    * quality bugs are actually visible. Schema matches embeddings
    * (vec_id, embedding) so every Similarity entry point applies. */
  def clusteredCorpus(spark: org.apache.spark.sql.SparkSession,
      n: Int, dim: Int, blobs: Int, sigma: Double, seed: Long): DataFrame = {
    import spark.implicits._
    val centerRnd = new scala.util.Random(seed)
    val centers = Array.fill(blobs) {
      val c = Array.fill(dim)(centerRnd.nextGaussian())
      val nrm = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / nrm)
    }
    (0 until n).map { i =>
      val c = centers(i % blobs)
      val r = new scala.util.Random(seed ^ (i.toLong * 0x9E3779B97F4A7C15L))
      (i.toLong, Array.tabulate(dim)(j =>
        (c(j) + sigma * r.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  /** Shared parameters for the clustered-shape floor measurements: the
    * sweep prints with these, SimilaritySpec pins floors with THE SAME
    * values, so the printed numbers and the gated floors never drift
    * apart. 500×64, 20 blobs of 25. σ is PER-COORDINATE, so the total
    * noise norm is σ√dim against a unit center: σ=0.05 → E‖noise‖² =
    * 64·0.0025 = 0.16 and within-blob cosine ≈ 1/(1+0.16) ≈ .86,
    * cross-blob ≈ 0 (random unit centers in 64-d are near-orthogonal)
    * — separated but not trivially so. (σ=0.35 would make noise DWARF
    * the centers — ‖noise‖ ≈ 2.8 — and reduce the corpus to isotropic
    * noise again, defeating the purpose of the second shape.) */
  val ClusteredN = 500
  val ClusteredDim = 64
  val ClusteredBlobs = 20
  val ClusteredSigma = 0.05
  val ClusteredSeed = 42L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nq = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val dim = 64
    val spark = TestSpark.spark
    import spark.implicits._

    val base = Similarity.withNorm(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding").cache()
    val n = base.count()
    val queryIds = col("vec_id") < nq
    val queries = base.filter(queryIds)
    val truth = Similarity.knnBrute(base, queries, "vec_id", k).cache()
    println(s"RECALL corpus=$n queries=$nq k=$k sf=$sfDir")

    def report(tag: String, ann: DataFrame): Unit =
      println(f"RECALL $tag recall=${recallAt(truth, ann, k)}%.3f")

    // IVF over id-sampled centroids (the e02 build shape) — single and
    // multi-probe, centroid count C as the candidate-cut tunable
    for (c <- Seq(10, 20, 40)) {
      val cents = base.filter(col("vec_id") % 50 === 0)
        .orderBy("vec_id").limit(c)
      val assigned = Similarity.assignToCentroids(base, cents, "vec_id")
      for (probes <- Seq(1, 2, 4))
        report(s"method=ivf_sampled C=$c probes=$probes",
          if (probes == 1) Similarity.knnIvf(assigned, queryIds, "vec_id", k)
          else Similarity.knnIvfMultiProbe(assigned, cents, queryIds,
            "vec_id", k, probes))
    }

    // IVF over k-means-TRAINED centroids (e08 -> e02 composition):
    // same probe grid, is training worth it vs sampling?
    for (c <- Seq(10, 20, 40)) {
      val model = Similarity.kmeansFit(base, "vec_id", k = c, iters = 5,
        dim = dim)
      val cents = model.centroids.zipWithIndex.map { case (v, i) =>
        (i, v.toSeq, model.norms(i)) }.toDF("vec_id", "v", "nrm")
      val assigned = model.assignment
      for (probes <- Seq(1, 2, 4))
        report(s"method=ivf_kmeans C=$c probes=$probes",
          if (probes == 1) Similarity.knnIvf(assigned, queryIds, "vec_id", k)
          else Similarity.knnIvfMultiProbe(assigned, cents, queryIds,
            "vec_id", k, probes))
    }

    // Sign-LSH: plane count trades bucket granularity against recall;
    // multi-probe adds every Hamming-1 bucket
    for (p <- Seq(4, 6, 8, 10)) {
      val bucketed = Similarity.assignLshBuckets(
        base, "vec_id", Similarity.hyperplaneWeights(p, dim))
      report(s"method=lsh planes=$p probe=single",
        Similarity.knnIvf(bucketed, queryIds, "vec_id", k))
      report(s"method=lsh planes=$p probe=hamming1",
        Similarity.knnLshMultiProbe(bucketed, queryIds, "vec_id", k, p))
    }

    // PQ ADC full scan: subspace count m × codebook size K — the
    // bytes-per-candidate lever (codes are m ints)
    for (m <- Seq(4, 8, 16); cw <- Seq(16, 64, 256)) {
      val cb = Similarity.pqTrainSampled(base, "vec_id", m = m,
        maxCodewords = cw)
      report(s"method=pq m=$m K=$cw",
        Similarity.knnPq(Similarity.pqEncode(base, "vec_id", cb),
          queries, "vec_id", cb, k))
    }

    // IVF-PQ composition at the e06 configuration
    {
      val cents = base.filter(col("vec_id") % 50 === 0)
        .orderBy("vec_id").limit(20)
      val assigned = Similarity.assignToCentroids(base, cents, "vec_id")
      val cb = Similarity.pqTrainSampled(
        base.filter(col("vec_id") % 50 === 0), "vec_id", m = 8,
        maxCodewords = 16)
      val encoded = Similarity.pqEncode(assigned, "vec_id", cb)
      report("method=ivfpq C=20 m=8 K=16",
        Similarity.knnIvfPq(encoded, encoded.filter(queryIds),
          "vec_id", cb, k))
    }

    // Two-stage refine: ADC shortlist -> exact re-rank. Recall@k is
    // exactly |true top-k surviving the shortlist|/k, so the shortlist
    // size is the whole tunable; K=16 is the shipped e07 codebook,
    // K=64 shows what a richer codebook buys the shortlist
    for (cw <- Seq(16, 64); sl <- Seq(25, 50, 100, 200)) {
      val cb = Similarity.pqTrainSampled(base, "vec_id", m = 8,
        maxCodewords = cw)
      report(s"method=refine K=$cw shortlist=$sl",
        Similarity.knnPqRefine(Similarity.pqEncode(base, "vec_id", cb),
          base, queries, "vec_id", cb, shortlist = sl, k = k))
    }

    // The SHIPPED e02–e07 configurations verbatim (VectorOps.scala:
    // K=5, NQ=10, IvfC=20, 6 planes, PQ m=8/K=16 trained on the %50
    // sample, shortlist 25) — these exact numbers back the
    // SimilaritySpec recall floors
    {
      val sk = 5
      val sq = col("vec_id") < 10
      val struth = Similarity.knnBrute(
        base, base.filter(sq), "vec_id", sk).cache()
      def reportShipped(tag: String, ann: DataFrame): Unit =
        println(f"RECALL $tag recall=${recallAt(struth, ann, sk)}%.3f")
      val cents = base.filter(col("vec_id") % 50 === 0)
        .orderBy("vec_id").limit(20)
      val assigned = Similarity.assignToCentroids(base, cents, "vec_id")
      reportShipped("method=shipped_e02_ivf",
        Similarity.knnIvf(assigned, sq, "vec_id", sk))
      val bucketed = Similarity.assignLshBuckets(
        base, "vec_id", Similarity.hyperplaneWeights(6, dim))
      reportShipped("method=shipped_e03_lsh",
        Similarity.knnIvf(bucketed, sq, "vec_id", sk))
      reportShipped("method=shipped_e04_multiprobe",
        Similarity.knnLshMultiProbe(bucketed, sq, "vec_id", sk, 6))
      val cb = Similarity.pqTrainSampled(
        base.filter(col("vec_id") % 50 === 0), "vec_id", m = 8,
        maxCodewords = 16)
      val encoded = Similarity.pqEncode(base, "vec_id", cb)
      reportShipped("method=shipped_e05_pq",
        Similarity.knnPq(encoded, base.filter(sq), "vec_id", cb, sk))
      val encodedAssigned = Similarity.pqEncode(assigned, "vec_id", cb)
      reportShipped("method=shipped_e06_ivfpq",
        Similarity.knnIvfPq(encodedAssigned,
          encodedAssigned.filter(sq), "vec_id", cb, sk))
      reportShipped("method=shipped_e07_refine",
        Similarity.knnPqRefine(encoded, base, base.filter(sq), "vec_id",
          cb, shortlist = 25, k = sk))
      val model = Similarity.kmeansFit(base, "vec_id", k = 8, iters = 2,
        dim = dim)
      reportShipped("method=shipped_e10_ivf_trained",
        Similarity.knnIvf(model.assignment, sq, "vec_id", sk))
      reportShipped("method=shipped_e11_ivf_multiprobe",
        Similarity.knnIvfMultiProbe(assigned, cents, sq, "vec_id", sk, 3))
    }

    // The same operator FAMILIES on the CLUSTERED corpus — the second
    // shape (r11 advice): on blobs, working blocking beats the scanned
    // fraction by a wide margin, so these are the numbers that would
    // actually collapse under a silent bucketing bug. Configs are
    // sized to this corpus, NOT the shipped sf-fixture configs
    // verbatim: the %50 id sample on 500 ids yields 10 centroids (the
    // limit(20) is non-binding → effectively C=10), and the trained
    // row uses k = blob count (20) with 5 iterations so training can
    // actually recover the generative structure. The exact parameters
    // are shared with SimilaritySpec's clustered floors.
    {
      val cbase = Similarity.withNorm(clusteredCorpus(spark,
        ClusteredN, ClusteredDim, ClusteredBlobs, ClusteredSigma,
        ClusteredSeed), "vec_id", "embedding").cache()
      val sk = 5
      val sq = col("vec_id") < 10
      val ctruth = Similarity.knnBrute(
        cbase, cbase.filter(sq), "vec_id", sk).cache()
      def reportClustered(tag: String, ann: DataFrame): Unit =
        println(f"RECALL $tag recall=${recallAt(ctruth, ann, sk)}%.3f")
      val cents = cbase.filter(col("vec_id") % 50 === 0)
        .orderBy("vec_id").limit(20)
      val assigned = Similarity.assignToCentroids(cbase, cents, "vec_id")
      reportClustered("method=clustered_e02_ivf",
        Similarity.knnIvf(assigned, sq, "vec_id", sk))
      val bucketed = Similarity.assignLshBuckets(
        cbase, "vec_id", Similarity.hyperplaneWeights(6, ClusteredDim))
      reportClustered("method=clustered_e03_lsh",
        Similarity.knnIvf(bucketed, sq, "vec_id", sk))
      reportClustered("method=clustered_e04_multiprobe",
        Similarity.knnLshMultiProbe(bucketed, sq, "vec_id", sk, 6))
      val cb = Similarity.pqTrainSampled(
        cbase.filter(col("vec_id") % 50 === 0), "vec_id", m = 8,
        maxCodewords = 16)
      val encoded = Similarity.pqEncode(cbase, "vec_id", cb)
      reportClustered("method=clustered_e05_pq",
        Similarity.knnPq(encoded, cbase.filter(sq), "vec_id", cb, sk))
      val encodedAssigned = Similarity.pqEncode(assigned, "vec_id", cb)
      reportClustered("method=clustered_e06_ivfpq",
        Similarity.knnIvfPq(encodedAssigned,
          encodedAssigned.filter(sq), "vec_id", cb, sk))
      reportClustered("method=clustered_e07_refine",
        Similarity.knnPqRefine(encoded, cbase, cbase.filter(sq),
          "vec_id", cb, shortlist = 25, k = sk))
      val model = Similarity.kmeansFit(cbase, "vec_id",
        k = ClusteredBlobs, iters = 5, dim = ClusteredDim)
      reportClustered("method=clustered_e10_ivf_trained",
        Similarity.knnIvf(model.assignment, sq, "vec_id", sk))
      reportClustered("method=clustered_e11_ivf_multiprobe",
        Similarity.knnIvfMultiProbe(assigned, cents, sq, "vec_id", sk, 3))
    }

    spark.stop()
  }
}
