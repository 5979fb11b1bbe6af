package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Composed training-data curation pipeline: quality gate -> exact
  * dedup -> annotation. Each stage is one of the verified operators;
  * the composition stays a single declarative plan (Catalyst sees
  * through all of it — the quality filter pushes into the scan, the
  * dedup is one hash shuffle, annotations are narrow).
  */
object Pipeline {

  final case class QualityThresholds(
      minTokens: Int = 20,
      maxStopwordRatio: Double = 0.5)

  /** Optional near-duplicate stage parameters: LSH banding (see
    * [[Dedup.lshCandidatePairs]]) + group-resolution iteration cap. */
  final case class NearDupConfig(
      k: Int = 6, bandWidth: Int = 2, shingleSize: Int = 3, maxIter: Int = 20)

  /** Clean a document corpus: drop low-quality rows, keep one
    * representative per exact content hash (minimum id), optionally
    * resolve LSH near-dup groups and keep only their representatives,
    * annotate with token count and predicted language.
    *
    * With a near-dup stage the plan pins one cache (see
    * [[cleanCorpusWithRelease]]); this overload discards the release
    * handle — convenient for one-shot runs, but long sessions running
    * many corpora should call the handle-returning variant. */
  def cleanCorpus(docs: DataFrame, textCol: String, idCol: String,
      thresholds: QualityThresholds = QualityThresholds(),
      langMarkers: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "a", "or"),
        "de" -> Seq("der", "die", "und"),
        "es" -> Seq("el", "la", "los")),
      nearDup: Option[NearDupConfig] = None): DataFrame =
    cleanCorpusWithRelease(docs, textCol, idCol, thresholds, langMarkers, nearDup)._1

  /** [[cleanCorpus]] plus an unpersist handle (the linkLoad
    * release-handle pattern): the near-dup stage persists the
    * quality+exact-dedup frame because it has two consumers — the
    * candidate pipeline (materialized eagerly inside nearDupGroups) and
    * the final anti-join. Invoke the handle after consuming the result
    * to free that executor storage; without a near-dup stage the handle
    * is a no-op. */
  def cleanCorpusWithRelease(docs: DataFrame, textCol: String, idCol: String,
      thresholds: QualityThresholds = QualityThresholds(),
      langMarkers: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "a", "or"),
        "de" -> Seq("der", "die", "und"),
        "es" -> Seq("el", "la", "los")),
      nearDup: Option[NearDupConfig] = None): (DataFrame, () => Unit) = {
    val quality = TextAnalysis.qualityScore(docs, textCol, Seq(idCol))
    val kept = docs.join(quality, idCol)
      .filter(col("n_tokens") >= thresholds.minTokens &&
        col("stopword_ratio") < thresholds.maxStopwordRatio)
    val exact = Dedup.dropExactDuplicates(kept, textCol, idCol)
    val (deduped, release) = nearDup match {
      case None => (exact, () => ())
      case Some(cfg) =>
        val exactC = exact.persist()
        val groups = Dedup.nearDupGroups(
          Dedup.lshCandidatePairs(exactC, textCol, idCol,
            cfg.k, cfg.bandWidth, cfg.shingleSize),
          maxIter = cfg.maxIter)
        // drop every doc whose component representative is another doc
        val out = exactC.join(groups.filter(col("doc_id") =!= col("group_id"))
          .select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
        (out, () => { exactC.unpersist(blocking = false); () })
    }
    val annotated = TextAnalysis
      .languageId(deduped, textCol, Seq(idCol, "n_tokens"), langMarkers)
      .select(col(idCol), col("n_tokens"), col("pred_lang"))
    (annotated, release)
  }

  /** The pretraining pipeline end-to-end: quality gate -> LSH near-dup
    * drop (a doc paired with a smaller id is dominated; one anti-join,
    * no iteration) -> deterministic train split -> per-source quota ->
    * sequence packing. This overload discards the unpersist handle —
    * one-shot runs only; long sessions should call
    * [[pretrainPipelineWithRelease]]. */
  def pretrainPipeline(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String): DataFrame =
    pretrainPipelineWithRelease(docs, textCol, idCol, sourceCol)._1

  /** [[pretrainPipeline]] plus an unpersist handle. The stages up to the
    * train split are ONE declarative plan (the quality filter pushes into
    * the scan, the LSH drop is one anti-join); that plan is persisted at
    * the split boundary because [[Sampling.quotaPerGroup]] deliberately
    * reads its input twice (rank branch + offsets branch) — without the
    * cache the expensive upstream (shingle explode, banding shuffles,
    * anti-join) would compute twice per run. Invoke the handle after
    * consuming the result to free the executor storage. */
  def pretrainPipelineWithRelease(docs: DataFrame, textCol: String,
      idCol: String, sourceCol: String,
      thresholds: QualityThresholds = QualityThresholds(),
      nearDup: NearDupConfig = NearDupConfig(),
      trainPct: Int = 80, quota: Int = 15,
      seqLen: Int = 512, bucketSize: Int = 64): (DataFrame, () => Unit) = {
    val quality = TextAnalysis.qualityScore(docs, textCol, Seq(idCol))
      .filter(col("n_tokens") >= thresholds.minTokens &&
        col("stopword_ratio") < thresholds.maxStopwordRatio)
      .select(idCol)
    val kept = docs.join(quality, idCol)
    val dominated = Dedup.lshCandidatePairs(kept, textCol, idCol,
        nearDup.k, nearDup.bandWidth, nearDup.shingleSize)
      .select(col("b_id").as(idCol)).distinct()
    val deduped = kept.join(dominated, Seq(idCol), "left_anti")
    val train = Sampling.sampleByHash(deduped, idCol, num = trainPct, den = 100)
      .persist()
    val balanced = Sampling.quotaPerGroup(train, idCol, sourceCol, cap = quota)
    val packed = Packing.packSequences(balanced, idCol, textCol, seqLen, bucketSize)
    (packed, () => { train.unpersist(blocking = false); () })
  }
}
