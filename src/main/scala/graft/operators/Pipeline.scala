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
}
