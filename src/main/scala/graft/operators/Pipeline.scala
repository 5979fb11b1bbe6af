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

  /** Clean a document corpus: drop low-quality rows, keep one
    * representative per exact content hash (minimum id), annotate with
    * token count and predicted language. */
  def cleanCorpus(docs: DataFrame, textCol: String, idCol: String,
      thresholds: QualityThresholds = QualityThresholds(),
      langMarkers: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "a", "or"),
        "de" -> Seq("der", "die", "und"),
        "es" -> Seq("el", "la", "los"))): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs, textCol, Seq(idCol))
    val kept = docs.join(quality, idCol)
      .filter(col("n_tokens") >= thresholds.minTokens &&
        col("stopword_ratio") < thresholds.maxStopwordRatio)
    val deduped = Dedup.dropExactDuplicates(kept, textCol, idCol)
    TextAnalysis.languageId(deduped, textCol, Seq(idCol, "n_tokens"), langMarkers)
      .select(col(idCol), col("n_tokens"), col("pred_lang"))
  }
}
