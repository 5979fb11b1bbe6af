package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal pipeline coverage: documents.text stands in for a binary
  * media payload; the typed mapPartitions decode-stub pipeline runs for
  * real, and its pure-function-of-bytes outputs are SQL-checkable.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_media_features" -> ((s, d) => {
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "source", "text")
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("phash"))
    }),

    // One-to-many frame sampling through the typed flatMap pipeline.
    "mm02_frame_sample" -> ((s, d) => {
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "source", "text")
      Multimodal.sampleFrames(media).toDF()
        .select(col("media_id"), col("frame_idx"), col("frame_hash"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "mm01_media_features" ->
      """SELECT doc_id AS media_id, source AS kind,
         octet_length(encode(text))::INTEGER AS byte_len,
         (64 + (octet_length(encode(text)) % 512))::INTEGER AS width,
         (64 + (CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
                END % 512))::INTEGER AS height,
         md5(text) AS phash
         FROM documents""",
    "mm02_frame_sample" ->
      """SELECT doc_id AS media_id, i::INTEGER AS frame_idx,
         md5(text || ':' || i) AS frame_hash
         FROM documents,
           LATERAL (SELECT unnest(generate_series(0,
             (octet_length(encode(text)) % 4))) AS i)"""
  )
}
