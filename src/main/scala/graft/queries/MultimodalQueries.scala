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
    })
  )

  def oracleSql: Map[String, String] = Map(
    "mm01_media_features" ->
      """SELECT doc_id AS media_id, source AS kind,
         octet_length(encode(text))::INTEGER AS byte_len,
         (64 + (octet_length(encode(text)) % 512))::INTEGER AS width,
         (64 + (ascii(substr(text, 1, 1)) % 512))::INTEGER AS height,
         md5(text) AS phash
         FROM documents"""
  )
}
