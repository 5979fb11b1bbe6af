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
    }),

    // Payload-in/payload-out resize stage; the payload itself is only
    // observed through its length and hex-digest (binary columns do not
    // round-trip a SQL oracle directly).
    "mm03_resize" -> ((s, d) => {
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "source", "text")
      Multimodal.resize(media, 128, 96).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("out_len"),
          md5(hex(col("payload"))).as("out_hash"))
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
             (octet_length(encode(text)) % 4))) AS i)""",
    // resizeStub: output bytes = md5(payload ++ ':128x96') cycled to
    // max(1, min(len*128*96/512^2, len)) bytes; observed as hex digest.
    "mm03_resize" ->
      """WITH m AS (SELECT doc_id AS media_id, source AS kind,
           octet_length(encode(text)) AS len, md5(text || ':128x96') AS dh
           FROM documents),
         r AS (SELECT media_id, kind,
           greatest(1, least((len * 12288) // 262144, len)) AS out_len, dh
           FROM m)
         SELECT media_id, kind, out_len::INTEGER AS out_len,
           md5(upper(substr(repeat(dh, ((out_len + 15) // 16)::INTEGER),
             1, (out_len * 2)::INTEGER))) AS out_hash
         FROM r"""
  )
}
