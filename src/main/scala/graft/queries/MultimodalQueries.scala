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

  /** Well-formed container headers (hex) exercising the real
    * dimension parser: a 640x480 PNG IHDR, a 320x240 JPEG (APP0 then
    * SOF0), a 320x200 GIF89a logical screen descriptor. Pixel data is
    * absent by design — the header-only parser never reads past the
    * frame header, which is the point. */
  private val SynthMedia = Seq(
    (9000001L, "png",
      "89504E470D0A1A0A" + "0000000D" + "49484452" + // sig, IHDR len, "IHDR"
        "00000280" + "000001E0" + "0802000000" + "00000000", // 640x480 + CRC
      640, 480),
    (9000002L, "jpeg",
      "FFD8" + "FFE000104A46494600010100004800480000" + // SOI, APP0/JFIF
        "FFC0" + "0011" + "08" + "00F0" + "0140" + "03" + // SOF0: 240h 320w
        "012200" + "021101" + "031101" + "FFD9",
      320, 240),
    (9000003L, "gif",
      "474946383961" + "4001" + "C800" + "000000", // GIF89a 320x200
      320, 200))

  private def md5Hex(hex: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      .map("%02x".format(_)).mkString

  /** Oracle rows for the synthetic headers: every field is a known
    * constant of the fixture (dims from the format spec, digest
    * precomputed from the same hex), so the SQL stays engine-neutral —
    * DuckDB's md5 cannot digest BLOBs directly. */
  private def synthSql: String = SynthMedia.map { case (id, kind, hex, w, h) =>
    s"""SELECT $id::BIGINT AS media_id, '$kind' AS kind,
       ${hex.length / 2}::INTEGER AS byte_len, $w::INTEGER AS width,
       $h::INTEGER AS height, '${md5Hex(hex)}' AS phash"""
  }.mkString("\n         UNION ALL ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm01_media_features" -> ((s, d) => {
      import s.implicits._
      val docs = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "source", "text")
      val synth = SynthMedia.map { case (id, kind, hex, _, _) => (id, kind, hex) }
        .toDF("media_id", "kind", "hex")
        .select(col("media_id"), col("kind"), unhex(col("hex")).as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(docs.union(synth)).toDF()
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
    // documents.text payloads carry no container signature (UTF-8 text
    // cannot start with the PNG/JPEG magic; the GIF prefix is checked
    // absent from the fixtures), so they take the stub-dimension path;
    // the synthetic headers take the parsed path with known constants.
    "mm01_media_features" ->
      s"""SELECT doc_id AS media_id, source AS kind,
         octet_length(encode(text))::INTEGER AS byte_len,
         (64 + (octet_length(encode(text)) % 512))::INTEGER AS width,
         (64 + (CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
                END % 512))::INTEGER AS height,
         md5(text) AS phash
         FROM documents
         UNION ALL $synthSql""",
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
