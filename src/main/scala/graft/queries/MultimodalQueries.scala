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
      320, 200),
    (9000004L, "webp",
      "52494646" + "16000000" + "57454250" + // RIFF size-22 WEBP
        "56503820" + "0A000000" + // "VP8 " lossy chunk, 10 bytes
        "000000" + "9D012A" + "4001" + "F000", // tag, sync, 320x240 le14
      320, 240))

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def md5Hex(hex: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(hexBytes(hex))
      .map("%02x".format(_)).mkString

  /** Unity transform matrix shared by the mvhd/tkhd fixtures (36 bytes). */
  private val UnityMatrix = "00010000" + "00000000" + "00000000" +
    "00000000" + "00010000" + "00000000" +
    "00000000" + "00000000" + "40000000"

  /** Well-formed audio/video container headers (hex): a 16 kHz mono
    * 16-bit WAV whose declared data chunk (64000 bytes, absent by
    * design) yields a 2000 ms duration, and an MP4 with ftyp + moov
    * holding an mvhd (timescale 600, duration 3000 → 5000 ms) and a
    * 1920×1080 trak/tkhd. The parsers read declared sizes only — media
    * bytes never exist in the fixture, which is the point.
    * Fields: (id, kind, hex, width, height, sampleRate, durationMs). */
  private val SynthAv = Seq(
    (9100001L, "wav",
      "52494646" + "24FA0000" + "57415645" + // RIFF size WAVE
        "666D7420" + "10000000" + // "fmt " len 16
        "0100" + "0100" + "803E0000" + "007D0000" + "0200" + "1000" + // PCM mono 16k
        "64617461" + "00FA0000", // "data" declared 64000 bytes, none present
      0, 0, 16000, 2000L),
    (9100002L, "mp4",
      "00000010" + "66747970" + "69736F6D" + "00000200" + // ftyp isom
        "000000D8" + "6D6F6F76" + // moov (216)
        "0000006C" + "6D766864" + "00000000" + // mvhd v0
        "00000000" + "00000000" + "00000258" + "00000BB8" + // ts 600, dur 3000
        "00010000" + "0100" + "0000" + "0000000000000000" + UnityMatrix +
        "000000000000000000000000000000000000000000000000" + "00000002" +
        "00000064" + "7472616B" + // trak (100)
        "0000005C" + "746B6864" + "00000001" + // tkhd v0 enabled
        "00000000" + "00000000" + "00000001" + "00000000" + "00000BB8" +
        "0000000000000000" + "0000" + "0000" + "0000" + "0000" + UnityMatrix +
        "07800000" + "04380000", // 1920.0 x 1080.0 (16.16 fixed)
      1920, 1080, 0, 5000L),
    (9100003L, "flac",
      "664C6143" + "80" + "000022" + // fLaC, last-block STREAMINFO (34)
        "1000" + "1000" + "000000" + "000000" + // block/frame size ranges
        "0AC442F0" + "0006BAA8" + // 44100 Hz, 2ch/16bit, 441000 samples
        "00000000000000000000000000000000", // md5 of the (absent) audio
      0, 0, 44100, 10000L))

  /** md5(payload ++ ":idx") — the frame-fingerprint rule of
    * [[Multimodal.sampleFrames]], precomputed for a constant fixture. */
  private def md5HexFrame(hex: String, i: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(hexBytes(hex))
    md.update(s":$i".getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Engine-independent oracle frame counts for the AV fixtures: the
    * documented clamp(ceil(ms/1000), 1, 32) rule applied BY HAND to
    * each fixture's known header duration (2000 / 5000 / 10000 ms), so
    * the oracle never calls the code under test. MultimodalSpec pins
    * the same literals against the engine's `framesForDuration`. */
  private val SynthFrameCounts =
    Map(9100001L -> 2, 9100002L -> 5, 9100003L -> 10)

  /** Constant oracle frame rows for the AV fixtures: the hand-derived
    * [[SynthFrameCounts]] with each hash precomputed from the same hex
    * the query feeds Spark. */
  private def synthFrameSql: String = SynthAv.flatMap {
    case (id, _, hex, _, _, _, _) =>
      (0 until SynthFrameCounts(id)).map { i =>
        s"""SELECT $id::BIGINT AS media_id, $i::INTEGER AS frame_idx,
           '${md5HexFrame(hex, i)}' AS frame_hash"""
      }
  }.mkString("\n         UNION ALL ")

  /** Constant oracle rows for the AV fixtures (mirrors [[synthSql]]). */
  private def synthAvSql: String = SynthAv.map {
    case (id, kind, hex, w, h, sr, ms) =>
      s"""SELECT $id::BIGINT AS media_id, '$kind' AS kind,
         ${hex.length / 2}::INTEGER AS byte_len, $w::INTEGER AS width,
         $h::INTEGER AS height, $sr::INTEGER AS sample_rate,
         $ms::BIGINT AS duration_ms, '${md5Hex(hex)}' AS phash"""
  }.mkString("\n         UNION ALL ")

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
    // The AV fixtures ride along so the duration-keyed count path
    // (parsed WAV/FLAC/MP4 headers -> ceil(ms/1000) frames) is
    // oracle-exercised, not just the byte-stub path documents take.
    "mm02_frame_sample" -> ((s, d) => {
      import s.implicits._
      val docs = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "source", "text")
      val synth = SynthAv.map { case (id, kind, hex, _, _, _, _) => (id, kind, hex) }
        .toDF("media_id", "kind", "hex")
        .select(col("media_id"), col("kind"), unhex(col("hex")).as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.sampleFrames(docs.union(synth)).toDF()
        .select(col("media_id"), col("frame_idx"), col("frame_hash"))
    }),

    // Audio/video container metadata through the same typed decode
    // pipeline: WAV chunk walk + MP4 box walk on the fixtures, the
    // byte-derived stub for document payloads (gated on kind, so text
    // never reaches a parser).
    "mm04_av_features" -> ((s, d) => {
      import s.implicits._
      val docs = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "source", "text")
      val synth = SynthAv.map { case (id, kind, hex, _, _, _, _) => (id, kind, hex) }
        .toDF("media_id", "kind", "hex")
        .select(col("media_id"), col("kind"), unhex(col("hex")).as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.extractAvFeatures(docs.union(synth)).toDF()
        .select(col("media_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("sample_rate"),
          col("duration_ms"), col("phash"))
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
    // the dimension parser is gated on KIND (case-insensitive
    // png/jpeg/jpg/gif/webp; wav/mp4 families for mm04), so documents
    // rows (kind = source) take the stub path as long as no source
    // value spells a format name — MultimodalSpec pins that the
    // fixture sources stay clear of the gated kind sets, so a text
    // payload that happened to spell a container magic still cannot
    // diverge from this oracle; the synthetic headers take the parsed
    // path with known constants.
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
    "mm04_av_features" ->
      s"""SELECT doc_id AS media_id, source AS kind,
         octet_length(encode(text))::INTEGER AS byte_len,
         (64 + (octet_length(encode(text)) % 512))::INTEGER AS width,
         (64 + (CASE WHEN octet_length(encode(text)) = 0 THEN 0
                ELSE ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT
                END % 512))::INTEGER AS height,
         (8000 + (octet_length(encode(text)) % 32000))::INTEGER AS sample_rate,
         octet_length(encode(text))::BIGINT AS duration_ms,
         md5(text) AS phash
         FROM documents
         UNION ALL $synthAvSql""",
    // documents (kind = source, never an AV kind) take the byte-stub
    // count 1 + len%4; the AV fixtures take the duration-keyed count
    // with every (idx, hash) a precomputed constant of the fixture.
    "mm02_frame_sample" ->
      s"""SELECT doc_id AS media_id, i::INTEGER AS frame_idx,
         md5(text || ':' || i) AS frame_hash
         FROM documents,
           LATERAL (SELECT unnest(generate_series(0,
             (octet_length(encode(text)) % 4))) AS i)
         UNION ALL $synthFrameSql""",
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
