package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads plus
  * typed metadata, processed in distributed batches.
  *
  * Image DIMENSIONS are parsed for real from the container headers
  * (PNG IHDR, JPEG SOF marker scan, GIF logical-screen descriptor) —
  * pure JVM byte inspection of the public formats, no codec library.
  * Payloads with no recognized signature fall back to a deterministic
  * STUB deriving pseudo-metadata from the raw bytes (full pixel decode
  * needs codecs this environment lacks). Everything around the decode —
  * the schema contract, the typed `mapPartitions` batch shape (the
  * Scala analogue of a Pandas-UDF `mapInPandas` pipeline), partition
  * sizing — is real and tested. Swap the fallback for a codec call and
  * the pipeline is production shaped: one narrow pass, no shuffle,
  * codegen-friendly downstream.
  */
object Multimodal {

  /** An opaque media payload with its routing metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted (stubbed) features. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      phash: String)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** (width, height) from the container header bytes alone — no codec:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
    *    width/height at offsets 16/20 (the IHDR chunk is required
    *    first by the spec);
    *  - JPEG: walk the marker segments from SOI to the first frame
    *    header (SOF0–SOF15 minus DHT/JPG/DAC), whose payload is
    *    [precision, height:be16, width:be16, ...];
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    *    little-endian width/height at offsets 6/8.
    *
    * None when no signature matches or the header is truncated. */
  def parseImageHeader(p: Array[Byte]): Option[(Int, Int)] = {
    val n = p.length
    if (n >= 24 &&
        p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
        p(4) == 0x0d && p(5) == 0x0a && p(6) == 0x1a && p(7) == 0x0a &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R') {
      Some((be32(p, 16), be32(p, 20)))
    } else if (n >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
      var i = 2
      var out: Option[(Int, Int)] = None
      var bad = false
      while (out.isEmpty && !bad && i + 3 < n) {
        if ((p(i) & 0xff) != 0xff) bad = true
        else {
          val m = p(i + 1) & 0xff
          if (m == 0xff) i += 1 // fill byte before a marker
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
          else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 < n) out = Some((be16(p, i + 7), be16(p, i + 5)))
            else bad = true
          } else {
            val segLen = be16(p, i + 2)
            if (segLen < 2) bad = true else i += 2 + segLen
          }
        }
      }
      out
    } else if (n >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
      Some((le16(p, 6), le16(p, 8)))
    } else None
  }

  /** Decoder: real header-parsed dimensions where the container format
    * is recognized; deterministic pseudo-metadata (pure functions of
    * the bytes) otherwise. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length
    val first = if (len > 0) r.payload(0) & 0xff else 0
    val (w, h) = parseImageHeader(r.payload)
      .getOrElse((64 + (len % 512), 64 + (first % 512)))
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = len,
      width = w,
      height = h,
      phash = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString)
  }

  /** Batch feature extraction: per-partition decode, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** One sampled frame of a media payload (decode stubbed). */
  final case class Frame(media_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame sampling: the one-to-many decode shape (video -> frames,
    * audio -> windows). The stub samples 1 + len%4 frames and
    * fingerprints each as md5(payload bytes ++ ":idx") — swap the body
    * for a codec call; the flatMap batch shape is the real contract. */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = 1 + (r.payload.length % 4)
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until n).map { i =>
        md.reset()
        md.update(r.payload)
        md.update(s":$i".getBytes("UTF-8"))
        Frame(r.media_id, i, md.digest().map("%02x".format(_)).mkString)
      }
    }
  }

  /** Resize: payload → payload transform with target dimensions — the
    * media-in/media-out pipeline stage (between decode and re-encode in
    * a real pipeline). The stub "re-encodes" deterministically as
    * md5(payload ++ "WxH") repeated to a length scaled by the target
    * area; a real codec drops in without touching the pipeline shape:
    * still one narrow typed pass, payload never shuffled. */
  def resizeStub(r: MediaRow, w: Int, h: Int): MediaRow = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(r.payload)
    md.update(s":${w}x$h".getBytes("UTF-8"))
    val digest = md.digest()
    val outLen = math.max(1, (r.payload.length * (w.toLong * h) /
      (512L * 512L)).toInt min r.payload.length)
    val out = Array.tabulate[Byte](outLen)(i => digest(i % digest.length))
    MediaRow(r.media_id, r.kind, out)
  }

  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(resizeStub(_, w, h)))
  }

  /** Lift any DataFrame with (id, kind, string payload) into the media
    * schema — the fixture stand-in for real binary columns. */
  def asMedia(df: DataFrame, idCol: String, kindCol: String, payloadCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(kindCol).as("kind"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
  }
}
