package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads plus
  * typed metadata, processed in distributed batches.
  *
  * The decode step is a deterministic STUB (no image/audio codecs in
  * this environment): it derives pseudo-metadata from the raw bytes.
  * Everything around it — the schema contract, the typed
  * `mapPartitions` batch shape (the Scala analogue of a Pandas-UDF
  * `mapInPandas` pipeline), partition sizing — is real and tested.
  * Swap `decodeStub` for a codec call and the pipeline is production
  * shaped: one narrow pass, no shuffle, codegen-friendly downstream.
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

  /** Deterministic fake decoder: metadata as pure functions of bytes. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length
    val first = if (len > 0) r.payload(0) & 0xff else 0
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = len,
      width = 64 + (len % 512),
      height = 64 + (first % 512),
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
