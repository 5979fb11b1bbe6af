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

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xffffffffL) << 32) | (be32(b, i + 4) & 0xffffffffL)

  /** (width, height) from the container header bytes alone — no codec:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
    *    width/height at offsets 16/20 (the IHDR chunk is required
    *    first by the spec);
    *  - JPEG: walk the marker segments from SOI to the first frame
    *    header (SOF0–SOF15 minus DHT/JPG/DAC), whose payload is
    *    [precision, height:be16, width:be16, ...];
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    *    little-endian width/height at offsets 6/8;
    *  - WebP: RIFF/"WEBP" chunk walk to the first VP8 /VP8L/VP8X
    *    image chunk (lossy sync-coded 14-bit dims, lossless
    *    bit-packed minus-one dims, extended 24-bit canvas).
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
    } else if (n >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P') {
      // WebP: RIFF container; dims live in the first image chunk —
      // "VP8 " (lossy: 14-bit dims after the 9D 01 2A sync), "VP8L"
      // (lossless: 14-bit minus-one dims bit-packed after 0x2F), or
      // "VP8X" (extended: 24-bit minus-one canvas dims). Same long-
      // stepping walk as the WAV chunks.
      var i = 12
      var out: Option[(Int, Int)] = None
      while (out.isEmpty && i + 8 <= n) {
        val size = le32(p, i + 4)
        val t = new String(p, i, 4, "ISO-8859-1")
        val pl = i + 8
        t match {
          case "VP8 " if pl + 10 <= n && (p(pl + 3) & 0xff) == 0x9d &&
              (p(pl + 4) & 0xff) == 0x01 && (p(pl + 5) & 0xff) == 0x2a =>
            out = Some((le16(p, pl + 6) & 0x3fff, le16(p, pl + 8) & 0x3fff))
          case "VP8L" if pl + 5 <= n && (p(pl) & 0xff) == 0x2f =>
            val b1 = p(pl + 1) & 0xff; val b2 = p(pl + 2) & 0xff
            val b3 = p(pl + 3) & 0xff; val b4 = p(pl + 4) & 0xff
            out = Some((1 + (b1 | ((b2 & 0x3f) << 8)),
              1 + ((b2 >> 6) | (b3 << 2) | ((b4 & 0x0f) << 10))))
          case "VP8X" if pl + 10 <= n =>
            out = Some((
              1 + ((p(pl + 4) & 0xff) | ((p(pl + 5) & 0xff) << 8) |
                ((p(pl + 6) & 0xff) << 16)),
              1 + ((p(pl + 7) & 0xff) | ((p(pl + 8) & 0xff) << 8) |
                ((p(pl + 9) & 0xff) << 16))))
          case _ => ()
        }
        val step = 8L + size + (size & 1L)
        if (i + step > n) i = n else i += step.toInt
      }
      out
    } else None
  }

  /** (sample_rate, duration_ms) from a WAV/RIFF header — a chunk walk
    * over the declared sizes only ("fmt " for rate/byte-rate, "data" for
    * the payload size), so a header-only prefix parses without the
    * audio bytes ever being read: exactly the metadata-pass access
    * pattern at 100 TB. Chunks are word-aligned per the RIFF spec.
    * None when the RIFF/WAVE signature or the fmt chunk is missing. */
  def parseWavHeader(p: Array[Byte]): Option[(Int, Long)] = {
    val n = p.length
    if (n < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
        p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    var i = 12
    var sampleRate = -1
    var byteRate = 0L
    var dataSize = 0L
    while (i + 8 <= n) {
      val size = le32(p, i + 4)
      if (p(i) == 'f' && p(i + 1) == 'm' && p(i + 2) == 't' && p(i + 3) == ' ' &&
          size >= 16 && i + 8 + 16 <= n) {
        sampleRate = le32(p, i + 12).toInt
        byteRate = le32(p, i + 16)
      } else if (p(i) == 'd' && p(i + 1) == 'a' && p(i + 2) == 't' && p(i + 3) == 'a') {
        dataSize = size
      }
      // long stepping: a multi-GB declared size must not overflow into a
      // negative index; a chunk past the payload end (header-only
      // prefix) stops the walk with its header already consumed
      val step = 8L + size + (size & 1L) // chunks pad to even offsets
      if (i + step > n) i = n else i += step.toInt
    }
    if (sampleRate < 0) None
    else Some((sampleRate,
      if (byteRate > 0) dataSize * 1000L / byteRate else 0L))
  }

  /** (sample_rate, duration_ms) from a FLAC header: "fLaC" magic, then
    * the metadata-block walk to STREAMINFO (type 0, required first by
    * the spec but walked defensively), whose packed bit fields carry
    * the 20-bit sample rate and 36-bit total sample count — an EXACT
    * duration from tens of bytes, no frame ever read. None when the
    * magic or a well-formed STREAMINFO is missing. */
  def parseFlacHeader(p: Array[Byte]): Option[(Int, Long)] = {
    val n = p.length
    if (n < 4 || p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C') return None
    var i = 4
    while (i + 4 <= n) {
      val hdr = p(i) & 0xff
      val len = ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      val pl = i + 4
      if ((hdr & 0x7f) == 0) { // STREAMINFO
        // the DECLARED block length must cover the fields read (spec
        // says 34; 18 reaches the sample count) — checking only the
        // array length would decode a truncated block's neighbor bytes
        if (len < 18 || pl + 18 > n) return None
        val sr = ((p(pl + 10) & 0xff) << 12) | ((p(pl + 11) & 0xff) << 4) |
          ((p(pl + 12) & 0xff) >> 4)
        val total = ((p(pl + 13) & 0x0fL) << 32) |
          ((p(pl + 14) & 0xffL) << 24) | ((p(pl + 15) & 0xffL) << 16) |
          ((p(pl + 16) & 0xffL) << 8) | (p(pl + 17) & 0xffL)
        return if (sr > 0) Some((sr, total * 1000L / sr)) else None
      }
      if ((hdr & 0x80) != 0) return None // last metadata block, no STREAMINFO
      // long stepping like the RIFF walks: a near-end block with a big
      // declared length must stop, not wrap to a negative index
      val next = pl.toLong + len
      if (next + 4 > n) return None else i = next.toInt
    }
    None
  }

  /** (width, height, duration_ms) from an MP4/ISO-BMFF header — a box
    * walk over the declared sizes: `moov`/`mvhd` for timescale+duration
    * (v0 and v1 layouts), the first `trak`/`tkhd` with nonzero
    * dimensions for the 16.16-fixed width/height (an audio-only track
    * reports 0×0). Media data (`mdat`) is never touched. None when the
    * moov/mvhd box is absent or truncated. */
  def parseMp4Header(p: Array[Byte]): Option[(Int, Int, Long)] = {
    val n = p.length
    // (timescale, duration, width, height) accumulated over the walk
    var timescale = 0L; var duration = -1L; var w = 0; var h = 0
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to && depth < 4) {
        val size = be32(p, i).toLong & 0xffffffffL
        val boxEnd = if (size == 0) to
          else if (size == 1 && i + 16 <= to) i + be64(p, i + 8)
          else i + size
        if (size == 1 && i + 16 > to) return
        if (boxEnd < i + 8 || boxEnd > to) return
        val end = boxEnd.toInt
        val t = new String(p, i + 4, 4, "ISO-8859-1")
        // an extended-size (size==1) box carries its 64-bit size before
        // the payload; field offsets below are relative to the payload
        val pl = if (size == 1) i + 16 else i + 8
        // field reads are bounded by THIS box's end, never the parent's:
        // a truncated mvhd/tkhd must reject, not read sibling bytes
        t match {
          case "moov" | "trak" => walk(pl, end, depth + 1)
          case "mvhd" if pl + 4 <= end =>
            val v = p(pl) & 0xff
            if (v == 1 && pl + 32 <= end) {
              timescale = be32(p, pl + 20).toLong & 0xffffffffL
              duration = be64(p, pl + 24)
            } else if (v == 0 && pl + 20 <= end) {
              timescale = be32(p, pl + 12).toLong & 0xffffffffL
              duration = be32(p, pl + 16).toLong & 0xffffffffL
            }
          case "tkhd" if pl + 4 <= end =>
            val v = p(pl) & 0xff
            val dimOff = if (v == 1) pl + 88 else pl + 76
            if (dimOff + 8 <= end && w == 0 && h == 0) {
              w = be32(p, dimOff) >>> 16
              h = be32(p, dimOff + 4) >>> 16
            }
          case _ => ()
        }
        i = end
      }
    }
    walk(0, n, 0)
    if (duration < 0) None
    else Some((w, h,
      if (timescale > 0) duration * 1000L / timescale else 0L))
  }

  /** Decoder: real header-parsed dimensions where the payload's KIND
    * declares a recognized container format; deterministic
    * pseudo-metadata (pure functions of the bytes) otherwise. The kind
    * gate keeps non-image payloads (document text, audio) off the
    * parser even if their bytes happen to start with a container magic
    * (plain ASCII can spell "GIF89a"). Kinds match case-insensitively —
    * metadata tables spell formats both ways, and "PNG" silently taking
    * the stub path would fabricate plausible-looking dimensions. */
  private val ImageKinds = Set("png", "jpeg", "jpg", "gif", "webp")

  /** Media kinds routed to [[parseWavHeader]]/[[parseFlacHeader]]/
    * [[parseMp4Header]]. */
  private val AudioKinds = Set("wav", "wave")
  private val FlacKinds = Set("flac")
  private val VideoKinds = Set("mp4", "m4a", "mov")

  private def normKind(kind: String): String =
    // Locale.ROOT: a Turkish-family default locale lowercases "GIF" to
    // "gıf" (dotless i) and the gate would silently miss
    if (kind == null) "" else kind.toLowerCase(java.util.Locale.ROOT)

  def decodeStub(r: MediaRow): MediaFeatures =
    decodeStub(r, java.security.MessageDigest.getInstance("MD5"))

  private def decodeStub(r: MediaRow,
      md: java.security.MessageDigest): MediaFeatures = {
    val len = r.payload.length
    val first = if (len > 0) r.payload(0) & 0xff else 0
    val parsed =
      if (ImageKinds(normKind(r.kind))) parseImageHeader(r.payload) else None
    val (w, h) = parsed
      .getOrElse((64 + (len % 512), 64 + (first % 512)))
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = len,
      width = w,
      height = h,
      phash = md.digest(r.payload).map("%02x".format(_)).mkString)
  }

  /** Batch feature extraction: per-partition decode, no shuffle (one
    * digest instance per partition, not per row). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(decodeStub(_, md))
    }
  }

  /** Audio/video container features: real header parsing for declared
    * WAV (sample rate + duration from the chunk sizes) and MP4 kinds
    * (track dims + mvhd duration from the box walk); the deterministic
    * byte-derived stub otherwise. Dimensions are 0 for audio, sample
    * rate 0 for video — a container carries one or the other. */
  final case class AvFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long,
      phash: String)

  def decodeAvStub(r: MediaRow): AvFeatures =
    decodeAvStub(r, java.security.MessageDigest.getInstance("MD5"))

  private def decodeAvStub(r: MediaRow,
      md: java.security.MessageDigest): AvFeatures = {
    val len = r.payload.length
    val first = if (len > 0) r.payload(0) & 0xff else 0
    val kind = normKind(r.kind)
    val parsed: Option[(Int, Int, Int, Long)] =
      if (AudioKinds(kind))
        parseWavHeader(r.payload).map { case (sr, ms) => (0, 0, sr, ms) }
      else if (FlacKinds(kind))
        parseFlacHeader(r.payload).map { case (sr, ms) => (0, 0, sr, ms) }
      else if (VideoKinds(kind))
        parseMp4Header(r.payload).map { case (w, h, ms) => (w, h, 0, ms) }
      else None
    val (w, h, sr, ms) = parsed.getOrElse(
      (64 + (len % 512), 64 + (first % 512), 8000 + (len % 32000), len.toLong))
    AvFeatures(r.media_id, r.kind, len, w, h, sr, ms,
      md.digest(r.payload).map("%02x".format(_)).mkString)
  }

  /** Batch AV feature extraction: per-partition decode, no shuffle (one
    * digest instance per partition, not per row). */
  def extractAvFeatures(media: Dataset[MediaRow]): Dataset[AvFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(decodeAvStub(_, md))
    }
  }

  /** One sampled frame of a media payload (decode stubbed). */
  final case class Frame(media_id: Long, frame_idx: Int, frame_hash: String)

  /** Cap on frames sampled per payload: sampling is a metadata pass, so
    * a 10-hour recording must not explode into 36k output rows. */
  val MaxSampledFrames = 32

  /** The duration-keyed sampling rule: one frame per started second,
    * clamped to [1, [[MaxSampledFrames]]] (the lower clamp keeps a
    * parseable zero-duration container represented by one frame). */
  def framesForDuration(durationMs: Long): Int =
    (((durationMs + 999L) / 1000L) max 1L min MaxSampledFrames.toLong).toInt

  /** Frames to sample for one payload. For declared WAV/FLAC/MP4 kinds
    * whose container header parses, the count is duration-derived via
    * [[framesForDuration]], so sampling density tracks real media
    * length. The deterministic byte stub (1 + len%4) applies only to
    * non-AV kinds and unparseable payloads, where no duration exists
    * to key off. */
  def frameCount(r: MediaRow): Int = {
    val kind = normKind(r.kind)
    val durMs: Option[Long] =
      if (AudioKinds(kind)) parseWavHeader(r.payload).map(_._2)
      else if (FlacKinds(kind)) parseFlacHeader(r.payload).map(_._2)
      else if (VideoKinds(kind)) parseMp4Header(r.payload).map(_._3)
      else None
    durMs match {
      case Some(ms) => framesForDuration(ms)
      case None => 1 + (r.payload.length % 4)
    }
  }

  /** Frame sampling: the one-to-many decode shape (video -> frames,
    * audio -> windows). Frame COUNT is real — keyed off the parsed
    * container duration via [[frameCount]]; only the frame CONTENT is
    * stubbed, fingerprinted as md5(payload bytes ++ ":idx") — swap
    * that for a codec call; the flatMap batch shape is the real
    * contract. */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val n = frameCount(r)
        (0 until n).map { i =>
          md.reset()
          md.update(r.payload)
          md.update(s":$i".getBytes("UTF-8"))
          Frame(r.media_id, i, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Resize: payload → payload transform with target dimensions — the
    * media-in/media-out pipeline stage (between decode and re-encode in
    * a real pipeline). The stub "re-encodes" deterministically as
    * md5(payload ++ "WxH") repeated to a length scaled by the target
    * area; a real codec drops in without touching the pipeline shape:
    * still one narrow typed pass, payload never shuffled. */
  def resizeStub(r: MediaRow, w: Int, h: Int): MediaRow =
    resizeStub(r, w, h, java.security.MessageDigest.getInstance("MD5"))

  private def resizeStub(r: MediaRow, w: Int, h: Int,
      md: java.security.MessageDigest): MediaRow = {
    md.reset()
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
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(resizeStub(_, w, h, md))
    }
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
