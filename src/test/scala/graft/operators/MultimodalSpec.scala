package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Header-only dimension parsing and the typed decode pipeline. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val png = bytes("89504E470D0A1A0A" + "0000000D" + "49484452" +
    "00000280" + "000001E0" + "0802000000" + "00000000")
  private val jpeg = bytes("FFD8" + "FFE000104A46494600010100004800480000" +
    "FFC0" + "0011" + "08" + "00F0" + "0140" + "03" +
    "012200" + "021101" + "031101" + "FFD9")
  private val gif = bytes("474946383961" + "4001" + "C800" + "000000")

  test("parseImageHeader reads PNG IHDR dimensions") {
    assert(Multimodal.parseImageHeader(png).contains((640, 480)))
  }

  test("parseImageHeader walks JPEG segments to the SOF frame header") {
    assert(Multimodal.parseImageHeader(jpeg).contains((320, 240)))
    // a progressive frame (SOF2) parses the same way
    val sof2 = jpeg.clone(); sof2(21) = 0xc2.toByte
    assert(Multimodal.parseImageHeader(sof2).contains((320, 240)))
    // a DHT (0xC4) marker must be skipped as a plain segment, not
    // misread as a frame header
    val dht = bytes("FFD8" + "FFC4" + "0004" + "0000" + // 4-byte dummy DHT
      "FFC0" + "0011" + "08" + "0064" + "00C8" + "03" +
      "012200" + "021101" + "031101")
    assert(Multimodal.parseImageHeader(dht).contains((200, 100)))
  }

  test("parseImageHeader reads the GIF logical screen descriptor") {
    assert(Multimodal.parseImageHeader(gif).contains((320, 200)))
  }

  test("parseImageHeader reads WebP dims from VP8 / VP8L / VP8X chunks") {
    val lossy = bytes("52494646" + "16000000" + "57454250" +
      "56503820" + "0A000000" + "000000" + "9D012A" + "4001" + "F000")
    assert(Multimodal.parseImageHeader(lossy).contains((320, 240)))
    // lossless: 0x2F signature then bit-packed (w-1, h-1); 100x50
    val lossless = bytes("52494646" + "11000000" + "57454250" +
      "5650384C" + "05000000" + "2F" + "63" + "40" + "0C" + "00")
    assert(Multimodal.parseImageHeader(lossless).contains((100, 50)))
    // extended: 24-bit minus-one canvas dims; 1920x1080
    val extended = bytes("52494646" + "16000000" + "57454250" +
      "56503858" + "0A000000" + "00" + "000000" + "7F0700" + "370400")
    assert(Multimodal.parseImageHeader(extended).contains((1920, 1080)))
    // a WAV (RIFF but not WEBP) must not parse as an image
    assert(Multimodal.parseImageHeader(wav).isEmpty)
    assert(Multimodal.parseImageHeader(lossy.take(14)).isEmpty)
  }

  test("parseImageHeader rejects unknown and truncated payloads") {
    assert(Multimodal.parseImageHeader("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseImageHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseImageHeader(png.take(20)).isEmpty)
    assert(Multimodal.parseImageHeader(jpeg.take(10)).isEmpty)
    // JPEG garbage between segments must not loop or misparse
    assert(Multimodal.parseImageHeader(bytes("FFD8" + "00112233")).isEmpty)
  }

  private val wav = bytes("52494646" + "24FA0000" + "57415645" +
    "666D7420" + "10000000" +
    "0100" + "0100" + "803E0000" + "007D0000" + "0200" + "1000" +
    "64617461" + "00FA0000")
  private val unity = "00010000" + "00000000" + "00000000" +
    "00000000" + "00010000" + "00000000" +
    "00000000" + "00000000" + "40000000"
  private val mp4 = bytes("00000010" + "66747970" + "69736F6D" + "00000200" +
    "000000D8" + "6D6F6F76" +
    "0000006C" + "6D766864" + "00000000" +
    "00000000" + "00000000" + "00000258" + "00000BB8" +
    "00010000" + "0100" + "0000" + "0000000000000000" + unity +
    "000000000000000000000000000000000000000000000000" + "00000002" +
    "00000064" + "7472616B" +
    "0000005C" + "746B6864" + "00000001" +
    "00000000" + "00000000" + "00000001" + "00000000" + "00000BB8" +
    "0000000000000000" + "0000" + "0000" + "0000" + "0000" + unity +
    "07800000" + "04380000")

  test("parseWavHeader reads rate and duration from declared chunk sizes") {
    // 64000 data bytes at 32000 B/s = 2000 ms; no audio bytes present
    assert(Multimodal.parseWavHeader(wav).contains((16000, 2000L)))
    assert(Multimodal.parseWavHeader(wav.take(11)).isEmpty)
    assert(Multimodal.parseWavHeader("RIFFxxxxAVI ".getBytes("UTF-8")).isEmpty)
    // fmt chunk alone (no data) parses with zero duration
    assert(Multimodal.parseWavHeader(wav.take(36)).contains((16000, 0L)))
    // a multi-GB declared chunk size must neither overflow nor crash
    val huge = wav.clone()
    huge(40) = 0xff.toByte; huge(41) = 0xff.toByte
    huge(42) = 0xff.toByte; huge(43) = 0xff.toByte // data size = 0xFFFFFFFF
    assert(Multimodal.parseWavHeader(huge)
      .contains((16000, 0xffffffffL * 1000L / 32000L)))
  }

  private val flac = bytes("664C6143" + "80" + "000022" +
    "1000" + "1000" + "000000" + "000000" +
    "0AC442F0" + "0006BAA8" +
    "00000000000000000000000000000000")

  test("parseFlacHeader reads STREAMINFO rate and exact duration") {
    // 441000 samples at 44100 Hz = exactly 10000 ms
    assert(Multimodal.parseFlacHeader(flac).contains((44100, 10000L)))
    assert(Multimodal.parseFlacHeader(flac.take(20)).isEmpty)
    assert(Multimodal.parseFlacHeader("fLaX nope".getBytes("UTF-8")).isEmpty)
    // a non-STREAMINFO block first (walked over), then STREAMINFO
    val padded = bytes("664C6143" + "04" + "000002" + "BEEF") ++ flac.drop(4)
    assert(Multimodal.parseFlacHeader(padded).contains((44100, 10000L)))
    // a type-0 block whose DECLARED length is too short must reject,
    // not decode the following block's bytes as rate/sample count
    val shortBlock = bytes("664C6143" + "00" + "000002" + "BEEF") ++ flac.drop(4)
    assert(Multimodal.parseFlacHeader(shortBlock).isEmpty,
      "truncated STREAMINFO fabricated metadata")
  }

  test("parseMp4Header walks boxes to mvhd duration and tkhd dimensions") {
    assert(Multimodal.parseMp4Header(mp4).contains((1920, 1080, 5000L)))
    // no moov -> no metadata
    assert(Multimodal.parseMp4Header(mp4.take(16)).isEmpty)
    assert(Multimodal.parseMp4Header("plain text".getBytes("UTF-8")).isEmpty)
    // audio-only: ftyp + moov/mvhd without a trak reports 0x0 dims
    val audioOnly = mp4.take(16 + 8 + 108).clone()
    // shrink the moov declared size to cover only the mvhd child
    audioOnly(19) = (8 + 108).toByte
    assert(Multimodal.parseMp4Header(audioOnly).contains((0, 0, 5000L)))
    // a truncated mvhd (declared size 12: version/flags only) must
    // reject, not read the following bytes as timescale/duration
    val truncated = mp4.clone()
    truncated(24 + 3) = 12 // mvhd box size 108 -> 12
    assert(Multimodal.parseMp4Header(truncated).isEmpty,
      "truncated mvhd fabricated metadata")
  }

  test("parseMp4Header handles version-1 mvhd/tkhd layouts") {
    // v1 widens creation/modification/duration to 64 bits: mvhd payload
    // is 112 bytes (timescale at +20, duration be64 at +24), tkhd
    // payload 96 (dims at +88)
    val mvhd1 = "00000078" + "6D766864" + "01000000" + // size 120, v1
      "0000000000000000" + "0000000000000000" + // creation, modification
      "00000258" + "0000000000000BB8" + // timescale 600, duration 3000
      "00010000" + "0100" + "0000" + "0000000000000000" + unity +
      "000000000000000000000000000000000000000000000000" + "00000002"
    val tkhd1 = "00000068" + "746B6864" + "01000007" + // size 104, v1
      "0000000000000000" + "0000000000000000" + // creation, modification
      "00000001" + "00000000" + "0000000000000BB8" + // track, res, duration
      "0000000000000000" + "0000" + "0000" + "0000" + "0000" + unity +
      "05000000" + "02D00000" // 1280.0 x 720.0
    val moov1 = f"${8 + 120 + 8 + 104}%08X" + "6D6F6F76"
    val v1 = bytes("00000010" + "66747970" + "69736F6D" + "00000200" +
      moov1 + mvhd1 + "00000070" + "7472616B" + tkhd1)
    assert(Multimodal.parseMp4Header(v1).contains((1280, 720, 5000L)))
  }

  test("parsers never throw on arbitrary bytes (fuzz)") {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic run
    (1 to 10000).foreach { i =>
      val n = rnd.nextInt(96)
      val p = Array.fill[Byte](n)(rnd.nextInt(256).toByte)
      // seed plausible magics sometimes so the walkers get past the
      // signature check and chew on garbage chunk/box structure
      if (i % 4 == 0 && n >= 12) {
        val magic = Seq("RIFF????WAVE", "\u0089PNG\r\n\u001a\n....",
          "GIF89a......", "....ftyp....", "fLaC........",
          "RIFF????WEBP").apply(rnd.nextInt(6))
        magic.getBytes("ISO-8859-1").take(n).copyToArray(p)
      }
      Multimodal.parseImageHeader(p)
      Multimodal.parseWavHeader(p)
      Multimodal.parseFlacHeader(p)
      Multimodal.parseMp4Header(p)
    }
  }

  test("parsers stop cleanly at declared-size/payload off-by-one boundaries") {
    // WAV: a final data chunk declaring one byte less / one byte more
    // than the bytes actually present must step cleanly to the end in
    // both directions — no over-read, no loop, fmt metadata kept
    val wavPad = wav ++ Array.fill[Byte](4)(0) // 4 real data bytes
    def withDataSize(sz: Int): Array[Byte] = {
      val a = wavPad.clone()
      a(40) = sz.toByte; a(41) = 0; a(42) = 0; a(43) = 0
      a
    }
    assert(Multimodal.parseWavHeader(withDataSize(3)) // declared = remaining−1
      .contains((16000, 0L)))
    assert(Multimodal.parseWavHeader(withDataSize(5)) // declared = remaining+1
      .contains((16000, 0L)))
    // FLAC: a skip-block declaring one byte less than its real padding
    // lands the walk on the padding's last byte (0xBE: last-block bit
    // set, type != 0) — clean None, not a crash or misaligned decode
    val flacShort = bytes("664C6143" + "04" + "000002" + "BEEFBE") ++ flac.drop(4)
    assert(Multimodal.parseFlacHeader(flacShort).isEmpty)
    // STREAMINFO truncated at the last needed byte: 26 bytes reaches
    // the full sample count (parses), 25 must reject, never read past
    assert(Multimodal.parseFlacHeader(flac.take(26)).contains((44100, 10000L)))
    assert(Multimodal.parseFlacHeader(flac.take(25)).isEmpty)
    // MP4: moov declaring one byte more than the payload is rejected by
    // the bounds check; one byte less keeps what fits (mvhd duration)
    // and drops the child that no longer does (trak dims)
    val mp4Long = mp4.clone()
    mp4Long(19) = (0xD8 + 1).toByte // moov size 216 -> 217 = remaining+1
    assert(Multimodal.parseMp4Header(mp4Long).isEmpty)
    val mp4Short = mp4.clone()
    mp4Short(19) = (0xD8 - 1).toByte // moov size 215 = remaining−1
    assert(Multimodal.parseMp4Header(mp4Short).contains((0, 0, 5000L)))
  }

  test("frameCount keys off parsed container durations") {
    // wav 2000 ms -> 2, mp4 5000 ms -> 5, flac 10000 ms -> 10
    assert(Multimodal.frameCount(Multimodal.MediaRow(1L, "wav", wav)) == 2)
    assert(Multimodal.frameCount(Multimodal.MediaRow(2L, "mp4", mp4)) == 5)
    assert(Multimodal.frameCount(Multimodal.MediaRow(3L, "flac", flac)) == 10)
    // ceil, not floor: 2000 ms exactly is 2 frames; 2001 ms would be 3 —
    // shrink the data chunk by one byte: 63999 B / 32000 B/s = 1999.97 ms
    val wavOdd = wav.clone(); wavOdd(40) = 0xff.toByte; wavOdd(41) = 0xf9.toByte
    assert(Multimodal.frameCount(Multimodal.MediaRow(4L, "wav", wavOdd)) == 2)
    // cap: 40 s of audio (1_280_000 data bytes declared) -> 32, not 40
    val wavLong = wav.clone()
    wavLong(40) = 0x00.toByte; wavLong(41) = 0x88.toByte
    wavLong(42) = 0x13.toByte; wavLong(43) = 0x00.toByte
    assert(Multimodal.parseWavHeader(wavLong).contains((16000, 40000L)))
    assert(Multimodal.frameCount(Multimodal.MediaRow(5L, "wav", wavLong)) ==
      Multimodal.MaxSampledFrames)
    // zero-duration but parseable (fmt chunk only): lower clamp -> 1
    assert(Multimodal.frameCount(Multimodal.MediaRow(6L, "wav", wav.take(36))) == 1)
    // unparseable payload under an AV kind and any non-AV kind: byte stub
    val garbage = "not a riff".getBytes("UTF-8")
    assert(Multimodal.frameCount(Multimodal.MediaRow(7L, "wav", garbage)) ==
      1 + garbage.length % 4)
    assert(Multimodal.frameCount(Multimodal.MediaRow(8L, "txt", wav)) ==
      1 + wav.length % 4)
  }

  test("sampleFrames emits duration-derived counts through the pipeline") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "wav", wav),     // 2000 ms -> 2 frames
      Multimodal.MediaRow(2L, "flac", flac),   // 10000 ms -> 10 frames
      Multimodal.MediaRow(3L, "mp4", mp4),     // 5000 ms -> 5 frames
      Multimodal.MediaRow(4L, "txt", "hello".getBytes("UTF-8"))) // stub: 1+5%4
    val frames = Multimodal.sampleFrames(rows.toDS()).collect()
    val byId = frames.groupBy(_.media_id).map { case (k, v) => k -> v.length }
    assert(byId == Map(1L -> 2, 2L -> 10, 3L -> 5, 4L -> 2))
    // indices are dense from 0 and hashes distinct per frame
    val f2 = frames.filter(_.media_id == 2L)
    assert(f2.map(_.frame_idx).sorted.sameElements(0 until 10))
    assert(f2.map(_.frame_hash).distinct.length == 10)
  }

  test("fixture document sources never collide with gated media kinds") {
    // mm01/mm04 oracle safety: documents rows route by kind = source;
    // if a source value ever spelled a container format, Spark would
    // parse while the oracle stubs — catch the fixture drift here
    val gated = Set("png", "jpeg", "jpg", "gif", "webp",
      "wav", "wave", "flac", "mp4", "m4a", "mov")
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val sources = graft.sources.Tables.documents(spark, sf)
        .select("source").distinct().collect()
        .map(_.getString(0).toLowerCase(java.util.Locale.ROOT)).toSet
      assert(sources.intersect(gated).isEmpty,
        s"$sf documents.source collides with gated kinds: ${sources.intersect(gated)}")
    }
  }

  test("kind gates match case-insensitively") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "PNG", png),
      Multimodal.MediaRow(2L, "Gif", gif))
    val out = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(out(1L) == ((640, 480)), "'PNG' must parse like 'png'")
    assert(out(2L) == ((320, 200)), "'Gif' must parse like 'gif'")
    val av = Multimodal.extractAvFeatures(
      Seq(Multimodal.MediaRow(3L, "WAV", wav)).toDS()).collect().head
    assert(av.sample_rate == 16000 && av.duration_ms == 2000L)
  }

  test("decode pipeline: parsed dims for containers, stub dims for the rest") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "png", png),
      Multimodal.MediaRow(2L, "jpeg", jpeg),
      Multimodal.MediaRow(3L, "gif", gif),
      Multimodal.MediaRow(4L, "txt", "hello world".getBytes("UTF-8")),
      // container magic under a NON-image kind: the kind gate keeps the
      // parser off it (text starting with "GIF89a" must not grow dims)
      Multimodal.MediaRow(5L, "txt", gif))
    val out = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(out(1L) == ((640, 480)))
    assert(out(2L) == ((320, 240)))
    assert(out(3L) == ((320, 200)))
    val len = "hello world".length
    assert(out(4L) == ((64 + len % 512, 64 + ("hello world".head.toInt % 512))))
    assert(out(5L) == ((64 + gif.length % 512, 64 + ((gif(0) & 0xff) % 512))))
  }

  test("AV decode pipeline: parsed wav/mp4 metadata, stub for documents") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "wav", wav),
      Multimodal.MediaRow(2L, "mp4", mp4),
      Multimodal.MediaRow(3L, "web", "some document".getBytes("UTF-8")))
    val out = Multimodal.extractAvFeatures(rows.toDS())
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).sample_rate == 16000 && out(1L).duration_ms == 2000L &&
      out(1L).width == 0 && out(1L).height == 0)
    assert(out(2L).width == 1920 && out(2L).height == 1080 &&
      out(2L).duration_ms == 5000L && out(2L).sample_rate == 0)
    val len = "some document".length
    assert(out(3L).sample_rate == 8000 + len % 32000 &&
      out(3L).duration_ms == len.toLong)
  }
}
