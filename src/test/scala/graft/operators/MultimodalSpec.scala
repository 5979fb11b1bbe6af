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

  test("parseImageHeader rejects unknown and truncated payloads") {
    assert(Multimodal.parseImageHeader("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseImageHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseImageHeader(png.take(20)).isEmpty)
    assert(Multimodal.parseImageHeader(jpeg.take(10)).isEmpty)
    // JPEG garbage between segments must not loop or misparse
    assert(Multimodal.parseImageHeader(bytes("FFD8" + "00112233")).isEmpty)
  }

  test("decode pipeline: parsed dims for containers, stub dims for the rest") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "png", png),
      Multimodal.MediaRow(2L, "jpeg", jpeg),
      Multimodal.MediaRow(3L, "gif", gif),
      Multimodal.MediaRow(4L, "txt", "hello world".getBytes("UTF-8")))
    val out = Multimodal.extractFeatures(rows.toDS())
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(out(1L) == ((640, 480)))
    assert(out(2L) == ((320, 240)))
    assert(out(3L) == ((320, 200)))
    val len = "hello world".length
    assert(out(4L) == ((64 + len % 512, 64 + ("hello world".head.toInt % 512))))
  }
}
