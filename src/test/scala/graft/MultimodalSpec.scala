package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaHeader

/** Container-header layer: builders and parser against each other AND
  * against hand-written byte fixtures (so a matching bug in both
  * directions can't hide), plus garbage robustness. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("PNG round-trip and hand-built IHDR bytes") {
    val p = Multimodal.pngBytes(640, 480, colorType = 2, payload = Array[Byte](1, 2, 3))
    assert(Multimodal.parseHeader(p).contains(
      MediaHeader("png", 640, 480, 3, 0, 3L)))
    // hand-written: signature + IHDR with width 1, height 2, RGBA
    val hand = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // sig
      0, 0, 0, 13, 'I', 'H', 'D', 'R',             // len + type
      0, 0, 0, 1, 0, 0, 0, 2,                      // w=1 h=2 (BE)
      8, 6, 0, 0, 0,                               // depth 8, RGBA
      0, 0, 0, 0                                   // CRC
    ).map(_.toByte)
    assert(Multimodal.parseHeader(hand).contains(
      MediaHeader("png", 1, 2, 4, 0, 0L)))
  }

  test("WAV round-trip: LE fields land at canonical offsets") {
    val w = Multimodal.wavBytes(44100, channels = 2, bitsPerSample = 16,
      payload = new Array[Byte](10))
    val h = Multimodal.parseHeader(w)
    assert(h.contains(MediaHeader("wav", 0, 0, 2, 44100, 10L)))
    assert(w.length == 54)
  }

  test("MP4 ftyp brand extraction") {
    val m = Multimodal.mp4Bytes("isom", new Array[Byte](7))
    assert(Multimodal.parseHeader(m).contains(
      MediaHeader("isom", 0, 0, 0, 0, 7L)))
  }

  test("garbage, truncated, and null bytes parse to None, never throw") {
    assert(Multimodal.parseHeader(null).isEmpty)
    assert(Multimodal.parseHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseHeader("not a media file".getBytes).isEmpty)
    // valid PNG signature but truncated before IHDR completes
    val trunc = Multimodal.pngBytes(9, 9, 2, Array.empty[Byte]).take(20)
    assert(Multimodal.parseHeader(trunc).isEmpty)
    // truncated INSIDE the IHDR payload (26-32 bytes): must reject, not
    // return a negative payload_bytes
    assert(Multimodal.parseHeader(
      Multimodal.pngBytes(9, 9, 2, Array.empty[Byte]).take(30)).isEmpty)
    // ftyp declaring a box size beyond the buffer (mid-box truncation)
    val bigFtyp = Multimodal.mp4Bytes("isom", Array.empty[Byte])
    bigFtyp(3) = 100.toByte // declared size 100 > 12-byte buffer
    assert(Multimodal.parseHeader(bigFtyp).isEmpty)
    // RIFF/WAVE whose first chunk is not the canonical "fmt " (LIST-first
    // encoders): reject rather than read garbage offsets
    val listWav = Multimodal.wavBytes(44100, 1, 16, Array.empty[Byte])
    System.arraycopy("LIST".getBytes, 0, listWav, 12, 4)
    assert(Multimodal.parseHeader(listWav).isEmpty)
  }

  test("headeredMedia fields are the documented doc_id functions") {
    val docs = Seq((0L, "abc"), (1L, "de"), (2L, "f"), (7L, "xyz"))
      .toDF("doc_id", "text")
    val got = Multimodal.extractHeaders(Multimodal.headeredMedia(docs))
      .as[(Long, String, Int, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, "png", 16, 16, 3, 0, 3L)))
    assert(got(7L) == ((7L, "wav", 0, 0, 2, 16000, 3L))) // odd id → 16 kHz, 2ch
    assert(got(2L) == ((2L, "isom", 0, 0, 0, 0, 1L)))
    assert(got(1L) == ((1L, "wav", 0, 0, 2, 16000, 2L)))
  }
}
