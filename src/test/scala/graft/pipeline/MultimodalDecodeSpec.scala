package graft.pipeline

import graft.SparkSpec

/** Pins the pure-JVM image-header decoder ([[Multimodal.imageDims]])
  * byte-for-byte: encode → decode round trips per container, plus the
  * rejection edges (truncated, garbage, marker-walk traps) that a
  * 100 TB ingest's validate-and-route stage lives on. The end-to-end
  * Spark path is oracle-gated as q_multimodal_decode.
  */
class MultimodalDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("png/jpeg/gif headers round-trip dimensions exactly") {
    for ((w, h) <- Seq((1, 1), (16, 480), (639, 463), (640, 480))) {
      assert(Multimodal.imageDims(Multimodal.pngBytes(w, h))
        .map(m => (m.fmt, m.width, m.height)) == Some(("png", w, h)))
      assert(Multimodal.imageDims(Multimodal.jpegBytes(w, h))
        .map(m => (m.fmt, m.width, m.height)) == Some(("jpeg", w, h)))
      assert(Multimodal.imageDims(Multimodal.gifBytes(w, h))
        .map(m => (m.fmt, m.width, m.height)) == Some(("gif", w, h)))
    }
  }

  test("unrecognized, truncated and malformed payloads decode to None") {
    assert(Multimodal.imageDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.imageDims("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageDims(Multimodal.pngBytes(64, 64).take(12)).isEmpty)
    assert(Multimodal.imageDims(Multimodal.gifBytes(64, 64).take(8)).isEmpty)
    // JPEG whose segment walk runs off the end before any SOF
    assert(Multimodal.imageDims(Array(0xFF, 0xD8, 0xFF, 0xFE).map(_.toByte)).isEmpty)
    // JPEG with a non-marker byte where a segment should start
    assert(Multimodal.imageDims(
      Array(0xFF, 0xD8, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00)
        .map(_.toByte)).isEmpty)
  }

  test("jpeg walk skips non-frame segments and ignores DHT/DAC/restart markers") {
    // SOI + APP0 + DHT (C4: huffman table, NOT a frame) + SOF2
    // (progressive) — the decoder must land on the SOF, not the DHT
    val out = java.nio.ByteBuffer.allocate(2 + 6 + 5 + 13)
    out.put(Array(0xFF, 0xD8).map(_.toByte))
    out.put(Array(0xFF, 0xE0).map(_.toByte)).putShort(4.toShort).putShort(0.toShort)
    out.put(Array(0xFF, 0xC4).map(_.toByte)).putShort(3.toShort).put(0.toByte)
    out.put(Array(0xFF, 0xC2).map(_.toByte)).putShort(11.toShort)
    out.put(8.toByte).putShort(77.toShort).putShort(99.toShort)
    out.put(1.toByte).put(Array(1, 0x11, 0).map(_.toByte))
    assert(Multimodal.imageDims(out.array())
      .map(m => (m.fmt, m.width, m.height)) == Some(("jpeg", 99, 77)))
  }

  test("decodeImageMeta drops unparseable rows and keeps ids aligned") {
    val rows = Seq(
      (1L, Multimodal.pngBytes(100, 50)),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, Multimodal.jpegBytes(320, 240)),
      (4L, Multimodal.gifBytes(8, 8)))
    val out = Multimodal.decodeImageMeta(rows.toDF("media_id", "payload"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(out == Map(
      1L -> ("png", 100, 50),
      3L -> ("jpeg", 320, 240),
      4L -> ("gif", 8, 8)))
  }

  test("video header round-trips count/size; malformed containers parse to None") {
    val v = Multimodal.videoBytes(12, 64, i => i.toByte)
    assert(v.length == Multimodal.VideoHeaderLen + 12 * 64)
    assert(Multimodal.videoMeta(v).map(m => (m.n_frames, m.frame_size)) ==
      Some((12, 64)))
    // single-frame and max-u16 frame-size edges
    assert(Multimodal.videoMeta(Multimodal.videoBytes(1, 1, _ => 7.toByte))
      .map(m => (m.n_frames, m.frame_size)) == Some((1, 1)))
    // rejection edges: wrong magic, truncated header, truncated tail
    // frame (declared length ≠ actual bytes — slicing it would read
    // garbage), zero frames
    assert(Multimodal.videoMeta("GXTV0000000000".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.videoMeta(v.take(Multimodal.VideoHeaderLen - 1)).isEmpty)
    assert(Multimodal.videoMeta(v.dropRight(1)).isEmpty)
    assert(Multimodal.videoMeta(
      Multimodal.videoBytes(0, 64, _ => 0.toByte)).isEmpty)
  }

  test("decodeVideoMeta drops unparseable rows; frame slices match the fill") {
    val rows = Seq(
      (1L, Multimodal.videoBytes(8, 16, i => (40 + i).toByte)),
      (2L, "not a video".getBytes("UTF-8")),
      (3L, Multimodal.videoBytes(4, 32, i => (60 + i).toByte)))
    val meta = Multimodal.decodeVideoMeta(rows.toDF("media_id", "payload"))
    val byId = meta.collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(byId == Map(1L -> ((8, 16)), 3L -> ((4, 32))))
    // slice frame 2 of media 1 via the same binary substring the gate
    // uses: 16 bytes, every one the fill value 42
    import org.apache.spark.sql.functions._
    val frame = meta.where(col("media_id") === 1L)
      .select(expr(s"substring(payload, ${Multimodal.VideoHeaderLen + 2 * 16 + 1}, 16)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(frame.length == 16 && frame.forall(_ == 42.toByte))
  }
}
