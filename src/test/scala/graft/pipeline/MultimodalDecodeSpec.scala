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

  test("mp4 demuxer recovers codec/dims and exact per-sample ranges from box tables") {
    // 7 frames of varying sizes in 2-sample chunks → 4 chunks (tail
    // chunk short, second stsc run), frames contiguous in mdat at 24
    val sizes = Array(10, 20, 30, 40, 50, 60, 70)
    val mp4 = Multimodal.mp4Bytes(sizes, i => (50 + i).toByte,
      samplesPerChunk = 2, w = 320, h = 180)
    val t = Multimodal.mp4Track(mp4).get
    assert(t.codec == "avc1" && t.width == 320 && t.height == 180)
    assert(t.sizes.toSeq == sizes.toSeq)
    assert(t.offsets.toSeq ==
      sizes.scanLeft(24L)(_ + _).toSeq.take(sizes.length))
    // byte-level: slice each declared range and check the constant fill
    sizes.indices.foreach { i =>
      val slice = mp4.slice(t.offsets(i).toInt, t.offsets(i).toInt + t.sizes(i))
      assert(slice.length == sizes(i) && slice.forall(_ == (50 + i).toByte))
    }
    // single-frame container (one chunk, one run)
    val one = Multimodal.mp4Track(
      Multimodal.mp4Bytes(Array(17), _ => 9.toByte)).get
    assert(one.sizes.toSeq == Seq(17) && one.offsets.toSeq == Seq(24L))
  }

  test("mp4 rejection edges: truncation, bad tables, out-of-bounds ranges") {
    val sizes = Array(10, 20, 30)
    val mp4 = Multimodal.mp4Bytes(sizes, _ => 1.toByte)
    assert(Multimodal.mp4Track(mp4).isDefined)
    // not an MP4 at all / empty / truncated before moov
    assert(Multimodal.mp4Track("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.mp4Track(Array.emptyByteArray).isEmpty)
    assert(Multimodal.mp4Track(mp4.take(30)).isEmpty)
    // truncated INSIDE moov: box size now points past the payload end
    assert(Multimodal.mp4Track(mp4.dropRight(5)).isEmpty)
    // corrupt an stco offset to point past the payload: the demuxer
    // must refuse rather than hand out a garbage slice. stco body ends
    // with the last chunk offset — find the box and smash its offset.
    val idx = {
      var i = -1; var k = 0
      while (i < 0 && k + 4 <= mp4.length) {
        if (mp4(k) == 's' && mp4(k + 1) == 't' && mp4(k + 2) == 'c' &&
          mp4(k + 3) == 'o') i = k
        k += 1
      }
      i
    }
    assert(idx > 0)
    val bad = mp4.clone()
    // first chunk offset is at stco fourcc + 4 (ver/flags) + 4 (count)
    val o = idx + 4 + 8
    bad(o) = 0x7F.toByte; bad(o + 1) = 0xFF.toByte
    assert(Multimodal.mp4Track(bad).isEmpty)
    // zero declared samples
    val zeroN = mp4.clone()
    val szIdx = {
      var i = -1; var k = 0
      while (i < 0 && k + 4 <= zeroN.length) {
        if (zeroN(k) == 's' && zeroN(k + 1) == 't' && zeroN(k + 2) == 's' &&
          zeroN(k + 3) == 'z') i = k
        k += 1
      }
      i
    }
    // sample_count is at stsz fourcc end + 4 (ver/flags) + 4 (uniform)
    (0 until 4).foreach(d => zeroN(szIdx + 12 + d) = 0.toByte)
    assert(Multimodal.mp4Track(zeroN).isEmpty)
  }

  test("wav demuxer recovers PCM geometry and data range from the chunk walk") {
    // odd LIST length → word-alignment pad; data_off must come from the
    // walk (52 + 5 + 1 = 58), not a constant
    val wav = Multimodal.wavBytes(10, 2, 16000, 16, listLen = 5,
      i => (40 + i).toByte)
    val w = Multimodal.wavPcm(wav).get
    assert(w.channels == 2 && w.sampleRate == 16000 && w.bits == 16)
    assert(w.blockAlign == 4 && w.nSamples == 10 && w.dataOff == 58)
    // byte-level: each sample frame is blockAlign bytes of its fill
    (0 until 10).foreach { i =>
      val o = (w.dataOff + i * w.blockAlign).toInt
      val slice = wav.slice(o, o + w.blockAlign)
      assert(slice.length == 4 && slice.forall(_ == (40 + i).toByte))
    }
    // even LIST length (no pad) and zero-length LIST both walk cleanly
    assert(Multimodal.wavPcm(Multimodal.wavBytes(3, 1, 8000, 8, 4,
      _ => 1.toByte)).get.dataOff == 56)
    assert(Multimodal.wavPcm(Multimodal.wavBytes(3, 1, 8000, 8, 0,
      _ => 1.toByte)).get.dataOff == 52)
  }

  test("wav rejection edges: truncation, size mismatch, non-PCM, bad geometry") {
    val wav = Multimodal.wavBytes(10, 2, 16000, 16, 5, _ => 7.toByte)
    assert(Multimodal.wavPcm(wav).isDefined)
    assert(Multimodal.wavPcm(Array.emptyByteArray).isEmpty)
    assert(Multimodal.wavPcm("plain text but long enough".getBytes("UTF-8")).isEmpty)
    // truncated / declared RIFF size disagreeing with actual length
    assert(Multimodal.wavPcm(wav.take(20)).isEmpty)
    assert(Multimodal.wavPcm(wav.dropRight(1)).isEmpty)
    // non-PCM format tag (audioFormat at fmt body offset 0 = byte 20)
    val nonPcm = wav.clone(); nonPcm(20) = 2.toByte
    assert(Multimodal.wavPcm(nonPcm).isEmpty)
    // blockAlign disagreeing with channels·bits/8 (byte 32) would make
    // every downstream range slice garbage — must refuse
    val badAlign = wav.clone(); badAlign(32) = 5.toByte
    assert(Multimodal.wavPcm(badAlign).isEmpty)
    // data length not a multiple of blockAlign (data size field at
    // 36 + 8 + 5 + 1 + 4 = 54; 40·16-bit stereo bytes → declare 39)
    val badLen = wav.clone(); badLen(54) = 39.toByte
    assert(Multimodal.wavPcm(badLen).isEmpty)
    // a chunk whose declared size runs past the payload end (LIST size
    // field at byte 40)
    val overrun = wav.clone(); overrun(40) = 0xFF.toByte; overrun(41) = 0xFF.toByte
    assert(Multimodal.wavPcm(overrun).isEmpty)
  }

  test("wav tolerates placeholder RIFF sizes but rejects over-claims and deep PCM") {
    val wav = Multimodal.wavBytes(10, 2, 16000, 16, 5, _ => 7.toByte)
    // streaming-writer placeholders: declared 0 and 0xFFFFFFFF both parse
    val zeroSize = wav.clone()
    (4 to 7).foreach(zeroSize(_) = 0.toByte)
    assert(Multimodal.wavPcm(zeroSize).exists(_.nSamples == 10))
    val onesSize = wav.clone()
    (4 to 7).foreach(onesSize(_) = 0xFF.toByte)
    assert(Multimodal.wavPcm(onesSize).exists(_.nSamples == 10))
    // an under-declared (unflushed-tail) size also parses…
    val under = wav.clone(); under(4) = (wav(4) - 4).toByte
    assert(Multimodal.wavPcm(under).isDefined)
    // …but any non-placeholder size claiming MORE bytes than carried is refused
    val over = wav.clone(); over(4) = (wav(4) + 1).toByte
    assert(Multimodal.wavPcm(over).isEmpty)
    // 24/32-bit PCM is structurally valid RIFF but pcmWindows can't decode
    // it — wavPcm must reject the depth rather than let it mis-read as u8
    assert(Multimodal.wavPcm(
      Multimodal.wavBytes(10, 1, 8000, 24, 0, _ => 1.toByte)).isEmpty)
    assert(Multimodal.wavPcm(
      Multimodal.wavBytes(10, 1, 8000, 32, 0, _ => 1.toByte)).isEmpty)
  }

  test("decodeWav drops unparseable rows; sampled slice matches the fill") {
    val rows = Seq(
      (1L, Multimodal.wavBytes(8, 1, 8000, 16, 3, i => (60 + i).toByte)),
      (2L, "not audio at all, really".getBytes("UTF-8")),
      (3L, Multimodal.wavBytes(4, 2, 44100, 8, 0, _ => 9.toByte)))
    val meta = Multimodal.decodeWav(rows.toDF("media_id", "payload"))
    val byId = meta.collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(6))).toMap
    assert(byId == Map(1L -> (1, 8L), 3L -> (2, 4L)))
    import org.apache.spark.sql.functions._
    // sample 5 of media 1: off = 56 + 5·2 = 66 (odd LIST pads 1), fill 65
    val slice = meta.where(col("media_id") === 1L)
      .select(expr("substring(payload, cast(data_off + 5 * block_align + 1 as int), " +
        "block_align)"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(slice.length == 2 && slice.forall(_ == 65.toByte))
  }

  test("pcmWindows decodes signed LE16 / offset-binary u8 amplitudes exactly") {
    // 16-bit mono, 8 frames, fill v = i+1 → amplitude 257·(i+1); then
    // frame 5's sample is patched to LE16(0x00, 0x80) = −32768, the
    // sign-extension case the doc-derived gate fills (< 128) never reach
    val w16 = Multimodal.wavBytes(8, 1, 8000, 16, 0, i => (i + 1).toByte)
    val p = Multimodal.wavPcm(w16).get
    val off5 = (p.dataOff + 5 * p.blockAlign).toInt
    w16(off5) = 0x00.toByte; w16(off5 + 1) = 0x80.toByte
    val rows = Multimodal.pcmWindows(Seq((1L, w16)).toDF("media_id", "payload"),
      grid = 2, maxWin = 4).collect().sortBy(_.getInt(1))
    assert(rows(0).getLong(2) == 0 && rows(0).getInt(3) == 4)
    assert(rows(0).getLong(4) == 257L * (1 + 2 + 3 + 4) &&
      rows(0).getInt(5) == 257 * 4)
    assert(rows(1).getLong(4) == 257L * (5 + 7 + 8) - 32768 &&
      rows(1).getInt(5) == 32768)
    // 8-bit stereo: channel-0 amplitude = v − 128 (offset binary)
    val w8 = Multimodal.wavBytes(4, 2, 8000, 8, 3, _ => 32.toByte)
    val r8 = Multimodal.pcmWindows(Seq((2L, w8)).toDF("media_id", "payload"),
      grid = 1, maxWin = 16).collect()(0)
    assert(r8.getInt(3) == 4 && r8.getLong(4) == -384 && r8.getInt(5) == 96)
  }

  test("routeMedia sniffs each container to its parser and drops garbage") {
    val rows = Seq(
      (1L, Multimodal.pngBytes(20, 30)),
      (2L, Multimodal.jpegBytes(40, 50)),
      (3L, Multimodal.gifBytes(60, 70)),
      (4L, Multimodal.videoBytes(5, 8, _ => 1.toByte)),
      (5L, Multimodal.mp4Bytes(Array(16, 20, 24), _ => 2.toByte, w = 320, h = 180)),
      (6L, Multimodal.wavBytes(12, 2, 22050, 16, 3, _ => 3.toByte)),
      (7L, "no container here, just prose".getBytes("UTF-8")),
      // a RIFF that is not WAVE must not route (nor crash the wav parser)
      (8L, "RIFF    AVI LIST".getBytes("ISO-8859-1")))
    val routed = Multimodal.routeMedia(rows.toDF("media_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getInt(5))).toMap
    assert(routed == Map(
      1L -> (("png", 20, 30, -1L, -1)),
      2L -> (("jpeg", 40, 50, -1L, -1)),
      3L -> (("gif", 60, 70, -1L, -1)),
      4L -> (("gftv", -1, -1, 5L, -1)),
      5L -> (("mp4", 320, 180, 3L, -1)),
      6L -> (("wav", -1, -1, 12L, 22050))))
  }

  test("decodeMp4 drops unparseable rows; sampled slice hashes match the fill") {
    val rows = Seq(
      (1L, Multimodal.mp4Bytes(Array(16, 20, 24, 28), i => (70 + i).toByte)),
      (2L, "not a video".getBytes("UTF-8")),
      (3L, Multimodal.mp4Bytes(Array(32), _ => 5.toByte)))
    val meta = Multimodal.decodeMp4(rows.toDF("media_id", "payload"))
    val byId = meta.collect().map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(byId == Map(1L -> 4, 3L -> 1))
    import org.apache.spark.sql.functions._
    // frame 2 of media 1: offset 24+16+20=60, len 24, fill 72
    val frame = meta.where(col("media_id") === 1L)
      .select(expr("substring(payload, cast(element_at(frame_offsets, 3) + 1 as int), " +
        "element_at(frame_sizes, 3))"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(frame.length == 24 && frame.forall(_ == 72.toByte))
  }
}
