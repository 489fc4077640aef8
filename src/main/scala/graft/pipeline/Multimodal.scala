package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads travelling next to typed metadata, with decode/feature
  * stages as pure column transforms.
  *
  * The container has no image/audio codecs, so the *decode* itself is a
  * clearly-marked deterministic stub ([[stubFeatures]] — a content-hash
  * projection standing in for "decode → embed"). Everything around it —
  * the schema, the binary column, batch-friendly per-row expressions
  * (codegen'd, no Python round trip), and the partitioning story — is the
  * real 100 TB design: payloads stay opaque bytes end-to-end, metadata is
  * columnar and prunable, feature extraction is a narrow map (no shuffle),
  * and nothing ever materializes payloads on the driver.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)
    )))
  ))

  /** Wrap any text-bearing table into media rows (payload = utf8 bytes of
    * `textCol`): the stand-in corpus for binary-column plumbing.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        (octet_length(col(textCol).cast("binary")) % 640).cast("int").as("width"),
        (octet_length(col(textCol).cast("binary")) % 480).cast("int").as("height")
      ).as("meta"))

  /** STUB decode/feature-extract: a real deployment would decode the
    * payload (image/audio lib) and emit an embedding; here the "features"
    * are a deterministic projection of the content digest, so the
    * plumbing (schema, batching, downstream joins) is fully testable.
    */
  def stubFeatures(payload: Column): Column = {
    val h = xxhash64(payload)
    array((0 until 4).map(i =>
      (shiftright(h, i * 16).bitwiseAND(0xFFFFL).cast("double") / 65535.0)): _*)
  }

  /** Decode + feature stage: media rows → (media_id, meta, features). */
  def extract(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("meta"),
      sha2(col("payload"), 256).as("content_sha"),
      stubFeatures(col("payload")).as("features"))

  /** Decoded-media record for the batch path. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Double])

  /** Batch decode via mapPartitions — the Scala twin of a Pandas
    * `mapInPandas` decode: one decoder instantiation per partition
    * (codec/model init is expensive), rows streamed through it as an
    * iterator so a partition never materializes in memory. The decode
    * itself is the same clearly-marked STUB (content-hash projection);
    * swap `decodeOne` for a real codec and the plumbing is unchanged.
    */
  def extractBatch(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "decoder" init happens here, once
        rows.map { case (id, payload) =>
          MediaFeatures(id, payload.length.toLong, decodeOne(payload))
        }
      }
      .toDF()
  }

  /** STUB single-payload decode (deterministic fake; see scaladoc). */
  private def decodeOne(payload: Array[Byte]): Array[Double] = {
    var h = 1125899906842597L
    payload.foreach(b => h = 31 * h + b)
    Array.tabulate(4)(i => ((h >>> (i * 16)) & 0xFFFFL).toDouble / 65535.0)
  }

  // ---------------------------------------------------------------------
  // REAL decode path: image dimensions from container headers. Unlike
  // stubFeatures above, nothing here is faked — these are the actual
  // byte layouts of PNG (IHDR chunk), JPEG (SOF frame header) and GIF
  // (logical screen descriptor), parsed pure-JVM with no codec deps.
  // Header sniffing is exactly what a 100 TB ingest runs FIRST on every
  // payload (validate + route + size-filter before any expensive full
  // decode), and it exercises the same mapPartitions plumbing a full
  // codec would plug into.
  // ---------------------------------------------------------------------

  /** Decoded image header: container format + pixel dimensions. */
  case class ImageMeta(media_id: Long, fmt: String, width: Int, height: Int)

  private def beU32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def beU16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Parse (format, width, height) from an image payload's header, or
    * None for unrecognized/truncated bytes.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk (always first):
    *    width/height are big-endian u32 at offsets 16/20.
    *  - JPEG: SOI marker, then a segment walk to the first SOFn frame
    *    header (C0–CF minus C4/C8/CC which are not frames): height and
    *    width are big-endian u16 at frame offsets 5/7.
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor:
    *    width/height little-endian u16 at offsets 6/8.
    */
  def imageDims(payload: Array[Byte]): Option[ImageMeta] = {
    val b = payload
    if (b.length >= 24 &&
        b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A)
      Some(ImageMeta(0L, "png", beU32(b, 16).toInt, beU32(b, 20).toInt))
    else if (b.length >= 4 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) {
      // segment walk: FF marker, u16 length (inclusive of itself)
      var o = 2
      while (o + 9 <= b.length) {
        if (b(o) != 0xFF.toByte) return None
        val marker = b(o + 1) & 0xFF
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
          return Some(ImageMeta(0L, "jpeg", beU16(b, o + 7), beU16(b, o + 5)))
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) o += 2
        else o += 2 + beU16(b, o + 2)
      }
      None
    } else if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(ImageMeta(0L, "gif", leU16(b, 6), leU16(b, 8)))
    else None
  }

  /** Header-decode stage: (media_id, payload) → (media_id, fmt, width,
    * height), dropping unparseable payloads. Same shape as
    * [[extractBatch]]: a narrow mapPartitions, payloads never leave the
    * executors, rows streamed as an iterator.
    */
  def decodeImageMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        imageDims(payload).map(_.copy(media_id = id))
      })
      .toDF()
  }

  // Fixture synthesis (test/verify corpora only): minimal VALID
  // container headers with the requested dimensions, so an oracle can
  // gate the decoder through a byte-level encode → decode round trip.
  // Pixel data is absent/empty — header sniffing never reads it.

  /** Minimal PNG: signature + IHDR carrying the dimensions. */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(Array(8, 2, 0, 0, 0).map(_.toByte)) // bit depth, RGB, defaults
    out.putInt(0) // CRC not validated by header sniffing
    out.array()
  }

  /** Minimal JPEG: SOI, a COM segment (exercises the walk), SOF0, EOI. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 6 + 13 + 2)
    out.put(Array(0xFF, 0xD8).map(_.toByte))
    out.put(Array(0xFF, 0xFE).map(_.toByte)).putShort(4.toShort).putShort(0.toShort)
    out.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(11.toShort)
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte).put(Array(1, 0x11, 0).map(_.toByte)) // 1 component
    out.put(Array(0xFF, 0xD9).map(_.toByte))
    out.array()
  }

  /** Minimal GIF89a: header + logical screen descriptor. */
  def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(Array(0, 0, 0).map(_.toByte))
    out.array()
  }

  // ---------------------------------------------------------------------
  // Video frame-sampling plumbing. The container is a deliberately
  // simple fixed-frame-size layout ("GFTV": 4-byte magic, BE u32 frame
  // count, BE u16 frame size, then count × size frame bytes) — the
  // POINT is the Spark-side shape, which is exactly a production
  // temporal sampler's: parse the header once per payload
  // (mapPartitions, payloads never leave the executors), then select
  // the sampled frame indices and slice each frame's BYTE RANGE with a
  // codegen'd binary substring — no full-container decode, no per-frame
  // decoder calls for frames the sample skips. Swap the header parse
  // for a real demuxer (keyframe index from an MP4 moov atom) and the
  // sampling/slicing plan is unchanged.
  // ---------------------------------------------------------------------

  /** Parsed video header: frame count + fixed frame byte size. */
  case class VideoMeta(media_id: Long, n_frames: Int, frame_size: Int)

  /** Header byte length of the GFTV fixture container. */
  val VideoHeaderLen = 10

  /** Synthesize a GFTV container: `fill(i)` supplies frame i's byte
    * value (each frame is a constant-fill block, so an oracle can
    * reconstruct any frame's bytes from arithmetic alone).
    */
  def videoBytes(nFrames: Int, frameSize: Int, fill: Int => Byte): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(VideoHeaderLen + nFrames * frameSize)
    out.put("GFTV".getBytes("US-ASCII"))
    out.putInt(nFrames).putShort(frameSize.toShort)
    (0 until nFrames).foreach { i =>
      val b = fill(i)
      var j = 0
      while (j < frameSize) { out.put(b); j += 1 }
    }
    out.array()
  }

  /** Parse (n_frames, frame_size) from a GFTV payload's header, or None
    * for unrecognized/truncated/inconsistent bytes (declared length must
    * match the actual payload size — a truncated tail frame must not
    * slice garbage).
    */
  def videoMeta(payload: Array[Byte]): Option[VideoMeta] = {
    val b = payload
    if (b.length >= VideoHeaderLen &&
        b(0) == 'G' && b(1) == 'F' && b(2) == 'T' && b(3) == 'V') {
      val n = beU32(b, 4).toInt
      val s = beU16(b, 8)
      if (n > 0 && s > 0 && b.length == VideoHeaderLen + n.toLong * s)
        Some(VideoMeta(0L, n, s))
      else None
    } else None
  }

  /** Header-parse stage: (media_id, payload) → (media_id, n_frames,
    * frame_size), dropping unparseable payloads — same narrow
    * mapPartitions shape as [[decodeImageMeta]]. The payload column
    * stays on the row for the downstream byte-range slicing.
    */
  def decodeVideoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        videoMeta(payload).map(m => (id, payload, m.n_frames, m.frame_size))
      })
      .toDF("media_id", "payload", "n_frames", "frame_size")
  }
}
