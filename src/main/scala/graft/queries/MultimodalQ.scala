package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.pipeline.Multimodal

/** Multimodal-column plumbing as an oracle-checkable query: documents →
  * binary payloads + typed metadata → content digest + stub features.
  * The digest/length/metadata path is SQL-expressible (the oracle
  * recomputes sha256 + byte length in DuckDB); the stubbed decode's
  * hash-projection features are checked structurally (bounds) here and
  * exactly in ScalaTest.
  */
object MultimodalQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.fromText(load(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.extract(media)
      feats.select(
          $"media_id", $"content_sha",
          $"meta.mime".as("mime"),
          $"meta.n_bytes".as("n_bytes"),
          $"meta.width".cast("long").as("width"),
          $"meta.height".cast("long").as("height"),
          // features are in [0,1] by construction; expose a structural
          // invariant the oracle can state without xxhash64
          size($"features").cast("long").as("n_features"),
          (element_at($"features", 1) >= 0.0 && element_at($"features", 1) <= 1.0 &&
            element_at($"features", 4) >= 0.0 && element_at($"features", 4) <= 1.0)
            .as("features_in_range"))
        .orderBy($"media_id")
    },

    // REAL decode, oracle-gated through a byte-level round trip: each
    // doc_id deterministically picks a container (png/jpeg/gif) and
    // dimensions, the payload is synthesized as a minimal VALID header
    // on the executors, and the production header decoder
    // (Multimodal.imageDims via the mapPartitions batch stage) must
    // recover the dimensions from the BYTES alone. The oracle recomputes
    // the generation arithmetic in DuckDB — dims reach the Spark output
    // only through the binary payload, so any parser regression breaks
    // the hash.
    "q_multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      val media = load(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val w = (16 + id % 624).toInt
          val h = (16 + id % 464).toInt
          val payload = (id % 3) match {
            case 0 => Multimodal.pngBytes(w, h)
            case 1 => Multimodal.jpegBytes(w, h)
            case _ => Multimodal.gifBytes(w, h)
          }
          (id, payload)
        }.toDF("media_id", "payload")
      Multimodal.decodeImageMeta(media)
        .select($"media_id", $"fmt",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"))
        .orderBy($"media_id")
    },

    // Temporal frame sampling over video payloads, gated byte-for-byte:
    // each doc synthesizes a GFTV container (8..32 frames of 64..80
    // bytes, every frame a distinct constant fill derived from
    // (doc_id, frame)), the header parse recovers count/size FROM THE
    // BYTES, and a uniform-4 temporal sample (idx_j = ⌊j·F/4⌋ — the
    // standard video-classification sampling grid) slices each sampled
    // frame's byte range with a codegen'd binary substring and hashes
    // it. The oracle reconstructs every frame's bytes from arithmetic
    // (constant fill in the single-byte chr range) and recomputes the
    // sha — offsets, lengths, AND content all round-trip through the
    // container bytes, so a parser or slicing regression breaks the
    // hash. Scale: header parse is one narrow mapPartitions pass,
    // sampling explodes exactly 4 rows per payload (never F), and the
    // slice reads only sampled ranges — the frames the sample skips are
    // never touched, which is the entire point of sampling a 100-TB
    // video corpus.
    "q_multimodal_frames" -> { (s, dir) =>
      import s.implicits._
      val media = load(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val f = (8 + id % 25).toInt
          val sz = (64 + id % 17).toInt
          val payload = Multimodal.videoBytes(f, sz,
            i => ((id * 31 + i * 7) % 96 + 32).toByte)
          (id, payload)
        }.toDF("media_id", "payload")
      Multimodal.decodeVideoMeta(media)
        .withColumn("j", explode(sequence(lit(0), lit(3))))
        .withColumn("frame_idx", expr("j * n_frames div 4"))
        .withColumn("frame_off",
          lit(Multimodal.VideoHeaderLen.toLong) + $"frame_idx" * $"frame_size")
        .select($"media_id", $"j".cast("long").as("j"),
          $"frame_idx", $"frame_off",
          $"frame_size".cast("long").as("frame_len"),
          sha2(expr("substring(payload, cast(frame_off + 1 as int), frame_size)"),
            256).as("frame_sha"))
        .orderBy($"media_id", $"j")
    },

    // The MP4 twin of q_multimodal_frames (VERDICT r12 #5): frame
    // offsets come from a REAL container index — each doc synthesizes a
    // minimal valid MP4 (ftyp + mdat + moov/trak/mdia/minf/stbl with
    // consistent stsd/stsz/stsc/stco), with VARIABLE frame sizes
    // (base + (k%7)·4) and 2-sample chunks (odd frame counts leave a
    // short tail chunk, exercising the stsc run walk). The demuxer must
    // recover codec, dimensions, and every sampled frame's absolute
    // byte range from the BOX TABLES alone; the uniform-4 grid then
    // slices and hashes only the sampled ranges. The oracle reconstructs
    // offsets arithmetically (frames are contiguous in mdat, so
    // offset(i) = 24 + i·base + 4·Σ(k%7)) and recomputes the fill sha —
    // any stsz/stsc/stco parse or slicing regression breaks the hash.
    "q_multimodal_mp4" -> { (s, dir) =>
      import s.implicits._
      val media = load(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val f = (6 + id % 23).toInt
          val base = (64 + id % 9).toInt
          val sizes = Array.tabulate(f)(k => base + (k % 7) * 4)
          val payload = Multimodal.mp4Bytes(sizes,
            i => ((id * 37 + i * 11) % 96 + 32).toByte,
            samplesPerChunk = 2,
            w = (320 + (id % 5) * 64).toInt, h = (180 + (id % 5) * 36).toInt)
          (id, payload)
        }.toDF("media_id", "payload")
      Multimodal.decodeMp4(media)
        .withColumn("j", explode(sequence(lit(0), lit(3))))
        .withColumn("frame_idx", expr("j * n_frames div 4"))
        .withColumn("frame_off",
          element_at($"frame_offsets", ($"frame_idx" + 1).cast("int")))
        .withColumn("frame_len",
          element_at($"frame_sizes", ($"frame_idx" + 1).cast("int")))
        .select($"media_id", $"codec",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"j".cast("long").as("j"), $"frame_idx", $"frame_off",
          $"frame_len".cast("long").as("frame_len"),
          sha2(expr("substring(payload, cast(frame_off + 1 as int), frame_len)"),
            256).as("frame_sha"))
        .orderBy($"media_id", $"j")
    },

    // The AUDIO twin (RIFF/WAVE PCM): each doc synthesizes a minimal
    // valid WAV — doc_id-derived channel count / sample rate / bit
    // depth, a LIST filler chunk whose frequently-odd length exercises
    // RIFF's word-alignment pad (so data_off VARIES and must come from
    // the chunk walk, not a constant), and constant-fill sample frames.
    // The demuxer must recover the PCM geometry and the data region
    // from the CHUNK TABLES alone; a uniform-4 window sample then
    // slices one block-aligned frame per grid point (sample_off =
    // data_off + idx·block_align) and hashes it. The oracle recomputes
    // geometry, offsets, and fill bytes arithmetically — any fmt/data
    // parse, alignment, or slicing regression breaks the hash. Scale:
    // demux is one narrow mapPartitions pass over O(1) metadata per
    // payload, and only sampled ranges are ever sliced.
    "q_multimodal_wav" -> { (s, dir) =>
      import s.implicits._
      val media = load(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val ch = (1 + id % 2).toInt
          val rate = (8000 + (id % 5) * 4000).toInt
          val bits = if (id % 3 == 0) 8 else 16
          val n = (100 + id % 57).toInt
          val listLen = (5 + id % 7).toInt
          val payload = Multimodal.wavBytes(n, ch, rate, bits, listLen,
            i => ((id * 41 + i * 13) % 96 + 32).toByte)
          (id, payload)
        }.toDF("media_id", "payload")
      Multimodal.decodeWav(media)
        .withColumn("j", explode(sequence(lit(0), lit(3))))
        .withColumn("sample_idx", expr("j * n_samples div 4"))
        .withColumn("sample_off", $"data_off" + $"sample_idx" * $"block_align")
        .select($"media_id",
          $"channels".cast("long").as("channels"),
          $"sample_rate".cast("long").as("sample_rate"),
          $"bits".cast("long").as("bits"),
          $"j".cast("long").as("j"), $"sample_idx", $"sample_off",
          $"block_align".cast("long").as("sample_len"),
          sha2(expr("substring(payload, cast(sample_off + 1 as int), block_align)"),
            256).as("sample_sha"))
        .orderBy($"media_id", $"j")
    },

    // Audio FEATURE EXTRACTION, not just demuxing: uniform-4 windows of
    // ≤16 sample frames, channel-0 amplitude decoded from the container
    // bytes (signed LE16 / offset-binary u8 — the real PCM decode, pure
    // integer arithmetic, no codec deps) into per-window sum and peak
    // |amplitude| — the primitives every energy/VAD/loudness filter is
    // built from. Geometry (1–3 channels, 8/16 bit, 40–129 frames so
    // tail windows go short) and fill bytes are doc-derived; the oracle
    // recomputes the amplitudes arithmetically (a constant-fill 16-bit
    // frame v,v decodes to 257·v; an 8-bit frame to v−128), so a demux,
    // addressing, sign-extension, or windowing regression breaks the
    // values. Only sampled windows' bytes are read — 4·16·block_align
    // per payload regardless of duration.
    "q_audio_windows" -> { (s, dir) =>
      import s.implicits._
      val media = load(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val ch = (1 + id % 3).toInt
          val rate = (8000 + (id % 3) * 8000).toInt
          val bits = if (id % 2 == 0) 16 else 8
          val n = (40 + id % 90).toInt
          val payload = Multimodal.wavBytes(n, ch, rate, bits, (id % 9).toInt,
            i => ((id * 53 + i * 17) % 96 + 32).toByte)
          (id, payload)
        }.toDF("media_id", "payload")
      Multimodal.pcmWindows(media)
        .select($"media_id", $"j".cast("long").as("j"), $"win_start",
          $"win_len".cast("long").as("win_len"),
          $"sum_amp", $"peak_abs".cast("long").as("peak_abs"))
        .orderBy($"media_id", $"j")
    },

    // Validate-and-route over a MIXED corpus — the stage every decoder
    // above sits behind in production: doc_id picks one of six
    // containers (png/jpeg/gif stills, GFTV/MP4 video, WAV audio) with
    // doc-derived parameters, and the router must sniff each payload's
    // magic bytes, dispatch to the right parser, and surface the
    // type-appropriate metadata (dims / frame counts / sample geometry,
    // -1 where the kind has none) from the BYTES alone. The oracle
    // recomputes kind and every metadata field from the generation
    // arithmetic — a sniff or dispatch regression (e.g. a WAV routed to
    // the MP4 parser) drops or mangles rows and breaks the compare.
    "q_multimodal_route" -> { (s, dir) =>
      import s.implicits._
      val media = load(s, dir, "documents").select($"doc_id").as[Long]
        .map { id =>
          val payload = (id % 6) match {
            case 0 => Multimodal.pngBytes((16 + id % 624).toInt, (16 + id % 464).toInt)
            case 1 => Multimodal.jpegBytes((16 + id % 624).toInt, (16 + id % 464).toInt)
            case 2 => Multimodal.gifBytes((16 + id % 624).toInt, (16 + id % 464).toInt)
            case 3 => Multimodal.videoBytes((8 + id % 25).toInt, (64 + id % 17).toInt,
              i => ((id * 31 + i * 7) % 96 + 32).toByte)
            case 4 => Multimodal.mp4Bytes(
              Array.tabulate((6 + id % 23).toInt)(k => (64 + id % 9).toInt + (k % 7) * 4),
              i => ((id * 37 + i * 11) % 96 + 32).toByte, samplesPerChunk = 2,
              w = (320 + (id % 5) * 64).toInt, h = (180 + (id % 5) * 36).toInt)
            case _ => Multimodal.wavBytes((100 + id % 57).toInt, (1 + id % 2).toInt,
              (8000 + (id % 5) * 4000).toInt, if (id % 3 == 0) 8 else 16,
              (5 + id % 7).toInt, i => ((id * 41 + i * 13) % 96 + 32).toByte)
          }
          (id, payload)
        }.toDF("media_id", "payload")
      Multimodal.routeMedia(media)
        .select($"media_id", $"kind",
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"n_frames", $"sample_rate".cast("long").as("sample_rate"))
        .orderBy($"media_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  sha256(text) AS content_sha,
        |  'application/octet-stream' AS mime,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS BIGINT) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 480 AS BIGINT) AS height,
        |  CAST(4 AS BIGINT) AS n_features,
        |  TRUE AS features_in_range
        |FROM documents ORDER BY media_id""".stripMargin,

    "q_multimodal_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
        |    WHEN 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
        |  CAST(16 + doc_id % 624 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 464 AS BIGINT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,

    // Reconstructs the generation arithmetic (frame count/size/fill are
    // doc_id-derived; fills stay in the single-byte chr range) and
    // recomputes offsets + frame sha — the Spark side must recover all
    // of it from the container BYTES alone.
    "q_multimodal_frames" ->
      """WITH g AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(8 + doc_id % 25 AS BIGINT) AS f,
        |    CAST(64 + doc_id % 17 AS BIGINT) AS s
        |  FROM documents
        |), sampled AS (
        |  SELECT media_id, f, s, j, (j * f) // 4 AS frame_idx
        |  FROM g, (SELECT unnest(generate_series(0, 3)) AS j)
        |)
        |SELECT media_id, CAST(j AS BIGINT) AS j, frame_idx,
        |  10 + frame_idx * s AS frame_off, s AS frame_len,
        |  sha256(repeat(chr(CAST((media_id * 31 + frame_idx * 7) % 96 + 32
        |    AS INT)), CAST(s AS INT))) AS frame_sha
        |FROM sampled ORDER BY media_id, j""".stripMargin,

    // Frames are laid out contiguously in mdat starting at byte 24
    // (16-byte ftyp + 8-byte mdat header), so with size(k) =
    // base + (k%7)·4 the offset prefix sum has the closed form
    // i·base + 4·(21·⌊i/7⌋ + r(r−1)/2), r = i%7. The Spark side must
    // recover the same numbers from the stsz/stsc/stco box tables.
    "q_multimodal_mp4" ->
      """WITH g AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(6 + doc_id % 23 AS BIGINT) AS f,
        |    CAST(64 + doc_id % 9 AS BIGINT) AS base,
        |    CAST(320 + (doc_id % 5) * 64 AS BIGINT) AS width,
        |    CAST(180 + (doc_id % 5) * 36 AS BIGINT) AS height
        |  FROM documents
        |), sampled AS (
        |  SELECT media_id, f, base, width, height, j, (j * f) // 4 AS frame_idx
        |  FROM g, (SELECT unnest(generate_series(0, 3)) AS j)
        |)
        |SELECT media_id, 'avc1' AS codec, width, height,
        |  CAST(j AS BIGINT) AS j, frame_idx,
        |  24 + frame_idx * base
        |    + 4 * (21 * (frame_idx // 7)
        |           + ((frame_idx % 7) * ((frame_idx % 7) - 1)) // 2) AS frame_off,
        |  base + (frame_idx % 7) * 4 AS frame_len,
        |  sha256(repeat(chr(CAST((media_id * 37 + frame_idx * 11) % 96 + 32 AS INT)),
        |    CAST(base + (frame_idx % 7) * 4 AS INT))) AS frame_sha
        |FROM sampled ORDER BY media_id, j""".stripMargin,

    // WAV layout is fully arithmetic: 12-byte RIFF header + 24-byte fmt
    // chunk + (8 + L + L%2)-byte LIST chunk + 8-byte data header puts
    // the sample region at 52 + L + L%2; frame i starts block_align·i
    // bytes in, block_align = channels · bits/8. The Spark side must
    // recover the same numbers from the RIFF chunk walk.
    "q_multimodal_wav" ->
      """WITH g AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(8000 + (doc_id % 5) * 4000 AS BIGINT) AS rate,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS BIGINT) AS bits,
        |    CAST(100 + doc_id % 57 AS BIGINT) AS n,
        |    CAST(5 + doc_id % 7 AS BIGINT) AS l
        |  FROM documents
        |), s AS (
        |  SELECT media_id, ch, rate, bits, n,
        |    ch * (bits // 8) AS ba, 52 + l + (l % 2) AS data_off,
        |    j, (j * n) // 4 AS sample_idx
        |  FROM g, (SELECT unnest(generate_series(0, 3)) AS j)
        |)
        |SELECT media_id, ch AS channels, rate AS sample_rate, bits,
        |  CAST(j AS BIGINT) AS j, sample_idx,
        |  data_off + sample_idx * ba AS sample_off,
        |  ba AS sample_len,
        |  sha256(repeat(chr(CAST((media_id * 41 + sample_idx * 13) % 96 + 32 AS INT)),
        |    CAST(ba AS INT))) AS sample_sha
        |FROM s ORDER BY media_id, j""".stripMargin,

    // Amplitudes are arithmetic: frame i's constant fill byte is
    // v = (media_id·53 + i·17) % 96 + 32, so a 16-bit frame's channel-0
    // LE16 sample (v, v) decodes to v·256 + v = 257·v and an 8-bit
    // frame to v − 128. The Spark side must reproduce sums and peaks by
    // actually decoding the sampled container bytes.
    "q_audio_windows" ->
      """WITH g AS (
        |  SELECT CAST(doc_id AS BIGINT) AS media_id,
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8 END AS BIGINT) AS bits,
        |    CAST(40 + doc_id % 90 AS BIGINT) AS n
        |  FROM documents
        |), w AS (
        |  SELECT media_id, bits, n, j, (j * n) // 4 AS win_start,
        |    CASE WHEN n - (j * n) // 4 > 16 THEN 16
        |         ELSE n - (j * n) // 4 END AS win_len
        |  FROM g, (SELECT unnest(generate_series(0, 3)) AS j)
        |), a AS (
        |  SELECT media_id, j, win_start, win_len,
        |    CASE WHEN bits = 16
        |      THEN ((media_id * 53 + (win_start + i) * 17) % 96 + 32) * 257
        |      ELSE ((media_id * 53 + (win_start + i) * 17) % 96 + 32) - 128
        |    END AS amp
        |  FROM w, (SELECT unnest(generate_series(0, 15)) AS i) WHERE i < win_len
        |)
        |SELECT media_id, CAST(j AS BIGINT) AS j, win_start, win_len,
        |  CAST(SUM(amp) AS BIGINT) AS sum_amp,
        |  CAST(MAX(ABS(amp)) AS BIGINT) AS peak_abs
        |FROM a GROUP BY media_id, j, win_start, win_len
        |ORDER BY media_id, j""".stripMargin,

    // Every routed field is doc_id arithmetic per container family;
    // the Spark side must recover kind and metadata by sniffing and
    // parsing the synthesized bytes.
    "q_multimodal_route" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |    WHEN 3 THEN 'gftv' WHEN 4 THEN 'mp4' ELSE 'wav' END AS kind,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 3 THEN -1 WHEN 5 THEN -1
        |    WHEN 4 THEN 320 + (doc_id % 5) * 64
        |    ELSE 16 + doc_id % 624 END AS width,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 3 THEN -1 WHEN 5 THEN -1
        |    WHEN 4 THEN 180 + (doc_id % 5) * 36
        |    ELSE 16 + doc_id % 464 END AS height,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 3 THEN 8 + doc_id % 25
        |    WHEN 4 THEN 6 + doc_id % 23
        |    WHEN 5 THEN 100 + doc_id % 57
        |    ELSE -1 END AS n_frames,
        |  CASE CAST(doc_id % 6 AS INT)
        |    WHEN 5 THEN 8000 + (doc_id % 5) * 4000
        |    ELSE -1 END AS sample_rate
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
