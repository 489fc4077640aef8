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
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
