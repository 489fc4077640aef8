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
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
