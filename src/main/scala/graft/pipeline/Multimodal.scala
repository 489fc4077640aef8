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
}
