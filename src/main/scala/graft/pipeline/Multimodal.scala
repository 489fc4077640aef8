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
}
