package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata star schema (TESTDATA.md).
  * One parquet file per table under `$sfDir/`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
