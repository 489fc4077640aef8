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
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` table's `ts` encoding has varied across driver
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark 4
    * rejects outright — read nanos as LONG and integer-`div` to a
    * microsecond timestamp; no double round-trip, ns values exceed
    * 2^53), or a native microsecond timestamp (isAdjustedToUTC=false →
    * TIMESTAMP_NTZ in Spark, plain naive TIMESTAMP in DuckDB). Normalize
    * both to session-zone TimestampType (session tz is pinned UTC
    * everywhere, so the NTZ cast is wall-clock identity and matches
    * DuckDB's naive read).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
