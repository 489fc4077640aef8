package graft.runner

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline._

/** EP1 — the 15-minute micro-batch loop (SURVEY.md §3):
  * interval → staging path → staging→bronze → bronze→silver →
  * dim upsert → silver→gold, in one SparkSession (the reference runs
  * three spark-submits per tick via Airflow; same data semantics, no
  * process-spawn overhead).
  *
  * Idempotency (fixes the reference's acknowledged APPEND gap,
  * README.md:190-192):
  *   - bronze is partitioned by (ingestion_date, batch_id) where batch_id
  *     is the interval stamp — dynamic partition overwrite makes a re-run
  *     replace exactly its own batch partition, no merge read needed.
  *   - silver/fact are event-time partitioned (late events land in their
  *     true partition), so several intervals share a partition; a batch
  *     merges with the affected partitions' existing rows, deduped by
  *     event_id — re-runs converge to the same content.
  * The only cross-batch state is the dim_user high-water mark, re-read
  * from the sink (replay_silver_to_gold.py:239-243).
  *
  * At 100 TB each tick touches only its own batch/date partitions;
  * nothing here scans or rewrites the full table.
  */
class MicroBatch(spark: SparkSession, stagingBase: String, warehouse: String) {

  val bronzePath = s"$warehouse/bronze_events"
  val silverPath = s"$warehouse/user_events_silver"
  val factPath = s"$warehouse/fact_user_events"
  val dimUserPath = s"$warehouse/dim_user"

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val batchFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmm")

  private def readOrEmpty(path: String, schema: StructType): DataFrame =
    try spark.read.parquet(path)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private val dimUserSchema = StructType(Seq(
    StructField("user_sk", LongType), StructField("user_id", StringType),
    StructField("anonymous_id", StringType), StructField("user_segment", StringType),
    StructField("cooking_style", StringType), StructField("ab_test_group", StringType)))

  /** One 15-minute tick. Returns (bronzeRows, silverRows, factRowsTotal). */
  def runInterval(start: LocalDateTime): (Long, Long, Long) = {
    val path = StagingToBronze.stagingPathFor(stagingBase, start)
    val ingestionDate = start.toLocalDate.format(dateFmt)
    val batchId = start.format(batchFmt)

    // --- staging → bronze (S1/S2/P1/P2; S10 empty-input short-circuit)
    val raw =
      try StagingToBronze.readStaging(spark, path)
      catch { case _: org.apache.spark.sql.AnalysisException => return (0L, 0L, 0L) }
    if (raw.isEmpty) return (0L, 0L, 0L)
    val bronze = StagingToBronze.enrich(raw, path, ingestionDate)
      .withColumn("batch_id", lit(batchId))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bronze.write.mode("overwrite")
      .partitionBy("ingestion_date", "batch_id").parquet(bronzePath)

    // --- bronze → silver: read back only this batch's partition (P3)
    val bronzeBatch = spark.read.parquet(bronzePath)
      .where(col("ingestion_date") === lit(ingestionDate) && col("batch_id") === lit(batchId))
    val silverNew = BronzeToSilver.transform(bronzeBatch)

    // merge with affected event-date partitions, dedup by event_id
    val affected = silverNew.select("year", "month", "day").distinct()
    val silverExisting = readOrEmpty(silverPath, silverNew.schema)
      .join(broadcast(affected), Seq("year", "month", "day"), "left_semi")
    val silverMerged = silverNew.unionByName(silverExisting)
      .dropDuplicates("event_id")
      // materialize before overwriting partitions we just read
      .localCheckpoint(true)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    silverMerged.write.mode("overwrite")
      .partitionBy("year", "month", "day").parquet(silverPath)
    val silverBatch = spark.read.parquet(silverPath)
      .join(broadcast(affected), Seq("year", "month", "day"), "left_semi")

    // --- dim_user incremental upsert (J5 + A4 + W2)
    val existing = readOrEmpty(dimUserPath, dimUserSchema)
    val appended = Dims.dimUserUpsert(silverBatch, existing)
    val dimUser = existing.unionByName(appended).localCheckpoint(true)
    dimUser.write.mode("overwrite").parquet(dimUserPath)

    // --- silver → gold for the affected dates (merge-dedup by event_id)
    val silverAll = spark.read.parquet(silverPath)
    val dimUserNow = spark.read.parquet(dimUserPath)
    val dimEvent = Dims.dimEvent(silverAll)
    val dimPage = Dims.dimPage(silverAll)
    val dimRecipe = silverAll.where(col("prop_recipe_id").isNotNull)
      .select(col("prop_recipe_id").cast("string").as("recipe_id")).distinct()
      .withColumn("recipe_sk", row_number().over(Window.orderBy("recipe_id")).cast("long"))
    val factNew = SilverToGold
      .buildFact(silverBatch, dimUserNow, dimRecipe, dimEvent, dimPage)
      .withColumn("created_date", to_date(col("created_at")))
    val factExisting = readOrEmpty(factPath, factNew.schema)
      .join(broadcast(factNew.select("created_date").distinct()),
        Seq("created_date"), "left_semi")
    val factMerged = factNew.unionByName(factExisting)
      .dropDuplicates("event_id").localCheckpoint(true)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    factMerged.write.mode("overwrite").partitionBy("created_date").parquet(factPath)

    (bronze.count(), silverMerged.count(), factMerged.count())
  }

  /** Run a sequence of 15-min intervals in order (the DAG's catchup loop). */
  def runRange(start: LocalDateTime, ticks: Int): Seq[(Long, Long, Long)] =
    (0 until ticks).map(i => runInterval(start.plusMinutes(15L * i)))
}
