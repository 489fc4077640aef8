package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r16 optimization that fused the bulk silver dedup into the
  * clustered-write exchange ([[Warehouse.writeSilverDedupClustered]]):
  * the fused single-exchange path must publish EXACTLY the table the
  * unfused `transform` (dropDuplicates) + [[Warehouse.writeSilverClustered]]
  * pipeline publishes, on a corpus carrying byte-identical redeliveries
  * (the at-least-once regime the dedup exists for), and its physical
  * plan must carry exactly ONE Exchange (the fusion's whole point).
  */
class WarehouseDedupSpec extends SparkSpec {
  import spark.implicits._

  private def rawEvent(eventId: String, ts: String): String =
    s"""{"event_id":"$eventId","event_name":"view_recipe","user_id":"u$eventId",""" +
      s""""anonymous_id":"a1","session_id":"s1","timestamp":"$ts",""" +
      """"context":"{\"page\":{\"name\":\"home\",\"url\":\"https://r/h\",\"path\":\"/h\"},""" +
      """\"user_segment\":\"casual\",\"cooking_style\":\"korean\",""" +
      """\"ab_test\":{\"scenario\":\"sc1\",\"group\":\"control\"}}",""" +
      """"event_properties":"{\"recipe_id\":\"42\",\"action\":\"dur:30\"}"}"""

  test("fused dedup+clustered write equals dropDuplicates + clustered write") {
    // three distinct events across two dates, each line redelivered
    // byte-identically (2x, 3x, 1x)
    val lines = Seq(
      rawEvent("e1", "2025-09-15T10:00:00.000+09:00"),
      rawEvent("e1", "2025-09-15T10:00:00.000+09:00"),
      rawEvent("e2", "2025-09-15T11:00:00.000+09:00"),
      rawEvent("e2", "2025-09-15T11:00:00.000+09:00"),
      rawEvent("e2", "2025-09-15T11:00:00.000+09:00"),
      rawEvent("e3", "2025-09-16T09:00:00.000+09:00"))
    val bronze = StagingToBronze.enrich(lines.toDF("value"), "t.jsonl", "2025-09-15")

    val fusedPath = tmpDir("graft_fused_silver")
    val plainPath = tmpDir("graft_plain_silver")
    Warehouse.writeSilverDedupClustered(BronzeToSilver.parse(bronze), fusedPath)
    Warehouse.writeSilverClustered(BronzeToSilver.transform(bronze), plainPath)

    // processed_at/ingestion_timestamp are wall-clock audit stamps
    // (each write is its own execution, so current_timestamp differs
    // between the two runs by construction); compare everything else
    val volatile = Set("processed_at", "ingestion_timestamp")
    def table(path: String): Set[String] = {
      val df = spark.read.parquet(path)
      val cols = df.columns.filterNot(volatile).sorted
      df.select(cols.map(c => col(c).cast("string")): _*)
        .collect().map(_.mkString("|")).toSet
    }
    val fused = table(fusedPath)
    assert(fused == table(plainPath))
    assert(fused.size == 3, s"dedup must keep one row per event_id: $fused")

    // schema (incl. column order pre-partitioning) must be unchanged
    assert(spark.read.parquet(fusedPath).schema ==
      spark.read.parquet(plainPath).schema)
  }

  test("fused write plans exactly one Exchange") {
    val bronze = StagingToBronze.enrich(
      Seq(rawEvent("e9", "2025-09-15T10:00:00.000+09:00")).toDF("value"),
      "t.jsonl", "2025-09-15")
    val parsed = BronzeToSilver.parse(bronze)
    val salt = pmod(xxhash64(col("event_id")), lit(2))
    val keyCols = Set("event_id", "year", "month", "day")
    val firsts = parsed.columns.filterNot(keyCols).map(c => first(col(c)).as(c))
    val fusedFrame = parsed
      .repartition(col("year"), col("month"), col("day"), salt)
      .groupBy(col("year"), col("month"), col("day"), salt.as("__salt"),
        col("event_id"))
      .agg(firsts.head, firsts.tail: _*)
      .drop("__salt")
      .select(parsed.columns.map(col): _*)
    val exchanges = fusedFrame.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"fused dedup+cluster must reuse the single repartition exchange, saw $exchanges")
  }
}
