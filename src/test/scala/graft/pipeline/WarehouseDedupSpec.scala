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
    // the PRODUCTION frame builder, not a hand-copied twin
    val fusedFrame = Warehouse.dedupClusteredFrame(BronzeToSilver.parse(bronze))
    val exchanges = fusedFrame.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"fused dedup+cluster must reuse the single repartition exchange, saw $exchanges")
  }

  test("cross-date duplicate event_id survives once per date (the documented " +
      "at-least-once precondition boundary)") {
    // VERDICT r16 #2: the fused dedup's equivalence to
    // dropDuplicates("event_id") assumes byte-identical redelivery (same
    // payload, same event date). A replayed event whose corrected
    // timestamp crosses a date boundary is OUTSIDE that contract; the
    // CHOSEN behavior — pinned here so it is a decision, not an accident
    // — is that each affected date partition keeps its own copy.
    val lines = Seq(
      rawEvent("e1", "2025-09-15T23:59:00.000+09:00"),
      rawEvent("e1", "2025-09-16T00:01:00.000+09:00"), // same id, next date
      rawEvent("e2", "2025-09-15T10:00:00.000+09:00"))
    val bronze = StagingToBronze.enrich(lines.toDF("value"), "t.jsonl", "2025-09-15")
    val path = tmpDir("graft_xdate_silver")
    Warehouse.writeSilverDedupClustered(BronzeToSilver.parse(bronze), path)
    val out = spark.read.parquet(path)
      .groupBy(col("event_id")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("e1" -> 2L, "e2" -> 1L),
      s"cross-date duplicate must keep one row per (event_id, date): $out")
  }
}
