package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join: matches must equal the batch join over
  * the same files, including pairs whose two sides arrive in DIFFERENT
  * micro-batch drains (the whole point of join state), and the state
  * must be bounded by the watermark (asserted structurally: the planned
  * condition carries the time range that enables per-side eviction).
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String, name: String,
                          rows: Seq[(Long, String, Long, String, Double)]): Unit = {
    val df = rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"), $"user_id",
        $"event_type", $"value")
    df.coalesce(1).write.mode("append").parquet(dir)
    Files.createDirectories(Paths.get(s"$dir/../markers"))
    Files.write(Paths.get(s"$dir/../markers/$name"), Array.empty[Byte])
  }

  test("interval join matches batch twin, including cross-drain pairs") {
    val base = tmpDir("sjoin")
    val events = s"$base/events"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    // drain 1: u1 click at 10:00 (purchase later, NEXT drain), u2
    // click+purchase within window, u3 purchase 40min after click (no match)
    writeEvents(events, "b1", Seq(
      (1L, "2025-09-15 10:00:00", 1L, "click", 0.0),
      (10L, "2025-09-15 10:05:00", 2L, "click", 0.0),
      (11L, "2025-09-15 10:20:00", 2L, "purchase", 42.0),
      (20L, "2025-09-15 10:00:00", 3L, "click", 0.0),
      (21L, "2025-09-15 10:40:01", 3L, "purchase", 7.0)))
    StreamJoin.run(spark, events, out, ckpt)

    // drain 2: u1's purchase arrives 25 min after its click — the click
    // is in STATE from drain 1; also a view (never joins)
    writeEvents(events, "b2", Seq(
      (2L, "2025-09-15 10:25:00", 1L, "purchase", 99.0),
      (30L, "2025-09-15 10:30:00", 4L, "view", 0.0)))
    StreamJoin.run(spark, events, out, ckpt)

    val got = spark.read.parquet(out)
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    val want = StreamJoin.batchTwin(spark, events)
      .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
    assert(want == Set((1L, 2L), (10L, 11L)), s"batch twin unexpected: $want")
    assert(got == want, s"stream join $got != batch $want")
  }

  test("watermark evicts join state once events age past the delay") {
    // The 100-TB contract: join state must SHRINK as the watermark
    // passes buffered rows, or an unbounded stream OOMs. Observed via
    // the query's own state metrics, not assumed. Eviction uses the
    // watermark computed from the PREVIOUS batch, so the late drains
    // below each advance it one step and the next drain evicts.
    val base = tmpDir("sjoin_evict")
    val events = s"$base/events"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    writeEvents(events, "b1", Seq(
      (1L, "2025-09-15 10:00:00", 1L, "click", 0.0),
      (2L, "2025-09-15 10:02:00", 2L, "click", 0.0),
      (3L, "2025-09-15 10:04:00", 3L, "click", 0.0),
      (4L, "2025-09-15 10:06:00", 4L, "click", 0.0),
      (5L, "2025-09-15 10:08:00", 5L, "click", 0.0),
      (6L, "2025-09-15 10:20:00", 2L, "purchase", 5.0)))
    val s1 = StreamJoin.run(spark, events, out, ckpt)
    assert(s1 >= 6, s"all drained rows should be buffered, got $s1")
    // jump event time far ahead ON BOTH SIDES: the global watermark is
    // the MIN of the per-side watermarks (multipleWatermarkPolicy=min),
    // so a side whose stream goes quiet pins eviction for the whole
    // join — the late drains carry a click AND a (non-matching, >30 min
    // later) purchase to advance both. Inner-join state cleanup also
    // uses the PREVIOUS batch's watermark and AvailableNow runs no
    // cleanup-only batches, so the advance needs follow-up drains.
    writeEvents(events, "b2", Seq(
      (7L, "2025-09-15 20:00:00", 9L, "click", 0.0),
      (70L, "2025-09-15 20:40:01", 9L, "purchase", 1.0)))
    StreamJoin.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq(
      (8L, "2025-09-15 21:00:00", 9L, "click", 0.0),
      (80L, "2025-09-15 21:40:01", 9L, "purchase", 1.0)))
    StreamJoin.run(spark, events, out, ckpt)
    writeEvents(events, "b4", Seq(
      (9L, "2025-09-15 22:00:00", 9L, "click", 0.0),
      (90L, "2025-09-15 22:40:01", 9L, "purchase", 1.0)))
    val s4 = StreamJoin.run(spark, events, out, ckpt)
    assert(s4 < s1, s"state did not shrink after watermark advance: $s1 -> $s4")
  }
}
