package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stateful streaming sessionization: sessions are emitted only once the
  * watermark seals them (wm > session end + gap), so any admissible late
  * event — including a late SIBLING of an earlier late event — still
  * merges before emission and the output equals the batch-window twin.
  * Watermark advances per processed batch (max event ts − 1 h), and
  * timeouts fire on the NEXT batch after the advance, so the tests push
  * extra batches to seal and then assert.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String, name: String,
                          rows: Seq[(Long, String, String)]): Unit = {
    val df = rows.toDF("user_id", "ts_s", "event_type")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"event_type")
    df.coalesce(1).write.mode("append").parquet(dir)
    // marker so each call lands as at least one new file
    Files.createDirectories(Paths.get(s"$dir/../markers"))
    Files.write(Paths.get(s"$dir/../markers/$name"), Array.empty[Byte])
  }

  test("gap-split sessions seal once the watermark passes; output matches batch twin") {
    val base = tmpDir("sess")
    val events = s"$base/events"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    // batch 1: u1 has a 2-event session then a >30min gap; u2 one event
    writeEvents(events, "b1", Seq(
      (1L, "2025-09-15 10:00:00", "view"),
      (1L, "2025-09-15 10:10:00", "click"),
      (1L, "2025-09-15 11:00:00", "view"),
      (2L, "2025-09-15 10:05:00", "signup")))
    Sessionize.run(spark, events, out, ckpt)
    // batch 2 advances the watermark to 13:00 (14:00 − 1h delay); batch 3
    // then runs WITH that watermark, sealing every session ended ≤ 12:30
    writeEvents(events, "b2", Seq((1L, "2025-09-15 14:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq((1L, "2025-09-15 18:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)

    val sessions = spark.read.parquet(out).cache()
    // u1's first session: 2 events, 10 minutes
    assert(sessions.where($"user_id" === 1 && $"n_events" === 2 &&
      $"duration_sec" === 600).count() == 1)
    // u1's 11:00 singleton sealed
    assert(sessions.where($"user_id" === 1 && $"n_events" === 1).count() >= 1)
    // u2's single-event session sealed with duration 0
    assert(sessions.where($"user_id" === 2 && $"n_events" === 1 &&
      $"duration_sec" === 0).count() == 1)
    assert(sessions.count() >= 3)

    // cross-check: every streaming-sealed session matches a session the
    // batch window logic derives from the same events (same gap rule)
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val batchSessions = spark.read.parquet(events)
      .withColumn("prev", lag($"ts", 1).over(byUser))
      .withColumn("new_s", when($"prev".isNull ||
        unix_timestamp($"ts") - unix_timestamp($"prev") > 1800, 1L).otherwise(0L))
      .withColumn("sidx", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sidx")
      .agg(min($"ts").as("start_ts"), count(lit(1)).as("n_events"),
        (unix_timestamp(max($"ts")) - unix_timestamp(min($"ts"))).as("duration_sec"))
      .select("user_id", "start_ts", "n_events", "duration_sec")
    val unmatched = sessions.select("user_id", "start_ts", "n_events", "duration_sec")
      .except(batchSessions)
    assert(unmatched.count() == 0,
      s"streaming sessions not found in batch: ${unmatched.collect().mkString(", ")}")
  }

  test("late out-of-order event within gap merges and extends session start") {
    val base = tmpDir("sess_ooo")
    val events = s"$base/events"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    writeEvents(events, "b1", Seq((3L, "2025-09-15 12:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    // 11:45 arrives late (before the open session's start, within the
    // 30-min gap and above the watermark) — must merge AND move start back
    writeEvents(events, "b2", Seq((3L, "2025-09-15 11:45:00", "click")))
    Sessionize.run(spark, events, out, ckpt)
    // advance the watermark past the merged session's seal point (12:30),
    // then run once more so the event-time timeout fires
    writeEvents(events, "b3", Seq((3L, "2025-09-15 14:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    writeEvents(events, "b4", Seq((3L, "2025-09-15 18:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)

    val s = spark.read.parquet(out).where($"user_id" === 3 && $"n_events" === 2)
    assert(s.count() == 1)
    val row = s.head()
    assert(row.getAs[java.sql.Timestamp]("start_ts").toString.startsWith("2025-09-15 11:45:00"))
    assert(row.getAs[Long]("duration_sec") == 900L)
  }

  test("late event more than a gap before the open session becomes its own session") {
    val base = tmpDir("sess_oog")
    val events = s"$base/events"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    writeEvents(events, "b1", Seq((4L, "2025-09-15 12:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    // 11:15 is 45 min before the open session's start (> 30-min gap) and
    // above the watermark: it cannot merge — the batch twin splits there —
    // so it becomes its own open session, sealed when the watermark passes
    writeEvents(events, "b2", Seq((4L, "2025-09-15 11:15:00", "click")))
    Sessionize.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq((4L, "2025-09-15 15:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    writeEvents(events, "b4", Seq((4L, "2025-09-15 19:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)

    val closed = spark.read.parquet(out).where($"user_id" === 4).cache()
    val singleton = closed.where($"start_ts".cast("string").startsWith("2025-09-15 11:15:00"))
    assert(singleton.count() == 1)
    val r = singleton.head()
    assert(r.getAs[Long]("n_events") == 1L && r.getAs[Long]("duration_sec") == 0L)
    // the 12:00 session was untouched by the late split: sealed alone
    val noon = closed.where($"start_ts".cast("string").startsWith("2025-09-15 12:00:00"))
    assert(noon.count() == 1)
    assert(noon.head().getAs[Long]("n_events") == 1L)
  }

  test("two late siblings both >gap before the open session merge into one session") {
    val base = tmpDir("sess_sib")
    val events = s"$base/events"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    writeEvents(events, "b1", Seq((5L, "2025-09-15 13:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    // both 12:01 and 12:10 are >30 min before the open 13:00 session but
    // within the gap of EACH OTHER, arriving in successive batches — the
    // batch twin merges them into one 2-event session, and so must we
    // (the old eager-emit path produced two singletons here)
    writeEvents(events, "b2", Seq((5L, "2025-09-15 12:01:00", "click")))
    Sessionize.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq((5L, "2025-09-15 12:10:00", "click")))
    Sessionize.run(spark, events, out, ckpt)
    // advance watermark past all seal points, then one more batch to fire
    writeEvents(events, "b4", Seq((5L, "2025-09-15 17:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    writeEvents(events, "b5", Seq((5L, "2025-09-15 21:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)

    val closed = spark.read.parquet(out).where($"user_id" === 5).cache()
    val merged = closed.where($"n_events" === 2)
    assert(merged.count() == 1)
    val m = merged.head()
    assert(m.getAs[java.sql.Timestamp]("start_ts").toString.startsWith("2025-09-15 12:01:00"))
    assert(m.getAs[Long]("duration_sec") == 540L)
    // no singleton was ever emitted for 12:01 or 12:10
    assert(closed.where($"n_events" === 1 &&
      $"start_ts".cast("string").startsWith("2025-09-15 12:")).count() == 0)
    // the 13:00 session sealed alone
    assert(closed.where($"start_ts".cast("string").startsWith("2025-09-15 13:00:00") &&
      $"n_events" === 1).count() == 1)
  }
}
