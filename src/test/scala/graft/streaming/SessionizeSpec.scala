package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stateful streaming sessionization: gap-closed sessions emit as soon
  * as a later event arrives; idle sessions close via event-time timeout
  * once the watermark passes; state survives restarts via checkpoint.
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

  test("gap-split sessions close in-stream; idle ones close by watermark timeout") {
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
    val after1 = spark.read.parquet(out)
    // u1's first session closed by the 11:00 arrival (gap > 30 min)
    assert(after1.where($"user_id" === 1 && $"n_events" === 2 &&
      $"duration_sec" === 600).count() == 1)

    // batch 2: a much later event advances the watermark past both idle
    // sessions' timeouts
    writeEvents(events, "b2", Seq((1L, "2025-09-15 14:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    // batch 3: one more late event so the previous watermark's timeouts fire
    writeEvents(events, "b3", Seq((1L, "2025-09-15 18:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)

    val sessions = spark.read.parquet(out).cache()
    // u2's single-event session eventually closed with duration 0
    assert(sessions.where($"user_id" === 2 && $"n_events" === 1 &&
      $"duration_sec" === 0).count() == 1)
    // u1's 11:00 singleton closed too
    assert(sessions.where($"user_id" === 1 && $"n_events" === 1).count() >= 1)
    assert(sessions.count() >= 3)

    // cross-check: every streaming-closed session matches a session the
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
    // a later event past the gap closes the merged session
    writeEvents(events, "b3", Seq((3L, "2025-09-15 14:00:00", "view")))
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
    // above the watermark: it cannot merge — the batch twin would split
    // there — so it closes immediately as a single-event session
    writeEvents(events, "b2", Seq((4L, "2025-09-15 11:15:00", "click")))
    Sessionize.run(spark, events, out, ckpt)

    val singleton = spark.read.parquet(out).where($"user_id" === 4)
    assert(singleton.count() == 1)
    val r = singleton.head()
    assert(r.getAs[java.sql.Timestamp]("start_ts").toString.startsWith("2025-09-15 11:15:00"))
    assert(r.getAs[Long]("n_events") == 1L && r.getAs[Long]("duration_sec") == 0L)
    // the open 12:00 session is untouched: a later event closes it alone
    writeEvents(events, "b3", Seq((4L, "2025-09-15 15:00:00", "view")))
    Sessionize.run(spark, events, out, ckpt)
    val noon = spark.read.parquet(out)
      .where($"user_id" === 4 && $"start_ts".cast("string").startsWith("2025-09-15 12:00:00"))
    assert(noon.count() == 1)
    assert(noon.head().getAs[Long]("n_events") == 1L)
  }
}
