package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Timeout-emission state machine: bursts seal ONLY once the event-time
  * timeout fires (wm > burst end + 45-min gap), carrying cumulative
  * payload (value_q sum, (ts,event_id)-argmax last event type), and the
  * group's state is evicted on seal. Watermark advances per processed
  * batch and timeouts fire on the NEXT batch, so the tests push extra
  * batches to seal and then assert — the SessionizeSpec cadence.
  */
class StreamStateSpec extends SparkSpec {
  import spark.implicits._

  private var nextId = 100L
  private def writeEvents(dir: String, name: String,
                          rows: Seq[(Long, String, String, Long)]): Unit = {
    val df = rows.map { case (u, ts, ty, vq) =>
      nextId += 1; (u, ts, ty, nextId, vq)
    }.toDF("user_id", "ts_s", "event_type", "event_id", "value_q")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"event_type",
        $"event_id", $"value_q")
    df.coalesce(1).write.mode("append").parquet(dir)
    Files.createDirectories(Paths.get(s"$dir/../markers"))
    Files.write(Paths.get(s"$dir/../markers/$name"), Array.empty[Byte])
  }

  test("bursts seal on inactivity timeout with cumulative payload; state evicts") {
    val base = tmpDir("sstate")
    val events = s"$base/events"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    // u1: a 3-event burst (10:00-10:40, ≤45-min steps) then a >45-min gap
    // to a singleton at 12:00; u2 one event. Values sum exactly in 1e-4
    // units; the burst's last event type is the 10:40 "purchase".
    writeEvents(events, "b1", Seq(
      (1L, "2025-09-15 10:00:00", "view", 10000L),
      (1L, "2025-09-15 10:40:00", "purchase", 250000L),
      (1L, "2025-09-15 10:20:00", "click", 5000L),
      (1L, "2025-09-15 12:00:00", "view", 70000L),
      (2L, "2025-09-15 10:05:00", "signup", 0L)))
    StreamState.run(spark, events, out, ckpt)
    // the drain's final watermark-commit batch runs at wm = 12:00 − 1 h =
    // 11:00: u2's burst (ends 10:05, sealable from 10:50) times out and
    // seals there, but NONE of u1's can (first burst ends 10:40, sealable
    // only from 11:25) — partial sealing inside one drain is the
    // AvailableNow semantics under test
    assert(spark.read.parquet(out).where($"user_id" === 1).count() == 0)
    // advance the watermark (14:00 − 1 h = 13:00), then fire timeouts
    writeEvents(events, "b2", Seq((9L, "2025-09-15 14:00:00", "view", 0L)))
    StreamState.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq((9L, "2025-09-15 18:00:00", "view", 0L)))
    StreamState.run(spark, events, out, ckpt)

    val sealedB = spark.read.parquet(out).cache()
    val burst = sealedB.where($"user_id" === 1 && $"n_events" === 3)
    assert(burst.count() == 1)
    val b = burst.head()
    assert(b.getAs[Long]("value_q") == 265000L)
    assert(b.getAs[String]("last_event_type") == "purchase")
    assert(b.getAs[java.sql.Timestamp]("start_ts").toString
      .startsWith("2025-09-15 10:00:00"))
    // the 12:00 singleton sealed separately with its own payload
    val single = sealedB.where($"user_id" === 1 && $"n_events" === 1)
    assert(single.count() == 1)
    assert(single.head().getAs[Long]("value_q") == 70000L)
    assert(sealedB.where($"user_id" === 2).count() == 1)

    // eviction: re-draining with no new data emits nothing new (sealed
    // state is gone, not re-emitted)
    val before = sealedB.count()
    StreamState.run(spark, events, out, ckpt)
    assert(spark.read.parquet(out).count() == before)
  }

  test("late event within gap merges into the open burst and updates the argmax") {
    val base = tmpDir("sstate_ooo")
    val events = s"$base/events"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"

    writeEvents(events, "b1", Seq((3L, "2025-09-15 12:00:00", "view", 100L)))
    StreamState.run(spark, events, out, ckpt)
    // 12:30 arrives in a later batch (above watermark, within gap): it is
    // the burst's LATEST event, so the argmax snapshot must become it
    writeEvents(events, "b2", Seq((3L, "2025-09-15 12:30:00", "purchase", 900L)))
    StreamState.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq((9L, "2025-09-15 15:00:00", "view", 0L)))
    StreamState.run(spark, events, out, ckpt)
    writeEvents(events, "b4", Seq((9L, "2025-09-15 19:00:00", "view", 0L)))
    StreamState.run(spark, events, out, ckpt)

    val b = spark.read.parquet(out).where($"user_id" === 3)
    assert(b.count() == 1)
    val r = b.head()
    assert(r.getAs[Long]("n_events") == 2L)
    assert(r.getAs[Long]("value_q") == 1000L)
    assert(r.getAs[String]("last_event_type") == "purchase")
  }
}
