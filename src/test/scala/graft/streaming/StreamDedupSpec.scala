package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Streaming dedup: the sink must hold exactly one row per event_id
  * even when a whole drain is redelivered (the at-least-once upstream
  * contract), matching the batch dedup over the same files; and the
  * seen-key state must be EVICTED once the watermark passes a key's
  * timestamp + delay — the bound that keeps state proportional to the
  * redelivery window on an unbounded stream.
  */
class StreamDedupSpec extends SparkSpec {
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

  test("redelivered drain adds nothing; output keys equal batch dedup") {
    val base = tmpDir("sdedup")
    val events = s"$base/events"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    // drain 1 carries an in-batch duplicate (id 2 twice)
    val b1 = Seq(
      (1L, "2025-09-15 10:00:00", 1L, "view", 0.0),
      (2L, "2025-09-15 10:01:00", 2L, "click", 0.0),
      (2L, "2025-09-15 10:01:00", 2L, "click", 0.0),
      (3L, "2025-09-15 10:02:00", 3L, "purchase", 9.0))
    writeEvents(events, "b1", b1)
    StreamDedup.run(spark, events, out, ckpt)
    val after1 = spark.read.parquet(out).select($"event_id").as[Long].collect().toSeq
    assert(after1.sorted == Seq(1L, 2L, 3L), s"drain 1 output: $after1")

    // drain 2 REDELIVERS all of drain 1 (fresh files, same ids, within
    // the watermark window) plus one genuinely new event — only the new
    // one may append; ids 1-3 are caught by STATE, not by sink reads
    writeEvents(events, "b2", b1 :+ (4L, "2025-09-15 10:10:00", 4L, "view", 0.0))
    StreamDedup.run(spark, events, out, ckpt)
    val after2 = spark.read.parquet(out).select($"event_id").as[Long].collect().toSeq
    assert(after2.sorted == Seq(1L, 2L, 3L, 4L), s"drain 2 output: $after2")
    assert(after2.size == 4, s"redelivery appended duplicates: $after2")

    val want = StreamDedup.batchTwin(spark, events)
      .select($"event_id").as[Long].collect().toSeq.sorted
    assert(after2.sorted == want, s"stream $after2 != batch $want")
  }

  test("watermark evicts seen-key state past the delay window") {
    val base = tmpDir("sdedup_evict")
    val events = s"$base/events"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    writeEvents(events, "b1", (1L to 6L).map(i =>
      (i, s"2025-09-15 10:0$i:00", i, "view", 0.0)))
    // .get, not getOrElse(0): a missing-metrics drain must FAIL here —
    // the old 0L default made the s3 < s1 eviction assertion vacuous
    val s1 = StreamDedup.run(spark, events, out, ckpt)
      .getOrElse(fail("drain 1 reported no state metrics"))
    assert(s1 >= 6, s"all drained keys should be in state, got $s1")
    // eviction uses the PREVIOUS batch's watermark, so two late drains:
    // the first advances the watermark past 10:0x + 1h, the second
    // triggers the eviction pass
    writeEvents(events, "b2", Seq((7L, "2025-09-15 20:00:00", 9L, "view", 0.0)))
    StreamDedup.run(spark, events, out, ckpt)
    writeEvents(events, "b3", Seq((8L, "2025-09-15 21:00:00", 9L, "view", 0.0)))
    val s3 = StreamDedup.run(spark, events, out, ckpt)
      .getOrElse(fail("drain 3 reported no state metrics"))
    assert(s3 < s1, s"state did not shrink after watermark advance: $s1 -> $s3")
  }
}
