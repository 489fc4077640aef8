package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: per-user custom state via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * batch windows can't express incrementally.
  *
  * Sessions are intervals of events where consecutive (time-sorted)
  * events are ≤ gap apart. State per user is the list of open sessions —
  * interval accumulators, never the events. A session is emitted only
  * once the WATERMARK seals it (watermark > session end + gap): until
  * then an admissible late event could still extend it, or even BRIDGE
  * it with a neighboring session, and an eager emit would diverge from
  * the batch twin. Sealed output therefore equals the batch-window
  * sessionization of the same events, exactly, for any arrival order the
  * watermark admits. The open-session count per user is bounded by
  * (watermark delay / gap) + 1 — intervals further apart than that are
  * sealed — so state stays O(1) no matter how long the stream runs.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class OpenSession(start: Long, last: Long, nEvents: Long)
  case class OpenSessions(open: Seq[OpenSession])
  case class ClosedSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                           n_events: Long, duration_sec: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** Merge one event time into the open-session set: it joins every
    * session whose gap-extended interval covers it (possibly bridging
    * two), or opens a new one.
    */
  private def mergeEvent(sessions: List[OpenSession], t: Long): List[OpenSession] = {
    val (near, far) = sessions.partition(s => t >= s.start - GapMs && t <= s.last + GapMs)
    near.foldLeft(OpenSession(t, t, 1)) { (acc, s) =>
      OpenSession(math.min(acc.start, s.start), math.max(acc.last, s.last),
        acc.nEvents + s.nEvents)
    } :: far
  }

  private def updateState(userId: Long, events: Iterator[Event],
                          state: GroupState[OpenSessions]): Iterator[ClosedSession] = {
    def close(s: OpenSession) = ClosedSession(userId, new Timestamp(s.start),
      new Timestamp(s.last), s.nEvents, (s.last - s.start) / 1000)

    var sessions = state.getOption.map(_.open.toList).getOrElse(Nil)
    if (!state.hasTimedOut)
      events.foreach(e => sessions = mergeEvent(sessions, e.ts.getTime))

    // seal every session no admissible future event (ts ≥ watermark) can
    // reach: its gap-extended end lies strictly before the watermark
    val wm = state.getCurrentWatermarkMs()
    val (sealedNow, stillOpen) = sessions.partition(_.last + GapMs < wm)
    if (stillOpen.isEmpty) state.remove()
    else {
      state.update(OpenSessions(stillOpen))
      // earliest possible seal point; clamped — Spark rejects a timeout
      // at/under the current watermark
      state.setTimeoutTimestamp(math.max(stillOpen.map(_.last).min + GapMs, wm + 1))
    }
    sealedNow.sortBy(_.start).map(close).iterator
  }

  /** events stream (user_id, ts, event_type) → closed-session stream. */
  def sessions(events: Dataset[Event]): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }

  /** Drive the sessionizer over a parquet events directory with
    * AvailableNow, writing closed sessions to `outPath`.
    */
  def run(spark: SparkSession, eventsPath: String, outPath: String,
          checkpoint: String): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"))
      .as[Event]
    val q = sessions(stream).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
