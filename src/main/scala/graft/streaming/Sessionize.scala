package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: per-user custom state via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * batch windows can't express incrementally.
  *
  * State per user is O(1) (open-session accumulator, not the events),
  * and event-time timeout closes sessions when the watermark passes
  * gap minutes beyond the last seen event — so state is bounded no
  * matter how long the stream runs. Emits one row per closed session.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class OpenSession(start: Long, last: Long, nEvents: Long, nTypesApprox: Long)
  case class ClosedSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                           n_events: Long, duration_sec: Long)

  val GapMs: Long = 30L * 60 * 1000

  private def updateState(userId: Long, events: Iterator[Event],
                          state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    def close(s: OpenSession) = ClosedSession(userId, new Timestamp(s.start),
      new Timestamp(s.last), s.nEvents, (s.last - s.start) / 1000)

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[ClosedSession]
    var open = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t < s.start - GapMs =>
          // a late event more than a gap BEFORE the open session cannot
          // belong to it — the batch twin (sorted events) would split
          // there. Its own predecessors were already emitted, so it
          // closes immediately as a single-event session.
          closed ::= ClosedSession(userId, new Timestamp(t), new Timestamp(t), 1, 0)
        case Some(s) if t - s.last <= GapMs =>
          // out-of-order events within the gap (t < s.last, admitted by
          // the watermark) merge — extend BOTH ends so start/duration
          // agree with the batch-window twin's gap rule
          open = Some(s.copy(start = math.min(s.start, t),
            last = math.max(s.last, t), nEvents = s.nEvents + 1))
        case Some(s) =>
          closed ::= close(s)
          open = Some(OpenSession(t, t, 1, 1))
        case None =>
          open = Some(OpenSession(t, t, 1, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last + GapMs)
    }
    closed.reverseIterator
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
