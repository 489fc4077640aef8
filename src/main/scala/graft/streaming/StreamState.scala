package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-stateful streaming: per-user activity BURSTS with a
  * cumulative payload, sealed by inactivity TIMEOUT with per-group
  * state eviction (VERDICT r11 #5 — the `flatMapGroupsWithState`
  * emission path driven by `state.hasTimedOut` + `state.remove()`,
  * which window+watermark aggregation cannot express: the output row
  * is produced by the ABSENCE of data, and the group's state must be
  * evicted exactly once the event-time timeout fires).
  *
  * A burst is a maximal run of a user's events where consecutive
  * (time-sorted) events are ≤ gap (45 min) apart — like a session, but
  * the sealed record carries running STATE the pure interval logic
  * never tracks: the exact value total in 1e-4 units (pre-snapped to
  * decimal so engines agree bit-wise), and the burst's last event type
  * under the total (ts, event_id) order — the "what was the user doing
  * when they went idle" snapshot.
  *
  * Determinism contract (what makes the DuckDB hash gate possible):
  * start/n/value are min/count/sum — commutative, arrival-order-free.
  * last_event_type is the argmax under (ts, event_id), a TOTAL order
  * (event_id is unique), so any admissible arrival order yields the
  * same snapshot. A burst is emitted only when the watermark passes
  * its gap-extended end (no admissible event can extend or bridge it),
  * and the state is REMOVED when a user's burst list drains — eviction
  * is observable as bounded state, exercised by SessionizeSpec-style
  * sentinel drains in the q_stream_state_parity gate.
  *
  * Scale: state per user is O(open bursts) ≤ (watermark delay / gap)+1
  * interval accumulators — never the events; the shuffle is one
  * user-keyed exchange, identical at 1000 executors.
  */
object StreamState {

  case class Event(user_id: Long, ts: Timestamp, event_type: String,
                   event_id: Long, value_q: Long)
  case class Burst(start: Long, last: Long, lastEventId: Long,
                   lastType: String, n: Long, valueQ: Long)
  case class Bursts(open: Seq[Burst])
  case class IdleBurst(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
                       n_events: Long, value_q: Long, last_event_type: String)

  val GapMs: Long = 45L * 60 * 1000

  /** Later-of under the total (last, lastEventId) order. */
  private def laterOf(a: (Long, Long, String), b: (Long, Long, String)) =
    if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a

  /** Merge one event into the open-burst set: it joins every burst whose
    * gap-extended interval covers it (possibly bridging two), or opens a
    * new one — the Sessionize interval rule, carrying the payload along.
    */
  private def mergeEvent(bursts: List[Burst], e: Event): List[Burst] = {
    val t = e.ts.getTime
    val (near, far) = bursts.partition(b => t >= b.start - GapMs && t <= b.last + GapMs)
    near.foldLeft(Burst(t, t, e.event_id, e.event_type, 1, e.value_q)) { (acc, b) =>
      val (lt, lid, lty) = laterOf((acc.last, acc.lastEventId, acc.lastType),
        (b.last, b.lastEventId, b.lastType))
      Burst(math.min(acc.start, b.start), lt, lid, lty,
        acc.n + b.n, acc.valueQ + b.valueQ)
    } :: far
  }

  private def updateState(userId: Long, events: Iterator[Event],
                          state: GroupState[Bursts]): Iterator[IdleBurst] = {
    def close(b: Burst) = IdleBurst(userId, new Timestamp(b.start),
      new Timestamp(b.last), b.n, b.valueQ, b.lastType)

    var bursts = state.getOption.map(_.open.toList).getOrElse(Nil)
    if (!state.hasTimedOut)
      events.foreach(e => bursts = mergeEvent(bursts, e))

    // seal every burst no admissible future event (ts ≥ watermark) can
    // reach; on the timeout path this is the ONLY source of output
    val wm = state.getCurrentWatermarkMs()
    val (sealedNow, stillOpen) = bursts.partition(_.last + GapMs < wm)
    if (stillOpen.isEmpty) state.remove() // eviction under test
    else {
      state.update(Bursts(stillOpen))
      state.setTimeoutTimestamp(math.max(stillOpen.map(_.last).min + GapMs, wm + 1))
    }
    sealedNow.sortBy(_.start).map(close).iterator
  }

  def idleBursts(events: Dataset[Event]): Dataset[IdleBurst] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateState)
  }

  /** Drain a parquet events directory (user_id, ts, event_type, event_id,
    * value_q) with AvailableNow, appending sealed bursts to `outPath`.
    */
  def run(spark: SparkSession, eventsPath: String, outPath: String,
          checkpoint: String): Unit = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_type").cast("string").as("event_type"),
        col("event_id").cast("long").as("event_id"),
        col("value_q").cast("long").as("value_q"))
      .as[Event]
    val q = idleBursts(stream).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
