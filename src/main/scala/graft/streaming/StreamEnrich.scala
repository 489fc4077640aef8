package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-STATIC dimension enrichment + watermarked tumbling-window
  * rollup — the remaining canonical streaming join shape after the
  * quartet (dedup / sessionize / stream-stream join / top-k): a
  * bounded dimension table joined onto an unbounded stream, then
  * aggregated per closed event-time window.
  *
  * Semantics pinned here:
  *  - the static side is re-resolvable per micro-batch (Spark re-plans
  *    the batch side each trigger — the dim-refresh property a live
  *    deployment relies on), and the join needs NO state: only the
  *    windowed aggregate is stateful, bounded by the watermark horizon.
  *  - INNER join semantics drop stream rows with no dim match — which
  *    this harness exploits: far-future sentinel events carry a user
  *    absent from the dim, so they advance the watermark (closing every
  *    real window for append-mode emission) without ever reaching the
  *    sink.
  *
  * Scale: the dim broadcasts when it fits (cohort dims, config tables)
  * and degrades to a shuffled join when it doesn't — the plan is
  * Catalyst's choice per micro-batch, exactly as in batch; aggregate
  * state is one row per (open window × cohort).
  */
object StreamEnrich {

  /** Drain `eventsDir` (parquet stream of (event_id, ts, user_id, ...)),
    * inner-join the static `dim` on user_id, and append the per-(day
    * window, cohort) counts closed by the watermark to `outDir`.
    * Blocks until the AvailableNow drain finishes.
    */
  def run(spark: SparkSession, eventsDir: String, dim: DataFrame,
          outDir: String, ckptDir: String,
          watermarkDelay: String = "1 hour"): Unit = {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withWatermark("ts", watermarkDelay)
    val agg = stream
      .join(dim, Seq("user_id"))
      .groupBy(window(col("ts"), "1 day"), col("cohort"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("u_events")).as("sum_u_events"))
      .select(col("window.start").as("day_start"), col("cohort"),
        col("n_events"), col("sum_u_events"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
