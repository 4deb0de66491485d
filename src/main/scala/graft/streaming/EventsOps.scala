package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Every transform here is written so the SAME code runs in batch
  * (`spark.read`) and in Structured Streaming (`spark.readStream`):
  * time-window aggregations use `window`/`session_window` (stream-legal,
  * no sort), and dedup keys are bounded in event-time. Streaming entry
  * points add the watermark; see `StreamingJobs`.
  */
object EventsOps {

  /** Tumbling-window aggregate (stream-safe: append output with a
    * watermark upstream).
    */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window aggregate — `window(ts, width, slide)` expands each
    * event into width/slide rows via the TimeWindow generator (an Expand,
    * not a shuffle-per-window).
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Session windows per user with a fixed inactivity gap. In batch this
    * compiles to a sort-based session assignment within each user
    * partition; in streaming it is state-store backed.
    */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))

  /** Event-time-bounded dedup: one row per (user, type, time bucket) —
    * the batch analog of `dropDuplicatesWithinWatermark`.
    */
  def bucketDedup(events: DataFrame, bucket: String): DataFrame =
    events
      .groupBy(window(col("ts"), bucket).as("w"), col("user_id"),
        col("event_type"))
      .agg(min("event_id").as("keep_event_id"), count(lit(1)).as("n_dups"))
      .select(col("user_id"), col("event_type"),
        col("w.start").as("bucket_start"), col("keep_event_id"),
        col("n_dups"))
}
