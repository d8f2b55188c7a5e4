package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2.9 Structured Streaming wrappers (T1–T5). The reference is
  * batch-only; these give its aggregation semantics a streaming form.
  *
  * Each transform takes ANY events-shaped frame (`ts timestamp, user_id
  * long, event_type string, event_id long, value double`) — static or
  * streaming — and returns the transformed frame. On a streaming input
  * the same expressions run incrementally with watermark-bounded state;
  * on a static input they equal the batch analogs in
  * `graft.ops.StreamQueries`, which is exactly how they're tested
  * (StreamingSpec runs both through MemoryStream and compares).
  *
  * Scale notes: state is keyed by (window, event_type) / (user, session) —
  * partitioned by key across executors; the watermark bounds state size,
  * which is what makes 100 TB/day streams feasible.
  */
object StreamRunner {

  /** T1+T4: watermarked tumbling-window counts. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"))

  /** T2: sliding-window counts (1 hour every 30 minutes). */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("cnt"))

  /** T3: session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** T5: watermarked stateful dedup on event_id. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates("event_id")
}
