package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the per-user activity-session cut of an
  * event stream, computed ONLINE: a session closes (and is emitted,
  * exactly once, in append mode) when the event-time watermark passes its
  * end plus the inactivity gap.
  *
  * Spark-first: this is the native `session_window` aggregation under
  * watermarking — no custom state. Spark maintains per-(user, open
  * window) state, MERGES touching windows (an event exactly `gap` after
  * the previous EXTENDS the session — same boundary rule the batch
  * `q_session_native` pins against the gaps-and-islands twin, which
  * splits strictly on `diff > gap`), and drops state once the watermark
  * closes a window. State is O(open sessions), not O(history): exactly
  * what survives a 100 TB/day event firehose, with the watermark delay —
  * not corpus size — bounding both state and emission latency.
  *
  * Output (append mode only): one row per CLOSED session —
  * `(user_id, session_start, session_end, n_events)`, epoch-second
  * bounds. Sessions still open when a stream stops are NOT emitted;
  * they re-open from state on restart (checkpointed) — the batch
  * sessionizer owns retrospective cuts of bounded data.
  */
object StreamingSessionize {

  /** @param events        streaming DataFrame with `user_id` and an
    *                      event-time TIMESTAMP column `ts`
    * @param gap           inactivity gap, e.g. "30 minutes"
    * @param watermarkDelay max tolerated event-time disorder; also the
    *                      lag between a session going quiet and its row
    *                      being emitted
    */
  def sessions(events: DataFrame, gap: String,
               watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"))
}
