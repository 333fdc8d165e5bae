package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming analytics over the `events` stream — the streaming forms of
  * the batch queries q20 (tumbling hourly aggregate) and q21
  * (sessionization). Written against plain DataFrames so the SAME code runs
  * on a batch frame (tested against the batch oracle) and on a
  * `readStream` frame (tested with a file/memory source in
  * StreamingSpec) — the Structured Streaming unification the engine gets
  * for free by declaring transformations instead of scheduling them.
  *
  * Watermarking: 1 hour of allowed lateness bounds state for the tumbling
  * window; session state is bounded by the 30-minute gap timeout. At scale,
  * state lives in the checkpointed state store, keyed by (window,
  * event_type) / (user, session) — no unbounded driver state.
  */
object EventStreams {

  /** Tumbling hourly counts/sums per event type. On a streaming input, call
    * after `.withWatermark("ts", "1 hour")`.
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based session windows (30 min) per user — streaming-native
    * `session_window`, the stateful counterpart of batch q21.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
