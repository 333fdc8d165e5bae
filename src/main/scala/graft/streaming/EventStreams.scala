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

  /** Stream-stream INTERVAL join: attribute each click to every view by the
    * same user in the preceding hour. The time-bound condition is what
    * makes this runnable as a streaming join — it lets the engine expire
    * view-side state once the click-side watermark passes `view.ts + 1h`,
    * so state is bounded regardless of stream length. The same code path
    * is batch-testable (the join is just a join on a batch frame).
    *
    * Inputs are pre-split event streams; on the streaming path both must
    * carry `.withWatermark("ts", …)` before calling.
    */
  /** Stream–static enrichment join — the commonest production streaming
    * join: each micro-batch joins against a STATIC (or slowly refreshed)
    * dimension; Spark broadcasts the dimension per batch, so the stream
    * side never shuffles and no join state accumulates (unlike
    * stream–stream, there is nothing to watermark — the static side is
    * complete by definition).
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  def attributedClicks(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
      col("user_id").as("v_user"), col("ts").as("view_ts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("click_ts"))
    v.join(c,
        col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("delay_us"))
  }

  /** Cross-batch exact dedup with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a key's dedup state only until
    * the watermark passes its event time + the allowed lateness, unlike
    * `dropDuplicates` whose streaming state grows forever. The streaming
    * twin of batch q22 for the ingest front door (at-least-once sources
    * re-deliver; this de-dups them with O(watermark-window) state).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark(Seq("event_id"))
}
