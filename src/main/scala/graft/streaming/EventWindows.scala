package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the events stream (SURVEY.md §2.9:
  * the reference has no event-time semantics, but the engine provides them
  * via Structured Streaming — the same expression tree runs batch or
  * streaming, which is how the batch oracle validates the streaming path).
  *
  * Scale notes: a tumbling-window count is a partial-aggregated shuffle on
  * (window, key); with a watermark the streaming state store evicts closed
  * windows, so state is bounded by (windows in the watermark horizon ×
  * keys), not by stream length.
  */
object EventWindows {

  /** Tumbling-window counts per event_type. Works on a batch OR streaming
    * frame with a `ts` timestamp column; output keys the window by its
    * epoch-second start for engine-neutral comparison.
    */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("w_start"), col("event_type"), col("n"))

  /** The streaming variant: same aggregation with a watermark so late data
    * beyond `lateness` is dropped and closed windows leave the state store.
    */
  def tumblingCountsStream(events: DataFrame, width: String = "1 hour",
                           lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("w_start"), col("event_type"), col("n"))

  /** Gap-based sessionization per user via Spark's native
    * `session_window`: consecutive events of a user belong to one session
    * while each gap stays within `gap` (the interval is closed: an event
    * arriving exactly `gap` after the last still merges). Output bounds are the
    * events' own epoch-micros extremes — engine-neutral, independent of
    * the padded window end — so a SQL oracle replays the semantics with
    * plain gaps-and-islands (lag + running sum of breaks).
    *
    * Scale: one partial-aggregated shuffle on user_id; Spark merges
    * per-user windows inside the aggregation, so no window sort pass and
    * no per-user skew beyond the user's own event count.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        unix_micros(min(col("ts"))).as("first_us"),
        unix_micros(max(col("ts"))).as("last_us"))
      .select(col("user_id"), col("first_us"), col("last_us"), col("n"))

  /** Streaming sessionization: the same session_window with a watermark —
    * a session closes (and leaves the state store) once the watermark
    * passes its end, which is how unbounded streams keep bounded state.
    */
  def sessionStatsStream(events: DataFrame, gap: String = "30 minutes",
                         lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        unix_micros(min(col("ts"))).as("first_us"),
        unix_micros(max(col("ts"))).as("last_us"))
      .select(col("user_id"), col("first_us"), col("last_us"), col("n"))
}
