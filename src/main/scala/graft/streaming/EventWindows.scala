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
}
