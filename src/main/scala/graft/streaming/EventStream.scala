package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation — the Structured Streaming shape the
  * batch event queries (q45-q47) compute at rest: never-ending event feeds
  * need bounded state, and the watermark is Spark's contract for it (state
  * for a window is dropped once the watermark passes its end; rows later
  * than the watermark are dropped, counted by the
  * `numRowsDroppedByWatermark` metric).
  *
  * Append output mode is deliberate: each window row is emitted exactly
  * once, AFTER the watermark closes it — the right semantics for a
  * downstream file sink or exactly-once ETL handoff (update mode would
  * re-emit a window per refinement and demands an upsert-capable sink).
  */
object EventStream {

  /** Tumbling event-time windows per event type with a lateness bound:
    * (window_start, window_end, event_type, n, total). The input must
    * carry a TIMESTAMP `tsCol`; `total` accumulates as DECIMAL(18,6) so
    * window totals are exact (the q45 `exactSum` discipline — double
    * summation would be arrival-order-dependent).
    */
  def windowedEventStats(events: DataFrame, tsCol: String = "ts",
                         windowLength: String = "1 hour",
                         lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))

  /** The batch twin on the same frame (no watermark — batch data is
    * complete by definition): what the stream's emitted windows must match
    * once closed. Spec hook and backfill path.
    */
  def windowedEventStatsBatch(events: DataFrame, tsCol: String = "ts",
                              windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total"))
}
