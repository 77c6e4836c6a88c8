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

  /** Stream-stream temporal join — attribute each purchase to every
    * click of the same user within the preceding `horizon`: Spark's
    * native watermarked stream-stream inner join with a time-range
    * condition, the only join shape that survives two INFINITE inputs.
    * The range bound is what lets Spark derive state retention on both
    * sides (a buffered click is droppable once the purchase watermark
    * has passed click-ts + horizon; a buffered purchase once the click
    * watermark has passed its ts), so state is bounded by watermark ×
    * horizon, not by stream length. Inputs: (user_id, event_id, ts)
    * frames — streaming or batch; on batch frames the same plan runs as
    * the declarative join, which is the spec's cross-check.
    * Output: (user_id, purchase_id, click_id, p_ts, c_ts).
    */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame,
                       horizon: String = "1 hour",
                       lateness: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), col("p_ts"), col("c_ts"))
  }
}
