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

  /** One event on a user's funnel journey (input row shape). */
  case class FunnelEvent(user_id: Long, event_type: String,
                         ts: java.sql.Timestamp)

  /** Per-user funnel machine state: first view, first click at-or-after
    * it, and whether the funnel already completed (so a second purchase
    * can't emit twice).
    */
  case class FunnelState(vSec: Long, cSec: Option[Long], done: Boolean)

  /** An emitted funnel: completed on the purchase that closes it, or
    * abandoned when the user's state times out `horizonSec` of event
    * time after their last relevant event.
    */
  case class FunnelOut(user_id: Long, v_sec: Long, c_sec: Option[Long],
                       p_sec: Option[Long], stage: Long, completed: Boolean)

  /** The q129 conversion funnel as a LIVE state machine —
    * `flatMapGroupsWithState` with an EVENT-TIME TIMEOUT, the state
    * shape a never-ending funnel needs: per-user state is created by the
    * first view, advanced by the first at-or-after click and purchase,
    * and — crucially for an infinite stream — EXPIRED by the watermark
    * once a user has been idle `horizonSec` past their last relevant
    * event, emitting the abandoned funnel (stage 1 or 2) on the way out.
    * State is therefore bounded by (active users within the horizon) ×
    * a 3-field record, independent of stream length; without the
    * timeout, every user who ever viewed would be state forever.
    *
    * Semantics contract (spec-pinned): on per-user event-time-ordered
    * arrival the completed funnels are EXACTLY the batch q129 rows —
    * each batch's events are sorted by event time inside the handler, so
    * intra-batch disorder is repaired, while an event arriving batches
    * late (out of order ACROSS batches) is folded in arrival order, the
    * same greedy-admission stance as the streaming dedup family. When
    * exactness under ANY arrival order within the lateness bound matters
    * more than immediate emission, use [[funnelStreamBuffered]].
    *
    * Input must carry (user_id LONG, event_type STRING, ts TIMESTAMP);
    * `lateness` is the watermark bound that drives the timeout clock.
    */
  def funnelStream(events: DataFrame, horizonSec: Long = 86400L,
                   lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    def handle(userId: Long, it: Iterator[FunnelEvent],
               state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        if (s.done) Iterator.empty
        else Iterator.single(FunnelOut(userId, s.vSec, s.cSec, None,
          1L + s.cSec.size, completed = false))
      } else {
        var s = state.getOption.orNull
        var out = List.empty[FunnelOut]
        var lastSec = Long.MinValue
        it.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val sec = e.ts.getTime / 1000L
          lastSec = math.max(lastSec, sec)
          e.event_type match {
            case "view" if s == null =>
              s = FunnelState(sec, None, done = false)
            case "click" if s != null && !s.done && s.cSec.isEmpty &&
                sec >= s.vSec =>
              s = s.copy(cSec = Some(sec))
            case "purchase" if s != null && !s.done && s.cSec.exists(sec >= _) =>
              out ::= FunnelOut(userId, s.vSec, s.cSec, Some(sec), 3L,
                completed = true)
              s = s.copy(done = true)
            case _ => ()
          }
        }
        if (s != null) {
          state.update(s)
          // idle expiry: horizon past the user's last event (any
          // activity defers it), advanced by the event-time watermark;
          // clamped above the current watermark — a target at or below
          // it is rejected by the API
          if (lastSec != Long.MinValue)
            state.setTimeoutTimestamp(math.max((lastSec + horizonSec) * 1000L,
              state.getCurrentWatermarkMs + 1))
        }
        out.reverseIterator
      }
    }
    events.withWatermark("ts", lateness)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(handle)
      .toDF()
  }

  /** Per-user state of the BUFFERED funnel machine: the [[FunnelState]]
    * fields (guarded by `started`), the idle clock, and the
    * not-yet-foldable event buffer (parallel seqs — product encoders
    * handle them natively).
    */
  case class BufferedFunnelState(started: Boolean, vSec: Long,
                                 cSec: Option[Long], done: Boolean,
                                 lastSec: Long, bufSecs: Seq[Long],
                                 bufTypes: Seq[String])

  /** [[funnelStream]] with BUFFER-UNTIL-WATERMARK folding: events are
    * held in GroupState until the event-time watermark passes them, then
    * folded into the machine in EVENT-TIME order (ties at one instant
    * fold view → click → purchase, matching the batch funnel's `>=`
    * chain) — so streamed completions equal the batch q129 rows under
    * ANY arrival order within the lateness bound, including events that
    * arrive whole micro-batches out of order. This closes the one gap
    * the greedy variant documents: its cross-batch folding is
    * admission-order, trading exactness for immediate emission.
    *
    * The price is bounded and explicit: per-user state adds the buffer
    * of events newer than the watermark (≤ lateness × the user's event
    * rate — watermark-bounded, never stream-length-bounded), and every
    * emission is delayed by up to the lateness bound (a completion
    * emits once the watermark passes its purchase). Folding wakes on
    * event arrival or on an event-time timeout armed at the earliest
    * buffered event (so a quiet user's buffer still folds as the
    * watermark advances past it); the same timeout clock drives idle
    * expiry `horizonSec` past the user's last event, emitting the
    * abandoned funnel exactly like the greedy variant.
    *
    * Folding strictly BELOW the watermark is what makes the fold safe:
    * Spark drops rows older than the watermark before the stateful
    * operator, so no future delivery can ever sort before a folded
    * event.
    */
  def funnelStreamBuffered(events: DataFrame, horizonSec: Long = 86400L,
                           lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    def rank(t: String): Int = t match {
      case "view" => 0
      case "click" => 1
      case "purchase" => 2
      case _ => 3
    }
    def handle(userId: Long, it: Iterator[FunnelEvent],
               state: GroupState[BufferedFunnelState])
        : Iterator[FunnelOut] = {
      val prev = state.getOption.getOrElse(
        BufferedFunnelState(started = false, 0L, None, done = false,
          Long.MinValue, Nil, Nil))
      val incoming = it.map(e => (e.ts.getTime / 1000L, e.event_type)).toSeq
      val buffer = prev.bufSecs.zip(prev.bufTypes) ++ incoming
      val wmMs = state.getCurrentWatermarkMs
      val (ready, pending) = buffer.partition(_._1 * 1000L < wmMs)

      var started = prev.started
      var vSec = prev.vSec
      var cSec = prev.cSec
      var done = prev.done
      var out = List.empty[FunnelOut]
      ready.sortBy { case (sec, t) => (sec, rank(t)) }.foreach {
        case (sec, t) => t match {
          case "view" if !started =>
            started = true; vSec = sec; cSec = None; done = false
          case "click" if started && !done && cSec.isEmpty && sec >= vSec =>
            cSec = Some(sec)
          case "purchase" if started && !done && cSec.exists(sec >= _) =>
            out ::= FunnelOut(userId, vSec, cSec, Some(sec), 3L,
              completed = true)
            done = true
          case _ => ()
        }
      }
      val lastSec = (prev.lastSec +: buffer.map(_._1)).max
      val expired = pending.isEmpty && lastSec != Long.MinValue &&
        wmMs >= (lastSec + horizonSec) * 1000L

      if (pending.isEmpty && (!started || expired)) {
        // nothing buffered and either no funnel ever started (orphan
        // steps) or the user idled past the horizon — emit the
        // abandonment if one is owed and drop the state
        if (state.exists) state.remove()
        if (started && !done && expired)
          out ::= FunnelOut(userId, vSec, cSec, None, 1L + cSec.size,
            completed = false)
        out.reverseIterator
      } else {
        state.update(BufferedFunnelState(started, vSec, cSec, done,
          lastSec, pending.map(_._1), pending.map(_._2)))
        // wake when the watermark passes the earliest buffered event, or
        // at idle expiry — whichever comes first; clamped above the
        // current watermark (the API rejects targets at or below it)
        val wake = (pending.map(_._1 * 1000L + 1) :+
          (lastSec + horizonSec) * 1000L).min
        state.setTimeoutTimestamp(math.max(wake, wmMs + 1))
        out.reverseIterator
      }
    }
    events.withWatermark("ts", lateness)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(handle)
      .toDF()
  }
}
