package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Drift
import QueryUtil._
import Tables._

/** Event-stream queries (batch equivalents of the streaming operators in
  * graft.streaming — Structured Streaming runs the same logical plans with
  * a file source; the streaming path itself is covered by ScalaTest).
  *
  * The driver's `events.ts` is TIMESTAMP(NANOS), which Spark's Parquet
  * reader only supports as a raw long (`spark.sql.legacy.parquet
  * .nanosAsLong`); all second-grain arithmetic uses exact integer `DIV`
  * (never ns→double, which loses precision at 2^63 magnitudes).
  */
object EventQueries {

  /** Read `events` with ts as LONG nanoseconds since the epoch.
    *
    * Driver data generations have shipped `events.ts` both as
    * TIMESTAMP(NANOS) (which Spark's Parquet reader only supports as a
    * raw long, via the legacy conf) and as plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Normalize both to the long-nanos contract here so
    * the integer second-grain arithmetic below is generation-independent;
    * the session timezone is UTC everywhere (Verify/Bench/SparkSpec), so
    * the NTZ→epoch cast is the identity wall-clock mapping DuckDB's
    * `date_diff('second', TIMESTAMP '1970-01-01', ts)` applies.
    */
  /** State-dir key for persisted-store queries: path + source-parquet
    * mtime, so regenerated test data auto-invalidates (the q142/q149
    * convention).
    */
  private def dataStamp(dir: String, tables: String*): String =
    (dir.replaceAll("[^A-Za-z0-9]", "_") +: tables.map(t =>
      (graft.sources.Bundle.mtimeMillis(s"$dir/$t.parquet") / 1000).toString))
      .mkString("_")

  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  private def tsSec = expr("ts DIV 1000000000")

  val defs: Seq[QueryDef] = Seq(

    // Tumbling event-time window (hourly) per event type.
    QueryDef("q45_t_tumbling_hourly",
      (s, dir) => {
        val hourSec = tsSec - pmod(tsSec, lit(3600L))
        events(s, dir)
          .groupBy(
            date_format(timestamp_seconds(hourSec), "yyyy-MM-dd HH:mm").as("hour"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), r2(exactSum(col("value"))).as("total"))
          .orderBy("hour", "event_type")
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |       event_type, count(*) AS n,
        |       round(sum(value::DECIMAL(18,6))::DOUBLE, 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Gap-based sessionization (30-min inactivity) per user.
    QueryDef("q46_t_sessionize",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gap = tsSec - lag(tsSec, 1).over(w)
        events(s, dir)
          .withColumn("new_session",
            when(gap.isNull || gap > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"))
          .agg(max(col("session_id")).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH sess AS (
        |  SELECT user_id,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (SELECT user_id, ts, event_id,
        |          date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
        |          - lag(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts))
        |            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |        FROM events))
        |SELECT user_id, max(session_id)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Per-type stats with an exact percentile.
    QueryDef("q47_t_event_stats",
      (s, dir) =>
        events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            r6(exactSum(col("value")) / count(lit(1))).as("avg_v"),
            r4(expr("percentile(value, 0.95)")).as("p95"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
        |       round(sum(value::DECIMAL(18,6))::DOUBLE / count(*), 6) AS avg_v,
        |       round(quantile_cont(value, 0.95), 4) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Bucketized range join (RangeJoin.pointInInterval): attribute every
    // event to the 10-minute incident window each error event of the
    // same user opens — the interval-join shape (point BETWEEN start
    // AND end) Spark would otherwise plan as a nested-loop scan. The
    // bucket rewrite keeps it a shuffle equi-join on (user_id, bucket);
    // PlanSpec pins the plan free of BroadcastNestedLoopJoin/cartesian.
    // The oracle states the range join declaratively and DuckDB's IEJoin
    // evaluates it — both engines must produce the identical pair set.
    QueryDef("q120_range_join_incidents",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("sec"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("window_id"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        graft.operators.RangeJoin.pointInInterval(
            ev, windows, "sec", "w_start", "w_end", Seq("user_id"),
            bucketWidth = 600L)
          .select(col("window_id"), col("event_id"), col("user_id"),
            col("event_type"), (col("sec") - col("w_start")).as("offset_sec"))
          .orderBy("window_id", "event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT w.window_id, e.event_id, e.user_id, e.event_type,
        |  (e.sec - w.w_start)::BIGINT AS offset_sec
        |FROM ev e JOIN w ON w.user_id = e.user_id
        |  AND e.sec >= w.w_start AND e.sec < w.w_end
        |ORDER BY w.window_id, e.event_id""".stripMargin)),

    // Interval-overlap join (RangeJoin.intervalOverlap): which user
    // sessions (q46's 30-min-gap spans) overlap an incident window? The
    // interval×interval shape; both sides bucketize and the join keeps
    // exactly the overlap's first bucket, so no pair is emitted twice
    // and no distinct shuffle runs. Output: per overlapping
    // (session, window) pair, the overlap length in seconds.
    QueryDef("q121_session_incident_overlap",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gap = tsSec - lag(tsSec, 1).over(w)
        val sessions = ev
          .withColumn("new_session",
            when(gap.isNull || gap > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("sec")).as("s_start"),
            (max(col("sec")) + 1L).as("s_end"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("window_id"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        graft.operators.RangeJoin.intervalOverlap(
            sessions, windows, "s_start", "s_end", "w_start", "w_end",
            Seq("user_id"), bucketWidth = 3600L)
          .select(col("user_id"), col("session_id"), col("window_id"),
            (least(col("s_end"), col("w_end")) -
              greatest(col("s_start"), col("w_start"))).as("overlap_sec"))
          .orderBy("user_id", "session_id", "window_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    ts
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, sec,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (SELECT user_id, event_id, sec, ts,
        |          sec - lag(sec) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS gap
        |        FROM ev)),
        |sessions AS (
        |  SELECT user_id, session_id, min(sec) AS s_start,
        |    max(sec) + 1 AS s_end
        |  FROM marked GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id::BIGINT AS session_id, w.window_id,
        |  (least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start))::BIGINT
        |    AS overlap_sec
        |FROM sessions s JOIN w ON w.user_id = s.user_id
        |  AND s.s_start < w.w_end AND w.w_start < s.s_end
        |ORDER BY s.user_id, s.session_id, w.window_id""".stripMargin)),

    // Backward as-of join (RangeJoin.asofBackward, the union-and-window
    // one-shuffle formulation): each purchase picks up the user's most
    // recent prior-or-same click within an hour. The right side
    // pre-aggregates to unique (user, sec) — a tie would make "the"
    // as-of row order-dependent on ANY engine. The oracle is DuckDB's
    // native ASOF LEFT JOIN with the tolerance applied on top — two
    // completely different evaluation strategies, identical rows.
    QueryDef("q122_asof_click_attribution",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("sec"))
          .agg(max(col("event_id")).as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("sec"))
        graft.operators.RangeJoin.asofBackward(
            purchases, clicks, "sec", Seq("user_id"), Seq("click_id"),
            tolerance = Some(3600L))
          .select(col("event_id"), col("user_id"), col("sec"),
            col("click_id"), col("asof_ts"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, sec, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, sec FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.sec,
        |  CASE WHEN c.sec IS NOT NULL AND p.sec - c.sec <= 3600
        |       THEN c.click_id END AS click_id,
        |  CASE WHEN c.sec IS NOT NULL AND p.sec - c.sec <= 3600
        |       THEN c.sec END AS asof_ts
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.sec >= c.sec
        |ORDER BY p.event_id""".stripMargin)),

    // Forward as-of join (RangeJoin.asofForward): each purchase picks up
    // the user's EARLIEST at-or-after click within an hour ("the
    // follow-up click") — the mirror of q122, same union-and-window
    // one-shuffle shape with a following frame. The oracle is DuckDB's
    // native forward ASOF (p.sec <= c.sec) with the tolerance applied on
    // top — two different evaluation strategies, identical rows.
    QueryDef("q145_asof_forward",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("sec"))
          .agg(max(col("event_id")).as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("sec"))
        graft.operators.RangeJoin.asofForward(
            purchases, clicks, "sec", Seq("user_id"), Seq("click_id"),
            tolerance = Some(3600L))
          .select(col("event_id"), col("user_id"), col("sec"),
            col("click_id"), col("asof_ts"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, sec, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, sec FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.sec,
        |  CASE WHEN c.sec IS NOT NULL AND c.sec - p.sec <= 3600
        |       THEN c.click_id END AS click_id,
        |  CASE WHEN c.sec IS NOT NULL AND c.sec - p.sec <= 3600
        |       THEN c.sec END AS asof_ts
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.sec <= c.sec
        |ORDER BY p.event_id""".stripMargin)),

    // Nearest as-of join (RangeJoin.asofNearest): each purchase picks the
    // click with the smaller |gap| of the backward and forward arms, ties
    // going backward, each arm independently bounded by the hour
    // tolerance — still ONE shuffle (both arms are frames over the same
    // sort). The oracle states both candidate arms as correlated min/max
    // subqueries, replays the pick rule declaratively, and joins the
    // chosen instant back for the payload.
    QueryDef("q146_asof_nearest",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("sec"))
          .agg(max(col("event_id")).as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("sec"))
        graft.operators.RangeJoin.asofNearest(
            purchases, clicks, "sec", Seq("user_id"), Seq("click_id"),
            tolerance = Some(3600L))
          .select(col("event_id"), col("user_id"), col("sec"),
            col("click_id"), col("asof_ts"), col("asof_dir"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, sec, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, sec FROM ev
        |      WHERE event_type = 'purchase'),
        |arms AS (
        |  SELECT p.event_id, p.user_id, p.sec,
        |    (SELECT max(c.sec) FROM clicks c
        |     WHERE c.user_id = p.user_id AND c.sec <= p.sec) AS b_sec,
        |    (SELECT min(c.sec) FROM clicks c
        |     WHERE c.user_id = p.user_id AND c.sec >= p.sec) AS f_sec
        |  FROM p),
        |chosen AS (
        |  SELECT event_id, user_id, sec,
        |    CASE
        |      WHEN b_sec IS NOT NULL AND sec - b_sec <= 3600
        |           AND (f_sec IS NULL OR f_sec - sec > 3600
        |                OR sec - b_sec <= f_sec - sec)
        |        THEN b_sec
        |      WHEN f_sec IS NOT NULL AND f_sec - sec <= 3600
        |        THEN f_sec
        |    END AS asof_ts,
        |    CASE
        |      WHEN b_sec IS NOT NULL AND sec - b_sec <= 3600
        |           AND (f_sec IS NULL OR f_sec - sec > 3600
        |                OR sec - b_sec <= f_sec - sec)
        |        THEN 'backward'
        |      WHEN f_sec IS NOT NULL AND f_sec - sec <= 3600
        |        THEN 'forward'
        |    END AS asof_dir
        |  FROM arms)
        |SELECT ch.event_id, ch.user_id, ch.sec, c.click_id, ch.asof_ts,
        |  ch.asof_dir
        |FROM chosen ch LEFT JOIN clicks c
        |  ON c.user_id = ch.user_id AND c.sec = ch.asof_ts
        |ORDER BY ch.event_id""".stripMargin)),

    // q120's range join stated declaratively on TIMESTAMP columns — the
    // type a user actually stores — under the extended rule: timestamps
    // bucket at second grain through the monotone long cast, the
    // original predicate stays as the exact residual, and the pair set
    // equals the sec-grain join exactly (whole-second fixture, so q120's
    // oracle applies verbatim; the sub-second residual case is
    // spec-pinned).
    QueryDef("q150_range_join_timestamp",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
          .withColumn("ts_t", timestamp_seconds(col("sec")))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("sec"), col("ts_t"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("sec").as("w_start"), col("ts_t").as("w_start_t"),
            timestamp_seconds(col("sec") + 600L).as("w_end_t"))
        s.conf.set(graft.plans.RangeJoinRewriteRule.WidthConf, "600")
        try ev.join(windows,
            col("user_id") === col("w_user") &&
              col("ts_t") >= col("w_start_t") &&
              col("ts_t") < col("w_end_t"))
          .select(col("window_id"), col("event_id"), col("user_id"),
            col("event_type"), (col("sec") - col("w_start")).as("offset_sec"))
          .orderBy("window_id", "event_id")
          .localCheckpoint(true)
        finally s.conf.unset(graft.plans.RangeJoinRewriteRule.WidthConf)
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT w.window_id, e.event_id, e.user_id, e.event_type,
        |  (e.sec - w.w_start)::BIGINT AS offset_sec
        |FROM ev e JOIN w ON w.user_id = e.user_id
        |  AND e.sec >= w.w_start AND e.sec < w.w_end
        |ORDER BY w.window_id, e.event_id""".stripMargin)),

    // q120's range join on DOUBLE columns — the reference's native delay
    // type (float seconds, trx id9.py:49-56) — stated declaratively with
    // NO bucket-width conf set: the rule must fire width-FREE, deriving
    // the width from the interval side itself (the windows frame is
    // lineage-truncated so its bounds are genuinely stored columns — the
    // planning-time percentile sampling path, not the static
    // literal-shift shortcut), and produce q120's pair set exactly
    // (whole-second values, so the double arithmetic is exact and
    // q120's oracle applies verbatim).
    QueryDef("q151_range_join_double_auto",
      (s, dir) => {
        val ev = events(s, dir).withColumn("secd", tsSec.cast("double"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("secd"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("secd").as("w_start"), (col("secd") + 600.0).as("w_end"))
          .localCheckpoint(true)
        ev.join(windows,
            col("user_id") === col("w_user") &&
              col("secd") >= col("w_start") && col("secd") < col("w_end"))
          .select(col("window_id"), col("event_id"), col("user_id"),
            col("event_type"),
            (col("secd") - col("w_start")).cast("long").as("offset_sec"))
          .orderBy("window_id", "event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT w.window_id, e.event_id, e.user_id, e.event_type,
        |  (e.sec - w.w_start)::BIGINT AS offset_sec
        |FROM ev e JOIN w ON w.user_id = e.user_id
        |  AND e.sec >= w.w_start AND e.sec < w.w_end
        |ORDER BY w.window_id, e.event_id""".stripMargin)),

    // The range join on DATE columns, width-free: purchases open a
    // 7-day date window per user and every same-user event whose DATE
    // falls inside joins. Completes the rewrite's bucketable type
    // matrix (long/int/timestamp/double/date): DateType coarsens at
    // epoch-day grain via UnixDate, the auto path samples the 7-day
    // interval length from the lineage-truncated window side, and the
    // original predicate stays the exact residual. Oracle states the
    // same join in DuckDB date arithmetic.
    QueryDef("q160_range_join_date",
      (s, dir) => {
        val ev = events(s, dir)
          .withColumn("d", to_date(timestamp_seconds(tsSec)))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("d"))
        val windows = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("d").as("d_start"), date_add(col("d"), 7).as("d_end"))
          .localCheckpoint(true)
        ev.join(windows,
            col("user_id") === col("w_user") &&
              col("d") >= col("d_start") && col("d") < col("d_end"))
          .select(col("window_id"), col("event_id"), col("user_id"),
            col("event_type"),
            datediff(col("d"), col("d_start")).cast("long")
              .as("offset_days"))
          .orderBy("window_id", "event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type, ts::DATE AS d
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, d AS d_start,
        |    d + 7 AS d_end
        |  FROM ev WHERE event_type = 'purchase')
        |SELECT w.window_id, e.event_id, e.user_id, e.event_type,
        |  date_diff('day', w.d_start, e.d)::BIGINT AS offset_days
        |FROM ev e JOIN w ON w.user_id = e.user_id
        |  AND e.d >= w.d_start AND e.d < w.d_end
        |ORDER BY w.window_id, e.event_id""".stripMargin)),

    // q122's backward as-of join STATED DECLARATIVELY — a plain
    // left-outer join whose condition carries the `asof_backward`
    // marker function (the warehouse ASOF JOIN syntax) — executed under
    // the injected AsofJoinRewriteRule: the rule must rewrite it to the
    // union-and-window plan (no join operator at all; PlanSpec pins it)
    // and DuckDB's NATIVE `ASOF LEFT JOIN` is the oracle — two engines,
    // two syntaxes, identical rows.
    QueryDef("q152_asof_declarative",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("sec"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id").as("c_user"), col("sec").as("c_sec"),
            col("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("sec"))
        purchases.join(clicks,
            col("user_id") === col("c_user") &&
              expr("asof_backward(sec, c_sec)"), "left_outer")
          .select(col("event_id"), col("user_id"), col("sec"),
            col("click_id"), col("c_sec").as("asof_sec"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, sec, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, sec FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.sec, c.click_id,
        |  c.sec AS asof_sec
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.sec >= c.sec
        |ORDER BY p.event_id""".stripMargin)),

    // q146's NEAREST as-of stated declaratively (the `asof_nearest`
    // marker — no warehouse has native syntax for it, so the oracle is
    // q146's correlated-min/max arm selection, tolerance-free): smaller
    // |gap| wins, ties go backward. Same join-free union-window shape.
    QueryDef("q156_asof_nearest_declarative",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("sec"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id").as("c_user"), col("sec").as("c_sec"),
            col("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("sec"))
        purchases.join(clicks,
            col("user_id") === col("c_user") &&
              expr("asof_nearest(sec, c_sec)"), "left_outer")
          .select(col("event_id"), col("user_id"), col("sec"),
            col("click_id"), col("c_sec").as("asof_sec"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, sec, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, sec FROM ev
        |      WHERE event_type = 'purchase'),
        |arms AS (
        |  SELECT p.event_id, p.user_id, p.sec,
        |    (SELECT max(c.sec) FROM clicks c
        |     WHERE c.user_id = p.user_id AND c.sec <= p.sec) AS b_sec,
        |    (SELECT min(c.sec) FROM clicks c
        |     WHERE c.user_id = p.user_id AND c.sec >= p.sec) AS f_sec
        |  FROM p),
        |chosen AS (
        |  SELECT event_id, user_id, sec,
        |    CASE
        |      WHEN b_sec IS NOT NULL
        |           AND (f_sec IS NULL OR sec - b_sec <= f_sec - sec)
        |        THEN b_sec
        |      ELSE f_sec
        |    END AS asof_sec
        |  FROM arms)
        |SELECT ch.event_id, ch.user_id, ch.sec, c.click_id, ch.asof_sec
        |FROM chosen ch LEFT JOIN clicks c
        |  ON c.user_id = ch.user_id AND c.sec = ch.asof_sec
        |ORDER BY ch.event_id""".stripMargin)),

    // q122 VERBATIM, stated declaratively with the marker's literal
    // tolerance argument — `asof_backward(sec, c_sec, 3600)` — so the
    // tolerance parameterizes the rewrite itself (out-of-window matches
    // null out whole). Oracle: q122's, with the DuckDB ASOF + tolerance
    // CASE unchanged — two syntaxes, one semantics.
    QueryDef("q157_asof_tolerance_declarative",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("sec"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id").as("c_user"), col("sec").as("c_sec"),
            col("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("sec"))
        purchases.join(clicks,
            col("user_id") === col("c_user") &&
              expr("asof_backward(sec, c_sec, 3600)"), "left_outer")
          .select(col("event_id"), col("user_id"), col("sec"),
            col("click_id"), col("c_sec").as("asof_ts"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, sec, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, sec FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.sec,
        |  CASE WHEN c.sec IS NOT NULL AND p.sec - c.sec <= 3600
        |       THEN c.click_id END AS click_id,
        |  CASE WHEN c.sec IS NOT NULL AND p.sec - c.sec <= 3600
        |       THEN c.sec END AS asof_ts
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.sec >= c.sec
        |ORDER BY p.event_id""".stripMargin)),

    // q144's overlap join stated with the interval_overlap MARKER and
    // NO conf anywhere: the marker is the explicit statement of intent
    // the raw two-strict-inequalities shape can't carry, so the
    // three-leg bucketized rewrite fires with an auto-derived width
    // (plans.RangeJoinRewriteRule.markedOverlap) — the last
    // BroadcastNestedLoopJoin hole closed declaratively. Oracle: q144's
    // verbatim (the marker means exactly `s_start < w_end AND
    // w_start < s_end`).
    QueryDef("q174_overlap_join_marker",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gap = tsSec - lag(tsSec, 1).over(w)
        val sessions = ev
          .withColumn("new_session",
            when(gap.isNull || gap > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("sec")).as("s_start"),
            (max(col("sec")) + 1L).as("s_end"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        sessions.join(windows,
            col("user_id") === col("w_user") &&
              expr("interval_overlap(s_start, s_end, w_start, w_end)"))
          .select(col("user_id"), col("session_id"), col("window_id"),
            (least(col("s_end"), col("w_end")) -
              greatest(col("s_start"), col("w_start"))).as("overlap_sec"))
          .orderBy("user_id", "session_id", "window_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    ts
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, sec,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (SELECT user_id, event_id, sec, ts,
        |          sec - lag(sec) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS gap
        |        FROM ev)),
        |sessions AS (
        |  SELECT user_id, session_id, min(sec) AS s_start,
        |    max(sec) + 1 AS s_end
        |  FROM marked GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id::BIGINT AS session_id, w.window_id,
        |  (least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start))::BIGINT
        |    AS overlap_sec
        |FROM sessions s JOIN w ON w.user_id = s.user_id
        |  AND s.s_start < w.w_end AND w.w_start < s.s_end
        |ORDER BY s.user_id, s.session_id, w.window_id""".stripMargin)),

    // FRACTIONAL as-of tolerance on the reference's native axis type —
    // double seconds (trx delays are float seconds, id9.py:49-56):
    // `asof_backward(secd, c_secd, 0.5)` with full-microsecond
    // timestamps, previously inexpressible (tolerance was a whole-unit
    // long). The numeric-axis fractional path compares the raw double
    // gap against the double literal — exactly DuckDB's
    // `p.secd - c.secd <= 0.5` in the oracle's ASOF + CASE replay.
    QueryDef("q175_asof_fractional_tolerance",
      (s, dir) => {
        val ev = events(s, dir).withColumn("secd", expr("ts / 1e9"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("secd"))
          .agg(max(col("event_id")).as("click_id"))
          .select(col("user_id").as("c_user"), col("secd").as("c_secd"),
            col("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("secd"))
        purchases.join(clicks,
            col("user_id") === col("c_user") &&
              expr("asof_backward(secd, c_secd, 0.5)"), "left_outer")
          .select(col("event_id"), col("user_id"),
            round(col("secd"), 6).as("secd"), col("click_id"),
            round(col("c_secd"), 6).as("asof_secd"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_ns(ts)::DOUBLE / 1e9 AS secd
        |  FROM events),
        |clicks AS (
        |  SELECT user_id, secd, max(event_id) AS click_id
        |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, secd FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, round(p.secd, 6) AS secd,
        |  CASE WHEN c.secd IS NOT NULL AND p.secd - c.secd <= 0.5
        |       THEN c.click_id END AS click_id,
        |  CASE WHEN c.secd IS NOT NULL AND p.secd - c.secd <= 0.5
        |       THEN round(c.secd, 6) END AS asof_secd
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.secd >= c.secd
        |ORDER BY p.event_id""".stripMargin)),

    // SUB-SECOND range join on the double axis with a FRACTIONAL auto
    // width: error events open [secd, secd + 0.25) windows; the
    // declarative join rewrites under the default-on rule with the
    // static width 0.25 read straight off the `+ 0.25` literal (a Long
    // width would floor to 1 s — 4× over-wide buckets, the round-13
    // blind spot). Offsets are sub-second doubles, rounded 6 dp on both
    // engines.
    QueryDef("q176_subsecond_range_join",
      (s, dir) => {
        val ev = events(s, dir).withColumn("secd", expr("ts / 1e9"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("secd"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("secd").as("w_start"),
            (col("secd") + 0.25d).as("w_end"))
        ev.join(windows,
            col("user_id") === col("w_user") &&
              col("secd") >= col("w_start") && col("secd") < col("w_end"))
          .select(col("window_id"), col("event_id"), col("user_id"),
            col("event_type"),
            round(col("secd") - col("w_start"), 6).as("offset_sec"))
          .orderBy("window_id", "event_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_ns(ts)::DOUBLE / 1e9 AS secd
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, secd AS w_start,
        |    secd + 0.25 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT w.window_id, e.event_id, e.user_id, e.event_type,
        |  round(e.secd - w.w_start, 6) AS offset_sec
        |FROM ev e JOIN w ON w.user_id = e.user_id
        |  AND e.secd >= w.w_start AND e.secd < w.w_end
        |ORDER BY w.window_id, e.event_id""".stripMargin)),

    // The STREAMED drift monitor's first oracle: a KS monitor stamped
    // with BOUNDED state (StreamingDrift.KsBinning: values bin to 50
    // left-edge cells over [0, 400), ≤ 52 state rows per side instead of
    // ~1800 distinct values), fed the click events in three idempotent
    // micro-batch slices, then SERVED from state alone — the report must
    // equal the batch KS of the binned distributions over (views, all
    // clicks), which is exactly what the oracle computes, p-value
    // included. Repeat runs re-feed the same batch ids (partition
    // overwrite replay) and must not change the report.
    QueryDef("q178_streamed_ks_binned",
      (s, dir) => {
        import graft.streaming.StreamingDrift
        val ev = events(s, dir)
        val st = System.getProperty("java.io.tmpdir") +
          "/graft_drift_q178_" + dataStamp(dir, "events")
        // probe through the Hadoop FS — StreamingDrift WRITES _col through
        // it, and a java.io probe of a non-local state dir would re-init
        // (and fail loudly) every run
        if (!graft.sources.Bundle.exists(s"$st/_col")) {
          StreamingDrift.init(
            ev.filter(col("event_type") === "view").select(col("value")),
            st, "value", breaks = Seq(50.0, 120.0, 250.0),
            ksBinning = Some(StreamingDrift.KsBinning(0.0, 400.0, 50)))
        }
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("value"))
        (0 until 3).foreach { i =>
          StreamingDrift.processBatch(
            clicks.filter(pmod(col("event_id"), lit(3)) === i)
              .select(col("value")), st, i.toLong)
        }
        StreamingDrift.ksReport(s, st)
      },
      Some("""WITH b AS (
        |  SELECT event_type,
        |    0.0 + least(50.0, greatest(-1.0,
        |      floor((value::DOUBLE - 0.0) / 8.0))) * 8.0 AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('view', 'click')),
        |av AS (SELECT v, count(*)::BIGINT AS c FROM b
        |       WHERE event_type = 'view' GROUP BY 1),
        |bv AS (SELECT v, count(*)::BIGINT AS c FROM b
        |       WHERE event_type = 'click' GROUP BY 1),
        |m AS (
        |  SELECT coalesce(av.v, bv.v) AS v, coalesce(av.c, 0) AS ca,
        |         coalesce(bv.c, 0) AS cb
        |  FROM av FULL JOIN bv ON av.v = bv.v),
        |t AS (SELECT sum(ca)::BIGINT AS ta, sum(cb)::BIGINT AS tb FROM m),
        |cum AS (
        |  SELECT v, sum(ca) OVER (ORDER BY v)::BIGINT AS cca,
        |         sum(cb) OVER (ORDER BY v)::BIGINT AS ccb
        |  FROM m),
        |d AS (
        |  SELECT v, round(abs(cca::DOUBLE / ta - ccb::DOUBLE / tb), 9) AS d
        |  FROM cum, t),
        |base AS (
        |  SELECT round(d, 6) AS ks_d, v AS at_value, ta AS n_a, tb AS n_b
        |  FROM d, t ORDER BY d DESC, v LIMIT 1),
        |lamt AS (
        |  SELECT *, sqrt(n_a::DOUBLE * n_b / (n_a + n_b)) * ks_d AS lam
        |  FROM base)
        |SELECT ks_d, at_value, n_a, n_b,
        |  round(CASE WHEN lam <= 0.2 THEN 1.0
        |        ELSE least(1.0, greatest(0.0, 2.0 * (
        |          SELECT sum((CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
        |                     * exp(-2.0 * k * k * lam * lam))
        |          FROM generate_series(1, 100) s(k)))) END, 6) AS p_value
        |FROM lamt""".stripMargin)),

    // The streamed CATEGORICAL drift twin under an oracle: a monitor
    // whose reference is the even-user half's event-type distribution,
    // fed the odd-user half in three idempotent micro-batch slices,
    // serving the chi-squared homogeneity report (with Cramér's V and
    // the r14 p-value) from state alone. The oracle replays the 2×k
    // table, the rounded-cell DECIMAL sum, and the same incomplete-gamma
    // series as q169 — the streamed and batch chi² paths share
    // Drift.chiFromCounts, so state-merge must be semantically invisible.
    QueryDef("q179_streamed_chi_squared",
      (s, dir) => {
        import graft.streaming.StreamingDrift
        val ev = events(s, dir)
        val st = System.getProperty("java.io.tmpdir") +
          "/graft_drift_q179_" + dataStamp(dir, "events")
        // probe through the Hadoop FS — StreamingDrift WRITES _col through
        // it, and a java.io probe of a non-local state dir would re-init
        // (and fail loudly) every run
        if (!graft.sources.Bundle.exists(s"$st/_col")) {
          StreamingDrift.init(
            ev.filter(pmod(col("user_id"), lit(2)) === 0)
              .select(col("value"), col("event_type")),
            st, "value", breaks = Seq(100.0),
            catCol = Some("event_type"))
        }
        val live = ev.filter(pmod(col("user_id"), lit(2)) === 1)
          .select(col("event_id"), col("value"), col("event_type"))
        (0 until 3).foreach { i =>
          StreamingDrift.processBatch(
            live.filter(pmod(col("event_id"), lit(3)) === i)
              .select(col("value"), col("event_type")), st, i.toLong)
        }
        StreamingDrift.chiSquaredReport(s, st)
      },
      Some("""WITH RECURSIVE ca AS (
        |  SELECT event_type AS cat, count(*)::BIGINT AS c FROM events
        |  WHERE user_id % 2 = 0 AND event_type IS NOT NULL GROUP BY 1),
        |cb AS (
        |  SELECT event_type AS cat, count(*)::BIGINT AS c FROM events
        |  WHERE user_id % 2 = 1 AND event_type IS NOT NULL GROUP BY 1),
        |m AS (
        |  SELECT coalesce(ca.cat, cb.cat) AS cat, coalesce(ca.c, 0) AS c_a,
        |         coalesce(cb.c, 0) AS c_b
        |  FROM ca FULL JOIN cb ON ca.cat = cb.cat),
        |t AS (SELECT sum(c_a)::BIGINT AS ta, sum(c_b)::BIGINT AS tb,
        |             count(*)::BIGINT AS k FROM m),
        |x AS (
        |  SELECT round(
        |    pow(c_a::DOUBLE - ta::DOUBLE * (c_a + c_b)::DOUBLE
        |          / (ta + tb)::DOUBLE, 2)
        |      / (ta::DOUBLE * (c_a + c_b)::DOUBLE / (ta + tb)::DOUBLE) +
        |    pow(c_b::DOUBLE - tb::DOUBLE * (c_a + c_b)::DOUBLE
        |          / (ta + tb)::DOUBLE, 2)
        |      / (tb::DOUBLE * (c_a + c_b)::DOUBLE / (ta + tb)::DOUBLE),
        |    6) AS cell
        |  FROM m, t),
        |f AS (
        |  SELECT round(sum(cell::DECIMAL(28,6))::DOUBLE, 6) AS chi2,
        |         (k - 1)::BIGINT AS dof, k::BIGINT AS n_cats,
        |         ta AS n_a, tb AS n_b
        |  FROM x, t GROUP BY k, ta, tb),
        |g AS (SELECT chi2 / 2.0 AS gx, dof / 2.0 AS ga FROM f),
        |ser(n, term, s) AS (
        |  SELECT 0, 1.0 / ga, 1.0 / ga FROM g
        |  UNION ALL
        |  SELECT n + 1, term * gx / (ga + n + 1),
        |         s + term * gx / (ga + n + 1)
        |  FROM ser, g WHERE n < 1200),
        |sv AS (SELECT s FROM ser ORDER BY n DESC LIMIT 1)
        |SELECT chi2, dof, n_cats, n_a, n_b,
        |  round(CASE WHEN n_cats >= 2
        |        THEN sqrt(chi2 / (n_a + n_b)::DOUBLE) END, 6) AS cramers_v,
        |  round(CASE WHEN n_cats < 2 THEN NULL
        |        WHEN chi2 <= 0 THEN 1.0
        |        WHEN gx > ga + 40.0 + 10.0 * sqrt(ga) THEN 0.0
        |        WHEN gx > 600.0 THEN NULL
        |        ELSE least(1.0, greatest(0.0,
        |          1.0 - exp(ga * ln(gx) - gx - lgamma(ga)) * s)) END,
        |    6) AS p_value
        |FROM f, g, sv""".stripMargin)),

    // Live quantiles SERVED FROM WARM STREAM STATE: the binned KS
    // monitor's value-count state (q178's bounded ≤ bins+2 rows/side
    // family) doubles as an exact type-7 quantile server over the
    // BINNED stream (StreamingDrift.quantilesReport →
    // Stats.quantilesFromCounts — the h = p·(n−1) interpolation DuckDB's
    // quantile_cont also runs). Fed the click events in three idempotent
    // micro-batch slices, then served from state alone; the oracle is
    // quantile_cont over the identically-binned click values — fresh
    // and warm runs must agree (partition-overwrite replay).
    QueryDef("q181_streamed_quantiles",
      (s, dir) => {
        import graft.streaming.StreamingDrift
        val ev = events(s, dir)
        val st = System.getProperty("java.io.tmpdir") +
          "/graft_drift_q181_" + dataStamp(dir, "events")
        // probe through the Hadoop FS — StreamingDrift WRITES _col through
        // it, and a java.io probe of a non-local state dir would re-init
        // (and fail loudly) every run
        if (!graft.sources.Bundle.exists(s"$st/_col")) {
          StreamingDrift.init(
            ev.filter(col("event_type") === "view").select(col("value")),
            st, "value", breaks = Seq(50.0, 120.0, 250.0),
            ksBinning = Some(StreamingDrift.KsBinning(0.0, 400.0, 50)))
        }
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("value"))
        (0 until 3).foreach { i =>
          StreamingDrift.processBatch(
            clicks.filter(pmod(col("event_id"), lit(3)) === i)
              .select(col("value")), st, i.toLong)
        }
        StreamingDrift.quantilesReport(s, st,
            probs = Seq(0.25, 0.5, 0.9, 0.99))
          .select(col("prob"), round(col("q"), 6).as("q"))
          .orderBy("prob")
      },
      Some {
        val binned =
          """WITH b AS (
            |  SELECT 0.0 + least(50.0, greatest(-1.0,
            |    floor((value::DOUBLE - 0.0) / 8.0))) * 8.0 AS v
            |  FROM events
            |  WHERE value IS NOT NULL AND event_type = 'click')
            |""".stripMargin
        binned + Seq(0.25, 0.5, 0.9, 0.99).map(p =>
            s"""SELECT $p::DOUBLE AS prob,
               |  round(quantile_cont(v, $p), 6) AS q FROM b""".stripMargin)
          .mkString("", "\nUNION ALL\n", "\nORDER BY prob")
      }),

    // q174's overlap marker join, LEFT OUTER: every session with its
    // overlapping error windows AND the sessions with NO error window
    // kept (null window) — one declarative join, the outer form the
    // marker family previously lacked. Under the hood the rule unions
    // the inner three-leg rewrite with the anti-complement (null-safe
    // all-columns equi-anti against the distinct matched left tuples) —
    // still no nested loop anywhere (RangeJoinRewriteSpec pins it).
    // Oracle: q174's verbatim as a LEFT JOIN.
    QueryDef("q182_overlap_marker_left_outer",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gap = tsSec - lag(tsSec, 1).over(w)
        val sessions = ev
          .withColumn("new_session",
            when(gap.isNull || gap > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("sec")).as("s_start"),
            (max(col("sec")) + 1L).as("s_end"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        sessions.join(windows,
            col("user_id") === col("w_user") &&
              expr("interval_overlap(s_start, s_end, w_start, w_end)"),
            "left_outer")
          .select(col("user_id"), col("session_id"), col("window_id"),
            (least(col("s_end"), col("w_end")) -
              greatest(col("s_start"), col("w_start"))).as("overlap_sec"))
          .orderBy(col("user_id"), col("session_id"),
            col("window_id").asc_nulls_first)
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    ts
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, sec,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (SELECT user_id, event_id, sec, ts,
        |          sec - lag(sec) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS gap
        |        FROM ev)),
        |sessions AS (
        |  SELECT user_id, session_id, min(sec) AS s_start,
        |    max(sec) + 1 AS s_end
        |  FROM marked GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id::BIGINT AS session_id, w.window_id,
        |  (least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start))::BIGINT
        |    AS overlap_sec
        |FROM sessions s LEFT JOIN w ON w.user_id = s.user_id
        |  AND s.s_start < w.w_end AND w.w_start < s.s_end
        |ORDER BY s.user_id, s.session_id, w.window_id NULLS FIRST"""
        .stripMargin)),

    // The ANTI form of the overlap marker family: sessions with NO
    // error window AT ALL, as one declarative LEFT ANTI join — the
    // rule runs it against the distinct matched left tuples (semi-probe
    // legs + null-safe equi-anti), never a nested loop. Oracle: the
    // same sessionization with NOT EXISTS.
    QueryDef("q184_overlap_marker_anti",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gap = tsSec - lag(tsSec, 1).over(w)
        val sessions = ev
          .withColumn("new_session",
            when(gap.isNull || gap > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("sec")).as("s_start"),
            (max(col("sec")) + 1L).as("s_end"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        sessions.join(windows,
            col("user_id") === col("w_user") &&
              expr("interval_overlap(s_start, s_end, w_start, w_end)"),
            "left_anti")
          .select(col("user_id"), col("session_id"), col("s_start"),
            col("s_end"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    ts
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, sec,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (SELECT user_id, event_id, sec, ts,
        |          sec - lag(sec) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS gap
        |        FROM ev)),
        |sessions AS (
        |  SELECT user_id, session_id, min(sec) AS s_start,
        |    max(sec) + 1 AS s_end
        |  FROM marked GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, sec AS w_start, sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id::BIGINT AS session_id,
        |  s.s_start, s.s_end
        |FROM sessions s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM w WHERE w.user_id = s.user_id
        |    AND s.s_start < w.w_end AND w.w_start < s.s_end)
        |ORDER BY s.user_id, s.session_id""".stripMargin)),

    // The DISTRIBUTED archive on-ramp under an oracle: three synthetic
    // trx-layout azav bundles (deterministic formula content, written
    // once via the main-scope Hdf5Writer) decode FILE-PER-TASK through
    // Bundle.azavFromHdf5Dir (Spark binaryFile → pure-Scala reader
    // inside the task) and aggregate per (run, q_bin). The oracle never
    // sees the .h5 files — it replays the generating formula itself
    // with generate_series, so the whole decode → union → aggregate
    // chain is hash-gated end to end. sum_i rides the stableSum
    // discipline; max_delay_ns is order-independent.
    QueryDef("q183_hdf5_dir_ingest",
      (s, dir) => {
        import graft.sources.{Bundle, Hdf5Writer}
        val st = System.getProperty("java.io.tmpdir") + "/graft_h5dir_q183_v1"
        if (!graft.sources.Bundle.exists(s"$st/_done")) {
          val nQ = 4
          for (run <- 0 until 3) {
            val nImg = 3 + run
            val delays = Array.tabulate(nImg)(r => r * 1e-9 + run * 1e-6)
            val data =
              Array.tabulate(nImg * nQ)(i => run * 100.0 + i * 0.5)
            Hdf5Writer.write(s"$st/run$run.h5", Hdf5Writer.Node(
              datasets = Seq(
                "data" -> Hdf5Writer.Doubles(Seq(nImg, nQ), data),
                "delays" -> Hdf5Writer.Doubles(Seq(nImg), delays))))
          }
          val (dfs, dp) = Bundle.fsPath(s"$st/_done")
          dfs.create(dp, true).close()
        }
        Bundle.azavFromHdf5Dir(s, s"$st/*.h5")
          .withColumn("run",
            regexp_extract(col("file"), "run(\\d+)\\.h5", 1).cast("long"))
          .groupBy(col("run"), col("q_bin"))
          .agg(count(lit(1)).as("n_img"),
            stableSum(col("i")).as("sum_i"),
            round(max(col("delay")) * 1e9, 3).as("max_delay_ns"))
          .orderBy("run", "q_bin")
      },
      Some(s"""WITH runs AS (SELECT r FROM generate_series(0, 2) t(r)),
        |imgs AS (
        |  SELECT r, i FROM runs, generate_series(0, 4) s(i)
        |  WHERE i <= 2 + r),
        |cells AS (
        |  SELECT r, i AS img, j AS q_bin
        |  FROM imgs, generate_series(0, 3) u(j)),
        |vals AS (
        |  SELECT r, img, q_bin,
        |    r * 100.0 + (img * 4 + q_bin) * 0.5 AS iv,
        |    img * 1e-9 + r * 1e-6 AS delay
        |  FROM cells)
        |SELECT r AS run, q_bin::BIGINT AS q_bin, count(*)::BIGINT AS n_img,
        |  ${stableSumSql("iv")} AS sum_i,
        |  round(max(delay) * 1e9, 3) AS max_delay_ns
        |FROM vals GROUP BY 1, 2
        |ORDER BY run, q_bin""".stripMargin)),

    // Rolling z-score anomaly detection over the hourly event-count
    // series: each (type, hour)'s count scored against the previous 24
    // OBSERVED hours (rows, not wall-hours — production would densify
    // gaps first; the row form keeps the oracle exact). The stats ride
    // the moments discipline: n, Σx, Σx² are INTEGER window sums (exact
    // in both engines), the float chain (mean, sample variance, sqrt,
    // the ratio) is written once in the same operation order on both
    // sides, so round-6 z-scores hash-match. Output: the anomalous
    // hours (|z| ≥ 2 over a full 24-row baseline).
    QueryDef("q128_rolling_anomaly",
      (s, dir) => {
        val hourSec = tsSec - pmod(tsSec, lit(3600L))
        val hourly = events(s, dir)
          .groupBy(col("event_type"), hourSec.as("hsec"))
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("hsec"))
          .rowsBetween(-24, -1)
        val scored = hourly
          .withColumn("_n", count(lit(1)).over(w))
          .withColumn("_s1", sum(col("cnt")).over(w))
          .withColumn("_s2", sum(col("cnt") * col("cnt")).over(w))
          .filter(col("_n") === 24)
          .withColumn("_mean",
            col("_s1").cast("double") / col("_n").cast("double"))
          .withColumn("_var",
            (col("_s2").cast("double") -
              col("_s1").cast("double") * col("_s1").cast("double") /
                col("_n").cast("double")) / (col("_n").cast("double") - 1.0))
          .filter(col("_var") > 0)
          .withColumn("z",
            (col("cnt").cast("double") - col("_mean")) / sqrt(col("_var")))
        scored.filter(abs(col("z")) >= 2.0)
          .select(col("event_type"),
            date_format(timestamp_seconds(col("hsec")), "yyyy-MM-dd HH:mm")
              .as("hour"),
            col("cnt"), round(col("z"), 6).as("z"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH hourly AS (
        |  SELECT event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |              date_trunc('hour', ts)) AS hsec,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, hsec, cnt,
        |    count(*) OVER prev AS n,
        |    sum(cnt) OVER prev AS s1,
        |    sum(cnt * cnt) OVER prev AS s2
        |  FROM hourly
        |  WINDOW prev AS (PARTITION BY event_type ORDER BY hsec
        |                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |scored AS (
        |  SELECT event_type, hsec, cnt,
        |    (cnt::DOUBLE - mean) / sqrt(var) AS z
        |  FROM (
        |    SELECT event_type, hsec, cnt,
        |      s1::DOUBLE / n::DOUBLE AS mean,
        |      (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE)
        |        / (n::DOUBLE - 1.0) AS var
        |    FROM win WHERE n = 24)
        |  WHERE var > 0)
        |SELECT event_type,
        |  strftime(to_timestamp(hsec), '%Y-%m-%d %H:%M') AS hour,
        |  cnt, round(z, 6) AS z
        |FROM scored WHERE abs(z) >= 2.0
        |ORDER BY event_type, hour""".stripMargin)),

    // Ordered conversion funnel (view → click → purchase, each step AT
    // OR AFTER the previous step's first completion): the sequence-
    // pattern query an event pipeline answers per user. Three
    // conditional min-aggregations chained by user-keyed joins — the
    // step thresholds are USER-grain, so they are deliberately NOT
    // hinted broadcast (at 10^9 users that broadcast is the failure
    // mode); every join and aggregation keys on user_id, so the
    // exchanges co-partition and Catalyst still broadcasts when the
    // side is genuinely small. The raw event table is scanned once per
    // step with a pushed type filter, never self-joined at event grain.
    QueryDef("q129_conversion_funnel",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
          .select(col("user_id"), col("event_type"), col("sec"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("sec")).as("v_sec"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("sec") >= col("v_sec"))
          .groupBy(col("user_id")).agg(min(col("sec")).as("c_sec"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("sec") >= col("c_sec"))
          .groupBy(col("user_id")).agg(min(col("sec")).as("p_sec"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("v_sec"), col("c_sec"), col("p_sec"),
            (lit(1L) + when(col("c_sec").isNotNull, 1L).otherwise(0L) +
              when(col("p_sec").isNotNull, 1L).otherwise(0L)).as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (
        |  SELECT user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |v AS (SELECT user_id, min(sec) AS v_sec FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.sec) AS c_sec
        |      FROM ev e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.sec >= v.v_sec GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.sec) AS p_sec
        |      FROM ev e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.sec >= c.c_sec
        |      GROUP BY 1)
        |SELECT v.user_id, v.v_sec, c.c_sec, p.p_sec,
        |  (1 + CASE WHEN c.c_sec IS NOT NULL THEN 1 ELSE 0 END
        |     + CASE WHEN p.p_sec IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin)),

    // Time-series completeness report: densify each type's hourly grid
    // (`sequence` + explode — the gap-filling pass the q128 caveat
    // documents) and report coverage: observed hours, gap hours, longest
    // gap. The densified grid is generated per type from its own
    // [min, max] span — no calendar table to maintain, and the explode
    // is bounded by span/3600 per type.
    QueryDef("q131_series_completeness",
      (s, dir) => {
        val hourSec = tsSec - pmod(tsSec, lit(3600L))
        val hourly = events(s, dir)
          .groupBy(col("event_type"), hourSec.as("hsec"))
          .agg(count(lit(1)).as("cnt"))
        val grid = hourly.groupBy(col("event_type"))
          .agg(min(col("hsec")).as("_lo"), max(col("hsec")).as("_hi"))
          .select(col("event_type"),
            explode(sequence(col("_lo"), col("_hi"), lit(3600L)))
              .as("hsec"))
        val dense = grid.join(hourly, Seq("event_type", "hsec"), "left")
          .withColumn("present",
            when(col("cnt").isNotNull, 1L).otherwise(0L))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("hsec"))
        val runs = dense
          .withColumn("_grp", sum(col("present")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
        val gaps = runs.filter(col("present") === 0)
          .groupBy(col("event_type"), col("_grp"))
          .agg(count(lit(1)).as("_gap_len"))
          .groupBy(col("event_type"))
          .agg(max(col("_gap_len")).as("longest_gap_hours"))
        dense.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_grid_hours"),
            sum(col("present")).as("n_observed_hours"),
            (count(lit(1)) - sum(col("present"))).as("n_gap_hours"))
          .join(gaps, Seq("event_type"), "left")
          .select(col("event_type"), col("n_grid_hours"),
            col("n_observed_hours"), col("n_gap_hours"),
            coalesce(col("longest_gap_hours"), lit(0L))
              .as("longest_gap_hours"))
          .orderBy("event_type")
      },
      Some("""WITH hourly AS (
        |  SELECT event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |              date_trunc('hour', ts)) AS hsec,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(hsec), max(hsec), 3600)) AS hsec
        |  FROM hourly GROUP BY event_type),
        |dense AS (
        |  SELECT g.event_type, g.hsec,
        |    CASE WHEN h.cnt IS NOT NULL THEN 1 ELSE 0 END AS present
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.event_type = g.event_type AND h.hsec = g.hsec),
        |runs AS (
        |  SELECT event_type, hsec, present,
        |    sum(present) OVER (PARTITION BY event_type ORDER BY hsec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM dense),
        |gaps AS (
        |  SELECT event_type, max(gap_len) AS longest_gap_hours FROM (
        |    SELECT event_type, grp, count(*)::BIGINT AS gap_len
        |    FROM runs WHERE present = 0 GROUP BY 1, 2)
        |  GROUP BY event_type)
        |SELECT d.event_type, count(*)::BIGINT AS n_grid_hours,
        |  sum(present)::BIGINT AS n_observed_hours,
        |  (count(*) - sum(present))::BIGINT AS n_gap_hours,
        |  coalesce(g.longest_gap_hours, 0) AS longest_gap_hours
        |FROM dense d LEFT JOIN gaps g ON g.event_type = d.event_type
        |GROUP BY d.event_type, g.longest_gap_hours
        |ORDER BY d.event_type""".stripMargin)),

    // Weekly cohort retention: users cohorted by their FIRST signup
    // week; retention(k) = share of the cohort active (any event) in
    // week k after signup. The classic growth matrix, at (cohort, offset)
    // grain — both joins are user-keyed shuffles, the output is
    // weeks × weeks rows regardless of event volume.
    QueryDef("q132_cohort_retention",
      (s, dir) => {
        val weekSec = tsSec - pmod(tsSec, lit(604800L))
        val ev = events(s, dir)
          .select(col("user_id"), col("event_type"), weekSec.as("wk"))
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
        val sizes = cohort.groupBy(col("cohort_wk"))
          .agg(count(lit(1)).as("cohort_n"))
        val active = ev.select(col("user_id"), col("wk")).distinct()
          .join(cohort, Seq("user_id"))
          .filter(col("wk") >= col("cohort_wk"))
          .withColumn("week_offset",
            expr("(wk - cohort_wk) DIV 604800"))
          .groupBy(col("cohort_wk"), col("week_offset"))
          .agg(count(lit(1)).as("n_active"))
        active.join(broadcast(sizes), Seq("cohort_wk"))
          .select(col("cohort_wk"), col("week_offset"), col("n_active"),
            col("cohort_n"),
            round(col("n_active").cast("double") /
              col("cohort_n").cast("double"), 6).as("retention"))
          .orderBy("cohort_wk", "week_offset")
      },
      Some("""WITH ev AS (
        |  SELECT user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
        |      // 604800 * 604800 AS wk
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM ev
        |  WHERE event_type = 'signup' GROUP BY 1),
        |sizes AS (
        |  SELECT cohort_wk, count(*)::BIGINT AS cohort_n
        |  FROM cohort GROUP BY 1),
        |active AS (
        |  SELECT c.cohort_wk, (a.wk - c.cohort_wk) // 604800 AS week_offset,
        |    count(*)::BIGINT AS n_active
        |  FROM (SELECT DISTINCT user_id, wk FROM ev) a
        |  JOIN cohort c ON c.user_id = a.user_id
        |  WHERE a.wk >= c.cohort_wk
        |  GROUP BY 1, 2)
        |SELECT a.cohort_wk, a.week_offset, a.n_active, s.cohort_n,
        |  round(a.n_active::DOUBLE / s.cohort_n::DOUBLE, 6) AS retention
        |FROM active a JOIN sizes s ON s.cohort_wk = a.cohort_wk
        |ORDER BY a.cohort_wk, a.week_offset""".stripMargin)),

    // Behavioral path mining: the most common 3-step event-type
    // sequences along each user's ordered journey, via two lead()
    // windows — per-user partitions, bounded by a user's history. (At
    // this corpus's cadence 30-min sessions are near-singletons, so the
    // journey grain is the one with statistics; the operator shape is
    // identical either way.) The journey trigram is to event streams
    // what the token n-gram is to text; output = patterns seen ≥ 20
    // times.
    QueryDef("q133_event_path_trigrams",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, dir)
          .withColumn("_e2", lead(col("event_type"), 1).over(w))
          .withColumn("_e3", lead(col("event_type"), 2).over(w))
          .filter(col("_e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("_e2"), col("_e3"))
            .as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 20)
          .orderBy("path")
      },
      Some("""WITH tri AS (
        |  SELECT event_type || '>' ||
        |    lead(event_type, 1) OVER sw || '>' ||
        |    lead(event_type, 2) OVER sw AS path,
        |    lead(event_type, 2) OVER sw AS e3
        |  FROM events
        |  WINDOW sw AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, count(*)::BIGINT AS n FROM tri
        |WHERE e3 IS NOT NULL GROUP BY path HAVING count(*) >= 20
        |ORDER BY path""".stripMargin)),

    // q120's range join STATED DECLARATIVELY — a plain inner join with
    // the range predicate — executed under the injected optimizer rule
    // (plans.RangeJoinRewriteRule, conf-gated bucket width): the rule
    // must rewrite it to the bucketized equi-join and produce the
    // IDENTICAL pair set, proven by q120's own oracle verbatim. The
    // frame is materialized (localCheckpoint) while the conf is set so
    // the gate never leaks into other queries' plans.
    QueryDef("q135_range_join_declarative",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("sec"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        s.conf.set(graft.plans.RangeJoinRewriteRule.WidthConf, "600")
        try ev.join(windows,
            col("user_id") === col("w_user") &&
              col("sec") >= col("w_start") && col("sec") < col("w_end"))
          .select(col("window_id"), col("event_id"), col("user_id"),
            col("event_type"), (col("sec") - col("w_start")).as("offset_sec"))
          .orderBy("window_id", "event_id")
          .localCheckpoint(true)
        finally s.conf.unset(graft.plans.RangeJoinRewriteRule.WidthConf)
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT w.window_id, e.event_id, e.user_id, e.event_type,
        |  (e.sec - w.w_start)::BIGINT AS offset_sec
        |FROM ev e JOIN w ON w.user_id = e.user_id
        |  AND e.sec >= w.w_start AND e.sec < w.w_end
        |ORDER BY w.window_id, e.event_id""".stripMargin)),

    // q121's interval-overlap join STATED DECLARATIVELY — a plain inner
    // join with the two-sided overlap predicate (s_start < w_end AND
    // w_start < s_end) — executed under the extended optimizer rule: it
    // must rewrite to the three-leg bucketized plan (double explode +
    // first-overlap-bucket; the degenerate-interval legs collapse empty
    // under AQE) and produce the IDENTICAL pair set, proven by q121's
    // own oracle verbatim. Materialized while the conf is set so the
    // gate never leaks into other queries' plans.
    QueryDef("q144_overlap_join_declarative",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gap = tsSec - lag(tsSec, 1).over(w)
        val sessions = ev
          .withColumn("new_session",
            when(gap.isNull || gap > 1800, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_session")).over(
            w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("sec")).as("s_start"),
            (max(col("sec")) + 1L).as("s_end"))
        val windows = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("w_user"),
            col("event_id").as("window_id"),
            col("sec").as("w_start"), (col("sec") + 600L).as("w_end"))
        s.conf.set(graft.plans.RangeJoinRewriteRule.WidthConf, "3600")
        try sessions.join(windows,
            col("user_id") === col("w_user") &&
              col("s_start") < col("w_end") &&
              col("w_start") < col("s_end"))
          .select(col("user_id"), col("session_id"), col("window_id"),
            (least(col("s_end"), col("w_end")) -
              greatest(col("s_start"), col("w_start"))).as("overlap_sec"))
          .orderBy("user_id", "session_id", "window_id")
          .localCheckpoint(true)
        finally s.conf.unset(graft.plans.RangeJoinRewriteRule.WidthConf)
      },
      Some("""WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    ts
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, sec,
        |    sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM (SELECT user_id, event_id, sec, ts,
        |          sec - lag(sec) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS gap
        |        FROM ev)),
        |sessions AS (
        |  SELECT user_id, session_id, min(sec) AS s_start,
        |    max(sec) + 1 AS s_end
        |  FROM marked GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, event_id AS window_id, sec AS w_start,
        |    sec + 600 AS w_end
        |  FROM ev WHERE event_type = 'error')
        |SELECT s.user_id, s.session_id::BIGINT AS session_id, w.window_id,
        |  (least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start))::BIGINT
        |    AS overlap_sec
        |FROM sessions s JOIN w ON w.user_id = s.user_id
        |  AND s.s_start < w.w_end AND w.w_start < s.s_end
        |ORDER BY s.user_id, s.session_id, w.window_id""".stripMargin)),

    // Funnel-latency quantiles: view→purchase hours for every COMPLETED
    // q129 funnel, reduced through the moments sketch and served as
    // Cornish-Fisher p50/p90 — the conversion-latency dashboard number,
    // composed from the funnel chain and the q112 sketch family. The
    // oracle replays the funnel CTEs, the round-6/DECIMAL power sums,
    // and the shared estimator chain (cornishFisherTailFor — the exact
    // engine float chain, stated once).
    QueryDef("q143_funnel_latency_quantiles",
      (s, dir) => {
        val ev = events(s, dir).withColumn("sec", tsSec)
          .select(col("user_id"), col("event_type"), col("sec"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("sec")).as("v_sec"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("sec") >= col("v_sec"))
          .groupBy(col("user_id")).agg(min(col("sec")).as("c_sec"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("sec") >= col("c_sec"))
          .groupBy(col("user_id")).agg(min(col("sec")).as("p_sec"))
        val lat = v.join(p, Seq("user_id"))
          .select(lit("all").as("grp"),
            round((col("p_sec") - col("v_sec")).cast("double") /
              lit(3600.0), 6).as("l"))
        graft.operators.Sketches.momentsQuantiles(
            graft.operators.Sketches.momentsState(lat, "l", Seq("grp")),
            Seq(0.5, 0.9), Seq("grp"))
          .select(col("grp"), col("q"), round(col("est"), 6).as("est"))
          .orderBy("grp", "q")
      },
      Some(s"""WITH ev AS (
        |  SELECT user_id, event_type,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |v AS (SELECT user_id, min(sec) AS v_sec FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.sec) AS c_sec
        |      FROM ev e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.sec >= v.v_sec GROUP BY 1),
        |pp AS (SELECT e.user_id, min(e.sec) AS p_sec
        |      FROM ev e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.sec >= c.c_sec
        |      GROUP BY 1),
        |lat AS (
        |  SELECT 'all' AS grp,
        |    round((pp.p_sec - v.v_sec) / 3600.0, 6) AS l
        |  FROM v JOIN pp ON pp.user_id = v.user_id),
        |st AS (
        |  SELECT grp, count(*)::BIGINT AS n,
        |    sum(round(l, 6)::DECIMAL(28,6)) AS s1,
        |    sum(round(l * l, 6)::DECIMAL(28,6)) AS s2,
        |    sum(round(l * l * l, 6)::DECIMAL(28,6)) AS s3,
        |    min(l) AS lo, max(l) AS hi
        |  FROM lat GROUP BY grp),
        |${CorpusQueries.cornishFisherTailFor("grp")}""".stripMargin)),

    // Exact two-sample Kolmogorov–Smirnov statistic (Drift.ksStatistic)
    // between click and view event values: the ECDF difference is a step
    // function changing only at observed values, so the sup is the max
    // over pooled distinct values — exact, no sampling. The distributed
    // cumulative uses range repartition + per-partition windows +
    // broadcast partition offsets (never a single-task global window);
    // the oracle's window-function cumulative replays it, with the
    // comparison key rounded to 9 dp so both engines resolve the argmax
    // and its smallest-value tie-break identically.
    QueryDef("q164_drift_ks",
      (s, dir) => {
        val e = table(s, dir, "events")
        Drift.ksStatistic(
          e.filter(col("event_type") === "click"),
          e.filter(col("event_type") === "view"),
          "value")
      },
      Some("""WITH av AS (
        |  SELECT value::DOUBLE AS v, count(*)::BIGINT AS c FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL GROUP BY 1),
        |bv AS (
        |  SELECT value::DOUBLE AS v, count(*)::BIGINT AS c FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1),
        |m AS (
        |  SELECT coalesce(av.v, bv.v) AS v, coalesce(av.c, 0) AS ca,
        |         coalesce(bv.c, 0) AS cb
        |  FROM av FULL JOIN bv ON av.v = bv.v),
        |t AS (SELECT sum(ca)::BIGINT AS ta, sum(cb)::BIGINT AS tb FROM m),
        |cum AS (
        |  SELECT v, sum(ca) OVER (ORDER BY v)::BIGINT AS cca,
        |         sum(cb) OVER (ORDER BY v)::BIGINT AS ccb
        |  FROM m),
        |d AS (
        |  SELECT v, round(abs(cca::DOUBLE / ta - ccb::DOUBLE / tb), 9) AS d
        |  FROM cum, t),
        |base AS (
        |  SELECT round(d, 6) AS ks_d, v AS at_value, ta AS n_a, tb AS n_b
        |  FROM d, t ORDER BY d DESC, v LIMIT 1),
        |lamt AS (
        |  SELECT *, sqrt(n_a::DOUBLE * n_b / (n_a + n_b)) * ks_d AS lam
        |  FROM base)
        |SELECT ks_d, at_value, n_a, n_b,
        |  round(CASE WHEN lam <= 0.2 THEN 1.0
        |        ELSE least(1.0, greatest(0.0, 2.0 * (
        |          SELECT sum((CASE WHEN k % 2 = 1 THEN 1.0 ELSE -1.0 END)
        |                     * exp(-2.0 * k * k * lam * lam))
        |          FROM generate_series(1, 100) s(k)))) END, 6) AS p_value
        |FROM lamt""".stripMargin)),

    // PSI as a TIME SERIES (Drift.psiSeries): each event day vs the
    // previous observed day on the value distribution — the live-drift
    // dashboard's trend line. The corpus reduces to (day × bucket) counts
    // in one aggregation; predecessor pairing is a lag in per-bucket
    // windows (partition = #days); smoothing matches q163; contributions
    // are 6-dp-rounded and DECIMAL-summed so the series is partition-order
    // independent. The oracle replays the densified lag chain with window
    // functions.
    QueryDef("q168_psi_series",
      (s, dir) => {
        val day = date_format(
          timestamp_seconds(tsSec - pmod(tsSec, lit(86400L))), "yyyy-MM-dd")
        graft.operators.Drift.psiSeries(
          events(s, dir).withColumn("period", day),
          "period", "value", Seq(10.0, 30.0, 60.0, 120.0))
      },
      Some {
        val nb = 5
        val bucketExpr = Seq(10, 30, 60, 120)
          .map(b => s"CASE WHEN value >= $b THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")::INT")
        s"""WITH c AS (
           |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS period,
           |         $bucketExpr AS bucket, count(*)::BIGINT AS n
           |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
           |d AS (
           |  SELECT p.period, bk.bucket, coalesce(c.n, 0) AS n
           |  FROM (SELECT DISTINCT period FROM c) p
           |  CROSS JOIN (SELECT unnest(generate_series(0, ${nb - 1}))::INT
           |              AS bucket) bk
           |  LEFT JOIN c ON c.period = p.period AND c.bucket = bk.bucket),
           |l AS (
           |  SELECT period, bucket, n,
           |         lag(n) OVER (PARTITION BY bucket ORDER BY period) AS n_prev
           |  FROM d),
           |f AS (SELECT * FROM l WHERE n_prev IS NOT NULL),
           |t AS (
           |  SELECT period, n, n_prev,
           |         sum(n) OVER (PARTITION BY period)::BIGINT AS tot_cur,
           |         sum(n_prev) OVER (PARTITION BY period)::BIGINT AS tot_prev
           |  FROM f),
           |x AS (
           |  SELECT period, tot_prev, tot_cur,
           |    round(((n_prev::DOUBLE + 0.5) / (tot_prev::DOUBLE + 0.5 * $nb)
           |         - (n::DOUBLE + 0.5) / (tot_cur::DOUBLE + 0.5 * $nb))
           |      * ln(((n_prev::DOUBLE + 0.5) / (tot_prev::DOUBLE + 0.5 * $nb))
           |          / ((n::DOUBLE + 0.5) / (tot_cur::DOUBLE + 0.5 * $nb))),
           |      6) AS contrib
           |  FROM t)
           |SELECT period, max(tot_prev)::BIGINT AS n_prev,
           |       max(tot_cur)::BIGINT AS n_cur,
           |       round(sum(contrib::DECIMAL(28,6))::DOUBLE, 6) AS psi
           |FROM x GROUP BY period ORDER BY period""".stripMargin
      })
  )
}
