package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) joins.
  *
  * Spark's planner has no equi-key to hash on in a pure range predicate
  * (`p.ts BETWEEN i.start AND i.end`), so it falls back to
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons and a
  * broadcast of a whole side; with an additional equi-key it still
  * evaluates the range residually against every key match. Bucketizing
  * restores an equi-join the engine can shuffle-partition: each interval
  * explodes to the fixed-width buckets it overlaps, each point computes
  * its single bucket, and the join runs on (equiKeys, bucket) with the
  * residual range filter applied inside the bucket. A matching pair
  * co-occurs in EXACTLY the point's bucket, so the output needs no
  * dedup; a non-matching same-bucket pair costs one filtered row, never
  * a cross product.
  *
  * Pick `bucketWidth` near the typical interval length: the interval
  * side's explosion factor is len/width + 1, and the per-bucket
  * candidate count is what bounds a task. This is the standard
  * range-join decomposition every warehouse engine applies (the
  * overlap-join rewrite); Spark simply has to be handed it as a plan.
  */
object RangeJoin {

  /** Internal bucket column name — shared with the optimizer rewrite
    * ([[graft.plans.RangeJoinRewriteRule]]), whose marker check treats
    * any join condition referencing it as already-bucketized: the rule
    * (auto-on for the point-in-interval shape) must never re-bucket the
    * operator form's own join.
    */
  private[graft] val BucketName = "_graft_rjbkt"

  /** Pick a bucket width from the data: a high percentile of the
    * interval lengths (approx, one aggregation over the interval side),
    * floored at 1. The scaladoc rule of thumb — "near the typical
    * interval length" — as a one-liner, so callers (and the conf-gated
    * rewrite rule's users) don't guess the knob: the interval side's
    * explosion factor stays ~1–2× while points rarely share a bucket
    * with intervals they can't match. Driver-side scalar by design
    * (it IS the knob).
    */
  def suggestBucketWidth(intervals: DataFrame, startCol: String,
                         endCol: String,
                         percentile: Double = 0.75): Long = {
    require(percentile > 0.0 && percentile <= 1.0,
      s"percentile must be in (0, 1], got $percentile")
    val r = intervals
      .filter(col(endCol) > col(startCol))
      .agg(expr(
        s"approx_percentile($endCol - $startCol, $percentile)").as("w"))
      .head()
    if (r.isNullAt(0)) 1L
    else math.max(1L, r.getAs[Number](0).longValue())
  }

  /** Internal level column name (multi-resolution bucketing). */
  private[graft] val LevelName = "_graft_rjlvl"

  /** Geometric level widths: `widths(l) = bucketWidth * cap^l`, as many
    * levels as fit in a Long. Level l serves intervals of length up to
    * `cap * widths(l)`, so an interval explodes to at most `cap + 1`
    * buckets AT ITS OWN LEVEL no matter how long it is — the bound that
    * keeps one year-long outlier among session-scale intervals from
    * exploding to len/width rows (the 100 TB skew hazard).
    */
  private[graft] def levelWidths(bucketWidth: Long, cap: Long): Seq[Long] = {
    val b = Seq.newBuilder[Long]
    var w = bucketWidth
    b += w
    while (w <= Long.MaxValue / cap) { w *= cap; b += w }
    b.result()
  }

  /** The smallest level whose capacity covers `len` (falls through to
    * the last, unbounded-capacity level).
    */
  private def levelOf(len: org.apache.spark.sql.Column, widths: Seq[Long],
                      cap: Long): org.apache.spark.sql.Column =
    widths.init.zipWithIndex.reverse.foldLeft(
        lit(widths.size - 1): org.apache.spark.sql.Column) {
      case (acc, (w, i)) => when(len <= cap * w, lit(i)).otherwise(acc)
    }

  private def widthAt(widths: Seq[Long], lvl: org.apache.spark.sql.Column) =
    element_at(lit(widths.toArray), (lvl + 1).cast("int")).cast("double")

  /** The exploded-to-buckets interval frame at each interval's own
    * level (spec hook: row count ≤ |intervals| · (cap + 2)).
    */
  private[graft] def explodedIntervals(intervals: DataFrame,
      startCol: String, endCol: String, bucketWidth: Long,
      cap: Long): DataFrame = {
    val widths = levelWidths(bucketWidth, cap)
    def bktAt(c: org.apache.spark.sql.Column,
              lvl: org.apache.spark.sql.Column) =
      floor(c / widthAt(widths, lvl)).cast("long")
    intervals.filter(col(endCol) > col(startCol))
      .withColumn(LevelName,
        levelOf(col(endCol) - col(startCol), widths, cap))
      .withColumn(BucketName,
        explode(sequence(bktAt(col(startCol), col(LevelName)),
          bktAt(col(endCol) - 1, col(LevelName)))))
  }

  /** Inner-join `points` to the `intervals` whose half-open
    * [startCol, endCol) span contains the point's `tsCol`, matching
    * `equiKeys` exactly. Timestamp columns are integral (e.g. epoch
    * seconds); empty or inverted intervals (end <= start) match
    * nothing. Output: the joined columns of both sides (minus the
    * internal bucket/level), one row per matching (point, interval)
    * pair.
    *
    * Skew bound — `maxBucketsPerInterval` (cap): intervals longer than
    * `cap * bucketWidth` route to a COARSER level (width `bucketWidth *
    * cap^l`), so no interval ever explodes past `cap + 1` rows; points
    * compute one bucket per level PRESENT in the data (one tiny max
    * aggregation over the interval side decides — when every interval
    * fits level 0, the plan is exactly the classic single-level
    * bucketized join and points don't explode at all). A matching pair
    * still co-occurs exactly once: at the interval's own level, in the
    * point's bucket there. The number of levels grows with the LOG of
    * the longest interval (≤ log_cap(maxLen/width), ~3 for a year of
    * seconds at session width), so the point-side fan-out stays a small
    * constant even under adversarial length distributions.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      equiKeys: Seq[String],
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 256): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval >= 2,
      s"maxBucketsPerInterval must be >= 2, got $maxBucketsPerInterval")
    val cap = maxBucketsPerInterval.toLong
    val widths = levelWidths(bucketWidth, cap)
    val valid = intervals.filter(col(endCol) > col(startCol))
    val maxLvlRow = valid
      .agg(max(levelOf(col(endCol) - col(startCol), widths, cap))).head()
    val maxLvl = if (maxLvlRow.isNullAt(0)) 0 else maxLvlRow.getInt(0)
    val residual =
      col(tsCol) >= col(startCol) && col(tsCol) < col(endCol)
    if (maxLvl == 0) {
      // classic single-level plan: every interval fits the base width
      def bkt(c: org.apache.spark.sql.Column) =
        floor(c / lit(bucketWidth.toDouble)).cast("long")
      val pb = points.withColumn(BucketName, bkt(col(tsCol)))
      val ib = valid.withColumn(BucketName,
        explode(sequence(bkt(col(startCol)), bkt(col(endCol) - 1))))
      pb.join(ib, equiKeys :+ BucketName)
        .filter(residual)
        .drop(BucketName)
    } else {
      def bktAt(c: org.apache.spark.sql.Column,
                lvl: org.apache.spark.sql.Column) =
        floor(c / widthAt(widths, lvl)).cast("long")
      val pb = points
        .withColumn(LevelName, explode(lit((0 to maxLvl).toArray)))
        .withColumn(BucketName, bktAt(col(tsCol), col(LevelName)))
      val ib = explodedIntervals(valid, startCol, endCol, bucketWidth, cap)
      pb.join(ib, equiKeys ++ Seq(LevelName, BucketName))
        .filter(residual)
        .drop(LevelName, BucketName)
    }
  }

  /** Inner-join `left` intervals [lStart, lEnd) to the `right` intervals
    * [rStart, rEnd) they OVERLAP (share at least one instant with),
    * matching `equiKeys` exactly. Both sides explode to their covering
    * buckets; an overlapping pair co-occurs in EVERY bucket the overlap
    * spans, so the join keeps only the overlap's FIRST bucket — the
    * bucket of max(lStart, rStart), which both explosions necessarily
    * cover — making the output exactly one row per overlapping pair
    * with no distinct (and its shuffle) needed. Empty/inverted
    * intervals on either side match nothing.
    *
    * Same skew bound as [[pointInInterval]]: each interval's OWN level
    * caps its explosion at `cap + 1` buckets. For pairs whose levels
    * differ, the pair must meet at ONE common grain, so each interval
    * additionally explodes at every level ABOVE its own up to the max
    * level present — a geometric tail (≤ 2 buckets per coarser level,
    * the interval being shorter than one coarse bucket there) that adds
    * O(log) rows, never O(len). The pair survives exactly once: at
    * level `max(levelL, levelR)`, in the overlap's first bucket there.
    * When everything fits level 0 the plan is the classic single-level
    * join.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      equiKeys: Seq[String],
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 256): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval >= 2,
      s"maxBucketsPerInterval must be >= 2, got $maxBucketsPerInterval")
    val cap = maxBucketsPerInterval.toLong
    val widths = levelWidths(bucketWidth, cap)
    def ownLevel(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s))
        .withColumn("_own", levelOf(col(e) - col(s), widths, cap))
    val lv = ownLevel(left, lStart, lEnd)
    val rv = ownLevel(right, rStart, rEnd)
    def maxLvlOf(df: DataFrame): Int = {
      val r = df.agg(max(col("_own"))).head()
      if (r.isNullAt(0)) 0 else r.getInt(0)
    }
    val maxLvl = math.max(maxLvlOf(lv), maxLvlOf(rv))
    val overlapResidual =
      col(lStart) < col(rEnd) && col(rStart) < col(lEnd)
    if (maxLvl == 0) {
      def bkt(c: org.apache.spark.sql.Column) =
        floor(c / lit(bucketWidth.toDouble)).cast("long")
      def explodeBuckets(df: DataFrame, s: String, e: String) =
        df.drop("_own")
          .withColumn(BucketName,
            explode(sequence(bkt(col(s)), bkt(col(e) - 1))))
      explodeBuckets(lv, lStart, lEnd)
        .join(explodeBuckets(rv, rStart, rEnd), equiKeys :+ BucketName)
        .filter(overlapResidual)
        .filter(col(BucketName) === bkt(greatest(col(lStart), col(rStart))))
        .drop(BucketName)
    } else {
      def bktAt(c: org.apache.spark.sql.Column,
                lvl: org.apache.spark.sql.Column) =
        floor(c / widthAt(widths, lvl)).cast("long")
      def explodeML(df: DataFrame, s: String, e: String, ownOut: String) =
        df.withColumn(LevelName,
            explode(sequence(col("_own"), lit(maxLvl))))
          .withColumn(BucketName,
            explode(sequence(bktAt(col(s), col(LevelName)),
              bktAt(col(e) - 1, col(LevelName)))))
          .withColumnRenamed("_own", ownOut)
      explodeML(lv, lStart, lEnd, "_ownL")
        .join(explodeML(rv, rStart, rEnd, "_ownR"),
          equiKeys ++ Seq(LevelName, BucketName))
        .filter(overlapResidual)
        .filter(col(LevelName) === greatest(col("_ownL"), col("_ownR")))
        .filter(col(BucketName) ===
          bktAt(greatest(col(lStart), col(rStart)), col(LevelName)))
        .drop(LevelName, BucketName, "_ownL", "_ownR")
    }
  }

  /** Backward as-of join: each left row picks up the single right row
    * with the GREATEST right ts <= its own ts under the same keys —
    * left-outer semantics (no qualifying right row, or one farther back
    * than `tolerance`, leaves the payload null).
    *
    * Shape: union-and-window, the one-shuffle formulation — both sides
    * union (right reduced to keys + ts + payload), sort within each key
    * by (ts, right-before-left) and carry the payload forward with a
    * running `last(..., ignoreNulls)` frame; left rows then read their
    * own row. Cost is ONE shuffle of |L|+|R| rows by the equi keys —
    * never a per-row range probe, never a nested loop, and a key's
    * whole history never concentrates beyond its own partition slice.
    * This generalizes the J4 interpolated-reference machinery
    * ([[Reduction]]) into a reusable temporal-join operator.
    *
    * `right` must be unique per (equiKeys, ts) — pre-aggregate ties
    * first (a duplicate would make "the" as-of row order-dependent on
    * any engine, DuckDB's ASOF included). Right rows with a NULL ts are
    * dropped up front (no comparison can match them, and they must not
    * be carried as payload donors). `payloadCols` must not collide with
    * left column names. Output: every left column, the payload columns
    * (null when unmatched/out-of-tolerance), and `asof_ts` = the
    * matched right ts.
    *
    * The carry is ONE `last(struct(ts, payload...), ignoreNulls)` — a
    * single struct per right row — never per-column carries: a
    * per-column `last(..., ignoreNulls)` would fill a payload column
    * holding NULL in the matched row from a FARTHER-BACK right row,
    * silently mixing rows in one output record.
    */
  /** The gap used by TOLERANCE checks: EXACT epoch MICROSECONDS for
    * timestamp types (a timestamp difference is a DayTimeInterval, which
    * cannot compare against the long tolerance; `unix_micros` keeps the
    * full sub-second precision — an epoch-SECOND cast would floor, so a
    * 1-second tolerance would admit true gaps up to ~2 s and raising it
    * to a fractional 1.5 could REMOVE matches, a monotonicity violation),
    * DAYS for DateType, the raw difference otherwise. Compare against
    * [[tolLimit]] of the same axis so gap and bound share the grain.
    * Shared with the declarative rewrite ([[graft.plans
    * .AsofJoinRewriteRule]]) so the two forms cannot drift.
    *
    * NTZ note: the NTZ→TZ cast is session-zone dependent, but the
    * DIFFERENCE of two casts is not.
    */
  private[graft] def tolGap(later: Column, earlier: Column,
                            dt: org.apache.spark.sql.types.DataType)
      : Column = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      unix_micros(later.cast("timestamp")) -
        unix_micros(earlier.cast("timestamp"))
    case org.apache.spark.sql.types.DateType => datediff(later, earlier)
    case _ => later - earlier
  }

  /** The tolerance bound in [[tolGap]]'s grain: microseconds on
    * timestamp axes (`tol` is in SECONDS), days on dates, raw otherwise.
    */
  private[graft] def tolLimit(tol: Long,
                              dt: org.apache.spark.sql.types.DataType)
      : Column = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      lit(tol * 1000000L)
    case _ => lit(tol)
  }

  /** `gap(later, earlier) <= tol` with gap and bound in the axis grain. */
  private def tolOkOp(later: Column, earlier: Column, df: DataFrame,
                      tsCol: String, tol: Long): Column = {
    val dt = df.schema(tsCol).dataType
    tolGap(later, earlier, dt) <= tolLimit(tol, dt)
  }

  /** Right rows whose ts or ANY equi key is NULL are dropped up front:
    * SQL equality never matches a NULL key, so such a row can donate
    * payload to nothing — and keeping it would let the window
    * PARTITION (which groups NULLs together) hand it to a NULL-key
    * left row. NULL-key left rows stay: they group among themselves,
    * find no right row, and keep null payloads.
    */
  private def matchableRight(r: DataFrame, tsCol: String,
                             equiKeys: Seq[String]): DataFrame =
    equiKeys.foldLeft(r.filter(col(tsCol).isNotNull))(
      (df, k) => df.filter(col(k).isNotNull))

  def asofBackward(left: DataFrame, right: DataFrame, tsCol: String,
                   equiKeys: Seq[String], payloadCols: Seq[String],
                   tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("_side", lit(1))
    val r = matchableRight(right
      .select((equiKeys :+ tsCol).map(col) ++ payloadCols.map(col): _*),
      tsCol, equiKeys)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_pack", when(col("_side") === 0,
        struct((tsCol +: payloadCols).map(col): _*)))
    val w = Window.partitionBy(equiKeys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val packed = u
      .withColumn("_m", last(col("_pack"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1).drop("_side", "_pack")
    val filled = payloadCols
      .foldLeft(packed)((df, c) =>
        df.withColumn(c, col("_m").getField(c)))
      .withColumn("asof_ts", col("_m").getField(tsCol))
      .drop("_m")
    tolerance match {
      case Some(tol) =>
        val ok = col("asof_ts").isNotNull &&
          tolOkOp(col(tsCol), col("asof_ts"), left, tsCol, tol)
        payloadCols.foldLeft(filled)((df, c) =>
            df.withColumn(c, when(ok, col(c))))
          .withColumn("asof_ts", when(ok, col("asof_ts")))
      case None => filled
    }
  }

  /** Forward as-of join: each left row picks up the single right row with
    * the SMALLEST right ts >= its own ts under the same keys ("the next
    * reading at-or-after") — [[asofBackward]]'s mirror, same
    * union-and-window one-shuffle shape with a FOLLOWING frame and a
    * running `first(..., ignoreNulls)`. Left rows sort BEFORE right rows
    * at the same instant, so a same-ts right row is matched (at-or-after
    * is inclusive, mirroring backward's at-or-before). `tolerance` bounds
    * `asof_ts - ts`. Same contracts as backward: `right` unique per
    * (equiKeys, ts); unmatched left rows keep null payloads.
    */
  def asofForward(left: DataFrame, right: DataFrame, tsCol: String,
                  equiKeys: Seq[String], payloadCols: Seq[String],
                  tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("_side", lit(0))
    val r = matchableRight(right
      .select((equiKeys :+ tsCol).map(col) ++ payloadCols.map(col): _*),
      tsCol, equiKeys)
      .withColumn("_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_pack", when(col("_side") === 1,
        struct((tsCol +: payloadCols).map(col): _*)))
    val w = Window.partitionBy(equiKeys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(0, Window.unboundedFollowing)
    // a left row with NULL ts matches NOTHING ("smallest rts >= NULL"
    // has no SQL solution) — but it sorts NULLS FIRST, where the
    // FOLLOWING frame would hand it the earliest right row; guard the
    // carry (backward's PRECEDING frame is safe by the same ordering)
    val packed = u
      .withColumn("_m", when(col(tsCol).isNotNull,
        first(col("_pack"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 0).drop("_side", "_pack")
    val filled = payloadCols
      .foldLeft(packed)((df, c) =>
        df.withColumn(c, col("_m").getField(c)))
      .withColumn("asof_ts", col("_m").getField(tsCol))
      .drop("_m")
    tolerance match {
      case Some(tol) =>
        val ok = col("asof_ts").isNotNull &&
          tolOkOp(col("asof_ts"), col(tsCol), left, tsCol, tol)
        payloadCols.foldLeft(filled)((df, c) =>
            df.withColumn(c, when(ok, col(c))))
          .withColumn("asof_ts", when(ok, col("asof_ts")))
      case None => filled
    }
  }

  /** Nearest as-of join: each left row picks the right row with the
    * smaller |gap| of the backward and forward candidates, ties going
    * BACKWARD (the deterministic convention). Still one shuffle: both
    * arms are windows over the SAME (keys, (ts, side)) sort — right rows
    * first at equal ts, so the backward frame `[unbounded, 0]` sees a
    * same-instant right row (gap 0) and wins any tie, which makes the
    * forward frame's exclusion of same-instant rows unobservable.
    * `tolerance` bounds each arm's gap independently; a left row whose
    * arms are both out of tolerance (or absent) keeps null payloads.
    * `asof_dir` reports which arm matched (`backward` | `forward`).
    */
  def asofNearest(left: DataFrame, right: DataFrame, tsCol: String,
                  equiKeys: Seq[String], payloadCols: Seq[String],
                  tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("_side", lit(1))
    val r = matchableRight(right
      .select((equiKeys :+ tsCol).map(col) ++ payloadCols.map(col): _*),
      tsCol, equiKeys)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_pack", when(col("_side") === 0,
        struct((tsCol +: payloadCols).map(col): _*)))
    val ord = Window.partitionBy(equiKeys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wF = ord.rowsBetween(0, Window.unboundedFollowing)
    // each arm carries its candidate row as ONE struct (see
    // [[asofBackward]]): a per-column carry would mix rows — and here
    // even a row OUTSIDE tolerance could donate a column, since the
    // tolerance check only reads the arm's ts
    val armed = u
      .withColumn("_bp", last(col("_pack"), ignoreNulls = true).over(wB))
      .withColumn("_fp", first(col("_pack"), ignoreNulls = true).over(wF))
      .filter(col("_side") === 1).drop("_side", "_pack")
    val bTs = col("_bp").getField(tsCol)
    val fTs = col("_fp").getField(tsCol)
    val gapB = col(tsCol) - bTs
    val gapF = fTs - col(tsCol)
    // a NULL-ts left row matches neither arm (it sorts NULLS FIRST,
    // where the forward frame would otherwise hand it the earliest
    // right row — see asofForward)
    val bOk = col(tsCol).isNotNull && bTs.isNotNull &&
      tolerance.map(t => tolOkOp(col(tsCol), bTs, left, tsCol, t))
        .getOrElse(lit(true))
    val fOk = col(tsCol).isNotNull && fTs.isNotNull &&
      tolerance.map(t => tolOkOp(fTs, col(tsCol), left, tsCol, t))
        .getOrElse(lit(true))
    val useB = bOk && (!fOk || gapB <= gapF)
    val picked = payloadCols.foldLeft(armed)((df, c) =>
        df.withColumn(c,
          when(useB, col("_bp").getField(c))
            .when(fOk, col("_fp").getField(c))))
      .withColumn("asof_ts", when(useB, bTs).when(fOk, fTs))
      .withColumn("asof_dir",
        when(useB, lit("backward")).when(fOk, lit("forward"))
          .cast("string"))
    picked.drop("_bp", "_fp")
  }
}
