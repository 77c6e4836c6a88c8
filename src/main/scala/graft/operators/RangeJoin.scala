package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Inner-join `points` to the `intervals` whose half-open
    * [startCol, endCol) span contains the point's `tsCol`, matching
    * `equiKeys` exactly. Timestamp columns are integral (e.g. epoch
    * seconds); empty or inverted intervals (end <= start) match
    * nothing. Output: the joined columns of both sides (minus the
    * internal bucket), one row per matching (point, interval) pair.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      equiKeys: Seq[String],
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bkt(c: org.apache.spark.sql.Column) =
      floor(c / lit(bucketWidth.toDouble)).cast("long")
    val pb = points.withColumn("_bkt", bkt(col(tsCol)))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bkt",
        explode(sequence(bkt(col(startCol)), bkt(col(endCol) - 1))))
    pb.join(ib, equiKeys :+ "_bkt")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bkt")
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
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      equiKeys: Seq[String],
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def bkt(c: org.apache.spark.sql.Column) =
      floor(c / lit(bucketWidth.toDouble)).cast("long")
    def explodeBuckets(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s))
        .withColumn("_bkt", explode(sequence(bkt(col(s)), bkt(col(e) - 1))))
    explodeBuckets(left, lStart, lEnd)
      .join(explodeBuckets(right, rStart, rEnd), equiKeys :+ "_bkt")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("_bkt") === bkt(greatest(col(lStart), col(rStart))))
      .drop("_bkt")
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
    * any engine, DuckDB's ASOF included). `payloadCols` must not
    * collide with left column names. Output: every left column, the
    * payload columns (null when unmatched/out-of-tolerance), and
    * `asof_ts` = the matched right ts.
    */
  def asofBackward(left: DataFrame, right: DataFrame, tsCol: String,
                   equiKeys: Seq[String], payloadCols: Seq[String],
                   tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("_side", lit(1))
    val r = right
      .select((equiKeys :+ tsCol).map(col) ++ payloadCols.map(col): _*)
      .withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(equiKeys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def carried(c: org.apache.spark.sql.Column) =
      last(when(col("_side") === 0, c), ignoreNulls = true).over(w)
    val filled = payloadCols
      .foldLeft(u)((df, c) => df.withColumn(c, carried(col(c))))
      .withColumn("asof_ts", carried(col(tsCol)))
      .filter(col("_side") === 1).drop("_side")
    tolerance match {
      case Some(tol) =>
        val ok = col("asof_ts").isNotNull &&
          (col(tsCol) - col("asof_ts")) <= tol
        payloadCols.foldLeft(filled)((df, c) =>
            df.withColumn(c, when(ok, col(c))))
          .withColumn("asof_ts", when(ok, col("asof_ts")))
      case None => filled
    }
  }
}
