package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeFunctions

/** Time-resolved data reduction: reference interpolation, difference
  * signals, per-delay averaging with error propagation and chi² statistics.
  *
  * Reference: trx/dataReduction.py (`interp_references` 15-85,
  * `averageScanPoints` 88-205, `calcTimeResolvedSignal` 208-243) and the
  * id9 orchestration (trx/id9.py:226-303).
  *
  * Input model: long-form curve table `(image_idx, delay, q_bin, i, err)` —
  * one row per (shot, q bin). `image_idx` is the acquisition order (the
  * reference aligns arrays positionally; we key on the index explicitly).
  *
  * Scale notes: the as-of interpolation (J4) uses windows ordered by
  * `image_idx` partitioned by `q_bin` — n_images rows per partition,
  * thousands of independent q-bin partitions → parallel and spill-safe at
  * any image count. The delay aggregation (A3) is a hash agg keyed on
  * (delay, q_bin): output cardinality n_delays × nQ regardless of input
  * size, so partial aggregation collapses the shuffle to near-nothing.
  */
object Reduction {

  /** J5 — tag reference shots (trx/dataReduction.py:223-230, id9.py:276-281).
    * `refDelay`: None → min delay excluding the laser-off sentinel (-10);
    * Some(v) → |delay - v| < atol. Implemented with a scalar-subquery-style
    * broadcast of the min.
    *
    * `extraKeys` (F8): the reference's split_angle runs the WHOLE
    * reduction per angle subset (id9.py:246-263), so the min-delay search
    * is per split group — one broadcast of the per-group minima here.
    */
  def tagReferences(curves: DataFrame, refDelay: Option[Double] = None,
                    atol: Double = 1e-12,
                    extraKeys: Seq[String] = Nil): DataFrame =
    refDelay match {
      case Some(v) =>
        curves.withColumn("is_ref", abs(col("delay") - v) < atol)
      case None =>
        val nonOff = curves.filter(col("delay") =!= TimeFunctions.OffSentinel)
        val minDelay =
          if (extraKeys.isEmpty) nonOff.agg(min(col("delay")).as("ref_delay"))
          else nonOff.groupBy(extraKeys.map(col): _*)
            .agg(min(col("delay")).as("ref_delay"))
        val joined =
          if (extraKeys.isEmpty) curves.join(broadcast(minDelay))
          else curves.join(broadcast(minDelay), extraKeys)
        joined
          .withColumn("is_ref", abs(col("delay") - col("ref_delay")) < atol)
          .drop("ref_delay")
    }

  /** J4 — interpolated reference as-of join (trx/dataReduction.py:15-85).
    *
    * For each shot, the "reference curve" is the linear interpolation (by
    * image index) between the nearest reference shot before and after:
    *   - shots before the first ref clamp to the first ref (py:63-64);
    *   - shots after the last ref clamp to the last ref (py:65-67);
    *   - a reference shot's own reference excludes itself — it interpolates
    *     between its neighbouring refs (clamping at the ends) (py:69-83);
    *   - with a single reference, everything uses it verbatim (py:50-52).
    *
    * Emitted column: `i_ref` (same q_bin, same row grain).
    */
  def interpolateReferences(tagged: DataFrame,
                            extraKeys: Seq[String] = Nil): DataFrame = {
    // Both "nearest ref before" and "nearest ref after" are expressed as
    // RUNNING frames (unboundedPreceding → -1), the latter over DESCENDING
    // image order. Spark evaluates running frames incrementally in O(n);
    // the naive `rowsBetween(1, unboundedFollowing)` frame re-scans the
    // partition tail per row — O(n²), minutes instead of seconds at 100k+
    // images per q_bin. With F8 split keys the as-of neighbourhood is
    // per split group (the reference interpolates within each angle
    // subset), so the keys join the window partition.
    val part = (Seq("q_bin") ++ extraKeys).map(col)
    val asc  = Window.partitionBy(part: _*).orderBy(col("image_idx"))
    val desc = Window.partitionBy(part: _*).orderBy(col("image_idx").desc)
    val before = asc.rowsBetween(Window.unboundedPreceding, -1)
    val after  = desc.rowsBetween(Window.unboundedPreceding, -1)

    val refIdx = when(col("is_ref"), col("image_idx"))
    val refI   = when(col("is_ref"), col("i"))

    // Strict frames exclude the current row, which implements the
    // ref-of-ref self-exclusion for free; for non-ref rows strict and
    // inclusive frames are identical (their own refIdx is null).
    // One projection for all four → Catalyst collapses them into exactly
    // two Window operators (one per ordering).
    val withNbrs = tagged.select(col("*"),
      last(refIdx, ignoreNulls = true).over(before).as("_p_idx"),
      last(refI,   ignoreNulls = true).over(before).as("_p_i"),
      last(refIdx, ignoreNulls = true).over(after).as("_n_idx"),
      last(refI,   ignoreNulls = true).over(after).as("_n_i"))

    // ANSI-safe: a zero denominator (possible only if image_idx is not
    // unique within a q_bin partition) yields null instead of an error.
    val span = (col("_n_idx") - col("_p_idx")).cast("double")
    val frac = when(span =!= 0.0,
      (col("image_idx") - col("_p_idx")).cast("double") / span)
    val interp =
      // A reference shot with NO neighbouring refs (single-ref run) uses
      // its own curve verbatim (py:50-52) — the strict frames would
      // otherwise leave it null.
      when(col("_p_idx").isNull && col("_n_idx").isNull,
          when(col("is_ref"), col("i")))
        .when(col("_p_idx").isNull, col("_n_i"))  // before first ref → clamp
        .when(col("_n_idx").isNull, col("_p_i")) // after last ref → clamp
        .otherwise(col("_p_i") + (col("_n_i") - col("_p_i")) * frac)

    withNbrs
      .withColumn("i_ref", interp)
      .drop("_p_idx", "_p_i", "_n_idx", "_n_i")
  }

  /** Difference (or ratio) signal vs the interpolated reference —
    * trx/dataReduction.py:144-147.
    */
  def diffSignal(withRef: DataFrame, useRatio: Boolean = false): DataFrame = {
    val d = if (useRatio) col("i") / col("i_ref") else col("i") - col("i_ref")
    withRef.withColumn("diff", d)
  }

  /** Mark (don't drop) the thinned-away reference repetitions: adds a
    * boolean `keepName` column — false for every 2nd ref rep. The MARK form
    * lets `averageScanPoints` average over the kept rows while computing
    * noise/err over ALL rows, as the reference does (dataReduction.py:
    * noise at 176-180 BEFORE the `[::2]` thinning at 182-184).
    */
  def markThinnedReferences(curves: DataFrame,
                            keepName: String = "_keep",
                            extraKeys: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy((Seq("delay", "q_bin") ++ extraKeys).map(col): _*)
      .orderBy(col("image_idx"))
    curves.withColumn("_rep", row_number().over(w))
      .withColumn(keepName, !col("is_ref") || col("_rep") % 2 === 1)
      .drop("_rep")
  }

  /** W2 — reference thinning: keep every 2nd repetition of the reference
    * group (trx/dataReduction.py:177-179), because consecutive refs are
    * correlated through the interpolation.
    */
  def thinReferences(curves: DataFrame, extraKeys: Seq[String] = Nil): DataFrame =
    markThinnedReferences(curves, extraKeys = extraKeys)
      .filter(col("_keep")).drop("_keep")

  /** A3 — per-delay averaging of repetitions (trx/dataReduction.py:88-205):
    * group (delay, q_bin); mean or median over reps (`funcForAveraging`);
    * noise = population stddev across reps (np.nanstd, ddof=0, py:180);
    * error-of-mean = noise/√n. Output grain: (delay, q_bin).
    *
    * `keepCol`: optional boolean column (see `markThinnedReferences`) —
    * the center and n_rep use only kept rows, while noise and err use the
    * FULL group, exactly like the reference (noise is computed before the
    * `[::2]` ref thinning, and err divides by the unthinned count).
    */
  /** `extraKeys` implements F8 (trx/id9.py:246-263 `split_angle`): the
    * reference loops the whole reduction once per unique log angle; here
    * the angle is just one more grouping key — one pass, no loop.
    */
  def averageScanPoints(diffs: DataFrame, useMedian: Boolean = false,
                        extraKeys: Seq[String] = Nil,
                        keepCol: Option[Column] = None): DataFrame = {
    val kept = keepCol.map(k => when(k, col("diff"))).getOrElse(col("diff"))
    val center = if (useMedian) median(kept) else avg(kept)
    val nKept = keepCol.map(k => sum(when(k, 1L)))
      .getOrElse(count(lit(1)))
    diffs
      .withColumn("delay", TimeFunctions.canonicalDelay(col("delay")))
      .groupBy((Seq("delay", "q_bin") ++ extraKeys).map(col): _*)
      .agg(
        center.as("diff_av"),
        stddev_pop(col("diff")).as("noise"),
        nKept.as("n_rep"),
        (stddev_pop(col("diff")) / sqrt(count(lit(1)))).as("err"))
  }

  /** A4 — per-repetition chi² against the group mean
    * (trx/dataReduction.py:186-196): for each (delay, image) repetition,
    * chi²₀ = Σ_q ((diff − mean_q)/noise_q)² / nQ. Feeds the chi² outlier
    * filter (Filters.chi2Filter).
    */
  def chi2PerRepetition(diffs: DataFrame,
                        extraKeys: Seq[String] = Nil): DataFrame = {
    val grp = Window.partitionBy(
      (Seq("delay", "q_bin") ++ extraKeys).map(col): _*)
    diffs
      .withColumn("_mean", avg(col("diff")).over(grp))
      // population stddev: the reference's noise is np.nanstd (ddof=0,
      // dataReduction.py:180) — same ensemble the chi² divides by.
      .withColumn("_noise", stddev_pop(col("diff")).over(grp))
      // an image belongs to exactly one split group, so the keys ride
      // along in the grouping (needed downstream for per-split filters)
      .groupBy((Seq("delay", "image_idx") ++ extraKeys).map(col): _*)
      .agg(
        (sum(pow(when(col("_noise") =!= 0.0,
          (col("diff") - col("_mean")) / col("_noise")), 2)) /
          count(lit(1))).as("chi2_0"))
  }

  /** Global per-q mean and median over the whole run
    * (trx/dataReduction.py:126-127) — the second aggregation without the
    * delay key.
    */
  def globalStats(diffs: DataFrame): DataFrame =
    diffs.groupBy(col("q_bin"))
      .agg(avg(col("diff")).as("average"), median(col("diff")).as("median"))

  /** E2 composition — `calcTimeResolvedSignal` (trx/dataReduction.py:208-243)
    * without the monitor step (compose with Azav.normalizeQRange upstream):
    * tag refs → interpolate → diff → thin refs → per-delay average.
    */
  def timeResolvedSignal(curves: DataFrame, refDelay: Option[Double] = None,
                         useRatio: Boolean = false,
                         useMedian: Boolean = false): DataFrame = {
    val tagged = tagReferences(curves, refDelay)
    val withRef = interpolateReferences(tagged)
    val diffs = diffSignal(withRef, useRatio)
    // Mark (not drop) the thinned refs: the center averages kept rows,
    // noise/err keep the full ensemble (reference parity, py:176-184).
    val marked = markThinnedReferences(diffs)
    averageScanPoints(marked, useMedian, keepCol = Some(col("_keep")))
  }
}
