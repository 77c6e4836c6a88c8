package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Outlier rejection over curve ensembles.
  *
  * Reference: trx/filters.py — `applyFilter` (17-24), `removeZingers`
  * (51-81), `filterOutlier` (83-101), `chi2Filter` (103-120).
  *
  * The reference mutates bundles in place, keeping `unfiltered` backups
  * (filters.py:26-48); here every step returns a new immutable DataFrame and
  * the "unfiltered original" is simply the input lineage. `applyFilter`'s
  * generic "apply this boolean vector to every same-length array" collapses
  * to a single relational `filter` because alignment is by key, not
  * position.
  */
object Filters {

  /** F1 — generic filter: keep rows satisfying `keep`. The whole of
    * trx/filters.py:17-24 in one relational op.
    */
  def applyFilter(df: DataFrame, keepPred: Column): DataFrame = df.filter(keepPred)

  /** A8 — robust per-bin statistics for zinger removal
    * (trx/filters.py:51-81): per q_bin, median and MAD (median absolute
    * deviation) across curves; a point is a zinger when
    * |i − median| > nSigma × 1.4826 × MAD. Gradient pre-detrending
    * (filters.py:61-62) is available via `detrend`.
    *
    * Two-pass exact medians (groupBy + broadcast join back); at 100 TB the
    * per-bin group sizes are n_images — bounded — so exact median is safe.
    */
  def zingerStats(curves: DataFrame): DataFrame = {
    val med = curves.groupBy(col("q_bin")).agg(median(col("i")).as("med_i"))
    val withMed = curves.join(broadcast(med), Seq("q_bin"))
    val mad = withMed.groupBy(col("q_bin"))
      .agg(median(abs(col("i") - col("med_i"))).as("mad_i"))
    med.join(mad, Seq("q_bin"))
  }

  /** A8 fused: same statistics in ONE aggregation (one shuffle) via the
    * single-pass median+MAD Aggregator. Saves a shuffle, but buffers each
    * group's values (primitive array, 8 B/value) — use when per-group
    * cardinality is bounded (n_images per q_bin); for unbounded groups the
    * two-pass `zingerStats` above is the scale-safe default. Asserted
    * equal to `zingerStats` in the test suite.
    */
  def zingerStatsOnePass(curves: DataFrame): DataFrame =
    curves.groupBy(col("q_bin"))
      .agg(graft.functions.MedianMadAgg(col("i")).as("mm"))
      .select(col("q_bin"), col("mm.median").as("med_i"), col("mm.mad").as("mad_i"))

  /** Remove zingers using `zingerStats`; returns surviving rows. */
  def removeZingers(curves: DataFrame, nSigma: Double = 5.0): DataFrame = {
    val stats = zingerStats(curves)
    curves.join(broadcast(stats), Seq("q_bin"))
      .filter(abs(col("i") - col("med_i")) <= lit(nSigma * 1.4826) * col("mad_i"))
      .drop("med_i", "mad_i")
  }

  /** W3 — central-difference derivative across acquisition order per q_bin
    * (trx/filters.py:61-62 uses np.gradient for trend removal before zinger
    * detection).
    */
  def detrend(curves: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_bin")).orderBy(col("image_idx"))
    val prev = lag(col("i"), 1).over(w)
    val next = lead(col("i"), 1).over(w)
    // np.gradient edge handling: one-sided differences at the ends.
    val grad = when(prev.isNull, next - col("i"))
      .when(next.isNull, col("i") - prev)
      .otherwise((next - prev) / 2.0)
    curves.withColumn("i_grad", grad)
  }

  /** A9 — global outlier chi²: per curve, Σ_q ((i − median_q)/err)² / nQ;
    * keep curves below threshold (trx/filters.py:83-101 — implementing the
    * evident intent, per-q median; the reference's scalar `np.median` over
    * the whole matrix is a noted bug, SURVEY §2.5 A9).
    */
  def outlierChi2(curves: DataFrame): DataFrame = {
    val med = curves.groupBy(col("q_bin")).agg(median(col("i")).as("med_i"))
    curves.join(broadcast(med), Seq("q_bin"))
      .groupBy(col("image_idx"))
      .agg((sum(pow(when(col("err") =!= 0.0,
        (col("i") - col("med_i")) / col("err")), 2)) /
        count(lit(1))).as("chi2"))
  }

  /** A10 + chi² filter (trx/filters.py:103-120): threshold per-repetition
    * chi²₀; `threshold = None` → 'auto' = 95th percentile
    * (filters.py:105-106). Returns the image indices to KEEP.
    *
    * `extraKeys` (F8): the auto percentile is computed per split group —
    * the reference's split_angle loop thresholds within each angle subset.
    */
  def chi2Filter(chi2PerRep: DataFrame, threshold: Option[Double] = None,
                 extraKeys: Seq[String] = Nil): DataFrame = {
    // null chi2 (zero-noise group: repetitions agree exactly) → keep; only
    // a measured excess variance rejects a repetition.
    def keep(thr: Column): Column = col("chi2_0").isNull || col("chi2_0") < thr
    threshold match {
      case Some(t) => chi2PerRep.filter(keep(lit(t)))
      case None =>
        val auto =
          if (extraKeys.isEmpty)
            chi2PerRep.agg(expr("percentile(chi2_0, 0.95)").as("_thr"))
          else chi2PerRep.groupBy(extraKeys.map(col): _*)
            .agg(expr("percentile(chi2_0, 0.95)").as("_thr"))
        val joined =
          if (extraKeys.isEmpty) chi2PerRep.join(broadcast(auto))
          else chi2PerRep.join(broadcast(auto), extraKeys)
        joined.filter(col("_thr").isNull || keep(col("_thr"))).drop("_thr")
    }
  }

  /** Filter application with bookkeeping (trx/filters.py:26-48): returns the
    * input annotated with a `kept` flag instead of dropping rows, so
    * downstream re-aggregation can either honour or ignore the filter —
    * mirrors the reference's `unfiltered` backup without mutation.
    */
  def flagFilter(df: DataFrame, keepPred: Column): DataFrame =
    df.withColumn("kept", keepPred)
}
