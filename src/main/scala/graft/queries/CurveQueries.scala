package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{Azav, Filters, Reduction}
import QueryUtil._
import Tables._

/** Driver-checked queries over the curve model (SURVEY §2.5/§2.6/§2.7):
  * the time-resolved reduction pipeline and its statistical operators,
  * exercised on the deterministic lineitem→curves mapping (Tables.scala)
  * and hash-checked against DuckDB oracles.
  */
object CurveQueries {

  /** Shared oracle prefix: curves → reference tagging (J5) → interpolated
    * as-of reference join (J4, trx/dataReduction.py:15-85). Strict
    * before/after window frames are correct for ALL rows: for non-reference
    * rows the current row contributes NULL anyway (see
    * Reduction.interpolateReferences).
    */
  private def interpSql(curvesBlock: String): String =
    s"""WITH $curvesBlock,
       |tagged AS (
       |  SELECT c.*,
       |         abs(delay - (SELECT min(delay) FROM curves WHERE delay <> -10.0)) < 1e-12 AS is_ref
       |  FROM curves c),
       |nbrs AS (
       |  SELECT *,
       |    last_value(CASE WHEN is_ref THEN image_idx END IGNORE NULLS) OVER w_before AS p_idx,
       |    last_value(CASE WHEN is_ref THEN i END IGNORE NULLS) OVER w_before AS p_i,
       |    first_value(CASE WHEN is_ref THEN image_idx END IGNORE NULLS) OVER w_after AS n_idx,
       |    first_value(CASE WHEN is_ref THEN i END IGNORE NULLS) OVER w_after AS n_i
       |  FROM tagged
       |  WINDOW
       |    w_before AS (PARTITION BY q_bin ORDER BY image_idx
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    w_after  AS (PARTITION BY q_bin ORDER BY image_idx
       |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
       |interp AS (
       |  SELECT image_idx, delay, q_bin, i, err, is_ref,
       |    CASE WHEN p_idx IS NULL AND n_idx IS NULL
       |           THEN (CASE WHEN is_ref THEN i END)
       |         WHEN p_idx IS NULL THEN n_i
       |         WHEN n_idx IS NULL THEN p_i
       |         ELSE p_i + (n_i - p_i) *
       |              ((image_idx - p_idx)::DOUBLE / (n_idx - p_idx)::DOUBLE)
       |    END AS i_ref
       |  FROM nbrs)""".stripMargin

  /** The E2 reduction's oracle — shared by q03 (batch) and q63 (the
    * incremental streaming path must land on the SAME full-history result;
    * q63 runs on a deterministic ¼ subset so the bench pays the state
    * lifecycle, not 3× the full reduction).
    */
  private def timeResolvedOracleSql(curvesBlock: String = curvesSql): String =
    s"""${interpSql(curvesBlock)},
       |diffs AS (SELECT *, i - i_ref AS diff FROM interp),
       |marked AS (
       |  SELECT *, (NOT is_ref OR rn % 2 = 1) AS keep FROM (
       |    SELECT *, row_number() OVER (PARTITION BY delay, q_bin
       |                                ORDER BY image_idx) AS rn
       |    FROM diffs))
       |SELECT round(delay, 12) AS delay, q_bin,
       |       round(avg(CASE WHEN keep THEN diff END), 4) AS diff_av,
       |       round(stddev_pop(diff), 4) AS noise,
       |       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_rep,
       |       round(stddev_pop(diff) / sqrt(count(*)), 4) AS err
       |FROM marked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // A3 — scan-point averaging (trx/dataReduction.py:88-205).
    QueryDef("q01_a3_delay_average",
      (s, dir) => {
        val diffs = curves(s, dir).withColumn("diff", col("i"))
        Reduction.averageScanPoints(diffs)
          .select(col("delay"), col("q_bin"),
            r6(col("diff_av")).as("diff_av"), r6(col("noise")).as("noise"),
            col("n_rep"), r6(col("err")).as("err"))
          .orderBy("delay", "q_bin")
      },
      Some(s"""WITH ${curvesSql}
        |SELECT round(delay, 12) AS delay, q_bin,
        |       round(avg(i), 6) AS diff_av,
        |       round(stddev_pop(i), 6) AS noise,
        |       count(*) AS n_rep,
        |       round(stddev_pop(i) / sqrt(count(*)), 6) AS err
        |FROM curves GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // J5 + J4 — reference tagging and interpolated as-of reference join.
    QueryDef("q02_j4_interp_reference",
      (s, dir) => {
        val withRef = Reduction.interpolateReferences(
          Reduction.tagReferences(curves(s, dir)))
        withRef.groupBy(col("q_bin"))
          .agg(count(lit(1)).as("n"), stableSum(col("i_ref")).as("sum_ref"))
          .orderBy("q_bin")
      },
      Some(s"""${interpSql(curvesSql)}
        |SELECT q_bin, count(*) AS n,
        |       ${stableSumSql("i_ref")} AS sum_ref
        |FROM interp GROUP BY q_bin ORDER BY q_bin""".stripMargin)),

    // E2 — full time-resolved reduction: tag → interp → diff → thin → A3.
    QueryDef("q03_e2_time_resolved",
      (s, dir) => {
        Reduction.timeResolvedSignal(curves(s, dir))
          .select(col("delay"), col("q_bin"),
            r4(col("diff_av")).as("diff_av"), r4(col("noise")).as("noise"),
            col("n_rep"), r4(col("err")).as("err"))
          .orderBy("delay", "q_bin")
      },
      Some(timeResolvedOracleSql())),

    // A4 — per-repetition chi² against the per-(delay,q_bin) ensemble.
    QueryDef("q04_a4_chi2_per_rep",
      (s, dir) => {
        val diffs = Reduction.diffSignal(
          Reduction.interpolateReferences(
            Reduction.tagReferences(curves(s, dir))))
        Reduction.chi2PerRepetition(diffs)
          .groupBy(col("delay"))
          .agg(count(lit(1)).as("n_img"), r4(avg(col("chi2_0"))).as("avg_chi2"))
          .orderBy("delay")
      },
      Some(s"""${interpSql(curvesSql)},
        |diffs AS (SELECT *, i - i_ref AS diff FROM interp),
        |stats AS (
        |  SELECT *, avg(diff) OVER (PARTITION BY delay, q_bin) AS m,
        |            stddev_pop(diff) OVER (PARTITION BY delay, q_bin) AS noise
        |  FROM diffs),
        |chi2 AS (
        |  SELECT delay, image_idx,
        |         sum(power(CASE WHEN noise <> 0 THEN (diff - m) / noise END, 2))
        |           / count(*) AS chi2_0
        |  FROM stats GROUP BY delay, image_idx)
        |SELECT delay, count(*) AS n_img, round(avg(chi2_0), 4) AS avg_chi2
        |FROM chi2 GROUP BY delay ORDER BY delay""".stripMargin)),

    // A8 — robust per-bin median + MAD (trx/filters.py:51-81).
    QueryDef("q05_a8_zinger_stats",
      (s, dir) =>
        Filters.zingerStats(curves(s, dir))
          .select(col("q_bin"), r6(col("med_i")).as("med_i"),
            r6(col("mad_i")).as("mad_i"))
          .orderBy("q_bin"),
      Some(s"""WITH ${curvesSql},
        |med AS (SELECT q_bin, median(i) AS med_i FROM curves GROUP BY q_bin)
        |SELECT c.q_bin, round(any_value(m.med_i), 6) AS med_i,
        |       round(median(abs(c.i - m.med_i)), 6) AS mad_i
        |FROM curves c JOIN med m ON c.q_bin = m.q_bin
        |GROUP BY c.q_bin ORDER BY c.q_bin""".stripMargin)),

    // A8 applied — zinger removal survivors.
    QueryDef("q06_a8_zinger_removal",
      (s, dir) =>
        Filters.removeZingers(curves(s, dir), nSigma = 1.0)
          .groupBy(col("q_bin"))
          .agg(count(lit(1)).as("n_kept"), sum(col("i")).cast("double").as("sum_i"))
          .orderBy("q_bin"),
      Some(s"""WITH ${curvesSql},
        |med AS (SELECT q_bin, median(i) AS med_i FROM curves GROUP BY q_bin),
        |mad AS (SELECT c.q_bin, any_value(m.med_i) AS med_i,
        |               median(abs(c.i - m.med_i)) AS mad_i
        |        FROM curves c JOIN med m ON c.q_bin = m.q_bin GROUP BY c.q_bin)
        |SELECT c.q_bin, count(*) AS n_kept, sum(c.i)::DOUBLE AS sum_i
        |FROM curves c JOIN mad s ON c.q_bin = s.q_bin
        |WHERE abs(c.i - s.med_i) <= 1.0 * 1.4826 * s.mad_i
        |GROUP BY c.q_bin ORDER BY c.q_bin""".stripMargin)),

    // A9 + A10 — per-curve chi² outlier score, auto 95th-percentile cut.
    QueryDef("q07_a9_outlier_chi2",
      (s, dir) => {
        val chi2 = Filters.outlierChi2(curves(s, dir))
          .withColumnRenamed("chi2", "chi2_0")
        Filters.chi2Filter(chi2)
          .agg(count(lit(1)).as("n_kept"), r4(avg(col("chi2_0"))).as("avg_chi2"))
      },
      Some(s"""WITH ${curvesSql},
        |med AS (SELECT q_bin, median(i) AS med_i FROM curves GROUP BY q_bin),
        |chi2 AS (
        |  SELECT image_idx,
        |         sum(power(CASE WHEN err <> 0 THEN (i - med_i) / err END, 2))
        |           / count(*) AS chi2_0
        |  FROM curves c JOIN med m ON c.q_bin = m.q_bin
        |  GROUP BY image_idx),
        |thr AS (SELECT quantile_cont(chi2_0, 0.95) AS t FROM chi2)
        |SELECT count(*) AS n_kept, round(avg(chi2_0), 4) AS avg_chi2
        |FROM chi2, thr WHERE chi2_0 < t""".stripMargin)),

    // A6 + W5 — monitor from a q-range (median variant) + normalization.
    QueryDef("q08_a6_norm_qrange",
      (s, dir) => {
        val withQ = curves(s, dir).withColumn("q", col("q_bin").cast("double"))
        Azav.normalizeQRange(withQ, 2.0, 5.0, useMedian = true, idCol = "image_idx")
          .groupBy(col("q_bin"))
          .agg(count(lit(1)).as("n"), stableSum(col("i_norm")).as("sum_norm"))
          .orderBy("q_bin")
      },
      Some(s"""WITH ${curvesSql},
        |mon AS (SELECT image_idx, median(i) AS monitor FROM curves
        |        WHERE q_bin::DOUBLE BETWEEN 2.0 AND 5.0 GROUP BY image_idx)
        |SELECT c.q_bin, count(*) AS n,
        |       ${stableSumSql("c.i / m.monitor")} AS sum_norm
        |FROM curves c JOIN mon m ON c.image_idx = m.image_idx
        |GROUP BY c.q_bin ORDER BY c.q_bin""".stripMargin)),

    // A5 + W5 — 'auto' monitor (per-image mean over all bins).
    QueryDef("q09_a5_norm_auto",
      (s, dir) =>
        Azav.normalizeAuto(curves(s, dir), idCol = "image_idx")
          .groupBy(col("q_bin"))
          .agg(count(lit(1)).as("n"), stableSum(col("i_norm")).as("sum_norm"))
          .orderBy("q_bin"),
      Some(s"""WITH ${curvesSql},
        |mon AS (SELECT *, avg(i) OVER (PARTITION BY image_idx) AS monitor
        |        FROM curves)
        |SELECT q_bin, count(*) AS n,
        |       ${stableSumSql("i / monitor")} AS sum_norm
        |FROM mon GROUP BY q_bin ORDER BY q_bin""".stripMargin)),

    // W3 — np.gradient-style detrending derivative across acquisition order.
    QueryDef("q10_w3_gradient",
      (s, dir) =>
        Filters.detrend(curves(s, dir))
          .groupBy(col("q_bin"))
          .agg(count(col("i_grad")).as("n"), stableSum(col("i_grad")).as("sum_grad"))
          .orderBy("q_bin"),
      Some(s"""WITH ${curvesSql},
        |grad AS (
        |  SELECT q_bin,
        |    CASE WHEN p IS NULL THEN n - i
        |         WHEN n IS NULL THEN i - p
        |         ELSE (n - p) / 2.0 END AS i_grad
        |  FROM (SELECT q_bin, i,
        |          lag(i)  OVER (PARTITION BY q_bin ORDER BY image_idx) AS p,
        |          lead(i) OVER (PARTITION BY q_bin ORDER BY image_idx) AS n
        |        FROM curves))
        |SELECT q_bin, count(i_grad) AS n, ${stableSumSql("i_grad")} AS sum_grad
        |FROM grad GROUP BY q_bin ORDER BY q_bin""".stripMargin)),

    // J5 — reference tagging with the laser-off sentinel masked out of min().
    QueryDef("q11_j5_ref_tagging",
      (s, dir) =>
        Reduction.tagReferences(curvesWithOff(s, dir))
          .groupBy(col("delay"))
          .agg(count(lit(1)).as("n"),
            sum(col("is_ref").cast("long")).as("n_ref"))
          .orderBy("delay"),
      Some(s"""WITH ${curvesWithOffSql}
        |SELECT delay, count(*) AS n,
        |       sum(CASE WHEN abs(delay -
        |         (SELECT min(delay) FROM curves WHERE delay <> -10.0)) < 1e-12
        |         THEN 1 ELSE 0 END)::BIGINT AS n_ref
        |FROM curves GROUP BY delay ORDER BY delay""".stripMargin)),

    // A14 — global per-q mean/median over the whole run (the second
    // aggregation without the delay key, trx/dataReduction.py:126-127).
    QueryDef("q52_a14_global_stats",
      (s, dir) =>
        Reduction.globalStats(curves(s, dir).withColumn("diff", col("i")))
          .select(col("q_bin"), r6(col("average")).as("average"),
            r6(col("median")).as("median"))
          .orderBy("q_bin"),
      Some(s"""WITH ${curvesSql}
        |SELECT q_bin, round(avg(i), 6) AS average,
        |       round(median(i), 6) AS median
        |FROM curves GROUP BY q_bin ORDER BY q_bin""".stripMargin)),

    // W2 — every-2nd-repetition reference thinning.
    QueryDef("q12_w2_ref_thinning",
      (s, dir) =>
        Reduction.thinReferences(
          Reduction.tagReferences(curves(s, dir)))
          .groupBy(col("delay"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy("delay"),
      Some(s"""WITH ${curvesSql},
        |tagged AS (
        |  SELECT *, abs(delay -
        |    (SELECT min(delay) FROM curves WHERE delay <> -10.0)) < 1e-12 AS is_ref
        |  FROM curves),
        |thinned AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY delay, q_bin
        |                                 ORDER BY image_idx) AS rn
        |    FROM tagged)
        |  WHERE NOT is_ref OR rn % 2 = 1)
        |SELECT delay, count(*) AS n_kept FROM thinned
        |GROUP BY delay ORDER BY delay""".stripMargin)),

    // T3 (incremental) — the streaming reduction's bounded-work path fed
    // the curve history in three ordered chunks must land on EXACTLY the
    // full-history reduction (q03's oracle, verbatim): the finalized
    // sufficient-statistics ⊕ tail-recompute algebra is hash-checked
    // against DuckDB's one-shot reduction, not just the ScalaTest bound.
    QueryDef("q63_t3_incremental_reduction",
      (s, dir) => {
        // materialize the SUBSET once — processBatch consumes each chunk
        // several times (store append, validity probe, window union) and
        // per-chunk checkpoints would re-run the lineitem→curves
        // aggregation four times; a chunk is then a free in-memory filter
        val c = curves(s, dir).filter(col("image_idx") % 4 === 0)
          .localCheckpoint(true)
        val maxIdx = c.agg(max(col("image_idx"))).collect()(0).getLong(0)
        val (cut1, cut2) = (maxIdx / 3, 2 * maxIdx / 3)
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft-incred-q63").toString
        val batches = Seq(
          c.filter(col("image_idx") <= cut1),
          c.filter(col("image_idx") > cut1 && col("image_idx") <= cut2),
          c.filter(col("image_idx") > cut2))
        // only the LAST batch's reduction is consumed — the earlier
        // batches commit state but skip their sink writes (three pure
        // per-job-overhead jobs each at this scale)
        val out = batches.zipWithIndex.map { case (b, i) =>
            graft.streaming.IncrementalReduction.processBatch(s, b, stateDir,
              withMetrics = false, emitOutputs = i == batches.size - 1) }
          .last.reduced
          .select(col("delay"), col("q_bin"),
            r4(col("diff_av")).as("diff_av"), r4(col("noise")).as("noise"),
            col("n_rep"), r4(col("err")).as("err"))
          .orderBy("delay", "q_bin")
          // pin the result in memory so the state directory (a full copy
          // of the subset history per invocation) can be deleted eagerly
          .localCheckpoint(true)
        graft.sources.Bundle.deleteRecursively(stateDir)
        out
      },
      Some(timeResolvedOracleSql(curvesSql.replace(
        "FROM lineitem GROUP BY",
        "FROM lineitem WHERE l_orderkey % 4 = 0 GROUP BY")))),

    // T3 (incremental, MEDIAN mode) — dataReduction.py:89 supports
    // funcForAveraging=nanmedian, the one configuration the additive
    // moment state cannot cover: the median rides the mergeable t-digest
    // twin instead. tdCompression=1024 keeps every (delay, q_bin) group
    // (max ~370 kept reps at the sf0.01 gate) in the sketch's EXACT regime, so
    // three chunked invocations must hash-match DuckDB's one-shot
    // median() over the kept diffs — interpolation rule included (both
    // sides average the two central values on even counts).
    QueryDef("q200_t3_incremental_median",
      (s, dir) => {
        val c = curves(s, dir).filter(col("image_idx") % 4 === 2)
          .localCheckpoint(true)
        val maxIdx = c.agg(max(col("image_idx"))).collect()(0).getLong(0)
        val (cut1, cut2) = (maxIdx / 3, 2 * maxIdx / 3)
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft-incred-q200").toString
        val batches = Seq(
          c.filter(col("image_idx") <= cut1),
          c.filter(col("image_idx") > cut1 && col("image_idx") <= cut2),
          c.filter(col("image_idx") > cut2))
        // the reduced_median sink is read once, after the final batch —
        // the earlier batches commit state only (see q63)
        batches.zipWithIndex.foreach { case (b, i) =>
          graft.streaming.IncrementalReduction.processBatch(s, b, stateDir,
            withMetrics = false, tdCompression = 1024,
            emitOutputs = i == batches.size - 1) }
        val out = s.read.parquet(s"$stateDir/reduced_median")
          .select(col("delay"), col("q_bin"),
            r4(col("diff_med")).as("diff_med"), col("n_rep"))
          .orderBy("delay", "q_bin")
          .localCheckpoint(true)
        graft.sources.Bundle.deleteRecursively(stateDir)
        out
      },
      Some {
        val block = curvesSql.replace("FROM lineitem GROUP BY",
          "FROM lineitem WHERE l_orderkey % 4 = 2 GROUP BY")
        s"""${interpSql(block)},
           |diffs AS (SELECT *, i - i_ref AS diff FROM interp),
           |marked AS (
           |  SELECT *, (NOT is_ref OR rn % 2 = 1) AS keep FROM (
           |    SELECT *, row_number() OVER (PARTITION BY delay, q_bin
           |                                ORDER BY image_idx) AS rn
           |    FROM diffs))
           |SELECT round(delay, 12) AS delay, q_bin,
           |       round(median(CASE WHEN keep THEN diff END), 4) AS diff_med,
           |       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_rep
           |FROM marked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      })
  )
}
