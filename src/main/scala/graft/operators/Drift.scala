package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distribution-drift monitoring between two corpus snapshots (or a
  * snapshot and its training-time reference): did the data change enough
  * that downstream models / filter thresholds need revisiting? Three
  * complementary detectors, all exact and oracle-checkable:
  *
  *  - [[psiBuckets]] / [[psi]] — Population Stability Index over EXPLICIT
  *    bucket breaks (the industry-standard scorecard drift metric). Fixed
  *    literal breaks keep the metric reproducible across runs and engines;
  *    deriving breaks from quantiles of a moving corpus would make the
  *    metric itself drift.
  *  - [[ksStatistic]] — the exact two-sample Kolmogorov–Smirnov statistic
  *    `D = sup_x |F_A(x) − F_B(x)|`, computed distributed: the ECDF
  *    difference is a step function changing only at observed values, so
  *    the sup is the max over pooled distinct values — no sampling, no
  *    approximation.
  *  - [[tokenShift]] — which TOKENS moved: smoothed log-odds-ratio with a
  *    Dirichlet prior and its z-score (Monroe et al. 2008, "Fightin'
  *    Words"), top-k by |z|. PSI/KS say *that* text drifted; this says
  *    *what* drifted.
  *
  * Scale design: every detector reduces the corpus FIRST (one map-side
  * combined aggregation to bucket counts / distinct-value counts / vocab
  * counts) and runs all remaining arithmetic on the reduced frame. The KS
  * cumulative sums use range repartition + per-partition window + broadcast
  * partition offsets (the same pattern as `Positional.numberedWithTotal`) —
  * never a single-task global window. Token top-k goes through Spark's
  * TakeOrdered (per-partition heads, merged on the driver), never a full
  * sort.
  */
object Drift {

  /** 0-based bucket index of `c` under sorted `breaks`:
    * `(-inf, b0) → 0`, `[b0, b1) → 1`, …, `[b_last, +inf) → n`. A chain of
    * comparisons — codegen'd, no UDF.
    */
  def bucketIdx(c: Column, breaks: Seq[Double]): Column = {
    require(breaks.nonEmpty && breaks == breaks.sorted, "breaks must be sorted")
    breaks.map(b => when(c >= lit(b), 1).otherwise(0))
      .reduce(_ + _).cast("int")
  }

  /** Per-bucket PSI decomposition of `valueCol` between snapshots `a` and
    * `b`: `(bucket, n_a, n_b, p_a, p_b, contrib)`, one row per bucket
    * (buckets with no mass on either side included). NULL values are
    * dropped. Proportions are add-half smoothed —
    * `p = (n + 0.5) / (total + 0.5·nBuckets)` — so empty buckets cannot
    * produce ±∞ contributions; `contrib = (p_a − p_b)·ln(p_a / p_b)`
    * rounded to 6 dp. Each side is ONE map-side-combined aggregation to
    * `nBuckets` rows; everything after runs on ≤ 2·(nBreaks+1) rows.
    */
  def psiBuckets(a: DataFrame, b: DataFrame, valueCol: String,
                 breaks: Seq[Double]): DataFrame = {
    val spark = a.sparkSession
    val nb = breaks.size + 1
    import spark.implicits._
    val all = (0 until nb).toDF("bucket")
    val merged = all
      .join(bucketCounts(a, valueCol, breaks, "n_a"), Seq("bucket"), "left")
      .join(bucketCounts(b, valueCol, breaks, "n_b"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
    psiFromCounts(merged, nb)
  }

  /** One side's reduction: per-bucket counts `(bucket, <out>)` of non-null
    * `valueCol` — one map-side-combined aggregation, the only corpus-scale
    * step of the PSI (streamed PSI persists exactly this per batch).
    */
  def bucketCounts(df: DataFrame, valueCol: String, breaks: Seq[Double],
                   out: String = "n"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(bucketIdx(col(valueCol), breaks).as("bucket"))
      .agg(count(lit(1)).as(out))

  /** The PSI arithmetic over an already-reduced `(bucket, n_a, n_b)` frame
    * covering all `nb` buckets — shared verbatim by the batch and streamed
    * paths so persistence cannot change the metric.
    */
  def psiFromCounts(merged: DataFrame, nb: Int): DataFrame = {
    // totals ride a broadcast 1-row aggregate, not a whole-frame window —
    // the reduced frame is nb rows, but the plan shape stays window-free
    val tot = merged.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    merged.crossJoin(broadcast(tot))
      .withColumn("p_a", (col("n_a") + 0.5) / (col("_ta") + 0.5 * nb))
      .withColumn("p_b", (col("n_b") + 0.5) / (col("_tb") + 0.5 * nb))
      .withColumn("contrib",
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 6))
      .select(col("bucket"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        col("contrib"))
      .orderBy("bucket")
  }

  /** Total PSI: exact decimal sum of the per-bucket contributions.
    * Rule-of-thumb reading: < 0.1 stable, 0.1–0.25 moderate shift,
    * > 0.25 major shift.
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
          breaks: Seq[Double]): DataFrame =
    psiBuckets(a, b, valueCol, breaks)
      .agg(round(sum(col("contrib").cast("decimal(28,6)")).cast("double"), 6)
        .as("psi"))

  /** Exact two-sample KS statistic between `a` and `b` on `valueCol`:
    * one row `(ks_d, at_value, n_a, n_b)` where `at_value` is the SMALLEST
    * value attaining the sup (deterministic tie-break). NULLs dropped.
    *
    * Plan: per side groupBy(value)→count (corpus reduces to distinct
    * values); outer-merge the two count tables; range-repartition by value
    * and build global inclusive prefix sums from per-partition window sums
    * plus broadcast partition offsets — the partition count is the shuffle
    * parallelism, so the driver-side offset table is bounded. The ECDF
    * difference uses one double division per side per row; the comparison
    * key is rounded to 9 dp so cross-engine ties resolve identically.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val merged = valueCounts(a, valueCol, "c_a")
      .join(valueCounts(b, valueCol, "c_b"), Seq("v"), "full")
      .na.fill(0L, Seq("c_a", "c_b"))
    ksFromCounts(merged)
  }

  /** One side's reduction: per-distinct-value counts `(v, <out>)` — the
    * corpus-scale step of the KS (streamed KS persists exactly this).
    */
  def valueCounts(df: DataFrame, valueCol: String,
                  out: String = "c"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as(out))

  /** The KS sup over an already-reduced `(v, c_a, c_b)` frame — the
    * distributed-prefix-sum tail ([[Stats.prefixSums]]) shared by the
    * batch and streamed paths.
    */
  def ksFromCounts(merged: DataFrame): DataFrame = {
    val (cum, totals) = Stats.prefixSums(merged, "v", Seq("c_a", "c_b"))
    val (totA, totB) = (totals("c_a"), totals("c_b"))
    require(totA > 0 && totB > 0, "ksStatistic: empty side")
    val diffs = cum.select(col("v"),
      round(abs(col("_cum_c_a").cast("double") / totA -
        col("_cum_c_b").cast("double") / totB), 9).as("d"))
    // asymptotic p-value at λ = √(n_a·n_b/(n_a+n_b))·D, from the 6-dp
    // ks_d the report itself carries (so a SQL replay derives the same
    // λ from the same rounded statistic) — Kolmogorov's series, see
    // [[graft.functions.PValues]]
    val nEff = totA.toDouble * totB.toDouble / (totA.toDouble + totB)
    diffs.orderBy(col("d").desc, col("v")).limit(1)
      .select(round(col("d"), 6).as("ks_d"), col("v").as("at_value"),
        lit(totA).as("n_a"), lit(totB).as("n_b"))
      .withColumn("p_value", round(graft.functions.PValues.kolmogorovSf(
        lit(math.sqrt(nEff)) * col("ks_d")), 6))
  }

  /** Jensen–Shannon divergence between the bucket distributions of
    * `valueCol` in `a` and `b` — the symmetric, bounded ([0, ln 2])
    * complement to [[psiBuckets]]: no smoothing needed (against the
    * mixture `m = (p+q)/2`, a zero-mass bucket's term is exactly 0), no
    * direction, and a hard upper bound makes thresholds portable across
    * monitors. One row `(js, n_a, n_b)`, natural-log base.
    *
    * Same reduction as PSI (one map-side-combined aggregation per side to
    * nBuckets counts); per-bucket contributions are 6-dp-rounded and
    * DECIMAL-summed for partition-order independence.
    */
  def jsDivergence(a: DataFrame, b: DataFrame, valueCol: String,
                   breaks: Seq[Double]): DataFrame = {
    val spark = a.sparkSession
    val nb = breaks.size + 1
    import spark.implicits._
    val merged = (0 until nb).toDF("bucket")
      .join(bucketCounts(a, valueCol, breaks, "n_a"), Seq("bucket"), "left")
      .join(bucketCounts(b, valueCol, breaks, "n_b"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
    jsFromCounts(merged)
  }

  /** The JSD arithmetic over an already-reduced `(bucket, n_a, n_b)`
    * frame — shared by the batch and streamed paths.
    */
  def jsFromCounts(merged: DataFrame): DataFrame = {
    val tot = merged.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"))
    val w = merged.crossJoin(broadcast(tot))
    val pa = col("n_a").cast("double") / col("_ta").cast("double")
    val pb = col("n_b").cast("double") / col("_tb").cast("double")
    val m = (pa + pb) / 2
    def term(p: Column): Column =
      when(p > 0, p * log(p / m) / 2).otherwise(lit(0.0))
    w.groupBy(col("_ta"), col("_tb"))
      .agg(round(sum(round(term(pa) + term(pb), 6).cast("decimal(28,6)"))
        .cast("double"), 6).as("js"))
      .select(col("js"), col("_ta").as("n_a"), col("_tb").as("n_b"))
  }

  /** Reference-derived equal-mass PSI breaks: the interior type-7
    * quantiles of the FIXED reference at `1/n .. (n−1)/n`
    * ([[Stats.exactQuantiles]]). Deriving from the reference alone keeps
    * the metric stable — quantiles of a moving corpus would make the
    * monitor itself drift (the object doc's warning, made convenient).
    * Heavy ties collapse duplicate quantiles, so fewer than `nBuckets − 1`
    * breaks may return; the driver-side result is `nBuckets − 1` doubles,
    * safe to embed as literals in [[psiBuckets]] / a streaming monitor's
    * init.
    */
  def suggestBreaks(reference: DataFrame, valueCol: String,
                    nBuckets: Int): Seq[Double] = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    Stats.exactQuantiles(reference, valueCol, probs)
      .orderBy("prob").select("q")
      .collect().map(_.getDouble(0)).toSeq.distinct
  }

  /** Pearson chi-squared homogeneity statistic between the CATEGORICAL
    * distributions of `catCol` in `a` and `b` — the drift detector for
    * discrete features (language, source, event type), where PSI's numeric
    * buckets and KS's ordering don't apply. One row
    * `(chi2, dof, n_cats, n_a, n_b)`; `dof = k − 1` for the 2×k table.
    * NULL categories are dropped.
    *
    * Plan: each side reduces to per-category counts (one map-side-combined
    * aggregation); the 2×k expected-count arithmetic runs on the merged
    * k-row frame with the totals broadcast. Per-cell contributions are
    * rounded to 6 dp and summed as DECIMAL — double summation is
    * partition-order dependent, exact decimal sums are not (the engine's
    * stableSum discipline).
    */
  def chiSquared(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val merged = catCounts(a, catCol, "c_a")
      .join(catCounts(b, catCol, "c_b"), Seq("cat"), "full")
      .na.fill(0L, Seq("c_a", "c_b"))
    chiFromCounts(merged)
  }

  /** One side's reduction: per-category counts `(cat, <out>)` — the
    * corpus-scale step of the chi-squared (streamed categorical drift
    * persists exactly this).
    */
  def catCounts(df: DataFrame, catCol: String, out: String = "c"): DataFrame =
    df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as(out))

  /** The chi-squared arithmetic over an already-reduced `(cat, c_a, c_b)`
    * frame — shared by the batch and streamed paths.
    *
    * Fail-fast contract (matches [[ksFromCounts]]'s `require`): a
    * zero-total side makes every expected count 0 and would yield a
    * misleading NULL statistic — e.g. a streamed monitor polled before its
    * first batch. The guard is LAZY (`raise_error` at execution) rather
    * than a driver-side collect: the totals here live inside the plan, and
    * an eager probe would re-run the corpus-scale reduction a second time.
    */
  def chiFromCounts(merged: DataFrame): DataFrame = {
    val tot = merged.agg(sum(col("c_a")).as("_ta"), sum(col("c_b")).as("_tb"),
      count(lit(1)).as("_k"))
    val w = merged.crossJoin(broadcast(tot))
    val n = (col("_ta") + col("_tb")).cast("double")
    val colTot = (col("c_a") + col("c_b")).cast("double")
    val ea = col("_ta").cast("double") * colTot / n
    val eb = col("_tb").cast("double") * colTot / n
    // expected counts are zero IFF a side's total is zero (every merged
    // category has colTot >= 1), which is exactly the empty-side error
    // case — NULL the cell there instead of tripping ANSI
    // DIVIDE_BY_ZERO before the loud guard below can name the problem
    val cell = when(col("_ta") > 0 && col("_tb") > 0,
      pow(col("c_a").cast("double") - ea, 2) / ea +
        pow(col("c_b").cast("double") - eb, 2) / eb)
    // the cell sum is a GLOBAL aggregate (one row even over an empty
    // frame) re-joined to the always-one-row totals: an entirely empty
    // merged frame (both sides empty — the streamed-monitor-polled-early
    // case) then reaches the raise_error guard below instead of
    // short-circuiting into an empty report
    val cellSum = w.agg(
      round(sum(round(cell, 6).cast("decimal(28,6)")).cast("double"), 6)
        .as("_chi2raw"))
    tot.crossJoin(broadcast(cellSum))
      .withColumn("chi2",
        when(col("_ta") > 0 && col("_tb") > 0, col("_chi2raw"))
          .otherwise(raise_error(lit("chiSquared: empty side"))))
      .drop("_chi2raw")
      .select(col("chi2"), (col("_k") - 1).cast("long").as("dof"),
        col("_k").cast("long").as("n_cats"),
        col("_ta").as("n_a"), col("_tb").as("n_b"),
        // Cramér's V effect size: chi2 grows with n, V ∈ [0,1] doesn't —
        // for a 2×k table min(r,c)−1 = 1 (k ≥ 2), so V = sqrt(chi2/n);
        // NULL for the degenerate single-category table (dof 0)
        round(when(col("_k") >= 2,
          sqrt(col("chi2") /
            (col("_ta") + col("_tb")).cast("double"))), 6).as("cramers_v"),
        // survival p-value (regularized incomplete gamma — the series
        // in graft.functions.PValues, SQL-replayable); NULL for the
        // degenerate dof-0 table
        round(when(col("_k") >= 2, graft.functions.PValues.chiSquaredSf(
          col("chi2"), (col("_k") - 1).cast("double"))), 6).as("p_value"))
  }

  /** PSI between ADJACENT observed periods — the drift metric as a time
    * series (is yesterday's data shaped like the day before's?). Output one
    * row per period with an observed predecessor:
    * `(period, n_prev, n_cur, psi)`, same smoothing and rounding as
    * [[psiBuckets]] with the earlier period as side `a`.
    *
    * Plan: the corpus reduces to (period × bucket) counts in one
    * aggregation; densification (periods × all buckets) keeps empty
    * buckets in the smoothing like the pairwise form; the predecessor is a
    * `lag` in per-BUCKET windows ordered by period (partition size = the
    * period count — bounded by time, not data); totals are per-PERIOD
    * windows over nb rows. Contributions are 6-dp-rounded and summed as
    * DECIMAL so the series is partition-order independent.
    */
  def psiSeries(df: DataFrame, periodCol: String, valueCol: String,
                breaks: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nb = breaks.size + 1
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(periodCol).as("period"),
        bucketIdx(col(valueCol), breaks).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val dense = counts.select("period").distinct()
      .crossJoin(broadcast((0 until nb).toDF("bucket")))
      .join(counts, Seq("period", "bucket"), "left")
      .na.fill(0L, Seq("n"))
    val wLag = Window.partitionBy("bucket").orderBy("period")
    val paired = dense
      .withColumn("n_prev", lag(col("n"), 1).over(wLag))
      .filter(col("n_prev").isNotNull)
    val wPeriod = Window.partitionBy("period")
    val t = paired
      .withColumn("tot_cur", sum(col("n")).over(wPeriod))
      .withColumn("tot_prev", sum(col("n_prev")).over(wPeriod))
    val pa = (col("n_prev") + 0.5) / (col("tot_prev") + 0.5 * nb)
    val pb = (col("n") + 0.5) / (col("tot_cur") + 0.5 * nb)
    t.withColumn("contrib", round((pa - pb) * log(pa / pb), 6))
      .groupBy(col("period"))
      .agg(max(col("tot_prev")).as("n_prev"),
        max(col("tot_cur")).as("n_cur"),
        round(sum(col("contrib").cast("decimal(28,6)")).cast("double"), 6)
          .as("psi"))
      .orderBy("period")
  }

  /** Which tokens drove the drift: smoothed log-odds-ratio with Dirichlet
    * prior α between token streams `a` and `b`, top-k by |z|.
    *
    * For token w with counts `cA, cB`, side totals `tA, tB` and vocab size
    * `V` (distinct tokens across both sides):
    * {{{
    *   delta = ln((cA+α)/(tA+αV − cA−α)) − ln((cB+α)/(tB+αV − cB−α))
    *   z     = delta / sqrt(1/(cA+α) + 1/(cB+α))
    * }}}
    * (Monroe et al. 2008 eq. 16 with the uninformative symmetric prior.)
    * Tokens with `cA + cB < minCount` are excluded from the RANKING (the
    * prior still sees the full vocab). Output:
    * `(rank, token, c_a, c_b, delta, z)` — positive z = over-represented in
    * `a`. Ranking key is z rounded to 9 dp with token tie-break, so the
    * selection is engine-stable; top-k runs through TakeOrdered.
    *
    * `tokens` frames carry one token per row in column `tokenCol` (explode
    * upstream — e.g. `TextFunctions.tokens`).
    */
  def tokenShift(a: DataFrame, b: DataFrame, tokenCol: String,
                 alpha: Double = 0.5, minCount: Long = 5,
                 k: Int = 20): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(tokenCol).isNotNull)
        .groupBy(col(tokenCol).as("token"))
        .agg(count(lit(1)).as(out))
    val merged = counts(a, "c_a").join(counts(b, "c_b"), Seq("token"), "full")
      .na.fill(0L, Seq("c_a", "c_b"))
    // scalars from the reduced vocab frame: V, tA, tB (1-row broadcast)
    val scalars = merged.agg(count(lit(1)).as("_v"),
      sum(col("c_a")).as("_ta"), sum(col("c_b")).as("_tb"))
    val withS = merged.crossJoin(broadcast(scalars))
    def side(c: Column, tot: Column): Column = {
      val num = c + alpha
      val den = tot + lit(alpha) * col("_v") - c - alpha
      log(num / den)
    }
    val delta = side(col("c_a"), col("_ta")) - side(col("c_b"), col("_tb"))
    val z = delta / sqrt(lit(1.0) / (col("c_a") + alpha) +
      lit(1.0) / (col("c_b") + alpha))
    val scored = withS
      .withColumn("_z9", round(z, 9))
      .filter(col("c_a") + col("c_b") >= minCount)
      .select(col("token"), col("c_a"), col("c_b"),
        round(delta, 6).as("delta"), round(z, 6).as("z"), col("_z9"))
    scored.orderBy(abs(col("_z9")).desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(abs(col("_z9")).desc, col("token"))))
      .select("rank", "token", "c_a", "c_b", "delta", "z")
  }
}
