package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact order statistics at corpus scale.
  *
  * [[exactQuantiles]] computes the type-7 quantile estimator (R's default,
  * DuckDB's `quantile_cont`, NumPy's `linear`): for probability p over n
  * values, `h = p·(n−1)`, answer = `v[⌊h⌋] + (h−⌊h⌋)·(v[⌈h⌉] − v[⌊h⌋])`
  * (0-based order statistics). EXACT — the approximate tools
  * (`Sketches.momentsQuantiles`, `TDigestSketch`, `approx_percentile`)
  * trade error bounds for state; this trades a shuffle for exactness.
  *
  * Scale design: the corpus reduces FIRST to per-distinct-value counts
  * (one map-side-combined aggregation — the only corpus-scale step), and
  * order statistics are located on the reduced frame by rank interval:
  * a row `(v, c)` with inclusive cumulative count `cum` covers 1-based
  * ranks `(cum−c, cum]`, so the rank-r statistic is the unique covering
  * row — a broadcast join against the tiny probe set, never a global sort
  * of raw data.
  *
  *  - global: cumulative counts via [[prefixSums]] — range repartition +
  *    per-partition window + broadcast per-partition offsets (the
  *    partition count is the shuffle parallelism, so the driver-side
  *    offset table is bounded); no single-task global window.
  *  - grouped: the cumulative runs in per-group windows over the REDUCED
  *    frame — per-task state is the group's distinct-value count, not its
  *    row count. A group whose distinct values overflow a task is the
  *    pathological case for ANY exact method; use the sketch family there.
  */
object Stats {

  /** Inclusive global prefix sums of `sumCols` over `df` ordered by
    * `orderCol`, plus the grand totals. `orderCol` values must be distinct
    * (reduce to that grain first — ties would make per-partition ranges
    * ambiguous). Appends `_cum_<c>` per sum column. Sum columns may be
    * signed (per-partition totals are true sums, not running-max).
    */
  def prefixSums(df: DataFrame, orderCol: String,
                 sumCols: Seq[String]): (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Eager localCheckpoint: this frame feeds TWO jobs (the offset collect
    // below, then the cum join). Without the pin, each job re-runs
    // `repartitionByRange`, and offset/cum alignment would rest on the
    // range sampler drawing identical bounds twice (and on AQE coalescing
    // identically twice) — same contract as Positional.numberedWithTotal.
    // The returned frame embeds the checkpoint, so blocks live until the
    // caller's handle is collected (bounded: one materialization).
    val local = sumCols.foldLeft(parted) { (d, c) =>
      d.withColumn(s"_l_$c", sum(col(c)).over(w))
    }.localCheckpoint(true)
    // per-partition totals → exclusive offsets (bounded: one row per
    // shuffle partition). True sums, not max of the running column — the
    // running max only equals the total when every term is non-negative.
    val perPart = local.groupBy(col("_pid"))
      .agg(sumCols.map(c => sum(col(c)).as(s"_t_$c")).head,
        sumCols.tail.map(c => sum(col(c)).as(s"_t_$c")): _*)
      .collect()
      .map(r => r.getAs[Int]("_pid") ->
        sumCols.map(c => r.getAs[Long](s"_t_$c")))
      .sortBy(_._1)
    val running = Array.fill(sumCols.size)(0L)
    val offsets: Seq[(Int, Seq[Long])] = perPart.toSeq.map {
      case (p, totals) =>
        val snapshot = running.toSeq
        totals.zipWithIndex.foreach { case (t, i) => running(i) += t }
        (p, snapshot)
    }
    val grand = sumCols.zipWithIndex.map { case (c, i) => c -> running(i) }
    val offDf = offsets.toDF("_pid", "_offs")
    val joined = local.join(broadcast(offDf), Seq("_pid"))
    val withCums = sumCols.zipWithIndex.foldLeft(joined) { case (d, (c, i)) =>
      d.withColumn(s"_cum_$c", col(s"_l_$c") + col("_offs").getItem(i))
    }
    (withCums.drop("_pid", "_offs") // keep _l_* dropped too
      .drop(sumCols.map(c => s"_l_$c"): _*),
      grand.toMap)
  }

  /** Exact type-7 quantiles of `valueCol` (NULLs dropped) at `probs`,
    * optionally per group: `(groupCols..., prob, q)`. Matches DuckDB /
    * R `quantile_cont` bit-for-bit in the shared-double regime (same
    * `h = p·(n−1)` arithmetic, same linear interpolation).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                     groupCols: Seq[String] = Nil): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = groupCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(keys :+ col(valueCol).cast("double").as("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val probDf = broadcast(probs.toDF("prob"))

    if (groupCols.isEmpty) {
      quantilesFromCounts(counts, "_v", "_c", probs)
    } else {
      val wCum = Window.partitionBy(keys: _*).orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(keys: _*)
      val cum = counts
        .withColumn("_cum__c", sum(col("_c")).over(wCum))
        .withColumn("_n", sum(col("_c")).over(wAll))
      locate(cum.join(probDf), col("_n"), groupCols)
    }
  }

  // ------------------------------------------------------ scaled exact sum
  //
  // The stableSum discipline (round terms to 6 dp, sum exactly, so results
  // are partition-order independent and hash-match across engines) at LONG
  // speed: Spark's Sum over any decimal input carries a precision-38
  // buffer, which is BigDecimal-boxed — measured ~20× slower than a long
  // sum (3.6M-row bisect: 20.1 s decimal vs 1.1 s double). Here the term
  // is `rint(c·10⁶)` as a long, split into three 22-bit limbs summed as
  // plain longs (per-limb identity: x = (x>>22)·2²² + (x & mask), valid
  // for negatives under two's complement), recombined EXACTLY in decimal
  // once per group. Low/mid limb sums fit a long up to 2⁴¹ ≈ 2.2·10¹²
  // rows per group; past that the ANSI long-sum overflow fails loudly
  // rather than corrupting. The DuckDB twin needs no limbs (BIGINT sums
  // accumulate in HUGEINT): `sum(CAST(round(e·1e6) AS BIGINT))`.

  private val LimbMask = (1L << 22) - 1

  /** The three limb-sum aggregates for term `rint(c·10⁶)`, tagged. */
  private def scaledAggs(c: Column, tag: String): Seq[Column] = {
    val scaled = round(c * 1e6).cast("long")
    Seq(sum(shiftright(scaled, 44)).as(s"_h$tag"),
      sum(shiftright(scaled, 22).bitwiseAND(lit(LimbMask))).as(s"_m$tag"),
      sum(scaled.bitwiseAND(lit(LimbMask))).as(s"_l$tag"))
  }

  /** Recombine a tag's limb sums: the exact scaled total (decimal
    * arithmetic, once per group) back to value scale as a double.
    */
  private def scaledTotal(tag: String): Column =
    ((col(s"_h$tag").cast("decimal(38,0)") * lit(1L << 44) +
      col(s"_m$tag").cast("decimal(38,0)") * lit(1L << 22) +
      col(s"_l$tag").cast("decimal(38,0)")).cast("double") / 1e6)

  /** One-scan numeric column profile — the ingest-survey report a
    * pipeline runs before writing expectations: per column
    * `(column, n, n_null, n_distinct, min_v, max_v, mean)`, with
    * `n_distinct` EXACT (NULL excluded) and `mean` on the stableSum
    * discipline (6-dp-rounded terms, DECIMAL sum, then one division —
    * order-independent, cross-engine hashable). All columns' aggregates
    * ride one `agg` call: Spark plans the multi-distinct via a single
    * Expand over one scan of the input.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    // One (column, value) row per input row per column (projection-side
    // explode — every per-column aggregate then shares ONE small agg set,
    // and the single countDistinct plans as a plain two-phase aggregate
    // instead of an m-way Expand; see correlationMatrix for why a wide
    // one-row agg is a codegen-compilation trap)
    val tall = df.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"), col(c).cast("double").as("v"))
      }: _*)).as("e"))
      .select(col("e.column").as("column"), col("e.v").as("v"))
    val aggsAll = Seq(count(lit(1)).as("n"),
      (count(lit(1)) - count(col("v"))).as("n_null"),
      countDistinct(col("v")).as("n_distinct"),
      min(col("v")).as("min_v"), max(col("v")).as("max_v"),
      count(col("v")).as("_nn")) ++ scaledAggs(col("v"), "v")
    tall.groupBy(col("column"))
      .agg(aggsAll.head, aggsAll.tail: _*)
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_v"), col("max_v"),
        round(scaledTotal("v") / col("_nn"), 6).as("mean"))
  }

  /** Pairwise Pearson correlations over numeric columns in ONE scan —
    * the profiling staple: `(col_x, col_y, n, corr)` per unordered pair
    * (declaration order, x before y). Pairwise-complete deletion: each
    * pair's moments aggregate over rows where BOTH columns are non-null
    * (DuckDB/ANSI `corr` semantics). Singleton/constant columns yield
    * NULL corr (zero variance), never NaN.
    *
    * Determinism: plain double `corr` is partition-order dependent and
    * can't hash-match across engines; here every power sum rides the
    * stableSum discipline (terms rounded to 6 dp, summed as DECIMAL —
    * exact and order-free), and only the final scalar combination runs in
    * double. One map-side-combined aggregation carries all pairs' six
    * moments; the tall report explodes from that single row.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least 2 columns")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    // One row per (pair, x, y) via a projection-side explode, then ONE
    // small aggregate set grouped by pair id. The first attempt put all
    // pairs' moments in a single agg row (6·m(m−1)/2 DECIMAL aggregates):
    // one scan, but the generated aggregate method was so large that
    // EVERY planning paid ~17 s of janino compilation — 170× the actual
    // execution. The explode costs an m(m−1)/2 row amplification in the
    // map stage only (the partial aggregate reduces to one row per pair
    // before the shuffle), and the 6-aggregate method compiles instantly.
    val pairRows = df.select(explode(array(pairs.zipWithIndex.map {
        case ((x, y), k) =>
          struct(lit(k).as("pid"), col(x).cast("double").as("x"),
            col(y).cast("double").as("y"))
      }: _*)).as("p"))
      .select(col("p.pid").as("pid"), col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val momentAggs = count(lit(1)).as("n") +:
      (scaledAggs(col("x"), "x") ++ scaledAggs(col("y"), "y") ++
        scaledAggs(col("x") * col("x"), "xx") ++
        scaledAggs(col("y") * col("y"), "yy") ++
        scaledAggs(col("x") * col("y"), "xy"))
    val moments = pairRows.groupBy(col("pid"))
      .agg(momentAggs.head, momentAggs.tail: _*)
      .select(col("pid"), col("n"),
        scaledTotal("x").as("sx"), scaledTotal("y").as("sy"),
        scaledTotal("xx").as("sxx"), scaledTotal("yy").as("syy"),
        scaledTotal("xy").as("sxy"))
    val names = broadcast(pairs.zipWithIndex.map { case ((x, y), k) =>
      (k, x, y)
    }.toDF("pid", "col_x", "col_y"))
    val n = col("n").cast("double")
    val varX = n * col("sxx") - col("sx") * col("sx")
    val varY = n * col("syy") - col("sy") * col("sy")
    val cov = n * col("sxy") - col("sx") * col("sy")
    // right join: a pair with zero complete rows still reports (n=0)
    moments.join(names, Seq("pid"), "right")
      .na.fill(0L, Seq("n"))
      .select(col("col_x"), col("col_y"), col("n"),
        round(when(varX > 0 && varY > 0,
          cov / sqrt(varX) / sqrt(varY)), 6).as("corr"))
  }

  /** Type-7 quantiles from an ALREADY-REDUCED distinct-value count frame
    * `(vCol, cCol)` — the state a streamed monitor keeps (e.g.
    * [[graft.streaming.StreamingDrift]]'s KS family), so exact live
    * quantiles cost no corpus scan. Same arithmetic as [[exactQuantiles]]
    * by construction (that method routes through here).
    */
  def quantilesFromCounts(counts: DataFrame, vCol: String, cCol: String,
                          probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0, 1]")
    val spark = counts.sparkSession
    import spark.implicits._
    val norm = counts.select(col(vCol).cast("double").as("_v"),
      col(cCol).cast("long").as("_c"))
    val (cum, totals) = prefixSums(norm, "_v", Seq("_c"))
    val n = totals("_c")
    require(n > 0, "exactQuantiles: empty input")
    locate(cum.crossJoin(broadcast(probs.toDF("prob"))), lit(n), Nil)
  }

  /** Rank-locate both neighbors of `h = prob·(n−1)` and interpolate.
    * Input: the cumulative frame crossed with the probe set; a row covers
    * ranks `(_cum__c − _c, _cum__c]`.
    */
  private def locate(crossed: DataFrame, n: Column,
                     groupCols: Seq[String]): DataFrame = {
    val h = col("prob") * (n.cast("double") - 1)
    val rLo = floor(h).cast("long") + 1 // 1-based rank of v[⌊h⌋]
    val rHi = ceil(h).cast("long") + 1
    val lo = col("_cum__c") - col("_c")
    def covers(r: Column): Column = r > lo && r <= col("_cum__c")
    val keys = groupCols.map(col) :+ col("prob")
    crossed
      .withColumn("_h", h)
      .filter(covers(rLo) || covers(rHi))
      .groupBy(keys: _*)
      .agg(
        max(when(covers(rLo), col("_v"))).as("_vlo"),
        max(when(covers(rHi), col("_v"))).as("_vhi"),
        first(col("_h")).as("_hh"))
      .select((groupCols.map(col) :+ col("prob") :+
        (col("_vlo") + (col("_hh") - floor(col("_hh"))) *
          (col("_vhi") - col("_vlo"))).as("q")): _*)
  }
}
