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
    * ambiguous). Appends `_cum_<c>` per sum column.
    */
  def prefixSums(df: DataFrame, orderCol: String,
                 sumCols: Seq[String]): (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val w = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(parted) { (d, c) =>
      d.withColumn(s"_l_$c", sum(col(c)).over(w))
    }
    // per-partition totals → exclusive offsets (bounded: one row per
    // shuffle partition)
    val perPart = local.groupBy(col("_pid"))
      .agg(sumCols.map(c => max(col(s"_l_$c")).as(s"_t_$c")).head,
        sumCols.tail.map(c => max(col(s"_l_$c")).as(s"_t_$c")): _*)
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
      val (cum, totals) = prefixSums(counts, "_v", Seq("_c"))
      val n = totals("_c")
      require(n > 0, "exactQuantiles: empty input")
      locate(cum.crossJoin(probDf), lit(n), Nil)
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
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def dec(c: Column) = sum(round(c, 6).cast("decimal(28,6)"))
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), k) =>
      val both = col(x).isNotNull && col(y).isNotNull
      val xv = when(both, col(x).cast("double"))
      val yv = when(both, col(y).cast("double"))
      Seq(count(when(both, lit(1))).as(s"_n$k"),
        dec(xv).as(s"_sx$k"), dec(yv).as(s"_sy$k"),
        dec(xv * xv).as(s"_sxx$k"), dec(yv * yv).as(s"_syy$k"),
        dec(xv * yv).as(s"_sxy$k"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = explode(array(pairs.zipWithIndex.map { case ((x, y), k) =>
      struct(lit(x).as("cx"), lit(y).as("cy"),
        col(s"_n$k").as("n"),
        col(s"_sx$k").cast("double").as("sx"),
        col(s"_sy$k").cast("double").as("sy"),
        col(s"_sxx$k").cast("double").as("sxx"),
        col(s"_syy$k").cast("double").as("syy"),
        col(s"_sxy$k").cast("double").as("sxy"))
    }: _*)).as("e")
    val n = col("e.n").cast("double")
    val varX = n * col("e.sxx") - col("e.sx") * col("e.sx")
    val varY = n * col("e.syy") - col("e.sy") * col("e.sy")
    val cov = n * col("e.sxy") - col("e.sx") * col("e.sy")
    one.select(entries)
      .select(col("e.cx").as("col_x"), col("e.cy").as("col_y"),
        col("e.n").as("n"),
        round(when(varX > 0 && varY > 0,
          cov / sqrt(varX) / sqrt(varY)), 6).as("corr"))
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
