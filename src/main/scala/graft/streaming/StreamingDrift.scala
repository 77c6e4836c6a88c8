package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Drift
import StreamingReport.{batchDirs, compactFamily, emptyFrame, readState}

/** [[graft.operators.Drift]] kept live over an ingest stream: is the data
  * landing NOW still distributed like the reference snapshot the filters /
  * models were tuned on? The reference side is reduced ONCE at
  * [[init]] time and persisted; each micro-batch adds only its own reduced
  * partial; the report runs entirely on state — the corpus (and the
  * reference) are never rescanned.
  *
  * Three families, all mergeable-by-construction so the streamed metric
  * is EXACTLY the batch metric over the union (spec-pinned):
  *  - PSI: per-batch bucket counts (`psi/batch=<id>`) — counts add, so the
  *    merged live histogram equals [[Drift.bucketCounts]] of the whole
  *    stream; the report replays [[Drift.psiFromCounts]] verbatim.
  *  - KS: per-batch distinct-value counts (`ks/batch=<id>`) — the same
  *    reduction [[Drift.ksStatistic]] performs per side; the report merges
  *    at value grain and runs [[Drift.ksFromCounts]]. Value-grain state is
  *    the price of an EXACT sup; an unbounded-cardinality column opts into
  *    [[KsBinning]] at [[init]] — at most `bins + 2` state rows per side,
  *    the statistic exact over the binned distributions with a
  *    one-cell-mass resolution bound. The same state also serves live
  *    type-7 quantiles ([[quantilesReport]]) for free (exact, or at the
  *    binning's cell resolution).
  *  - chi-squared (optional, `catCol` at [[init]]): per-batch category
  *    counts (`cat/batch=<id>`) — the categorical-drift twin.
  *
  * The reference histogram, the breaks, and the monitored column are
  * stamped by [[init]] (`_col` / `_breaks` markers + `reference/` parquet);
  * later batches validate against them and FAIL FAST on drift of the
  * MONITOR ITSELF (changed breaks or column would splice incomparable
  * counters). Batch-keyed partition overwrite makes at-least-once replays
  * idempotent; the tiny partials compact through the shared crash-safe
  * rename protocol ([[compact]] / `autoCompactEvery`).
  */
object StreamingDrift {

  /** Opt-in bounded-state projection for the KS family: values bin to
    * `bins` equal-width cells over the declared `[lo, hi)` (each cell
    * represented by its LEFT EDGE; an underflow cell below `lo`, an
    * overflow cell at `hi` — NaN lands in overflow under Spark's
    * NaN-largest ordering), so an UNBOUNDED-cardinality column keeps at
    * most `bins + 2` state rows per side instead of one per distinct
    * value. Resolution contract: both sides bin IDENTICALLY, so the
    * served statistic is the exact KS of the binned distributions — the
    * sup evaluated at cell edges only — and differs from the exact KS by
    * at most the largest single-cell mass of either side (≈ 1/bins for
    * smooth data). The same projection bounds [[quantilesReport]]'s
    * resolution to one cell width.
    */
  final case class KsBinning(lo: Double, hi: Double, bins: Int) {
    require(bins >= 2 && lo < hi && lo.isFinite && hi.isFinite,
      s"need finite lo < hi and bins >= 2, got [$lo, $hi) x $bins")
    private[streaming] def project(v: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = {
      val step = (hi - lo) / bins
      val i = least(lit(bins.toDouble),
        greatest(lit(-1.0), floor((v - lo) / step)))
      lit(lo) + i * step
    }
  }

  /** Stamp a monitor: persist the reference side's reductions (PSI bucket
    * histogram, KS value counts) and the monitor's shape. Refuses to
    * re-stamp over existing state — a monitor's reference is immutable by
    * design (re-baselining is a NEW monitor, so trend history can't be
    * silently rebased). `ksBinning` opts the KS family into bounded
    * state ([[KsBinning]]) — stamped like the breaks, so every batch
    * bins identically or fails fast.
    */
  def init(reference: DataFrame, stateDir: String, valueCol: String,
           breaks: Seq[Double], catCol: Option[String] = None,
           ksBinning: Option[KsBinning] = None): Unit = {
    require(breaks.nonEmpty && breaks == breaks.sorted,
      "breaks must be non-empty and sorted")
    val spark = reference.sparkSession
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(new Path(s"$stateDir/_col")),
      s"drift monitor at $stateDir already initialized")
    if (batchDirs(fs, new Path(s"$stateDir/psi")).nonEmpty ||
        batchDirs(fs, new Path(s"$stateDir/ks")).nonEmpty)
      throw new IllegalStateException(
        s"drift state at $stateDir exists without markers; refusing to " +
          "guess its shape")
    // reduce the reference once; every family persists only reductions
    val pinned = reference.localCheckpoint(true)
    try {
      Drift.bucketCounts(pinned, valueCol, breaks, "n")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$stateDir/reference/psi")
      Drift.valueCounts(ksProjected(pinned, valueCol, ksBinning),
          valueCol, "c")
        .write.mode("overwrite").parquet(s"$stateDir/reference/ks")
      catCol.foreach { c =>
        Drift.catCounts(pinned, c, "c")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/reference/cat")
      }
    } finally graft.operators.Checkpoints.release(pinned)
    writeText(fs, new Path(s"$stateDir/_breaks"),
      breaks.map(_.toString).mkString(","))
    catCol.foreach(c => writeText(fs, new Path(s"$stateDir/_cat"), c))
    ksBinning.foreach(b => writeText(fs, new Path(s"$stateDir/_ksbins"),
      s"${b.lo},${b.hi},${b.bins}"))
    // _col last: its existence is the init-complete commit marker, so a
    // crash mid-init leaves a re-initializable dir, never a half-monitor
    writeText(fs, new Path(s"$stateDir/_col"), valueCol)
  }

  /** Apply the stamped KS binning (identity when the monitor is exact). */
  private def ksProjected(df: DataFrame, valueCol: String,
                          binning: Option[KsBinning]): DataFrame =
    binning match {
      case Some(b) => df.withColumn(valueCol,
        when(col(valueCol).isNotNull,
          b.project(col(valueCol).cast("double"))))
      case None => df
    }

  /** Reduce one micro-batch into every initialized family (idempotent per
    * batchId): PSI buckets + KS value counts always, category counts when
    * the monitor was initialized with a `catCol`.
    */
  def processBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val (valueCol, breaks) = shape(batch.sparkSession, stateDir)
    val cat = catShape(batch.sparkSession, stateDir)
    val binning = ksBinShape(batch.sparkSession, stateDir)
    val pinned = batch.localCheckpoint(true)
    try {
      Drift.bucketCounts(pinned, valueCol, breaks, "n")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$stateDir/psi/batch=$batchId")
      Drift.valueCounts(ksProjected(pinned, valueCol, binning),
          valueCol, "c")
        .write.mode("overwrite").parquet(s"$stateDir/ks/batch=$batchId")
      cat.foreach { c =>
        Drift.catCounts(pinned, c, "c")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/cat/batch=$batchId")
      }
    } finally graft.operators.Checkpoints.release(pinned)
  }

  /** The live PSI decomposition — reference as side `a`, everything
    * streamed so far as side `b`; identical shape and arithmetic to the
    * batch [[Drift.psiBuckets]] (shared code path). Polling before any
    * batch lands reports against an all-zero live histogram (maximal
    * smoothed divergence), which is honest: nothing has arrived.
    */
  def psiReport(spark: SparkSession, stateDir: String): DataFrame = {
    val (_, breaks) = shape(spark, stateDir)
    val nb = breaks.size + 1
    import spark.implicits._
    val ref = spark.read.parquet(s"$stateDir/reference/psi")
      .withColumnRenamed("n", "n_a")
    val live = readState(spark, s"$stateDir/psi", s"$stateDir/psi_base",
        emptyFrame(spark, "bucket INT, n BIGINT"))
      .groupBy(col("bucket")).agg(sum(col("n")).as("n_b"))
    val merged = (0 until nb).toDF("bucket")
      .join(ref, Seq("bucket"), "left")
      .join(live, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
    Drift.psiFromCounts(merged, nb)
  }

  /** Total live PSI (sum of the decomposition's contributions). */
  def psiTotal(spark: SparkSession, stateDir: String): DataFrame =
    psiReport(spark, stateDir)
      .agg(round(sum(col("contrib").cast("decimal(28,6)")).cast("double"), 6)
        .as("psi"))

  /** Live Jensen–Shannon divergence — served from the SAME bucket-count
    * state the PSI uses (no extra family); shares [[Drift.jsFromCounts]]
    * with the batch path.
    */
  def jsReport(spark: SparkSession, stateDir: String): DataFrame = {
    val (_, breaks) = shape(spark, stateDir)
    val nb = breaks.size + 1
    import spark.implicits._
    val ref = spark.read.parquet(s"$stateDir/reference/psi")
      .withColumnRenamed("n", "n_a")
    val live = readState(spark, s"$stateDir/psi", s"$stateDir/psi_base",
        emptyFrame(spark, "bucket INT, n BIGINT"))
      .groupBy(col("bucket")).agg(sum(col("n")).as("n_b"))
    Drift.jsFromCounts((0 until nb).toDF("bucket")
      .join(ref, Seq("bucket"), "left")
      .join(live, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b")))
  }

  /** The live exact KS statistic — reference as side `a`, the streamed
    * union as side `b`; shares [[Drift.ksFromCounts]] with the batch path.
    * Throws (like the batch form) while either side is empty.
    */
  def ksReport(spark: SparkSession, stateDir: String): DataFrame = {
    shape(spark, stateDir) // init gate
    val ref = spark.read.parquet(s"$stateDir/reference/ks")
      .withColumnRenamed("c", "c_a")
    val live = readState(spark, s"$stateDir/ks", s"$stateDir/ks_base",
        emptyFrame(spark, "v DOUBLE, c BIGINT"))
      .groupBy(col("v")).agg(sum(col("c")).as("c_b"))
    Drift.ksFromCounts(
      ref.join(live, Seq("v"), "full").na.fill(0L, Seq("c_a", "c_b")))
  }

  /** EXACT type-7 quantiles of everything streamed so far — computed from
    * the SAME value-count state the KS detector keeps, so live exact
    * quantiles cost no corpus scan and no extra state family. Equals
    * `Stats.exactQuantiles` over the streamed union by construction
    * (shared counts-level code path).
    */
  def quantilesReport(spark: SparkSession, stateDir: String,
                      probs: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    shape(spark, stateDir) // init gate
    val live = readState(spark, s"$stateDir/ks", s"$stateDir/ks_base",
        emptyFrame(spark, "v DOUBLE, c BIGINT"))
      .groupBy(col("v")).agg(sum(col("c")).as("c"))
    graft.operators.Stats.quantilesFromCounts(live, "v", "c", probs)
  }

  /** Live categorical drift — the chi-squared homogeneity statistic
    * between the reference's and the streamed union's `catCol`
    * distributions, from state alone; shares [[Drift.chiFromCounts]] with
    * the batch path. Requires the monitor to have been initialized with a
    * `catCol` — fails fast otherwise.
    */
  def chiSquaredReport(spark: SparkSession, stateDir: String): DataFrame = {
    shape(spark, stateDir) // init gate
    require(catShape(spark, stateDir).isDefined,
      s"drift monitor at $stateDir was initialized without a catCol")
    val refRaw = spark.read.parquet(s"$stateDir/reference/cat")
    val ref = refRaw.withColumnRenamed("c", "c_a")
    // category type follows the reference reduction's own schema (the
    // state was written by the same catCounts against the same column)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], refRaw.schema)
    val live = readState(spark, s"$stateDir/cat", s"$stateDir/cat_base",
        empty)
      .groupBy(col("cat")).agg(sum(col("c")).as("c_b"))
    Drift.chiFromCounts(
      ref.join(live, Seq("cat"), "full").na.fill(0L, Seq("c_a", "c_b")))
  }

  /** Fold old partials into the bases (all families merge by SUM at their
    * grain). The reference reduction is immutable and untouched.
    */
  def compact(spark: SparkSession, stateDir: String,
              keepBatches: Int = 2): Unit = {
    compactFamily(spark, s"$stateDir/psi", s"$stateDir/psi_base",
      keepBatches,
      merged => merged.groupBy(col("bucket")).agg(sum(col("n")).as("n")))
    compactFamily(spark, s"$stateDir/ks", s"$stateDir/ks_base",
      keepBatches,
      merged => merged.groupBy(col("v")).agg(sum(col("c")).as("c")))
    compactFamily(spark, s"$stateDir/cat", s"$stateDir/cat_base",
      keepBatches,
      merged => merged.groupBy(col("cat")).agg(sum(col("c")).as("c")))
  }

  /** Attach the monitor to a streaming DataFrame ([[init]] must have run —
    * the first trigger fails fast otherwise). Lifecycle self-contained via
    * `autoCompactEvery` (0 disables), like every sink in this package.
    */
  def sink(rows: DataFrame, stateDir: String, checkpointDir: String,
           pollSeconds: Int = 30, autoCompactEvery: Int = 64,
           keepBatches: Int = 2): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId)
        if (autoCompactEvery > 0 && batchId > 0 &&
            batchId % autoCompactEvery == 0)
          compact(batch.sparkSession, stateDir, keepBatches)
      }
      .start()

  // ------------------------------------------------------------ internals

  private def shape(spark: SparkSession,
                    stateDir: String): (String, Seq[Double]) = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val colName = readText(fs, new Path(s"$stateDir/_col")).getOrElse(
      throw new IllegalStateException(
        s"drift monitor at $stateDir not initialized (run init first)"))
    val breaks = readText(fs, new Path(s"$stateDir/_breaks")).getOrElse(
      throw new IllegalStateException(
        s"drift monitor at $stateDir has no _breaks marker"))
      .split(",").toSeq.map(_.toDouble)
    (colName, breaks)
  }

  /** The monitored categorical column, if the monitor was initialized with
    * one (the `_cat` marker).
    */
  private def catShape(spark: SparkSession,
                       stateDir: String): Option[String] = {
    val p = new Path(s"$stateDir/_cat")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readText(fs, p)
  }

  /** The stamped KS binning, if the monitor opted into bounded state. */
  private def ksBinShape(spark: SparkSession,
                         stateDir: String): Option[KsBinning] = {
    val p = new Path(s"$stateDir/_ksbins")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readText(fs, p).map { s =>
      val parts = s.split(",")
      KsBinning(parts(0).toDouble, parts(1).toDouble, parts(2).toInt)
    }
  }

  private def readText(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  private def writeText(fs: FileSystem, p: Path, v: String): Unit = {
    val out = fs.create(p, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }
}
