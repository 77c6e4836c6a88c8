package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TimeFunctions
import graft.operators.Reduction
import graft.sources.Bundle

/** Incremental T3: the per-batch cost of the online reduction loop bounded
  * by O(new images + inter-reference spacing), independent of history size.
  *
  * `Online.curveFolderReduction` re-reduces the FULL curve history every
  * trigger — correct, but per-trigger work grows O(history); a month-long
  * online run degrades linearly. The fix exploits the as-of join's
  * structure (trx/dataReduction.py:15-85): a shot's interpolated reference
  * depends only on its nearest reference shots before and after, so once a
  * LATER reference exists, the row's difference signal is FINAL — appending
  * images can never change it. Concretely, with F = last reference shot
  * seen so far:
  *
  *   - rows with `image_idx < F` are immutable (both anchors fixed);
  *   - rows with `image_idx ≥ F` (including F itself, whose next-reference
  *     neighbour is still unknown) are the mutable TAIL.
  *
  * State kept under `stateDir` (all curve-grain, all tiny):
  *
  *   - `stats.parquet` — per (delay, q_bin) ADDITIVE sufficient statistics
  *     of finalized rows: counts, Σdiff, Σdiff², kept-row counts/sums (the
  *     W2 thinning mark is positional, so a per-group finalized-row counter
  *     `n_fin` makes it incremental too), from which mean/noise/err are
  *     recovered exactly;
  *   - `tail.parquet` — RAW curve rows from the second-to-last reference
  *     onward (the recompute window: anchors + mutable rows);
  *   - `frontier/manifest.json` — reference delay + frontier indices;
  *   - `curves/` — append-only raw history, never re-read except by the
  *     full-recompute fallback.
  *
  * Each batch: recompute diffs over (tail ∪ batch) only, finalize the rows
  * that crossed the frontier into `stats`, rewrite the (bounded) tail, and
  * emit stats ⊕ tail-aggregate — numerically the same reduction as
  * `Reduction.timeResolvedSignal` over the full history (mean mode; the
  * median center is not decomposable — use the full-history path for it).
  *
  * Falls back to a full recompute (and says so in the result) when the
  * incremental assumptions break: out-of-order image indices at/below the
  * frontier, or a new smaller reference delay redefining J5 tagging.
  */
object IncrementalReduction {

  final case class BatchResult(reduced: DataFrame, windowRows: Long,
                               finalizedRows: Long, pendingRows: Long,
                               fullRecompute: Boolean)

  private def frontierDir(stateDir: String) = s"$stateDir/frontier"

  private def readFrontier(stateDir: String): Option[(Double, Long, Option[Long])] =
    Bundle.readManifest(frontierDir(stateDir)).flatMap { m =>
      for {
        rd <- m.get("refDelay").map(_.toDouble)
        f <- m.get("lastRef").map(_.toLong)
      } yield (rd, f, m.get("prevRef").filter(_.nonEmpty).map(_.toLong))
    }

  /** Process one micro-batch of new curve rows
    * (image_idx, delay, q_bin, i, err); returns the updated full reduction
    * plus the work-size metrics the churn contract is asserted on.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   atol: Double = 1e-12): BatchResult = {
    val curvesDir = s"$stateDir/curves"
    val statsPath = s"$stateDir/stats.parquet"
    val tailPath = s"$stateDir/tail.parquet"
    batch.write.mode("append").parquet(curvesDir)

    val prior = readFrontier(stateDir)
    val haveStats = new java.io.File(statsPath).exists()
    // one tiny driver action on the bounded micro-batch: the two
    // incremental-validity scalars
    val probe = batch.agg(
      min(when(col("delay") =!= TimeFunctions.OffSentinel, col("delay"))).as("mn"),
      min(col("image_idx")).as("minIdx")).collect()(0)
    val batchMinDelay = Option(probe.get(0)).map(_.toString.toDouble)
    val batchMinIdx = Option(probe.get(1)).map(_.toString.toLong)

    val incremental = prior.isDefined && haveStats &&
      batchMinDelay.forall(_ >= prior.get._1 - atol) &&
      batchMinIdx.forall(_ > prior.get._2)

    val (work, refDelay, fOld, statsPrev) =
      if (incremental) {
        val (rd, f, _) = prior.get
        val tail = spark.read.parquet(tailPath)
          .select("image_idx", "delay", "q_bin", "i", "err")
        (tail.union(batch.select("image_idx", "delay", "q_bin", "i", "err")),
          Some(rd), Some(f), Some(spark.read.parquet(statsPath)))
      } else {
        // fallback / first batch: the whole history is the window
        (spark.read.parquet(curvesDir)
          .select("image_idx", "delay", "q_bin", "i", "err"),
          None, None, None)
      }

    val tagged = Reduction.tagReferences(work, refDelay, atol)
      .localCheckpoint(true)
    val refDelayNow = refDelay.getOrElse {
      val r = tagged.filter(col("is_ref")).agg(min(col("delay"))).collect()(0)
      if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
    }
    // frontier over this window: last and second-to-last reference indices
    // distinct: curve rows are (image, q_bin) grain — one row per bin
    val topRefs = tagged.filter(col("is_ref"))
      .select(col("image_idx").cast("long")).distinct()
      .orderBy(col("image_idx").desc)
      .limit(2).collect().map(_.getLong(0))
    val fNew: Option[Long] = topRefs.headOption
    val pNew: Option[Long] = if (topRefs.length > 1) Some(topRefs(1)) else None

    val diffs = Reduction.diffSignal(Reduction.interpolateReferences(tagged))
      .withColumn("delay_c", TimeFunctions.canonicalDelay(col("delay")))
      .localCheckpoint(true)

    // mutable/new rows this batch is responsible for
    val keepRows = fOld.map(f => diffs.filter(col("image_idx") >= f))
      .getOrElse(diffs)
    val finalizedNew = fNew.map(f => keepRows.filter(col("image_idx") < f))
      .getOrElse(keepRows.limit(0))
    val pending = fNew.map(f => keepRows.filter(col("image_idx") >= f))
      .getOrElse(keepRows)

    // W2 thinning marks are positional within the (delay, q_bin) group;
    // `n_fin` carries the finalized prefix length so row_number stays
    // globally consistent across batches
    val nFinPrev = statsPrev.map(_.select(col("delay_c"), col("q_bin"),
      col("n_fin"))).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "delay_c DOUBLE, q_bin INT, n_fin BIGINT")))
    val grp = Window.partitionBy(col("delay_c"), col("q_bin"))
      .orderBy(col("image_idx"))
    def withKeep(df: DataFrame, base: DataFrame): DataFrame = df
      .join(broadcast(base), Seq("delay_c", "q_bin"), "left")
      .withColumn("_rep", coalesce(col("n_fin"), lit(0L)) + row_number().over(grp))
      .withColumn("_keep", !col("is_ref") || col("_rep") % 2 === 1)
      .drop("n_fin")

    def suffStats(df: DataFrame): DataFrame = df.groupBy(col("delay_c"), col("q_bin"))
      .agg(
        count(lit(1)).as("n_all"),
        count(col("diff")).as("n_nn"),
        sum(col("diff")).as("sum_d"),
        sum(col("diff") * col("diff")).as("sumsq_d"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        count(when(col("_keep"), col("diff"))).as("n_kept_nn"),
        sum(when(col("_keep"), col("diff"))).as("sum_kept"),
        count(lit(1)).as("n_fin"))

    val finStats = suffStats(withKeep(finalizedNew, nFinPrev))
    val statsCols = Seq("n_all", "n_nn", "sum_d", "sumsq_d", "n_kept",
      "n_kept_nn", "sum_kept", "n_fin")
    val statsNew = statsPrev match {
      case None => finStats
      case Some(prev) =>
        prev.select((Seq(col("delay_c"), col("q_bin")) ++
            statsCols.map(col)): _*)
          .unionByName(finStats)
          .groupBy(col("delay_c"), col("q_bin"))
          .agg(sum(col(statsCols.head)).as(statsCols.head),
            statsCols.tail.map(c => sum(col(c)).as(c)): _*)
    }
    val statsMat = statsNew.localCheckpoint(true)
    statsMat.write.mode("overwrite").parquet(statsPath)

    // bounded raw tail for the next batch: from the second-to-last
    // reference on (the prev-anchor the frontier row's recompute needs)
    val tailStart = pNew.orElse(fNew)
    val tailNew = tailStart.map(t => work.filter(col("image_idx") >= t))
      .getOrElse(work).localCheckpoint(true)
    tailNew.write.mode("overwrite").parquet(tailPath)
    Bundle.writeManifest(frontierDir(stateDir), Map(
      "refDelay" -> (if (refDelayNow.isNaN) prior.map(_._1.toString).getOrElse("NaN")
        else refDelayNow.toString),
      "lastRef" -> fNew.orElse(prior.map(_._2)).map(_.toString).getOrElse(""),
      "prevRef" -> pNew.map(_.toString).getOrElse("")))

    // reduced output = finalized stats ⊕ pending-tail stats, then the A3
    // formulas recovered from moments (mean mode; noise = population
    // stddev, err = noise/√n_all — reference parity, dataReduction.py:180)
    val pendStats = suffStats(withKeep(pending, statsMat
      .select(col("delay_c"), col("q_bin"), col("n_fin"))))
    val combined = statsMat
      .select((Seq(col("delay_c"), col("q_bin")) ++ statsCols.map(col)): _*)
      .unionByName(pendStats)
      .groupBy(col("delay_c"), col("q_bin"))
      .agg(sum(col(statsCols.head)).as(statsCols.head),
            statsCols.tail.map(c => sum(col(c)).as(c)): _*)
    val mean = col("sum_d") / col("n_nn")
    val noise = sqrt(greatest(col("sumsq_d") / col("n_nn") - mean * mean, lit(0.0)))
    val reduced = combined.select(
      col("delay_c").as("delay"), col("q_bin"),
      when(col("n_kept_nn") > 0, col("sum_kept") / col("n_kept_nn")).as("diff_av"),
      when(col("n_nn") > 0, noise).as("noise"),
      col("n_kept").as("n_rep"),
      when(col("n_nn") > 0, noise / sqrt(col("n_all"))).as("err"))
    reduced.write.mode("overwrite").parquet(s"$stateDir/reduced")

    // metrics from the CHECKPOINTED frames — `work` itself would lazily
    // re-read the tail store we just overwrote
    BatchResult(spark.read.parquet(s"$stateDir/reduced"),
      windowRows = tagged.count(), finalizedRows = finalizedNew.count(),
      pendingRows = tailNew.count(), fullRecompute = !incremental)
  }

  /** Streaming wrapper: `Online.curveFolderReduction` with the bounded
    * per-trigger work — same sink layout (`stateDir/reduced`).
    */
  def incrementalCurveFolderReduction(spark: SparkSession, inputDir: String,
                                      checkpointDir: String, stateDir: String,
                                      pollSeconds: Int = 30,
                                      schemaSource: DataFrame): StreamingQuery = {
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .option("maxFilesPerTrigger", 64)
      .parquet(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, stateDir)
        ()
      }
      .start()
  }
}
