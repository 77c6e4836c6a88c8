package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions
import graft.operators.{Quality, Sketches}

/** Live corpus profiling — q99's per-source report maintained
  * incrementally over a document stream (the curation dashboard that
  * tracks an ingest as it lands).
  *
  * Shape: each micro-batch writes its OWN per-(source, lang) sufficient
  * statistics ([[Quality.profilePartials]] — counts + DECIMAL quality
  * sums) under `stateDir/partials/batch=<id>` with partition overwrite,
  * so an at-least-once replay rewrites its own partition instead of
  * double-counting: replay-idempotent by construction, no read-modify-
  * write of shared state. [[report]] merges base + live partials —
  * DECIMAL sums are associative, so the streamed report is EXACTLY the
  * batch report over the union (spec-pinned, not approximately).
  *
  * Small-files lifecycle: one partial directory per trigger would be ~86k
  * directories after a month at a 30 s cadence — the listing/footer-read
  * wall. [[compact]] folds all batches except the most recent few into a
  * single `partials_base` directory (profile partials merge by SUM, HLL
  * registers by MAX — both associative, max also idempotent) with the
  * crash-safe rename protocol of `AnnIndex.compact`: (1) write the merged
  * copy to a `*_compact` temp dir (old base + folded batches), stamping
  * the highest folded batch id in an `_folded_up_to` marker inside it;
  * (2) delete the old base; (3) rename the copy into place; (4) delete
  * the folded batch directories. A crash before (2) leaves the old state
  * plus a stale temp (removed by [[heal]]); between (2) and (3) leaves
  * only the copy ([[heal]] finishes the rename); during/after (4) leaves
  * already-folded batch directories behind — harmless, because every
  * reader filters live batches to `id > _folded_up_to`, so a folded
  * directory that survived its delete is never double-counted. The
  * recent `keepBatches` partitions stay unfolded so a foreachBatch replay
  * (which only re-delivers the most recent ids) still overwrites its own
  * partition.
  *
  * Per-batch cost: one aggregation of the batch to source×lang grain and
  * a tiny write. Report cost is the base plus at most `keepBatches`
  * recent partials once compaction runs on any cadence.
  */
object StreamingReport {

  private[streaming] val FoldMarker = "_folded_up_to"

  /** Write one micro-batch's partial profile (idempotent per batchId). */
  def processBatch(batch: DataFrame, stateDir: String, batchId: Long,
                   sourceCol: String = "source", langCol: String = "lang",
                   textCol: String = "text"): Unit =
    Quality.profilePartials(batch, sourceCol, langCol, textCol)
      .write.mode("overwrite")
      .parquet(s"$stateDir/partials/batch=$batchId")

  /** The merged per-source report over everything streamed so far. A
    * dashboard may poll before the first micro-batch has landed — no
    * state yet means an EMPTY report, not a read failure.
    */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    // sum(DECIMAL(28,6)) widens to DECIMAL(38,6) — the partials' on-disk
    // type, and the schema the reader pins
    val empty = emptyFrame(spark,
      "source STRING, lang STRING, n_docs BIGINT, n_tokens BIGINT, " +
        "sum_q DECIMAL(38,6)")
    Quality.reportFromPartials(
      readState(spark, s"$stateDir/partials", s"$stateDir/partials_base",
        empty))
  }

  /** Per-batch HLL register partials for per-source distinct-token
    * cardinality — the sketch companion to the profile partials, same
    * batch-keyed partition-overwrite discipline. Register merge is MAX
    * (idempotent as well as associative), so a replay rewriting its own
    * partition is doubly safe: even if two deliveries of one batch landed
    * under different ids, the merged registers would not move.
    *
    * The bucket-bit count `b` shapes the register STATE, so the first
    * write persists it in `stateDir/hll/_b`; later writes with a
    * different `b` throw instead of silently mixing incompatible
    * registers, and [[distinctReport]] reads the persisted value rather
    * than trusting a caller to repeat it.
    */
  def processBatchDistinct(batch: DataFrame, stateDir: String, batchId: Long,
                           sourceCol: String = "source",
                           textCol: String = "text", b: Int = 9): Unit = {
    val hadoop = batch.sparkSession.sparkContext.hadoopConfiguration
    val dir = new Path(s"$stateDir/hll")
    val fs = dir.getFileSystem(hadoop)
    readB(fs, dir) match {
      case Some(persisted) =>
        require(persisted == b,
          s"HLL state at $dir was written with b=$persisted; refusing b=$b")
      case None =>
        requireUnshapedState(fs, dir, s"$stateDir/hll_base")
        fs.mkdirs(dir)
        writeMarker(fs, new Path(dir, "_b"), b.toLong)
    }
    Sketches.hllRegisters(
        batch.select(col(sourceCol).as("source"),
          explode(TextFunctions.tokens(col(textCol))).as("tok")),
        "tok", b, groupCols = Seq("source"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/hll/batch=$batchId")
  }

  /** Per-source distinct-token estimates over everything streamed so far.
    * Registers merge exactly (integer max), so the streamed estimate is
    * bit-identical to the batch estimate over the union — not just close.
    * `b` comes from the persisted `_b` marker (the value the registers
    * were actually written with); pre-stream there is no state and the
    * report is empty, so no parameter is needed at all.
    */
  def distinctReport(spark: SparkSession, stateDir: String): DataFrame = {
    val dir = new Path(s"$stateDir/hll")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = shapeOrDefault(fs, new Path(dir, "_b"), dir,
      s"$stateDir/hll_base", 9)
    val partials = readState(spark, s"$stateDir/hll", s"$stateDir/hll_base",
      emptyFrame(spark, "source STRING, bucket INT, max_rho INT"))
    Sketches.hllEstimateByGroup(
      Sketches.hllMerge(partials, Seq("source")), b, Seq("source"))
  }

  /** Pairwise source overlap/containment estimates over the STREAMED
    * register state ([[Sketches.hllOverlapMatrix]] fed by the same
    * merged partials [[distinctReport]] reads): registers merge exactly,
    * so the streamed matrix is bit-identical to the batch matrix over
    * the union of everything streamed — the dedup-planning dashboard
    * stays live without ever re-scanning the ingested corpus.
    */
  def overlapReport(spark: SparkSession, stateDir: String): DataFrame = {
    val dir = new Path(s"$stateDir/hll")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = shapeOrDefault(fs, new Path(dir, "_b"), dir,
      s"$stateDir/hll_base", 9)
    val partials = readState(spark, s"$stateDir/hll", s"$stateDir/hll_base",
      emptyFrame(spark, "source STRING, bucket INT, max_rho INT"))
    Sketches.hllOverlapMatrix(
      Sketches.hllMerge(partials, Seq("source")), b, "source")
  }

  /** Per-batch KMV (theta) k-set partials for per-source distinct
    * tracking with SET-ALGEBRA serving — the sketch whose merge
    * (sorted-union-truncate) is associative AND idempotent, so the
    * batch-keyed overwrite discipline applies unchanged. State shape
    * (`_k` marker) is pinned like the HLL `_b`.
    */
  def processBatchKmv(batch: DataFrame, stateDir: String, batchId: Long,
                      sourceCol: String = "source",
                      textCol: String = "text", k: Int = 64): Unit = {
    val hadoop = batch.sparkSession.sparkContext.hadoopConfiguration
    val dir = new Path(s"$stateDir/kmv")
    val fs = dir.getFileSystem(hadoop)
    readMarker(fs, new Path(dir, "_k")) match {
      case Some(persisted) =>
        require(persisted == k.toLong,
          s"KMV state at $dir was written with k=$persisted; refusing k=$k")
      case None =>
        requireUnshapedState(fs, dir, s"$stateDir/kmv_base")
        fs.mkdirs(dir)
        writeMarker(fs, new Path(dir, "_k"), k.toLong)
    }
    Sketches.kmvState(
        batch.select(col(sourceCol).as("source"),
          explode(TextFunctions.tokens(col(textCol))).as("tok")),
        "tok", k, groupCols = Seq("source"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/kmv/batch=$batchId")
  }

  /** Merged per-source KMV state over everything streamed so far: the
    * per-batch k-sets re-aggregate through the SAME bounded aggregator
    * over (batches × k)-row partials — never the corpus.
    */
  private def mergedKmv(spark: SparkSession,
                        stateDir: String): (DataFrame, Int) = {
    val dir = new Path(s"$stateDir/kmv")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val k = shapeOrDefault(fs, new Path(dir, "_k"), dir,
      s"$stateDir/kmv_base", 64)
    val partials = readState(spark, s"$stateDir/kmv", s"$stateDir/kmv_base",
      emptyFrame(spark, "source STRING, rank INT, h BIGINT"))
    (Sketches.kmvMergeState(partials, k, Seq("source")), k)
  }

  /** Per-source distinct estimates from the streamed KMV state —
    * bit-identical to the batch build over the union (idempotent merge).
    */
  def kmvReport(spark: SparkSession, stateDir: String): DataFrame = {
    val (merged, k) = mergedKmv(spark, stateDir)
    Sketches.kmvEstimate(merged, k, Seq("source"))
  }

  /** Pairwise DIRECT intersection/Jaccard estimates
    * ([[Sketches.kmvOverlapMatrix]]) served from the streamed state.
    */
  def kmvOverlapReport(spark: SparkSession, stateDir: String): DataFrame = {
    val (merged, k) = mergedKmv(spark, stateDir)
    Sketches.kmvOverlapMatrix(merged, k, "source")
  }

  /** The unified per-source dashboard from STREAMED state alone — the
    * live twin of the q149 batch dashboard store: profile (docs, tokens,
    * mean quality, language entropy), HLL distinct-token estimate,
    * source-grain quality p50/p90 (the (source, lang) moments partials
    * merge EXACTLY across langs — power sums add, lo/hi min/max — so the
    * source-grain sketch equals a direct source-grain build), and the
    * theta top-overlap leg ([[Sketches.kmvTopOverlap]] over the merged
    * KMV state). Every leg reads sketch-grain state; the ingested corpus
    * is never re-scanned. The count-min leg stays the probe-shaped
    * [[freqReport]]: a per-source hot-token COUNT needs token-grain
    * state no sketch holds — the same reason the batch dashboard store
    * persists that leg reduced at build time.
    */
  def dashboard(spark: SparkSession, stateDir: String): DataFrame = {
    val profile = report(spark, stateDir)
    val est = distinctReport(spark, stateDir)
      .select(col("source"),
        round(col("est_distinct"), 6).as("est_distinct_tokens"))
    val momPartials = readState(spark, s"$stateDir/moments",
      s"$stateDir/moments_base",
      emptyFrame(spark, "source STRING, lang STRING, n BIGINT, " +
        "s1 DECIMAL(38,6), s2 DECIMAL(38,6), s3 DECIMAL(38,6), " +
        "s4 DECIMAL(38,6), lo DOUBLE, hi DOUBLE"))
    val piv = Sketches.momentsQuantiles(
        Sketches.momentsMerge(momPartials, Seq("source")),
        Seq(0.5, 0.9), Seq("source"))
      .groupBy(col("source"))
      .agg(
        round(max(when(col("q") === 0.5, col("est"))), 6)
          .as("p50_quality"),
        round(max(when(col("q") === 0.9, col("est"))), 6)
          .as("p90_quality"))
    val (merged, k) = mergedKmv(spark, stateDir)
    val top = Sketches.kmvTopOverlap(merged, k, "source")
    profile
      .join(broadcast(est), Seq("source"), "left")
      .join(broadcast(piv), Seq("source"), "left")
      .join(broadcast(top), Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("lang_entropy"),
        col("est_distinct_tokens"), col("p50_quality"),
        col("p90_quality"), col("top_overlap_source"),
        col("top_overlap_jaccard"), col("top_overlap_containment"))
  }

  /** Per-batch count-min counter partials for streaming heavy-hitter
    * tracking — the frequency companion to the profile/HLL partials,
    * same batch-keyed partition-overwrite discipline. Counter merge is
    * SUM: associative but NOT idempotent, so replay safety here rests
    * entirely on a redelivered batch rewriting its OWN partition (and on
    * the compactor's `_folded_up_to` filter, which keeps a resurrected
    * folded partition out of every read). The sketch shape is persisted
    * (`_d`/`_w` markers) and mismatched writers throw, like the HLL `_b`.
    */
  def processBatchFreq(batch: DataFrame, stateDir: String, batchId: Long,
                       textCol: String = "text", d: Int = 4,
                       w: Int = 1024): Unit = {
    val dir = new Path(s"$stateDir/cm")
    val fs = dir.getFileSystem(batch.sparkSession.sparkContext
      .hadoopConfiguration)
    (readMarker(fs, new Path(dir, "_d")),
        readMarker(fs, new Path(dir, "_w"))) match {
      case (Some(pd), Some(pw)) =>
        require(pd == d && pw == w,
          s"CM state at $dir was written with d=$pd w=$pw; refusing d=$d w=$w")
      case _ =>
        requireUnshapedState(fs, dir, s"$stateDir/cm_base")
        fs.mkdirs(dir)
        writeMarker(fs, new Path(dir, "_d"), d.toLong)
        writeMarker(fs, new Path(dir, "_w"), w.toLong)
    }
    Sketches.cmCounters(
        batch.select(explode(TextFunctions.tokens(col(textCol))).as("tok")),
        "tok", d, w)
      .write.mode("overwrite")
      .parquet(s"$stateDir/cm/batch=$batchId")
  }

  /** Count-min estimates for `probes` over everything streamed so far —
    * counters merge by exact integer SUM, so the streamed estimate equals
    * the batch sketch over the union exactly. Shape comes from the
    * persisted `_d`/`_w` markers.
    */
  def freqReport(spark: SparkSession, stateDir: String, probes: DataFrame,
                 probeCol: String): DataFrame = {
    val dir = new Path(s"$stateDir/cm")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = shapeOrDefault(fs, new Path(dir, "_d"), dir,
      s"$stateDir/cm_base", 4)
    val w = shapeOrDefault(fs, new Path(dir, "_w"), dir,
      s"$stateDir/cm_base", 1024)
    val partials = readState(spark, s"$stateDir/cm", s"$stateDir/cm_base",
      emptyFrame(spark, "j INT, bucket INT, cnt BIGINT"))
    Sketches.cmEstimate(partials, probes, probeCol, d, w)
  }

  /** Per-batch SPARSE-or-dense HLL partials at the finer (source, lang)
    * grain — [[Sketches.hllSparseState]] under the streaming partials
    * discipline. Small groups keep their exact distinct hashes (the
    * report is EXACT for them), large ones their registers; the merge
    * ([[Sketches.hllSparseMerge]]) is associative AND idempotent (set
    * union / MAX / a deterministic promotion), so batch replay and base
    * compaction are both safe — a group that crosses the threshold only
    * ACROSS batches promotes at merge time exactly as a one-pass build
    * would. `b` and `threshold` persist in markers like the dense `_b`.
    */
  def processBatchSparseDistinct(batch: DataFrame, stateDir: String,
                                 batchId: Long,
                                 sourceCol: String = "source",
                                 langCol: String = "lang",
                                 textCol: String = "text", b: Int = 9,
                                 threshold: Int = 256): Unit = {
    val dir = new Path(s"$stateDir/hlls")
    val fs = dir.getFileSystem(batch.sparkSession.sparkContext
      .hadoopConfiguration)
    (readMarker(fs, new Path(dir, "_b")),
        readMarker(fs, new Path(dir, "_t"))) match {
      case (Some(pb), Some(pt)) =>
        require(pb == b && pt == threshold,
          s"sparse-HLL state at $dir was written with b=$pb threshold=$pt; " +
            s"refusing b=$b threshold=$threshold")
      case _ =>
        requireUnshapedState(fs, dir, s"$stateDir/hlls_base")
        fs.mkdirs(dir)
        writeMarker(fs, new Path(dir, "_b"), b.toLong)
        writeMarker(fs, new Path(dir, "_t"), threshold.toLong)
    }
    Sketches.hllSparseState(
        batch.select(col(sourceCol).as("source"), col(langCol).as("lang"),
          explode(TextFunctions.tokens(col(textCol))).as("tok")),
        "tok", b, threshold, Seq("source", "lang"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/hlls/batch=$batchId")
  }

  /** Per-(source, lang) distinct-token estimates from the sparse state —
    * EXACT for groups still below the persisted threshold, HLL for the
    * promoted ones.
    */
  def sparseDistinctReport(spark: SparkSession,
                           stateDir: String): DataFrame = {
    val dir = new Path(s"$stateDir/hlls")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = shapeOrDefault(fs, new Path(dir, "_b"), dir,
      s"$stateDir/hlls_base", 9)
    val t = shapeOrDefault(fs, new Path(dir, "_t"), dir,
      s"$stateDir/hlls_base", 256)
    val partials = readState(spark, s"$stateDir/hlls", s"$stateDir/hlls_base",
      emptyFrame(spark,
        "source STRING, lang STRING, kind INT, k BIGINT, v INT"))
    Sketches.hllSparseEstimate(
      Sketches.hllSparseMerge(partials, b, t, Seq("source", "lang")),
      b, Seq("source", "lang"))
  }

  /** Per-batch moments-sketch partials (power sums of the quality score)
    * at the (source, lang) grain — the same grain the sparse-distinct
    * report keys, so the dashboard's two sketch legs line up. Seven
    * DECIMAL-exact numbers per (source, lang, batch), merged by addition
    * (batch-keyed overwrite for replay safety, like the count-min
    * family). Constant state per group — the finer grain multiplies rows
    * by the language count, not by data volume.
    */
  def processBatchMoments(batch: DataFrame, stateDir: String, batchId: Long,
                          sourceCol: String = "source",
                          langCol: String = "lang",
                          textCol: String = "text"): Unit =
    Sketches.momentsState(
        batch.select(col(sourceCol).as("source"), col(langCol).as("lang"),
          round(TextFunctions.qualityScore(col(textCol)), 6).as("q")),
        "q", Seq("source", "lang"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/moments/batch=$batchId")

  /** Per-(source, lang) quality-quantile estimates over everything
    * streamed so far — the moments state merges exactly (DECIMAL sums),
    * so the streamed estimate equals the batch-built sketch over the
    * union.
    */
  def quantileReport(spark: SparkSession, stateDir: String,
                     qs: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val partials = readState(spark, s"$stateDir/moments",
      s"$stateDir/moments_base",
      emptyFrame(spark, "source STRING, lang STRING, n BIGINT, " +
        "s1 DECIMAL(38,6), s2 DECIMAL(38,6), s3 DECIMAL(38,6), " +
        "s4 DECIMAL(38,6), lo DOUBLE, hi DOUBLE"))
    Sketches.momentsQuantiles(
      Sketches.momentsMerge(partials, Seq("source", "lang")), qs,
      Seq("source", "lang"))
  }

  /** Fold every batch partition except the most recent `keepBatches` into
    * the base directory, for each sketch family present (profile, HLL,
    * count-min, moments). Safe to run on any cadence, concurrent with the
    * stream's sink between triggers; see the class doc for the crash
    * protocol.
    */
  def compact(spark: SparkSession, stateDir: String,
              keepBatches: Int = 2): Unit = {
    require(keepBatches >= 1, "must keep at least one recent batch")
    compactFamily(spark, s"$stateDir/partials", s"$stateDir/partials_base",
      keepBatches,
      merged => merged.groupBy(col("source"), col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("sum_q")).as("sum_q")))
    compactFamily(spark, s"$stateDir/hll", s"$stateDir/hll_base",
      keepBatches, merged => Sketches.hllMerge(merged, Seq("source")))
    compactFamily(spark, s"$stateDir/cm", s"$stateDir/cm_base",
      keepBatches, merged => Sketches.cmMerge(merged))
    compactFamily(spark, s"$stateDir/moments", s"$stateDir/moments_base",
      keepBatches,
      merged => Sketches.momentsMerge(merged, Seq("source", "lang")))
    val hllsDir = new Path(s"$stateDir/hlls")
    val fs = hllsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (readMarker(fs, new Path(hllsDir, "_b")),
        readMarker(fs, new Path(hllsDir, "_t"))) match {
      case (Some(b), Some(t)) =>
        compactFamily(spark, s"$stateDir/hlls", s"$stateDir/hlls_base",
          keepBatches, merged => Sketches.hllSparseMerge(merged, b.toInt,
            t.toInt, Seq("source", "lang")))
      case _ => () // family never written
    }
    readMarker(fs, new Path(s"$stateDir/kmv", "_k")) match {
      case Some(k) =>
        compactFamily(spark, s"$stateDir/kmv", s"$stateDir/kmv_base",
          keepBatches,
          merged => Sketches.kmvMergeState(merged, k.toInt, Seq("source")))
      case None => () // family never written
    }
  }

  /** Attach the profiling sink to a streaming document DataFrame; with
    * `trackDistinct` the HLL partials and with `trackFreq` the count-min
    * partials land in the same foreachBatch.
    *
    * Lifecycle is self-contained: every `autoCompactEvery` batches the
    * sink folds old partials into the base IN-LINE (foreachBatch runs
    * between triggers, so the fold never races its own writer) — a sink
    * left running at a 30 s cadence stays at ≤ base + autoCompactEvery +
    * keepBatches directories per family forever instead of accumulating
    * one directory per trigger until an operator intervenes. 0 disables.
    */
  def sink(docs: DataFrame, stateDir: String, checkpointDir: String,
           pollSeconds: Int = 30, trackDistinct: Boolean = false,
           trackFreq: Boolean = false, trackQuantiles: Boolean = false,
           trackSparseDistinct: Boolean = false, trackKmv: Boolean = false,
           autoCompactEvery: Int = 64, keepBatches: Int = 2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSinkBatch(batch, stateDir, batchId, trackDistinct, trackFreq,
          trackQuantiles, trackSparseDistinct, trackKmv, autoCompactEvery,
          keepBatches)
      }
      .start()

  /** One trigger's complete sink work — the foreachBatch body, also the
    * unit the long-run spec drives directly (hundreds of real triggers
    * would test Spark's scheduler, not this logic).
    */
  private[graft] def processSinkBatch(batch: DataFrame, stateDir: String,
      batchId: Long, trackDistinct: Boolean, trackFreq: Boolean,
      trackQuantiles: Boolean = false, trackSparseDistinct: Boolean = false,
      trackKmv: Boolean = false,
      autoCompactEvery: Int = 64, keepBatches: Int = 2): Unit = {
    // multiple actions read the batch → pin one snapshot for all
    val pinned =
      if (trackDistinct || trackFreq || trackQuantiles ||
          trackSparseDistinct || trackKmv)
        batch.localCheckpoint(true)
      else batch
    processBatch(pinned, stateDir, batchId)
    if (trackDistinct) processBatchDistinct(pinned, stateDir, batchId)
    if (trackFreq) processBatchFreq(pinned, stateDir, batchId)
    if (trackQuantiles) processBatchMoments(pinned, stateDir, batchId)
    if (trackSparseDistinct)
      processBatchSparseDistinct(pinned, stateDir, batchId)
    if (trackKmv) processBatchKmv(pinned, stateDir, batchId)
    if (autoCompactEvery > 0 && batchId > 0 &&
        batchId % autoCompactEvery == 0)
      compact(batch.sparkSession, stateDir, keepBatches)
  }

  // ------------------------------------------------------------ internals

  private[streaming] def emptyFrame(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** base (if any) ∪ live batch partitions newer than the fold cutoff —
    * the exact state a report merges. Heals a torn compaction first
    * (finish-only), then takes a CONSISTENT snapshot versus a concurrent
    * [[compact]]: the fold-cutoff marker is re-read after the live
    * listing, and if the cutoff moved (a swap completed mid-snapshot,
    * which would double-count folded batches that appear both in the new
    * base and as not-yet-deleted live dirs) the snapshot retries from
    * the new marker. The base is read by the CONCRETE file paths listed
    * inside the snapshot, so a later swap cannot silently change what
    * the returned frame scans.
    */
  private[streaming] def readState(spark: SparkSession, liveDir: String,
                                   baseDir: String, empty: DataFrame): DataFrame = {
    val basePath = new Path(baseDir)
    val fs = basePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (true) {
      heal(fs, basePath)
      val cutoff = foldedUpTo(fs, basePath)
      val live = batchDirs(fs, new Path(liveDir)).filter(_._1 > cutoff)
      val baseFiles =
        if (fs.exists(basePath))
          fs.listStatus(basePath).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
        else Nil
      // snapshot is consistent iff the cutoff did not move underneath it
      if (foldedUpTo(fs, basePath) == cutoff) {
        val base =
          if (baseFiles.nonEmpty)
            spark.read.schema(empty.schema).parquet(baseFiles: _*)
          else empty
        return if (live.isEmpty) base
        else base.unionByName(
          spark.read.schema(empty.schema)
            .parquet(live.map(_._2.toString): _*))
      }
      attempt += 1
      if (attempt > 16)
        throw new IllegalStateException(
          s"state at $liveDir kept moving during snapshot ($attempt tries)")
    }
    empty // unreachable
  }

  /** (batchId, path) for every `batch=N` child of `dir`; empty when the
    * directory does not exist yet.
    */
  private[streaming] def batchDirs(fs: FileSystem, dir: Path): Seq[(Long, Path)] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => s.getPath.getName.stripPrefix("batch=").toLong -> s.getPath)

  private[streaming] def foldedUpTo(fs: FileSystem, baseDir: Path): Long =
    readMarker(fs, new Path(baseDir, FoldMarker)).getOrElse(-1L)

  private def readB(fs: FileSystem, hllDir: Path): Option[Int] =
    readMarker(fs, new Path(hllDir, "_b")).map(_.toInt)

  /** Stamping a shape marker is only legal on a family with no batch
    * state yet — state written without a marker (or whose marker was
    * lost) must not have a caller's shape guessed onto it: mixed-shape
    * registers/counters produce garbage estimates with no error.
    */
  private def requireUnshapedState(fs: FileSystem, liveDir: Path,
                                   baseDir: String): Unit =
    if (batchDirs(fs, liveDir).nonEmpty || fs.exists(new Path(baseDir)))
      throw new IllegalStateException(
        s"sketch state at $liveDir exists without a shape marker; " +
          "refusing to guess its shape")

  /** Persisted shape value; `default` only applies to a never-written
    * family (whose report is empty regardless) — existing shapeless
    * state errors instead of silently defaulting.
    */
  private def shapeOrDefault(fs: FileSystem, marker: Path, liveDir: Path,
                             baseDir: String, default: Int): Int =
    readMarker(fs, marker).map(_.toInt).getOrElse {
      requireUnshapedState(fs, liveDir, baseDir)
      default
    }

  private[streaming] def readMarker(fs: FileSystem, p: Path): Option[Long] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }

  private[streaming] def writeMarker(fs: FileSystem, p: Path, v: Long): Unit = {
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Finish a torn base swap: temp exists without a live base → the
    * delete succeeded but the rename did not; the temp IS the base
    * (finish the rename). A temp ALONGSIDE a live base is NOT touched
    * here: it is either a stale copy from a crashed attempt (cleaned by
    * the next [[compactFamily]], which deletes it before writing its
    * own) or — crucially — an IN-PROGRESS compaction's write between
    * its temp write and its base delete; a reader deleting it would
    * destroy the compacted copy and strand the compactor mid-swap.
    * Finish-only healing is safe from both readers and the compactor.
    */
  private[streaming] def heal(fs: FileSystem, baseDir: Path): Unit = {
    val tmp = new Path(baseDir.getParent, baseDir.getName + "_compact")
    if (fs.exists(tmp) && !fs.exists(baseDir)) {
      // A concurrent healer may win the same rename; losing is fine as
      // long as somebody did it.
      if (!fs.rename(tmp, baseDir) && !fs.exists(baseDir))
        throw new IllegalStateException(s"compaction heal failed: $tmp")
    }
  }

  private[streaming] def compactFamily(spark: SparkSession, liveDir: String,
                                       baseDir: String, keepBatches: Int,
                                       merge: DataFrame => DataFrame): Unit = {
    val basePath = new Path(baseDir)
    val fs = basePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    heal(fs, basePath)
    val already = foldedUpTo(fs, basePath)
    val all = batchDirs(fs, new Path(liveDir))
    if (all.isEmpty) return
    val cutoff = all.map(_._1).max - keepBatches
    // fold strictly (already, cutoff]: directories at or below `already`
    // are leftovers of a crash after rename — their content is in the
    // base, re-reading them would double-count the SUM family
    val fold = all.filter { case (id, _) => id > already && id <= cutoff }
    if (fold.isEmpty) return
    val schema = spark.read.parquet(fold.head._2.toString).schema
    val oldBase =
      if (fs.exists(basePath)) spark.read.schema(schema).parquet(baseDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val tmp = new Path(basePath.getParent, basePath.getName + "_compact")
    fs.delete(tmp, true) // stale copy from a crashed earlier attempt
    merge(oldBase.unionByName(
        spark.read.schema(schema).parquet(fold.map(_._2.toString): _*)))
      .coalesce(1)
      .write.parquet(tmp.toString)
    writeMarker(fs, new Path(tmp, FoldMarker), cutoff)
    fs.delete(basePath, true)
    // A concurrent reader's heal() may finish this exact rename between
    // our delete and our rename — ours then fails with the swap already
    // complete. Verify by the marker before declaring failure.
    if (!fs.rename(tmp, basePath) && foldedUpTo(fs, basePath) != cutoff)
      throw new IllegalStateException(s"compaction rename failed: $baseDir")
    fold.foreach { case (_, p) => fs.delete(p, true) }
  }
}
