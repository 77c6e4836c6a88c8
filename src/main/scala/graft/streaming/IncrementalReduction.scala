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
  * images can never change it. The as-of windows partition by q_bin and a
  * sparse table need not carry every bin on every image, so the frontier is
  * tracked PER BIN: with F(b) = last reference index that has a row in bin
  * b,
  *
  *   - rows of bin b with `image_idx < F(b)` are immutable (both in-bin
  *     anchors fixed);
  *   - rows with `image_idx ≥ F(b)` (including F(b) itself, whose
  *     next-reference neighbour is still unknown) are the mutable TAIL.
  *
  * State kept under `stateDir` (all curve-grain, all tiny):
  *
  *   - `state.parquet` — ONE store, two row kinds under a `_tbl`
  *     discriminator (both group-grain small; splitting them bought two
  *     state-commit jobs per batch for no isolation):
  *     `s` rows carry per (delay, q_bin) ADDITIVE sufficient statistics
  *     of finalized rows — counts, Σdiff, Σdiff², kept-row counts/sums
  *     (the W2 thinning mark is positional, so a per-group finalized-row
  *     counter `n_fin` makes it incremental too) — from which
  *     mean/noise/err are recovered exactly; `f` rows carry the
  *     (q_bin, f, p) frontier indices;
  *   - `tail.parquet` — RAW curve rows from each bin's second-to-last
  *     reference onward (the recompute window: anchors + mutable rows);
  *   - `frontier/manifest.json` — the reference delay and the max
  *     processed index (the strict-append validity check);
  *   - `curves/` — append-only raw history, never re-read except by the
  *     full-recompute fallback; [[compact]] folds old `batch=<id>`
  *     partitions into O(log) immutable range segments under
  *     `curves_base/` so a month-long run never hits the one-directory-
  *     per-trigger listing wall (see the compaction section below).
  *
  * Each batch: recompute diffs over (tail ∪ batch) only, finalize the rows
  * that crossed the frontier into `stats`, rewrite the (bounded) tail, and
  * emit stats ⊕ tail-aggregate — numerically the same reduction as
  * `Reduction.timeResolvedSignal` over the full history. The mean-mode
  * center is exact by construction (additive moments); the median-mode
  * twin (`reduced_median`) rides a mergeable t-digest per group, which is
  * EXACT (equals the sorted-history median, interpolation rule included)
  * while a group's kept count stays below 2·`tdCompression` and has the
  * documented 1/compression rank-error bound beyond — size `tdCompression`
  * to the expected per-(delay, q_bin) repetition count to keep month-long
  * median runs exact. Each group's current regime is surfaced as the
  * `exact` boolean of `reduced_median` (true while every centroid is a
  * singleton), so crossing the line is visible telemetry, not a silent
  * precision change.
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

  /** Torn-commit detection for at-least-once replays: a batch stamps an
    * INTENT marker (its batch token) before the state-swap wave and the
    * same token into the manifest AFTER (the commit). A crash between
    * the swaps and the manifest leaves intent ≠ committed — the stale
    * manifest's `maxIdx` would then let a replay of that very batch pass
    * the strict-append check and re-merge rows already folded into
    * `state.parquet`. Any unmatched intent routes the next batch through
    * the full-recompute fallback (the history append is batch-keyed
    * idempotent, so the recompute rebuilds correct state from scratch).
    */
  private def intentPath(stateDir: String) =
    new org.apache.hadoop.fs.Path(s"${frontierDir(stateDir)}/inflight")

  private def readIntent(stateDir: String): Option[String] = {
    val (fs, p) = Bundle.fsPath(intentPath(stateDir).toString)
    Bundle.readStringIfExists(fs, p).map(_.trim)
  }

  private def writeIntent(stateDir: String, token: String): Unit = {
    val (fs, d) = Bundle.fsPath(frontierDir(stateDir))
    Bundle.writeStringCommitted(fs, d, "inflight", token)
  }

  /** Write `df` to `path` via a sibling tmp directory + directory swap:
    * ONE Spark job, and the input plan may safely READ the old `path`
    * (the former pattern — localCheckpoint then overwrite — paid a second
    * materialization for that safety). A crash between delete and rename
    * leaves the store absent; the next batch's validity check sees the
    * missing piece and routes through the full-recompute fallback.
    */
  private def writeSwap(df: DataFrame, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val tp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = hp.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    fs.delete(tp, true)
    df.write.mode("overwrite").parquet(tp.toString)
    fs.delete(hp, true)
    if (!fs.rename(tp, hp))
      throw new java.io.IOException(s"writeSwap: rename $tp -> $hp failed")
  }

  private def readFrontier(m: Option[Map[String, String]]): Option[(Double, Long)] =
    m.flatMap { m =>
      for {
        rd <- m.get("refDelay").map(_.toDouble)
        mx <- m.get("maxIdx").map(_.toLong)
      } yield (rd, mx)
    }

  // ------------------------- curve-history compaction -------------------
  //
  // `curves/` is append-only and read ONLY by the full-recompute fallback,
  // but one `batch=<id>` directory per trigger is ~86k directories after a
  // month at the reference's 30 s poll — the listing/footer wall on
  // exactly the shared storage the state layer targets. Unlike the sketch
  // families (group-grain, rewrite-the-base-cheaply), the raw history IS
  // the corpus: folding it into one base per compaction would rewrite
  // O(history) bytes every K batches — O(history²/K) total, a scale
  // killer. Instead batches fold into immutable RANGE SEGMENTS
  // (`curves_base/seg=<lo>-<hi>`, ids inclusive; raw rows concatenate
  // verbatim, no merge function needed), and adjacent segments merge
  // GEOMETRICALLY (newest merges into its neighbour only while it is at
  // least as wide — the binary-counter discipline), so every byte is
  // rewritten O(log N) times total and the segment count stays
  // O(log(N/K)).
  //
  // Crash protocol (every commit is ONE directory rename):
  //   - a segment is written to `.tmp-<lo>-<hi>` then renamed to
  //     `seg=<lo>-<hi>`; a crash before the rename leaves a `.tmp-*`
  //     (ignored by readers, deleted by the next compact);
  //   - a crash AFTER the rename but before the input deletes leaves
  //     batch dirs with id ≤ the segment's hi (readers filter them out;
  //     the next compact deletes them) or a merge's two input segments
  //     whose ranges are CONTAINED in the new one (readers and compact
  //     drop contained segments — their rows are in the superset);
  //   - a foreachBatch replay that rewrites an already-folded
  //     `batch=<id>` is invisible to readers for the same reason
  //     (id ≤ max folded hi). `keepBatches` recent ids stay unfolded so
  //     live replays keep overwriting their own partition.
  //
  // `compact` must not run concurrently with `processBatch` on the same
  // stateDir — the streaming wrapper runs both inside foreachBatch, which
  // serializes them by construction.

  private val SegRe = "^seg=(\\d+)-(\\d+)$".r

  private def curvesBaseDir(stateDir: String) = s"$stateDir/curves_base"

  /** Committed segments (lo, hi, path), strictly-contained ranges
    * dropped (leftover inputs of a completed merge — their rows live in
    * the containing segment).
    */
  private def listSegments(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[(Long, Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(base)) Nil
    else {
      val all = fs.listStatus(base).toSeq.flatMap { st =>
        st.getPath.getName match {
          case SegRe(lo, hi) if st.isDirectory =>
            Some((lo.toLong, hi.toLong, st.getPath))
          case _ => None
        }
      }
      all.filter { case (lo, hi, _) =>
        !all.exists { case (l2, h2, _) =>
          (l2, h2) != (lo, hi) && l2 <= lo && hi <= h2 }
      }
    }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Concatenate `inputs`' files into a committed `seg=<lo>-<hi>`:
    * write to a dot-tmp sibling sized at ~128 MB per output file, then
    * rename (the commit point). Callers delete the inputs afterwards.
    */
  private def writeSegment(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path,
      inputs: Seq[org.apache.hadoop.fs.FileStatus],
      lo: Long, hi: Long): Unit = {
    val nOut = math.max(1L,
      (inputs.map(_.getLen).sum + (128L << 20) - 1) / (128L << 20)).toInt
    val tmp = new org.apache.hadoop.fs.Path(base, s".tmp-$lo-$hi")
    fs.delete(tmp, true)
    spark.read.parquet(inputs.map(_.getPath.toString): _*)
      .coalesce(nOut)
      .write.parquet(tmp.toString)
    val dst = new org.apache.hadoop.fs.Path(base, s"seg=$lo-$hi")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"segment commit $tmp -> $dst failed")
  }

  /** Fold every `curves/batch=<id>` except the most recent `keepBatches`
    * into the segment store, then run the geometric merge loop. Heals
    * every torn-crash shape first; idempotent; batch-keyed history only
    * (the `batchKey = None` flat-append layout has no fold grain and is
    * refused loudly).
    */
  def compact(spark: SparkSession, stateDir: String,
              keepBatches: Int = 2): Unit = {
    require(keepBatches >= 1, "must keep at least one recent batch")
    val curvesDir = new org.apache.hadoop.fs.Path(s"$stateDir/curves")
    val base = new org.apache.hadoop.fs.Path(curvesBaseDir(stateDir))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(curvesDir)) return
    require(!fs.listStatus(curvesDir).exists { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }, s"curve history at $curvesDir is flat-append (no batchKey) — " +
      "it has no fold grain; run the stream with batch-keyed state")
    // heal: stale tmps, contained merge inputs, already-folded batch dirs
    if (fs.exists(base))
      fs.listStatus(base).foreach { st =>
        if (st.getPath.getName.startsWith(".tmp-")) fs.delete(st.getPath, true)
      }
    val kept = listSegments(fs, base)
    if (fs.exists(base))
      fs.listStatus(base).foreach { st =>
        st.getPath.getName match {
          case SegRe(_, _) if !kept.exists(_._3 == st.getPath) =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    val folded = kept.map(_._2).maxOption.getOrElse(-1L)
    val (doneDirs, liveDirs) = StreamingReport.batchDirs(fs, curvesDir)
      .partition(_._1 <= folded)
    doneDirs.foreach { case (_, p) => fs.delete(p, true) }
    // fold [folded+1 .. max live - keepBatches] into a fresh segment
    val cutoff = liveDirs.map(_._1).maxOption.getOrElse(-1L) - keepBatches
    val fold = liveDirs.filter(_._1 <= cutoff)
    if (fold.nonEmpty) {
      val hi = fold.map(_._1).max
      writeSegment(spark, fs, base,
        fold.flatMap { case (_, p) => dataFiles(fs, p) }, folded + 1, hi)
      fold.foreach { case (_, p) => fs.delete(p, true) }
    }
    // geometric merge: newest segment folds into its neighbour only
    // while at least as wide — each byte rewritten O(log N) times total
    var segs = listSegments(fs, base).sortBy(_._1)
    while (segs.length >= 2 && {
      val a = segs(segs.length - 2); val b = segs.last
      b._2 - b._1 >= a._2 - a._1
    }) {
      val a = segs(segs.length - 2); val b = segs.last
      writeSegment(spark, fs, base,
        Seq(a, b).flatMap(s => dataFiles(fs, s._3)), a._1, b._2)
      fs.delete(a._3, true)
      fs.delete(b._3, true)
      segs = listSegments(fs, base).sortBy(_._1)
    }
  }

  /** The full raw history the recompute fallback reduces: committed
    * segments ∪ batch dirs past the fold frontier ∪ any flat-append
    * files, read by CONCRETE file paths so leftover crash shapes
    * (resurrected folded dirs, contained segments) never double-count.
    * A never-compacted store keeps the plain directory read.
    */
  private[streaming] def readCurves(spark: SparkSession,
                                    stateDir: String): DataFrame = {
    val curvesDir = s"$stateDir/curves"
    val base = new org.apache.hadoop.fs.Path(curvesBaseDir(stateDir))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return spark.read.parquet(curvesDir)
    val segs = listSegments(fs, base)
    val folded = segs.map(_._2).maxOption.getOrElse(-1L)
    val cp = new org.apache.hadoop.fs.Path(curvesDir)
    val live = StreamingReport.batchDirs(fs, cp).filter(_._1 > folded)
    val files = (segs.map(_._3) ++ live.map(_._2))
      .flatMap(d => dataFiles(fs, d)) ++
      dataFiles(fs, cp) // flat-append rows, if a caller ever mixed modes
    spark.read.parquet(files.map(_.getPath.toString): _*)
  }

  /** Process one micro-batch of new curve rows
    * (image_idx, delay, q_bin, i, err); returns the updated full reduction
    * plus the work-size metrics the churn contract is asserted on.
    */
  /** @param emitOutputs when false, the `reduced`/`reduced_median` SINK
    *   writes (and the checkpoint that feeds them) are skipped — state is
    *   still fully committed, and the returned `reduced` frame is the
    *   equivalent LAZY computation over the batch's checkpointed stats
    *   (correct if evaluated, free if not). Callers that drive a known
    *   batch sequence and only read the LAST result (the q63/q200 chunked
    *   fixtures) pass false for the non-final batches: three sink jobs per
    *   batch of pure per-job overhead otherwise (guide §1.2 — don't
    *   compute what is thrown away). The streaming wrapper keeps the
    *   default: its sinks ARE the per-trigger contract.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   atol: Double = 1e-12,
                   withMetrics: Boolean = true,
                   batchKey: Option[Long] = None,
                   tdCompression: Int = 200,
                   emitOutputs: Boolean = true): BatchResult = {
    val curvesDir = s"$stateDir/curves"
    val statePath = s"$stateDir/state.parquet"
    val tailPath = s"$stateDir/tail.parquet"
    // With a batchKey (the streaming wrapper passes foreachBatch's
    // batchId), the history append is IDEMPOTENT under at-least-once
    // replay: a re-delivered batch overwrites its own partition instead of
    // appending twice, and the strict-append validity check below routes
    // the replay through a full recompute of the (correct) history.
    // The incremental-validity scalars (strict append order + stable ref
    // delay) ride the append write as observed metrics — no separate
    // probe job over the batch.
    val obs = new org.apache.spark.sql.Observation()
    val observed = batch.observe(obs,
      min(when(col("delay") =!= TimeFunctions.OffSentinel, col("delay"))).as("mn"),
      min(col("image_idx")).as("minIdx"),
      max(col("image_idx")).as("maxIdx"))
    batchKey match {
      case Some(id) =>
        observed.write.mode("overwrite").parquet(s"$curvesDir/batch=$id")
      case None => observed.write.mode("append").parquet(curvesDir)
    }
    val probe = obs.get

    // State-validity probes go through the Hadoop FileSystem of the
    // state dir's scheme — the whole point of keeping state on shared
    // storage (commit 876599a) is a cluster run, where a java.io.File
    // probe is ALWAYS false and would silently disable the incremental
    // path (full history recompute per trigger, correct but O(history)).
    val manifest = Bundle.readManifest(frontierDir(stateDir))
    val prior = readFrontier(manifest)
    val haveState = Bundle.exists(statePath)
    val batchMinDelay = Option(probe("mn")).map(_.toString.toDouble)
    val batchMinIdx = Option(probe("minIdx")).map(_.toString.toLong)
    // the new global max: NOT just the batch max — after an out-of-order
    // fallback the batch max can be far below the history max, and
    // understating it would let later mid-range batches pass the
    // strict-append check and be silently dropped as "already finalized"
    val batchMaxIdx = (Option(probe("maxIdx")).map(_.toString.toLong) ++
      prior.map(_._2)).reduceOption(_ max _).getOrElse(0L)

    // a batch token unique enough to tell "this intent committed" from
    // "this intent is an orphan of a crashed wave": the caller's batchKey
    // when present (stable across a foreachBatch replay — exactly the
    // identity a replay must be matched on), a nanotime nonce otherwise
    val batchToken = batchKey.map(_.toString)
      .getOrElse(s"a${System.nanoTime()}")
    val committedToken = manifest.flatMap(_.get("lastBatch"))
    val tornCommit = readIntent(stateDir).exists(i =>
      !committedToken.contains(i))

    val haveTail = Bundle.exists(tailPath)
    val incremental = prior.isDefined && haveState && haveTail &&
      !tornCommit &&
      batchMinDelay.forall(_ >= prior.get._1 - atol) &&
      batchMinIdx.forall(_ > prior.get._2)

    val (work, refDelay, fOldTab, statsPrev) =
      if (incremental) {
        val (rd, _) = prior.get
        val tail = spark.read.parquet(tailPath)
          .select("image_idx", "delay", "q_bin", "i", "err")
        val state = spark.read.parquet(statePath)
        // no checkpoints: every consumer of these frames is itself
        // materialized (fronts / bothStats / statsNew) BEFORE the state
        // swap below deletes the file they read
        (tail.union(batch.select("image_idx", "delay", "q_bin", "i", "err")),
          Some(rd),
          Some(state.filter(col("_tbl") === "f")
            .select(col("q_bin"), col("f"), col("p"))),
          Some(state.filter(col("_tbl") === "s").drop("_tbl", "f", "p")))
      } else {
        // fallback / first batch: the whole history is the window
        (readCurves(spark, stateDir)
          .select("image_idx", "delay", "q_bin", "i", "err"),
          None, None, None)
      }

    // Checkpointed: consumed by the frontier chain AND the diff/stats
    // chain — recomputing the tag window per consumer measured SLOWER
    // than the dedicated materialization job (r17 A/B: q200 7.8 → 11 s),
    // so the checkpoint stays even in the metrics-off path.
    val tagged = Reduction.tagReferences(work, refDelay, atol)
      .localCheckpoint(true)
    val refDelayNow = refDelay.getOrElse {
      val r = tagged.filter(col("is_ref")).agg(min(col("delay"))).collect()(0)
      if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
    }
    // PER-BIN frontier: the as-of windows partition by q_bin and not every
    // image carries every bin, so "a later reference exists" must hold in
    // the row's own partition — a global frontier finalizes rows whose
    // in-bin next-reference hasn't arrived (caught by the q63 oracle on
    // the sparse lineitem-derived curves). f = last reference index WITH A
    // ROW in the bin, p = the one before it (the recompute window's
    // prev-anchor).
    // top-2 reference indices per bin; _p_new NULL when a bin has < 2
    // references in the window
    val refRows = tagged.filter(col("is_ref"))
      .select(col("q_bin"), col("image_idx").cast("long").as("_ri"))
    val fpTab =
      if (incremental)
        // ONE aggregation: the in-window reference count is bounded by
        // the frontier construction, so the collect_set is small by
        // contract — contract that does NOT hold on the fallback below
        refRows.groupBy(col("q_bin")).agg(
          max(col("_ri")).as("_f_new"),
          try_element_at(sort_array(collect_set(col("_ri")), asc = false),
            lit(2)).as("_p_new"))
      else {
        // full-recompute window = the ENTIRE history: a per-bin
        // collect_set would gather every reference index ever seen into
        // one in-memory array. Rank the distinct indices with a
        // spill-able sort window instead — same result, streamed.
        val w2 = Window.partitionBy(col("q_bin")).orderBy(col("_ri").desc)
        refRows.distinct()
          .withColumn("_rn", row_number().over(w2))
          .filter(col("_rn") <= 2)
          .groupBy(col("q_bin"))
          .agg(max(when(col("_rn") === 1, col("_ri"))).as("_f_new"),
            max(when(col("_rn") === 2, col("_ri"))).as("_p_new"))
      }
    val fronts = fpTab
      .join(fOldTab.map(_.select(col("q_bin"), col("f").as("_f_old")))
        .getOrElse(fpTab.select(col("q_bin"),
          lit(null).cast("long").as("_f_old")).limit(0)),
        Seq("q_bin"), "left")
      .coalesce(1).localCheckpoint(true)

    // Row-grain diffs are consumed ONCE below (a single fused
    // aggregation), so a checkpoint here would only pay an extra
    // materialization of the widest frame in the batch; metrics mode
    // keeps it because finalized/pending counts re-walk the rows.
    val diffs0 = Reduction.diffSignal(Reduction.interpolateReferences(tagged))
      .withColumn("delay_c", TimeFunctions.canonicalDelay(col("delay")))
    val diffs = if (withMetrics) diffs0.localCheckpoint(true) else diffs0

    // mutable/new rows this batch is responsible for, bin by bin; `_fin`
    // marks rows whose in-bin next reference exists (immutable from now
    // on) vs the pending tail — one column, so finalized and pending
    // sufficient stats come out of ONE aggregation pass instead of two
    val dj = diffs.join(broadcast(fronts), Seq("q_bin"), "left")
    val keepRows = dj.filter(col("_f_old").isNull ||
        col("image_idx") >= col("_f_old"))
      .withColumn("_fin", col("_f_new").isNotNull &&
        col("image_idx") < col("_f_new"))
    val finalizedNew = keepRows.filter(col("_fin"))

    // W2 thinning marks are positional within the (delay, q_bin) group.
    // The stats table only ever aggregates FINALIZED rows, so its n_all IS
    // the finalized prefix length — aliased to n_fin for the join.
    val nFinPrev = statsPrev.map(_.select(col("delay_c"), col("q_bin"),
      col("n_all").as("n_fin"))).getOrElse(
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

    // the t-digest column makes the (non-decomposable) median-mode center
    // incrementally available too: sketches are additive (merge =
    // concatenate + recompress), kept-row values only — the same ensemble
    // `averageScanPoints(useMedian = true)` takes its median over. NULL
    // diffs ride in as NaN (typed aggregator input) and are skipped.
    import graft.functions.TDigestSketch
    def suffStats(df: DataFrame, extraKey: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
      df.groupBy(Seq(col("delay_c"), col("q_bin")) ++ extraKey: _*)
      .agg(
        count(lit(1)).as("n_all"),
        count(col("diff")).as("n_nn"),
        sum(col("diff")).as("sum_d"),
        sum(col("diff") * col("diff")).as("sumsq_d"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        count(when(col("_keep"), col("diff"))).as("n_kept_nn"),
        sum(when(col("_keep"), col("diff"))).as("sum_kept"),
        TDigestSketch.tdigest(
          when(col("_keep"), coalesce(col("diff"), lit(Double.NaN)))
            .otherwise(Double.NaN), tdCompression).as("td"))

    // ONE aggregation pass over the window's rows covers both the
    // finalized and the pending side (split on `_fin` afterwards — the
    // frame is group-grain by then, so the split is free). The `_rep`
    // numbering is continuous across the split because every finalized
    // row precedes every pending row within its (delay_c, q_bin) group
    // (the frontier is an image_idx cut), so the thinning marks are
    // identical to numbering the two sides separately.
    val statsCols = Seq("n_all", "n_nn", "sum_d", "sumsq_d", "n_kept",
      "n_kept_nn", "sum_kept")
    def mergeStatsBy(parts: DataFrame,
                     keys: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val aggs = statsCols.map(c => sum(col(c)).as(c)) :+
        TDigestSketch.tdigestMerge(col("td"), tdCompression).as("td")
      parts.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    }
    def mergeStats(parts: DataFrame): DataFrame =
      mergeStatsBy(parts, Seq(col("delay_c"), col("q_bin")))
    // The PREVIOUS batch's finalized stats fold into the SAME aggregation
    // plan as the window's row stats (they enter as `_fin = true` partial
    // rows), so ONE group-grain checkpoint replaces the former two
    // (bothStats + statsNew) — one materialization job per batch saved,
    // values bit-identical: each merged group sums exactly the same
    // {prev row, finalized partial} pair (2-operand double sums are
    // order-exact; the t-digest merge of the same digest pair is the same
    // sorted centroid multiset in its exact regime).
    // Checkpointed (one tiny 1-partition job): read by the state-store
    // commit AND the output writes below — off memory, so none of them
    // depends on the just-swapped store file and the writes can run as
    // ONE concurrent wave.
    val rowStats = suffStats(withKeep(keepRows, nFinPrev), Seq(col("_fin")))
    val allStats = (statsPrev match {
      case None => rowStats
      case Some(prev) =>
        mergeStatsBy(rowStats.unionByName(
          prev.select((Seq(col("delay_c"), col("q_bin")) ++
            statsCols.map(col) :+ col("td")): _*)
            .withColumn("_fin", lit(true))),
          Seq(col("delay_c"), col("q_bin"), col("_fin")))
    }).coalesce(1).localCheckpoint(true)
    val statsNew = allStats.filter(col("_fin")).drop("_fin")
    // bounded raw tail for the next batch: per bin, from the
    // second-to-last reference on (the prev-anchor the frontier row's
    // recompute needs); bins with <2 refs keep everything
    val tailNew = work.join(broadcast(fronts), Seq("q_bin"), "left")
      .filter((col("_p_new").isNull && col("_f_new").isNull) ||
        col("image_idx") >= coalesce(col("_p_new"), col("_f_new")))
      .select("image_idx", "delay", "q_bin", "i", "err")
      .coalesce(4)
    // ONE state-store commit: stats rows ⊕ frontier rows under a `_tbl`
    // discriminator — both group-grain tiny, and the split layout paid a
    // second swap job per batch for no isolation (r16's three-swap wave
    // was the q63/q200 job-count constant).
    val stateOut = statsNew.withColumn("_tbl", lit("s"))
      .unionByName(fronts.select(col("q_bin"), col("_f_new").as("f"),
        col("_p_new").as("p"), lit("f").as("_tbl")),
        allowMissingColumns = true)

    // reduced output = finalized stats ⊕ pending-tail stats, then the A3
    // formulas recovered from moments (mean mode; noise = population
    // stddev, err = noise/√n_all — reference parity, dataReduction.py:180).
    val pendStats = allStats.filter(!col("_fin")).drop("_fin")
    lazy val combined = mergeStats(statsNew
      .select((Seq(col("delay_c"), col("q_bin")) ++
        statsCols.map(col) :+ col("td")): _*)
      .unionByName(pendStats))
    def outputs(c: DataFrame): (DataFrame, DataFrame) = {
      val mean = col("sum_d") / col("n_nn")
      val noise = sqrt(greatest(col("sumsq_d") / col("n_nn") - mean * mean,
        lit(0.0)))
      val reduced = c.select(
        col("delay_c").as("delay"), col("q_bin"),
        when(col("n_kept_nn") > 0, col("sum_kept") / col("n_kept_nn")).as("diff_av"),
        when(col("n_nn") > 0, noise).as("noise"),
        col("n_kept").as("n_rep"),
        when(col("n_nn") > 0, noise / sqrt(col("n_all"))).as("err"))
      // median-mode twin (exact below 2·tdCompression kept reps per
      // group — see TDigestSketch): separate sink so the exact mean-mode
      // `reduced` schema the q63 oracle pins stays untouched. `exact`
      // surfaces the regime PER GROUP from the digest itself — every
      // centroid still a singleton (size == non-null kept count) means
      // the interpolated quantile IS the sorted-history median; the
      // first compress fold makes the flag flip instead of the
      // precision changing silently mid-run.
      val medianOut = c.select(
        col("delay_c").as("delay"), col("q_bin"),
        when(col("n_kept_nn") > 0,
          TDigestSketch.tdigestQuantile(col("td.means"), col("td.weights"),
            lit(0.5))).as("diff_med"),
        col("n_kept").as("n_rep"),
        (size(col("td.means")).cast("long") === col("n_kept_nn"))
          .as("exact"))
      (reduced, medianOut)
    }

    if (!incremental) {
      // heal a pre-unified-layout state dir: the split stores would
      // linger as orphans next to state.parquet
      Bundle.deleteRecursively(s"$stateDir/stats.parquet")
      Bundle.deleteRecursively(s"$stateDir/frontier.parquet")
    }
    // ONE concurrent write wave — state swap, tail swap, and the output
    // branch (combined materialized ONCE, its t-digest merge is the
    // costly part, then both sinks written concurrently off it): every
    // input is checkpointed (statsNew, fronts, bothStats) or reads only
    // the path its OWN swap replaces (tailNew reads the old tail while
    // writing the tmp side), so no write races another's delete. Each is
    // a tiny job whose cost is per-job overhead, not data; a crash
    // mid-swap leaves that store absent, which the next batch's validity
    // check detects and heals with a full recompute. The manifest is
    // written LAST — it is the commit marker.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    writeIntent(stateDir, batchToken) // intent BEFORE any state mutation
    (Seq(
      Future(writeSwap(stateOut, statePath)),
      Future(writeSwap(tailNew, tailPath))) ++
      (if (!emitOutputs) Nil else Seq(Future {
        val (reduced, medianOut) = outputs(combined.localCheckpoint(true))
        Seq(
          Future(reduced.coalesce(1).write.mode("overwrite")
            .parquet(s"$stateDir/reduced")),
          Future(medianOut.coalesce(1).write.mode("overwrite")
            .parquet(s"$stateDir/reduced_median")))
          .foreach(Await.result(_, Duration.Inf))
      })))
      .foreach(Await.result(_, Duration.Inf))
    Bundle.writeManifest(frontierDir(stateDir), Map(
      "refDelay" -> (if (refDelayNow.isNaN) prior.map(_._1.toString).getOrElse("NaN")
        else refDelayNow.toString),
      "maxIdx" -> batchMaxIdx.toString,
      "lastBatch" -> batchToken))

    // metrics from the CHECKPOINTED frames — `work` itself would lazily
    // re-read the tail store we just overwrote. They cost three extra jobs
    // per batch, so callers that only need the reduction skip them.
    BatchResult(
      if (emitOutputs) spark.read.parquet(s"$stateDir/reduced")
      // sink skipped: the SAME reduction, lazily, off the checkpointed
      // stats (evaluating it later is safe — no dependency on the
      // swapped store files)
      else outputs(combined)._1,
      windowRows = if (withMetrics) tagged.count() else -1L,
      finalizedRows = if (withMetrics) finalizedNew.count() else -1L,
      pendingRows = if (withMetrics) spark.read.parquet(tailPath).count()
        else -1L,
      fullRecompute = !incremental)
  }

  /** Streaming wrapper: `Online.curveFolderReduction` with the bounded
    * per-trigger work — same sink layout (`stateDir/reduced`).
    */
  def incrementalCurveFolderReduction(spark: SparkSession, inputDir: String,
                                      checkpointDir: String, stateDir: String,
                                      pollSeconds: Int = 30,
                                      schemaSource: DataFrame,
                                      autoCompactEvery: Int = 64,
                                      keepBatches: Int = 2): StreamingQuery = {
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .option("maxFilesPerTrigger", 64)
      .parquet(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // metrics are spec hooks — not worth three extra jobs per trigger;
        // batchKey makes the history append replay-idempotent
        processBatch(batch.sparkSession, batch, stateDir,
          withMetrics = false, batchKey = Some(batchId))
        // fold old raw-history partitions in-line (foreachBatch runs
        // between triggers, so the fold never races its own writer) —
        // a month-long run stays at O(log) segment dirs + ≤
        // autoCompactEvery + keepBatches live dirs instead of one
        // directory per trigger. 0 disables.
        if (autoCompactEvery > 0 && batchId > 0 &&
            batchId % autoCompactEvery == 0)
          compact(batch.sparkSession, stateDir, keepBatches)
        ()
      }
      .start()
  }
}
