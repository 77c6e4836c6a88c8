package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** STREAMING eval-decontamination monitor — the live twin of
  * [[graft.operators.Dedup.contaminationSpans]]: a crawler's train-doc
  * drop folder is watched and every arriving document is scanned for
  * exact ≥ minLen-token matches against a FIXED eval corpus, so
  * benchmark contamination is caught at ingest time instead of in a
  * post-hoc sweep.
  *
  * The eval side is static for a training run, so its anchor rows are
  * prepared ONCE ([[prepareEval]]) and persisted with a parameter
  * manifest; every micro-batch then pays only: anchor rows over the NEW
  * docs, the semi-join against the saved eval anchors (train-train
  * duplicate mass never enters any join), the per-(pair, offset) island
  * extension, and one idempotent batch-keyed hit append — all
  * O(batch + matches), independent of history. Per-train-doc spans are
  * complete within the batch that delivered the doc (documents arrive
  * whole), so the merged report over all hits equals the BATCH
  * contaminationSpans over the union of deliveries — StreamingSpec pins
  * that equality UNCONDITIONALLY, hot-anchor cap included: each batch
  * persists its matched anchor PAIRS (pre-island, still keyed by the
  * anchor value) plus its per-anchor train occurrence counts (bounded
  * by the eval anchor set), and [[report]] re-applies `maxOcc` over the
  * CUMULATIVE counts before building islands — so an anchor under the
  * cap in every delivery but over it in aggregate is dropped exactly as
  * the batch scan drops it. The per-delivery cap still bounds each
  * batch's pair volume; anything it drops is over the global cap a
  * fortiori, so the two caps compose without divergence.
  */
object StreamingContamination {

  final case class Params(minLen: Int = 20, maxOcc: Int = 4096,
                          verifiable: Boolean = false,
                          textCol: String = "text",
                          idCol: String = "doc_id") {
    private[graft] def manifest: Map[String, String] = Map(
      "kind" -> "contamination", "minLen" -> minLen.toString,
      "maxOcc" -> maxOcc.toString, "verifiable" -> verifiable.toString,
      "textCol" -> textCol, "idCol" -> idCol)
  }

  private def anchorsPath(stateDir: String) = s"$stateDir/eval_anchors.parquet"
  private def hitsDir(stateDir: String) = s"$stateDir/hits"
  private def countsDir(stateDir: String) = s"$stateDir/counts"

  /** Fold every batch partition except the most recent `keepBatches`
    * into base directories — a monitor at a 30 s cadence would otherwise
    * accumulate ~86k hit/count directories a month (the listing wall).
    * Hit PAIRS concatenate verbatim (batches are disjoint row sets);
    * counts merge by per-anchor SUM (associative) — so the report,
    * including its report-time global cap, is byte-identical before and
    * after. Shares [[StreamingReport]]'s crash-safe swap protocol:
    * `_folded_up_to` marker, finish-only heal, readers filter live
    * batches past the fold cutoff so a resurrected folded directory
    * never double-counts. Batch-keyed state only (the `batchKey = None`
    * append mode has no fold grain and is left as written).
    */
  def compact(spark: SparkSession, stateDir: String,
              keepBatches: Int = 2): Unit = {
    require(keepBatches >= 1, "must keep at least one recent batch")
    StreamingReport.compactFamily(spark, hitsDir(stateDir),
      s"$stateDir/hits_base", keepBatches, identity)
    StreamingReport.compactFamily(spark, countsDir(stateDir),
      s"$stateDir/counts_base", keepBatches,
      merged => merged.groupBy(col("s")).agg(sum(col("cnt")).as("cnt")))
  }

  /** Persist the eval corpus's anchor rows + the run's parameter
    * manifest. Must run before the sink starts; re-running replaces the
    * anchors (a changed eval set or parameter invalidates old hits —
    * callers should clear `stateDir` in that case, and the manifest
    * check below fails loudly if they do not).
    */
  def prepareEval(spark: SparkSession, eval: DataFrame, stateDir: String,
                  p: Params = Params()): Unit = {
    graft.sources.Bundle.readManifest(stateDir).foreach { m =>
      require(m == p.manifest,
        s"contamination state at $stateDir was prepared with $m — " +
          s"clear the directory to change parameters (now: ${p.manifest})")
    }
    Dedup.contaminationAnchorRows(eval, p.textCol, p.idCol, p.minLen,
        p.verifiable)
      .select(col("s"), col("id").as("eid"), col("p").as("pe"))
      .write.mode("overwrite").parquet(anchorsPath(stateDir))
    graft.sources.Bundle.writeManifest(stateDir, p.manifest)
  }

  /** Scan one micro-batch of train documents. Persists, under
    * batch-keyed partitions (replay overwrites itself: exactly-once
    * under foreachBatch's at-least-once contract):
    *   - `hits/` — the delivery's matched anchor pairs
    *     (s, tid, eid, pe, d), per-delivery `maxOcc` applied (the
    *     batch-work bound — anything it drops is over the global cap
    *     a fortiori);
    *   - `counts/` — the delivery's per-anchor train occurrence counts
    *     (s, cnt) over anchors shared with eval (≤ |eval anchors| rows),
    *     the input to [[report]]'s cumulative cap.
    * Returns THIS delivery's maximal pair matches (tid, eid, st, en —
    * eval coordinates) for live visibility.
    */
  def processBatch(spark: SparkSession, newDocs: DataFrame,
                   stateDir: String, p: Params = Params(),
                   batchKey: Option[Long] = None): DataFrame = {
    val m = graft.sources.Bundle.readManifest(stateDir).getOrElse(
      throw new IllegalStateException(
        s"no contamination state at $stateDir — run prepareEval first"))
    require(m == p.manifest,
      s"contamination params drifted: state has $m, caller passed ${p.manifest}")
    val spE = spark.read.parquet(anchorsPath(stateDir))
    val spT = Dedup.contaminationAnchorRows(
        newDocs.dropDuplicates(p.idCol), p.textCol, p.idCol, p.minLen,
        p.verifiable)
      .select(col("s"), col("id").as("tid"), col("p").as("pt"))
    val tShared = Dedup.contaminationSharedTrain(spT, spE)
      .localCheckpoint(true)
    val counts = tShared.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
    val pairs = Dedup.contaminationMatchedAnchors(tShared, spE, p.maxOcc)
      .localCheckpoint(true)
    // the pairs schema carries the caller's TRAIN id type (tid), which
    // the eval anchors cannot predict — stamp it once so report()'s
    // empty/unified reads never guess a type the state contradicts
    val ddlPath = s"$stateDir/_pairs_ddl"
    if (!graft.sources.Bundle.exists(ddlPath)) {
      val (dfs, dp) = graft.sources.Bundle.fsPath(stateDir)
      graft.sources.Bundle.writeStringCommitted(dfs, dp, "_pairs_ddl",
        pairs.schema.toDDL)
    }
    batchKey match {
      case Some(id) =>
        pairs.write.mode("overwrite")
          .parquet(s"${hitsDir(stateDir)}/batch=$id")
        counts.write.mode("overwrite")
          .parquet(s"${countsDir(stateDir)}/batch=$id")
      case None =>
        // two non-idempotent appends cannot be made crash-atomic; write
        // counts FIRST so a crash between them leaves a count-only
        // orphan — the global cap then over-counts the anchor's
        // occurrences and can only OVER-cap (drop pairs it would have
        // kept), never report a span the one-shot scan would drop.
        // Batch-keyed mode (above) is the crash-safe path.
        counts.write.mode("append").parquet(countsDir(stateDir))
        pairs.write.mode("append").parquet(hitsDir(stateDir))
    }
    Dedup.contaminationIslands(pairs.drop("s"), p.minLen)
  }

  /** The cumulative report: maximal contaminated regions per eval doc
    * over EVERY delivery so far — identical to the batch
    * `contaminationSpans` over the union of delivered train docs,
    * INCLUDING the hot-anchor cap: `maxOcc` is re-applied here over
    * each anchor's cumulative train occurrence count, so an anchor hot
    * only in aggregate is dropped exactly as the one-shot scan drops
    * it. Cost is O(stored matches), never O(train corpus). Output:
    * (idCol, span_start, span_end, span_len, n_partners).
    */
  /** Cumulative matched anchor pairs (tid, eid, pe, d) over every
    * delivery, with the GLOBAL hot-anchor cap applied: `maxOcc`
    * re-checked against each anchor's cumulative train occurrence
    * count, so an anchor hot only in aggregate is dropped exactly as
    * the one-shot scan drops it. The shared core of [[report]] and
    * [[scrub]].
    */
  private def cappedPairs(spark: SparkSession, stateDir: String,
                          p: Params): DataFrame = {
    // empty-state schemas derive from the persisted eval anchors (id
    // type flows from the caller's corpus — hardcoding LONG would make
    // the never-delivered edge case diverge from every other read)
    val anchors = {
      if (!graft.sources.Bundle.exists(anchorsPath(stateDir)))
        throw new IllegalStateException(
          s"no contamination state at $stateDir — run prepareEval first")
      spark.read.parquet(anchorsPath(stateDir))
    }
    // base ∪ not-yet-folded live batches, torn compactions healed — the
    // consistent-snapshot reader shared with the report family. The
    // pairs schema comes from the _pairs_ddl stamp (the train id type is
    // the caller's, not derivable from the eval anchors); before any
    // delivery the anchors-derived placeholder serves the empty report.
    val pairsEmpty = {
      val (dfs, dp) = graft.sources.Bundle.fsPath(s"$stateDir/_pairs_ddl")
      graft.sources.Bundle.readStringIfExists(dfs, dp)
        .map(ddl => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl)))
        .getOrElse(anchors.select(col("s"), col("eid").as("tid"),
          col("eid"), col("pe"), col("pe").as("d")).limit(0))
    }
    val pairs = StreamingReport.readState(spark, hitsDir(stateDir),
        s"$stateDir/hits_base", pairsEmpty)
      .select(col("s"), col("tid"), col("eid"), col("pe"), col("d"))
    val counts = StreamingReport.readState(spark, countsDir(stateDir),
        s"$stateDir/counts_base",
        anchors.select(col("s"), lit(0L).as("cnt")).limit(0))
      .select(col("s"), col("cnt"))
    val hot = counts.groupBy(col("s")).agg(sum(col("cnt")).as("_tot"))
      .filter(col("_tot") > p.maxOcc).select(col("s"))
    pairs.join(hot, Seq("s"), "left_anti").drop("s")
  }

  def report(spark: SparkSession, stateDir: String,
             p: Params = Params()): DataFrame =
    Dedup.mergeDocSpans(Dedup.contaminationIslands(
        cappedPairs(spark, stateDir, p), p.minLen)
      .select(col("eid").as("id"), col("st"), col("en"),
        col("tid").as("partner")), p.idCol)

  /** Train-side SCRUB over the cumulative capped match set — the
    * streaming twin of [[graft.operators.Dedup.removeContaminated]]:
    * rebuild clean text for `trainDocs` (any subset of the delivered
    * corpus, re-presented by the caller — typically the docs about to
    * ship to training) against EVERY stored delivery's matches, with
    * [[report]]'s global-cap semantics. Because each train doc's
    * matches are complete within the batch that delivered it (docs
    * arrive whole, eval is static) and the per-delivery cap only drops
    * anchors the cumulative cap drops a fortiori, scrubbing after N
    * deliveries equals the one-shot batch transform over their union —
    * q206 oracles that equality, a cap-straddling spec pins the hot-
    * anchor edge. Cost: O(stored matches + trainDocs tokens), never
    * O(history × corpus). Output: (idCol, n_tok, clean_text, n_removed).
    */
  def scrub(spark: SparkSession, trainDocs: DataFrame, stateDir: String,
            p: Params = Params()): DataFrame = {
    val m = graft.sources.Bundle.readManifest(stateDir).getOrElse(
      throw new IllegalStateException(
        s"no contamination state at $stateDir — run prepareEval first"))
    require(m == p.manifest,
      s"contamination params drifted: state has $m, caller passed ${p.manifest}")
    val mine = cappedPairs(spark, stateDir, p)
      .join(trainDocs.select(col(p.idCol).as("tid")).distinct(),
        Seq("tid"), "left_semi")
    Dedup.rebuildWithout(trainDocs, p.textCol, p.idCol,
      Dedup.trainCoveredPositions(mine, p.minLen))
  }

  /** The registered live loop: watch `inputDir` for train-doc parquet
    * drops, scan each batch against the prepared eval anchors. Every
    * `autoCompactEvery` batches the sink folds old hit/count partitions
    * into the bases IN-LINE (foreachBatch runs between triggers, so the
    * fold never races its own writer) — a month-long monitor stays at
    * ≤ base + autoCompactEvery + keepBatches directories per family
    * instead of one per trigger. 0 disables.
    */
  def sink(spark: SparkSession, inputDir: String, checkpointDir: String,
           stateDir: String, p: Params = Params(),
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
        processBatch(batch.sparkSession,
          org.apache.spark.sql.graft.PlanExec.freshBatchDF(batch),
          stateDir, p, batchKey = Some(batchId))
        if (autoCompactEvery > 0 && batchId > 0 &&
            batchId % autoCompactEvery == 0)
          compact(batch.sparkSession, stateDir, keepBatches)
        ()
      }
      .start()
  }
}
