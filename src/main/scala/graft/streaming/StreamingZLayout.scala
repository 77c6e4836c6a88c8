package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Layout

/** Streaming maintenance of a written Z-order layout ([[Layout]]): a row
  * stream (fresh crawl shards, event deltas) keeps a clustered, skipping-
  * indexed table current — the streaming twin of the `graft-zorder`
  * build/append/compact loop, mirroring [[StreamingAnnIndex]]'s shape.
  *
  * Semantics per micro-batch:
  *   - No layout at `dir` yet → BOOTSTRAP: [[Layout.buildLayout]] from
  *     this first non-empty batch (bounds derived from it; later drift
  *     is healed by compaction's bounds re-derivation).
  *   - Layout present → [[Layout.appendDelta]]: the batch is Z-sorted
  *     under the saved bounds and committed in one index-epoch move.
  *   - File count drifted past `compactFactor` × the build's `nFiles` →
  *     [[Layout.compact]] right after the append (OPTIMIZE + VACUUM),
  *     bounding read amplification no matter how long the stream runs.
  *
  * EXACTLY-ONCE without an id column: the applied micro-batch id rides
  * the SAME atomic epoch commit as the data ([[Layout.epochTags]]) —
  * foreachBatch replays a batch whose write committed but whose offset
  * checkpoint didn't, and this sink recognizes it (`streamBatchId` tag ≥
  * replayed id) and skips, so rows are never doubled. [[Layout.compact]]
  * carries tags forward, so a compaction between append and replay
  * cannot lose the watermark. Batch ids must be monotone (Spark's
  * contract for one checkpoint; a NEW checkpoint against an existing
  * layout restarts ids at 0 — pass `resetProgress = true` exactly then,
  * or bootstrap fresh).
  *
  * State lives in the layout itself; the only streaming state is the
  * source offset checkpoint.
  */
object StreamingZLayout {

  final case class Params(zcols: Seq[String], bits: Int = 8,
                          nFiles: Int = 16, tieCol: Option[String] = None,
                          compactFactor: Int = 4, curve: String = "morton",
                          bloomCols: Seq[String] = Nil)

  final case class BatchResult(applied: Boolean, bootstrapped: Boolean,
                               compacted: Boolean, nFiles: Int)

  private val BatchTag = "streamBatchId"

  /** Apply one micro-batch to the layout at `dir`. Replay-idempotent via
    * the committed `streamBatchId` tag; an EMPTY batch neither builds
    * nor advances the watermark (replaying an empty append is a no-op
    * anyway, and bounds must not derive from zero rows).
    */
  def processBatch(batch: DataFrame, batchId: Long, dir: String,
                   p: Params, resetProgress: Boolean = false): BatchResult = {
    val spark = batch.sparkSession
    require(p.compactFactor >= 2, "compactFactor must be >= 2")
    Layout.readLayoutManifest(spark, dir) match {
      case None =>
        // bootstrap (or retry after a crashed build: buildLayout's
        // overwrite wipes any torn remains, and the manifest — written
        // last — is the point after which the layout "exists")
        val pinned = batch.localCheckpoint(true)
        try {
          if (pinned.isEmpty) BatchResult(applied = false,
            bootstrapped = false, compacted = false, nFiles = 0)
          else {
            Layout.buildLayout(pinned, p.zcols, p.bits, p.nFiles, p.tieCol,
              dir, tags = Map(BatchTag -> batchId.toString),
              curve = p.curve)
            // point-lookup sidecars from day one; appends leave their new
            // files uncovered (conservatively kept — a probe can never
            // lose rows) and every COMPACTION refreshes full coverage
            // (Layout.compact rebuilds committed sidecars itself)
            p.bloomCols.foreach(c => Layout.saveBloom(spark, dir, c))
            BatchResult(applied = true, bootstrapped = true,
              compacted = false, nFiles = p.nFiles)
          }
        } finally graft.operators.Checkpoints.release(pinned)
      case Some(mf) =>
        // params drift fails fast (the StreamingAnnIndex convention):
        // the history is Z-sorted under the manifest's columns — a sink
        // configured differently must not silently keep appending
        require(mf.zcols == p.zcols,
          s"layout at $dir clusters on ${mf.zcols.mkString(",")} but " +
            s"the sink was configured with ${p.zcols.mkString(",")} — " +
            "rebuild offline to change clustering columns")
        require(mf.curve == p.curve,
          s"layout at $dir is laid out on the ${mf.curve} curve but the " +
            s"sink was configured with ${p.curve} — rebuild offline to " +
            "change the curve")
        val lastApplied = Layout.epochTags(spark, dir).get(BatchTag)
          .map(_.toLong)
        if (!resetProgress && lastApplied.exists(_ >= batchId)) {
          // replayed batch: its append already committed, only the
          // offset checkpoint was lost — applying again would double rows
          BatchResult(applied = false, bootstrapped = false,
            compacted = false,
            nFiles = Layout.listDataFiles(spark, dir).size)
        } else {
          // applied reports the COMMIT, not the call: an empty batch
          // commits nothing and advances no watermark
          val applied = Layout.appendDelta(batch, dir,
            tags = Map(BatchTag -> batchId.toString))
          val n = Layout.listDataFiles(spark, dir).size
          if (applied && n > p.compactFactor * mf.nFiles) {
            Layout.compact(spark, dir)
            BatchResult(applied = true, bootstrapped = false,
              compacted = true,
              nFiles = Layout.listDataFiles(spark, dir).size)
          } else BatchResult(applied = applied, bootstrapped = false,
            compacted = false, nFiles = n)
        }
    }
  }

  /** Attach the maintenance sink to a streaming DataFrame. */
  def sink(rows: DataFrame, dir: String, checkpointDir: String, p: Params,
           pollSeconds: Int = 30): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, dir, p)
        ()
      }
      .start()
}
