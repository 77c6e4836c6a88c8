package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Reduction

/** "Online" incremental reprocessing — the reference's monitor loop
  * (trx/id9.py:305-335: poll folder every 30 s, reduce new images, update
  * plots) re-expressed as Structured Streaming.
  *
  * Reference batch-incremental path (trx/azav.py:300-302,361-362: reopen
  * storage, anti-join already-processed files) becomes the file source's
  * checkpointed offset tracking; the 30 s poll is a ProcessingTime trigger;
  * the delay-grouped running aggregate is a stateful streaming agg in
  * update/complete mode (delays are a small closed set, so state stays
  * tiny). No watermark: the reference has no event-time lateness concept —
  * late files are just new files (SURVEY §2.10 T3).
  */
object Online {

  /** T1 — streaming E1: watch a folder of EDF frames, integrate each new
    * file, append curves under `storageDir` (layout mirrors the batch
    * `Pipeline.doFolderAzav`: curves.parquet + manifest.json, plus the
    * stream checkpoint). File-source checkpointing replaces the
    * reference's re-list + anti-join loop (trx/azav.py:300-362); a frame
    * never splits across batches, so the per-(image, q_bin) aggregation
    * inside foreachBatch is complete per image without streaming state.
    *
    * T2 coupling: a config change between runs invalidates BOTH the
    * checkpoint and the curve store before (re)starting — without this, a
    * geometry/grid change would silently keep integrating new frames on
    * the old checkpoint while historical curves stay on the old geometry
    * (the batch path has the same guard at Pipeline.doFolderAzav).
    *
    * Store layout: batch-keyed partition directories (`batch=N`,
    * replay-idempotent overwrites), NOT the batch pipeline's flat
    * append — give each mode its own `storageDir`; pointing both at one
    * store would mix the layouts and fail loudly at read.
    */
  def streamingAzav(spark: SparkSession, folder: String, storageDir: String,
                    config: graft.pipeline.Pipeline.AzavConfig,
                    pollSeconds: Int = 30,
                    maxFilesPerTrigger: Int = 64): StreamingQuery = {
    val checkpointDir = s"$storageDir/checkpoint"
    val curveDir = s"$storageDir/curves.parquet"
    if (!graft.sources.Bundle.isValid(storageDir, config.manifest)) {
      graft.sources.Bundle.deleteRecursively(checkpointDir)
      graft.sources.Bundle.deleteRecursively(curveDir)
    }
    graft.sources.Bundle.writeManifest(storageDir, config.manifest)
    val frames = spark.readStream.format("binaryFile")
      // streaming sources require an explicit schema; this is binaryFile's
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .option("pathGlobFilter", "*.edf*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(folder)
      .select(col("path"), col("content"))

    frames.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-keyed partition OVERWRITE, not a blind append: foreachBatch
        // is at-least-once, and a crash between an append and the
        // checkpoint commit would re-deliver the batch and double-count
        // its frames in every downstream average — a replay overwrites
        // its own batch=N directory instead (the engine's standard
        // exactly-once move; readers see the extra `batch` partition
        // column)
        graft.operators.Azav.integrateBinary(batch, config.geometry,
          config.grid, config.dark, config.maskFn)
          .write.mode("overwrite").parquet(s"$curveDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** T1 for ALREADY-REDUCED archives — the streaming twin of
    * [[graft.sources.Bundle.azavFromHdf5Dir]]: watch a folder the
    * beamline drops trx DataStorage bundles into (one .h5/.npz per run,
    * the reference's own persistence grain: trx/azav.py:457,
    * id9.py:221,301), decode each NEW bundle file-per-task inside the
    * micro-batch, and append its curve table
    * `(file, image_idx, delay, q_bin, i, err)` under `storageDir` —
    * downstream reductions then stream from `curves.parquet` exactly as
    * they do for the EDF path. File-source checkpointing replaces the
    * reference's re-list + anti-join loop; a bundle never splits across
    * batches, so each append is complete per run with no streaming
    * state.
    */
  def streamingBundleIngest(spark: SparkSession, folder: String,
                            storageDir: String, pattern: String = "*.h5",
                            npz: Boolean = false,
                            dataKey: String = "data",
                            errKey: String = "err",
                            delaysKey: String = "delays",
                            pollSeconds: Int = 30,
                            maxFilesPerTrigger: Int = 32): StreamingQuery = {
    val checkpointDir = s"$storageDir/checkpoint"
    val curveDir = s"$storageDir/curves.parquet"
    val bundles = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .option("pathGlobFilter", pattern)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(folder)
      .select(col("path"), col("content"))
    bundles.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batch-keyed partition overwrite (see streamingAzav): an
        // at-least-once re-delivery rewrites its own batch=N directory
        // byte-identically instead of appending the runs a second time
        graft.sources.Bundle.azavCurvesFromBinary(
            batch, dataKey, errKey, delaysKey, isNpz = npz)
          .write.mode("overwrite").parquet(s"$curveDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** Stream a folder of curve parquet files (schema: image_idx, delay,
    * q_bin, i, err) into a continuously-updated per-(delay, q_bin) average.
    * foreachBatch re-runs the full reduction on the union of state — exact
    * parity with the batch semantics including the as-of reference join
    * and the MEDIAN center, which are not incrementally decomposable in
    * general. Per-trigger work grows O(history): for long-running mean-mode
    * reductions use [[IncrementalReduction.incrementalCurveFolderReduction]],
    * which bounds each trigger to the mutable tail (oracle-gated by q63).
    */
  def curveFolderReduction(spark: SparkSession, inputDir: String,
                           checkpointDir: String, outputDir: String,
                           pollSeconds: Int = 30,
                           schemaSource: DataFrame): StreamingQuery = {
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .option("maxFilesPerTrigger", 64)
      .parquet(inputDir)

    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // accumulate raw curves, then re-reduce the whole history —
        // correct for the non-incremental as-of join; the history table is
        // curve-grain (n_images × nQ), far smaller than pixel data.
        batch.write.mode("append").parquet(s"$outputDir/curves")
        val all = batch.sparkSession.read.parquet(s"$outputDir/curves")
        Reduction.timeResolvedSignal(all)
          .write.mode("overwrite").parquet(s"$outputDir/reduced")
        ()
      }
      .start()
  }

  /** Purely-incremental variant for the operators that ARE incrementally
    * decomposable (running per-delay mean over pre-diffed curves): a
    * stateful streaming aggregation in update mode writing to the in-memory
    * sink `tableName`. Demonstrates watermark-free stateful aggs (T3).
    */
  def incrementalDelayAverage(spark: SparkSession, inputDir: String,
                              schemaSource: DataFrame,
                              tableName: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(schemaSource.schema)
      .parquet(inputDir)
    stream
      .groupBy(col("delay"), col("q_bin"))
      .agg(avg(col("i")).as("i_av"), count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(tableName)
      .start()
  }
}
