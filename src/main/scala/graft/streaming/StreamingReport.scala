package graft.streaming

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
  * write of shared state, nothing to compact for correctness. [[report]]
  * merges all partials — DECIMAL sums are associative, so the streamed
  * report is EXACTLY the batch report over the union (spec-pinned, not
  * approximately).
  *
  * Per-batch cost: one aggregation of the batch to source×lang grain and
  * a tiny write. Report cost grows with the partial count (one tiny file
  * set per batch) — re-partial any archive range offline if a year of
  * batches ever matters.
  */
object StreamingReport {

  /** Write one micro-batch's partial profile (idempotent per batchId). */
  def processBatch(batch: DataFrame, stateDir: String, batchId: Long,
                   sourceCol: String = "source", langCol: String = "lang",
                   textCol: String = "text"): Unit =
    Quality.profilePartials(batch, sourceCol, langCol, textCol)
      .write.mode("overwrite")
      .parquet(s"$stateDir/partials/batch=$batchId")

  /** The merged per-source report over everything streamed so far. A
    * dashboard may poll before the first micro-batch has landed — no
    * partials directory yet means an EMPTY report, not a read failure
    * (existence via the Hadoop FileSystem for the path's scheme, the
    * OnlineNearDup readOrEmpty discipline).
    */
  def report(spark: SparkSession, stateDir: String): DataFrame = {
    val path = s"$stateDir/partials"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partials =
      if (fs.exists(hPath))
        spark.read.parquet(path)
          .drop("batch") // partition-discovery column, not part of the grain
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "source STRING, lang STRING, n_docs BIGINT, n_tokens BIGINT, " +
              "sum_q DECIMAL(28,6)"))
    Quality.reportFromPartials(partials)
  }

  /** Per-batch HLL register partials for per-source distinct-token
    * cardinality — the sketch companion to the profile partials, same
    * batch-keyed partition-overwrite discipline. Register merge is MAX
    * (idempotent as well as associative), so a replay rewriting its own
    * partition is doubly safe: even if two deliveries of one batch landed
    * under different ids, the merged registers would not move.
    */
  def processBatchDistinct(batch: DataFrame, stateDir: String, batchId: Long,
                           sourceCol: String = "source",
                           textCol: String = "text", b: Int = 9): Unit =
    Sketches.hllRegisters(
        batch.select(col(sourceCol).as("source"),
          explode(TextFunctions.tokens(col(textCol))).as("tok")),
        "tok", b, groupCols = Seq("source"))
      .write.mode("overwrite")
      .parquet(s"$stateDir/hll/batch=$batchId")

  /** Per-source distinct-token estimates over everything streamed so far.
    * Registers merge exactly (integer max), so the streamed estimate is
    * bit-identical to the batch estimate over the union — not just close.
    */
  def distinctReport(spark: SparkSession, stateDir: String,
                     b: Int = 9): DataFrame = {
    val path = s"$stateDir/hll"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partials =
      if (fs.exists(hPath)) spark.read.parquet(path).drop("batch")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "source STRING, bucket INT, max_rho INT"))
    Sketches.hllEstimateByGroup(
      Sketches.hllMerge(partials, Seq("source")), b, Seq("source"))
  }

  /** Attach the profiling sink to a streaming document DataFrame; with
    * `trackDistinct` the HLL partials land in the same foreachBatch.
    */
  def sink(docs: DataFrame, stateDir: String, checkpointDir: String,
           pollSeconds: Int = 30,
           trackDistinct: Boolean = false): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // two actions read the batch → pin one snapshot for both
        val pinned = if (trackDistinct) batch.localCheckpoint(true) else batch
        processBatch(pinned, stateDir, batchId)
        if (trackDistinct) processBatchDistinct(pinned, stateDir, batchId)
        ()
      }
      .start()
}
