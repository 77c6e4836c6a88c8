package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Snapshot

/** Streaming SCD2 maintenance — [[Snapshot]]'s history kept live over a
  * document stream: each micro-batch is applied as a partial upsert
  * (streams carry no "absent key means deleted" signal), and any
  * historical version remains reconstructable while the ingest runs.
  *
  * State layout (the [[StreamingReport]] delta discipline, applied to
  * history): batch N writes ONLY its delta, under its own partitions —
  *   - `opened/batch=N`: full rows opened at version N+1 (new keys, or
  *     keys whose tracked hash changed);
  *   - `closures/batch=N`: (key, valid_from, valid_to) patch records for
  *     the rows version N+1 closed.
  * [[history]] = all opened rows left-joined with the closure patches on
  * (key, valid_from). A row is closed at most once (a closed row is no
  * longer live, so no later batch can close it again), so the patch join
  * is 1:≤1 by construction.
  *
  * Replay safety: batch N's delta is computed against the history
  * RECONSTRUCTED FROM BATCHES < N ONLY — never against state N itself
  * wrote — and lands with partition overwrite. An at-least-once replay
  * therefore recomputes byte-identical delta files into its own
  * partitions: idempotent without any read-modify-write of shared state.
  *
  * Scale shape: the per-batch WRITE is delta-sized; the per-batch READ
  * folds prior deltas (partition-pruned to `batch < N`), which grows with
  * batch count — the same lifecycle as report partials, with the same
  * answer: fold old deltas into a base on a cadence (the
  * `StreamingReport.compact` rename protocol applies unchanged; a base
  * is just a pre-joined opened/closures pair). Kept out of scope here —
  * the maintenance logic, not the folding, is what this file adds.
  */
object StreamingSnapshot {

  /** Apply one micro-batch as a partial upsert at version `batchId + 1`
    * (idempotent per batchId).
    */
  def processBatch(batch: DataFrame, stateDir: String, batchId: Long,
                   keyCol: String, hashCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val version = batchId + 1
    val inc = batch
      .withColumn("row_hash", Snapshot.rowHash(hashCols))
    val live = historyBefore(spark, stateDir, batchId, keyCol) match {
      case Some(h) => h.filter(col("valid_to").isNull)
        .select(col(keyCol), col("row_hash").as("_o_hash"),
          col("valid_from").as("_o_from"))
      case None => inc.select(col(keyCol), col("row_hash").as("_o_hash"),
        lit(0L).as("_o_from")).limit(0)
    }
    // one join drives both delta files → pin one snapshot
    val j = inc.join(live, Seq(keyCol), "left").localCheckpoint(true)
    try {
      j.filter(col("_o_hash").isNull || col("_o_hash") =!= col("row_hash"))
        .drop("_o_hash", "_o_from")
        .withColumn("valid_from", lit(version))
        .write.mode("overwrite")
        .parquet(s"$stateDir/opened/batch=$batchId")
      j.filter(col("_o_hash").isNotNull &&
          col("_o_hash") =!= col("row_hash"))
        .select(col(keyCol), col("_o_from").as("valid_from"),
          lit(version).as("valid_to"))
        .write.mode("overwrite")
        .parquet(s"$stateDir/closures/batch=$batchId")
    } finally j.unpersist()
  }

  /** The full SCD2 history streamed so far (open rows have NULL
    * `valid_to`); `Snapshot.snapshotAt`/`Snapshot.diff` work on it
    * unchanged. Throws until the first batch has landed — before any
    * delta exists there is no schema to answer with.
    */
  def history(spark: SparkSession, stateDir: String,
              keyCol: String): DataFrame =
    historyBefore(spark, stateDir, Long.MaxValue, keyCol).getOrElse(
      throw new IllegalStateException(
        s"no snapshot state under $stateDir yet"))

  /** History reconstructed from batches strictly below `ltBatch` — the
    * read [[processBatch]] uses so a replayed batch never sees its own
    * prior delivery.
    */
  private def historyBefore(spark: SparkSession, stateDir: String,
                            ltBatch: Long,
                            keyCol: String): Option[DataFrame] = {
    val openedDir = new Path(s"$stateDir/opened")
    val fs = FileSystem.get(openedDir.toUri, spark.sessionState.newHadoopConf())
    if (!fs.exists(openedDir)) return None
    val opened = spark.read.parquet(openedDir.toString)
      .filter(col("batch") < ltBatch).drop("batch")
    if (opened.isEmpty) return None
    // a crash between the two delta writes can leave opened/ without its
    // closures/ sibling for one batch; the checkpoint replays that batch,
    // but a reader in the window must not fail on the missing directory
    val closures =
      (if (fs.exists(new Path(s"$stateDir/closures")))
        spark.read.parquet(s"$stateDir/closures")
          .filter(col("batch") < ltBatch).drop("batch")
      else opened.select(col(keyCol), col("valid_from"),
        lit(null).cast("bigint").as("valid_to")).limit(0))
        .withColumnRenamed("valid_to", "_vt")
    Some(opened
      .join(closures, Seq(keyCol, "valid_from"), "left")
      .withColumn("valid_to", col("_vt")).drop("_vt"))
  }

  /** foreachBatch wiring: maintain the history live at `pollSeconds`
    * cadence.
    */
  def sink(docs: DataFrame, stateDir: String, checkpointDir: String,
           keyCol: String, hashCols: Seq[String],
           pollSeconds: Int = 30): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId, keyCol, hashCols)
      }
      .start()
}
