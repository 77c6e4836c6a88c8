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
  * that equality. The hot-anchor cap applies per delivery; a gram hot
  * only across batches keeps its pairs (conservative: contamination is
  * never lost to the cap earlier than the batch pass would lose it).
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

  /** Scan one micro-batch of train documents; appends maximal pair
    * matches (tid, eid, st, en — eval coordinates) under a batch-keyed
    * partition (replay overwrites itself: exactly-once hits under
    * foreachBatch's at-least-once contract) and returns them.
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
    val hits = Dedup.contaminationPairSpans(spT, spE, p.minLen, p.maxOcc)
      .localCheckpoint(true)
    batchKey match {
      case Some(id) => hits.write.mode("overwrite")
        .parquet(s"${hitsDir(stateDir)}/batch=$id")
      case None => hits.write.mode("append").parquet(hitsDir(stateDir))
    }
    hits
  }

  /** The cumulative report: maximal contaminated regions per eval doc
    * over EVERY delivery so far — identical to the batch
    * `contaminationSpans` over the union of delivered train docs.
    * Output: (idCol, span_start, span_end, span_len, n_partners).
    */
  def report(spark: SparkSession, stateDir: String,
             p: Params = Params()): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(hitsDir(stateDir))
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hits =
      if (fs.exists(hp)) spark.read.parquet(hitsDir(stateDir))
        .select(col("tid"), col("eid"), col("st"), col("en"))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "tid LONG, eid LONG, st INT, en INT"))
    Dedup.mergeDocSpans(hits.select(col("eid").as("id"), col("st"),
      col("en"), col("tid").as("partner")), p.idCol)
  }

  /** The registered live loop: watch `inputDir` for train-doc parquet
    * drops, scan each batch against the prepared eval anchors.
    */
  def sink(spark: SparkSession, inputDir: String, checkpointDir: String,
           stateDir: String, p: Params = Params(),
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
        processBatch(batch.sparkSession,
          org.apache.spark.sql.graft.PlanExec.freshBatchDF(batch),
          stateDir, p, batchKey = Some(batchId))
        ()
      }
      .start()
  }
}
