package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Expectations
import StreamingReport.{batchDirs, compactFamily, emptyFrame, readState}

/** The [[graft.operators.Expectations]] suite kept live over an ingest
  * stream — every micro-batch is gated (clean rows one way, violating rows
  * to quarantine with their violated-rule names) and the per-rule violation
  * counters accumulate into a dashboard report, all without ever rescanning
  * what already landed.
  *
  * State shape follows the [[StreamingReport]] family discipline exactly:
  *  - `metrics/batch=<id>` — the batch's per-rule `(rule, violations,
  *    total)` partial (rules × 1 rows). Counters are plain longs, so the
  *    merge is an associative SUM and the streamed report is EXACTLY the
  *    batch [[Expectations.metrics]] over the union — spec-pinned, not
  *    approximately. Partition overwrite keyed by batchId makes an
  *    at-least-once replay rewrite its own partition, never double-count.
  *  - `clean/batch=<id>` and `quarantine/batch=<id>` — the routed DATA.
  *    These are sinks, not sketch state: they are never folded (compacting
  *    them would rewrite corpus-sized output), and a replayed batch
  *    overwrites its own partition so the union of partitions is the
  *    exactly-once gated stream.
  *  - only the tiny metrics family compacts ([[compact]] /
  *    `autoCompactEvery`), riding the shared crash-safe rename protocol.
  *
  * Rule drift: rules are code (named `Column` predicates), so they cannot
  * be reloaded from disk — the caller re-supplies them on restart, and the
  * state guards against silent drift with a fingerprint marker (`_rules`:
  * rule names + each check expression's canonical SQL). A restart with a
  * renamed rule, a reordered suite, or an edited predicate FAILS FAST
  * instead of splicing incompatible counter streams; recompose a new state
  * dir (or backfill) to change the suite. Routed-data readers pin the
  * FIRST batch partition's schema across the whole read — the gate's
  * input schema is expected to stay fixed for a state dir's lifetime
  * (schema changes are a new gate, like rule changes).
  */
object StreamingQualityGate {

  /** Gate one micro-batch (idempotent per batchId): write the metrics
    * partial and route rows. The batch is pinned once (localCheckpoint)
    * because three actions consume it.
    */
  def processBatch(batch: DataFrame, stateDir: String, batchId: Long,
                   rules: Seq[Expectations.Rule]): Unit = {
    require(rules.nonEmpty, "empty expectation suite")
    checkOrStampRules(batch.sparkSession, stateDir, rules)
    val pinned = batch.localCheckpoint(true)
    try {
      Expectations.metrics(pinned, rules)
        .select(col("rule"), col("violations"), col("total"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$stateDir/metrics/batch=$batchId")
      val (clean, quarantine) = Expectations.split(pinned, rules)
      clean.write.mode("overwrite").parquet(s"$stateDir/clean/batch=$batchId")
      // arrays survive parquet; keep the violated-rule names with the row
      quarantine.write.mode("overwrite")
        .parquet(s"$stateDir/quarantine/batch=$batchId")
    } finally {
      // the pin exists only for this trigger's three actions
      graft.operators.Checkpoints.release(pinned)
    }
  }

  /** The accumulated per-rule report over everything gated so far — the
    * same `(rule, violations, total, violation_frac, pass)` surface as the
    * batch [[Expectations.metrics]]. Merging is one SUM over the tiny
    * partials (base + recent batches after compaction); polling before the
    * first batch lands yields an empty report, not a read failure.
    */
  def metricsReport(spark: SparkSession, stateDir: String): DataFrame = {
    val partials = readState(spark, s"$stateDir/metrics",
      s"$stateDir/metrics_base",
      emptyFrame(spark, "rule STRING, violations BIGINT, total BIGINT"))
    partials.groupBy(col("rule"))
      .agg(sum(col("violations")).as("violations"),
        sum(col("total")).as("total"))
      .select(col("rule"), col("violations"), col("total"),
        round(col("violations").cast("double") / col("total"), 6)
          .as("violation_frac"),
        (col("violations") === 0).as("pass"))
      .orderBy("rule")
  }

  /** All rows routed clean so far (the union of the batch partitions —
    * exactly-once under replay by partition overwrite).
    */
  def clean(spark: SparkSession, stateDir: String): DataFrame =
    readData(spark, s"$stateDir/clean")

  /** All quarantined rows so far, each carrying its `violated` rule-name
    * array in declaration order.
    */
  def quarantine(spark: SparkSession, stateDir: String): DataFrame =
    readData(spark, s"$stateDir/quarantine")

  /** Fold old metrics partials into the base (counters merge by SUM). The
    * routed data partitions are sinks and are intentionally NOT folded.
    */
  def compact(spark: SparkSession, stateDir: String,
              keepBatches: Int = 2): Unit =
    compactFamily(spark, s"$stateDir/metrics", s"$stateDir/metrics_base",
      keepBatches,
      merged => merged.groupBy(col("rule"))
        .agg(sum(col("violations")).as("violations"),
          sum(col("total")).as("total")))

  /** Attach the gate to a streaming DataFrame. Lifecycle is self-contained:
    * every `autoCompactEvery` batches the metrics family folds in-line
    * (foreachBatch runs between triggers, so the fold never races its own
    * writer); 0 disables.
    */
  def sink(rows: DataFrame, stateDir: String, checkpointDir: String,
           rules: Seq[Expectations.Rule], pollSeconds: Int = 30,
           autoCompactEvery: Int = 64, keepBatches: Int = 2): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId, rules)
        if (autoCompactEvery > 0 && batchId > 0 &&
            batchId % autoCompactEvery == 0)
          compact(batch.sparkSession, stateDir, keepBatches)
      }
      .start()

  // ------------------------------------------------------------ internals

  /** Rule fingerprint: names AND each predicate's canonical string form, newline-joined —
    * a renamed, reordered, or re-predicated suite changes it.
    */
  private[streaming] def fingerprint(rules: Seq[Expectations.Rule]): String =
    rules.map(r => s"${r.name}${r.check.toString}").mkString("\n")

  private def checkOrStampRules(spark: SparkSession, stateDir: String,
                                rules: Seq[Expectations.Rule]): Unit = {
    val fp = fingerprint(rules)
    val marker = new Path(s"$stateDir/_rules")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readText(fs, marker) match {
      case Some(persisted) =>
        require(persisted == fp,
          s"expectation state at $stateDir was written with a different " +
            "rule suite; refusing to splice incompatible counters")
      case None =>
        if (batchDirs(fs, new Path(s"$stateDir/metrics")).nonEmpty ||
            fs.exists(new Path(s"$stateDir/metrics_base")))
          throw new IllegalStateException(
            s"gate state at $stateDir exists without a rule fingerprint; " +
              "refusing to guess its suite")
        fs.mkdirs(new Path(stateDir))
        val out = fs.create(marker, true)
        try out.write(fp.getBytes("UTF-8")) finally out.close()
    }
  }

  private def readText(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  /** Union of `batch=*` partitions; empty input → empty frame with the
    * first-seen schema (or a truly empty no-column frame pre-stream).
    * Partitions are written by the same suite against the same stream, so
    * the first partition's schema binds the read.
    */
  private def readData(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = batchDirs(fs, p).sortBy(_._1)
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType())
    else {
      val schema = spark.read.parquet(parts.head._2.toString).schema
      spark.read.schema(schema).parquet(parts.map(_._2.toString): _*)
    }
  }
}
