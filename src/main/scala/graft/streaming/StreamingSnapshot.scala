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
  * [[history]] = base (already-patched rows) ∪ live opened rows, with
  * live closure patches applied on (key, valid_from). A row is closed at
  * most once (a closed row is no longer live, so no later batch can
  * close it again), so the patch join is 1:≤1 by construction.
  *
  * Replay safety: batch N's delta is computed against the history
  * RECONSTRUCTED FROM BATCHES < N ONLY — never against state N itself
  * wrote — and lands with partition overwrite. An at-least-once replay
  * therefore recomputes byte-identical delta files into its own
  * partitions: idempotent without any read-modify-write of shared state.
  *
  * Small-files lifecycle: [[compact]] folds all but the most recent
  * `keepBatches` delta pairs into a single pre-patched `base` directory
  * using the [[StreamingReport]] rename protocol verbatim (temp write +
  * `_folded_up_to` marker, delete, rename, delete folded dirs;
  * finish-only heal on read; marker re-check for consistent snapshots).
  * Folding is history-safe because patching is associative: applying the
  * folded closures to the folded opened rows first, then the live
  * closures later, yields the same rows as applying everything at once.
  * The recent `keepBatches` deltas stay unfolded so a foreachBatch replay
  * (which only re-delivers recent ids) can still reconstruct its
  * pre-batch state; reconstructing strictly before the fold cutoff is
  * refused (the per-batch inputs no longer exist separately).
  */
object StreamingSnapshot {

  /** Apply one micro-batch as a partial upsert at version `batchId + 1`
    * (idempotent per batchId).
    *
    * A micro-batch is an ARRIVAL SLICE, not a snapshot: nothing stops a
    * source from delivering two updates to the same key in one trigger,
    * and two same-key rows would both pass the hash filter and open two
    * rows with the same (key, valid_from) — breaking the one-live-row
    * invariant, the 1:≤1 closure-patch join, and `snapshotAt`. The batch
    * is therefore reduced to ONE row per key first: byte-identical
    * duplicates always collapse; beyond that, `orderCol` names the
    * caller's arrival-order column (sequence number, source timestamp)
    * and the row with the greatest value wins (ties broken by the full
    * row's json hash, so a replayed batch re-picks the SAME winner).
    * Without `orderCol` there is no defensible winner, so a genuine
    * same-key conflict FAILS FAST instead of silently corrupting
    * history.
    */
  /** Guard against splicing incompatible [[Snapshot.rowHash]] recipes
    * into one history (the batch store carries the same key in its T2
    * manifest): the state dir records the encoding version that built
    * it; a mismatch — or pre-versioning state with no marker — fails
    * fast instead of emitting a spurious "changed" revision for every
    * NULL-bearing row on the first post-upgrade batch.
    */
  private def checkHashEncoding(fs: FileSystem, stateDir: String): Unit = {
    val marker = new Path(s"$stateDir/_hash_encoding")
    val want = Snapshot.HashEncodingVersion
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val got = try scala.io.Source.fromInputStream(in).mkString.trim
                finally in.close()
      if (got != want) throw new IllegalStateException(
        s"snapshot state at $stateDir was built with row-hash encoding " +
          s"$got, this build uses $want; rebuild the state dir")
    } else if (fs.exists(new Path(s"$stateDir/opened")) ||
               fs.exists(new Path(s"$stateDir/base"))) {
      throw new IllegalStateException(
        s"snapshot state at $stateDir predates row-hash encoding " +
          s"versioning; rebuild the state dir")
    } else {
      val out = fs.create(marker, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
  }

  def processBatch(batch: DataFrame, stateDir: String, batchId: Long,
                   keyCol: String, hashCols: Seq[String],
                   orderCol: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    checkHashEncoding(
      new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration),
      stateDir)
    val version = batchId + 1
    val hashed = batch
      .withColumn("row_hash", Snapshot.rowHash(hashCols))
      .dropDuplicates()
    val inc = orderCol match {
      case Some(oc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(col(oc).desc,
            md5(to_json(struct(hashed.columns.map(col): _*))))
        hashed.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
      case None =>
        // bounded driver read: at most one offending key row
        val dup = hashed.groupBy(col(keyCol))
          .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
          .limit(1).collect()
        if (dup.nonEmpty) throw new IllegalArgumentException(
          s"micro-batch $batchId carries conflicting rows for " +
            s"$keyCol=${dup(0).get(0)}; pass orderCol to pick a winner " +
            "or de-duplicate upstream")
        hashed
    }
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

  /** Fold all delta pairs except the most recent `keepBatches` into the
    * pre-patched base. Safe to call from the sink's foreachBatch (runs
    * between triggers, so it never races its own writer) or any
    * operator cadence.
    */
  def compact(spark: SparkSession, stateDir: String, keyCol: String,
              keepBatches: Int = 2): Unit = {
    val basePath = new Path(s"$stateDir/base")
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StreamingReport.heal(fs, basePath)
    val already = StreamingReport.foldedUpTo(fs, basePath)
    val all = StreamingReport.batchDirs(fs, new Path(s"$stateDir/opened"))
    if (all.isEmpty) return
    val cutoff = all.map(_._1).max - keepBatches
    val fold = all.filter { case (id, _) => id > already && id <= cutoff }
    if (fold.isEmpty) return
    val foldOpened = spark.read.parquet(fold.map(_._2.toString): _*)
    val schema = foldOpened.schema
      .add("valid_to", org.apache.spark.sql.types.LongType)
    val oldBase = baseFrame(spark, fs, basePath, schema)
    val foldClosureDirs = StreamingReport
      .batchDirs(fs, new Path(s"$stateDir/closures"))
      .filter { case (id, _) => id > already && id <= cutoff }
    val merged = patch(
      oldBase.unionByName(
        foldOpened.withColumn("valid_to", lit(null).cast("bigint"))),
      readClosures(spark, foldClosureDirs, oldBase, keyCol), keyCol)
    val tmp = new Path(basePath.getParent, basePath.getName + "_compact")
    fs.delete(tmp, true)
    // the base is the HISTORY — unbounded, unlike the sketch-grain bases
    // StreamingReport folds to one file — so it is written key-partitioned
    // (pruned rewrites, parallel reads), never coalesce(1)'d through one
    // task
    merged.repartition(col(keyCol)).write.parquet(tmp.toString)
    StreamingReport.writeMarker(fs,
      new Path(tmp, StreamingReport.FoldMarker), cutoff)
    fs.delete(basePath, true)
    if (!fs.rename(tmp, basePath) &&
        StreamingReport.foldedUpTo(fs, basePath) != cutoff)
      throw new IllegalStateException(s"compaction rename failed: $basePath")
    fold.foreach { case (_, p) => fs.delete(p, true) }
    foldClosureDirs.foreach { case (_, p) => fs.delete(p, true) }
  }

  /** History reconstructed from batches strictly below `ltBatch` — the
    * read [[processBatch]] uses so a replayed batch never sees its own
    * prior delivery. Returns None before any state exists; throws when
    * `ltBatch` falls at or below the fold cutoff (those per-batch inputs
    * were folded away — keep `keepBatches` at or above the redelivery
    * horizon).
    */
  private def historyBefore(spark: SparkSession, stateDir: String,
                            ltBatch: Long,
                            keyCol: String): Option[DataFrame] = {
    val basePath = new Path(s"$stateDir/base")
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (attempt <= 16) {
      StreamingReport.heal(fs, basePath)
      val cutoff = StreamingReport.foldedUpTo(fs, basePath)
      if (ltBatch <= cutoff)
        throw new IllegalStateException(
          s"state before batch $ltBatch was folded (cutoff $cutoff); " +
            "raise keepBatches above the redelivery horizon")
      val opened = StreamingReport
        .batchDirs(fs, new Path(s"$stateDir/opened"))
        .filter { case (id, _) => id > cutoff && id < ltBatch }
      val closures = StreamingReport
        .batchDirs(fs, new Path(s"$stateDir/closures"))
        .filter { case (id, _) => id > cutoff && id < ltBatch }
      val baseFiles =
        if (fs.exists(basePath))
          fs.listStatus(basePath).toSeq
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
        else Nil
      // consistent snapshot iff the cutoff didn't move under the listing
      if (StreamingReport.foldedUpTo(fs, basePath) == cutoff) {
        if (opened.isEmpty && baseFiles.isEmpty) return None
        val liveOpened =
          if (opened.isEmpty) None
          else Some(spark.read.parquet(opened.map(_._2.toString): _*)
            .withColumn("valid_to", lit(null).cast("bigint")))
        val schema = liveOpened.map(_.schema).getOrElse(
          spark.read.parquet(baseFiles: _*).schema)
        val base =
          if (baseFiles.nonEmpty)
            spark.read.schema(schema).parquet(baseFiles: _*)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        val rows = liveOpened.map(base.unionByName(_)).getOrElse(base)
        return Some(patch(rows,
          readClosures(spark, closures, rows, keyCol), keyCol))
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot state at $stateDir kept moving during read")
  }

  /** Apply closure patches on (key, valid_from): a row keeps an existing
    * valid_to (it was patched when folded) or takes the live patch.
    */
  private def patch(rows: DataFrame, closures: DataFrame,
                    keyCol: String): DataFrame =
    rows.join(closures.withColumnRenamed("valid_to", "_vt"),
        Seq(keyCol, "valid_from"), "left")
      .withColumn("valid_to", coalesce(col("valid_to"), col("_vt")))
      .drop("_vt")

  private def readClosures(spark: SparkSession, dirs: Seq[(Long, Path)],
                           shapeFrom: DataFrame,
                           keyCol: String): DataFrame =
    if (dirs.nonEmpty) spark.read.parquet(dirs.map(_._2.toString): _*)
    else shapeFrom.select(col(keyCol), col("valid_from"),
      lit(null).cast("bigint").as("valid_to")).limit(0)

  private def baseFrame(spark: SparkSession, fs: FileSystem, basePath: Path,
                        schema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    if (fs.exists(basePath)) {
      val files = fs.listStatus(basePath).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
      if (files.nonEmpty) spark.read.schema(schema).parquet(files: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** foreachBatch wiring: maintain the history live at `pollSeconds`
    * cadence, folding old deltas every `autoCompactEvery` batches.
    */
  def sink(docs: DataFrame, stateDir: String, checkpointDir: String,
           keyCol: String, hashCols: Seq[String], pollSeconds: Int = 30,
           autoCompactEvery: Int = 64, keepBatches: Int = 2,
           orderCol: Option[String] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, stateDir, batchId, keyCol, hashCols, orderCol)
        if (autoCompactEvery > 0 && batchId > 0 &&
            batchId % autoCompactEvery == 0)
          compact(batch.sparkSession, stateDir, keyCol, keepBatches)
      }
      .start()
}
