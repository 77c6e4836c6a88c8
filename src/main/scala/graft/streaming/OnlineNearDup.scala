package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Greedy online near-duplicate ADMISSION — the missing half of the
  * streaming dedup story: [[StreamingDedup.minhashPairsStream]] FLAGS
  * near-dup pairs; a crawler ingest wants the q59-style dedup DECISION
  * online ("drop this document, an earlier kept one is near-identical").
  *
  * Admission policy is first-seen-wins GREEDY: a document is dropped iff
  * its estimated Jaccard against some ALREADY-KEPT document reaches the
  * threshold (kept = admitted in an earlier batch, or an earlier id kept
  * within this batch). Greedy is the standard online policy; it differs
  * from the batch recipe's transitive CC keep-list by design — a document
  * whose only match was itself dropped stays admitted. StreamingSpec pins
  * the exact semantics against a driver-computed greedy reference over the
  * batch blocker's pair relation.
  *
  * Shape: the `IncrementalReduction` pattern (foreachBatch-driven with
  * parquet state), not `flatMapGroupsWithState` — admission needs
  * consensus ACROSS a document's bands (drop if ANY band matches), which
  * per-band keyed state cannot decide locally and a second stateful
  * aggregation cannot express in append mode.
  *
  * State under `stateDir` (admitted documents only):
  *   - `sigs.parquet`  — (id, sig): one nHashes-long signature per kept doc;
  *   - `bands.parquet` — (band, id): the LSH blocking index, nBands rows
  *     per kept doc.
  *
  * Per batch, distributed work is: one signature projection over the NEW
  * docs, one band equi-join against the state index (only matching
  * buckets shuffle), one signature verification join per candidate, and
  * one state append — all O(batch + collisions), independent of history
  * size. The only driver materialization is the batch's INTERNAL
  * candidate pair list (new×new near-matches), resolved greedily in id
  * order — bounded by the batch's own near-dup density, never by state.
  * Re-delivered ids (already in state) are skipped, so replaying a batch
  * is a no-op.
  */
object OnlineNearDup {

  final case class BatchResult(admitted: DataFrame, nAdmitted: Long,
                               nDropped: Long, nReplayed: Long)

  // existence through the Hadoop FileSystem for the path's scheme — a
  // java.nio check is always false on HDFS/S3, which would silently reset
  // state to empty every batch (admission degrades to in-batch-only dedup
  // while writes keep succeeding)
  private def readOrEmpty(spark: SparkSession, path: String,
                          ddl: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) spark.read.schema(ddl).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
  }

  /** Process one micro-batch of documents (idCol, textCol); returns the
    * admitted rows (all input columns) plus admission counts. Documents
    * shorter than the shingle size carry no signature and are admitted
    * unconditionally (they cannot be near-duplicates, matching the batch
    * blocker which never pairs them).
    */
  def processBatch(spark: SparkSession, newDocs: DataFrame, stateDir: String,
                   textCol: String = "text", idCol: String = "doc_id",
                   shingleSize: Int = 3, nHashes: Int = 32, nBands: Int = 8,
                   threshold: Double = 0.6): BatchResult = {
    val rowsPerBand = nHashes / nBands
    val sigsPath = s"$stateDir/sigs.parquet"
    val bandsPath = s"$stateDir/bands.parquet"
    val stateSigs = readOrEmpty(spark, sigsPath, "id LONG, sig ARRAY<BIGINT>")
    val stateBands = readOrEmpty(spark, bandsPath, "band STRING, id LONG")

    // signatures for the batch: reduced shingle hashes materialized in
    // their own projection (the nHashes folds each read the array).
    // In-batch id duplicates are dropped up front — without this, both
    // rows would survive the state anti-join, double the signature/band
    // state rows, and inflate nAdmitted (the replay contract only covers
    // cross-batch redelivery).
    val docIds = newDocs.select(col(idCol).cast("long").as("id"), col("*"))
      .dropDuplicates("id")
    val fresh = docIds
      .join(stateSigs.select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint(true)
    val nReplayed = docIds.count() - fresh.count()
    val sigsB = fresh
      .select(col("id"),
        transform(TextFunctions.shingleHashes(col(textCol), shingleSize),
          s => pmod(xxhash64(s), lit(VectorFunctions.MinhashPrime))).as("_mh"))
      .filter(size(col("_mh")) > 0)
      .select(col("id"),
        VectorFunctions.minhashSignatureFromReduced(col("_mh"), nHashes).as("sig"))
      .localCheckpoint(true)
    val bandsB = sigsB.select(col("id"),
      explode(VectorFunctions.minhashBands(col("sig"), nBands, rowsPerBand))
        .as("band"))

    def estJaccard(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column) =
      VectorFunctions.minhashJaccard(a, b)

    // cross-state drops: any band collision with a KEPT doc, verified
    val crossDropped = bandsB
      .join(stateBands.withColumnRenamed("id", "kept_id"), Seq("band"))
      .select(col("id"), col("kept_id")).distinct()
      .join(sigsB, Seq("id"))
      .join(stateSigs.select(col("id").as("kept_id"), col("sig").as("ksig")),
        Seq("kept_id"))
      .filter(estJaccard(col("sig"), col("ksig")) >= threshold)
      .select(col("id")).distinct()

    // in-batch candidates among cross-survivors: the (small) new×new pair
    // list comes to the driver for the greedy id-order resolution
    val survivorsB = sigsB.join(crossDropped, Seq("id"), "left_anti")
    val bandsS = survivorsB.select(col("id"),
      explode(VectorFunctions.minhashBands(col("sig"), nBands, rowsPerBand))
        .as("band"))
    val pairRows = bandsS
      .join(bandsS.select(col("band"), col("id").as("id_b")), Seq("band"))
      .filter(col("id") < col("id_b"))
      .select(col("id"), col("id_b")).distinct()
      .join(survivorsB.select(col("id"), col("sig").as("sig_a")), Seq("id"))
      .join(survivorsB.select(col("id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .filter(estJaccard(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("id"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val matchedBy = pairRows.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).toSet }
    val batchIds = survivorsB.select(col("id")).collect()
      .map(_.getLong(0)).sorted
    val keptB = scala.collection.mutable.Set[Long]()
    batchIds.foreach { id =>
      if (!matchedBy.getOrElse(id, Set.empty).exists(keptB)) keptB += id
    }

    val spark2 = spark; import spark2.implicits._
    val keptIdsDf = keptB.toSeq.toDF("id")
    // short docs (no signature) are admitted unconditionally
    val noSig = fresh.select(col("id"))
      .join(sigsB.select(col("id")), Seq("id"), "left_anti")
    val admittedIds = keptIdsDf.union(noSig).localCheckpoint(true)

    // persist the new keepers' band index, THEN their signatures;
    // signature-less (short) docs get an empty-sig row so a replayed batch
    // skips them too. Write order is the crash-safety contract: membership
    // in sigs.parquet is what marks a doc "kept" (the replay anti-join and
    // the drop decision both key on it), so bands must land first — a
    // crash between the two writes then leaves orphan band rows whose ids
    // are NOT in sigs, the doc is reprocessed on replay (the cross-state
    // join drops band hits whose kept_id has no signature row), and the
    // duplicate band rows a successful replay appends are absorbed by the
    // .distinct() after the band join. The reverse order would leave kept
    // docs invisible to the blocking index forever.
    bandsB.join(keptIdsDf, Seq("id"), "left_semi")
      .select(col("band"), col("id"))
      .write.mode("append").parquet(bandsPath)
    sigsB.join(keptIdsDf, Seq("id"), "left_semi")
      .union(noSig.select(col("id"),
        array().cast("array<bigint>").as("sig")))
      .write.mode("append").parquet(sigsPath)

    val admitted = fresh.join(admittedIds, Seq("id"), "left_semi")
      .drop("id")
    val nAdm = admittedIds.count()
    BatchResult(admitted, nAdm, fresh.count() - nAdm, nReplayed)
  }
}
