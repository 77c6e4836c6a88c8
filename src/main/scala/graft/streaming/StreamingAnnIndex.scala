package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.AnnIndex
import graft.sources.Bundle

/** Streaming maintenance of a persisted ANN index ([[AnnIndex]]): a vector
  * stream (crawler embeddings, fresh shard encodes) keeps the serving index
  * current without ever retraining or re-encoding the history.
  *
  * Semantics per micro-batch:
  *   - No index at `dir` yet → BOOTSTRAP: train quantizers on this first
  *     batch and build the index from it (the FAISS shape — quantizers come
  *     from a bounded training sample, everything later is add-only).
  *   - Valid index with matching params → [[AnnIndex.append]]: encode the
  *     batch with the SAVED quantizers, skip ids already present.
  *   - Index present but params drifted → fail fast. Appended history
  *     exists only as codes under the OLD quantizers; silently rebuilding
  *     from one micro-batch (the batch T2 drop-and-recompute) would shrink
  *     the index to that batch. Parameter changes need an offline
  *     [[AnnIndex.build]] from the full base table.
  *
  * Crash safety: append's id anti-join makes every batch replay-idempotent,
  * and a crash mid-bootstrap leaves no manifest (Bundle writes it last) so
  * the replay rebuilds cleanly. State lives in the index Bundle itself —
  * the only streaming state is the source offset checkpoint.
  */
object StreamingAnnIndex {

  /** Apply one micro-batch to the index at `dir` (bootstrap or append). */
  def processBatch(spark: SparkSession, batch: DataFrame, dir: String,
                   p: AnnIndex.Params, idCol: String = "vec_id",
                   vecCol: String = "embedding"): AnnIndex.AppendResult =
    if (Bundle.isValid(dir, p.asMap)) {
      AnnIndex.append(spark, dir, batch, idCol, vecCol)
    } else if (Bundle.readManifest(dir).isDefined) {
      throw new IllegalStateException(
        s"ANN index at $dir was built with different parameters; a " +
          "streaming batch cannot re-encode the history — rebuild offline " +
          "with AnnIndex.build on the full corpus, then restart the stream")
    } else {
      // bootstrap (or retry after a manifest-less crashed build)
      Bundle.deleteRecursively(dir)
      // the batch feeds quantizer training (sampled), encoding, and the
      // append-result count — pin it so the three passes see one snapshot;
      // in-batch id duplicates collapse here for the same reason as in
      // AnnIndex.append (both copies would otherwise be encoded)
      val pinned = batch.dropDuplicates(idCol).localCheckpoint(true)
      val n = pinned.count()
      if (n == 0) {
        // an empty first micro-batch must not train quantizers (sampledKMeans
        // requires a non-empty corpus, and the exception would kill the
        // stream) — defer bootstrap to the first batch that carries data
        AnnIndex.AppendResult(nAppended = 0L, nSkipped = 0L)
      } else {
        AnnIndex.build(pinned, dir, p, idCol, vecCol)
        AnnIndex.AppendResult(nAppended = n, nSkipped = 0L)
      }
    }

  /** Attach the maintenance sink to a streaming vector DataFrame. */
  def sink(vectors: DataFrame, dir: String, checkpointDir: String,
           p: AnnIndex.Params, idCol: String = "vec_id",
           vecCol: String = "embedding",
           pollSeconds: Int = 30): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(s"$pollSeconds seconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, dir, p, idCol, vecCol)
        ()
      }
      .start()
}
