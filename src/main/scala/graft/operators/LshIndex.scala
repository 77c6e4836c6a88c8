package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Bundle

/** A PERSISTED MinHash-LSH near-duplicate index — the text twin of
  * [[AnnIndex]]: [[Dedup.minhashLshPairs]] recomputes every signature
  * inside each call, the right shape for a one-shot corpus sweep but not
  * for the recurring question a crawl pipeline actually asks — "which of
  * these INCOMING documents near-duplicate something we already hold?".
  * Here signatures and band buckets are computed ONCE over the canonical
  * corpus ([[build]]) and land as a [[Bundle]]; [[serveNearDups]] hashes
  * only the incoming batch with the SAME (manifest-pinned) parameters and
  * joins its band keys against the saved buckets.
  *
  * Layout under `dir`:
  *   - `sigs.parquet`  — (id, sig array<long>): one row per indexed doc.
  *   - `bands.parquet` — (band, id): the JOINABLE bucket members, with
  *     the hot-bucket star cap applied AT BUILD TIME — a bucket over
  *     `maxBucketSize` keeps only its min-id representative (the
  *     [[Dedup.minhashLshPairs]] cap moved to storage: a boilerplate
  *     page duplicated 10⁷ times contributes ONE joinable row, so no
  *     serve-time lookup can explode on it; the min member is
  *     near-identical to the rest, so a query matching the bucket still
  *     surfaces the duplicate class through it).
  *   - `manifest.json` — shingle/hash/band/cap parameters; [[ensure]]
  *     reuses a saved index iff the manifest matches (T2 invalidation,
  *     Bundle.isValid), and [[serveNearDups]] reads its hashing
  *     parameters from the manifest rather than trusting the caller.
  *
  * Serve cost: hash the batch (linear), one band-key equi-join against
  * the capped bucket table, signature verification on the bounded
  * candidate set. The corpus is never rescanned — PlanSpec pins it.
  */
object LshIndex {

  /** Index parameters; the manifest is their string form, so any change
    * invalidates a saved index.
    */
  final case class Params(shingleSize: Int = 3, nHashes: Int = 32,
                          nBands: Int = 8, verifiable: Boolean = false,
                          maxBucketSize: Int = 4096) {
    require(nHashes % nBands == 0, s"nBands=$nBands must divide nHashes=$nHashes")
    def asMap: Map[String, String] = Map(
      "kind" -> "lsh-neardup", "shingleSize" -> shingleSize.toString,
      "nHashes" -> nHashes.toString, "nBands" -> nBands.toString,
      "verifiable" -> verifiable.toString,
      "maxBucketSize" -> maxBucketSize.toString)
  }

  /** Signature + capped band tables for `docs`, persisted at `dir`. */
  def build(docs: DataFrame, dir: String, p: Params,
            textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val sigs = Dedup.minhashSignatures(docs, textCol, idCol, p.shingleSize,
      p.nHashes, p.verifiable)
    val banded = sigs.withColumn("band",
        explode(Dedup.bandKeyExpr(p.nBands, p.nHashes / p.nBands,
          p.verifiable)))
      .select(col("band"), col("id"))
    // the star cap, applied at build: over-cap buckets store min-id only
    val joinable =
      if (p.maxBucketSize <= 0) banded
      else {
        val stats = banded.groupBy(col("band"))
          .agg(count(lit(1)).as("_bsz"), min(col("id")).as("_bmin"))
        banded.join(stats, Seq("band"))
          .filter(col("_bsz") <= p.maxBucketSize ||
            col("id") === col("_bmin"))
          .select(col("band"), col("id"))
      }
    Bundle.save(dir, Map("sigs" -> sigs, "bands" -> joinable), p.asMap)
  }

  /** Reuse the index at `dir` when its manifest matches `p` exactly;
    * otherwise drop and rebuild (T2). Returns true when a rebuild
    * happened. `docs` is by-name: a warm reuse never evaluates it.
    */
  def ensure(docs: => DataFrame, dir: String, p: Params,
             textCol: String = "text", idCol: String = "doc_id"): Boolean =
    if (Bundle.isValid(dir, p.asMap)) false
    else {
      Bundle.deleteRecursively(dir)
      build(docs, dir, p, textCol, idCol)
      true
    }

  /** Near-duplicate matches for an incoming batch against the saved
    * index: batch signatures with the manifest's parameters, band-key
    * equi-join against the capped bucket table, distinct (query, id)
    * candidates, estimated-Jaccard verification at `threshold`.
    * Output: (query_id, id, est_jaccard) — `id` is the indexed document
    * matched. A query document can match many indexed ones (that is the
    * point: route the whole duplicate class for review).
    */
  def serveNearDups(spark: SparkSession, dir: String, queries: DataFrame,
                    threshold: Double, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val m = Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no LSH index manifest at $dir"))
    require(m.get("kind").contains("lsh-neardup"),
      s"not an LSH near-dup index: $dir")
    val p = Params(m("shingleSize").toInt, m("nHashes").toInt,
      m("nBands").toInt, m("verifiable").toBoolean, m("maxBucketSize").toInt)
    val t = Bundle.load(spark, dir)
    val qsigs = Dedup.minhashSignatures(queries, textCol, idCol,
        p.shingleSize, p.nHashes, p.verifiable)
      .select(col("id").as("query_id"), col("sig").as("_qsig"))
    val qbands = qsigs
      .withColumn("sig", col("_qsig"))
      .withColumn("band",
        explode(Dedup.bandKeyExpr(p.nBands, p.nHashes / p.nBands,
          p.verifiable)))
      .select(col("band"), col("query_id"))
    // candidates first (a pair colliding in k bands appears k times),
    // then ONE signature comparison per distinct pair
    val cand = qbands.join(t("bands"), Seq("band"))
      .select(col("query_id"), col("id")).distinct()
    cand
      .join(qsigs, Seq("query_id"))
      .join(t("sigs").select(col("id"), col("sig").as("_isig")), Seq("id"))
      .select(col("query_id"), col("id"),
        graft.functions.VectorFunctions.minhashJaccard(col("_qsig"),
          col("_isig")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }
}
