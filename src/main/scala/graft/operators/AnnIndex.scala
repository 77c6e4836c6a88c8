package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Bundle

/** A PERSISTED IVF-PQ index — the step from "ANN operators" to "ANN
  * system": [[Similarity.ivfAdcTopK]] retrains centroids/codebooks and
  * re-encodes the whole corpus inside every call, which is the right shape
  * for a one-shot query but not for an index a 100 TB user builds once and
  * serves many times. Here train + encode happen ONCE ([[build]]), land as
  * a [[Bundle]] (parquet tables + JSON manifest), and queries run against
  * the saved code table ([[topK]]) — the reference's own save-and-reopen
  * idiom (trx/azav.py:300-302: re-open saved results instead of
  * recomputing) applied to the ANN family.
  *
  * Layout under `dir`:
  *   - `codes.parquet`     — (id, codes array<int>, cell int): the encoded
  *     corpus, the only corpus-sized table; scannable and cell-prunable.
  *   - `centroids.parquet` — (cell, cv array<double>): coarse quantizer.
  *   - `codebooks.parquet` — (m, k0, cvec array<double>): PQ codebooks.
  *   - `manifest.json`     — the training parameters; [[ensure]] reuses a
  *     saved index iff the manifest matches (the T2 invalidation
  *     contract, Bundle.isValid).
  *
  * Serving reads centroids+codebooks to the driver (kCells·dim +
  * m·k·(dim/m) doubles — small by construction) and leaves codes
  * distributed; [[Similarity.adcServe]] is the same probe + ADC + salted
  * top-k expression tree the live path plans, so saved-index results are
  * bit-for-bit identical to in-memory results (SimilaritySpec pins this).
  *
  * [[append]] grows the index incrementally with the SAVED quantizers:
  * encode new vectors, assign cells, append to codes.parquet — no
  * retraining, so append-then-query equals encode-everything-with-the-
  * same-quantizers-then-query exactly. Already-indexed ids are skipped
  * (anti-join on the code table), so replaying a delivery is a no-op —
  * the OnlineNearDup parquet-state discipline.
  */
object AnnIndex {

  /** Training/encoding parameters; the manifest is their string form, so
    * any change invalidates a saved index.
    *
    * `init` selects the coarse-quantizer training path:
    *   - "stride"     — [[Similarity.sampledKMeans]] over the first-ids
    *     sample (the default; right when ingest order is not biased);
    *   - "farthest"   — [[Similarity.farthestInit]] + full-corpus Lloyd
    *     (k−1 corpus passes; the small-k de-biased init);
    *   - "oversample" — [[Similarity.oversampleInit]] + full-corpus
    *     Lloyd (rounds+1 corpus passes independent of k — the init a
    *     large-kCells 100 TB index trains with).
    */
  final case class Params(dim: Int, m: Int = 8, k: Int = 16,
                          kCells: Int = 16, nProbe: Int = 4,
                          iters: Int = 10, sampleN: Int = 4096,
                          byResidual: Boolean = false,
                          init: String = "stride") {
    require(Set("stride", "farthest", "oversample")(init),
      s"unknown init '$init' (stride | farthest | oversample)")
    def asMap: Map[String, String] = Map(
      "dim" -> dim.toString, "m" -> m.toString, "k" -> k.toString,
      "kCells" -> kCells.toString, "iters" -> iters.toString,
      "sampleN" -> sampleN.toString, "byResidual" -> byResidual.toString,
      "init" -> init)
  }

  /** A loaded index: small quantizers on the driver, codes distributed. */
  final case class Loaded(centroids: Seq[Seq[Double]],
                          codebooks: Seq[Seq[Seq[Double]]],
                          codes: DataFrame,
                          params: Map[String, String]) {
    def byResidual: Boolean = params.get("byResidual").contains("true")
  }

  /** Train both quantizers on `corpus`, encode it, persist everything.
    * Overwrites any index already at `dir`; [[ensure]] is the
    * reuse-if-valid entry point.
    */
  def build(corpus: DataFrame, dir: String, p: Params,
            idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = trainCentroids(corpus, p, idCol, vecCol)
    val cbs =
      if (p.byResidual)
        Similarity.trainPqCodebooksResidual(corpus, cents, p.m, p.k, p.dim,
          p.iters, p.sampleN, idCol, vecCol)
      else
        Similarity.trainPqCodebooks(corpus, p.m, p.k, p.dim, p.iters,
          p.sampleN, idCol, vecCol)
    val encoded = Similarity.encodeWithCells(corpus, cents, cbs,
      p.byResidual, idCol, vecCol)
    val centsDf = cents.zipWithIndex
      .map { case (cv, i) => (i, cv) }.toDF("cell", "cv")
    val cbsDf = cbs.zipWithIndex.flatMap { case (book, m) =>
      book.zipWithIndex.map { case (cvec, k0) => (m, k0, cvec) }
    }.toDF("m", "k0", "cvec")
    // Bundle.save writes the manifest LAST — a crash mid-build leaves no
    // manifest, so ensure() treats the directory as invalid and rebuilds
    Bundle.save(dir, Map(
      "codes" -> encoded, "centroids" -> centsDf, "codebooks" -> cbsDf),
      p.asMap)
  }

  /** Coarse centroids per `p.init` — the deterministic trainer the spec
    * replays for the saved-vs-live pin. The de-biased inits refine with
    * the SAME full-corpus Lloyd (round-6 stable arithmetic) the q109/
    * q114 oracles unroll.
    */
  def trainCentroids(corpus: DataFrame, p: Params,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Seq[Seq[Double]] =
    p.init match {
      case "stride" =>
        Similarity.sampledKMeans(corpus, p.kCells, p.iters, p.sampleN,
          idCol, vecCol)
      case "farthest" =>
        Similarity.distributedKMeans(corpus, p.kCells, p.iters, p.dim,
          p.sampleN, idCol, vecCol,
          Some(Similarity.farthestInit(corpus, p.kCells, p.dim, idCol,
            vecCol)))
      case "oversample" =>
        Similarity.distributedKMeans(corpus, p.kCells, p.iters, p.dim,
          p.sampleN, idCol, vecCol,
          Some(Similarity.oversampleInit(corpus, p.kCells, p.dim,
            idCol = idCol, vecCol = vecCol)))
    }

  /** Reuse the index at `dir` when its manifest matches `p` exactly;
    * otherwise drop and rebuild (T2 parameter invalidation). Returns true
    * when a rebuild happened.
    */
  def ensure(corpus: DataFrame, dir: String, p: Params,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): Boolean =
    if (Bundle.isValid(dir, p.asMap)) false
    else {
      Bundle.deleteRecursively(dir)
      build(corpus, dir, p, idCol, vecCol)
      true
    }

  def load(spark: SparkSession, dir: String): Loaded = {
    val params = Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no ANN index manifest at $dir"))
    healCompaction(dir)
    val tables = Bundle.load(spark, dir)
    val cents = tables("centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq)
      .sortBy(_._1).map(_._2).toSeq
    val cbs = tables("codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3).toSeq }
    Loaded(cents, cbs, tables("codes"), params)
  }

  /** ADC top-k served from the saved index — identical expression tree to
    * [[Similarity.ivfAdcTopK]] minus training and encoding.
    * Output: (query_id, rank, id, dist).
    */
  def topK(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
           nProbe: Int = 4, vecCol: String = "embedding",
           queryIdCol: String = "query_id"): DataFrame = {
    val ix = load(spark, dir)
    Similarity.adcServe(ix.codes, queries, ix.centroids, ix.codebooks, k,
      nProbe, vecCol, queryIdCol, ix.byResidual)
  }

  final case class AppendResult(nAppended: Long, nSkipped: Long)

  /** Rewrite the code table into `nFiles` files — the maintenance pass
    * after many small [[append]]s have fragmented it (every append adds
    * its own file set; a scan's task count and footer overhead grow with
    * fragment count, not data). Codes are rewritten verbatim — serving is
    * bit-identical before and after (spec-pinned).
    *
    * Crash safety (rename-based three-step): (1) write the compacted copy
    * to `codes_compact.parquet`; (2) delete `codes.parquet`; (3) rename
    * the copy into place. A crash before (2) leaves the live table plus a
    * stale copy (removed on the next attempt); a crash between (2) and
    * (3) leaves only the copy — [[healCompaction]] (run by [[load]])
    * finishes the rename, so the index is never served from a half state.
    */
  def compact(spark: SparkSession, dir: String, nFiles: Int = 1): Unit = {
    healCompaction(dir)
    val (fs, live) = Bundle.fsPath(s"$dir/codes.parquet")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/codes_compact.parquet")
    fs.delete(tmp, true) // stale copy from a crashed run
    spark.read.parquet(live.toString)
      .repartition(nFiles)
      .write.parquet(tmp.toString)
    fs.delete(live, true)
    if (!fs.rename(tmp, live))
      throw new IllegalStateException(s"compaction rename failed in $dir")
  }

  /** Complete a compaction that crashed between delete and rename: if the
    * compacted copy exists and the live table does not, the copy IS the
    * table. If BOTH exist the crash happened before the delete — the
    * live table is authoritative and the copy (possibly torn mid-write)
    * is removed, or [[graft.sources.Bundle.load]]'s table discovery
    * would surface it as a phantom `codes_compact` table (and a torn
    * footer would fail the whole load) — the crash-matrix spec's find.
    */
  private def healCompaction(dir: String): Unit = {
    val (fs, live) = Bundle.fsPath(s"$dir/codes.parquet")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/codes_compact.parquet")
    if (fs.exists(tmp)) {
      if (!fs.exists(live)) {
        if (!fs.rename(tmp, live))
          throw new IllegalStateException(s"compaction heal failed in $dir")
      } else fs.delete(tmp, true)
    }
    ()
  }

  /** Encode `newVectors` with the index's SAVED quantizers and append to
    * the code table. Ids already present are skipped (replay-idempotent);
    * quantizers never retrain here, so the index stays exactly "encode
    * everything with the build-time quantizers".
    */
  def append(spark: SparkSession, dir: String, newVectors: DataFrame,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): AppendResult = {
    val ix = load(spark, dir)
    // In-delivery id duplicates collapse up front — the anti-join only
    // protects against ids already IN the index, so without this both
    // copies would land in codes.parquet and topK could return one id at
    // two ranks (the OnlineNearDup in-batch discipline).
    val incoming = newVectors.dropDuplicates(idCol)
    val fresh = incoming
      .join(ix.codes.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val nFresh = fresh.count()
    val nSkipped = incoming.count() - nFresh
    if (nFresh > 0)
      Similarity.encodeWithCells(fresh, ix.centroids, ix.codebooks,
          ix.byResidual, idCol, vecCol)
        .write.mode("append").parquet(s"$dir/codes.parquet")
    AppendResult(nFresh, nSkipped)
  }
}
