package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions

/** Cross-batch streaming deduplication — the streaming twin of
  * `Dedup.exact` for a document stream that never stops (a crawler feed,
  * an ingestion queue): a document is admitted only if its content
  * fingerprint was never seen in ANY earlier micro-batch.
  *
  * State design for scale: the keyed state holds exactly one boolean per
  * DISTINCT fingerprint ever seen — 16-byte key + negligible value,
  * partitioned by fingerprint hash across executors, RocksDB state store
  * at corpus scale (StreamingSpec runs the stateful-dedup family under
  * the RocksDB provider, checkpoint restart included). No watermark: corpus dedup has no lateness horizon (a
  * duplicate a year later is still a duplicate), so state is append-only
  * by design; for bounded-retention semantics (dedup only within a time
  * horizon) use Spark's `dropDuplicatesWithinWatermark` instead — same
  * key layout, watermark-evicted state.
  */
object StreamingDedup {

  /** One admitted document per fingerprint, first-batch-wins; within the
    * first batch that carries a fingerprint, the smallest id wins
    * (determinism under batch re-execution).
    */
  case class Doc(fp: String, id: Long, text: String)

  /** Stateful exact dedup over a streaming `docs` frame. Emits the
    * surviving documents (append mode): the first occurrence of each
    * fingerprint across the whole stream history.
    */
  def exactDedupStream(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        TextFunctions.fingerprint(col(textCol)).as("fp"),
        col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[Doc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Doc],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.id))
          })
  }

  // ---------------------------------------------- near-duplicate (MinHash)

  /** One LSH band occurrence of one streaming document. */
  private[streaming] case class BandRow(band: String, id: Long, sig: Seq[Long])

  /** A near-duplicate hit: `id_b` (the later/larger id) collided with
    * `id_a` in some LSH band and their signature agreement cleared the
    * threshold. The same pair may be emitted by several bands (and, for a
    * pair split across micro-batches, once per band that matches) — the
    * batch blocker's `distinct()` is the consumer's job here, because a
    * cross-band distinct would need a second stateful stage.
    */
  case class NearDupHit(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Streaming twin of `Dedup.minhashLshPairs` (default xxhash mode) for a
    * document stream: flags each arriving document against every EARLIER
    * document it shares an LSH band with, at estimated Jaccard ≥
    * `threshold`. The distinct (id_a, id_b) pairs over the stream history
    * equal the batch blocker's pairs on the concatenated data
    * (StreamingSpec asserts this, checkpoint restart included).
    *
    * Plan shape, and why it differs from the batch path: batch signatures
    * come from ONE shuffle aggregation over exploded shingles — but a
    * streaming aggregation upstream of stateful dedup is not append-mode
    * expressible. Instead each micro-batch computes signatures as a
    * STATELESS per-row expression (`VectorFunctions.minhashSignature`
    * over `TextFunctions.shingleHashes` — spec-pinned bit-identical to
    * the aggregation path in DedupSpec), so the only stateful operator is
    * the band-keyed comparison itself.
    *
    * State design for scale: keyed by band — each bucket holds the
    * (id, signature) list of its members, ~nHashes·8 bytes per doc per
    * band. Band keys spread uniformly (they embed a hash of the minima),
    * so state partitions evenly across executors; RocksDB state store at
    * corpus scale (spec-run under the RocksDB provider). Like all LSH blocking, a degenerate corpus where
    * everything shares one band concentrates that bucket — the same rows
    * that would pair-explode in the batch join.
    *
    * Docs shorter than `shingleSize` tokens have no shingles and are
    * dropped (they cannot be near-duplicates), exactly as in batch.
    */
  def minhashPairsStream(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id", shingleSize: Int = 3,
                         nHashes: Int = 32, nBands: Int = 8,
                         threshold: Double = 0.6): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions
    val rowsPerBand = nHashes / nBands
    // the reduced shingle-hash array is materialized in its OWN projection:
    // the nHashes signature folds each read it, and an inline expression
    // would re-shingle the document nHashes× per row
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        transform(TextFunctions.shingleHashes(col(textCol), shingleSize),
          s => pmod(xxhash64(s), lit(VectorFunctions.MinhashPrime))).as("_mh"))
      .filter(size(col("_mh")) > 0)
      .select(col("id"),
        VectorFunctions.minhashSignatureFromReduced(col("_mh"), nHashes).as("sig"))
      .withColumn("band",
        explode(VectorFunctions.minhashBands(col("sig"), nBands, rowsPerBand)))
      .select(col("band"), col("id"), col("sig"))
      .as[BandRow]
    banded.groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[BandRow],
         state: org.apache.spark.sql.streaming.GroupState[Seq[(Long, Seq[Long])]]) => {
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[NearDupHit]
          // ascending id within the batch: determinism under re-execution,
          // and in-batch pairs flag the LARGER id as the duplicate —
          // matching the batch convention (id_a < id_b)
          rows.toSeq.sortBy(_.id).foreach { r =>
            if (!seen.exists(_._1 == r.id)) {
              seen.foreach { case (pid, psig) =>
                val agree = psig.iterator.zip(r.sig.iterator)
                  .count { case (a, b) => a == b }
                val est = agree.toDouble / psig.size
                if (est >= threshold)
                  out += NearDupHit(math.min(pid, r.id), math.max(pid, r.id), est)
              }
              seen = seen :+ (r.id -> r.sig)
            }
          }
          state.update(seen)
          out.result().iterator
        })
  }

  // ---------------------------------------------- near-duplicate (SimHash)

  /** One SimHash band-bucket occurrence of one streaming document. */
  private[streaming] case class SimBandRow(band: Int, bucket: Long, id: Long,
                                           sh: Long)

  /** A SimHash near-dup hit (id_a < id_b, full 64-bit Hamming distance).
    * Like [[NearDupHit]], at-least-once per matching band — consumers
    * `distinct()`.
    */
  case class SimDupHit(id_a: Long, id_b: Long, hamming: Int)

  /** Streaming twin of `Dedup.simhashPairs` (default xxhash mode): each
    * arriving document's 64-bit simhash is banded into `nBands` contiguous
    * bit bands; state is keyed by (band, bucket) and holds that bucket's
    * (id, simhash) members; an arriving doc emits a hit against every
    * earlier member within `maxHamming` bits. The per-row simhash
    * expression (`VectorFunctions.simhash`) is bit-identical to the batch
    * vote aggregation (StreamingSpec pins stream == batch pairs), and the
    * pigeonhole guarantee carries over unchanged: with maxHamming < nBands
    * every qualifying pair collides in at least one band, so the streamed
    * pair set is LOSSLESS, not best-effort.
    *
    * Documents with no tokens have an all-zero vote word and no meaningful
    * hash — dropped, exactly as the batch aggregation drops them.
    */
  def simhashPairsStream(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id", nBands: Int = 8,
                         maxHamming: Int = 3): Dataset[SimDupHit] = {
    require(64 % nBands == 0, s"nBands must divide 64, got $nBands")
    require(maxHamming < nBands,
      s"lossless blocking needs maxHamming < nBands ($maxHamming >= $nBands)")
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    docs
      // token hashes materialized first: the 64 per-bit vote folds each
      // read the array, so an inline tokenize+hash would run 64× per row
      .select(col(idCol).cast("long").as("id"),
        transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t)).as("_th"))
      .filter(size(col("_th")) > 0)
      .select(col("id"),
        VectorFunctions.simhashFromHashes(col("_th")).as("sh"))
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .select(col("band"),
        org.apache.spark.sql.functions.expr(s"shiftright(sh, band * $bandBits) & $mask").as("bucket"),
        col("id"), col("sh"))
      .as[SimBandRow]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[SimBandRow],
         state: org.apache.spark.sql.streaming.GroupState[Seq[(Long, Long)]]) => {
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[SimDupHit]
          rows.toSeq.sortBy(_.id).foreach { r =>
            if (!seen.exists(_._1 == r.id)) {
              seen.foreach { case (pid, psh) =>
                val ham = java.lang.Long.bitCount(psh ^ r.sh)
                if (ham <= maxHamming)
                  out += SimDupHit(math.min(pid, r.id), math.max(pid, r.id), ham)
              }
              seen = seen :+ (r.id -> r.sh)
            }
          }
          state.update(seen)
          out.result().iterator
        })
  }

  // -------------------------------------------- near-duplicate (embedding)

  /** One LSH-bucketed streaming embedding. */
  private[streaming] case class EmbRow(bucket: String, id: Long,
                                       v: Seq[Double])

  /** An embedding near-dup hit: exact cosine ≥ threshold inside a shared
    * LSH bucket.
    */
  case class EmbDupHit(id_a: Long, id_b: Long, cos: Double)

  /** Streaming twin of `Dedup.embeddingNearDupPairs` — the third member of
    * the near-dup family (lexical MinHash, bit-level SimHash, semantic
    * embedding), same state pattern: random-hyperplane signature computed
    * per row (the same `lshSignature` expression the batch row-form
    * aggregates to), state keyed by the full-signature bucket holding that
    * bucket's (id, vector) members, arriving vectors verified by EXACT
    * cosine against earlier members. The driver-side cosine is the same
    * ordered left-fold over doubles as the `VectorFunctions.cosine`
    * expression, so streamed `cos` values equal the batch column
    * bit-for-bit.
    *
    * State holds the vectors themselves (dim doubles per member) — the
    * price of exact verification, and exactly the data the batch
    * same-bucket self-join shuffles; bucket population is bounded by LSH
    * selectivity (2^nBits expected buckets), tunable like the batch
    * blocker. When state size matters more than exact cosines,
    * [[embeddingPairsStreamPq]] stores m PQ codes per member instead
    * (~16× smaller at the defaults) and verifies against reconstructions.
    */
  def embeddingPairsStream(embeddings: DataFrame, vecCol: String = "embedding",
                           idCol: String = "vec_id", dim: Int = 64,
                           nBits: Int = 8,
                           threshold: Double = 0.95): Dataset[EmbDupHit] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions
    embeddings
      .select(
        VectorFunctions.lshSignature(col(vecCol), nBits, dim).as("bucket"),
        col(idCol).cast("long").as("id"),
        VectorFunctions.asDouble(col(vecCol)).as("v"))
      .as[EmbRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[EmbRow],
         state: org.apache.spark.sql.streaming.GroupState[Seq[(Long, Seq[Double])]]) => {
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[EmbDupHit]
          rows.toSeq.sortBy(_.id).foreach { r =>
            if (!seen.exists(_._1 == r.id)) {
              seen.foreach { case (pid, pv) =>
                val c = VectorFunctions.cosineDriver(pv, r.v)
                if (c >= threshold)
                  out += EmbDupHit(math.min(pid, r.id), math.max(pid, r.id), c)
              }
              seen = seen :+ (r.id -> r.v)
            }
          }
          state.update(seen)
          out.result().iterator
        })
  }

  /** One LSH-bucketed streaming embedding with its PQ codes. */
  private[streaming] case class EmbPqRow(bucket: String, id: Long,
                                         v: Seq[Double], codes: Seq[Int])

  /** PQ-compressed variant of [[embeddingPairsStream]]: state holds
    * (id, m PQ codes) per bucket member instead of (id, dim raw doubles) —
    * m·4 bytes vs dim·8 (32 B vs 512 B at the default m=8, dim=64, a ~16×
    * state cut), which is what makes the stream's keyed state survivable
    * at corpus scale. `codebooks` come from the same offline
    * `Similarity.trainPqCodebooks` the q76/q79 index family uses (or a
    * persisted [[graft.operators.AnnIndex]]).
    *
    * Verification is ASYMMETRIC, exactly the ADC trade: the arriving
    * vector stays full precision and is compared against the
    * RECONSTRUCTION (per-sub-space centroid) of each earlier member, so
    * cross-batch cosines shift by the quantization error — and a BINARY
    * threshold on a shifted cosine flips pairs sitting near it. The
    * operator therefore accepts cross-batch hits at `threshold − margin`
    * (a conservative candidate filter: quantization can no longer hide a
    * true pair unless its error exceeds the margin), trading a little
    * precision near the boundary for recall — measured ≥ 0.95 vs the
    * exact variant in StreamingSpec at the default margin. Consumers that
    * need exact decisions re-verify flagged pairs against stored raw
    * vectors (the pair stream carries both ids). Pairs WITHIN one
    * micro-batch still verify full-vs-full at the exact threshold (both
    * vectors are in flight), so a single-batch run reproduces the exact
    * variant verbatim. Keep [[embeddingPairsStream]] when exact cosines
    * matter more than state size.
    */
  def embeddingPairsStreamPq(embeddings: DataFrame,
                             codebooks: Seq[Seq[Seq[Double]]],
                             vecCol: String = "embedding",
                             idCol: String = "vec_id", dim: Int = 64,
                             nBits: Int = 8,
                             threshold: Double = 0.95,
                             margin: Double = 0.05): Dataset[EmbDupHit] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    import graft.functions.VectorFunctions
    val sub = codebooks.head.head.length
    def decode(codes: Seq[Int]): Seq[Double] = {
      val out = new Array[Double](codes.length * sub)
      var m = 0
      while (m < codes.length) {
        val c = codebooks(m)(codes(m))
        var i = 0
        while (i < sub) { out(m * sub + i) = c(i); i += 1 }
        m += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
    embeddings
      .select(
        VectorFunctions.lshSignature(col(vecCol), nBits, dim).as("bucket"),
        col(idCol).cast("long").as("id"),
        VectorFunctions.asDouble(col(vecCol)).as("v"),
        graft.operators.Similarity.pqCodes(col(vecCol), codebooks).as("codes"))
      .as[EmbPqRow]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[EmbPqRow],
         state: org.apache.spark.sql.streaming.GroupState[Seq[(Long, Seq[Int])]]) => {
          var seen = state.getOption.getOrElse(Seq.empty)
          // earlier THIS-batch members still have their full vectors in
          // flight — verify those full-vs-full; only genuinely cross-batch
          // members pay the reconstruction error
          val inBatch = scala.collection.mutable.Map.empty[Long, Seq[Double]]
          val out = Seq.newBuilder[EmbDupHit]
          rows.toSeq.sortBy(_.id).foreach { r =>
            if (!seen.exists(_._1 == r.id)) {
              seen.foreach { case (pid, pcodes) =>
                val (c, cut) = inBatch.get(pid) match {
                  case Some(pv) =>
                    (VectorFunctions.cosineDriver(r.v, pv), threshold)
                  case None =>
                    (VectorFunctions.cosineDriver(r.v, decode(pcodes)),
                      threshold - margin)
                }
                if (c >= cut)
                  out += EmbDupHit(math.min(pid, r.id), math.max(pid, r.id), c)
              }
              seen = seen :+ (r.id -> r.codes)
              inBatch(r.id) = r.v
            }
          }
          state.update(seen)
          out.result().iterator
        })
  }
}
