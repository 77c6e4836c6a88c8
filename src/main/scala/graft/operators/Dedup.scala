package graft.operators

import org.apache.spark.sql.DataFrame
import graft.operators.Checkpoints.EagerOps
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the naive n² cross join. Exact dedup
  * is a hash groupBy on a 128-bit fingerprint (shuffles 16-byte keys, not
  * bodies). MinHash/SimHash/embedding near-dup all bucket first (LSH bands /
  * hash prefix / coarse quantization) so the candidate-pair join shuffles
  * only same-bucket groups; the expensive verification runs per candidate
  * pair, whose count is ~linear in corpus size for realistic dup rates.
  *
  * EAGER contract: the pair/span-producing operators here
  * ([[ngramJaccardPairs]], [[simhashPairs]], [[embeddingNearDupPairs]],
  * [[exactSubstringPairSpans]], [[contaminationSpans]], [[pairQuality]],
  * and the checkpointed core of [[removeContaminated]]) EXECUTE at call
  * time and return a materialized (checkpointed) frame: their shared
  * shingle/anchor tables feed many consumers whose differing column
  * pruning defeats exchange reuse, so the persist-once/checkpoint/release
  * lifecycle is what keeps the corpus read at 1× instead of 8× per call.
  * Consequence for callers: predicates composed on the RETURNED frame do
  * not push down into the blocker chain (filter inputs beforehand where
  * that matters), and constructing the frame already pays its jobs.
  * Materialization goes through [[Checkpoints.EagerOps.eagerCheckpoint]]:
  * local (fast, non-replayable) by default, reliable files under
  * `spark.graft.checkpointDir` for cluster deployments where an executor
  * loss mid-query must degrade to recompute instead of job failure.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint; keep the smallest id as the
    * canonical representative. Returns (fingerprint, keep_id, n_dups).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: surviving rows only (one per distinct normalized text). */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val keep = exactGroups(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Shingle-combine base for the verifiable hash family (prime, and
    * h·base stays < 2^63 for h < 1e9+7 in checked-arithmetic engines).
    */
  private val CombineBase = 1000003L

  /** Distinct shingle identities per document as ROWS, entirely in
    * whole-stage codegen: hash each token after posexplode (lambda bodies
    * inside `transform` are interpreted — measured 2–4× slower), form the
    * n-gram identity with `lead` windows over token position, and combine.
    *
    * Default: xxhash64 token hash + multi-argument xxhash64 combine.
    * Verifiable: md5-derived 60-bit token hash mod 1e9+7 + polynomial
    * combine — every step recomputable in DuckDB (md5 + lead window),
    * and the plan keeps the same long-typed shape (no string shingles
    * through the window/distinct, which measured ~4× slower cold).
    * Output: (id, s) distinct; in verifiable mode s is already < 1e9+7.
    */
  private def fanOutNarrowScan(docs: DataFrame): DataFrame =
    Scans.fanOutNarrowScan(docs)

  private def distinctShingleRows(docs: DataFrame, textCol: String,
                                  idCol: String, n: Int,
                                  verifiable: Boolean = false): DataFrame =
    shingleRows(docs, textCol, idCol, n, verifiable).distinct()

  /** All shingle occurrences per document as ROWS (one row per n-gram
    * POSITION — repetition analysis needs the multiplicity that
    * [[distinctShingleRows]] collapses). Same codegen'd shape.
    */
  private[graft] def shingleRows(docs: DataFrame, textCol: String,
                                 idCol: String, n: Int,
                                 verifiable: Boolean = false): DataFrame =
    shinglePosRows(docs, textCol, idCol, n, verifiable, fanOut = true)
      .select(col("id"), col("s"))

  /** [[shingleRows]] keeping the starting token position `p` of each n-gram
    * (span analysis needs the coordinates, not just the identities).
    */
  private[graft] def shinglePosRows(docs: DataFrame, textCol: String,
                                    idCol: String, n: Int,
                                    verifiable: Boolean = false,
                                    fanOut: Boolean = false): DataFrame = {
    // fanOut is passed by the IDENTITY consumers (shingleRows → the
    // distinct/aggregation pipelines: minhash signatures, n-gram Jaccard,
    // simhash) where the A/B showed 17-32% wins; the POSITION consumers
    // (exact-substring/contamination spans) measured mildly WORSE with it
    // (q203 +14%, q61 +20% across two interleaved runs) — their window
    // chains re-cluster by id immediately and the extra exchange only adds
    // a stage to every persisted-side evaluation
    val in = if (fanOut) fanOutNarrowScan(docs) else docs
    val tok0 = in.select(col(idCol).as("id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("_p", "_t")))
    val tok =
      if (verifiable)
        tok0.select(col("id"), col("_p"),
          pmod(TextFunctions.md5Hash60(col("_t")),
            lit(TextFunctions.RollingHashMod)).as("_h"))
      else
        tok0.select(col("id"), col("_p"), xxhash64(col("_t")).as("_h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("_p"))
    val leads = (0 until n).map(k =>
      if (k == 0) col("_h") else lead(col("_h"), k).over(w))
    val combined =
      if (verifiable)
        leads.reduceLeft((acc, h) =>
          pmod(acc * CombineBase + h, lit(TextFunctions.RollingHashMod)))
      else xxhash64(leads: _*)
    tok.select(col("id"), col("_p").as("p"),
        when(leads.last.isNotNull, combined).as("s"))
      .filter(col("s").isNotNull)
  }

  /** Per-document duplicated-SPAN fraction (the Lee et al. 2022
    * "Deduplicating Training Data" signal, n-gram-approximated): the
    * fraction of token positions covered by at least one n-gram that also
    * occurs in ANOTHER document. Shared n-grams are found by one count-
    * distinct-docs aggregation on 8-byte shingle hashes; their [p, p+n-1]
    * intervals are merged per document with a running-max window
    * (gaps-and-islands), so overlapping spans are counted once.
    * Shuffles: shingle-hash groups + per-doc windows — never doc×doc.
    */
  def dupSpanStats(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", n: Int = 3,
                   verifiable: Boolean = false): DataFrame = {
    // NOT persisted: at the default n=3 the anchor chain is a 2-lead
    // window — recomputing it for the two consumers measured CHEAPER than
    // an eager materialization (full-suite A/B q70 1.34→1.51 with the
    // persist); the ≥20-lead chains (exactSubstringPairSpans family) are
    // the ones worth materializing
    val sp = shinglePosRows(docs, textCol, idCol, n, verifiable)
    val shared = sp.groupBy(col("s"))
      .agg(countDistinct(col("id")).as("_nd"))
      .filter(col("_nd") >= 2).select(col("s"))
    val ss = sp.join(shared, Seq("s")).select(col("id"), col("p"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("p"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prevEnd = max(col("p") + (n - 1)).over(w)
    val covered = ss
      .withColumn("_c", greatest(lit(0), (col("p") + (n - 1)) -
        greatest(coalesce(prevEnd, col("p") - n), col("p") - 1)))
      .groupBy(col("id")).agg(sum(col("_c")).as("covered"))
    docs.select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("n_tok"))
      .join(covered.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .withColumn("dup_span_frac",
        round(col("covered") / greatest(col("n_tok"), lit(1)).cast("double"), 6))
  }

  /** Exact-substring dedup TRANSFORM — the applied counterpart of
    * [[dupSpanStats]] (Lee et al. 2022 removes duplicated substrings, it
    * doesn't just measure them): each document loses the token spans
    * covered by an n-gram that also occurs in a document with a SMALLER
    * id, so the first document (by id) keeps the shared text and every
    * later one sheds it. Output is in normalized token space (lowercased
    * `[a-z0-9_]+` tokens re-joined by single spaces) — the same
    * normalization every other dedup signal here uses.
    *
    * Scale plan: (1) one partial-aggregatable `min(id)` per shingle hash
    * (8-byte keys, map-side combine absorbs boilerplate repetition);
    * (2) shingle-hash equi-join back — a hot key streams through a hash
    * probe, AQE skew-join splits it if needed; (3) covered positions via
    * a bounded n-row explode + distinct; (4) per-document reconstruction
    * is a doc-grain groupBy (groups are document-sized by construction).
    * Never doc×doc; no corpus-wide window.
    */
  def removeDupSpans(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", n: Int = 3,
                     verifiable: Boolean = false): DataFrame = {
    // NOT persisted — the n=3 anchor chain is recompute-cheap (see
    // dupSpanStats); materialization is reserved for the ≥20-lead family
    val sp = shinglePosRows(docs, textCol, idCol, n, verifiable)
    val firstDoc = sp.groupBy(col("s")).agg(min(col("id")).as("_min_id"))
    val coveredPos = sp.join(firstDoc, Seq("s"))
      .filter(col("id") > col("_min_id"))
      .select(col("id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("tp"))
      .distinct()
    rebuildWithout(docs, textCol, idCol, coveredPos)
  }

  /** Rebuild each document's normalized token text minus the covered
    * positions `(id, tp)` — the shared tail of every span-removal
    * transform. Per-document groupBy (groups are document-sized by
    * construction); output (idCol, n_tok, clean_text, n_removed).
    */
  private[graft] def rebuildWithout(docs: DataFrame, textCol: String,
                                    idCol: String,
                                    coveredPos: DataFrame): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("tp", "t")))
    val rebuilt = tok.join(coveredPos, Seq("id", "tp"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("tp"), col("t")))),
          x => x.getField("t")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol), TextFunctions.tokenCount(col(textCol))
        .cast("long").as("n_tok"))
      .join(rebuilt.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("n_removed", col("n_tok") - col("n_kept"))
      .drop("n_kept")
  }

  /** Arbitrary-length exact-substring matches across documents — the
    * suffix-array-style dedup of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better"), re-expressed as sort/join
    * relational algebra. Unlike the fixed-grain span tools above (which
    * answer "is this position inside SOME shared n-gram"), this
    * materializes the MAXIMAL cross-document matches themselves, at any
    * length ≥ `minLen` and any alignment offset: one row per maximal
    * pair match `(id_a, p_a, id_b, p_b, len)` with `id_a < id_b`,
    * `len >= minLen`, extended left AND right to the first token
    * mismatch.
    *
    * Algorithm (the distributed analogue of suffix-sort + LCP scan):
    *  1. anchor grams — a rolling `minLen`-token hash at EVERY position
    *     (stride 1, so a duplicate passage is found at any offset; no
    *     grid to straddle);
    *  2. shared anchors — one partial-aggregatable groupBy on the 8-byte
    *     gram hash keeps values seen in ≥ 2 documents (this is the
    *     "sort" — it shuffles hash keys, ~one row per corpus token, the
    *     same asymptotic cost a suffix array pays);
    *  3. aligned occurrence pairs — self-equi-join of the surviving
    *     anchors on the gram hash (quadratic ONLY within one gram
    *     value's occurrence list; `maxOcc` caps pathological boilerplate
    *     grams, mirroring the LSH hot-bucket star cap);
    *  4. maximal extension — within a (doc pair, alignment offset
    *     d = p_a − p_b) group, consecutive aligned anchors form
    *     gaps-and-islands runs; a run [p0, p1] IS the maximal match
    *     [p0, p1 + minLen − 1]: it ends exactly where the next token
    *     pair mismatches, and starts where the previous one did.
    * Never doc×doc; window groups are bounded by passage length.
    * Exact modulo anchor-hash collisions (64-bit xxhash64 by default;
    * `verifiable` switches to the DuckDB-replayable md5/1e9+7 family the
    * rest of the dedup suite uses).
    */
  def exactSubstringPairSpans(docs: DataFrame, textCol: String = "text",
                              idCol: String = "doc_id", minLen: Int = 20,
                              maxOcc: Int = 4096,
                              verifiable: Boolean = false,
                              includeSelf: Boolean = false): DataFrame = {
    require(minLen >= 2, s"exactSubstringPairSpans: minLen=$minLen < 2")
    require(maxOcc >= 2, s"exactSubstringPairSpans: maxOcc=$maxOcc < 2")
    // The anchor table feeds the shared-anchor aggregate AND both sides of
    // the occurrence self-join; the sides prune different columns, so
    // exchange reuse does not fire and the token-explode + (minLen−1)-lead
    // window chain — the dominant per-token cost at minLen = 20 — ran up
    // to 4× per call. Persist once, release after the (match-mass-bounded)
    // pair spans are materialized — the ngramJaccardPairs lifecycle.
    val sp = shinglePosRows(docs, textCol, idCol, minLen, verifiable)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // includeSelf widens the match universe to WITHIN-document repeats
    // (the same passage twice in one document at offset d ≠ 0 — the Lee
    // et al. 2022 generation-loop/boilerplate case): an anchor then
    // qualifies on ≥ 2 OCCURRENCES, not ≥ 2 documents, and same-id pairs
    // ride the same islands machinery with the b-side pinned to the
    // LATER occurrence (so the removal rule below sheds repeats and
    // keeps each passage's FIRST copy).
    val shared = sp.groupBy(col("s"))
      .agg(count(lit(1)).as("_cnt"), countDistinct(col("id")).as("_nd"))
      .filter((if (includeSelf) col("_cnt") >= 2 else col("_nd") >= 2) &&
        col("_cnt") <= maxOcc)
      .select(col("s"))
    val ss = sp.join(shared, Seq("s"))
    val pairs = ss.select(col("s"), col("id").as("id_a"), col("p").as("p_a"))
      .join(ss.select(col("s"), col("id").as("id_b"), col("p").as("p_b")),
        Seq("s"))
      .filter(col("id_a") < col("id_b") ||
        (lit(includeSelf) && col("id_a") === col("id_b") &&
          col("p_b") > col("p_a")))
      .select(col("id_a"), col("p_a"), col("id_b"), col("p_b"),
        (col("p_a") - col("p_b")).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"), col("d")).orderBy(col("p_a"))
    val spans = pairs.withColumn("_grp", col("p_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("d"), col("_grp"))
      .agg(min(col("p_a")).as("pa"), min(col("p_b")).as("pb"),
        max(col("p_a")).as("pmax"))
      .select(col("id_a"), col("pa").as("p_a"), col("id_b"),
        col("pb").as("p_b"), (col("pmax") - col("pa") + minLen).as("len"))
      .eagerCheckpoint()
    spans
    } finally sp.unpersist(false)
  }

  /** Per-document MAXIMAL duplicated regions of arbitrary length ≥
    * `minLen`: both sides of every [[exactSubstringPairSpans]] match,
    * merged per document over overlapping-or-adjacent intervals
    * (running-max gaps-and-islands). Output one row per maximal region:
    * `(idCol, span_start, span_end, span_len, n_partners)` with
    * `n_partners` the distinct other documents contributing to the
    * region. Documents with no qualifying match produce no rows.
    */
  def exactSubstringSpans(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id", minLen: Int = 20,
                          maxOcc: Int = 4096,
                          verifiable: Boolean = false,
                          includeSelf: Boolean = false): DataFrame = {
    val ps = exactSubstringPairSpans(docs, textCol, idCol, minLen, maxOcc,
      verifiable, includeSelf)
    val sides = ps.select(col("id_a").as("id"), col("p_a").as("st"),
        (col("p_a") + col("len") - 1).as("en"), col("id_b").as("partner"))
      .unionByName(ps.select(col("id_b").as("id"), col("p_b").as("st"),
        (col("p_b") + col("len") - 1).as("en"), col("id_a").as("partner")))
    mergeDocSpans(sides, idCol)
  }

  /** Merge per-document overlapping-or-adjacent (st, en) intervals into
    * maximal regions with distinct-partner counts — the shared tail of
    * the span views (batch and streaming). Input rows:
    * (id, st, en, partner).
    */
  private[graft] def mergeDocSpans(sides0: DataFrame, idCol: String): DataFrame = {
    val sides = sides0.distinct()
    val ow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("st"), col("en"), col("partner"))
    val pm = max(col("en"))
      .over(ow.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    sides.withColumn("_pm", pm)
      .withColumn("_g", sum(when(col("_pm").isNull ||
        col("st") > col("_pm") + 1, 1).otherwise(0)).over(ow))
      .groupBy(col("id"), col("_g"))
      .agg(min(col("st")).as("span_start"), max(col("en")).as("span_end"),
        countDistinct(col("partner")).as("n_partners"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"),
        col("n_partners"))
  }

  /** Cross-corpus EVAL-DECONTAMINATION view: the maximal exact matches
    * of length ≥ `minLen` between a TRAIN and an EVAL corpus (the Lee
    * et al. 2022 / GPT-3 contamination setting), merged per eval
    * document. Within-corpus duplicates are excluded BY CONSTRUCTION:
    * train anchors SEMI-JOIN the (typically tiny) eval anchor set
    * before any pairing, so the train corpus's own duplicate mass —
    * the dominant pair volume at 100 TB — never enters the join; the
    * pair stage is train-occurrences × eval-occurrences per surviving
    * anchor, with the hot-anchor cap (`maxOcc`) applied to the TRAIN
    * side (boilerplate grams). The two corpora stay separate frames —
    * colliding raw ids are fine. Output: (idCol = eval id, span_start,
    * span_end, span_len, n_partners = distinct train sources), eval
    * token coordinates.
    */
  def contaminationSpans(train: DataFrame, eval: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id", minLen: Int = 20,
                         maxOcc: Int = 4096,
                         verifiable: Boolean = false): DataFrame = {
    require(minLen >= 2, s"contaminationSpans: minLen=$minLen < 2")
    require(maxOcc >= 1, s"contaminationSpans: maxOcc=$maxOcc < 1")
    val spT = shinglePosRows(train, textCol, idCol, minLen, verifiable)
      .select(col("s"), col("id").as("tid"), col("p").as("pt"))
    // the eval anchor table feeds the semi-join's distinct set AND the
    // matched-anchor join — persist it once (eval corpora are the small
    // side by contract); released after the span output is materialized
    val spE = shinglePosRows(eval, textCol, idCol, minLen, verifiable)
      .select(col("s"), col("id").as("eid"), col("p").as("pe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try mergeDocSpans(contaminationPairSpans(spT, spE, minLen, maxOcc)
      .select(col("eid").as("id"), col("st"), col("en"),
        col("tid").as("partner")), idCol)
      .eagerCheckpoint() // bounded by eval-side match mass
    finally spE.unpersist(false)
  }

  /** The cross-corpus pair-span core shared by [[contaminationSpans]]
    * and the streaming monitor: train anchor rows (s, tid, pt) × eval
    * anchor rows (s, eid, pe) → maximal matches (tid, eid, st, en) in
    * EVAL coordinates. Semi-join first, train-side hot-anchor cap,
    * per-(pair, offset) islands.
    */
  private[graft] def contaminationPairSpans(spT: DataFrame, spE: DataFrame,
                                            minLen: Int,
                                            maxOcc: Int): DataFrame = {
    // the shared-train table feeds both sides of the hot-anchor cap join
    // (rows × their per-anchor counts) — materialized once so the TRAIN
    // anchor chain (the big side) runs a single time; bounded by shared-
    // anchor mass, the quantity the semi-join exists to keep small
    val tShared = contaminationSharedTrain(spT, spE).eagerCheckpoint()
    contaminationIslands(
      contaminationMatchedAnchors(tShared, spE, maxOcc).drop("s"), minLen)
  }

  /** Train anchor rows that appear in the eval anchor set — the
    * semi-join that keeps train-train duplicate mass out of every later
    * stage. Bounded by |eval anchors| × per-anchor train occurrences.
    */
  private[graft] def contaminationSharedTrain(spT: DataFrame,
                                              spE: DataFrame): DataFrame =
    spT.join(spE.select(col("s")).distinct(), Seq("s"))

  /** Matched anchor pairs pre-island: every (train occurrence × eval
    * occurrence) of a shared anchor whose TRAIN occurrence count is
    * within `maxOcc`, keyed by the anchor value `s` so a later pass can
    * re-apply the cap over a larger train universe (the streaming
    * monitor's report-time global cap). Output:
    * (s, tid, eid, pe, d = pe − pt).
    */
  private[graft] def contaminationMatchedAnchors(tShared: DataFrame,
                                                 spE: DataFrame,
                                                 maxOcc: Int): DataFrame = {
    val tCap = tShared.join(tShared.groupBy(col("s"))
      .agg(count(lit(1)).as("_c")).filter(col("_c") <= maxOcc)
      .select(col("s")), Seq("s"))
    tCap.join(spE, Seq("s"))
      .select(col("s"), col("tid"), col("eid"), col("pe"),
        (col("pe") - col("pt")).as("d"))
  }

  /** Gaps-and-islands over matched anchor pairs: within a (doc pair,
    * alignment offset) group, consecutive aligned anchors form the
    * maximal match. Input (tid, eid, pe, d); output (tid, eid, st, en)
    * in eval coordinates.
    */
  private[graft] def contaminationIslands(pairs: DataFrame,
                                          minLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tid"), col("eid"), col("d")).orderBy(col("pe"))
    pairs.withColumn("_grp", col("pe") - row_number().over(w))
      .groupBy(col("tid"), col("eid"), col("d"), col("_grp"))
      .agg(min(col("pe")).as("st"),
        (max(col("pe")) + minLen - 1).as("en"))
      .select(col("tid"), col("eid"), col("st"), col("en"))
  }

  /** Train-side DECONTAMINATION transform — the production action after
    * [[contaminationSpans]] flags matches: every maximal >= `minLen`-token
    * cross-corpus match sheds its TRAIN-side tokens (the eval set is
    * never edited — the GPT-3/Lee et al. discipline removes the overlap
    * from the training data), with the same normalized-token rebuild as
    * [[removeDupSpans]]. Output over the TRAIN corpus:
    * (idCol, n_tok, clean_text, n_removed). Same scale shape as the
    * scan: train anchors semi-join the eval anchor set before any
    * pairing (train-train mass never joins), hot anchors capped on the
    * train side, islands bounded by passage length — never train×train.
    */
  def removeContaminated(train: DataFrame, eval: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id", minLen: Int = 20,
                         maxOcc: Int = 4096,
                         verifiable: Boolean = false): DataFrame = {
    require(minLen >= 2, s"removeContaminated: minLen=$minLen < 2")
    require(maxOcc >= 1, s"removeContaminated: maxOcc=$maxOcc < 1")
    val spT = shinglePosRows(train, textCol, idCol, minLen, verifiable)
      .select(col("s"), col("id").as("tid"), col("p").as("pt"))
    // same two-consumer lifecycle as contaminationSpans: spE persisted
    // across the semi-join + matched join, tShared materialized once (the
    // cap join reads it twice), covered positions (match-mass-bounded)
    // materialized so spE can release before the corpus-sized rebuild
    val spE = shinglePosRows(eval, textCol, idCol, minLen, verifiable)
      .select(col("s"), col("id").as("eid"), col("p").as("pe"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val covered = try {
      val tShared = contaminationSharedTrain(spT, spE).eagerCheckpoint()
      val pairs = contaminationMatchedAnchors(tShared, spE, maxOcc)
      trainCoveredPositions(pairs, minLen).eagerCheckpoint()
    } finally spE.unpersist(false)
    rebuildWithout(train, textCol, idCol, covered)
  }

  /** Matched anchor pairs (tid, eid, pe, d) → the distinct TRAIN-side
    * token positions their maximal islands cover: islands as in the
    * scan, but resolved to train coordinates — the alignment offset d
    * is a group key, so pt = pe - d recovers the train-side span bounds
    * exactly. Shared by [[removeContaminated]] and the streaming scrub
    * ([[graft.streaming.StreamingContamination]]) so both transforms
    * remove literally the same positions.
    */
  private[graft] def trainCoveredPositions(pairs: DataFrame,
                                           minLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tid"), col("eid"), col("d")).orderBy(col("pe"))
    pairs.withColumn("_grp", col("pe") - row_number().over(w))
      .groupBy(col("tid"), col("eid"), col("d"), col("_grp"))
      .agg(min(col("pe")).as("_st"), max(col("pe")).as("_mx"))
      .select(col("tid").as("id"),
        explode(sequence(col("_st") - col("d"),
          col("_mx") + minLen - 1 - col("d"))).as("tp"))
      .distinct()
  }

  /** Anchor rows for one side of the contamination scan — exposed so
    * the streaming monitor can persist the EVAL side once (it is static
    * for a training run) and reuse it every micro-batch.
    */
  private[graft] def contaminationAnchorRows(docs: DataFrame,
      textCol: String, idCol: String, minLen: Int,
      verifiable: Boolean): DataFrame =
    shinglePosRows(docs, textCol, idCol, minLen, verifiable)

  /** Exact-substring dedup TRANSFORM at arbitrary length — the applied
    * counterpart of [[exactSubstringSpans]] and the true Lee et al. 2022
    * removal rule: for every maximal cross-document match, the LARGER-id
    * document sheds the matched tokens (so the first document by id
    * keeps each passage exactly once, regardless of length or
    * alignment); with `includeSelf`, a within-document repeat sheds its
    * LATER occurrence (the b-side is pinned to the later copy), so each
    * passage's first appearance survives there too. Same
    * normalized-token-space rebuild as [[removeDupSpans]]; output
    * (idCol, n_tok, clean_text, n_removed).
    */
  def removeExactSubstrings(docs: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id", minLen: Int = 20,
                            maxOcc: Int = 4096,
                            verifiable: Boolean = false,
                            includeSelf: Boolean = false): DataFrame = {
    val ps = exactSubstringPairSpans(docs, textCol, idCol, minLen, maxOcc,
      verifiable, includeSelf)
    val coveredPos = ps.select(col("id_b").as("id"),
        explode(sequence(col("p_b"), col("p_b") + col("len") - 1)).as("tp"))
      .distinct()
    rebuildWithout(docs, textCol, idCol, coveredPos)
  }

  /** Bloom-filter membership dedup — the cross-shard scale path for exact
    * dedup: a shard's fingerprints are folded into an m-bit filter (here
    * k deterministic md5-derived positions per fingerprint, so any engine
    * can rebuild the identical filter); incoming documents whose k
    * positions are all set are flagged as probable duplicates. The bit set
    * is ≤ mBits rows — broadcastable at any corpus size (production-grade
    * alternative: `DataFrameStatFunctions.bloomFilter`, same semantics,
    * opaque bits). `in_build`/`false_pos` are the exact-check validation
    * columns: a production pass has only `flagged`.
    */
  def bloomFlag(build: DataFrame, query: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", k: Int = 5,
                mBits: Int = 8192): DataFrame = {
    def fpOf(df: DataFrame) = df.select(col(idCol).as("id"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
    def positions(df: DataFrame) = df
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("pos", pmod(TextFunctions.md5Hash60(
        concat(col("fp"), lit("_"), col("j").cast("string"))), lit(mBits.toLong)))
    val buildFp = fpOf(build)
    val bits = positions(buildFp).select(col("pos")).distinct()
    val hits = positions(fpOf(query))
      .join(broadcast(bits.withColumn("_set", lit(1))), Seq("pos"), "left")
      .groupBy(col("id")).agg(sum(coalesce(col("_set"), lit(0))).as("_hits"))
    val inBuild = fpOf(query)
      .join(buildFp.select(col("fp")).distinct().withColumn("_b", lit(1)),
        Seq("fp"), "left")
      .select(col("id"), col("_b").isNotNull.as("in_build"))
    hits.select(col("id"), (col("_hits") === k).as("flagged"))
      .join(inBuild, Seq("id"))
      .withColumn("false_pos", col("flagged") && !col("in_build"))
  }

  /** N-gram repetition score per document (the Gopher-family quality
    * signal): duplicated n-gram fraction = 1 − distinct/total. Highly
    * repetitive documents (boilerplate, keyword stuffing, generation
    * loops) score near 1 and are dropped by recipe filters. One pass:
    * shingle rows → per-doc count + count(distinct) hash aggregation.
    */
  def ngramRepetition(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", n: Int = 3,
                      verifiable: Boolean = false): DataFrame =
    shingleRows(docs, textCol, idCol, n, verifiable)
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        countDistinct(col("s")).as("n_distinct"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct") / col("n_ngrams").cast("double"))

  /** Benchmark-contamination detection: flag documents sharing n-grams
    * with an evaluation set (the standard decontamination pass before
    * training). `benchmark` is the eval-set documents; a training doc is
    * contaminated when ≥ `minShared` of its DISTINCT n-grams appear in the
    * benchmark's n-gram set. Join is on 8-byte shingle hashes against the
    * (much smaller, broadcastable) benchmark side — never doc×doc.
    */
  def benchmarkContamination(docs: DataFrame, benchmark: DataFrame,
                             textCol: String = "text",
                             idCol: String = "doc_id", n: Int = 3,
                             minShared: Int = 1,
                             verifiable: Boolean = false): DataFrame = {
    val docSh = distinctShingleRows(docs, textCol, idCol, n, verifiable)
    val benchSh = distinctShingleRows(benchmark, textCol, idCol, n, verifiable)
      .select(col("s")).distinct()
    val shared = docSh.join(broadcast(benchSh), Seq("s"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    docs.select(col(idCol))
      .join(shared.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", col("n_shared") >= minShared)
  }

  /** MinHash signatures at corpus scale: explode distinct shingles to rows,
    * hash once per shingle, then ONE hash aggregation computing all
    * `nHashes` permutation minima (`min(pmod(h*a_i + b_i, p))`). This keeps
    * the hot loop in vectorized whole-stage codegen — the per-document
    * array-lambda variant (VectorFunctions.minhashSignature) builds an
    * `nHashes`-deep expression tree per row and is ~50× slower at corpus
    * scale. Documents with no shingles (shorter than the shingle size)
    * produce no signature — they cannot be near-duplicates.
    *
    * `verifiable = true` swaps the shingle hash from xxhash64 (fastest) to
    * the md5-derived 60-bit hash reduced mod 1e9+7 — same plan shape, still
    * native codegen, but every step is expressible in DuckDB SQL, so the
    * driver's oracle can recompute signatures from the raw documents. The
    * permutation family (a_i·h + b_i mod p) is identical in both modes and
    * overflow-free in checked 64-bit SQL: h < 1e9+7, a_i,b_i < 2^31.
    * Output: (id, sig: array<long>).
    */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleSize: Int = 3,
                        nHashes: Int = 32, verifiable: Boolean = false): DataFrame = {
    val p = VectorFunctions.MinhashPrime
    val sh =
      if (verifiable)
        distinctShingleRows(docs, textCol, idCol, shingleSize, verifiable = true)
          .withColumn("_h", col("s")) // already a mod-1e9+7 shingle hash
      else
        distinctShingleRows(docs, textCol, idCol, shingleSize)
          .withColumn("_h", pmod(xxhash64(col("s")), lit(p)))
    val mins = (0 until nHashes).map { i =>
      val (a, b) = VectorFunctions.minhashCoeffs(i)
      min(pmod(col("_h") * a + b, lit(p))).as(s"_m$i")
    }
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until nHashes).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** Candidate near-dup pairs via MinHash + banded LSH:
    * signatures → band keys → explode → self-join on band → distinct
    * (idA < idB) pairs with estimated Jaccard ≥ `threshold`. Only
    * same-band groups shuffle — never the n² cross product.
    *
    * HOT BUCKETS: a band bucket of B members emits B(B−1)/2 candidate
    * rows, and on duplicate-heavy crawl data the biggest buckets are the
    * near-identical ones — one boilerplate page duplicated 10⁷ times
    * would put ~10¹⁴ rows in one task. Content-based sub-splitting cannot
    * break a bucket of IDENTICAL signatures, so any bucket over
    * `maxBucketSize` degrades to a STAR: members pair only with the
    * bucket's min id (a skew-safe `min` aggregation + linear join,
    * exactly B−1 candidates). Star pairs still verify by estimated
    * Jaccard, and downstream connected-component resolution
    * ([[graft.operators.Clusters]], the q55/q59 path) recovers the
    * duplicate class through the hub — in a hot bucket the members are
    * near-identical, so hub edges pass the threshold. What star reporting
    * gives up is pairs BETWEEN two non-min members that match each other
    * but not the hub — rare inside an over-cap bucket, and a price only
    * paid above the cap. `maxBucketSize <= 0` disables the cap.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", shingleSize: Int = 3,
                      nHashes: Int = 32, nBands: Int = 8,
                      threshold: Double = 0.6,
                      verifiable: Boolean = false,
                      maxBucketSize: Int = 4096): DataFrame = {
    val rowsPerBand = nHashes / nBands
    // (measured: persisting `sigs` here is a net loss — Spark's exchange
    // reuse already shares the aggregation across the three readers)
    val sigs = minhashSignatures(docs, textCol, idCol, shingleSize, nHashes,
      verifiable)
    val banded = sigs.withColumn("band",
      explode(bandKeyExpr(nBands, rowsPerBand, verifiable)))
    // Distinct candidate pairs first (a pair colliding in k bands appears k
    // times), THEN one signature comparison per pair.
    val pairs = bandCandidates(banded, maxBucketSize)
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** LSH band keys over a `sig` column. Verifiable mode: plain-text key
    * (band index + joined minima) so DuckDB can rebuild it; default:
    * xxhash64-compressed key (8-byte shuffle instead of a ~40-char
    * string — the right trade at corpus scale). Shared by the in-memory
    * pair enumeration ([[minhashLshPairs]]) and the persisted index
    * ([[LshIndex]]) so a served lookup buckets EXACTLY like a live one.
    */
  private[graft] def bandKeyExpr(nBands: Int, rowsPerBand: Int,
                                 verifiable: Boolean)
      : org.apache.spark.sql.Column =
    if (verifiable)
      array((0 until nBands).map { b =>
        concat_ws("_", lit(b),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
      }: _*)
    else VectorFunctions.minhashBands(col("sig"), nBands, rowsPerBand)

  /** Payload-carrying capped self-join shared by [[simhashPairs]] and
    * [[embeddingNearDupPairs]]: pair rows on `keyCols` into
    * (id_a, <payload>_a, id_b, <payload>_b) with id_a < id_b; buckets over
    * `maxBucketSize` degrade to min-id star pairs (the [[minhashLshPairs]]
    * cap, except the payload travels with the pair because these callers
    * verify inline instead of joining signatures back). The bucket-min
    * member's payload rides in the same `min(struct(id, payload))`
    * aggregation that finds it — ids are unique, so the struct min IS the
    * min-id row.
    */
  private[graft] def cappedSelfJoin(rows: DataFrame, keyCols: Seq[String],
                                    idCol: String, payloadCol: String,
                                    maxBucketSize: Int): DataFrame = {
    val key = keyCols.map(col)
    val a = rows.select(key :+ col(idCol).as("id_a") :+
      col(payloadCol).as(s"${payloadCol}_a"): _*)
    val b = rows.select(key :+ col(idCol).as("id_b") :+
      col(payloadCol).as(s"${payloadCol}_b"): _*)
    if (maxBucketSize <= 0)
      a.join(b, keyCols).filter(col("id_a") < col("id_b"))
    else {
      val stats = rows.groupBy(key: _*)
        .agg(count(lit(1)).as("_bsz"),
          min(struct(col(idCol).as("id"), col(payloadCol).as("p"))).as("_bmin"))
      val sized = a.join(stats, keyCols)
      val small = sized.filter(col("_bsz") <= maxBucketSize)
        .join(b, keyCols).filter(col("id_a") < col("id_b"))
      val hot = sized.filter(col("_bsz") > maxBucketSize &&
          col("id_a") =!= col("_bmin.id"))
        .select(col("_bmin.id").as("id_a"),
          col("_bmin.p").as(s"${payloadCol}_a"),
          col("id_a").as("id_b"),
          col(s"${payloadCol}_a").as(s"${payloadCol}_b"))
      val cols = Seq(col("id_a"), col(s"${payloadCol}_a"), col("id_b"),
        col(s"${payloadCol}_b"))
      small.select(cols: _*).union(hot.select(cols: _*))
    }
  }

  /** Distinct (id_a < id_b) candidate pairs from exploded (band, id) rows
    * with the hot-bucket star cap described on [[minhashLshPairs]]. Spec
    * hook — DedupSpec counts candidates on a degenerate corpus.
    */
  private[graft] def bandCandidates(banded: DataFrame,
                                    maxBucketSize: Int): DataFrame = {
    val raw =
      if (maxBucketSize <= 0)
        banded.select(col("band"), col("id").as("id_a"))
          .join(banded.select(col("band"), col("id").as("id_b")), Seq("band"))
      else {
        val stats = banded.groupBy(col("band"))
          .agg(count(lit(1)).as("_bsz"), min(col("id")).as("_bmin"))
        val sized = banded.join(stats, Seq("band"))
        val small = sized.filter(col("_bsz") <= maxBucketSize)
        val smallPairs = small.select(col("band"), col("id").as("id_a"))
          .join(small.select(col("band"), col("id").as("id_b")), Seq("band"))
        val hotPairs = sized.filter(col("_bsz") > maxBucketSize)
          .select(col("_bmin").as("id_a"), col("id").as("id_b"))
        smallPairs.select(col("id_a"), col("id_b")).union(hotPairs)
      }
    raw.filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** SimHash values at corpus scale: explode tokens, hash once, ONE hash
    * aggregation computing all 64 bit votes (`sum(±1)` per bit), then
    * reassemble the word. Bit-identical to the per-document array
    * expression (VectorFunctions.simhash) but stays in vectorized codegen
    * instead of building a 64-deep lambda tree per row.
    * Output: (id, sh).
    */
  /** `verifiable = false` (default): bit b's vote is bit b of the token's
    * xxhash64. `verifiable = true`: votes come from two md5-derived 60-bit
    * words (bits 0-31 from the first, 32-63 from the second) — native
    * codegen in Spark AND recomputable by DuckDB, so the oracle can verify
    * the exact simhash words.
    */
  /** Blocker-quality evaluation for the candidate-pair families — the
    * dedup twin of [[Similarity.recallAtK]]: given a blocker's emitted
    * pairs (MinHash LSH bands, SimHash radius, embedding buckets…),
    * score them against EXACT n-gram Jaccard at `threshold` in one
    * report row:
    * `(n_candidates, n_true_candidates, precision, n_qualifying,
    * n_found, recall)` — precision over the emitted set, recall against
    * the exact qualifying pair universe ([[ngramJaccardPairs]], whose
    * PPJoin blocking is lossless, so the denominator is exact without
    * an all-pairs join).
    *
    * Pairs are orientation-normalized and deduped before scoring; a
    * pair referencing a shingle-less or unknown document counts as a
    * candidate (the blocker emitted it) but can never be true. Scale:
    * exact Jaccard runs as a pair-restricted shingle join (each
    * candidate expands only to its own shingles — the verification
    * shape [[ngramJaccardPairs]] itself uses), and the report is two
    * one-row aggregates cross-joined.
    */
  def pairQuality(candidates: DataFrame, docs: DataFrame,
                  threshold: Double, textCol: String = "text",
                  idCol: String = "doc_id", n: Int = 3): DataFrame = {
    // norm feeds THREE consumers (inter, the left-join spine, the truth
    // probe) — materialize once so the caller's blocker pipeline (often a
    // full LSH pass) cannot re-run per consumer; pair lists are small by
    // the blockers' construction. Same reasoning for the shingle table
    // (three consumers) — the ngramJaccardPairs lifecycle.
    val norm = candidates.select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
      .eagerCheckpoint()
    val sh = distinctShingleRows(docs, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = norm
      .join(sh.select(col("id").as("id_a"), col("s")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("_i"))
    val exactJ = norm
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("_i"))
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("_na")),
        Seq("id_a"), "left")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("_nb")),
        Seq("id_b"), "left")
      .withColumn("_j", when(col("_na").isNotNull && col("_nb").isNotNull,
        col("_i") / (col("_na") + col("_nb") - col("_i")).cast("double")))
    val candStats = exactJ.agg(count(lit(1)).as("n_candidates"),
      coalesce(sum(when(col("_j") >= threshold, 1L).otherwise(0L)), lit(0L))
        .as("n_true_candidates"))
    // truth probe over the SAME persisted shingle table — the public
    // entry point would rebuild the identical table a second time
    val truthStats = ngramJaccardPairsFrom(sh, threshold)
      .select(col("id_a"), col("id_b"))
      .join(norm.withColumn("_f", lit(1L)), Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_qualifying"),
        coalesce(sum(coalesce(col("_f"), lit(0L))), lit(0L)).as("n_found"))
    val report = candStats.crossJoin(truthStats)
      .select(col("n_candidates"), col("n_true_candidates"),
        round(when(col("n_candidates") > 0,
          col("n_true_candidates").cast("double") / col("n_candidates")),
          6).as("precision"),
        col("n_qualifying"), col("n_found"),
        round(when(col("n_qualifying") > 0,
          col("n_found").cast("double") / col("n_qualifying")), 6)
          .as("recall"))
      .eagerCheckpoint() // one row; lets sh release eagerly
    report
    } finally sh.unpersist(false)
  }

  def simhashValues(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id",
                    verifiable: Boolean = false): DataFrame = {
    val tok0 = fanOutNarrowScan(docs).select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("_t"))
    // One row per (token, BYTE) with 8 vote columns: the middle ground
    // between a 64× bit fan-out (8× the rows for tiny per-row work) and
    // one 64-column aggregate (whose generated class takes ~10 s to
    // janino-compile). 8 columns × 8-row fan-out keeps both the row count
    // and the codegen class small; shuffle is n_docs × 8 rows of partial
    // sums. Values are bit-identical to the per-bit formulation.
    val byteRows =
      if (verifiable)
        tok0.select(col("id"),
            TextFunctions.md5Hash60(col("_t")).as("_h1"),
            TextFunctions.md5Hash60b(col("_t")).as("_h2"))
          .withColumn("B", explode(sequence(lit(0), lit(7))))
      else
        tok0.select(col("id"), xxhash64(col("_t")).as("_h"))
          .withColumn("B", explode(sequence(lit(0), lit(7))))
    def vote(r: Int): org.apache.spark.sql.Column =
      if (verifiable)
        // bit b = B*8+r lives in word 1 for b<32 (bytes 0-3), word 2 above
        expr(s"(shiftright(CASE WHEN B < 4 THEN _h1 ELSE _h2 END, " +
             s"CASE WHEN B < 4 THEN B * 8 + $r ELSE B * 8 + $r - 32 END) & 1L)" +
             " * 2L - 1L")
      else
        expr(s"(shiftright(_h, B * 8 + $r) & 1L) * 2L - 1L")
    val votes: Seq[org.apache.spark.sql.Column] =
      (0 until 8).map(r => sum(vote(r)).as(s"_v$r"))
    val byteWord = (0 until 8).map(r =>
      when(col(s"_v$r") > 0, expr(s"shiftleft(1L, B * 8 + $r)")).otherwise(0L))
      .reduce(_ + _) // distinct powers of two: + == bitwise OR
    byteRows.groupBy(col("id"), col("B"))
      .agg(votes.head, votes.tail: _*)
      .groupBy(col("id"))
      .agg(sum(byteWord).as("sh"))
  }

  /** SimHash near-dup candidate pairs: 64-bit simhash, split into `nBands`
    * contiguous bit bands; documents sharing ANY band are candidates,
    * verified by full Hamming distance ≤ `maxHamming`.
    *
    * By pigeonhole this blocking is LOSSLESS whenever maxHamming < nBands:
    * two words differing in ≤ maxHamming bits cannot differ in all nBands
    * bands, so every qualifying pair collides in at least one band —
    * unlike the single-prefix scheme this replaces, whose recall was
    * unquantified when differing bits fell inside the prefix. Cost is the
    * standard LSH trade: nBands× the bucket rows, same shuffle shape.
    */
  /** `maxBucketSize` caps hot (band, bucket) groups exactly as in
    * [[minhashLshPairs]] (min-id star; content splitting cannot separate
    * identical simhashes). Above the cap the pigeonhole losslessness
    * guarantee narrows to pairs INVOLVING the bucket hub — on the
    * duplicate-heavy data that creates such buckets, members are
    * near-identical and CC recovers the class; `<= 0` restores the
    * unconditionally-lossless (and unconditionally-quadratic) join.
    */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", nBands: Int = 8,
                   maxHamming: Int = 3,
                   verifiable: Boolean = false,
                   maxBucketSize: Int = 4096): DataFrame = {
    require(64 % nBands == 0, s"nBands must divide 64, got $nBands")
    require(maxHamming < nBands,
      s"lossless blocking needs maxHamming < nBands ($maxHamming >= $nBands)")
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    // (band, bucket) keys: arithmetic-shift then mask — identical in every
    // engine (bits above the mask, where arithmetic vs logical shift
    // differ, are discarded).
    val hashed = simhashValues(docs, textCol, idCol, verifiable)
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .withColumn("bucket",
        expr(s"shiftright(sh, band * $bandBits) & $mask"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Eagerly materialize the (small) verified-pair set, then release the
    // nBands×-exploded signature table NOW — a bare persist() with no
    // unpersist lives in the cache manager for the whole session and
    // evicts later queries' storage. The checkpoint blocks holding the
    // result are context-cleaned once the caller drops the DataFrame.
    try cappedSelfJoin(hashed, Seq("band", "bucket"), "id", "sh",
        maxBucketSize)
      .withColumn("hamming", VectorFunctions.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
      .eagerCheckpoint()
    finally hashed.unpersist(false)
  }

  /** Exact n-gram Jaccard near-dup pairs with PPJoin-style prefix
    * filtering: candidate pairs must share one of each document's
    * ⌊|S|·(1−t)⌋+1 globally-RAREST shingles — lossless for Jaccard ≥ t
    * (two sets with Jaccard ≥ t must intersect within any (1−t)-prefix),
    * so exact verification of just those candidates returns every
    * qualifying pair. This caps the join fan-out at the rare end of the
    * shingle frequency distribution instead of exploding on hot shingles —
    * the difference between linear and quadratic at corpus scale.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 3,
                        threshold: Double = 0.8): DataFrame = {
    // Shuffle 8-byte shingle hashes, not strings (xxhash64 collisions are
    // ~1e-8 at corpus scale and shift one intersection count by one).
    //
    // The shingle table feeds FIVE consumers below (document frequencies,
    // the ranked prefix, sizes, and both sides of the verification join),
    // and column pruning pushes a different ReadSchema into each branch so
    // exchange reuse never fires — unmaterialized, the scan + posexplode +
    // lead-window chain ran 8× per call (measured in the q37 plan: 8 scans
    // of `documents`, 8 Generates, 12 Windows). Persist it once and release
    // after the (small) verified-pair output is materialized — the
    // simhashPairs/embeddingNearDupPairs lifecycle discipline.
    val sh = distinctShingleRows(docs, textCol, idCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ngramJaccardPairsFrom(sh, threshold).eagerCheckpoint()
    finally sh.unpersist(false)
  }

  /** The PPJoin pipeline over an ALREADY-materialized (persisted/
    * checkpointed) shingle table `(id, s)` — shared with [[pairQuality]],
    * which otherwise built the identical table a second time for its
    * truth probe. LAZY: the caller owns materialization and the shingle
    * table's lifetime.
    */
  private def ngramJaccardPairsFrom(sh: DataFrame,
                                    threshold: Double): DataFrame = {
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("_df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("_df"), col("s"))
    val docSize = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val ranked = sh.join(df, Seq("s"))
      .withColumn("_rn", row_number().over(byRarity))
      .withColumn("n_sh", count(lit(1)).over(docSize))
    // ⌊|S|·(1−t)⌋+1 with an epsilon: in doubles 1−0.8 = 0.19999…, so
    // 10·(1−0.8) floors to 1 instead of 2 and the prefix loses the element
    // the losslessness proof needs. Erring long only adds candidates.
    val prefixLen = floor(col("n_sh") * (1.0 - threshold) + 1e-9).cast("int") + 1
    val prefix = ranked.filter(col("_rn") <= prefixLen)
      .select(col("s"), col("id"), col("_rn"), col("n_sh"))
    // PPJoin length + positional filters (both lossless for Jaccard ≥ t,
    // epsilon errs toward keeping):
    //  - length: J(a,b) ≥ t ⇒ t·|S_a| ≤ |S_b| (and symmetric);
    //  - positional: both docs' prefixes are ranked in the SAME global
    //    (df, s) order, so at the FIRST common shingle (ranks r_a, r_b) the
    //    true overlap o ≤ 1 + min(n_a−r_a, n_b−r_b); a qualifying pair has
    //    o ≥ α = ⌈t/(1+t)·(n_a+n_b)⌉, so it survives at that match — keeping
    //    pairs with ANY passing match loses nothing.
    val alpha = ceil((col("n_a") + col("n_b")) * (threshold / (1.0 + threshold))
      - 1e-9)
    val ubound = lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b"))
    val cand = prefix.select(col("s"), col("id").as("id_a"),
        col("_rn").as("r_a"), col("n_sh").as("n_a"))
      .join(prefix.select(col("s"), col("id").as("id_b"),
        col("_rn").as("r_b"), col("n_sh").as("n_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("n_b") >= col("n_a") * threshold - 1e-9 &&
              col("n_a") >= col("n_b") * threshold - 1e-9)
      .filter(ubound >= alpha)
      .select(col("id_a"), col("id_b"))
      .distinct()
    // Exact verification: intersection size via a pair-restricted shingle
    // join (each candidate pair expands only to its own shingles).
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("s")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    pairs
  }

  /** Embedding near-duplicate pairs: LSH-signature blocking + exact cosine
    * verification above `threshold`.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, vecCol: String = "embedding",
                            idCol: String = "vec_id", dim: Int = 64,
                            nBits: Int = 8, threshold: Double = 0.95,
                            maxBucketSize: Int = 4096): DataFrame = {
    // Signatures via the relational row-form (small codegen, partial-agg
    // shuffle of nBits dots per vector), joined back to the vectors.
    val sig = VectorFunctions
      .lshSignatures(embeddings.select(col(idCol), col(vecCol)), nBits, dim,
        idCol, vecCol)
      .join(embeddings.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Same lifecycle discipline as simhashPairs: checkpoint the small
    // verified-pair output eagerly, release the bucketed vectors now.
    // Hot buckets star to the min-id member (identical embeddings →
    // identical signatures; see minhashLshPairs).
    try cappedSelfJoin(sig, Seq("bucket"), "id", "v", maxBucketSize)
      .withColumn("cos", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .eagerCheckpoint()
    finally sig.unpersist(false)
  }
}
