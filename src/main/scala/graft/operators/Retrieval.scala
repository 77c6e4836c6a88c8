package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Bundle

/** Full-text retrieval over the document corpus: an inverted-index term
  * scan scored with Okapi BM25 (Robertson & Spärck Jones probabilistic
  * relevance framework; the Lucene `k1`/`b` parameterization with the
  * non-negative `ln(1 + (N - df + 0.5)/(df + 0.5))` idf). Retrieval is a
  * first-class training-data-pipeline operator — it powers decontamination
  * lookups ("which training docs match this benchmark question"), targeted
  * quality audits, and example mining — and complements the embedding-space
  * ANN family ([[Similarity]]) with exact lexical search.
  *
  * Scale design (the 100 TB path):
  *   - Document length and corpus stats come from a projection
  *     (`tokenCount`) — no explode, no shuffle — and the length rides the
  *     postings rows, so the corpus-sized doc-length table is NEVER joined.
  *   - The corpus is exploded to (doc, token) rows but immediately
  *     semi-joined against the broadcast query-term set: only postings of
  *     query terms are shuffled; everything else dies map-side. The shuffle
  *     volume is the postings-list size of the query terms, not the corpus.
  *   - df aggregation and the term→query map are bounded by the number of
  *     distinct query terms; both broadcast.
  *   - The final per-query ranking reuses [[Similarity.saltedTopK]] — a hot
  *     query term ("the") can put millions of candidate docs under one
  *     query id, and a plain per-query window would sort them in one task.
  *   - [[buildIndex]]/[[bm25ServeTopK]]: the postings/stats tables persist
  *     as a Bundle (build once, serve many — the [[AnnIndex]] principle),
  *     and the serve path runs the IDENTICAL scoring core, so saved and
  *     live results are bit-equal.
  *
  * Determinism contract: per-term scores are rounded to 6 dp and summed as
  * DECIMAL(28,6) (partition-order-independent), ranking orders by the exact
  * decimal score with doc-id tie-break.
  */
object Retrieval {

  /** (query_id, token) distinct query terms — tiny, broadcast everywhere. */
  private def queryTerms(queries: DataFrame, queryIdCol: String,
                         queryTextCol: String): DataFrame =
    queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextFunctions.tokens(col(queryTextCol))).as("token"))
      .distinct()

  /** The postings frame: one row per (doc, token) with tf and the doc
    * length riding along. Token array staged as a multi-referenced alias
    * (length + explode) so the regexp tokenizer runs once per row. When
    * `restrictTo` is set, the broadcast semi-join kills non-query tokens
    * map-side BEFORE the tf aggregation.
    */
  private def postingsOf(docs: DataFrame, textCol: String, idCol: String,
                         restrictTo: Option[DataFrame]): DataFrame = {
    val withDl = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("dl"))
    val exploded = withDl
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("token"))
    restrictTo.fold(exploded)(q =>
        exploded.join(broadcast(q), Seq("token"), "left_semi"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
  }

  /** Corpus stats: ONE row (n_docs, avgdl). avg over exact longs is
    * engine-deterministic (exact integer sum / exact count).
    */
  private def statsOf(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    docs
      .select(TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl").cast("double")).as("avgdl"))

  /** The shared scoring core — the live path and the persisted-index serve
    * path MUST plan the same arithmetic or saved-vs-live results drift.
    * `postings` may be full-vocabulary (saved index) or pre-restricted
    * (live path); the semi-join here makes both cases identical.
    */
  private def scoreAgainstPostings(postings: DataFrame, stats: DataFrame,
                                   qTerms: DataFrame, k: Int,
                                   k1: Double, b: Double): DataFrame = {
    val qTokens = qTerms.select("token").distinct()
    val restricted = postings.join(broadcast(qTokens), Seq("token"), "left_semi")
    // df per query term: one postings row per (doc, token) → count = df.
    val dfTbl = restricted.groupBy(col("token")).agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))

    val scored = restricted
      .join(broadcast(dfTbl), Seq("token"))
      .join(broadcast(qTerms), Seq("token"))
      .crossJoin(broadcast(stats)) // 1-row scalar stats
      .select(col("query_id"), col("doc_id"),
        round(idf * tfNorm, 6).as("s"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("s").cast("decimal(28,6)")).as("_sdec"))

    Similarity.saltedTopK(scored, k,
        ord = Seq(col("_sdec").desc, col("doc_id")),
        idCol = "doc_id", queryIdCol = "query_id")
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("_sdec").cast("double"), 6).as("score"))
  }

  /** BM25 top-k: for each query row, the `k` best-scoring documents.
    *
    * @param docs    corpus with `idCol` (numeric id) and `textCol`
    * @param queries (queryIdCol, queryTextCol) rows; tokenized with the
    *                corpus tokenizer, duplicate terms in one query count once
    * @return (query_id, rank, doc_id, score) — docs with no matching term
    *         are absent (score 0 in classic BM25)
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id",
               queryIdCol: String = "query_id",
               queryTextCol: String = "query_text"): DataFrame = {
    val qTerms = queryTerms(queries, queryIdCol, queryTextCol)
    val postings = postingsOf(docs, textCol, idCol,
      restrictTo = Some(qTerms.select("token").distinct()))
    scoreAgainstPostings(postings, statsOf(docs, textCol, idCol), qTerms,
      k, k1, b)
  }

  /** Convenience wrapper: literal (id, text) query pairs. */
  def bm25TopK(spark: SparkSession, docs: DataFrame,
               queries: Seq[(Int, String)], k: Int): DataFrame = {
    val qdf = spark.createDataFrame(queries).toDF("query_id", "query_text")
    bm25TopK(docs, qdf, k)
  }

  /** Build and persist the full inverted index (postings over the WHOLE
    * vocabulary + corpus stats) as a Bundle — the expensive explode +
    * aggregate runs once; every later query set serves from parquet.
    */
  def buildIndex(docs: DataFrame, dir: String, textCol: String = "text",
                 idCol: String = "doc_id"): Unit =
    Bundle.save(dir,
      Map("postings" -> postingsOf(docs, textCol, idCol, restrictTo = None),
        "stats" -> statsOf(docs, textCol, idCol)),
      Map("kind" -> "bm25-index", "tokenizer" -> "lower-word-runs"))

  /** [[buildIndex]] unless a valid index already sits at `dir` (same
    * manifest) — the reopen-not-recompute idiom of `AnnIndex.ensure` /
    * `Classifier.ensure`. Returns true when a (re)build happened. The
    * manifest pins the REQUEST (kind, tokenizer), not the corpus content:
    * fingerprinting the data would cost the corpus pass the reuse exists
    * to avoid, so callers whose corpus can change must key `dir` by a
    * data stamp (the registry queries use the parquet mtime).
    */
  def ensureIndex(docs: DataFrame, dir: String, textCol: String = "text",
                  idCol: String = "doc_id"): Boolean = {
    val params = Map("kind" -> "bm25-index", "tokenizer" -> "lower-word-runs")
    if (Bundle.isValid(dir, params)) false
    else {
      Bundle.deleteRecursively(dir)
      buildIndex(docs, dir, textCol, idCol)
      true
    }
  }

  /** Serve BM25 from a persisted index — identical scoring core, so the
    * results are bit-equal to [[bm25TopK]] on the same corpus.
    */
  def bm25ServeTopK(spark: SparkSession, dir: String, queries: DataFrame,
                    k: Int, k1: Double = 1.2, b: Double = 0.75,
                    queryIdCol: String = "query_id",
                    queryTextCol: String = "query_text"): DataFrame = {
    val m = Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no BM25 index manifest at $dir"))
    require(m.get("kind").contains("bm25-index"), s"not a BM25 index: $dir")
    val t = Bundle.load(spark, dir)
    scoreAgainstPostings(t("postings"), t("stats"),
      queryTerms(queries, queryIdCol, queryTextCol), k, k1, b)
  }

  /** [[bm25ServeTopK]] with literal query pairs. */
  def bm25ServeTopK(spark: SparkSession, dir: String,
                    queries: Seq[(Int, String)], k: Int): DataFrame =
    bm25ServeTopK(spark, dir,
      spark.createDataFrame(queries).toDF("query_id", "query_text"), k)

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * retrieval combiner: BM25's lexical ranking and the embedding ANN
    * ranking each see documents the other misses, and RRF merges them
    * WITHOUT comparing their incomparable scores: fused(d) =
    * Σ_rankings 1/(c + rank_r(d)).
    *
    * Each input carries (queryIdCol, idCol, rank). Terms are rounded to 6
    * and summed as DECIMAL (order-independent — a plain double sum of the
    * reciprocals would be arrival-order-dependent), ties break to the
    * smaller id, so the fused ranking is cross-engine exact (q105).
    *
    * Scale shape: the inputs are ALREADY top-k rankings, so the candidate
    * set per query is bounded by Σ k_r by construction — the one per-query
    * re-rank window here holds at most that many rows, unlike a raw-score
    * window over an unbounded candidate set (the PlanSpec bounded-window
    * contract the ANN family pins).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60,
              idCol: String = "id",
              queryIdCol: String = "query_id"): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val terms = rankings
      .map(_.select(col(queryIdCol), col(idCol),
        round(lit(1.0) / (lit(c) + col("rank")), 6).as("_t")))
      .reduce(_ unionByName _)
    val fused = terms.groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("_t").cast("decimal(28,6)")).cast("double"), 6)
        .as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Hybrid retrieval SERVED end to end from the two persisted indexes:
    * BM25 top-k from the saved inverted index ([[bm25ServeTopK]]) + ANN
    * top-k from the saved IVF-ADC index ([[AnnIndex.topK]]), fused with
    * [[rrfFuse]]. Each fused row carries the component ranks
    * (`bm25_rank` / `ann_rank`, null when that ranking missed the doc) so
    * the caller can see WHY a document surfaced — the operational serve
    * query of the retrieval family (q105).
    *
    * Serve purity: both component rankings read parquet written at build
    * time — the plan contains no tokenizer-over-corpus, no k-means, no
    * codebook training (PlanSpec pins this: the q105 plan never scans the
    * documents table). The rank-annotation joins re-reference the bounded
    * (≤ k rows/query) component frames, so the double reference re-runs
    * only index-bounded scans, never corpus work.
    */
  def hybridServeTopK(spark: SparkSession, bm25Dir: String, annDir: String,
                      textQueries: DataFrame, vecQueries: DataFrame, k: Int,
                      nProbe: Int = 4, c: Int = 60,
                      queryIdCol: String = "query_id",
                      queryTextCol: String = "query_text",
                      vecQueryIdCol: String = "query_id",
                      vecCol: String = "embedding"): DataFrame = {
    val bm = bm25ServeTopK(spark, bm25Dir, textQueries, k,
        queryIdCol = queryIdCol, queryTextCol = queryTextCol)
      .select(col("query_id"), col("doc_id").as("id"), col("rank"))
    val ann = AnnIndex.topK(spark, annDir, vecQueries, k, nProbe,
        vecCol, vecQueryIdCol)
      .select(col("query_id"), col("id"), col("rank"))
    rrfFuse(Seq(bm, ann), k, c)
      .join(bm.withColumnRenamed("rank", "bm25_rank"),
        Seq("query_id", "id"), "left")
      .join(ann.withColumnRenamed("rank", "ann_rank"),
        Seq("query_id", "id"), "left")
      .select(col("query_id"), col("rank"), col("id"), col("rrf"),
        col("bm25_rank"), col("ann_rank"))
  }
}
