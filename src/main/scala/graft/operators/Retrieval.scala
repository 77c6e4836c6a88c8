package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

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
  *
  * Determinism contract: per-term scores are rounded to 6 dp and summed as
  * DECIMAL(28,6) (partition-order-independent), ranking orders by the exact
  * decimal score with doc-id tie-break.
  */
object Retrieval {

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
    // (query_id, token): distinct terms per query; tiny → broadcast.
    val qTerms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(TextFunctions.tokens(col(queryTextCol))).as("token"))
      .distinct()
    val qTokens = qTerms.select("token").distinct()

    // Token array staged as a multi-referenced alias (length + explode):
    // survives CollapseProject, so the regexp tokenizer runs once per row.
    // Doc length rides along into the postings so the full-corpus length
    // table never has to be joined back.
    val withDl = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("dl"))

    // Corpus stats: one row (n_docs, avgdl). avg over exact longs is
    // engine-deterministic (exact integer sum / exact count).
    val stats = withDl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))

    // Postings restricted to query terms BEFORE the tf aggregation: the
    // semi-join against the broadcast term set kills non-query tokens
    // map-side, so only matching (doc, token) pairs shuffle.
    val postings = withDl
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("token"))
      .join(broadcast(qTokens), Seq("token"), "left_semi")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // df per query term: postings are one row per (doc, token), so a count
    // per token is the document frequency. Bounded by |query terms|.
    val dfTbl = postings.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))

    val scored = postings
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

  /** Convenience wrapper: literal (id, text) query pairs. */
  def bm25TopK(spark: SparkSession, docs: DataFrame,
               queries: Seq[(Int, String)], k: Int): DataFrame = {
    val qdf = spark.createDataFrame(queries).toDF("query_id", "query_text")
    bm25TopK(docs, qdf, k)
  }
}
