package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw document by how much it looks like a target
  * distribution, using hashed n-gram features. Two bag-of-ngram models
  * (unigrams + bigrams hashed into `nBuckets` buckets) are estimated — one
  * over the target slice, one over the full raw corpus — and a document's
  * importance is the mean per-feature log-likelihood ratio
  * `ln p_target(b) − ln p_raw(b)`. Selecting the top-weight documents
  * re-focuses a web-scale corpus on the target domain.
  *
  * Scale design (the 100 TB path):
  *   - Both models come from ONE pass over the exploded features: a single
  *     groupBy on the hashed bucket id with a conditional count for the
  *     target slice — `nBuckets` output rows, map-side combined, no skew
  *     (bucket ids are md5-uniform).
  *   - The per-bucket log-ratio table (≤ `nBuckets` rows) broadcasts; doc
  *     scoring is explode → broadcast join → one groupBy on the doc id.
  *   - Selection is a global top-n by (weight desc, id) —
  *     `TakeOrderedAndProject`, never a full sort.
  *
  * Feature hashing uses the md5-derived 60-bit hash so an external engine
  * can replay bucket assignment exactly (the q57 idiom). Determinism: per
  * bucket log-ratios rounded to 6 dp; per-doc means DECIMAL-summed then
  * rounded.
  */
object Importance {

  /** Exploded hashed-feature rows (doc_id, is_t, b) — the md5-heavy pass
    * both model estimation and doc scoring consume. Compute ONCE.
    *
    * Staged projections, not one inline expression: the token array is a
    * multi-referenced alias (concat operand + shingle source), so it
    * survives CollapseProject and the regexp tokenizer runs once per row —
    * an inline `tokens(text)` here re-evaluates per reference and the
    * in-lambda `slice` re-derives it per bigram (the round-7 8× hazard).
    */
  def featureRows(docs: DataFrame, targetPred: Column, nBuckets: Int,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        when(targetPred, lit(1L)).otherwise(lit(0L)).as("is_t"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("is_t"),
        concat(col("_toks"),
          TextFunctions.shinglesOfTokens(col("_toks"), 2)).as("_f"))
      .select(col("doc_id"), col("is_t"),
        explode(transform(col("_f"),
          f => pmod(TextFunctions.md5Hash60(f), lit(nBuckets.toLong)))).as("b"))

  /** Per-bucket importance weights from pre-exploded feature rows: (b, w)
    * with w = round(ln((c_t+α)/(t_t+α·B)) − ln((c_r+α)/(t_r+α·B)), 6).
    * Buckets never seen in the raw corpus are absent — no document can
    * reference them.
    */
  def bucketLogRatiosFromFeatures(fb: DataFrame, nBuckets: Int = 256,
                                  alpha: Double = 0.5): DataFrame = {
    val perBucket = fb.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"), sum(col("is_t")).as("ct"))
    val totals = perBucket.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val aB = lit(alpha) * nBuckets
    perBucket.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log((col("ct") + lit(alpha)) / (col("tt") + aB)) -
              log((col("cr") + lit(alpha)) / (col("tr") + aB)), 6).as("w"))
  }

  /** Convenience single-pass form of [[bucketLogRatiosFromFeatures]]. */
  def bucketLogRatios(docs: DataFrame, targetPred: Column,
                      nBuckets: Int = 256, alpha: Double = 0.5,
                      textCol: String = "text"): DataFrame =
    bucketLogRatiosFromFeatures(
      featureRows(docs, targetPred, nBuckets, textCol), nBuckets, alpha)

  /** Per-document importance from pre-exploded feature rows:
    * (doc_id, n_feat, importance) with importance = mean bucket log-ratio
    * over the doc's hashed features. Docs with no features are absent.
    */
  def importanceFromFeatures(fb: DataFrame, logRatios: DataFrame): DataFrame =
    fb.join(broadcast(logRatios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"),
        round(sum(col("w").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("importance"))

  /** Convenience form of [[importanceFromFeatures]] (re-explodes). */
  def importanceWeights(docs: DataFrame, logRatios: DataFrame,
                        nBuckets: Int = 256, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame =
    importanceFromFeatures(
      featureRows(docs, lit(false), nBuckets, textCol, idCol), logRatios)

  /** Persist trained DSIR bucket weights as a Bundle — the importance
    * model is ≤ nBuckets rows; training (the corpus-wide feature pass) is
    * the expensive part, so estimate once and score many corpora/runs.
    * `targetTag` documents what the target slice was (manifest-only).
    */
  def saveWeights(logRatios: DataFrame, dir: String, nBuckets: Int,
                  alpha: Double, targetTag: String): Unit =
    graft.sources.Bundle.save(dir, Map("weights" -> logRatios),
      Map("kind" -> "dsir-weights", "nBuckets" -> nBuckets.toString,
        "alpha" -> alpha.toString, "target" -> targetTag))

  /** Load persisted DSIR weights (and the bucket count they were hashed
    * with — scoring MUST reuse it or buckets won't line up).
    */
  def loadWeights(spark: org.apache.spark.sql.SparkSession,
                  dir: String): (DataFrame, Int) = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no DSIR manifest at $dir"))
    (graft.sources.Bundle.load(spark, dir)("weights"), m("nBuckets").toInt)
  }

  /** DSIR selection: the `n` raw documents most like the target slice
    * (importance desc, doc-id tie-break). The paper resamples with Gumbel
    * noise; the deterministic top-n is the reproducible variant (noise-free
    * selection is the λ→∞ limit) and keeps the operator oracle-checkable.
    *
    * The exploded feature rows (the md5-over-every-ngram pass, by far the
    * dominant cost) are computed ONCE and pinned; model estimation and doc
    * scoring both read the pinned rows — 24 bytes per feature, cheaper than
    * re-hashing the corpus and far smaller than the text it came from.
    */
  def dsirSelect(docs: DataFrame, targetPred: Column, n: Int,
                 nBuckets: Int = 256, alpha: Double = 0.5,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val fb = featureRows(docs, targetPred, nBuckets, textCol, idCol)
      .localCheckpoint(true)
    val lam = bucketLogRatiosFromFeatures(fb, nBuckets, alpha)
    importanceFromFeatures(fb, lam)
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(n)
  }
}
