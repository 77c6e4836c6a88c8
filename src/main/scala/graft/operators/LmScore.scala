package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Language-model perplexity scoring and head/middle/tail bucketing — the
  * CCNet corpus-filtering pass (Wenzek et al. 2020): score every document
  * with an n-gram LM trained on the corpus (CCNet uses KenLM on Wikipedia;
  * here an add-α-smoothed unigram LM trained on the corpus itself, which
  * keeps the engine dependency-free and the oracle replayable), then split
  * the corpus into perplexity terciles. "Head" (lowest perplexity) is the
  * cleanest slice; "tail" is the usual discard candidate.
  *
  * Scale design (the 100 TB path):
  *   - Training is one explode + one count aggregation (map-side combined),
  *     a top-V `TakeOrderedAndProject` for the vocabulary, and two 1-row
  *     scalar aggregates. The vocabulary (≤ `vocabSize` rows) broadcasts.
  *   - Scoring is linear: explode, broadcast-join the vocabulary, one
  *     groupBy on the doc id. No corpus-sized shuffle except the per-doc
  *     aggregation the result grain requires.
  *   - Tercile thresholds come from a deterministic hash-ordered sample of
  *     exactly `min(n, sampleN)` docs (`TakeOrderedAndProject` again, the
  *     q57 md5-survival idiom) — CCNet likewise trains its percentile
  *     cutoffs on a sample, and this keeps the bucketing free of any
  *     corpus-wide unpartitioned window. Bucket assignment is then a
  *     broadcast compare against two scalars.
  *
  * Determinism contract: per-token negative log-probs are rounded to 6 dp
  * and DECIMAL-summed; log-perplexities are rounded to 6 dp; thresholds
  * are exact order statistics of the rounded sample values.
  */
object LmScore {

  /** Trained unigram LM: broadcastable (token, cnt) vocabulary plus the
    * scalar stats needed for the smoothed probability — total token count
    * `t` and actual vocabulary size `v`. Any token outside the vocabulary
    * scores as the single UNK class (count 0).
    */
  final case class Unigram(vocab: DataFrame, stats: DataFrame, alpha: Double)

  /** Train the add-α unigram LM: top-`vocabSize` tokens by (count desc,
    * token) with p(w) = (c(w) + α) / (t + α·(v + 1)) — the `+ 1` is the
    * UNK class every out-of-vocabulary token collapses to.
    */
  def trainUnigram(docs: DataFrame, vocabSize: Int = 1024,
                   alpha: Double = 0.5, textCol: String = "text",
                   idCol: String = "doc_id"): Unigram = {
    val cnt = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val vocab = cnt.orderBy(col("c").desc, col("token")).limit(vocabSize)
    val stats = cnt.agg(sum(col("c")).as("t"))
      .crossJoin(vocab.agg(count(lit(1)).as("v")))
    Unigram(vocab, stats, alpha)
  }

  /** Per-document log-perplexity under `lm`: (doc_id, n_tokens, log_ppl)
    * with log_ppl = mean per-token negative log-prob. Zero-token documents
    * are absent (their perplexity is undefined).
    */
  def logPerplexity(docs: DataFrame, lm: Unigram,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val denom = col("t") + lit(lm.alpha) * (col("v") + lit(1))
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .join(broadcast(lm.vocab), Seq("token"), "left_outer")
      .crossJoin(broadcast(lm.stats)) // 1-row (t, v) scalars
      .select(col("doc_id"),
        round(-log((coalesce(col("c"), lit(0L)) + lit(lm.alpha)) / denom), 6)
          .as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nll").cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("log_ppl"))
  }

  /** Persist a trained LM as a Bundle (vocab + stats parquet, manifest
    * with the smoothing/vocab parameters) — train once, score many runs;
    * the [[graft.operators.AnnIndex]] serve-vs-rebuild principle applied
    * to the LM.
    */
  def save(lm: Unigram, dir: String, vocabSize: Int): Unit =
    graft.sources.Bundle.save(dir,
      Map("vocab" -> lm.vocab, "stats" -> lm.stats),
      Map("kind" -> "unigram-lm", "alpha" -> lm.alpha.toString,
        "vocabSize" -> vocabSize.toString))

  /** Load a persisted LM; fails if no manifest (crash mid-save → invalid). */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Unigram = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no LM manifest at $dir"))
    val t = graft.sources.Bundle.load(spark, dir)
    Unigram(t("vocab"), t("stats"), m("alpha").toDouble)
  }

  /** Reuse the LM at `dir` when its manifest matches; otherwise retrain
    * from `docs` and overwrite (T2 parameter invalidation). Returns
    * (lm, retrained).
    */
  def ensure(docs: DataFrame, dir: String, vocabSize: Int = 1024,
             alpha: Double = 0.5, textCol: String = "text",
             idCol: String = "doc_id"): (Unigram, Boolean) = {
    val params = Map("kind" -> "unigram-lm", "alpha" -> alpha.toString,
      "vocabSize" -> vocabSize.toString)
    if (graft.sources.Bundle.isValid(dir, params))
      (load(docs.sparkSession, dir), false)
    else {
      graft.sources.Bundle.deleteRecursively(dir)
      val lm = trainUnigram(docs, vocabSize, alpha, textCol, idCol)
      save(lm, dir, vocabSize)
      // serve from the SAVED tables so repeated runs read parquet, not
      // re-aggregate the corpus through the live lineage
      (load(docs.sparkSession, dir), true)
    }
  }

  /** CCNet head/middle/tail split: tercile thresholds from a deterministic
    * sample of `sampleN` docs (smallest md5-derived hash of `salt||doc_id`,
    * doc-id tie-break), then every doc bucketed by comparing its rounded
    * log-perplexity against the two scalar cutoffs. Returns
    * (doc_id, n_tokens, log_ppl, bucket).
    */
  def perplexityBuckets(docs: DataFrame, lm: Unigram, sampleN: Int = 256,
                        salt: String = "ppl_", textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    // Scored twice below (threshold sample + full bucketing): pin it once.
    val scored = logPerplexity(docs, lm, textCol, idCol).localCheckpoint(true)
    val sample = scored
      .orderBy(TextFunctions.md5Hash60(
          concat(lit(salt), col("doc_id").cast("string"))),
        col("doc_id"))
      .limit(sampleN)
      .select(col("log_ppl"))
      .collect().map(_.getDouble(0)).sorted
    val n = sample.length
    require(n > 0, "perplexityBuckets: empty corpus")
    // ceil(j·n/3), 1-based — the value AT the tercile boundary is inclusive.
    val t1 = sample((n + 2) / 3 - 1)
    val t2 = sample((2 * n + 2) / 3 - 1)
    scored.withColumn("bucket",
      when(col("log_ppl") <= t1, lit("head"))
        .when(col("log_ppl") <= t2, lit("middle"))
        .otherwise(lit("tail")))
  }
}
