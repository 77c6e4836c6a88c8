package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Supervised document-quality classification — the linear-classifier
  * quality filter of the GPT-3 / Llama data pipelines ("keep pages that
  * look like the curated corpus"), as a multinomial Naive Bayes over
  * hashed unigram features.
  *
  * Why NB and not SGD: the model is two count aggregations — ONE pass
  * over the training corpus builds per-(bucket, class) counts, closed
  * form, no iteration, no driver-side epochs — and at 100 TB the
  * training pass is the cost that matters. The learned weight table is
  * `nBuckets` rows (broadcastable by construction); scoring is one
  * linear pass: hash tokens, broadcast-join weights, DECIMAL-sum per
  * document. Nothing shuffles at corpus grain except the per-doc
  * aggregation of its own token weights.
  *
  * Cross-engine contract (the q104 oracle replays training AND scoring):
  * every per-bucket weight is round(ln-ratio, 6); per-doc scores are
  * DECIMAL sums of those rounded weights plus the rounded log-prior —
  * the stableSum discipline, so scores hash-match exactly.
  */
object Classifier {

  /** A trained NB model: per-bucket weights (log-likelihood ratios,
    * round-6), the unseen-bucket default `w0` (Laplace mass only), the
    * log-prior difference, and the feature-space size.
    */
  final case class NbModel(weights: DataFrame, w0: Double, prior: Double,
                           nBuckets: Int)

  /** Hashed unigram feature rows (id, b) — token array staged as an
    * alias (the SCALE.md in-lambda/CollapseProject discipline).
    */
  private def featureRows(docs: DataFrame, nBuckets: Int, textCol: String,
                          idCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("id"),
        explode(col("_toks")).as("_t"))
      .select(col("id"),
        pmod(TextFunctions.md5Hash60(col("_t")), lit(nBuckets.toLong))
          .cast("int").as("b"))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Train on `docs` where `positive` marks the curated class. Two
    * aggregations: class-priors at doc grain, Laplace-smoothed token
    * counts at (bucket, class) grain. Driver holds four longs and the
    * nBuckets-row weight table stays distributed.
    */
  def trainNb(docs: DataFrame, positive: Column, nBuckets: Int = 4096,
              textCol: String = "text", idCol: String = "doc_id"): NbModel = {
    val labeled = docs.select(col(idCol).as("id"), col(textCol).as("_txt"),
      when(positive, 1L).otherwise(0L).as("y"))
    val Array(nPos, nNeg) = labeled
      .agg(sum(col("y")), sum(lit(1L) - col("y"))).collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    require(nPos > 0 && nNeg > 0,
      s"need both classes in the training set, got pos=$nPos neg=$nNeg")
    val feat = featureRows(labeled.select(col("id"), col("_txt")),
        nBuckets, "_txt", "id")
      .join(labeled.select(col("id"), col("y")), Seq("id"))
    val counts = feat.groupBy(col("b"))
      .agg(sum(col("y")).as("cp"), sum(lit(1L) - col("y")).as("cn"))
      .localCheckpoint(true) // model state: pin one snapshot for totals + weights
    val Array(tPos, tNeg) = counts
      .agg(sum(col("cp")), sum(col("cn"))).collect()(0) match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val weights = counts.select(col("b"),
      round(log((col("cp") + 1).cast("double") / (tPos + nBuckets))
        - log((col("cn") + 1).cast("double") / (tNeg + nBuckets)), 6).as("w"))
    val w0 = round6(math.log(1.0 / (tPos + nBuckets))
      - math.log(1.0 / (tNeg + nBuckets)))
    val prior = round6(math.log(nPos.toDouble / nNeg))
    NbModel(weights, w0, prior, nBuckets)
  }

  /** Score documents: per-doc DECIMAL sum of (broadcast) bucket weights —
    * unseen buckets take the Laplace default — plus the log-prior.
    * Output (idCol, score, pred); token-less documents score the prior.
    */
  def scoreNb(model: NbModel, docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val perDoc = featureRows(docs, model.nBuckets, textCol, idCol)
      .join(broadcast(model.weights), Seq("b"), "left")
      .select(col("id"), coalesce(col("w"), lit(model.w0)).as("w"))
      .groupBy(col("id"))
      .agg(round(sum(round(col("w"), 6).cast("decimal(28,6)"))
        .cast("double"), 6).as("_s"))
    docs.select(col(idCol))
      .join(perDoc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("_s"), lit(0.0)) + model.prior, 6).as("score"))
      .withColumn("pred", col("score") >= 0)
  }
}
