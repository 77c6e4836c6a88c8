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

  /** Train on `docs` where `positive` marks the curated class. ONE job
    * over the training corpus: `posexplode_outer` keeps a row for
    * token-less documents (null position) and marks each document's first
    * row (position null-or-0) as the doc-grain counter, so the class
    * priors ride the same (bucket, class)-count aggregation instead of a
    * second corpus scan. Driver holds four longs from one collect over
    * the pinned nBuckets-row frame; the weight table stays distributed.
    */
  def trainNb(docs: DataFrame, positive: Column, nBuckets: Int = 4096,
              textCol: String = "text", idCol: String = "doc_id"): NbModel = {
    val isDoc = col("p").isNull || col("p") === 0
    val isTok = col("_t").isNotNull
    val pinned = docs
      .select(when(positive, 1L).otherwise(0L).as("y"),
        posexplode_outer(TextFunctions.tokens(col(textCol)))
          .as(Seq("p", "_t")))
      .select(
        when(isTok, pmod(TextFunctions.md5Hash60(col("_t")),
          lit(nBuckets.toLong)).cast("int")).as("b"),
        when(isTok, col("y")).otherwise(0L).as("ty"),
        when(isTok, lit(1L) - col("y")).otherwise(0L).as("tn"),
        when(isDoc, col("y")).otherwise(0L).as("dy"),
        when(isDoc, lit(1L) - col("y")).otherwise(0L).as("dn"))
      .groupBy(col("b")) // token-less docs land on the null-b row
      .agg(sum(col("ty")).as("cp"), sum(col("tn")).as("cn"),
        sum(col("dy")).as("dp"), sum(col("dn")).as("dn"))
      .localCheckpoint(true) // model state: pin one snapshot
    val t = pinned
      .agg(sum(col("cp")), sum(col("cn")), sum(col("dp")), sum(col("dn")))
      .collect()(0)
    val (tPos, tNeg) = (t.getLong(0), t.getLong(1))
    val (nPos, nNeg) = (t.getLong(2), t.getLong(3))
    require(nPos > 0 && nNeg > 0,
      s"need both classes in the training set, got pos=$nPos neg=$nNeg")
    val weights = pinned.filter(col("b").isNotNull).select(col("b"),
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

  // ------------------------------------------------------------ persistence

  /** Persist a trained model as a Bundle: the nBuckets-row weight table
    * plus a 1-row meta table for the data-derived scalars (w0, prior).
    * The manifest carries only the REQUEST parameters (nBuckets, label
    * tag) — [[ensure]] compares those; w0/prior are training outputs and
    * live in the meta table, not the invalidation key. A production
    * quality filter trains once and serves for months — the
    * [[LmScore.save]] / [[graft.operators.AnnIndex]] reopen-not-recompute
    * idiom (trx azav.py:300-302) applied to the classifier.
    */
  def save(model: NbModel, dir: String, labelTag: String): Unit = {
    val spark = model.weights.sparkSession
    val meta = spark.createDataFrame(
        Seq((model.w0, model.prior, model.nBuckets)))
      .toDF("w0", "prior", "nBuckets")
    graft.sources.Bundle.save(dir,
      Map("weights" -> model.weights, "meta" -> meta),
      Map("kind" -> "nb-quality", "nBuckets" -> model.nBuckets.toString,
        "label" -> labelTag))
  }

  /** Load a persisted model; fails if no manifest (crash mid-save →
    * invalid, the Bundle manifest-written-last contract).
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): NbModel = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no NB model manifest at $dir"))
    require(m.get("kind").contains("nb-quality"), s"not an NB model: $dir")
    val t = graft.sources.Bundle.load(spark, dir)
    val meta = t("meta").collect()(0)
    NbModel(t("weights"), meta.getAs[Double]("w0"),
      meta.getAs[Double]("prior"), meta.getAs[Int]("nBuckets"))
  }

  /** Reuse the model at `dir` when its manifest matches (same nBuckets,
    * same label tag); otherwise retrain from `docs` and overwrite (T2
    * parameter invalidation). Returns (model, retrained). The reused
    * model scores bit-identically to the live one: weights were written
    * round-6 and scoring re-rounds per term, so parquet round-tripping
    * cannot move a score (spec-pinned).
    */
  def ensure(docs: DataFrame, dir: String, positive: Column,
             nBuckets: Int = 4096, labelTag: String = "",
             textCol: String = "text",
             idCol: String = "doc_id"): (NbModel, Boolean) = {
    val tag = if (labelTag.nonEmpty) labelTag else positive.toString
    val params = Map("kind" -> "nb-quality", "nBuckets" -> nBuckets.toString,
      "label" -> tag)
    if (graft.sources.Bundle.isValid(dir, params))
      (load(docs.sparkSession, dir), false)
    else {
      graft.sources.Bundle.deleteRecursively(dir)
      val model = trainNb(docs, positive, nBuckets, textCol, idCol)
      save(model, dir, tag)
      // serve from the SAVED tables so repeated runs read parquet, not
      // re-aggregate the corpus through the live lineage
      (load(docs.sparkSession, dir), true)
    }
  }
}
