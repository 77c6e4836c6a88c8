package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** NB quality classifier: the q104 oracle pins the exact arithmetic; here
  * we pin that the model actually CLASSIFIES (the synthetic corpus's
  * language split is lexically separable, so holdout accuracy must be far
  * above the base rate), plus the edge contracts.
  */
class ClassifierSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("separable planted corpus: holdout accuracy ~1.0 despite shared " +
       "background vocabulary") {
    // the synthetic documents table reuses ONE vocabulary across langs (its
    // lang column is not lexically separable — q104 pins arithmetic, not
    // skill), so plant class-specific markers over a shared background
    import spark.implicits._
    val planted = (0L until 400L).map { i =>
      val curated = i % 2 == 0
      val marker = if (curated) "citation reviewed methodology"
                   else "click subscribe sponsored"
      (i, s"the quick data table row value $marker batch $i", curated)
    }.toDF("doc_id", "text", "truth")
    val model = Classifier.trainNb(planted.filter(col("doc_id") < 320),
      positive = col("truth"))
    val holdout = planted.filter(col("doc_id") >= 320)
    val scored = Classifier.scoreNb(model, holdout)
      .join(holdout.select(col("doc_id"), col("truth")), Seq("doc_id"))
    val n = scored.count().toDouble
    val correct = scored.filter(col("pred") === col("truth")).count().toDouble
    assert(correct / n >= 0.95,
      s"NB must separate planted classes, accuracy ${correct / n}")
  }

  test("on the REAL corpus the model trains, scores every doc, and stays " +
       "deterministic") {
    val model = Classifier.trainNb(docs.filter(col("doc_id") % 5 < 4),
      positive = col("lang") === "en")
    def run() = Classifier.scoreNb(model, docs.filter(col("doc_id") % 5 === 4))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    val a = run()
    assert(a.size == docs.filter(col("doc_id") % 5 === 4).count())
    assert(a == run(), "scores must be reproducible")
  }

  test("single-class training set is rejected; token-less doc scores the " +
       "prior") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Classifier.trainNb(docs.filter(col("lang") === "en"),
        positive = col("lang") === "en")
    }
    val model = Classifier.trainNb(docs, positive = col("lang") === "en")
    val empty = Seq((999999L, "")).toDF("doc_id", "text")
    val r = Classifier.scoreNb(model, empty).collect()(0)
    assert(r.getAs[Double]("score") == model.prior,
      "a token-less document must score exactly the log-prior")
  }

  test("persisted model scores bit-identically to live; ensure reuses on " +
       "match and retrains on parameter change") {
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString +
      "/m"
    val train = docs.filter(col("doc_id") % 5 < 4)
    val hold = docs.filter(col("doc_id") % 5 === 4)
    val live = Classifier.trainNb(train, positive = col("lang") === "en",
      nBuckets = 512)
    Classifier.save(live, dir, labelTag = "lang=en")
    val loaded = Classifier.load(spark, dir)
    assert(loaded.w0 == live.w0 && loaded.prior == live.prior &&
      loaded.nBuckets == live.nBuckets)
    def scores(m: Classifier.NbModel) = Classifier.scoreNb(m, hold)
      .collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scores(loaded) == scores(live),
      "saved-model scoring diverged from live training")
    // matching manifest → reuse; nBuckets change → invalidate + retrain
    val (_, retrained1) = Classifier.ensure(train, dir,
      positive = col("lang") === "en", nBuckets = 512, labelTag = "lang=en")
    assert(!retrained1, "matching manifest must reuse, not retrain")
    val (m2, retrained2) = Classifier.ensure(train, dir,
      positive = col("lang") === "en", nBuckets = 256, labelTag = "lang=en")
    assert(retrained2, "nBuckets change must invalidate and retrain")
    assert(m2.nBuckets == 256)
    // label-definition change → retrain too
    val (_, retrained3) = Classifier.ensure(train, dir,
      positive = col("source") === "src0", nBuckets = 256,
      labelTag = "source=src0")
    assert(retrained3, "label change must invalidate and retrain")
  }
}
