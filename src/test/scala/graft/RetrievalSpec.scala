package graft

import org.apache.spark.sql.functions._
import graft.operators.{Importance, LmScore, Retrieval}

/** BM25 retrieval, CCNet perplexity bucketing, DSIR importance selection. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- BM25

  test("bm25TopK matches the hand-computed Okapi formula") {
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "hash join table"),
      (3L, "the quick fox")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, docs, Seq(0 -> "spark join"), k = 10)
      .orderBy("query_id", "rank").collect()

    def idf(n: Long, df: Long): Double =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def tfn(tf: Long, dl: Long, avgdl: Double): Double =
      tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // N=3, avgdl=3; df(spark)=1, df(join)=2
    val d1 = r6(idf(3, 1) * tfn(2, 3, 3.0)) + r6(idf(3, 2) * tfn(1, 3, 3.0))
    val d2 = r6(idf(3, 2) * tfn(1, 3, 3.0))

    assert(out.length == 2) // d3 matches no term
    assert(out(0).getAs[Long]("doc_id") == 1L)
    assert(out(0).getAs[Int]("rank") == 1)
    assert(approx(out(0).getAs[Double]("score"), r6(d1), 1e-9))
    assert(out(1).getAs[Long]("doc_id") == 2L)
    assert(approx(out(1).getAs[Double]("score"), r6(d2), 1e-9))
  }

  test("bm25TopK: per-query isolation, k cap, and doc-id tie-break") {
    val docs = (1L to 20L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(spark, docs,
      Seq(0 -> "alpha", 1 -> "beta", 2 -> "missingterm"), k = 5).collect()
    // identical docs → identical scores → rank order = doc_id order
    val q0 = out.filter(_.getAs[Int]("query_id") == 0).sortBy(_.getAs[Int]("rank"))
    assert(q0.map(_.getAs[Long]("doc_id")).toSeq == (1L to 5L))
    assert(out.filter(_.getAs[Int]("query_id") == 1).length == 5)
    assert(!out.exists(_.getAs[Int]("query_id") == 2)) // no postings → absent
  }

  test("bm25 served from a persisted index is bit-identical to live") {
    val docs = Seq(
      (1L, "spark spark join"), (2L, "hash join table"),
      (3L, "the quick fox"), (4L, "join the spark table")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25ix").toString + "/ix"
    Retrieval.buildIndex(docs, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toMap
    val qs = Seq(0 -> "spark join", 1 -> "table")
    val live = key(Retrieval.bm25TopK(spark, docs, qs, k = 10))
    val served = key(Retrieval.bm25ServeTopK(spark, dir, qs, k = 10))
    assert(served == live, "served-from-index BM25 diverged from live")
    // a different query set serves from the SAME index (no rebuild)
    val more = key(Retrieval.bm25ServeTopK(spark, dir,
      Seq(7 -> "quick fox"), k = 5))
    assert(more.nonEmpty && more.keySet.forall(_._1 == 7))

    // ensureIndex: reuses the valid on-disk index (serving unchanged),
    // rebuilds a fresh directory
    assert(!Retrieval.ensureIndex(docs, dir),
      "ensureIndex must reuse a valid index")
    assert(key(Retrieval.bm25ServeTopK(spark, dir, qs, k = 10)) == live)
    val dir2 = java.nio.file.Files.createTempDirectory("bm25ix2").toString +
      "/ix"
    assert(Retrieval.ensureIndex(docs, dir2),
      "ensureIndex must build into an empty directory")
    assert(key(Retrieval.bm25ServeTopK(spark, dir2, qs, k = 10)) == live)
  }

  // --------------------------------------------------- CCNet perplexity

  test("logPerplexity applies add-alpha smoothing with an UNK class") {
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val lm = LmScore.trainUnigram(docs, vocabSize = 2, alpha = 0.5)
    val m = LmScore.logPerplexity(docs, lm).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    // counts: a=3 b=2 c=1; vocab(2) = {a, b}; t=6, v=2, denom=6+0.5*3=7.5
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nA = r6(-math.log(3.5 / 7.5))
    val nB = r6(-math.log(2.5 / 7.5))
    val nC = r6(-math.log(0.5 / 7.5)) // OOV → UNK mass
    assert(m(1L).getAs[Long]("n_tokens") == 3L)
    assert(approx(m(1L).getAs[Double]("log_ppl"), r6((2 * nA + nB) / 3), 1e-9))
    assert(approx(m(2L).getAs[Double]("log_ppl"), r6((nA + nB + nC) / 3), 1e-9))
  }

  test("perplexityBuckets splits terciles: common→head, rare→tail") {
    // 3 docs per class; token frequency a >> b >> c drives the perplexity.
    val docs = (0 until 9).map { i =>
      val tok = Seq("a", "b", "c")(i % 3)
      (i.toLong, Seq.fill(4)(tok).mkString(" "))
    }.toDF("doc_id", "text")
    // skew corpus counts: add weight docs so counts differ (a=28,b=16,c=12)
    val weighted = docs.union(Seq(
      (100L, Seq.fill(16)("a").mkString(" ")),
      (101L, Seq.fill(4)("b").mkString(" "))).toDF("doc_id", "text"))
    val lm = LmScore.trainUnigram(weighted, vocabSize = 8, alpha = 0.5)
    val out = LmScore.perplexityBuckets(weighted, lm, sampleN = 100)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    // p(a) > p(b) > p(c) → ppl(a-doc) < ppl(b-doc) < ppl(c-doc)
    assert(Seq(0L, 3L, 6L, 100L).forall(out(_) == "head"))
    assert(Seq(1L, 4L, 7L, 101L).forall(out(_) == "middle"))
    assert(Seq(2L, 5L, 8L).forall(out(_) == "tail"))
  }

  // ------------------------------------------------------------- DSIR

  test("dsirSelect ranks target-like docs first") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "alpha beta gamma", "en"),
      (3L, "gamma delta gamma delta", "de"),
      (4L, "alpha beta alpha", "de"), // de doc that LOOKS like en
      (5L, "delta gamma delta", "de")
    ).toDF("doc_id", "text", "lang")
    val top = Importance.dsirSelect(docs, col("lang") === "en", n = 3)
      .collect()
    val ids = top.map(_.getAs[Long]("doc_id")).toSet
    // the en-looking docs (1, 4) must beat the pure-de docs (3, 5)
    assert(ids.contains(1L) && ids.contains(4L))
    assert(!ids.contains(3L) && !ids.contains(5L))
    // n_feat = tokens + bigrams
    val m = top.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_feat")).toMap
    assert(m(1L) == 4 + 3)
  }

  test("persisted LM scores identically to the live one; ensure() reuses " +
       "on match and retrains on parameter change") {
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "b c c a")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm").toString + "/lm"
    val (lm1, trained1) = LmScore.ensure(docs, dir, vocabSize = 2, alpha = 0.5)
    assert(trained1, "first ensure must train")
    val live = LmScore.trainUnigram(docs, vocabSize = 2, alpha = 0.5)
    def scores(lm: LmScore.Unigram) = LmScore.logPerplexity(docs, lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(lm1) == scores(live),
      "saved-LM scoring diverged from live training")
    val (_, trained2) = LmScore.ensure(docs, dir, vocabSize = 2, alpha = 0.5)
    assert(!trained2, "matching manifest must reuse, not retrain")
    val (_, trained3) = LmScore.ensure(docs, dir, vocabSize = 3, alpha = 0.5)
    assert(trained3, "parameter change must invalidate and retrain")
  }

  test("persisted DSIR weights reproduce live importance scores") {
    val docs = Seq(
      (1L, "alpha beta alpha", "en"), (2L, "gamma delta", "de"),
      (3L, "alpha gamma", "en")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString + "/w"
    val lam = Importance.bucketLogRatios(docs, col("lang") === "en",
      nBuckets = 32)
    Importance.saveWeights(lam, dir, nBuckets = 32, alpha = 0.5,
      targetTag = "lang=en")
    val (loaded, nb) = Importance.loadWeights(spark, dir)
    assert(nb == 32)
    def imp(w: org.apache.spark.sql.DataFrame) =
      Importance.importanceWeights(docs, w, nBuckets = 32)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(imp(loaded) == imp(lam),
      "persisted weights diverged from the live estimate")
  }

  test("bucketLogRatios: bounded rows, zero-sum sanity") {
    val docs = Seq(
      (1L, "alpha beta", "en"), (2L, "gamma delta", "de")
    ).toDF("doc_id", "text", "lang")
    val lam = Importance.bucketLogRatios(docs, col("lang") === "en",
      nBuckets = 16).collect()
    assert(lam.length <= 16)
    assert(lam.forall(r => !r.getAs[Double]("w").isNaN))
    // en-only feature buckets weigh positive, de-only negative
    val ws = lam.map(_.getAs[Double]("w"))
    assert(ws.exists(_ > 0) && ws.exists(_ < 0))
  }

  // ------------------------------------------------- reciprocal-rank fusion

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse matches the hand-computed RRF formula") {
    // ranking A: docs 1,2,3; ranking B: docs 2,3,4 (c = 60)
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
      .toDF("query_id", "id", "rank")
    val b = Seq((0L, 2L, 1), (0L, 3L, 2), (0L, 4L, 3))
      .toDF("query_id", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank").collect()
    // doc2 = 1/62 + 1/61, doc3 = 1/63 + 1/62, doc1 = 1/61, doc4 = 1/63
    val exp = Seq(
      2L -> (r6(1.0 / 62) + r6(1.0 / 61)),
      3L -> (r6(1.0 / 63) + r6(1.0 / 62)),
      1L -> r6(1.0 / 61),
      4L -> r6(1.0 / 63))
    assert(out.map(r => r.getAs[Long]("id") -> r.getAs[Double]("rrf")).toSeq
      == exp)
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse: exact-tie breaks to the smaller id, k caps the output") {
    // docs 5 and 7 swap ranks 1/2 across the two rankings → identical
    // fused score → doc 5 (smaller id) must win rank 1
    val a = Seq((0L, 5L, 1), (0L, 7L, 2), (0L, 9L, 3))
      .toDF("query_id", "id", "rank")
    val b = Seq((0L, 7L, 1), (0L, 5L, 2), (0L, 9L, 3))
      .toDF("query_id", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 2).orderBy("rank").collect()
    assert(out.length == 2, "k must cap the fused ranking")
    assert(out(0).getAs[Long]("id") == 5L && out(1).getAs[Long]("id") == 7L)
    assert(out(0).getAs[Double]("rrf") == out(1).getAs[Double]("rrf"))
  }

  test("rrfFuse: fusion order of the rankings cannot move the result " +
       "(DECIMAL sum) and a query present in one ranking still ranks") {
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (1L, 8L, 1))
      .toDF("query_id", "id", "rank")
    val b = Seq((0L, 2L, 1), (0L, 1L, 2)).toDF("query_id", "id", "rank")
    val c = Seq((0L, 1L, 1), (2L, 3L, 1)).toDF("query_id", "id", "rank")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("id"), r.getAs[Double]("rrf"))).toMap
    val fwd = key(Retrieval.rrfFuse(Seq(a, b, c), k = 5))
    val rev = key(Retrieval.rrfFuse(Seq(c, b, a), k = 5))
    assert(fwd == rev, "fusion must be ranking-order-independent")
    // query 1 appears only in ranking a, query 2 only in c — both fuse
    assert(fwd((1L, 1)) == (8L, r6(1.0 / 61)))
    assert(fwd((2L, 1)) == (3L, r6(1.0 / 61)))
  }

  test("hybridServeTopK fuses the persisted BM25 + ANN indexes and " +
       "annotates component ranks") {
    val docs = Seq(
      (0L, "spark join table"), (1L, "spark spark shuffle"),
      (2L, "quick brown fox"), (3L, "hash join index")
    ).toDF("doc_id", "text")
    // 4-dim embeddings: doc 2 is the nearest neighbor of the query vector
    // but matches no query term; docs 0/1 match terms only
    val emb = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 1.0f, 0f, 0f)),
      (2L, Array(0f, 0f, 1.0f, 0f)), (3L, Array(0f, 0f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("hybrid").toString
    Retrieval.buildIndex(docs, s"$base/bm")
    graft.operators.AnnIndex.build(emb, s"$base/ann",
      graft.operators.AnnIndex.Params(dim = 4, m = 2, k = 2, kCells = 2,
        iters = 0, sampleN = 4))
    val tq = Seq((7L, "spark join")).toDF("query_id", "query_text")
    val vq = emb.filter(col("vec_id") === 2L)
      .select(lit(7L).as("query_id"), col("embedding"))
    val out = Retrieval.hybridServeTopK(spark, s"$base/bm", s"$base/ann",
        tq, vq, k = 4, nProbe = 2)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    // every fused row has at least one component rank; a doc absent from
    // a ranking carries null for that rank
    for (r <- out) {
      val bm = Option(r.getAs[Integer]("bm25_rank"))
      val ann = Option(r.getAs[Integer]("ann_rank"))
      assert(bm.isDefined || ann.isDefined)
    }
    // doc 2: ANN-only (no term match) — ann_rank 1, bm25_rank null
    val d2 = out.find(_.getAs[Long]("id") == 2L).get
    assert(d2.getAs[Integer]("ann_rank") == 1 &&
      d2.getAs[Integer]("bm25_rank") == null)
    // fused scores replay the component ranks through the RRF formula
    for (r <- out) {
      val exp = Seq(Option(r.getAs[Integer]("bm25_rank")),
          Option(r.getAs[Integer]("ann_rank")))
        .flatten.map(rk => r6(1.0 / (60 + rk.toInt))).sum
      assert(approx(r.getAs[Double]("rrf"), r6(exp), 1e-9))
    }
  }
}
