package graft

import graft.operators.Similarity

/** ANN search: brute-force exact top-k, LSH-bucketed, IVF-style. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 2-D unit-ish vectors at known angles, dim padded to 4
  private lazy val corpus = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.9, 0.1, 0.0, 0.0)),
    (3L, Seq(0.0, 1.0, 0.0, 0.0)),
    (4L, Seq(-1.0, 0.0, 0.0, 0.0)),
    (5L, Seq(0.7, 0.7, 0.0, 0.0))).toDF("vec_id", "embedding")

  private lazy val queries = Seq((100L, Seq(1.0, 0.0, 0.0, 0.0)))
    .toDF("query_id", "embedding")

  test("bruteForceTopK ranks by exact cosine with deterministic ties") {
    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id")))
    assert(got.toSeq == Seq((1, 1L), (2, 2L), (3, 5L)))
  }

  test("bruteForceTopK returns at most k rows per query") {
    assert(Similarity.bruteForceTopK(corpus, queries, k = 2).count() == 2)
  }

  test("lshTopK finds the identical vector (same bucket, cos 1)") {
    val got = Similarity.lshTopK(corpus, queries, k = 1, dim = 4, nBits = 2)
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("vec_id") == 1L)
    assert(approx(got(0).getAs[Double]("cos"), 1.0, 1e-12))
  }

  test("ivfTopK probes nearest cells and re-ranks exactly") {
    val centroids = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(-1.0, 0.0, 0.0, 0.0))
    val got = Similarity.ivfTopK(corpus, queries, centroids, k = 2, nProbe = 2)
      .orderBy("rank").collect().map(_.getAs[Long]("vec_id"))
    assert(got.head == 1L)
  }
}
