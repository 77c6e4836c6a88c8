package graft

import graft.operators.Similarity

/** ANN search: brute-force exact top-k, LSH-bucketed, IVF-style. */
@SlowSuite
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

  // ------------------------------------------------------ recall harness --
  private lazy val embeddings =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val embQueries = embeddings.filter($"vec_id" < 20)
    .select($"vec_id".as("query_id"), $"embedding")

  /** Fraction of brute-force top-k pairs the candidate method recovered. */
  private def recallVsBrute(got: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val truth = Similarity.bruteForceTopK(embeddings, embQueries, k)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = got.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (truth & found).size.toDouble / truth.size
  }

  test("multi-table multi-probe LSH: recall >= 0.95 vs brute force") {
    // These embeddings' top-10 neighbours are nearly RANDOM (cos ~0.1) —
    // the worst case for LSH, where ≥0.95 recall necessarily means probing
    // most of the corpus (for genuinely similar neighbours the planted-dup
    // test below shows high recall at far tighter settings). The point
    // here is that the recall LEVER works: widen tables/probes until the
    // target is met.
    val got = Similarity.lshTopKMulti(embeddings, embQueries, k = 10, dim = 64,
      nBits = 3, nTables = 12, probeFlips = 1)
    val r = recallVsBrute(got, 10)
    info(f"lshTopKMulti recall@10 = $r%.3f (nBits=3, nTables=12, 1-flip probe)")
    assert(r >= 0.95, f"recall $r%.3f below 0.95")
    // single-table exact-bucket is strictly weaker — document the gap
    val single = Similarity.lshTopKMulti(embeddings, embQueries, k = 10,
      dim = 64, nBits = 3, nTables = 1, probeFlips = 0)
    val rs = recallVsBrute(single, 10)
    info(f"single-table exact-bucket recall@10 = $rs%.3f")
    assert(rs <= r)
  }

  test("multi-probe LSH finds planted near-duplicates that the single " +
       "prefix table can miss") {
    // plant 10 near-dups of existing vectors (tiny perturbation → cos ≈ 1)
    val base = embeddings.filter($"vec_id" < 10).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble)))
    val planted = base.map { case (id, v) =>
      (id + 100000L, v.updated(0, v(0) + 0.01f.toDouble)) }
    val corpus64 = embeddings.select($"vec_id",
      graft.functions.VectorFunctions.asDouble($"embedding").as("embedding"))
      .union(planted.toSeq.toDF("vec_id", "embedding"))
    val qs = base.toSeq.toDF("query_id", "embedding")
    val got = Similarity.lshTopKMulti(corpus64, qs, k = 2, dim = 64,
      nBits = 6, nTables = 8, probeFlips = 1)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted twin must appear in its query's top-2
    base.foreach { case (id, _) =>
      assert(got.contains((id, id + 100000L)), s"missed planted dup of $id")
    }
  }

  test("IVF with sampled k-means centroids: recall and determinism") {
    val c1 = Similarity.sampledKMeans(embeddings, kCells = 8, iters = 10)
    val c2 = Similarity.sampledKMeans(embeddings, kCells = 8, iters = 10)
    assert(c1 == c2, "k-means centroids must be deterministic")
    assert(c1.size == 8 && c1.head.size == 64)
    val got = Similarity.ivfTopK(embeddings, embQueries, c1, k = 10, nProbe = 4)
    val r = recallVsBrute(got, 10)
    info(f"ivfTopK recall@10 = $r%.3f (8 cells from sampled k-means, nProbe=4)")
    assert(r >= 0.8, f"recall $r%.3f below 0.8")
  }

  test("semanticDedup assigns to nearest seed and flags within-cluster dups") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 1.0)),
      (10L, Seq(0.9, 0.1, 0.0, 0.0)),  // cluster 0, cos≈0.994 vs seed → dup
      (11L, Seq(0.0, 0.9, -0.4, 0.0)), // cluster 1, cos≈0.914 vs seed → dup
      (12L, Seq(-1.0, 0.05, 0.0, 0.0)) // nearest seed 1 (cos<0 for seed 0)
    ).toDF("vec_id", "embedding")
    val m = Similarity.semanticDedup(vecs, nSeeds = 4, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("id"),
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("is_dup")))).toMap
    assert(m(0L) == ((0L, false)) && m(10L) == ((0L, true)))
    assert(m(1L) == ((1L, false)) && m(11L) == ((1L, true)))
    assert(!m(12L)._2) // in its cluster but not near any lower-id member
    // seeds each land in their own cluster
    assert(Seq(0L, 1L, 2L, 3L).map(m(_)._1) == Seq(0L, 1L, 2L, 3L))
  }

  test("semanticDedup cluster cap: no (cluster, sub-bucket) group exceeds " +
       "the cap on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb.select(org.apache.spark.sql.functions.col("vec_id").as("id"),
      org.apache.spark.sql.functions.col("embedding").as("v"))
    // force everything into ONE cluster — the adversarial dense case the
    // cap exists for — then sub-bucket with cap 64 over 500 vectors
    val oneCluster = e.withColumn("cluster",
      org.apache.spark.sql.functions.lit(0L))
    val sizes = Similarity
      .clusterSubBuckets(oneCluster, maxClusterSize = 64, subMaxBits = 8, dim = 64)
      .groupBy("cluster", "_sub").count().collect()
    assert(sizes.length > 1, "cap did not split the oversized cluster")
    val maxGroup = sizes.map(_.getAs[Long]("count")).max
    // random-hyperplane splits are probabilistic, not exact halving: the
    // contract is "bounded near the cap", asserted with 2x headroom on
    // this deterministic dataset (measured max is well under it)
    assert(maxGroup <= 128, s"largest sub-bucket $maxGroup exceeds 2x cap")
    // within-cap clusters are untouched (empty sub key)
    val noCap = Similarity
      .clusterSubBuckets(oneCluster, maxClusterSize = 1000, subMaxBits = 8, dim = 64)
      .select("_sub").distinct().collect()
    assert(noCap.map(_.getString(0)).toSeq == Seq(""))
  }

  test("semanticDedupScaled: kmeans-seeded clusters scale with the corpus " +
       "and flag the planted duplicate") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // plant an exact duplicate of vector 0 under a fresh id
    val dup = emb.filter($"vec_id" === 0L)
      .withColumn("vec_id", org.apache.spark.sql.functions.lit(10000L))
    val out = Similarity.semanticDedupScaled(emb.union(dup),
      targetClusterSize = 25, threshold = 0.99, maxClusterSize = 50)
      .collect()
    assert(out.length == 501)
    val byId = out.map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("cluster"), r.getAs[Boolean]("is_dup"))).toMap
    // k = 501/25 = 20 kmeans cells — the assignment must actually use them
    assert(out.map(_.getAs[Long]("cluster")).distinct.length > 8)
    // identical vectors co-assign; the higher id is the marked dup
    assert(byId(10000L)._1 == byId(0L)._1)
    assert(byId(10000L)._2 && !byId(0L)._2)
  }

  test("semanticDedupScaled samples on the id's NATURAL type: zero-padded " +
       "string ids reproduce the numeric-id clustering") {
    // the one-pass sample+count must order string ids exactly like
    // collectSample's orderBy — zero-padded strings sort like the numbers,
    // so cluster structure must be identical (and nothing NPEs on a
    // non-long id column)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val numeric = Similarity.semanticDedupScaled(emb,
        targetClusterSize = 25, threshold = 0.99, maxClusterSize = 50)
      .collect().map(r => r.getAs[Long]("id").toString ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("is_dup"))).toMap
    val strIds = emb.withColumn("vec_id",
      org.apache.spark.sql.functions.format_string("%06d", $"vec_id"))
    val stringed = Similarity.semanticDedupScaled(strIds,
        targetClusterSize = 25, threshold = 0.99, maxClusterSize = 50)
      .collect().map(r => r.getAs[String]("id").toLong.toString ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("is_dup"))).toMap
    assert(stringed == numeric,
      "string-id clustering diverged from numeric-id clustering")
  }

  // ------------------------------------------------- product quantization
  test("PQ: training cuts quantization error; ADC top-k recalls exact L2") {
    val vecs = embeddings.orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def qErr(cb: Seq[Seq[Seq[Double]]]): Double =
      vecs.map { case (_, v) =>
        cb.zipWithIndex.map { case (book, m) =>
          book.map { c =>
            (0 until 8).map { i => val t = v(m * 8 + i) - c(i); t * t }.sum
          }.min
        }.sum
      }.sum

    val cb0 = Similarity.trainPqCodebooks(embeddings, m = 8, k = 16, dim = 64,
      iters = 0)
    val cb10 = Similarity.trainPqCodebooks(embeddings, m = 8, k = 16, dim = 64,
      iters = 10)
    val (e0, e10) = (qErr(cb0), qErr(cb10))
    info(f"PQ quantization error: init $e0%.1f -> trained $e10%.1f")
    assert(e10 < e0 * 0.9, "Lloyd's iterations must cut quantization error")

    // ADC recall vs exact L2 top-10, computed on the driver
    val queries = embeddings.filter($"vec_id" < 5)
    val got = Similarity.pqTopK(embeddings, queries, cb10, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("id")).toSet }
    val byId = vecs.toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map { i => val t = a(i) - b(i); t * t }.sum
    val recalls = (0L until 5L).map { qid =>
      val qv = byId(qid)
      val exact = vecs.map { case (id, v) => (l2(qv, v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
      (got(qid) & exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ ADC recall@10 vs exact L2 = $mean%.2f (m=8, k=16)")
    assert(mean >= 0.3, f"ADC recall $mean%.2f collapsed")
    // codes are small ints in range and deterministic across invocations
    val codes = Similarity.pqEncode(embeddings, cb10).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Int](1))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    val again = Similarity.pqEncode(embeddings, cb10).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Int](1)).toMap
    assert(codes.forall { case (id, cs) => again(id) == cs })
  }

  // --------------------------------------------------------------- IVF-ADC
  test("IVF-ADC: cell-pruned ADC search recalls exact L2 top-k >= 0.9; " +
       "probing every cell reproduces the flat PQ scan exactly") {
    val cents = Similarity.sampledKMeans(embeddings, kCells = 8, iters = 10)
    // high-resolution codebooks (2-dim sub-spaces, 256 centroids): the
    // recall budget goes to CELL PRUNING, not quantization noise — this is
    // the FAISS regime where ADC ranking tracks exact L2 closely
    val cbs = Similarity.trainPqCodebooks(embeddings, m = 32, k = 256,
      dim = 64, iters = 5)
    val queries = embeddings.filter($"vec_id" < 5)
    val got = Similarity.ivfAdcTopK(embeddings, queries, cents, cbs,
        k = 10, nProbe = 6, queryIdCol = "vec_id").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("id")).toSet }
    val vecs = embeddings.orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = vecs.toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map { i => val t = a(i) - b(i); t * t }.sum
    val recalls = (0L until 5L).map { qid =>
      val exact = vecs.map { case (id, v) => (l2(byId(qid), v), id) }
        .sortBy(identity).take(10).map(_._2).toSet
      (got(qid) & exact).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF-ADC recall@10 vs exact L2 = $mean%.2f " +
      "(8 cells, nProbe=6, m=32, k=256)")
    assert(mean >= 0.9, f"IVF-ADC recall $mean%.2f below 0.9")

    // nProbe = kCells disables pruning: IVF-ADC must then equal the flat
    // PQ scan row-for-row (same codes, same ADC math, same salted top-k)
    val cbSmall = Similarity.trainPqCodebooks(embeddings, m = 8, k = 16,
      dim = 64, iters = 3)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("id"), r.getAs[Double]("dist"))).toMap
    val full = key(Similarity.ivfAdcTopK(embeddings, queries, cents, cbSmall,
      k = 10, nProbe = cents.size, queryIdCol = "vec_id"))
    val flat = key(Similarity.pqTopK(embeddings, queries, cbSmall, k = 10))
    assert(full == flat, "all-cells IVF-ADC diverged from the flat PQ scan")

    // exact refine (IndexRefineFlat): with COARSE codebooks (heavy
    // quantization noise) the refine pass must recover recall — and with
    // pruning disabled plus a refine pool covering the corpus, refined
    // top-k IS the exact top-k
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("id")).toSet }
      val rs = (0L until 5L).map { qid =>
        val exact = vecs.map { case (id, v) => (l2(byId(qid), v), id) }
          .sortBy(identity).take(10).map(_._2).toSet
        (got(qid) & exact).size / 10.0
      }
      rs.sum / rs.size
    }
    val adcCoarse = recallOf(Similarity.ivfAdcTopK(embeddings, queries,
      cents, cbSmall, k = 10, nProbe = 6, queryIdCol = "vec_id"))
    val refined = recallOf(Similarity.ivfAdcRefineTopK(embeddings, queries,
      cents, cbSmall, k = 10, refineFactor = 4, nProbe = 6,
      queryIdCol = "vec_id"))
    info(f"coarse-codebook ADC recall@10 = $adcCoarse%.2f, refined = $refined%.2f")
    // the refine pool comes FROM the ADC ranking, so its recall is capped
    // by ADC recall@(k·r) — assert the recovery, not an absolute number
    assert(refined >= adcCoarse,
      "exact refine must not lose recall vs the ADC ranking it refines")

    // no pruning + a pool covering the whole corpus: refined top-k IS the
    // exact L2 top-k, bit for bit (500 vectors < k·refineFactor = 550)
    val exactRefined = recallOf(Similarity.ivfAdcRefineTopK(embeddings,
      queries, cents, cbSmall, k = 10, refineFactor = 55,
      nProbe = cents.size, queryIdCol = "vec_id"))
    assert(exactRefined == 1.0,
      f"full-pool refine must equal exact search, got $exactRefined%.2f")
  }

  test("residual PQ codebooks (IVFADC by_residual) at the same m x k budget") {
    val cents = Similarity.sampledKMeans(embeddings, kCells = 8, iters = 10)
    val raw = Similarity.trainPqCodebooks(embeddings, m = 8, k = 16,
      dim = 64, iters = 10)
    val res = Similarity.trainPqCodebooksResidual(embeddings, cents,
      m = 8, k = 16, dim = 64, iters = 10)
    val queries = embeddings.filter($"vec_id" < 5)
    def recallOf(cbs: Seq[Seq[Seq[Double]]], byResidual: Boolean): Double = {
      val got = Similarity.ivfAdcTopK(embeddings, queries, cents, cbs,
          k = 10, nProbe = 8, queryIdCol = "vec_id",
          byResidual = byResidual).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.map(_.getAs[Long]("id")).toSet }
      val vecs = embeddings.orderBy("vec_id").collect()
        .map(r => (r.getAs[Long]("vec_id"),
          r.getSeq[Float](1).map(_.toDouble).toArray))
      val byId = vecs.toMap
      def l2(a: Array[Double], b: Array[Double]): Double =
        a.indices.map { i => val t = a(i) - b(i); t * t }.sum
      (0L until 5L).map { qid =>
        val exact = vecs.map { case (id, v) => (l2(byId(qid), v), id) }
          .sortBy(identity).take(10).map(_._2).toSet
        (got(qid) & exact).size / 10.0
      }.sum / 5.0
    }
    val (rRaw, rRes) = (recallOf(raw, byResidual = false),
      recallOf(res, byResidual = true))
    info(f"ADC recall@10, all cells probed: raw $rRaw%.2f vs residual $rRes%.2f (m=8, k=16)")
    // residual quantization must not lose recall at the same budget (on
    // clustered data it gains; these synthetic embeddings bound the win)
    assert(rRes >= rRaw - 1e-9,
      f"residual recall $rRes%.2f fell below raw $rRaw%.2f")
    assert(rRes >= 0.3, f"residual recall $rRes%.2f collapsed")
  }

  // ------------------------------------------------------------ kNN graph
  test("knnGraph: corpus-wide neighbors recall exact cosine top-k") {
    val k = 5
    // same bucket-resolution regime the 0.95-recall lshTopKMulti test
    // uses: short signatures, many tables (the self-join has no
    // query-side probing, so tables are the only recall lever)
    val got = Similarity.knnGraph(embeddings, k = k, dim = 64,
        nBits = 3, nTables = 12).collect()
      .groupBy(_.getAs[Long]("id"))
      .map { case (id, rows) => id -> rows.map(_.getAs[Long]("neighbor")).toSet }
    val vecs = embeddings.orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double =
      graft.functions.VectorFunctions.cosineDriver(a.toSeq, b.toSeq)
    val sampleIds = vecs.map(_._1).take(25)
    val recalls = sampleIds.map { id =>
      val qv = vecs.find(_._1 == id).get._2
      val exact = vecs.filter(_._1 != id)
        .map { case (nid, v) => (-cos(qv, v), nid) }
        .sortBy(identity).take(k).map(_._2).toSet
      (got.getOrElse(id, Set.empty) & exact).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    info(f"knnGraph recall@$k = $mean%.2f (nBits=3, nTables=12, 25 probes)")
    assert(mean >= 0.8, f"knnGraph recall $mean%.2f below 0.8")
    // every id got at most k neighbors, ranked 1..n contiguously
    val ranks = Similarity.knnGraph(embeddings, k = 2, dim = 64,
        nBits = 5, nTables = 4).collect()
      .groupBy(_.getAs[Long]("id"))
      .map { case (_, rows) => rows.map(_.getAs[Int]("rank")).sorted.toSeq }
    assert(ranks.forall(r => r == (1 to r.size)))
  }

  test("knnGraph hot-bucket cap: degenerate bucket stars to the min id") {
    // signature rows as the candidate builder sees them: one bucket of 400
    // identical-signature members (content-based sub-splitting can't break
    // identical vectors) + one small bucket of 8, in each of 2 tables
    val sigs = ((0 until 2).flatMap { t =>
      (0L until 400L).map(i => (i, t, "000")) ++
        (1000L until 1008L).map(i => (i, t, "111"))
    }).toDF("id", "_t", "bucket")
    val cand = Similarity.knnCandidates(sigs, maxBucketSize = 16).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("nb")))
    val hot = cand.filter(_._1 < 1000L)
    // star both directions: members → min and min → members, never B²
    assert(hot.length == 2 * 399, s"hot candidates ${hot.length}")
    assert(hot.forall(p => p._1 == 0L || p._2 == 0L))
    // the small bucket keeps its full neighborhood
    assert(cand.count(_._1 >= 1000L) == 8 * 7)
    // cap off reproduces the quadratic candidate set
    assert(Similarity.knnCandidates(sigs, maxBucketSize = 0).count()
      == 400L * 399 + 8 * 7)

    // end-to-end: 60 identical vectors + distinct ones; every clone's
    // rank-1 neighbor has cos 1 (the hub for non-min members), and the
    // hub sees its clones
    import spark.implicits._
    val cloneVec = Seq.tabulate(64)(d => math.sin(d + 1.0))
    val distinctVecs = (100L until 110L).map(i =>
      (i, Seq.tabulate(64)(d => math.cos((d + 1.0) * (i - 99.0)))))
    val emb = ((0L until 60L).map(i => (i, cloneVec)) ++ distinctVecs)
      .toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(emb, k = 3, dim = 64, nBits = 4,
        nTables = 2, maxBucketSize = 16).collect()
    val rank1 = g.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("cos")).toMap
    assert((0L until 60L).forall(i => approx(rank1(i), 1.0, 1e-9)),
      "every clone must keep a cos-1 neighbor through the star")
  }

  test("distributedKMeans: WCSS never increases across full-corpus " +
       "iterations, runs are deterministic, empty cells keep centroids") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def wcss(cents: Seq[Seq[Double]]): Double = {
      val vecs = emb.select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      vecs.map { v =>
        cents.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    }
    val init = Similarity.sampledKMeans(emb, 8, 0)
    val refined = Similarity.distributedKMeans(emb, k = 8, iters = 3, dim = 64)
    assert(wcss(refined) < wcss(init),
      "three full-corpus Lloyd iterations must reduce WCSS")
    // deterministic: byte-identical rounded centroids on a re-run
    assert(Similarity.distributedKMeans(emb, k = 8, iters = 3, dim = 64)
      == refined)
    // all-identical corpus: every vector ties to cell 0, cells 1+ keep
    // their (identical) init centroids, nothing divides by zero
    import spark.implicits._
    val same = Seq.tabulate(4)(i => (i.toLong, Seq.fill(4)(0.5)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.distributedKMeans(same, k = 3, iters = 2, dim = 4)
    assert(cents.length == 3 && cents.forall(_ == Seq(0.5, 0.5, 0.5, 0.5)))
    val summary = Similarity.kmeansSummary(same, cents)
      .orderBy("cell").collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("n_members")))
    assert(summary.toSeq == Seq((0, 4L), (1, 0L), (2, 0L)),
      "ties must break to the smallest cell; empty cells must still report")
  }

  test("farthestInit seeds every region the stride init misses: converged " +
       "WCSS on a skewed corpus is at least as good, runs deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // skew trap for the first-ids stride sample: ids 0..4095 are ALL in
    // one tight blob (the stride init's whole sample), three far-away
    // micro-clusters live only at high ids — stride starts every centroid
    // inside the blob, farthest-point must reach all four regions
    def blobVec(i: Long) = Seq.tabulate(8)(d => (d + 1.0) / 10 + (i % 7) * 1e-4)
    def farVec(c: Int) = Seq.tabulate(8)(d => if (d == c) 100.0 + c else 0.0)
    val corpus = ((0L until 4200L).map(i => (i, blobVec(i))) ++
      (0 until 3).flatMap(c => (0 until 20).map(j =>
        (5000L + c * 100 + j, farVec(c)))))
      .toDF("vec_id", "embedding")
    def wcss(cents: Seq[Seq[Double]]): Double = {
      val vecs = corpus.select(col("embedding")).collect()
        .map(_.getSeq[Double](0).toArray)
      vecs.map { v =>
        cents.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
          .min
      }.sum
    }
    val ff = Similarity.farthestInit(corpus, k = 4, dim = 8)
    // one centroid per region before any refinement: the 3 far clusters
    // and the blob each get a seed
    val regions = ff.map { c =>
      val hot = c.zipWithIndex.filter(_._1 > 50.0).map(_._2)
      if (hot.isEmpty) -1 else hot.head
    }
    assert(regions.toSet == Set(-1, 0, 1, 2),
      s"farthest seeding must cover all four regions, got $regions")
    val ffRefined = Similarity.distributedKMeans(corpus, k = 4, iters = 3,
      dim = 8, init = Some(ff))
    val strideRefined = Similarity.distributedKMeans(corpus, k = 4,
      iters = 3, dim = 8)
    assert(wcss(ffRefined) <= wcss(strideRefined),
      s"farthest-init WCSS ${wcss(ffRefined)} must not lose to stride " +
        s"${wcss(strideRefined)}")
    // and on THIS corpus it must be strictly better: stride cannot see
    // the far clusters at all
    assert(wcss(ffRefined) < wcss(strideRefined) * 0.5,
      "stride init should be stuck in the blob; farthest must escape")
    // deterministic end to end
    assert(Similarity.farthestInit(corpus, k = 4, dim = 8) == ff)

    // the large-k shape: 3 rounds of top-3 admissions + one weighting
    // pass instead of k−1 passes — each round's admissions all land in
    // the current farthest cluster (identical costs, id tie-break), so 3
    // rounds reach all three far regions; the greedy weighted recluster
    // must then keep one seed per region instead of collapsing onto mass
    val os = Similarity.oversampleInit(corpus, k = 4, dim = 8, rounds = 3)
    assert(os.length == 4)
    val osRegions = os.map { c =>
      val hot = c.zipWithIndex.filter(_._1 > 25.0).map(_._2)
      if (hot.isEmpty) -1 else hot.head
    }
    assert(osRegions.toSet == Set(-1, 0, 1, 2),
      s"oversampled seeding must cover all four regions, got $osRegions")
    val osRefined = Similarity.distributedKMeans(corpus, k = 4, iters = 3,
      dim = 8, init = Some(os))
    assert(wcss(osRefined) < wcss(strideRefined) * 0.5,
      "oversampled init must escape the blob like farthest-point does")
    assert(Similarity.oversampleInit(corpus, k = 4, dim = 8, rounds = 3)
      == os, "oversampleInit must be deterministic")
  }

  test("hard negatives: self and same-cluster near-dups are excluded " +
       "BEFORE ranking (the next candidate promotes); unlabeled ids " +
       "are never cluster-excluded") {
    import spark.implicits._
    // query 1; vec 2 nearly identical (same cluster — the leaked
    // positive); vec 3 close but distinct; vec 4 distant; vec 5 close
    // and UNLABELED
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)),
      (3L, Array(0.9f, 0.3f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)),
      (5L, Array(0.95f, 0.2f, 0.0f))).toDF("vec_id", "embedding")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 4L))
      .toDF("id", "cluster")
    val queries = vecs.filter($"vec_id" === 1)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = Similarity.hardNegativeTopK(vecs, queries, clusters, k = 3)
      .orderBy("rank").collect()
      .map(r => r.getAs[Long]("vec_id")).toSeq
    // 2 (same cluster) and 1 (self) are gone; 5 beats 3 beats 4 by cosine
    assert(got == Seq(5L, 3L, 4L),
      s"expected promoted ranking Seq(5, 3, 4), got $got")
  }

  test("recallAtK: self-recall is exactly 1, a missed query still " +
       "reports 0, short corpora score against n_truth, and the harness " +
       "measures the multi-table LSH lift") {
    val truth = Similarity.bruteForceTopK(embeddings, embQueries, 10)
    // exact result vs itself — every query exactly 1.0
    val self = Similarity.recallAtK(truth, truth, k = 10).collect()
    assert(self.nonEmpty && self.forall(_.getAs[Double]("recall") == 1.0))
    // deeper k on the APPROX side never changes the @10 score (rank>k cut)
    val deep = Similarity.bruteForceTopK(embeddings, embQueries, 20)
    assert(Similarity.recallAtK(deep, truth, k = 10).collect()
      .forall(_.getAs[Double]("recall") == 1.0))
    // a query the approximate path missed ENTIRELY still reports, at 0
    val oneQueryGone = truth.filter($"query_id" =!= 0L)
    val gone = Similarity.recallAtK(oneQueryGone, truth, k = 10)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(gone(0L) == ((0L, 0.0)), s"missed query must score 0: $gone")
    assert(gone.filterNot(_._1 == 0L).values.forall(_._2 == 1.0))
    // corpus smaller than k: n_truth < k and a perfect result still
    // scores 1.0 (recall is against the truth set, not k)
    val tiny = embeddings.filter($"vec_id" < 4)
    val tq = tiny.select($"vec_id".as("query_id"), $"embedding")
    val tTruth = Similarity.bruteForceTopK(tiny, tq, 10)
    val tr = Similarity.recallAtK(tTruth, tTruth, k = 10).collect()
    assert(tr.forall(r => r.getAs[Long]("n_truth") == 4L &&
      r.getAs[Double]("recall") == 1.0))
    // the REAL use: the same harness shows the multi-table/probe lift
    // over single-table exact-bucket LSH on the random-neighbour corpus
    def macroRecall(approx: org.apache.spark.sql.DataFrame): Double = {
      val rows = Similarity.recallAtK(approx, truth, k = 10).collect()
      rows.map(_.getAs[Double]("recall")).sum / rows.length
    }
    // duplicate (query, id) rows at ranks <= k must not fan the join
    // out: recall against duplicated approx/truth equals the clean score
    val dupApprox = truth.unionAll(truth.filter($"rank" <= 3))
    val dupBoth = Similarity.recallAtK(dupApprox,
      truth.unionAll(truth), k = 10).collect()
    assert(dupBoth.forall(r => r.getAs[Long]("n_truth") == 10L &&
      r.getAs[Double]("recall") == 1.0),
      "duplicated pairs must not inflate n_truth or n_hit")
    val single = macroRecall(Similarity.lshTopK(
      embeddings, embQueries, k = 10, dim = 64, nBits = 6))
    val multi = macroRecall(Similarity.lshTopKMulti(
      embeddings, embQueries, k = 10, dim = 64,
      nBits = 3, nTables = 12, probeFlips = 1))
    info(f"recall@10: single-table $single%.3f -> multi-probe $multi%.3f")
    assert(multi >= 0.95 && single < multi,
      f"multi-table recall $multi%.3f must beat single-table $single%.3f")
  }

  test("projectedTopK: with candidates >= |corpus| the coarse pass is a " +
       "no-op and the result EQUALS bruteForceTopK; a 200-candidate " +
       "budget recalls the measured 0.850 through the 64->16 projection") {
    val n = embeddings.count().toInt
    val exact = Similarity.projectedTopK(embeddings, embQueries, k = 10,
        dim = 64, outDim = 16, candidates = n)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(embeddings, embQueries, k = 10)
      .select("query_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact == brute,
      "full-candidate projectedTopK must equal brute force rank-for-rank")
    // the synthetic embeddings are near-random — every cosine margin is
    // tiny, the ADVERSARIAL case for any projection (the same reason
    // single-table LSH honestly measures 0.135 here). Measured sweep:
    // outDim 16 recalls 0.420/0.615/0.850 at 50/100/200 candidates;
    // real clustered corpora sit far above this floor.
    val coarse = recallVsBrute(Similarity.projectedTopK(embeddings,
      embQueries, k = 10, dim = 64, outDim = 16, candidates = 200), 10)
    info(f"JL 64->16, 200-candidate recall@10: $coarse%.3f")
    assert(coarse >= 0.8,
      f"JL coarse pass recall regressed below the measured 0.850: $coarse%.3f")
  }
}
