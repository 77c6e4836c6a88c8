package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Checkpoints.EagerOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Tiers, by how they bound work per query:
  *  - `bruteForceTopK` — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one scan, no corpus shuffle. Baseline and
  *    recall oracle.
  *  - `lshTopK` / `lshTopKMulti` — random-hyperplane LSH bucketing:
  *    candidates = same-bucket rows; exact cosine re-rank inside buckets.
  *    The join shuffles only matching buckets, not the n×m cross product.
  *  - `ivfTopK` — coarse k-means cells, probe the nearest few per query.
  *  - `pqTopK` / `ivfAdcTopK` — product-quantized codes (m bytes per
  *    vector), ADC scoring; `ivfAdcTopK` composes cells × codes (FAISS
  *    IVFADC) — the 100 TB configuration.
  *
  * EVERY per-query ranking here runs as the salted two-phase top-k
  * ([[saltedTopK]]): no window partition ever holds more than k·nSalt
  * rows, no matter how many candidates a query has — a plain
  * `row_number() over (partition by query)` would sort a query's whole
  * candidate set (for brute force, the whole corpus) in one task.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `queries` must be small
    * enough to broadcast (it is broadcast explicitly).
    * Output: (query_id, vec_id, cos, rank) with rank 1..k.
    * Ties broken by corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val joined = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .join(broadcast(queries.select(col(queryIdCol), col(vecCol).as("_qv"))))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
    saltedTopK(joined, k, Seq(col("cos").desc, col(idCol)), idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** Retrieval-quality evaluation — recall@k of an APPROXIMATE top-k
    * result against EXACT ground truth, per query: the harness that
    * turns an ANN configuration (LSH bits/tables, IVF probes, PQ
    * codebooks) from "plausible" into "measured" before it serves a
    * pipeline. Both inputs are the ANN family's common report shape
    * `(queryIdCol, idCol, rankCol)`; rows past rank k are ignored, so a
    * k'-deep result evaluates at any k ≤ k'.
    *
    * Output: `(queryIdCol, n_truth, n_hit, recall)` with
    * `recall = n_hit / n_truth` — n_truth < k when the corpus itself has
    * fewer than k candidates, so a perfect result still scores 1.0.
    * Queries the approximate path MISSED entirely still report (their
    * truth rows exist; hits are 0): an empty-bucket LSH query can't
    * silently vanish from the average.
    *
    * Plan: both sides are (queries × k)-bounded report frames — a keyed
    * left join plus one small aggregation; nothing corpus-scale.
    */
  def recallAtK(approx: DataFrame, truth: DataFrame, k: Int,
                queryIdCol: String = "query_id", idCol: String = "vec_id",
                rankCol: String = "rank"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // distinct on both projected sides: a duplicate (query, id) pair at
    // ranks <= k would otherwise fan out the join and inflate both the
    // truth denominator and the hit count, skewing recall
    val t = truth.filter(col(rankCol) <= k)
      .select(col(queryIdCol), col(idCol)).distinct()
    val a = approx.filter(col(rankCol) <= k)
      .select(col(queryIdCol), col(idCol)).distinct()
      .withColumn("_hit", lit(1L))
    t.join(a, Seq(queryIdCol, idCol), "left")
      .groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_truth"), 6))
  }

  /** Hard-negative mining for contrastive training: each query's top-k
    * nearest neighbors by exact cosine EXCLUDING the query itself and
    * everything in the query's near-duplicate cluster — the closest
    * documents that are NOT (near-)copies. Exclusion precedes ranking
    * (a near-dup sitting at rank 1 is dropped and the next candidate
    * promoted), which is what makes these negatives hard instead of
    * leaked positives.
    *
    * `clusters` is any (id, cluster) labeling (e.g.
    * [[Clusters.components]] over the PPJoin pairs); ids without a label
    * are treated as singletons (never excluded by cluster). Scale: the
    * query set + its labels broadcast over the corpus, the corpus label
    * join is id-keyed, ranking is the salted two-phase top-k.
    */
  def hardNegativeTopK(corpus: DataFrame, queries: DataFrame,
                       clusters: DataFrame, k: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       queryIdCol: String = "query_id"): DataFrame = {
    val lab = clusters.select(col("id"), col("cluster"))
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .join(lab.select(col("id").as(idCol), col("cluster").as("_c_cl")),
        Seq(idCol), "left")
    val q = queries.select(col(queryIdCol), col(vecCol).as("_qv"))
      .join(lab.select(col("id").as(queryIdCol),
        col("cluster").as("_q_cl")), Seq(queryIdCol), "left")
    val joined = c.join(broadcast(q))
      .filter(col(idCol) =!= col(queryIdCol))
      .filter(col("_c_cl").isNull || col("_q_cl").isNull ||
        col("_c_cl") =!= col("_q_cl"))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
    saltedTopK(joined, k, Seq(col("cos").desc, col(idCol)), idCol,
        queryIdCol)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates share the full `nBits` signature with the
    * query; exact cosine re-rank within candidates. Recall is tuned by
    * `nBits` (fewer bits → bigger buckets → higher recall, more compute).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nBits: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    val sig = (v: org.apache.spark.sql.Column) =>
      VectorFunctions.lshSignature(v, nBits, dim)
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"),
      sig(col(vecCol)).as("bucket"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("_qv"),
      sig(col(vecCol)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
    saltedTopK(scored, k, Seq(col("cos").desc, col(idCol)), idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** Multi-table, multi-probe LSH ANN — the recall-tunable scale path.
    *
    * `nTables` independent signatures per vector (union of candidates
    * across tables) and, with `probeFlips = 1`, each query additionally
    * probes the nBits buckets at Hamming distance 1 in every table.
    * Single-table exact-bucket LSH (`lshTopK`) has recall
    * p(θ)^nBits per neighbor; multiple tables lift it to
    * 1 − (1 − p^nBits)^nTables and 1-flip probing multiplies the
    * per-table term by ≈ (1 + nBits·(1−p)/p) — measured ≥ 0.95 vs
    * `bruteForceTopK` on the test embeddings (see SimilaritySpec).
    *
    * Plan shape: corpus signatures are nTables rows per vector (linear),
    * queries are broadcast with their probe fan-out, candidates dedupe by
    * (query, vec) BEFORE the cosine re-rank so each pair is scored once.
    */
  def lshTopKMulti(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
                   nBits: Int = 6, nTables: Int = 8, probeFlips: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   queryIdCol: String = "query_id"): DataFrame = {
    require(probeFlips >= 0 && probeFlips <= 1, "probeFlips ∈ {0, 1}")
    val c = VectorFunctions.lshSignaturesMulti(corpus, nBits, nTables, dim,
        idCol, vecCol)
      .join(corpus.select(col(idCol), col(vecCol).as("_cv")), Seq(idCol))
    val qsig = VectorFunctions.lshSignaturesMulti(
      queries.withColumnRenamed(queryIdCol, idCol), nBits, nTables, dim,
      idCol, vecCol).withColumnRenamed(idCol, queryIdCol)
    val probes =
      if (probeFlips == 0) array(col("bucket"))
      else {
        val flips = (0 until nBits).map { j =>
          val bit = substring(col("bucket"), j + 1, 1)
          concat(substring(col("bucket"), 1, j),
            when(bit === "0", "1").otherwise("0"),
            substring(col("bucket"), j + 2, nBits))
        }
        array(col("bucket") +: flips: _*)
      }
    val q = qsig.withColumn("bucket", explode(probes))
      .select(col(queryIdCol), col("_t"), col("bucket"))
    val cand = c.join(broadcast(q), Seq("_t", "bucket"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(first(col("_cv")).as("_cv"))
    val scored = cand
      .join(broadcast(queries.select(col(queryIdCol), col(vecCol).as("_qv"))),
        Seq(queryIdCol))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
    saltedTopK(scored, k, Seq(col("cos").desc, col(idCol)), idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** Sampled k-means (Lloyd's) for IVF coarse centroids: cluster a bounded
    * driver-side sample — the standard way IVF indexes are trained (FAISS
    * trains on a sample, not the corpus). Deterministic: the sample is the
    * first `sampleN` vectors by id, initial centroids are every
    * (sampleN/kCells)-th sorted sample vector. Driver memory is bounded by
    * sampleN·dim doubles regardless of corpus size.
    */
  def sampledKMeans(corpus: DataFrame, kCells: Int, iters: Int = 10,
                    sampleN: Int = 4096, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val sample = collectSample(corpus, sampleN, idCol, vecCol)
    require(sample.nonEmpty, "empty corpus")
    lloyd(sample, kCells, iters).map(_.toSeq).toSeq
  }

  /** Deterministic farthest-point seeding over the FULL corpus — the
    * k-means||-flavoured alternative to [[sampledKMeans]]'s stride init,
    * which inherits the first-`sampleN`-ids bias (a long-tail cluster the
    * low ids never see starts with no nearby centroid, and Lloyd may
    * never recover it). Greedy k-center (Gonzalez 1985), made
    * cross-engine replayable:
    *   - seed = the vector whose (md5 of the id string, id) is smallest —
    *     hash-ordered, so NOT correlated with ingest order;
    *   - each of the k−1 rounds scores every vector by its distance to
    *     the CURRENT centroid set (min over centers of round(L2², 6) —
    *     the same rounded fold [[distributedKMeans]]' assignment uses)
    *     and admits the farthest, ties to the smaller id.
    * Every round is one broadcast-compare projection plus a TakeOrdered
    * of ONE row — k−1 bounded passes, no shuffle by any cluster key, the
    * driver only ever holds k·dim doubles. Integer/rounded arithmetic
    * end to end, so the q109 oracle replays seed, every admission, and
    * the Lloyd refinement that follows.
    */
  def farthestInit(corpus: DataFrame, k: Int, dim: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(k >= 1, s"need k >= 1, got $k")
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }
    val seed = corpus
      .select(VectorFunctions.asDouble(col(vecCol)).as("_v"), col(idCol),
        graft.functions.TextFunctions.md5Hash60(col(idCol).cast("string"))
          .as("_h"))
      .orderBy(col("_h"), col(idCol))
      .limit(1).select(col("_v")).collect()
    require(seed.nonEmpty, "empty corpus")
    val s0 = vecOf(seed(0))
    require(s0.length == dim,
      s"expected dim=$dim vectors, corpus has dim=${s0.length}")
    var cents = Seq(s0)
    while (cents.length < k) {
      val dists = cents.map(c =>
        round(VectorFunctions.sqL2(col("_v"), typedLit(c)), 6))
      val cost = if (dists.length == 1) dists.head else least(dists: _*)
      val next = corpus
        .select(VectorFunctions.asDouble(col(vecCol)).as("_v"), col(idCol))
        .withColumn("_cost", cost)
        .orderBy(col("_cost").desc, col(idCol))
        .limit(1).select(col("_v")).collect()
      cents = cents :+ vecOf(next(0))
    }
    cents
  }

  /** k-means||-style oversampled seeding for LARGE k (Bahmani et al.
    * 2012's shape, made deterministic): where [[farthestInit]] costs k−1
    * corpus passes — fine for the k ≤ tens IVF regime, prohibitive for
    * k in the hundreds — this admits the `l = ceil(2k/rounds)` highest-
    * cost points PER ROUND for a fixed `rounds` passes, then reduces the
    * bounded candidate set (≤ 1 + rounds·l vectors) to k centroids with
    * driver-side weighted Lloyd, the weights being one assignment-count
    * pass over the corpus (exactly k-means||'s final recluster step).
    * Total corpus passes: rounds + 1, independent of k.
    *
    * Deterministic end to end: hash-ordered seed, (round-6 cost DESC, id)
    * admissions, candidates kept in admission order, stride init for the
    * driver-side recluster — two runs produce identical centroids. The
    * driver never holds more than the candidate set (bounded by
    * construction).
    */
  def oversampleInit(corpus: DataFrame, k: Int, dim: Int, rounds: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     reclusterIters: Int = 10): Seq[Seq[Double]] = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1")
    val l = math.max(1, math.ceil(2.0 * k / rounds).toInt)
    def vecOf(r: org.apache.spark.sql.Row): Seq[Double] =
      r.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }
    val seed = corpus
      .select(VectorFunctions.asDouble(col(vecCol)).as("_v"), col(idCol),
        graft.functions.TextFunctions.md5Hash60(col(idCol).cast("string"))
          .as("_h"))
      .orderBy(col("_h"), col(idCol))
      .limit(1).select(col("_v")).collect()
    require(seed.nonEmpty, "empty corpus")
    val s0 = vecOf(seed(0))
    require(s0.length == dim,
      s"expected dim=$dim vectors, corpus has dim=${s0.length}")
    var cands = Vector(s0)
    // Running min-cost column, carried across rounds (k-means||'s cost
    // recurrence): each round only compares against the l candidates the
    // PREVIOUS round admitted and folds into the carried min — per-row
    // work O(rounds·l) total instead of O(rounds²·l) from re-evaluating
    // the whole candidate list every round. min is associative and each
    // distance is individually round-6'd before the fold, so the carried
    // cost equals the full least(...) exactly — centroids are identical
    // (the determinism spec pins this). The eager per-round checkpoint
    // (local, or reliable under spark.graft.checkpointDir — see
    // [[Checkpoints]]) keeps the plan (and lineage) round-count-
    // independent.
    var scored = corpus
      .select(VectorFunctions.asDouble(col(vecCol)).as("_v"), col(idCol))
      .withColumn("_cost",
        round(VectorFunctions.sqL2(col("_v"), typedLit(s0)), 6))
      .eagerCheckpoint()
    for (r <- 0 until rounds) {
      val next = scored
        .orderBy(col("_cost").desc, col(idCol))
        .limit(l).select(col("_v")).collect()
      val newCands = next.map(vecOf).toVector
      cands = cands ++ newCands
      if (r < rounds - 1 && newCands.nonEmpty) {
        val dists = newCands.map(c =>
          round(VectorFunctions.sqL2(col("_v"), typedLit(c)), 6))
        val next = scored
          .withColumn("_cost", least((col("_cost") +: dists): _*))
          .eagerCheckpoint()
        // free the superseded round's scored blocks eagerly
        Checkpoints.release(scored)
        scored = next
      }
    }
    Checkpoints.release(scored)
    // weight candidates by how much corpus they attract (one pass,
    // k-means||'s recluster weights), then reduce driver-side
    val weights = corpus
      .select(nearestCellStable(col(vecCol), cands).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n")).toMap
    weightedLloyd(
      cands.map(_.toArray).toArray,
      cands.indices.map(i => weights.getOrElse(i, 0L).toDouble).toArray,
      k, reclusterIters).map(_.toSeq).toSeq
  }

  /** Weighted Lloyd over a driver-resident candidate set — the
    * k-means|| recluster. Init is deterministic GREEDY weighted
    * k-means++: start at the heaviest candidate, then repeatedly admit
    * the candidate maximizing weight × squared distance to its nearest
    * chosen centroid (ties → lowest index) — a stride init here would let
    * two seeds land on one dense region and silently drop a low-mass far
    * cluster. Zero-weight candidates can seed but never pull a mean;
    * empty cells keep their previous centroid. Pure deterministic driver
    * math over ≤ candidate-count points.
    */
  private def weightedLloyd(pts: Array[Array[Double]], w: Array[Double],
                            kCells: Int, iters: Int): Array[Array[Double]] = {
    val dim = pts.head.length
    val k = math.min(kCells, pts.length)
    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { val t = a(i) - b(i); d += t * t; i += 1 }
      d
    }
    val chosen = scala.collection.mutable.ArrayBuffer[Int]()
    chosen += w.indices.maxBy(i => (w(i), -i))
    val minD = pts.map(p => sqDist(p, pts(chosen.head)))
    while (chosen.size < k) {
      var best = -1; var bestScore = -1.0
      var p = 0
      while (p < pts.length) {
        if (!chosen.contains(p)) {
          val s = w(p) * minD(p)
          if (s > bestScore) { bestScore = s; best = p }
        }
        p += 1
      }
      // all remaining scores 0 (duplicates / zero weight): keep k seeds
      // by admitting the lowest unchosen index
      if (bestScore <= 0.0) best = pts.indices.find(!chosen.contains(_)).get
      chosen += best
      var q = 0
      while (q < pts.length) {
        val d = sqDist(pts(q), pts(best))
        if (d < minD(q)) minD(q) = d
        q += 1
      }
    }
    var centroids = chosen.map(i => pts(i).clone()).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val ws = new Array[Double](k)
      var p = 0
      while (p < pts.length) {
        val v = pts(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i) * w(p); i += 1 }
        ws(best) += w(p)
        p += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (ws(c) == 0.0) old
        else sums(c).map(_ / ws(c))
      }
    }
    centroids
  }

  /** FULL-corpus Lloyd refinement — the scale path when the bounded
    * training sample is not representative enough (long-tail clusters the
    * first 4096 ids never see). Per iteration: ONE broadcast-argmin
    * projection over the corpus plus ONE aggregation bounded by k·dim
    * rows (partial-aggregated map-side); the driver only ever holds k·dim
    * doubles. No vector is ever shuffled by cluster key, so a hot cluster
    * costs nothing extra.
    *
    * Cross-engine replayable BY CONSTRUCTION, unlike textbook Lloyd:
    *   - init = the deterministic every-step-th sample init
    *     ([[sampledKMeans]] at iters = 0 — the convention the q80/q79
    *     oracles already rebuild);
    *   - assignment compares round(squared-L2, 6) with smallest-cell
    *     tie-break (the ordered fold of [[VectorFunctions.sqL2]], which
    *     DuckDB's `list_reduce` replays bit-identically);
    *   - each updated component is round(stableSum(x)/n, 6) — the DECIMAL
    *     sum is partition-order-independent and the rounding pins every
    *     iteration's centroids to values any engine reproduces exactly,
    *     so float drift cannot compound across iterations.
    * Cells that lose all members keep their previous centroid.
    */
  def distributedKMeans(corpus: DataFrame, k: Int, iters: Int, dim: Int,
                        sampleN: Int = 4096, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        init: Option[Seq[Seq[Double]]] = None)
      : Seq[Seq[Double]] = {
    var cents = init.getOrElse(sampledKMeans(corpus, k, 0, sampleN, idCol,
      vecCol))
    require(cents.length == k, s"init must supply $k centroids")
    for (_ <- 0 until iters) {
      // cell in its OWN projection: a generator alias in the same select
      // re-resolves sibling expressions and drops the argmin struct's
      // field names (FIELD_NOT_FOUND on getField)
      val rows = corpus
        .select(nearestCellStable(col(vecCol), cents).as("cell"),
          VectorFunctions.asDouble(col(vecCol)).as("_v"))
        .select(col("cell"), posexplode(col("_v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        // stableSum: round-6 DECIMAL partial sums (QueryUtil.stableSum's
        // expression) — order-independent, so the collected values are
        // exactly what the oracle's SQL computes
        .agg(round(sum(round(col("x"), 6).cast("decimal(28,6)"))
          .cast("double"), 6).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCellDim = rows.map(r => (r.getAs[Int]("cell"), r.getAs[Int]("d")) ->
        (r.getAs[Double]("s"), r.getAs[Long]("n"))).toMap
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (!byCellDim.contains((c, 0))) old
        else (0 until dim).map { d =>
          val (s, n) = byCellDim((c, d))
          BigDecimal(s / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    cents
  }

  /** Cluster sizes + centroid norms for trained centroids — the summary
    * grain the q101 oracle hash-checks. Output (cell, n_members, cnorm),
    * one row per centroid including empty cells.
    */
  def kmeansSummary(corpus: DataFrame, cents: Seq[Seq[Double]],
                    vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val counts = corpus
      .select(nearestCellStable(col(vecCol), cents).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    cents.zipWithIndex.map { case (cv, i) => (i, cv) }.toDF("cell", "cv")
      .join(counts, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        round(sqrt(VectorFunctions.dot(col("cv"), col("cv"))), 4).as("cnorm"))
  }

  /** Argmin cell by ROUNDED squared L2 with smallest-cell tie-break — the
    * cross-engine-stable assignment both [[distributedKMeans]] iterations
    * and its oracle replay use (round(d2, 6) ASC, cell ASC). ONE constant-
    * size codegen kernel over the flattened centroid matrix
    * ([[graft.functions.VectorExpressions.NearestCentroidExpr]]) — the
    * former k-struct array_sort built k interpreted sqL2 folds per row and
    * generated code linear in k.
    */
  private def nearestCellStable(v: Column, cents: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graft.PlanExec.column(
      graft.functions.VectorExpressions.NearestCentroidExpr(
        org.apache.spark.sql.graft.PlanExec.expression(
          v.cast("array<double>")),
        cents, cents.indices.map(_.toLong), cosineMode = false))
      .cast("int")

  /** First `sampleN` vectors by id as driver-side double arrays — the
    * bounded sample both k-means trainers run on.
    */
  private def collectSample(corpus: DataFrame, sampleN: Int, idCol: String,
                            vecCol: String): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(sampleN)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray)

  /** [[collectSample]] AND the exact corpus count in ONE pass: a capped
    * treeAggregate whose buffer holds at most 2·sampleN (id, vector)
    * entries at any moment (trimmed to the sampleN smallest ids on
    * overflow and at every merge) plus a row counter. Callers that need
    * both — [[semanticDedupScaled]] sizes k from n and trains on the
    * sample — would otherwise pay a second full corpus action just for
    * `count()`. Every partial result is bounded by sampleN regardless of
    * corpus size or executor count.
    */
  private def sampleWithCount(corpus: DataFrame, sampleN: Int, idCol: String,
                              vecCol: String): (Long, Array[Array[Double]]) = {
    // ids keep their NATURAL type and ordering (nulls first — the same
    // order `collectSample`'s orderBy uses), so string/decimal/timestamp
    // ids sample identically to sampledKMeans/trainPqCodebooks and a null
    // id cannot NPE a long accessor. Both sides of a comparison come from
    // one column, so the runtime classes match and Comparable covers every
    // Spark atomic id type.
    implicit val idOrd: Ordering[Any] = new Ordering[Any] {
      def compare(x: Any, y: Any): Int = (x, y) match {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case (a: Comparable[Any] @unchecked, b) => a.compareTo(b)
      }
    }
    type Buf = Vector[(Any, Array[Double])]
    def trim(b: Buf): Buf =
      if (b.length <= sampleN) b else b.sortBy(_._1).take(sampleN)
    val rows = corpus
      .select(col(idCol), VectorFunctions.asDouble(col(vecCol)))
      .rdd.map(r => (r.get(0), r.getSeq[Double](1).toArray))
    val (n, buf) = rows.treeAggregate((0L, Vector.empty[(Any, Array[Double])]))(
      { case ((cnt, b), kv) =>
          val b2 = b :+ kv
          (cnt + 1, if (b2.length >= 2 * sampleN) trim(b2) else b2) },
      { case ((n1, b1), (n2, b2)) => (n1 + n2, trim(b1 ++ b2)) })
    (n, trim(buf).sortBy(_._1).map(_._2).toArray)
  }

  /** Deterministic Lloyd's: init = every (n/k)-th sample vector; empty
    * cells keep their previous centroid. `iters = 0` returns the init
    * verbatim (the SQL-reconstructible configuration q76's oracle uses).
    */
  private def lloyd(sample: Array[Array[Double]], kCells: Int,
                    iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val k = math.min(kCells, sample.length)
    val step = math.max(sample.length / k, 1)
    var centroids = (0 until k).map(i => sample(i * step).clone()).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** IVF-style coarse quantization: assign each corpus vector to the nearest
    * of `centroids` (a driver-provided small list, typically from
    * `sampledKMeans`), search only the probe cells of each query.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: Seq[Seq[Double]],
              k: Int, nProbe: Int = 2, idCol: String = "vec_id",
              vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    def nearestCells(v: org.apache.spark.sql.Column, n: Int) = {
      val dists = centroids.zipWithIndex.map { case (cvec, i) =>
        struct(VectorFunctions.cosine(v, lit(cvec.toArray)).as("cos"),
          lit(i).as("cell"))
      }
      slice(reverse(array_sort(array(dists: _*))), 1, n)
    }
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .withColumn("cell", element_at(nearestCells(col("_cv"), 1), 1).getField("cell"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("_qv"),
      explode(nearestCells(col(vecCol), nProbe).getField("cell")).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
    saltedTopK(scored, k, Seq(col("cos").desc, col(idCol)), idCol, queryIdCol)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): coarsely
    * cluster the embedding space, then mark within-cluster near-duplicates
    * (cosine ≥ threshold against any LOWER-id member — the kept copy is
    * the smallest id, matching the exact-dedup convention). Seeds are the
    * first `nSeeds` vectors by id — a deterministic coarse quantizer any
    * engine can rebuild ([[semanticDedupScaled]] is the production path
    * with k-means seeds at corpus-scaled k; the dedup semantics are
    * unchanged). The pair join is per-cluster — SemDeDup's point: n²/k
    * instead of n² comparisons, and the cluster key is the shuffle key.
    * Cosines are compared at 6 decimals so the assignment argmax is
    * stable across engines.
    *
    * `maxClusterSize > 0` additionally bounds per-cluster pair work: a
    * cluster of size s > maxClusterSize is split into 2^⌈log₂⌈s/max⌉⌉
    * LSH sub-buckets (an adaptive-length prefix of the vector's
    * random-hyperplane signature, at most `subMaxBits` bits), and dups are
    * only marked within a sub-bucket. Near-identical vectors collide on
    * every hyperplane with probability ≈ 1 − cosθ/π per bit, so recall
    * for true semantic dups stays high while one dense cluster can no
    * longer go quadratic — total pair work is O(n · maxClusterSize) in
    * expectation. The bit count is computed with integer bit-length
    * arithmetic (no floating log2), so any engine reproduces it exactly.
    * Output: (id, cluster, is_dup) — one row per vector.
    */
  def semanticDedup(embeddings: DataFrame, vecCol: String = "embedding",
                    idCol: String = "vec_id", nSeeds: Int = 8,
                    threshold: Double = 0.3, maxClusterSize: Int = 0,
                    subMaxBits: Int = 8, dim: Int = 64): DataFrame = {
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    // the seed set is bounded by nSeeds BY CONSTRUCTION (model state, the
    // sampledKMeans collect contract) — collecting it lets the assignment
    // run as one per-row kernel instead of a broadcast join + shuffle.
    // NULL seed vectors (and vectors with null ELEMENTS) are dropped
    // BEFORE the collect: under the former broadcast-join+argmax form
    // such a seed produced null cosines and could never win an
    // assignment, so filtering reproduces that semantics instead of
    // NPE-ing in the kernel's driver-side require.
    val rows = e.filter(col("id") < nSeeds && col("v").isNotNull &&
        !exists(col("v"), _.isNull))
      .select(col("id").cast("long"), VectorFunctions.asDouble(col("v")))
      .orderBy(col("id")).collect()
    require(rows.nonEmpty,
      s"semanticDedup: no usable seed vectors with $idCol < $nSeeds " +
        "(empty corpus, non-dense ids, or all-null seed vectors) — " +
        "re-key ids densely or use semanticDedupScaled (k-means seeds)")
    val cents = rows.map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cents.map(_._1).distinct.size == cents.size,
      s"semanticDedup: duplicate $idCol values in the seed range — " +
        "seed ids must be unique")
    markDups(assignToCentroids(e, cents), threshold, maxClusterSize,
      subMaxBits, dim)
  }

  /** Corpus-scaled SemDeDup: k grows with the corpus (k ≈ n /
    * `targetClusterSize`, the paper's regime — a FIXED k makes the
    * within-cluster pair join n²/k, i.e. still quadratic as n grows),
    * seeded with [[sampledKMeans]] centroids, and per-cluster pair work
    * capped by LSH sub-bucketing exactly as in [[semanticDedup]]. k is
    * bounded by the k-means sample size; beyond that the sub-bucket cap —
    * not more centroids — is what keeps pair work linear, so the
    * combination is safe at any corpus size.
    */
  def semanticDedupScaled(embeddings: DataFrame, vecCol: String = "embedding",
                          idCol: String = "vec_id",
                          targetClusterSize: Int = 1024,
                          threshold: Double = 0.3,
                          maxClusterSize: Int = 4096,
                          subMaxBits: Int = 8, dim: Int = 64,
                          kmeansIters: Int = 10, sampleN: Int = 4096): DataFrame = {
    // ONE corpus pass yields both the training sample and the exact count
    // that sizes k — no separate count() action.
    val (n, sample) = sampleWithCount(embeddings, sampleN, idCol, vecCol)
    require(sample.nonEmpty, "empty corpus")
    val k = math.max(1L, math.min(n / math.max(targetClusterSize, 1),
      sampleN.toLong)).toInt
    val cents = lloyd(sample, k, kmeansIters).toSeq
      .zipWithIndex.map { case (cv, i) => (i.toLong, cv.toSeq) }
    val e = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
    markDups(assignToCentroids(e, cents), threshold, maxClusterSize,
      subMaxBits, dim)
  }

  /** Nearest-centroid assignment, deterministic: argmax over
    * round(cos, 6) with ties to the smallest centroid id. The centroid
    * set is driver-resident (bounded model state), so the assignment is
    * ONE per-row constant-size codegen kernel
    * ([[graft.functions.VectorExpressions.NearestCentroidExpr]]) — the
    * former broadcast join + max(struct) aggregation materialized an n×k
    * candidate table and paid a full shuffle keyed on id for the argmax.
    * Input: (id, v) rows + driver (cid, centroid) pairs (cids ascending);
    * output: (id, cluster, v) — values identical to the join+argmax form
    * (same round-6 cosine, same smallest-cid tie-break).
    */
  private def assignToCentroids(e: DataFrame,
                                cents: Seq[(Long, Seq[Double])]): DataFrame =
    e.select(col("id"),
      org.apache.spark.sql.graft.PlanExec.column(
        graft.functions.VectorExpressions.NearestCentroidExpr(
          org.apache.spark.sql.graft.PlanExec.expression(
            col("v").cast("array<double>")),
          cents.map(_._2), cents.map(_._1), cosineMode = true))
        .as("cluster"),
      col("v"))

  /** (id, cluster, v) → (id, cluster, v, _sub): the adaptive LSH
    * sub-bucket key, "" when the cluster is within the cap (or no cap).
    * Spec hook — [[markDups]] joins on (cluster, _sub).
    */
  private[graft] def clusterSubBuckets(assigned: DataFrame, maxClusterSize: Int,
                                       subMaxBits: Int, dim: Int): DataFrame =
    if (maxClusterSize <= 0) assigned.withColumn("_sub", lit(""))
    else {
      val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("_csz"))
      // ⌈log₂⌈csz/max⌉⌉ via integer ceil-division + binary bit length —
      // exact in any engine, unlike a floating log2 at power-of-two edges
      val q = expr(s"(_csz + ${maxClusterSize - 1}) div $maxClusterSize")
      val bits = when(q <= 1, lit(0))
        .otherwise(least(length(bin(q - 1)), lit(subMaxBits)))
      assigned.join(broadcast(sizes), Seq("cluster"))
        .withColumn("_sub",
          VectorFunctions.lshSignature(col("v"), subMaxBits, dim)
            .substr(lit(1), bits))
        .drop("_csz")
    }

  /** Within-(cluster, sub-bucket) lower-id near-dup marking shared by both
    * SemDeDup entry points.
    */
  private def markDups(assigned: DataFrame, threshold: Double,
                       maxClusterSize: Int, subMaxBits: Int, dim: Int): DataFrame = {
    val withSub = clusterSubBuckets(assigned, maxClusterSize, subMaxBits, dim)
    val a = withSub.select(col("cluster"), col("_sub"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = withSub.select(col("cluster"), col("_sub"),
      col("id").as("id_b"), col("v").as("v_b"))
    val dups = a.join(b, Seq("cluster", "_sub"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(VectorFunctions.cosine(col("v_a"), col("v_b")), 6) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.select(col("id"), col("cluster"))
      .join(dups.withColumn("_d", lit(1)), Seq("id"), "left")
      .select(col("id"), col("cluster"), col("_d").isNotNull.as("is_dup"))
  }

  // ------------------------------------------- product quantization (PQ)

  /** Train product-quantization codebooks (Jégou et al. 2011) on a bounded
    * driver-side sample: the vector splits into `m` contiguous sub-spaces
    * of dim/m dims; each sub-space gets `k` centroids from the same
    * deterministic Lloyd's used for IVF. A 64-dim float vector (256 B)
    * encodes to m bytes (8 at m=8, k≤256) — the compression that makes a
    * 100 TB embedding store scannable. `iters = 0` returns the
    * every-(n/k)-th-sample init verbatim — data-dependent but exactly
    * reconstructible by the q76 SQL oracle; production uses iters ≥ 10
    * (recall measured in SimilaritySpec).
    */
  def trainPqCodebooks(corpus: DataFrame, m: Int, k: Int, dim: Int,
                       iters: Int = 10, sampleN: Int = 4096,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m sub-spaces")
    val sub = dim / m
    val sample = collectSample(corpus, sampleN, idCol, vecCol)
    require(sample.nonEmpty, "empty corpus")
    (0 until m).map { mi =>
      val sliced = sample.map(v => v.slice(mi * sub, (mi + 1) * sub))
      lloyd(sliced, k, iters).map(_.toSeq).toSeq
    }
  }

  /** The PQ code array for vector column `v` — the per-row expression both
    * [[pqEncode]] and [[ivfAdcTopK]] project: nearest sub-space centroid
    * per sub-space, first-match ties. Since round 8 this resolves to the
    * NATIVE codegen'd expression ([[graft.functions.PqExpressions]],
    * registered by GraftExtensions) — three nested Java loops instead of
    * an m·k·sub lambda tree, bit-identical by the fold-order contract
    * (FunctionsSpec pins native == lambda on real vectors; the q76/q79
    * oracles replay the same math in SQL, so they pin it too).
    */
  private[graft] def pqCodes(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    call_function("graft_pq_encode", v, typedLit(codebooks))

  /** The lambda-tree form of [[pqCodes]] — any engine's `aggregate`/
    * `transform` can express it, no extension registration needed; kept as
    * the executable spec the native expression is pinned against.
    */
  private[graft] def pqCodesLambda(v: Column,
                                   codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.length
    val k = codebooks.head.length
    val sub = codebooks.head.head.length
    val cb = typedLit(codebooks)
    def subDist(mIdx: Column, kIdx: Column): Column =
      aggregate(sequence(lit(1), lit(sub)), lit(0.0), (acc, i) => {
        val a = element_at(v, (mIdx * sub + i).cast("int")).cast("double")
        val b = element_at(
          element_at(element_at(cb, (mIdx + 1).cast("int")), kIdx.cast("int")),
          i.cast("int"))
        acc + (a - b) * (a - b)
      })
    transform(sequence(lit(0), lit(m - 1)), mIdx => {
      val dists = transform(sequence(lit(1), lit(k)), kIdx => subDist(mIdx, kIdx))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
  }

  /** PQ-encode each vector into `m` small codes: ONE linear pass of
    * per-row expression work — no shuffle, no row blowup, codebooks ride
    * along as a literal.
    */
  def pqEncode(corpus: DataFrame, codebooks: Seq[Seq[Seq[Double]]],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("id"),
      pqCodes(col(vecCol), codebooks).as("codes"))

  /** The ADC (asymmetric) squared-L2 distance between a full-precision
    * query in column `qvCol` and a PQ code array in column `codes`.
    * Native codegen'd expression since round 8 (see [[pqCodes]]);
    * [[adcDistLambda]] is the engine-portable executable spec.
    */
  private[graft] def adcDist(codebooks: Seq[Seq[Seq[Double]]],
                             qvCol: String = "qv"): Column =
    call_function("graft_adc_dist", col("codes"), col(qvCol),
      typedLit(codebooks))

  /** Lambda-tree form of [[adcDist]]: m codebook lookups, each an ordered
    * left fold over the sub-space — bit-exact across engines.
    */
  private[graft] def adcDistLambda(codebooks: Seq[Seq[Seq[Double]]],
                                   qvCol: String = "qv"): Column = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val cb = typedLit(codebooks)
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, mIdx) => {
      val cent = element_at(element_at(cb, (mIdx + 1).cast("int")),
        (element_at(col("codes"), (mIdx + 1).cast("int")) + 1).cast("int"))
      acc + aggregate(sequence(lit(1), lit(sub)), lit(0.0), (a2, i) => {
        val qa = element_at(col(qvCol), (mIdx * sub + i).cast("int")).cast("double")
        val cv = element_at(cent, i.cast("int"))
        a2 + (qa - cv) * (qa - cv)
      })
    })
  }

  /** Exact, skew-safe per-query top-k (the `Quality.domainCap` two-phase
    * pattern applied to ANN ranking): a plain
    * `row_number() over (partition by query_id)` would sort EVERY
    * candidate of a query in one task — with an unpruned corpus that is
    * the whole table per query. Phase 1 salts each candidate by
    * `xxhash64(id) mod nSalt` and keeps the local top-k of every
    * (query, salt) group; every global top-k row is necessarily top-k in
    * its own salt bucket, so nothing is lost. Phase 2 ranks the ≤ k·nSalt
    * survivors per query — bounded regardless of candidate-set size.
    * `ord` must be a total order (ties broken by id) for determinism.
    */
  private[operators] def saltedTopK(scored: DataFrame, k: Int, ord: Seq[Column],
                                    idCol: String, queryIdCol: String,
                                    nSalt: Int = 64): DataFrame = {
    val w1 = Window.partitionBy(col(queryIdCol), col("_salt")).orderBy(ord: _*)
    val w2 = Window.partitionBy(col(queryIdCol)).orderBy(ord: _*)
    scored
      .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(nSalt.toLong)))
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= k)
      .drop("_salt", "_r1")
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
  }

  /** Coarse-then-exact top-k through a Johnson–Lindenstrauss projection
    * ([[graft.functions.VectorFunctions.jlProject]]): the corpus and the
    * queries are each projected ONCE to `outDim` dimensions, the
    * broadcast compare ranks by PROJECTED cosine at outDim multiplies
    * per pair (vs `dim` for [[bruteForceTopK]] — a 4× pair-cost cut at
    * 64→16), and only the top `candidates` per query are re-ranked by
    * exact cosine in full space. With `candidates >= |corpus|` the
    * coarse pass keeps everything and the result EQUALS bruteForceTopK
    * (the spec's sharp contract); the recall/cost trade at smaller
    * candidate budgets is measurable with [[recallAtK]].
    *
    * Output: (queryIdCol, idCol, cos, rank) — cos is the EXACT cosine.
    */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    dim: Int, outDim: Int = 16, candidates: Int = 50,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    queryIdCol: String = "query_id"): DataFrame = {
    require(k >= 1 && candidates >= k,
      s"projectedTopK: need candidates=$candidates >= k=$k >= 1")
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"),
      VectorFunctions.jlProject(col(vecCol), outDim, dim).as("_cp"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("_qv"),
      VectorFunctions.jlProject(col(vecCol), outDim, dim).as("_qp"))
    val coarse = c.join(broadcast(q))
      .withColumn("_pcos", VectorFunctions.cosine(col("_cp"), col("_qp")))
    val cand = saltedTopK(coarse, candidates,
        Seq(col("_pcos").desc, col(idCol)), idCol, queryIdCol)
      .drop("rank", "_pcos", "_cp", "_qp")
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos").desc, col(idCol))
    cand.withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** ADC (asymmetric-distance) top-k over the PQ-encoded corpus: queries
    * stay full precision, each corpus row costs m codebook lookups
    * instead of dim multiplies against raw floats — the standard
    * recall/throughput trade of a PQ index. Queries broadcast; the final
    * selection is the salted two-phase top-k ([[saltedTopK]]), so no task
    * ever sorts more than k·nSalt rows per query even though every
    * corpus row is a candidate (this is the flat-scan PQ variant;
    * [[ivfAdcTopK]] additionally prunes candidates to probed IVF cells).
    * Output: (query_id, rank, id, dist) with dist = rounded squared L2.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             codebooks: Seq[Seq[Seq[Double]]], k: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val enc = pqEncode(corpus, codebooks, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = enc.join(broadcast(q))
      .withColumn("dist", round(adcDist(codebooks), 6))
    saltedTopK(scored, k, Seq(col("dist"), col("id")), "id", "query_id")
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
  }

  /** Driver-side twin of the [[probeCells]] argmax (round-6 cosine,
    * smallest cell on ties) for training-time residual computation.
    */
  private def nearestCellDriver(v: Array[Double],
                                centroids: Seq[Seq[Double]]): Int = {
    var best = 0; var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val r = BigDecimal(VectorFunctions.cosineDriver(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(v),
          centroids(c)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (r > bestCos) { best = c; bestCos = r } // strict > keeps smallest c
      c += 1
    }
    best
  }

  /** Train PQ codebooks on RESIDUALS (v − assigned coarse centroid) —
    * FAISS `IndexIVFPQ`'s default (`by_residual`): residual vectors have
    * far less variance than raw vectors (the coarse quantizer already
    * explains cell-level structure), so the same m×k codebook budget
    * yields a finer quantization. Same bounded driver-side sample and
    * deterministic Lloyd's as [[trainPqCodebooks]]; pass the result to
    * [[ivfAdcTopK]] with `byResidual = true` (and the SAME `centroids`).
    */
  def trainPqCodebooksResidual(corpus: DataFrame, centroids: Seq[Seq[Double]],
                               m: Int, k: Int, dim: Int, iters: Int = 10,
                               sampleN: Int = 4096, idCol: String = "vec_id",
                               vecCol: String = "embedding"): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m sub-spaces")
    val sub = dim / m
    val sample = collectSample(corpus, sampleN, idCol, vecCol)
    require(sample.nonEmpty, "empty corpus")
    val residuals = sample.map { v =>
      val cent = centroids(nearestCellDriver(v, centroids))
      Array.tabulate(v.length)(i => v(i) - cent(i))
    }
    (0 until m).map { mi =>
      val sliced = residuals.map(v => v.slice(mi * sub, (mi + 1) * sub))
      lloyd(sliced, k, iters).map(_.toSeq).toSeq
    }
  }

  /** The `nProbe` nearest coarse cells of vector `v`, by descending
    * round(cosine, 6) with ties to the SMALLEST cell id (struct sort on
    * (cos, −cell), reversed) — deterministic and SQL-replayable.
    */
  private def probeCells(v: Column, centroids: Seq[Seq[Double]],
                         nProbe: Int): Column = {
    val cands = centroids.zipWithIndex.map { case (cvec, i) =>
      struct(round(VectorFunctions.cosine(v, lit(cvec.toArray)), 6).as("cos"),
        lit(-i).as("negcell"))
    }
    transform(slice(reverse(array_sort(array(cands: _*))), 1, nProbe),
      s => -s.getField("negcell"))
  }

  /** IVF-ADC (FAISS `IndexIVFPQ`, Jégou et al. 2011 §V): the composition
    * that survives 100 TB — [[ivfTopK]] prunes candidates but scores raw
    * floats (full-width vectors shuffle into the join); [[pqTopK]] scores
    * compressed codes but scans the whole corpus per query. Here the
    * corpus is PQ-encoded AND coarse-quantized in ONE linear projection
    * (codes + nearest cell, no shuffle), each query probes its `nProbe`
    * nearest cells, candidates are the probed cells' rows only — the join
    * carries m-byte codes, not dim-float vectors — and ADC scoring + the
    * salted two-phase [[saltedTopK]] bound every task by k·nSalt rows per
    * query regardless of cell skew.
    *
    * Centroids come from [[sampledKMeans]], codebooks from
    * [[trainPqCodebooks]] — both bounded driver-side training passes.
    * Output: (query_id, rank, id, dist) with dist = rounded ADC squared
    * L2 (recall vs exact search measured in SimilaritySpec).
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame,
                 centroids: Seq[Seq[Double]],
                 codebooks: Seq[Seq[Seq[Double]]], k: Int, nProbe: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 queryIdCol: String = "query_id",
                 byResidual: Boolean = false): DataFrame =
    adcServe(encodeWithCells(corpus, centroids, codebooks, byResidual,
        idCol, vecCol),
      queries, centroids, codebooks, k, nProbe, vecCol, queryIdCol,
      byResidual)

  /** FAISS `IndexRefineFlat` composition: IVF-ADC retrieves `k·refineFactor`
    * candidates on compressed codes (cheap, slightly lossy), then the
    * candidates alone are re-scored EXACTLY against the raw vectors and
    * re-ranked to the final k — recovering most of the quantization error
    * for a bounded extra cost. The candidate set (|queries|·k·refineFactor
    * rows of (query_id, id)) broadcasts; the raw corpus is scanned ONCE
    * linearly to pick up candidate vectors — full-width vectors never
    * shuffle, and no task holds more than the salted-top-k bound.
    */
  def ivfAdcRefineTopK(corpus: DataFrame, queries: DataFrame,
                       centroids: Seq[Seq[Double]],
                       codebooks: Seq[Seq[Seq[Double]]], k: Int,
                       refineFactor: Int = 4, nProbe: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       queryIdCol: String = "query_id",
                       byResidual: Boolean = false): DataFrame = {
    val coarse = ivfAdcTopK(corpus, queries, centroids, codebooks,
      k * refineFactor, nProbe, idCol, vecCol, queryIdCol, byResidual)
    refineExact(coarse, corpus, queries, k, idCol, vecCol, queryIdCol)
  }

  /** Exact re-rank of an ANN candidate list ((query_id, id) plus anything)
    * against the raw vectors: broadcast the bounded candidate set, one
    * linear corpus scan for the vectors, rounded exact squared-L2, salted
    * top-k. Output: (query_id, rank, id, dist).
    */
  private[graft] def refineExact(candidates: DataFrame, corpus: DataFrame,
                                 queries: DataFrame, k: Int,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding",
                                 queryIdCol: String = "query_id"): DataFrame = {
    val cand = candidates.select(col("query_id"), col("id"))
    val qv = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("_qv"))
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("_cv"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("id"),
        round(VectorFunctions.sqL2(col("_cv"), col("_qv")), 6).as("dist"))
    saltedTopK(scored, k, Seq(col("dist"), col("id")), "id", "query_id")
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
  }

  /** v − centroid[cell], the frame shift residual-mode PQ quantizes in. */
  private def cellResidual(v: Column, cell: Column,
                           centroids: Seq[Seq[Double]]): Column =
    zip_with(VectorFunctions.asDouble(v),
      element_at(typedLit(centroids), (cell + 1).cast("int")), (a, b) => a - b)

  /** The IVF-ADC corpus side as a persistable table: (id, codes, cell) in
    * ONE linear projection — the exact rows [[graft.operators.AnnIndex]]
    * saves and [[adcServe]] scores, so a saved index reproduces the
    * in-memory search bit for bit.
    */
  private[graft] def encodeWithCells(corpus: DataFrame,
                                     centroids: Seq[Seq[Double]],
                                     codebooks: Seq[Seq[Seq[Double]]],
                                     byResidual: Boolean,
                                     idCol: String = "vec_id",
                                     vecCol: String = "embedding"): DataFrame = {
    // residual mode (codebooks from trainPqCodebooksResidual): corpus rows
    // encode v − centroid[cell]; the query side subtracts the PROBED
    // cell's centroid, so ADC compares residuals in the same frame —
    // still one linear projection per side, no extra shuffle.
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("_v"),
      element_at(probeCells(col(vecCol), centroids, 1), 1).as("cell"))
    if (byResidual)
      // the residual must be its OWN projection: pqCodes reads its input
      // m·k·sub times, and an inline zip_with would be re-evaluated per
      // read (measured 8× slower at sf0.1). As a multiply-referenced
      // non-trivial alias it survives CollapseProject, so the subtract
      // runs once per row.
      base.select(col("id"),
          cellResidual(col("_v"), col("cell"), centroids).as("_res"),
          col("cell"))
        .select(col("id"), pqCodes(col("_res"), codebooks).as("codes"),
          col("cell"))
    else
      base.select(col("id"), pqCodes(col("_v"), codebooks).as("codes"),
        col("cell"))
  }

  /** Probe + ADC-score + salted-top-k over an ALREADY-ENCODED corpus
    * (columns id, codes, cell — from [[encodeWithCells]] live or read back
    * from a saved [[graft.operators.AnnIndex]]).
    */
  private[graft] def adcServe(encoded: DataFrame, queries: DataFrame,
                              centroids: Seq[Seq[Double]],
                              codebooks: Seq[Seq[Seq[Double]]], k: Int,
                              nProbe: Int,
                              vecCol: String = "embedding",
                              queryIdCol: String = "query_id",
                              byResidual: Boolean = false): DataFrame = {
    val q0 = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("qv"),
      explode(probeCells(col(vecCol), centroids, nProbe)).as("cell"))
    val q = if (byResidual)
      q0.withColumn("qres", cellResidual(col("qv"), col("cell"), centroids))
    else q0
    val scored = encoded.join(broadcast(q), Seq("cell"))
      .withColumn("dist",
        round(adcDist(codebooks, if (byResidual) "qres" else "qv"), 6))
    saltedTopK(scored, k, Seq(col("dist"), col("id")), "id", "query_id")
      .select(col("query_id"), col("rank"), col("id"), col("dist"))
  }

  /** k-NN GRAPH over the whole corpus — ANN where the query set IS the
    * corpus, so nothing is broadcastable (every `*TopK` above broadcasts a
    * small query side; a k-NN graph is the workhorse behind SemDeDup-style
    * clustering, connected-component near-dup resolution, and diversity
    * sampling, and needs a corpus×corpus shape).
    *
    * Plan: per-row multi-table LSH signatures (table t uses hyperplanes
    * t·nBits … t·nBits+nBits−1 — the `lshSignaturesMulti` family, here as
    * a stateless codegen'd expression), self-join on (table, bucket) —
    * shuffles only same-bucket rows, never n² — then `minhashLshPairs`'s
    * discipline: DISTINCT id pairs first (a pair colliding in c tables
    * appears c times), vectors joined back once per pair, one exact cosine
    * per pair, and the per-source top-k as the salted two-phase selection.
    * Every stage is a bounded-group shuffle; no broadcast of anything
    * corpus-sized, no window over an unbounded partition.
    *
    * HOT BUCKETS: a bucket of B members emits B² candidate rows, and on
    * duplicate-heavy crawl data — exactly the corpus a k-NN graph serves —
    * the biggest buckets are the near-identical ones, so one degenerate
    * bucket concentrates quadratic work in one task. Content-based
    * sub-splitting (the SemDeDup [[clusterSubBuckets]] trick) cannot help
    * here: identical vectors have identical signatures no matter how many
    * bits are appended. Instead, any bucket over `maxBucketSize` degrades
    * to a STAR: every member pairs only with the bucket's min-id member
    * (both directions, so each member still receives an edge). That is a
    * skew-safe `min` aggregation plus a linear join — per-bucket candidate
    * rows are ≤ maxBucketSize² for small buckets and exactly 2(B−1) for
    * hot ones. In a hot bucket members are near-identical, so the star
    * edges carry cos ≈ 1 and connected components recover the closure;
    * non-min members see k-fewer distinct neighbors from that bucket,
    * which only matters for corpora that are ONE giant duplicate class.
    * `maxBucketSize <= 0` disables the cap (the pre-round-8 behavior).
    *
    * Output: (id, neighbor, cos, rank), rank 1..k per id, both directions
    * present (the bucket join is symmetric). Recall is tuned by
    * nBits/nTables exactly as for [[lshTopKMulti]].
    */
  def knnGraph(embeddings: DataFrame, k: Int, dim: Int, nBits: Int = 6,
               nTables: Int = 8, idCol: String = "vec_id",
               vecCol: String = "embedding",
               maxBucketSize: Int = 4096): DataFrame = {
    // one fused codegen kernel per table (all nBits plane dots in one pass
    // over the vector) — the per-bit when/concat chain built nTables·nBits
    // interpreted HOF folds per row
    val tables = (0 until nTables).map { t =>
      struct(lit(t).as("t"),
        VectorFunctions.lshBits(col(vecCol), t * nBits, nBits, dim)
          .as("bucket"))
    }
    val sigs = embeddings
      .select(col(idCol).as("id"), explode(array(tables: _*)).as("_tb"))
      .select(col("id"), col("_tb.t").as("_t"), col("_tb.bucket").as("bucket"))
    val cand = knnCandidates(sigs, maxBucketSize)
    val vtab = embeddings.select(col(idCol).as("id"),
      VectorFunctions.asDouble(col(vecCol)).as("_v"))
    val scored = cand
      .join(vtab, Seq("id"))
      .join(vtab.select(col("id").as("nb"), col("_v").as("_nv")), Seq("nb"))
      .withColumn("cos", VectorFunctions.cosine(col("_v"), col("_nv")))
    saltedTopK(scored, k, Seq(col("cos").desc, col("nb")), "nb", "id")
      .select(col("id"), col("nb").as("neighbor"), col("cos"), col("rank"))
  }

  /** Distinct candidate (id, nb) pairs from the (table, bucket) signature
    * rows, with the hot-bucket star cap described on [[knnGraph]]. Spec
    * hook — SimilaritySpec counts candidates on a degenerate corpus.
    */
  private[graft] def knnCandidates(sigs: DataFrame,
                                   maxBucketSize: Int): DataFrame = {
    val raw =
      if (maxBucketSize <= 0)
        sigs.join(sigs.select(col("_t"), col("bucket"), col("id").as("nb")),
          Seq("_t", "bucket"))
      else {
        val stats = sigs.groupBy(col("_t"), col("bucket"))
          .agg(count(lit(1)).as("_bsz"), min(col("id")).as("_bmin"))
        val sized = sigs.join(stats, Seq("_t", "bucket"))
        val small = sized.filter(col("_bsz") <= maxBucketSize)
        val smallPairs = small
          .join(small.select(col("_t"), col("bucket"), col("id").as("nb")),
            Seq("_t", "bucket"))
        val hot = sized.filter(col("_bsz") > maxBucketSize &&
          col("id") =!= col("_bmin"))
        smallPairs.select(col("id"), col("nb"))
          .union(hot.select(col("id"), col("_bmin").as("nb")))
          .union(hot.select(col("_bmin").as("id"), col("id").as("nb")))
      }
    raw.filter(col("id") =!= col("nb")).select(col("id"), col("nb")).distinct()
  }
}
