package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Checkpoints.EagerOps

/** Near-duplicate CLUSTER resolution: candidate pairs (id_a, id_b) from any
  * of the Dedup blockers only say "these two are alike" — choosing which
  * documents to keep needs the transitive closure (A~B, B~C ⇒ one cluster).
  *
  * Two distributed algorithms, both driver-state-free:
  *
  *  - [[components]] — smallest-id label propagation. Rounds = graph
  *    DIAMETER; near-dup graphs are cliques or short chains (3-5 rounds in
  *    practice), and each round is one join + one aggregation.
  *  - [[starComponents]] — alternating large-star/small-star contraction
  *    (the MapReduce-CC formulation of Kiveris et al., also used by
  *    GraphFrames): O(log n) rounds on ANY graph, including the
  *    adversarial long-chain case where propagation needs O(n) rounds
  *    (a 1024-node chain: ~6 star rounds vs 1023 propagation rounds).
  *
  * Use `components` when duplicate clusters are known to be shallow (the
  * common corpus case); `starComponents` when chain-shaped components are
  * possible (transitive similarity drift) or the diameter is unknown.
  */
object Clusters {

  /** Connected components over an undirected pair list.
    *
    * @param pairs    (id_a, id_b) candidate/verified duplicate pairs
    * @param vertices one-column DataFrame of ALL vertex ids (documents
    *                 with no pair become singleton clusters)
    * @return (id, cluster) — cluster = smallest id in the component
    */
  def components(pairs: DataFrame, vertices: DataFrame,
                 idCol: String = "id", maxIters: Int = 30): DataFrame =
    componentsIters(pairs, vertices, idCol, maxIters)._1

  /** [[components]] plus the executed round count (spec hook). */
  private[graft] def componentsIters(pairs: DataFrame, vertices: DataFrame,
                                     idCol: String = "id",
                                     maxIters: Int = 30): (DataFrame, Int) = {
    // The caller's `pairs` is usually an EXPENSIVE pipeline (PPJoin,
    // LSH-bucketed verification); materialize its 2-column projection once
    // so the two-direction union below doesn't evaluate that pipeline
    // twice (union branches don't share subplans).
    val rawPairs = pairs.select(col("id_a"), col("id_b")).eagerCheckpoint()
    // undirected edge list, both directions, deduplicated; materialized
    // once (localCheckpoint) — every round re-reads it
    val edges = rawPairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(rawPairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .eagerCheckpoint()
    // rawPairs only feeds the edge build — free its blocks immediately
    Checkpoints.release(rawPairs)
    // Each round MUST truncate lineage (eager localCheckpoint): chaining
    // round N's plan onto round N-1's makes the logical plan — and its
    // analysis/planning cost — grow exponentially with the iteration
    // count (observed as an OOM in plan stringification long before any
    // data pressure). On a production cluster with unreliable executors,
    // swap for reliable checkpoint(dir) at a cadence.
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("cluster"))
      .eagerCheckpoint()
    val labelType = labels.schema("cluster").dataType
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // candidate label per vertex: min over (own, neighbours' labels).
      // The previous label rides along as `_old` (max() picks the single
      // non-null own-row value), and the changed-row count rides the
      // checkpoint job itself as an OBSERVED metric — convergence costs
      // zero extra actions per round (the former isEmpty probe was one
      // more job per round across every closure-bearing query).
      val own = labels.select(col("id"), col("cluster"),
        col("cluster").as("_old"))
      val fromNbrs = edges
        .join(labels.select(col("id").as("src"), col("cluster")), Seq("src"))
        .select(col("dst").as("id"), col("cluster"),
          lit(null).cast(labelType).as("_old"))
      val obs = new org.apache.spark.sql.Observation()
      val next = own.union(fromNbrs)
        .groupBy(col("id"))
        .agg(min(col("cluster")).as("cluster"), max(col("_old")).as("_old"))
        // same predicate the isEmpty probe filtered on; a null comparison
        // (edge-only vertex, _old null) counts as unchanged both ways
        .observe(obs, sum(when(col("cluster") =!= col("_old"), 1L))
          .as("_changed"))
        .eagerCheckpoint()
      // round N is materialized: round N-1's blocks are dead — free them
      // now instead of waiting for GC + ContextCleaner
      Checkpoints.release(labels)
      converged = obs.get("_changed") match {
        case null => true
        case n: java.lang.Long => n.longValue() == 0L
        case n: Number => n.longValue() == 0L
      }
      labels = next.select(col("id"), col("cluster"))
      iter += 1
    }
    // the returned labels plan reads only the final checkpoint
    Checkpoints.release(edges)
    (labels, iter)
  }

  /** Connected components by alternating large-star/small-star contraction:
    * same contract as [[components]], O(log n) rounds on any graph shape.
    *
    * Invariant: the edge set is kept canonical — (hi, lo) with hi > lo,
    * distinct. Large-star hangs every strictly-larger neighbour of a node
    * onto its neighbourhood minimum; small-star re-hangs the smaller
    * neighbourhood onto the minimum. The unique fixpoint is a union of
    * stars rooted at each component's smallest id.
    *
    * Convergence is read off ONE aggregation per round — the signature
    * (count, sum(hi + lo)) — and for numeric ids that test is EXACT, not
    * probabilistic:
    *  1. |large| ≤ |edges|: each canonical edge yields exactly one directed
    *     (u, v) with v > u, hence one output edge pre-distinct; distinct
    *     only removes.
    *  2. |next| ≤ |large|: each large edge yields at most one leaf, every
    *     hi-group converts one edge (its lo == m) into the single root.
    *  3. So count(next) == count(edges) forces no distinct-collapse in
    *     either stage — a pointwise edge map under which hi + lo never
    *     increases (large-star keeps hi and lowers lo to the neighbourhood
    *     min; small-star leaves map (hi, lo) → (lo, m) with m < lo < hi;
    *     roots map to themselves).
    *  4. Equal count + equal sum(hi + lo) then forces every pointwise
    *     difference to zero — i.e. next == edges exactly.
    * Non-numeric ids fall back to sum(xxhash64(hi, lo)), the same test with
    * a ~2⁻⁶⁴-per-round false-convergence probability.
    */
  def starComponents(pairs: DataFrame, vertices: DataFrame,
                     idCol: String = "id", maxIters: Int = 50): DataFrame =
    starComponentsIters(pairs, vertices, idCol, maxIters)._1

  /** [[starComponents]] plus the executed round count (spec hook). */
  private[graft] def starComponentsIters(pairs: DataFrame, vertices: DataFrame,
                                         idCol: String = "id",
                                         maxIters: Int = 50): (DataFrame, Int) = {
    // `pairs` is referenced three times below (edge init + both endpoint
    // unions in allVerts); one localCheckpoint of the 2-column projection
    // keeps the caller's expensive pair pipeline from running three times.
    val rawPairs = pairs.select(col("id_a"), col("id_b")).eagerCheckpoint()
    // the set signature rides each edge set's CHECKPOINT job as observed
    // metrics — zero extra actions per round (was one agg job per round)
    val numericIds = rawPairs.schema("id_a").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def sigExprs: Seq[org.apache.spark.sql.Column] = {
      val s =
        if (numericIds)
          sum(col("hi").cast("decimal(38,0)") + col("lo").cast("decimal(38,0)"))
        else sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)"))
      Seq(count(lit(1)).as("_n"), s.as("_s"))
    }
    def readSig(obs: org.apache.spark.sql.Observation): (Long, java.math.BigDecimal) = {
      val m = obs.get
      val n = m("_n") match { case l: java.lang.Long => l.longValue()
                              case x: Number => x.longValue() }
      val s = m("_s") match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
        case d: scala.math.BigDecimal => d.bigDecimal
      }
      (n, s)
    }
    val obs0 = new org.apache.spark.sql.Observation()
    var edges = rawPairs.filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .distinct()
      .observe(obs0, sigExprs.head, sigExprs.tail: _*)
      .eagerCheckpoint()
    var edgeSig = readSig(obs0)
    var iter = 0
    var converged = edgeSig._1 == 0L
    while (!converged && iter < maxIters) {
      // large-star: for every node u, m = min(Γ(u) ∪ {u}); every neighbour
      // v > u re-hangs as {v, m}. Edges to smaller neighbours re-emerge
      // from those neighbours' own groups — connectivity is preserved
      // through the shared minima.
      val nbrs = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val m = nbrs.groupBy(col("u")).agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("m"))
      val large = nbrs.join(m, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo")) // m ≤ u < v ⇒ hi > lo
        .distinct()
        .eagerCheckpoint()
      // small-star: edges are (hi, lo) oriented, so Γ⁻(hi) = its smaller
      // neighbours; all re-hang onto m = min(Γ⁻(hi)), plus {hi, m} itself.
      val m2 = large.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val leaves = large.join(m2, Seq("hi")).filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo")) // m ≤ lo ⇒ hi > lo
      val roots = m2.select(col("hi"), col("m").as("lo"))
      val obsN = new org.apache.spark.sql.Observation()
      val next = leaves.union(roots)
        .distinct()
        .observe(obsN, sigExprs.head, sigExprs.tail: _*)
        .eagerCheckpoint()
      // next is materialized: this round's large-star intermediate and
      // the previous round's edge set are dead — free their blocks now
      Checkpoints.release(large)
      Checkpoints.release(edges)
      val nextSig = readSig(obsN)
      converged = nextSig._1 == edgeSig._1 &&
        nextSig._2.compareTo(edgeSig._2) == 0
      edges = next
      edgeSig = nextSig
      iter += 1
    }
    // fixpoint = stars {leaf → component-min root}; group in case maxIters
    // cut contraction short (then a node may still carry several parents)
    val stars = edges.groupBy(col("hi")).agg(min(col("lo")).as("cluster"))
      .withColumnRenamed("hi", "id")
    // same contract as `components`: edge endpoints absent from `vertices`
    // still get labels (label propagation admits them via the neighbour
    // union; a vertices-only left join would silently drop them here)
    val allVerts = vertices.select(col(idCol).as("id"))
      .union(rawPairs.select(col("id_a").as("id")))
      .union(rawPairs.select(col("id_b").as("id")))
      .distinct()
    val labels = allVerts
      .join(stars, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
    (labels, iter)
  }

  /** Keep-list from clusters: the smallest id per cluster survives —
    * composes `components` with the same keep-smallest convention as
    * `Dedup.exactGroups`.
    */
  def keepSet(pairs: DataFrame, vertices: DataFrame,
              idCol: String = "id"): DataFrame =
    components(pairs, vertices, idCol)
      .groupBy(col("cluster"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_members"))

  /** Quality-aware canonical selection: keep each cluster's BEST member
    * (highest score, smallest id on ties) instead of the smallest id —
    * what a production dedup actually wants ("of these near-identical
    * pages, keep the cleanest"). Skew-safe: the argmax is a single
    * `min(struct(−score, id))` aggregation (the q68 pattern) — a hot
    * cluster combines map-side, nothing windows over the cluster key. The
    * NEGATED side is the score (numeric by contract), not the id, so ids
    * keep any orderable type — string doc ids work, and the smallest-id
    * tie-break is the type's own ordering. Double negation restores the
    * score bit-exactly for all non-NaN doubles. Input `labels` =
    * [[components]]/[[starComponents]] output (id, cluster); `scores` =
    * (idCol, scoreCol), one row per vertex. Returns (cluster, keep_id,
    * best_score, n_members).
    *
    * NULL contract: a NULL score LOSES to every real score (its negated
    * side coalesces to +Infinity, the worst struct ordering position —
    * struct min would otherwise sort a null field FIRST and let an
    * unscored member win its cluster). A cluster whose every member is
    * NULL-scored still appears — smallest id kept, best_score NULL,
    * n_members counting all members. A literal −Infinity score is
    * indistinguishable from NULL by construction.
    */
  /** Community detection by synchronous label propagation (Raghavan et
    * al. 2007), deterministic variant: every node starts as its own
    * label; each round it adopts the most frequent label among its
    * neighbors — count desc, then SMALLEST label, so there is no random
    * tie-break and the q127 oracle can unroll the rounds in SQL. Unlike
    * [[components]], which merges anything connected, LP respects edge
    * DENSITY: two tight kNN communities linked by a thin bridge keep
    * distinct labels — the grouping a mixture/curriculum planner wants
    * from a kNN graph, where transitive closure would collapse almost
    * everything into one blob.
    *
    * Scale: per round, one join of the symmetrized edge list against the
    * node-keyed label table, one (node, label) count (map-side combined),
    * and one per-node `max(struct(cnt, −label))` argmax — no windows, no
    * driver state. Rounds are fixed and small (LP converges in a few
    * sweeps); lineage is truncated per round exactly like
    * [[componentsIters]] (the exponential-plan trap documented there).
    */
  def labelPropagation(pairs: DataFrame, vertices: DataFrame, rounds: Int,
                       idCol: String = "id"): DataFrame = {
    val rawPairs = pairs.select(col("id_a"), col("id_b"))
      .eagerCheckpoint()
    val sym = rawPairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .union(rawPairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct()
      .eagerCheckpoint()
    Checkpoints.release(rawPairs)
    var labels = vertices
      .select(col(idCol).as("id"), col(idCol).as("label"))
      .eagerCheckpoint()
    for (_ <- 1 to rounds) {
      val top = sym
        .join(labels.select(col("id").as("b"), col("label")), Seq("b"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("_cnt"))
        .groupBy(col("a"))
        .agg(max(struct(col("_cnt"), (-col("label")).as("_nl"))).as("_m"))
        .select(col("a").as("id"), (-col("_m._nl")).as("label"))
      val next = vertices.select(col(idCol).as("id"))
        .join(top, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
        .eagerCheckpoint()
      // free the superseded round's label blocks eagerly
      Checkpoints.release(labels)
      labels = next
    }
    // the returned labels are the final checkpoint; the edge list is dead
    Checkpoints.release(sym)
    labels
  }

  /** Leakage-safe train/val/test assignment: the split is a pure function
    * of the portable md5 of the CLUSTER label — never of the document —
    * so near-duplicates (same cluster by construction) cannot straddle
    * splits and contaminate evaluation. Buckets: md5("split_" + cluster)
    * mod 100 → [0, trainPct) train, [trainPct, trainPct + valPct) val,
    * rest test. One projection over the label table; no join, no shuffle.
    */
  def leakageSafeSplit(labels: DataFrame, trainPct: Int = 80,
                       valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split fractions: train=$trainPct val=$valPct")
    labels.withColumn("_b",
        pmod(graft.functions.TextFunctions.md5Hash60(
          concat(lit("split_"), col("cluster").cast("string"))), lit(100L)))
      .withColumn("split",
        when(col("_b") < trainPct, "train")
          .when(col("_b") < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("_b")
  }

  def keepBest(labels: DataFrame, scores: DataFrame, idCol: String = "id",
               scoreCol: String = "score"): DataFrame =
    labels.join(scores, Seq(idCol))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        min(struct(
          coalesce(-col(scoreCol), lit(Double.PositiveInfinity)).as("negs"),
          col(idCol).as("i"))).as("_m"))
      .select(col("cluster"), col("_m.i").as("keep_id"),
        when(col("_m.negs") === Double.PositiveInfinity, lit(null))
          .otherwise(-col("_m.negs")).as("best_score"), col("n_members"))

  /** Per-vertex triangle counts over an undirected pair list — the local
    * clustering signal a near-dup graph audit reads: a candidate-pair
    * blocker that emits true duplicate CLUSTERS produces triangle-dense
    * components (cliques), while chains of borderline matches (the
    * transitive-drift failure mode `components` would still merge)
    * are triangle-FREE. Also the standard cohesion feature for spam/
    * link-farm detection on host graphs.
    *
    * Algorithm: degree-ordered wedge join (Suri & Vassilvitskii 2011,
    * the MapReduce-standard "curse of the last reducer" fix). Each
    * undirected edge is directed from its lower (degree, id) endpoint,
    * so every wedge is enumerated at its lowest-order apex and each
    * triangle closes exactly once; out-degrees under this orientation
    * are O(√m), which bounds the wedge fan-out of hot vertices — a
    * star's center (degree n) enumerates ZERO wedges instead of n².
    * Shuffles: one degree count, the orientation join, the wedge
    * self-join, and a semi-join close — all equi-joins on vertex keys.
    *
    * @return (id, n_tri) for EVERY vertex (isolated/acyclic ⇒ 0); the
    *         global triangle count is `sum(n_tri) / 3`.
    */
  def triangleCounts(pairs: DataFrame, vertices: DataFrame,
                     idCol: String = "id"): DataFrame = {
    val und = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .eagerCheckpoint()
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient each edge from the lower (degree, id) endpoint; carry the
    // head's key so wedges can be ordered without re-joining degrees
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val dir = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"))
      .eagerCheckpoint()
    val e1 = dir.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
    val e2 = dir.select(col("src"), col("dst").as("w"), col("dd").as("dw"))
    val tri = e1.join(e2, Seq("src"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .join(dir.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
    val out = vertices.select(col(idCol).as("id"))
      .join(tri.select(explode(array(col("src"), col("v"), col("w")))
          .as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("n_tri")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .eagerCheckpoint()
    Checkpoints.release(und)
    Checkpoints.release(dir)
    out
  }

  /** Multi-source BFS depth over a pair list: the hop distance from any
    * SEED vertex, capped at `maxDepth` — the "blast radius" audit a
    * training pipeline runs on its near-dup graph (seeds = benchmark /
    * eval documents; depth 1 = direct near-dups, depth 2 = near-dups of
    * near-dups — transitive contamination the pairwise check misses),
    * and the crawl-depth weight on host graphs (seeds = trusted
    * domains). Undirected by default (near-dup pairs are symmetric);
    * `directed = true` follows id_a → id_b only.
    *
    * Frontier expansion, rounds = maxDepth exactly (deterministic and
    * SQL-unrollable — q196): each round joins the CURRENT frontier to
    * the edge list (shuffle bounded by frontier × out-degree, never the
    * whole graph), deduplicates, and anti-joins the settled set, so a
    * vertex's depth is final the round it is first reached. Lineage is
    * truncated per round with eager block release ([[componentsIters]]'s
    * exponential-plan trap).
    *
    * @return (id, depth) for EVERY vertex in `vertices`; NULL depth =
    *         unreached within maxDepth hops.
    */
  def bfsDepth(pairs: DataFrame, vertices: DataFrame, seeds: DataFrame,
               idCol: String = "id", maxDepth: Int = 3,
               directed: Boolean = false): DataFrame = {
    require(maxDepth >= 1, s"bfsDepth: maxDepth=$maxDepth < 1")
    val raw = pairs.select(col("id_a"), col("id_b")).eagerCheckpoint()
    val fwd = raw.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = (if (directed) fwd
      else fwd.union(raw.select(col("id_b").as("src"),
        col("id_a").as("dst"))))
      .distinct()
      .eagerCheckpoint()
    Checkpoints.release(raw)
    var dist = seeds.select(col(idCol).as("id")).distinct()
      .withColumn("depth", lit(0))
      .eagerCheckpoint()
    for (k <- 1 to maxDepth) {
      val frontier = dist.filter(col("depth") === (k - 1))
        .select(col("id").as("src"))
      val next = edges.join(frontier, Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist.select(col("id")), Seq("id"), "left_anti")
        .withColumn("depth", lit(k))
      val grown = dist.unionByName(next).eagerCheckpoint()
      Checkpoints.release(dist)
      dist = grown
    }
    val out = vertices.select(col(idCol).as("id"))
      .join(dist, Seq("id"), "left")
      .select(col("id"), col("depth"))
      .eagerCheckpoint()
    Checkpoints.release(dist)
    Checkpoints.release(edges)
    out
  }

  /** Personalized PageRank (Page et al. 1999 §6; the random surfer
    * teleports to the SEED distribution instead of uniformly): the
    * trust/relevance propagation a pipeline runs from a vetted set —
    * seed domains propagating trust through a host graph, eval anchors
    * ranking their neighborhoods for curation. Dangling mass also
    * returns to the seed distribution (the standard PPR treatment), so
    * Σr = 1 holds every round; vertices with zero teleport weight earn
    * rank ONLY through in-links.
    *
    * Update: `r'(v) = w_v·((1−d) + d·D) + d·Σ_{u→v} r(u)/outdeg(u)`
    * with `w` the L1-normalized teleport weights and `D` the dangling
    * mass. Same determinism discipline as [[pageRank]]: decimal-exact
    * aggregates, 10 dp round per iteration, normalized weights pinned at
    * 12 dp — the q197 oracle unrolls the rounds.
    */
  def personalizedPageRank(edges: DataFrame, teleport: DataFrame,
                           srcCol: String = "src", dstCol: String = "dst",
                           idCol: String = "id", weightCol: String = "w",
                           iterations: Int = 3,
                           damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"personalizedPageRank: iterations < 1")
    require(damping > 0 && damping < 1, s"bad damping=$damping")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .eagerCheckpoint()
    val deg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
      .eagerCheckpoint()
    val tp = teleport
      .select(col(idCol).cast("long").as("id"),
        round(col(weightCol).cast("double"), 10).as("_wt"))
      .filter(col("_wt") > 0.0 && !isnan(col("_wt")))
      .groupBy(col("id"))
      .agg(sum(col("_wt").cast("decimal(28,10)")).cast("double").as("_wt"))
    // Fail fast on an empty (or all-filtered) teleport set: a NULL sum
    // would otherwise silently NULL every rank downstream. One bounded
    // 1-row driver collect.
    val wTotVal = tp.agg(coalesce(
        sum(col("_wt").cast("decimal(28,10)")).cast("double"), lit(0.0))
        .as("_t")).first().getDouble(0)
    require(wTotVal > 0.0,
      "personalizedPageRank: teleport set must contain at least one " +
        s"vertex with a positive finite weight (sum was $wTotVal)")
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(tp.select(col("id")))
      .distinct()
    // normalized teleport weight per vertex (0 off-seed), pinned at 12 dp;
    // danglingness is fixed, so it rides this table and each round's
    // dangling mass becomes an observed metric on the round's checkpoint
    // (same fusion as [[pageRank]] — one fewer job and subplan per round)
    val w = verts
      .join(tp, Seq("id"), "left")
      .join(deg.select(col("src").as("id"), col("outdeg")), Seq("id"), "left")
      .select(col("id"),
        round(coalesce(col("_wt"), lit(0.0)) / lit(wTotVal), 12).as("wv"),
        col("outdeg").isNull.as("_dang"))
      .eagerCheckpoint()
    def dangSum: org.apache.spark.sql.Column =
      coalesce(sum(when(col("_dang"), col("rank")).cast("decimal(20,10)"))
        .cast("double"), lit(0.0)).as("_dm")
    def readDang(obs: org.apache.spark.sql.Observation): Double =
      obs.get("_dm") match {
        case d: java.lang.Double => d.doubleValue()
        case x: Number => x.doubleValue()
      }
    var obsPrev = new org.apache.spark.sql.Observation()
    var ranks = w.select(col("id"), col("_dang"),
        round(col("wv"), 10).as("rank"))
      .observe(obsPrev, dangSum)
      .eagerCheckpoint()
    for (_ <- 1 to iterations) {
      val inflow = e
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(round(col("rank") / col("outdeg"), 14)
          .cast("decimal(38,14)")).cast("double").as("inflow"))
        .select(col("dst").as("id"), col("inflow"))
      val dm = readDang(obsPrev)
      val obsNext = new org.apache.spark.sql.Observation()
      val next = w
        .join(inflow, Seq("id"), "left")
        .select(col("id"), col("_dang"),
          round(col("wv") * (lit(1.0 - damping) + lit(damping) *
            lit(dm)) + lit(damping) *
            coalesce(col("inflow"), lit(0.0)), 10).as("rank"))
        .observe(obsNext, dangSum)
        .eagerCheckpoint()
      Checkpoints.release(ranks)
      ranks = next
      obsPrev = obsNext
    }
    Checkpoints.release(e)
    Checkpoints.release(deg)
    Checkpoints.release(w)
    // the surviving frame is a projection over the final checkpoint
    ranks.select(col("id"), col("rank"))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a directed edge list —
    * the complement of [[pageRank]] on BIPARTITE-flavored graphs, where
    * one side points and the other is pointed at: a pure hub earns no
    * PageRank beyond teleport, but HITS scores it by the authority of
    * what it points AT (auth(v) = Σ_{u→v} hub(u); hub(u) = Σ_{u→v}
    * auth(v); each L1-normalized per half-round). Fixed `iterations`
    * keeps it deterministic and SQL-unrollable (q193).
    *
    * Determinism: every aggregate is decimal-exact — hub/auth values are
    * 10 dp by construction, their sums stay under 2^53 when scaled, so
    * the decimal→double conversions are correctly rounded IDENTICALLY in
    * any engine and the closing `round(…, 10)` pins each half-round.
    * Scale shape: two keyed joins + two map-side-combined sums per
    * round; norms are broadcast 1-row aggregates; lineage truncated per
    * half-round with eager release.
    *
    * @return (id, hub, auth) for every vertex.
    */
  def hits(edges: DataFrame, srcCol: String = "src",
           dstCol: String = "dst", iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"hits: iterations=$iterations < 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .eagerCheckpoint()
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .eagerCheckpoint()
    // One checkpoint job per half-round: the pulled frame materializes
    // once with its L1 norm riding the SAME job as an observed metric
    // (decimal-exact, identical to the former 1-row aggregate), and the
    // normalized scores are a zero-cost projection over that checkpoint —
    // the former shape paid three jobs per half-round (pull checkpoint,
    // norm broadcast build, normalized checkpoint). The returned frame is
    // Project-over-LogicalRDD, exactly what [[Checkpoints.release]] frees.
    def pulledNorm(scores: DataFrame, scoreCol: String, from: String,
                   to: String, vcol: String): DataFrame = {
      val obs = new org.apache.spark.sql.Observation()
      val raw = verts
        .join(e.join(scores.select(col("id").as(from), col(scoreCol)),
            Seq(from))
          .groupBy(col(to))
          .agg(sum(col(scoreCol).cast("decimal(28,10)")).cast("double")
            .as("_raw"))
          .select(col(to).as("id"), col("_raw")), Seq("id"), "left")
        .select(col("id"), coalesce(col("_raw"), lit(0.0)).as("_raw"))
        .observe(obs, sum(col("_raw").cast("decimal(28,10)"))
          .cast("double").as("_t"))
        .eagerCheckpoint()
      // the same double the broadcast 1-row aggregate carried (empty
      // graph → null; the projection then yields zero rows anyway)
      val tot = obs.get("_t") match {
        case d: java.lang.Double => lit(d.doubleValue())
        case _ => lit(null).cast("double")
      }
      raw.select(col("id"), round(col("_raw") / tot, 10).as(vcol))
    }
    var hub = verts.select(col("id"), lit(1.0).as("hub"))
      .eagerCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      // the new half-round's backing checkpoint is materialized inside
      // pulledNorm, so the superseded frame's blocks are dead here
      val nextAuth = pulledNorm(hub, "hub", "src", "dst", "auth")
      if (auth != null) Checkpoints.release(auth)
      auth = nextAuth
      val nextHub = pulledNorm(auth, "auth", "dst", "src", "hub")
      Checkpoints.release(hub)
      hub = nextHub
    }
    val out = hub.join(auth, Seq("id")).select(col("id"), col("hub"),
      col("auth")).eagerCheckpoint()
    Checkpoints.release(hub)
    Checkpoints.release(auth)
    Checkpoints.release(e)
    Checkpoints.release(verts)
    out
  }

  /** PageRank by synchronous power iteration (Brin & Page 1998) over a
    * DIRECTED edge list — the authority score a web-corpus pipeline
    * weights sampling and quality priors by (domain/host graphs), and
    * the standard importance measure over the engine's kNN / citation /
    * customer→supplier graphs.
    *
    * Semantics (textbook, dangling-aware): edges are deduplicated
    * (simple graph; with `weightCol`, parallel edges sum their weights
    * and each contribution is `r(u)·w_{uv}/W(u)`); every vertex starts
    * at 1/N; each round
    * `r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + D/N)` where `D` is
    * the total rank mass sitting on DANGLING vertices (no out-edges) —
    * redistributed uniformly, so Σr = 1 is preserved every round (the
    * mass-conservation property the spec pins). Fixed `iterations`
    * rather than a convergence test keeps the operator deterministic
    * and lets the q186 oracle unroll the rounds in SQL.
    *
    * Determinism (the Registry contract — plain double sums are
    * partition-order-dependent even within Spark): both per-round
    * aggregates are EXACT — each inflow term is rounded to 14 dp and
    * summed as DECIMAL(38,14); the dangling mass sums the ranks as
    * DECIMAL(20,10), which is lossless because ranks are 10 dp decimals
    * by construction. Every round therefore computes from identical
    * values in any partition order and in DuckDB, and the closing
    * `round(…, 10)` pins the round's output exactly — no cross-engine
    * drift can accumulate.
    *
    * Scale: per round, one shuffle keyed by `src` (ranks⋈edges⋈outdeg)
    * and one by `dst` (map-side-combined inflow sum); the dangling mass
    * is a 1-row aggregate broadcast back (never a driver value), and
    * N is the one driver scalar, computed once. Lineage is truncated
    * per round exactly like [[componentsIters]] (the exponential-plan
    * trap documented there), superseded blocks released eagerly.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 3,
               damping: Double = 0.85,
               weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations=$iterations < 1")
    require(damping > 0 && damping < 1, s"pageRank: damping=$damping")
    // Unweighted: simple graph (parallel edges collapse). Weighted:
    // parallel edges SUM their weights — both exactly, via decimal at
    // 10 dp (double weight sums would be partition-order-dependent);
    // contribution u→v is then rank(u)·w/W(u) instead of rank(u)/deg(u),
    // and W(u)=0 rows cannot exist (a zero-weight edge still counts its
    // endpoint as non-dangling only if its summed weight is > 0 — callers
    // filter true zero-weight edges out, documented here).
    val e = weightCol match {
      case None =>
        edges.select(col(srcCol).cast("long").as("src"),
            col(dstCol).cast("long").as("dst"))
          .distinct()
          .withColumn("w", lit(1.0))
          .eagerCheckpoint()
      case Some(wc) =>
        edges.select(col(srcCol).cast("long").as("src"),
            col(dstCol).cast("long").as("dst"),
            col(wc).cast("double").as("_w"))
          // NaN compares LARGEST in Spark (NaN > 0 is true), so the
          // positivity gate alone would admit a poison weight
          .filter(col("_w") > 0.0 && !isnan(col("_w")))
          .groupBy(col("src"), col("dst"))
          .agg(sum(round(col("_w"), 10).cast("decimal(28,10)"))
            .cast("double").as("w"))
          .eagerCheckpoint()
    }
    val deg = e.groupBy(col("src"))
      .agg(sum(col("w").cast("decimal(28,10)")).cast("double")
        .as("outdeg"))
      .eagerCheckpoint()
    // vertex table carries its (fixed) danglingness, so each round's
    // dangling mass is an OBSERVED metric on that round's checkpoint job —
    // the former left-anti aggregate + crossJoin(broadcast) was one more
    // job and two more operators per round for the same decimal-exact sum
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(deg.select(col("src").as("id"), col("outdeg")), Seq("id"), "left")
      .select(col("id"), col("outdeg").isNull.as("_dang"))
      .eagerCheckpoint()
    val n = verts.count().toDouble // the one driver scalar; computed once
    def dangSum: org.apache.spark.sql.Column =
      coalesce(sum(when(col("_dang"), col("rank")).cast("decimal(20,10)"))
        .cast("double"), lit(0.0)).as("_dm")
    def readDang(obs: org.apache.spark.sql.Observation): Double =
      obs.get("_dm") match {
        case d: java.lang.Double => d.doubleValue()
        case x: Number => x.doubleValue()
      }
    var obsPrev = new org.apache.spark.sql.Observation()
    var ranks = verts
      .select(col("id"), col("_dang"), round(lit(1.0) / n, 10).as("rank"))
      .observe(obsPrev, dangSum)
      .eagerCheckpoint()
    for (_ <- 1 to iterations) {
      val inflow = e
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(round(col("rank") * col("w") / col("outdeg"), 14)
          .cast("decimal(38,14)")).cast("double").as("inflow"))
        .select(col("dst").as("id"), col("inflow"))
      // total rank mass on dangling vertices (no out-edges), read off the
      // PREVIOUS round's checkpoint job — the identical decimal(20,10)
      // sum over the identical row set, injected as the same IEEE double
      val dm = readDang(obsPrev)
      val obsNext = new org.apache.spark.sql.Observation()
      val next = verts
        .join(inflow, Seq("id"), "left")
        .select(col("id"), col("_dang"),
          round(lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + lit(dm) / n), 10)
            .as("rank"))
        .observe(obsNext, dangSum)
        .eagerCheckpoint()
      Checkpoints.release(ranks)
      ranks = next
      obsPrev = obsNext
    }
    Checkpoints.release(e)
    Checkpoints.release(deg)
    Checkpoints.release(verts)
    // the surviving frame is a projection over the final checkpoint
    ranks.select(col("id"), col("rank"))
  }
}
