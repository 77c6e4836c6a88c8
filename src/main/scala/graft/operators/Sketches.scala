package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Fixed-size MERGEABLE sketches — the cardinality / frequency profile
  * pass a 100 TB corpus can afford.
  *
  * Exact `countDistinct` shuffles every distinct value and exact heavy-
  * hitter counting shuffles every distinct key; at corpus scale both are
  * corpus-sized shuffles for what is usually a dashboard number. The
  * sketches here reduce to BOUNDED state (2^b registers / d·w counters)
  * with ASSOCIATIVE, IDEMPOTENT merges, so:
  *   - partial sketches from disjoint shards combine into exactly the
  *     whole-corpus sketch (one tiny aggregation, no re-scan);
  *   - a streaming re-delivery merges to the same state (max/min-safe),
  *     the [[graft.streaming.StreamingReport]] partials discipline.
  *
  * Everything is derived from the portable md5 hash
  * ([[TextFunctions.md5Hash60]]) with INTEGER-ONLY register/counter
  * arithmetic, so the sketch STATE is cross-engine replayable in SQL and
  * the driver oracle can pin it exactly (q102/q103). The floating-point
  * ESTIMATORS ([[hllEstimate]]) are engine-side and spec-tested against
  * exact counts instead.
  *
  * Reference scope: the reference engine has no sketch family; this is
  * part of the LLM-pipeline extension (SURVEY §6), following Flajolet et
  * al. 2007 (HyperLogLog) and Cormode & Muthukrishnan 2005 (count-min).
  */
object Sketches {

  // ------------------------------------------------------------ HyperLogLog

  /** HLL register table over `valueCol`: one row per (groupCols…, bucket)
    * with the max leading-zero rank. `b` bucket bits → m = 2^b registers;
    * buckets never observed are absent (their implicit rho is 0).
    *
    * Hash split: bucket = low b bits of the 60-bit md5 hash; rank rho =
    * (leading zeros of the remaining 60−b bits) + 1, computed EXACTLY in
    * both engines from the bit length of the remainder (`bin()` string
    * length — no float log2). One linear scan, partial-aggregated to
    * grain×m rows before any shuffle regardless of corpus size.
    */
  def hllRegisters(df: DataFrame, valueCol: String, b: Int = 9,
                   groupCols: Seq[String] = Nil): DataFrame =
    registersFromHashes(
      df.select((groupCols.map(col) :+
        TextFunctions.md5Hash60(col(valueCol)).as("_h")): _*),
      b, groupCols)

  /** The bucket/rho bit split over a pre-hashed `_h` column — shared by
    * the direct register build and the sparse→dense conversion so both
    * paths are the SAME expressions (and the q102/q107 oracles replay
    * one formulation).
    */
  private def registersFromHashes(hashed: DataFrame, b: Int,
                                  groupCols: Seq[String]): DataFrame = {
    require(b >= 4 && b <= 16, s"need 4 <= b <= 16 bucket bits, got $b")
    val m = 1L << b
    val rem = 60 - b
    // integer-only bit split: double division at h ~ 2^60 would lose low
    // bits past the 53-bit mantissa and silently corrupt rho
    val rho = when(col("_w") === 0L, lit(rem + 1))
      .otherwise(lit(rem + 1) - length(bin(col("_w"))))
      .cast("int")
    hashed
      .select((groupCols.map(col) :+
        pmod(col("_h"), lit(m)).cast("int").as("bucket") :+
        shiftright(col("_h"), b).as("_w")): _*)
      .select((groupCols.map(col) :+ col("bucket") :+ rho.as("_rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("_rho")).as("max_rho"))
  }

  /** Merge register partials (same grain, same b): MAX per bucket —
    * associative and idempotent, so shard partials and replayed deliveries
    * both combine into exactly the one-pass sketch.
    */
  def hllMerge(partials: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    partials.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("max_rho")).as("max_rho"))

  /** Driver-side HLL estimate from one grain's register list (Flajolet et
    * al. 2007, with the small-range linear-counting correction). Engine-
    * side only — float math stays out of the oracled register state.
    */
  def hllEstimate(registers: Seq[(Int, Int)], b: Int): Double = {
    val m = 1 << b
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val present = registers.toMap
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val rho = present.getOrElse(i, 0)
      if (rho == 0) zeros += 1
      z += math.pow(2.0, -rho)
      i += 1
    }
    val e = alpha * m * m / z
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Per-group HLL estimates as a DataFrame — the per-source "distinct
    * tokens" column of a corpus report. Registers stay distributed; the
    * estimate is one aggregation per grain row.
    *
    * The harmonic-mean accumulator is EXACT: each register contributes the
    * scaled integer 2^(61−b−rho) (a BIGINT ≤ 2^(60−b)) and absent buckets
    * contribute 2^(61−b), DECIMAL(38,0)-summed — partition-order-
    * independent, unlike a float `sum(pow(2,−rho))` whose result can move
    * a ULP with merge order and flake the StreamingSpec streamed==batch
    * bit-identity. Float math happens ONCE, on the exact total.
    */
  def hllEstimateByGroup(registers: DataFrame, b: Int,
                         groupCols: Seq[String]): DataFrame = {
    val m = 1 << b
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    // z · 2^scaleP2, with rho ∈ [1, 61−b] (hllRegisters' range) so every
    // term is an exact BIGINT; 2^scaleP2 itself is a power of two, exact
    // in double for the final one-shot division
    val scaleP2 = 61 - b
    val scale = new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(scaleP2))
    registers.groupBy(groupCols.map(col): _*)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scaleP2 - max_rho)")
          .cast("decimal(38,0)")).as("_zs"),
        count(lit(1)).as("_nb"))
      .select((groupCols.map(col) :+
        (col("_zs") + (lit(m) - col("_nb")).cast("decimal(38,0)") * lit(scale))
          .as("_zt") :+
        (lit(m) - col("_nb")).as("_zeros")): _*)
      .select((groupCols.map(col) :+
        (lit(alpha * m.toDouble * m * math.pow(2.0, scaleP2)) /
          col("_zt").cast("double")).as("_e") :+
        col("_zeros")): _*)
      .select((groupCols.map(col) :+
        when(col("_e") <= 2.5 * m && col("_zeros") > 0,
          lit(m) * log(lit(m).cast("double") / col("_zeros")))
          .otherwise(col("_e")).as("est_distinct")): _*)
  }

  /** Pairwise set-operation estimates between groups, from ONE register
    * build: for every unordered group pair (a < b) the union, intersection,
    * Jaccard, and containment estimates a dedup-planning pass needs ("how
    * much of source A already sits in source B", "which crawl snapshots
    * overlap enough to dedup jointly") — WITHOUT any cross-group document
    * join. HLL registers are closed under union (max-merge of two groups'
    * registers IS the sketch of their union, Flajolet et al. 2007 §4), so
    * the corpus is scanned once by the register build and everything
    * pairwise runs at pairs × 2^b sketch grain: the group list is tiny by
    * definition of a grain, the pair enumeration is a group-grain
    * nested-loop (bounded), and the register fan-out is two broadcast hash
    * joins plus one (g1, g2, bucket)-keyed aggregation.
    *
    * Intersection is inclusion-exclusion `est(A) + est(B) − est(A∪B)`
    * clamped into `[0, min(est_a, est_b)]`: sketch error can push a
    * disjoint pair negative, and the estimator is non-monotone at the
    * linear-counting branch switch, so the union estimate can fall BELOW
    * a single-group estimate — without the upper clamp `containment`
    * could exceed 1.0 and poison downstream dedup planning that reads it
    * as a fraction. `jaccard_est` divides by the union (the same branch
    * switch can in principle push it past 1.0 — documented excursion,
    * kept raw so the column stays a pure function of the published
    * estimates), `containment` by the SMALLER single estimate
    * (directional "share of the smaller already covered").
    * All three derive from the round-6 single/union estimates with one
    * arithmetic op each, so the whole surface replays cross-engine
    * (q123's oracle re-runs the estimator per pair).
    */
  def hllOverlapMatrix(registers: DataFrame, b: Int,
                       groupCol: String): DataFrame = {
    val groups = registers.select(col(groupCol)).distinct()
    val pairs = groups.select(col(groupCol).as("g1"))
      .join(groups.select(col(groupCol).as("g2")), col("g1") < col("g2"))
    val r1 = broadcast(pairs)
      .join(registers.withColumnRenamed(groupCol, "g1"), Seq("g1"))
    val r2 = broadcast(pairs)
      .join(registers.withColumnRenamed(groupCol, "g2"), Seq("g2"))
    val unionRegs = r1.select(col("g1"), col("g2"), col("bucket"),
        col("max_rho"))
      .unionByName(r2.select(col("g1"), col("g2"), col("bucket"),
        col("max_rho")))
      .groupBy(col("g1"), col("g2"), col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
    val singles = hllEstimateByGroup(registers, b, Seq(groupCol))
      .select(col(groupCol), round(col("est_distinct"), 6).as("_est"))
    val estU = hllEstimateByGroup(unionRegs, b, Seq("g1", "g2"))
      .select(col("g1"), col("g2"),
        round(col("est_distinct"), 6).as("est_union"))
    estU
      .join(broadcast(singles.select(col(groupCol).as("g1"),
        col("_est").as("est_a"))), Seq("g1"))
      .join(broadcast(singles.select(col(groupCol).as("g2"),
        col("_est").as("est_b"))), Seq("g2"))
      .withColumn("est_inter",
        round(least(
          greatest(col("est_a") + col("est_b") - col("est_union"), lit(0.0)),
          least(col("est_a"), col("est_b"))), 6))
      .withColumn("jaccard_est",
        round(col("est_inter") / col("est_union"), 6))
      .withColumn("containment",
        round(col("est_inter") / least(col("est_a"), col("est_b")), 6))
      .select(col("g1"), col("g2"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"), col("jaccard_est"),
        col("containment"))
  }

  // ------------------------------------------------- KMV / Theta sketch

  /** Bounded k-minimum-values buffer: sorted distinct hashes, capped at
    * k — a TRUE partial aggregate (map-side buffers never exceed k
    * longs however large the group; merge = sorted-union-truncate).
    */
  final case class KmvBuf(data: Array[Long], n: Int)

  private[graft] final class KmvAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, Array[Long]] {
    def zero: KmvBuf = KmvBuf(new Array[Long](math.min(k, 16)), 0)
    def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val i = java.util.Arrays.binarySearch(b.data, 0, b.n, h)
      if (i >= 0) b // duplicate
      else {
        val ins = -i - 1
        if (b.n == k && ins == k) b // larger than the kth smallest
        else {
          // grow floor of 1: merge() of two empty buffers legally yields a
          // zero-length array, and 0 * 2 == 0 would never grow it
          val d =
            if (b.n == b.data.length && b.n < k)
              java.util.Arrays.copyOf(b.data,
                math.min(k, math.max(1, b.data.length * 2)))
            else b.data
          val keep = math.min(b.n + 1, k)
          System.arraycopy(d, ins, d, ins + 1,
            math.min(b.n, k - 1) - ins)
          d(ins) = h
          KmvBuf(d, keep)
        }
      }
    }
    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      val out = new Array[Long](math.min(a.n + b.n, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.n || j < b.n)) {
        val va = if (i < a.n) a.data(i) else Long.MaxValue
        val vb = if (j < b.n) b.data(j) else Long.MaxValue
        if (va == vb) { out(o) = va; i += 1; j += 1 }
        else if (va < vb) { out(o) = va; i += 1 }
        else { out(o) = vb; j += 1 }
        o += 1
      }
      KmvBuf(out, o)
    }
    def finish(b: KmvBuf): Array[Long] =
      java.util.Arrays.copyOf(b.data, b.n)
    def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.product[KmvBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** k-minimum-values distinct sketch (Beyer et al. 2007) with the
    * Theta-sketch set algebra (Dasgupta et al. 2016): per group, the k
    * SMALLEST distinct 60-bit md5 hashes of `valueCol`, exploded to
    * (group…, rank, h) rows — all integers, so the q140 oracle replays
    * the state exactly.
    *
    * Where HLL's algebra is union-only ([[hllOverlapMatrix]] derives
    * intersections by inclusion-exclusion, error scaling with the UNION
    * size), the KMV state supports DIRECT intersection estimates
    * ([[kmvOverlapMatrix]]): with θ = min(θ_a, θ_b), hashes below θ are
    * a uniform sample of each set, so |common < θ| · 2⁶⁰ / θ estimates
    * |A ∩ B| with error scaling in the intersection itself. Build cost:
    * one distinct-free scan + the bounded aggregator (buffers capped at
    * k longs, merge is sorted-union-truncate — genuinely map-side
    * combinable).
    */
  def kmvState(df: DataFrame, valueCol: String, k: Int,
               groupCols: Seq[String]): DataFrame =
    kmvAggregate(df.select((groupCols.map(col) :+
      TextFunctions.md5Hash60(col(valueCol)).as("_h")): _*), k, groupCols)

  /** Merge exploded k-set partials — shard or per-batch states — back
    * through the SAME bounded aggregator: sorted-union-truncate is
    * associative and IDEMPOTENT, so replayed partials are absorbed and
    * shard merges equal the one-pass build exactly (the
    * [[graft.streaming.StreamingReport]] partials contract).
    */
  def kmvMergeState(partials: DataFrame, k: Int,
                    groupCols: Seq[String]): DataFrame =
    kmvAggregate(partials.select(
      (groupCols.map(col) :+ col("h").as("_h")): _*), k, groupCols)

  private def kmvAggregate(hashed: DataFrame, k: Int,
                           groupCols: Seq[String]): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val agg = udaf(new KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    hashed
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("_h")).as("_ks"))
      .select((groupCols.map(col) :+
        posexplode(col("_ks")).as(Seq("_pos", "h"))): _*)
      .select((groupCols.map(col) :+
        (col("_pos") + 1).cast("int").as("rank") :+ col("h")): _*)
  }

  private val Theta1: Long = 1L << 60

  /** Per-group distinct estimates from the KMV state: EXACT below k
    * (the sketch holds the whole set), (k−1) · 2⁶⁰ / θ at saturation
    * (θ = the kth smallest hash).
    */
  def kmvEstimate(state: DataFrame, k: Int,
                  groupCols: Seq[String]): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"), max(col("h")).as("_theta"))
      .select((groupCols.map(col) :+
        when(col("_cnt") < k, col("_cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Theta1.toDouble) /
            col("_theta").cast("double"))
          .as("est_distinct")): _*)

  /** Pairwise DIRECT set-operation estimates from one KMV state build:
    * per (g1 < g2), θmin = min of the two thresholds (an unsaturated
    * group's threshold is 2⁶⁰ — its sample is the whole set), `common` =
    * shared hashes below θmin, union-below likewise; estimates scale by
    * 2⁶⁰/θmin and `jaccard_est` = common / union-below. Everything
    * derives from the (sources × k)-row state — the corpus is never
    * rescanned — and every arithmetic step replays in SQL (q141).
    */
  def kmvOverlapMatrix(state: DataFrame, k: Int,
                       groupCol: String): DataFrame = {
    val per = state.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_cnt"), max(col("h")).as("_max"))
      .select(col(groupCol),
        when(col("_cnt") < k, lit(Theta1)).otherwise(col("_max"))
          .as("_theta"),
        when(col("_cnt") < k, col("_cnt").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Theta1.toDouble) /
            col("_max").cast("double")).as("_est"))
    val pairs = per.select(col(groupCol).as("g1"),
        col("_theta").as("_t1"), col("_est").as("est_a"))
      .join(per.select(col(groupCol).as("g2"),
        col("_theta").as("_t2"), col("_est").as("est_b")),
        col("g1") < col("g2"))
      .withColumn("_tmin", least(col("_t1"), col("_t2")))
    val below = state.select(col(groupCol), col("h"))
    val cA = broadcast(pairs.select(col("g1"), col("g2"), col("_tmin")))
      .join(below.withColumnRenamed(groupCol, "g1"), Seq("g1"))
      .filter(col("h") < col("_tmin"))
      .groupBy(col("g1"), col("g2")).agg(count(lit(1)).as("_ca"))
    val cB = broadcast(pairs.select(col("g1"), col("g2"), col("_tmin")))
      .join(below.withColumnRenamed(groupCol, "g2"), Seq("g2"))
      .filter(col("h") < col("_tmin"))
      .groupBy(col("g1"), col("g2")).agg(count(lit(1)).as("_cb"))
    val common = below.select(col(groupCol).as("g1"), col("h"))
      .join(below.select(col(groupCol).as("g2"), col("h")), Seq("h"))
      .filter(col("g1") < col("g2"))
      .join(broadcast(pairs.select(col("g1"), col("g2"), col("_tmin"))),
        Seq("g1", "g2"))
      .filter(col("h") < col("_tmin"))
      .groupBy(col("g1"), col("g2")).agg(count(lit(1)).as("_common"))
    pairs
      .join(cA, Seq("g1", "g2"), "left")
      .join(cB, Seq("g1", "g2"), "left")
      .join(common, Seq("g1", "g2"), "left")
      .select(col("g1"), col("g2"),
        round(col("est_a"), 6).as("est_a"),
        round(col("est_b"), 6).as("est_b"),
        coalesce(col("_common"), lit(0L)).as("common_below"),
        (coalesce(col("_ca"), lit(0L)) + coalesce(col("_cb"), lit(0L)) -
          coalesce(col("_common"), lit(0L))).as("union_below"),
        round(coalesce(col("_common"), lit(0L)).cast("double") *
          lit(Theta1.toDouble) / col("_tmin").cast("double"), 6)
          .as("est_inter"),
        round(when(
          coalesce(col("_ca"), lit(0L)) + coalesce(col("_cb"), lit(0L)) -
            coalesce(col("_common"), lit(0L)) > 0,
          coalesce(col("_common"), lit(0L)).cast("double") /
            (coalesce(col("_ca"), lit(0L)) + coalesce(col("_cb"), lit(0L)) -
              coalesce(col("_common"), lit(0L))).cast("double"))
          .otherwise(lit(0.0)), 6).as("jaccard_est"))
  }

  /** Each group's TOP-OVERLAP partner from the KMV state: symmetrize the
    * pair matrix and argmax by (jaccard desc, smaller partner) via one
    * `min(struct)` — no window over the group key. `containment` =
    * est_inter / min single estimate of the winning pair, the
    * "share of the smaller already covered" direction. The reduction the
    * unified dashboard's theta leg serves (q149, batch store and
    * streamed state alike).
    */
  def kmvTopOverlap(state: DataFrame, k: Int, groupCol: String): DataFrame = {
    val m = kmvOverlapMatrix(state, k, groupCol)
    val sym = m.select(col("g1").as(groupCol), col("g2").as("partner"),
        col("jaccard_est"), col("est_inter"),
        col("est_a").as("self_est"), col("est_b").as("partner_est"))
      .unionByName(m.select(col("g2").as(groupCol),
        col("g1").as("partner"), col("jaccard_est"), col("est_inter"),
        col("est_b").as("self_est"), col("est_a").as("partner_est")))
    sym
      .withColumn("containment",
        round(col("est_inter") /
          least(col("self_est"), col("partner_est")), 6))
      .groupBy(col(groupCol))
      .agg(min(struct((-col("jaccard_est")).as("nj"),
        col("partner").as("p"), col("containment").as("c"))).as("_m"))
      .select(col(groupCol), col("_m.p").as("top_overlap_source"),
        round(-col("_m.nj"), 6).as("top_overlap_jaccard"),
        col("_m.c").as("top_overlap_containment"))
  }

  // -------------------------------------------- HLL sparse mode (HLL++)

  /** Sparse-or-dense per-group cardinality state — the HLL++ refinement
    * (Heule et al. 2013) re-expressed with this file's integer-only
    * replay discipline. A dense sketch spends up to 2^b register rows per
    * group, which is pure waste when the grain has MANY small groups
    * (per-domain distinct counts: most domains have a handful of pages).
    * Here a group holds:
    *   - kind 0 (sparse): one row per DISTINCT 60-bit hash (`k` = hash,
    *     `v` NULL) while its distinct count ≤ `threshold` — the estimate
    *     is then EXACT, and state is min(distinct, threshold) rows;
    *   - kind 1 (dense): the usual registers (`k` = bucket, `v` =
    *     max_rho) once it crosses the threshold.
    * All state is integers derived from the portable md5 hash, so the
    * q107 oracle replays the whole table cross-engine, including the
    * sparse→dense promotion decision.
    *
    * Build cost: one distinct over (group, hash) — map-side combined, the
    * same shuffle shape as the register build; the win is STATE size and
    * merge cost, not build cost. The sparse/dense decision rides a
    * BROADCAST of the group-grain count table (one row per group, like
    * the count-min probe join) — fine up to millions of groups; past
    * broadcast size, use the flat [[hllRegisters]] path, whose plan never
    * needs a per-group decision. Merge ([[hllSparseMerge]]) is
    * associative and replay-idempotent: sparse∪sparse under the threshold
    * stays exact-distinct; anything else promotes through the same
    * hash→register conversion the one-pass dense build uses, so shard
    * partials always combine into exactly the one-pass state (spec-
    * pinned at the crossover).
    */
  def hllSparseState(df: DataFrame, valueCol: String, b: Int = 9,
                     threshold: Int = 256,
                     groupCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "sparse mode is for per-group sketches")
    require(threshold >= 1, s"need threshold >= 1, got $threshold")
    sparseFromHashes(
      df.select((groupCols.map(col) :+
          TextFunctions.md5Hash60(col(valueCol)).as("_h")): _*)
        .distinct(),
      b, threshold, groupCols)
  }

  /** Merge sparse-state partials (same grain, same b and threshold): a
    * group whose partials are all sparse and whose combined distinct-hash
    * count stays ≤ threshold remains sparse (set union); any group with a
    * dense partial, or crossing the threshold, promotes — sparse hashes
    * convert through the shared bucket/rho split and MAX-merge with the
    * dense registers. Associative, and idempotent (set union / MAX), so
    * replayed shard deliveries cannot move the merged state.
    */
  def hllSparseMerge(partials: DataFrame, b: Int, threshold: Int,
                     groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val mode = partials.groupBy(g: _*).agg(
      max(col("kind")).as("_maxk"),
      count_distinct(when(col("kind") === 0, col("k"))).as("_ns"))
    val marked = partials.join(broadcast(mode), groupCols)
    val staySparse = marked
      .filter(col("_maxk") === 0 && col("_ns") <= threshold)
      .select((g :+ col("kind") :+ col("k") :+ col("v")): _*)
      .distinct()
    val toDense = marked.filter(col("_maxk") === 1 || col("_ns") > threshold)
    val denseRegs = registersFromHashes(
        toDense.filter(col("kind") === 0)
          .select((g :+ col("k").as("_h")): _*),
        b, groupCols)
      .select((g :+ col("bucket").cast("bigint").as("k") :+
        col("max_rho").as("v")): _*)
      .unionByName(toDense.filter(col("kind") === 1)
        .select((g :+ col("k") :+ col("v")): _*))
      .groupBy((g :+ col("k")): _*)
      .agg(max(col("v")).as("v"))
      .select((g :+ lit(1).as("kind") :+ col("k") :+ col("v")): _*)
    staySparse.unionByName(denseRegs)
  }

  /** Estimates from sparse-or-dense state: sparse groups report their
    * EXACT distinct count (that is the point of the sparse side); dense
    * groups go through [[hllEstimateByGroup]]'s exact-integer harmonic
    * accumulator. One output row per group, `est_distinct` double.
    */
  def hllSparseEstimate(state: DataFrame, b: Int,
                        groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val sparse = state.filter(col("kind") === 0)
      .groupBy(g: _*)
      .agg(count(lit(1)).cast("double").as("est_distinct"))
    val dense = hllEstimateByGroup(
      state.filter(col("kind") === 1)
        .select((g :+ col("k").cast("int").as("bucket") :+
          col("v").as("max_rho")): _*),
      b, groupCols)
    sparse.unionByName(dense)
  }

  /** Build the sparse-or-dense split from pre-hashed DISTINCT
    * (group, _h) rows — the shared tail of [[hllSparseState]] and the
    * promotion path.
    */
  private def sparseFromHashes(hashes: DataFrame, b: Int, threshold: Int,
                               groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val counts = hashes.groupBy(g: _*).agg(count(lit(1)).as("_n"))
    val joined = hashes.join(broadcast(counts), groupCols)
    val sparse = joined.filter(col("_n") <= threshold)
      .select((g :+ lit(0).as("kind") :+ col("_h").as("k") :+
        lit(null).cast("int").as("v")): _*)
    val dense = registersFromHashes(
        joined.filter(col("_n") > threshold)
          .select((g :+ col("_h")): _*),
        b, groupCols)
      .select((g :+ lit(1).as("kind") :+ col("bucket").cast("bigint").as("k") :+
        col("max_rho").as("v")): _*)
    sparse.unionByName(dense)
  }

  // ------------------------------------------------- moments (quantiles)

  /** Moments-sketch quantile state (the msketch of Gan et al., VLDB 2018,
    * in this file's replay discipline): per group, the power sums
    * Σx..Σx⁴ plus count/min/max — a CONSTANT 7 numbers per group, merged
    * by plain addition (min/max by min/max), the cheapest mergeable
    * quantile state there is. Each power term is computed on the round-6
    * value with the same left-associated multiplication order in both
    * engines, rounded to 6, and DECIMAL-summed — so the STATE is exact,
    * partition-order-independent, and oracle-able (q112), while the
    * float quantile ESTIMATOR ([[momentsQuantiles]], Cornish-Fisher)
    * stays engine-side, spec-tested against exact percentiles.
    *
    * This completes the sketch triad: cardinality ([[hllRegisters]]),
    * frequency ([[cmCounters]]), quantiles (here) — the three dashboard
    * numbers a corpus profile pays a full shuffle for without sketches.
    */
  def momentsState(df: DataFrame, valueCol: String,
                   groupCols: Seq[String] = Nil): DataFrame = {
    val x = round(col(valueCol), 6)
    def term(c: Column) = round(c, 6).cast("decimal(28,6)")
    df.select((groupCols.map(col) :+ x.as("_x")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(term(col("_x"))).as("s1"),
        sum(term(col("_x") * col("_x"))).as("s2"),
        sum(term(col("_x") * col("_x") * col("_x"))).as("s3"),
        sum(term(col("_x") * col("_x") * col("_x") * col("_x"))).as("s4"),
        min(col("_x")).as("lo"), max(col("_x")).as("hi"))
  }

  /** Merge moments partials: sums add, count adds, bounds min/max —
    * associative (NOT idempotent: like count-min, replay safety must
    * come from the caller's batch-keyed overwrite discipline).
    */
  def momentsMerge(partials: DataFrame,
                   groupCols: Seq[String] = Nil): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), sum(col("s3")).as("s3"),
        sum(col("s4")).as("s4"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))

  /** Quantile estimates from moments state via the Cornish-Fisher
    * expansion (mean/std/skewness correction, clamped to [lo, hi]) — one
    * row per group and requested quantile. Engine-side float math; for a
    * normal distribution the expansion is exact through the skew term,
    * and the spec pins accuracy against exact percentiles.
    */
  def momentsQuantiles(state: DataFrame, qs: Seq[Double],
                       groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val n = col("n").cast("double")
    val mean = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - mean * mean
    val sd = sqrt(greatest(m2, lit(0.0)))
    // central third moment from raw power sums
    val m3 = col("s3").cast("double") / n - lit(3.0) * mean * m2 -
      mean * mean * mean
    val skew = when(sd > 0, m3 / (sd * sd * sd)).otherwise(lit(0.0))
    val rows = qs.map { q =>
      require(q > 0 && q < 1, s"quantile must be in (0,1), got $q")
      // standard normal quantile (Acklam's rational approximation is
      // overkill here — the driver computes it once per requested q)
      val z = normalQuantile(q)
      val cf = lit(z) + (lit(z * z - 1.0) / 6.0) * skew
      struct(lit(q).as("q"),
        least(greatest(mean + sd * cf, col("lo")), col("hi")).as("est"))
    }
    state.select((g :+ explode(array(rows: _*)).as("_qe")): _*)
      .select((g :+ col("_qe.q").as("q") :+ col("_qe.est").as("est")): _*)
  }

  /** Inverse standard-normal CDF (Peter Acklam's rational approximation,
    * |relative error| < 1.15e-9 — published constants).
    */
  private def normalQuantile(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }

  // ------------------------------------------------------------- count-min

  /** Count-min counter table over `valueCol`: d independent hash rows × w
    * buckets, counter = occurrence count. Bounded by d·w rows after the
    * partial agg; merges by SUM (shard partials add — the sketch of a
    * union is the sum of the sketches).
    */
  def cmCounters(df: DataFrame, valueCol: String, d: Int = 4,
                 w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16, s"bad sketch shape d=$d w=$w")
    val rows = (0 until d).map { j =>
      struct(lit(j).as("j"),
        pmod(TextFunctions.md5Hash60(
          concat(lit(s"cm${j}_"), col(valueCol))), lit(w.toLong))
          .cast("int").as("bucket"))
    }
    df.select(explode(array(rows: _*)).as("_jb"))
      .select(col("_jb.j").as("j"), col("_jb.bucket").as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge counter partials: SUM per (j, bucket). */
  def cmMerge(partials: DataFrame): DataFrame =
    partials.groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query the sketch for each DISTINCT probe value: estimate =
    * min over the d rows of the addressed counters (CM guarantees
    * estimate >= true count — no false negatives below a threshold).
    * `probes` carries one column `probeCol`; output (value, cm_est).
    * Probes whose counters were never touched estimate 0.
    *
    * The join is probe-grain × (d·w counter table): the counter side is
    * bounded and broadcastable by construction, so probing never shuffles
    * the corpus.
    */
  def cmEstimate(counters: DataFrame, probes: DataFrame, probeCol: String,
                 d: Int = 4, w: Int = 1024): DataFrame = {
    val rows = (0 until d).map { j =>
      struct(lit(j).as("j"),
        pmod(TextFunctions.md5Hash60(
          concat(lit(s"cm${j}_"), col(probeCol))), lit(w.toLong))
          .cast("int").as("bucket"))
    }
    probes.select(col(probeCol), explode(array(rows: _*)).as("_jb"))
      .select(col(probeCol), col("_jb.j").as("j"),
        col("_jb.bucket").as("bucket"))
      .join(broadcast(cmMerge(counters)), Seq("j", "bucket"), "left")
      .groupBy(col(probeCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  // ------------------------------------------ persisted moments store

  /** Persist a moments quantile state as a Bundle — the sketch-store
    * leg of the quantile family: a profile job builds the
    * 7-numbers-per-group state once, dashboards serve estimates from
    * the SAVED table without rescanning the corpus (the AnnIndex /
    * Classifier reopen-not-recompute idiom, trx azav.py:300-302). The
    * manifest pins the REQUEST grain (value column, group columns,
    * caller tag) for [[ensureMomentsState]]'s T2 invalidation; the
    * state itself is DECIMAL/BIGINT/DOUBLE-exact, so parquet
    * round-tripping cannot move an estimate — served quantiles are
    * bit-identical to live ones (spec-pinned, and q117's oracle
    * recomputes them from the raw corpus).
    */
  def saveMomentsState(state: DataFrame, dir: String, valueCol: String,
                       groupCols: Seq[String], tag: String = ""): Unit =
    graft.sources.Bundle.save(dir, Map("moments" -> state),
      momentsParams(valueCol, groupCols, tag))

  /** Load a persisted moments state; fails without a manifest (crash
    * mid-save → invalid, the Bundle manifest-written-last contract).
    */
  def loadMomentsState(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no moments-sketch manifest at $dir"))
    require(m.get("kind").contains("moments-sketch"),
      s"not a moments sketch store: $dir")
    graft.sources.Bundle.load(spark, dir)("moments")
  }

  /** Reuse the state at `dir` when its manifest matches the request
    * grain; otherwise rebuild from `df` via [[momentsState]] and
    * overwrite (T2 parameter invalidation). Returns (state, rebuilt);
    * the returned frame always reads the SAVED parquet, so repeated
    * serves never re-aggregate the corpus through live lineage.
    */
  def ensureMomentsState(df: => DataFrame, dir: String, valueCol: String,
                         groupCols: Seq[String], tag: String = "")
      : (DataFrame, Boolean) = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (graft.sources.Bundle.isValid(dir,
        momentsParams(valueCol, groupCols, tag)))
      (loadMomentsState(spark, dir), false)
    else {
      graft.sources.Bundle.deleteRecursively(dir)
      saveMomentsState(momentsState(df, valueCol, groupCols), dir,
        valueCol, groupCols, tag)
      (loadMomentsState(spark, dir), true)
    }
  }

  private def momentsParams(valueCol: String, groupCols: Seq[String],
                            tag: String): Map[String, String] =
    Map("kind" -> "moments-sketch", "value" -> valueCol,
      "groups" -> groupCols.mkString(","), "tag" -> tag)

  // ------------------------------------------- persisted KMV (theta) store

  /** The KMV k-set state as a Bundle — the (groups × k)-row table the
    * theta dashboards ([[kmvEstimate]]/[[kmvOverlapMatrix]]) serve from
    * without rescanning the corpus; T2 manifest invalidation on
    * (value column, k, grain, tag), same contract as the moments store.
    */
  def saveKmvState(state: DataFrame, dir: String, valueCol: String, k: Int,
                   groupCols: Seq[String], tag: String = ""): Unit =
    graft.sources.Bundle.save(dir, Map("kmv" -> state),
      kmvParams(valueCol, k, groupCols, tag))

  def loadKmvState(spark: org.apache.spark.sql.SparkSession,
                   dir: String): DataFrame = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no kmv-sketch manifest at $dir"))
    require(m.get("kind").contains("kmv-sketch"),
      s"not a kmv sketch store: $dir")
    graft.sources.Bundle.load(spark, dir)("kmv")
  }

  /** Reuse-or-rebuild with T2 invalidation; the returned frame always
    * reads the SAVED parquet (a warm serve never re-aggregates the
    * corpus through live lineage).
    */
  def ensureKmvState(df: => DataFrame, dir: String, valueCol: String,
                     k: Int, groupCols: Seq[String], tag: String = "")
      : (DataFrame, Boolean) = {
    val spark = org.apache.spark.sql.SparkSession.active
    if (graft.sources.Bundle.isValid(dir,
        kmvParams(valueCol, k, groupCols, tag)))
      (loadKmvState(spark, dir), false)
    else {
      graft.sources.Bundle.deleteRecursively(dir)
      saveKmvState(kmvState(df, valueCol, k, groupCols), dir, valueCol, k,
        groupCols, tag)
      (loadKmvState(spark, dir), true)
    }
  }

  private def kmvParams(valueCol: String, k: Int, groupCols: Seq[String],
                        tag: String): Map[String, String] =
    Map("kind" -> "kmv-sketch", "value" -> valueCol, "k" -> k.toString,
      "groups" -> groupCols.mkString(","), "tag" -> tag)

  // ------------------------------------------- unified dashboard store

  /** Every state the unified per-source sketch dashboard serves from, as
    * ONE Bundle built in ONE corpus pass family — so the dashboard query
    * (q149) touches the corpus zero times on a warm store:
    *   - `profile`  — [[Quality.corpusReport]] rows (group grain);
    *   - `hll`      — b-bit token registers ([[hllRegisters]]);
    *   - `cm_hot`   — per-source count of tokens whose count-min estimate
    *                  reaches `hotThreshold` (the heavy-hitter leg is
    *                  stored REDUCED: its raw input is the corpus-sized
    *                  distinct (source, token) set, which is exactly what
    *                  a store must not have to replay);
    *   - `moments`  — quality power sums ([[momentsState]]);
    *   - `kmv`      — token k-sets ([[kmvState]]), serving the theta
    *                  overlap/containment columns via
    *                  [[kmvOverlapMatrix]].
    * T2 manifest invalidation on every sketch parameter; the corpus
    * thunk is evaluated once (shared localCheckpoint) on a build and
    * never on a warm serve.
    */
  def ensureDashboardStore(docs: => DataFrame, dir: String, b: Int = 7,
                           d: Int = 4, w: Int = 512,
                           hotThreshold: Long = 500L, k: Int = 64,
                           tag: String = "")
      : (Map[String, DataFrame], Boolean) = {
    val spark = org.apache.spark.sql.SparkSession.active
    val params = Map("kind" -> "sketch-dashboard", "b" -> b.toString,
      "d" -> d.toString, "w" -> w.toString, "hot" -> hotThreshold.toString,
      "k" -> k.toString, "tag" -> tag)
    if (graft.sources.Bundle.isValid(dir, params))
      (graft.sources.Bundle.load(spark, dir), false)
    else {
      graft.sources.Bundle.deleteRecursively(dir)
      val dd = docs.localCheckpoint(true)
      try {
        val toks = dd.select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        val hot = cmEstimate(cmCounters(toks, "tok", d, w),
            toks.select(col("tok")).distinct(), "tok", d, w)
          .filter(col("cm_est") >= hotThreshold)
        val nHot = toks.distinct()
          .join(broadcast(hot.select(col("tok"))), Seq("tok"))
          .groupBy(col("source")).agg(count(lit(1)).as("n_hot_tokens"))
        graft.sources.Bundle.save(dir, Map(
          "profile" -> Quality.corpusReport(dd),
          "hll" -> hllRegisters(toks, "tok", b, Seq("source")),
          "cm_hot" -> nHot,
          "moments" -> momentsState(
            dd.select(col("source"),
              round(graft.functions.TextFunctions.qualityScore(col("text")),
                6).as("q")), "q", Seq("source")),
          "kmv" -> kmvState(toks, "tok", k, Seq("source"))), params)
      } finally Checkpoints.release(dd)
      (graft.sources.Bundle.load(spark, dir), true)
    }
  }
}
