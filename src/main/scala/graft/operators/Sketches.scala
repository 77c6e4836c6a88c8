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
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(b >= 4 && b <= 16, s"need 4 <= b <= 16 bucket bits, got $b")
    val m = 1L << b
    val rem = 60 - b
    // integer-only bit split: double division at h ~ 2^60 would lose low
    // bits past the 53-bit mantissa and silently corrupt rho
    val rho = when(col("_w") === 0L, lit(rem + 1))
      .otherwise(lit(rem + 1) - length(bin(col("_w"))))
      .cast("int")
    df.select((groupCols.map(col) :+
        TextFunctions.md5Hash60(col(valueCol)).as("_h")): _*)
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
}
