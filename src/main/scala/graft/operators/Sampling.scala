package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic, engine-portable sampling for corpus curation.
  *
  * `df.sample()` draws from RNG state — a different subset per run, per
  * partition layout, per engine. Training-data pipelines need the OPPOSITE:
  * the same document set for every rerun of a recipe (else every
  * downstream cache, dedup and eval drifts). A hash-based Bernoulli rule
  * gives that: a row survives iff md5(salt, id) mod 1e6 < fraction·1e6 —
  * pure per-row column math (no shuffle, no RNG, trivially pushdown-safe),
  * reproducible on any engine including the DuckDB oracle, and re-salting
  * yields an independent sample.
  */
object Sampling {

  /** Survival predicate: md5-derived 60-bit hash of (salt, id) mod 1e6
    * compared against fraction·1e6 (floor; fraction resolution 1e-6).
    */
  def surviveExpr(idCol: Column, fraction: Column, salt: String): Column =
    pmod(TextFunctions.md5Hash60(
      concat_ws("_", lit(salt), idCol.cast("string"))), lit(1000000L)) <
      floor(fraction * 1e6)

  /** Deterministic Bernoulli sample at a single rate. */
  def deterministicSample(df: DataFrame, fraction: Double,
                          idCol: String = "doc_id",
                          salt: String = "graft"): DataFrame =
    df.filter(surviveExpr(col(idCol), lit(fraction), salt))

  /** Stratified deterministic sample: per-stratum rates (e.g. per
    * language), `defaultFraction` for unlisted strata. The rate table is
    * broadcast — the corpus is filtered in place, no shuffle.
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       idCol: String = "doc_id",
                       salt: String = "graft"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = fractions.toSeq.toDF(strataCol, "_frac")
    df.join(broadcast(rates), Seq(strataCol), "left")
      .withColumn("_frac", coalesce(col("_frac"), lit(defaultFraction)))
      .filter(surviveExpr(col(idCol), col("_frac"), salt))
      .drop("_frac")
  }

  /** Mixture resampling toward TARGET proportions — the data-mixing step
    * of a corpus recipe ("60% web, 30% code, 10% books"): per-stratum keep
    * rates are derived from the OBSERVED stratum counts so the surviving
    * corpus hits the target weights at `budgetFraction` of the total size,
    * then the deterministic survival hash filters in place. Rates clamp at
    * 1.0 — a stratum smaller than its allocation keeps everything and the
    * mixture lands as close as the data allows (no upsampling; clamped
    * mass is NOT redistributed, so reruns are replay-stable).
    *
    * Cost at scale: one partially-aggregated count (#strata rows on the
    * driver — bounded by the stratum vocabulary, not the data) plus the
    * broadcast rate join; the corpus itself never shuffles. Rate
    * arithmetic keeps a fixed operation order (`budget·total·(w/wSum)/n`)
    * so any engine — including the DuckDB oracle — reproduces the exact
    * same doubles and thresholds.
    */
  def mixtureSample(df: DataFrame, strataCol: String,
                    targetWeights: Map[String, Double],
                    budgetFraction: Double,
                    idCol: String = "doc_id",
                    salt: String = "graft"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getAs[Long]("_n")).toMap
    val total = counts.values.sum
    val wSum = targetWeights.values.sum
    val rates = targetWeights.flatMap { case (stratum, w) =>
      counts.get(stratum).map { n =>
        stratum ->
          math.min(1.0, budgetFraction * total * (w / wSum) / math.max(n, 1L))
      }
    }
    stratifiedSample(df, strataCol, rates, defaultFraction = 0.0, idCol, salt)
  }

  /** Temperature-flattened mixture (the multilingual/multi-domain
    * rebalance of XLM/mT5-style pipelines): target weights ∝ p_d^(1/T)
    * where p_d is the OBSERVED stratum share — T = 1 keeps proportions,
    * T > 1 flattens toward uniform (upweights small domains), T → ∞ is
    * uniform. Same machinery as [[mixtureSample]]: bounded per-stratum
    * counts on the driver, fixed-order rate arithmetic
    * (`budget·total·(w/wSum)/n`, clamp 1.0), md5 survival filter — the
    * corpus never shuffles and any engine replays the exact thresholds.
    */
  def temperatureSample(df: DataFrame, strataCol: String,
                        temperature: Double, budgetFraction: Double,
                        idCol: String = "doc_id",
                        salt: String = "graft"): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getAs[Long]("_n")).toMap
    val total = counts.values.sum
    val weights = counts.map { case (stratum, n) =>
      stratum -> math.pow(n.toDouble / total, 1.0 / temperature)
    }
    val wSum = weights.values.sum
    val rates = weights.map { case (stratum, w) =>
      stratum -> math.min(1.0,
        budgetFraction * total * (w / wSum) / math.max(counts(stratum), 1L))
    }
    stratifiedSample(df, strataCol, rates, defaultFraction = 0.0, idCol, salt)
  }

  /** Deterministic weighted sampling WITHOUT replacement per stratum —
    * the one-pass A-ES scheme (Efraimidis & Spirakis 2006) in this
    * file's replay discipline: each row draws u ∈ (0, 1] from the md5
    * hash of (salt, id) as an EXACT 53-bit fixed-point fraction, and is
    * keyed by round(ln(u)/w, 6). Maximizing u^(1/w) and maximizing
    * ln(u)/w order identically (ln is monotone, ln u ≤ 0, w > 0), and
    * the log form keeps the arithmetic one round-6'd double per row —
    * replayable by the SQL oracle. The n largest keys per stratum win
    * (heavier rows systematically draw larger keys — the weighted-
    * reservoir inclusion guarantee, with no reservoir or sequential
    * state); ties break to the smaller id. Rows with w <= 0 never
    * qualify.
    *
    * Cost at scale: one projection plus the salted two-phase top-n per
    * stratum ([[Similarity.saltedTopK]]) — no task sorts more than
    * n·nSalt rows however large or skewed a stratum is, and the corpus
    * never shuffles by content. Output: input columns + `_sk` (the
    * selection key) + `rank` (1-based within the stratum).
    */
  def weightedSample(df: DataFrame, n: Int, weightCol: String,
                     strataCol: String, idCol: String = "doc_id",
                     salt: String = "graft"): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    // (h mod (2^53−1) + 1) / 2^53: numerator in [1, 2^53−1] — exact in a
    // double, as is the power-of-two divisor, so u is bit-identical on
    // any IEEE engine
    val u = (pmod(TextFunctions.md5Hash60(
        concat_ws("_", lit(salt), col(idCol).cast("string"))),
        lit(9007199254740991L)) + 1)
      .cast("double") / lit(9007199254740992.0)
    val keyed = df.filter(col(weightCol) > 0)
      .withColumn("_sk", round(log(u) / col(weightCol), 6))
    Similarity.saltedTopK(keyed, n,
      Seq(col("_sk").desc, col(idCol)), idCol, strataCol)
  }
}
