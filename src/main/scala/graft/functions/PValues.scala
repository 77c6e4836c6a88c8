package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tail probabilities for the drift detectors — the chi-squared survival
  * function and the Kolmogorov distribution — as PURE Column formulas
  * (no UDFs, no function registration, nothing driver-side), so the
  * batch and streamed drift reports can append a `p_value` column and an
  * external engine can replay the identical arithmetic in SQL.
  *
  * Both are textbook public math (Abramowitz & Stegun §6.5 / §26.4;
  * Numerical Recipes `gammp`; Kolmogorov's 1933 series), chosen in the
  * form replayable by a SQL engine:
  *
  *  - chi² survival `Q(dof/2, chi2/2)`: the regularized LOWER incomplete
  *    gamma via its power series
  *    `P(a,x) = x^a e^{−x} / Γ(a) · Σ_{n≥0} x^n / (a(a+1)…(a+n))`
  *    (fixed [[Iterations]] terms, sequential accumulation), `Q = 1 − P`.
  *    Parity-free — any dof, integer or not. The series needs roughly
  *    `x + 15·√x` terms, so the implementation clamps its DOMAIN rather
  *    than degrade silently: a deep-tail statistic
  *    (`x > a + 40 + 10·√a`, survival < 1e−11) returns exactly 0 before
  *    the series is consulted, and the remaining non-convergent corner —
  *    `x > 600` with a ≳ 1200-category table — returns NULL (documented
  *    out-of-domain, use a normal approximation there). `lgamma` is the
  *    Lanczos g=7/n=9 formula, ~1e−14 relative — SQL replays it with the
  *    engine's own `lgamma`, agreeing far below the 6-dp report rounding.
  *  - Kolmogorov survival `Q_KS(λ) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²λ²}`
  *    (100 terms): for the two-sample KS report,
  *    `λ = √(n_a·n_b/(n_a+n_b)) · D` — the classical asymptotic p-value.
  *    λ ≤ 0.2 returns exactly 1 (true deficit < 1e−12, and the
  *    alternating series needs its tail there).
  *
  * DuckDB replay (the oracle shape, shared by the q164/q169 oracles):
  * the gamma series as a `WITH RECURSIVE` chain over the report row, the
  * KS series as a `generate_series(1,100)` sum — term-for-term the same
  * arithmetic.
  */
object PValues {

  /** Series length for the incomplete-gamma power series (and the
    * recursion depth the SQL replay needs).
    */
  val Iterations = 1200

  /** Convergence domain bound for `x = chi2/2` (≈ Iterations − 15·√x). */
  val MaxSeriesX = 600.0

  /** Deep-tail clamp: past `a + 40 + 10√a` the survival is < 1e−11 —
    * 0 at the report's 6-dp rounding — and the series is not needed.
    */
  def tailBound(a: Double): Double = a + 40.0 + 10.0 * math.sqrt(a)

  // Lanczos g=7, n=9 — the standard public coefficient set (GSL, NR 3rd)
  private val LanczosG = 7.0
  private val Lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** ln Γ(z) for z ≥ 0.5 (the only regime the p-values need: a = dof/2
    * with dof ≥ 1) — Lanczos approximation, ~1e−14 relative.
    */
  def lgamma(z: Double): Double = {
    var x = Lanczos(0)
    var i = 1
    while (i < Lanczos.length) { x += Lanczos(i) / (z - 1.0 + i); i += 1 }
    val t = z + LanczosG - 0.5
    0.5 * math.log(2 * math.Pi) + (z - 0.5) * math.log(t) - t + math.log(x)
  }

  /** The Column twin of [[lgamma]] (same coefficients, same order). */
  def lgammaCol(z: Column): Column = {
    val x = Lanczos.zipWithIndex.drop(1).foldLeft(lit(Lanczos(0))) {
      case (acc, (c, i)) => acc + lit(c) / (z - 1.0 + i)
    }
    val t = z + (LanczosG - 0.5)
    lit(0.5 * math.log(2 * math.Pi)) + (z - 0.5) * log(t) - t + log(x)
  }

  /** Survival function of the chi-squared distribution: `P[X ≥ chi2]`
    * with `dof` degrees of freedom. NULL chi2/dof propagates; dof ≤ 0 is
    * NULL; see the object doc for the 0-clamp and NULL domain corner.
    */
  def chiSquaredSf(chi2: Double, dof: Double): Double = {
    if (dof <= 0) return Double.NaN
    if (chi2 <= 0) return 1.0
    val a = dof / 2.0
    val x = chi2 / 2.0
    if (x > tailBound(a)) return 0.0
    if (x > MaxSeriesX) return Double.NaN
    var term = 1.0 / a
    var s = term
    var n = 1
    while (n <= Iterations) {
      term = term * x / (a + n)
      s += term
      n += 1
    }
    val p = 1.0 - math.exp(a * math.log(x) - x - lgamma(a)) * s
    math.min(1.0, math.max(0.0, p))
  }

  /** The Column twin of [[chiSquaredSf]] — the gamma series as ONE
    * `aggregate(sequence(...))` fold (term and running sum ride a
    * 2-field struct), the same [[Iterations]] terms in the same order.
    */
  def chiSquaredSf(chi2: Column, dof: Column): Column = {
    val a = dof.cast("double") / 2.0
    val x = chi2.cast("double") / 2.0
    val folded = aggregate(
      sequence(lit(1), lit(Iterations)),
      struct((lit(1.0) / a).as("term"), (lit(1.0) / a).as("s")),
      (acc, n) => {
        val t = acc.getField("term") * x / (a + n.cast("double"))
        struct(t.as("term"), (acc.getField("s") + t).as("s"))
      },
      acc => acc.getField("s"))
    val p = lit(1.0) - exp(a * log(x) - x - lgammaCol(a)) * folded
    when(dof.isNull || chi2.isNull || dof <= 0, lit(null))
      .when(chi2 <= 0, 1.0)
      .when(x > a + 40.0 + sqrt(a) * 10.0, 0.0)
      .when(x > MaxSeriesX, lit(null))
      .otherwise(least(lit(1.0), greatest(lit(0.0), p)))
  }

  /** Survival function of the Kolmogorov distribution at λ — the
    * asymptotic two-sample KS p-value at
    * `λ = √(n_a·n_b/(n_a+n_b)) · D`.
    */
  def kolmogorovSf(lambda: Double): Double = {
    if (lambda <= 0.2) return 1.0
    var s = 0.0
    var k = 1
    while (k <= 100) {
      val sign = if (k % 2 == 1) 1.0 else -1.0
      s += sign * math.exp(-2.0 * k * k * lambda * lambda)
      k += 1
    }
    math.min(1.0, math.max(0.0, 2.0 * s))
  }

  /** The Column twin of [[kolmogorovSf]] (100-term alternating series —
    * replayable as a `generate_series(1,100)` sum).
    */
  def kolmogorovSf(lambda: Column): Column = {
    val s = aggregate(
      sequence(lit(1), lit(100)),
      lit(0.0),
      (acc, k) => acc +
        when(pmod(k, lit(2)) === 1, lit(1.0)).otherwise(lit(-1.0)) *
          exp(lit(-2.0) * k.cast("double") * k.cast("double") *
            lambda * lambda))
    when(lambda.isNull, lit(null))
      .when(lambda <= 0.2, 1.0)
      .otherwise(least(lit(1.0), greatest(lit(0.0), lit(2.0) * s)))
  }
}
