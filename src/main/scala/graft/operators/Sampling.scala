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
}
