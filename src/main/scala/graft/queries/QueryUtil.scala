package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-checked query inventory.
  *
  * Cross-engine determinism rules (Spark result must hash-match the DuckDB
  * oracle):
  *  - every floating-point output column is rounded (sums of large values
  *    coarser than small-magnitude stats) — double accumulation order
  *    differs between engines;
  *  - exact money-style totals go through DECIMAL(18,6) so the sum itself
  *    is exact (then cast back to double);
  *  - every query ends with a deterministic ORDER BY;
  *  - sample stddev of singleton groups is NULL on DuckDB but NaN on Spark
  *    → always guarded by `count > 1`.
  */
object QueryUtil {

  /** Exact sum of a money-like double column via decimal, back to double. */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Sample stddev that is NULL (not NaN) for singleton groups — matches
    * DuckDB/ANSI.
    */
  def stddevOrNull(c: Column): Column =
    when(count(c) > 1, stddev(c))

  /** Round a double column for cross-engine hash stability. */
  def r6(c: Column): Column = round(c, 6)
  def r4(c: Column): Column = round(c, 4)
  def r2(c: Column): Column = round(c, 2)

  /** Order-independent sum of a non-integer double column: round each value
    * to 6 decimals, sum exactly as DECIMAL, return double. Plain double sums
    * depend on partition order and cannot hash-match across engines.
    * DuckDB equivalent: `round(sum(round(c, 6)::DECIMAL(28,6))::DOUBLE, 6)`.
    */
  def stableSum(c: Column): Column =
    round(sum(round(c, 6).cast("decimal(28,6)")).cast("double"), 6)

  /** SQL text of `stableSum` for oracle queries. */
  def stableSumSql(expr: String): String =
    s"round(sum(round($expr, 6)::DECIMAL(28,6))::DOUBLE, 6)"
}
