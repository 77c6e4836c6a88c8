package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checked query: a Spark implementation and (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle. Queries without an
  * oracle get the driver's weaker rows-only check.
  *
  * Determinism contract (driver hashes values after sorting columns by
  * name): every query ends in a deterministic ORDER BY on unique keys; every
  * floating-point output is rounded; sums of non-integer doubles go through
  * `QueryUtil.stableSum` (per-row round → DECIMAL → exact sum) because plain
  * double summation is partition-order-dependent.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[QueryDef] =
    CurveQueries.defs ++ RelationalQueries.defs ++ FunctionQueries.defs ++
      CorpusQueries.defs ++ EventQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
