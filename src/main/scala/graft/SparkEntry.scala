package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2) assembled in
  * graft.queries.Registry; EVERY entry has a DuckDB oracle in `oracleSql`
  * (the formerly rows-only MinHash/SimHash/multimodal queries run their
  * SQL-verifiable hash families — md5-derived, recomputable in DuckDB).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's E2 pipeline (tag references → interpolated as-of
    * reference join → difference → thinning → per-delay averaging) on the
    * canonical curve mapping.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q03_e2_time_resolved")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
