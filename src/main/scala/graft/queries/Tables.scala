package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical derived views shared by the driver-checked query inventory.
  *
  * The reference's data model (curves `(image_idx, delay, q_bin, i, err)`,
  * pixel frames `(image_id, x, y, intensity)` — SURVEY §1.1) is mapped
  * deterministically onto the driver's TPC-H-ish `lineitem` table so every
  * trx operator can be exercised AND oracle-checked: each view exists twice,
  * as a Spark `DataFrame` builder and as the equivalent DuckDB `WITH` SQL —
  * kept adjacent here so they cannot drift.
  *
  * Mapping (one "image" per order, one q-bin per line number):
  *   image_idx = l_orderkey            (acquisition order)
  *   delay     = round((l_orderkey % 5) * 1e-9, 12)   — 5 pump-probe delays
  *   q_bin     = l_linenumber          (1..7)
  *   i         = l_quantity            (integer-valued ⇒ exact double sums)
  *   err       = sqrt(l_quantity)
  */
object Tables {

  /** Session-keyed METADATA memo for the base-table reads: every
    * `spark.read.parquet` call pays a file-listing + parquet schema-
    * inference job (~30-40 ms) plus the relation's re-analysis — a pure
    * per-query constant that the 100+ sub-second queries repaid on every
    * bench iteration (the same role a catalog's table metadata plays; the
    * guide's §6 file-listing-cache point). Only the analyzed RELATION is
    * reused — no data is cached or persisted: every execution still scans
    * the parquet files. Keyed by (session, path) so concurrent sessions
    * (tests vs mains) never share state; a stopped session's entry is a
    * few KB of plan until the map is next written.
    */
  private val readMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    readMemo.computeIfAbsent((spark, s"$dir/$name.parquet"),
      kv => kv._1.read.parquet(kv._2))

  // -------------------------------------------------------------- curves --
  // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
  // mapping aggregates to the (image_idx, q_bin) grain — uniqueness is what
  // makes the as-of windows deterministic. i stays integer-valued, so its
  // sums are exact in double regardless of partition order.
  def curves(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(
        col("l_orderkey").as("image_idx"),
        round((col("l_orderkey") % 5) * 1e-9, 12).as("delay"),
        col("l_linenumber").cast("int").as("q_bin"))
      .agg(sum(col("l_quantity")).as("i"))
      .withColumn("err", sqrt(col("i")))

  val curvesSql: String =
    """curves AS (
      |  SELECT l_orderkey AS image_idx,
      |         round((l_orderkey % 5) * 1e-9, 12) AS delay,
      |         l_linenumber::INT AS q_bin,
      |         sum(l_quantity) AS i,
      |         sqrt(sum(l_quantity)) AS err
      |  FROM lineitem GROUP BY 1, 2, 3)""".stripMargin

  /** Curves with a laser-off sentinel delay (-10.0) on every 7th order —
    * exercises the J5 min-excluding-sentinel reference tagging.
    */
  def curvesWithOff(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(
        col("l_orderkey").as("image_idx"),
        when(col("l_orderkey") % 7 === 0, -10.0)
          .otherwise(round((col("l_orderkey") % 5) * 1e-9, 12)).as("delay"),
        col("l_linenumber").cast("int").as("q_bin"))
      .agg(sum(col("l_quantity")).as("i"))
      .withColumn("err", sqrt(col("i")))

  val curvesWithOffSql: String =
    """curves AS (
      |  SELECT l_orderkey AS image_idx,
      |         CASE WHEN l_orderkey % 7 = 0 THEN -10.0
      |              ELSE round((l_orderkey % 5) * 1e-9, 12) END AS delay,
      |         l_linenumber::INT AS q_bin,
      |         sum(l_quantity) AS i,
      |         sqrt(sum(l_quantity)) AS err
      |  FROM lineitem GROUP BY 1, 2, 3)""".stripMargin

  // -------------------------------------------------------------- pixels --
  /** Synthetic detector frame pixels on a 64×64 grid, 10 images. */
  def pixels(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").select(
      (col("l_orderkey") % 10).cast("int").as("image_id"),
      (col("l_partkey") % 64).cast("int").as("x"),
      (col("l_suppkey") % 64).cast("int").as("y"),
      col("l_quantity").as("intensity"))

  val pixelsSql: String =
    """pixels AS (
      |  SELECT (l_orderkey % 10)::INT AS image_id,
      |         (l_partkey % 64)::INT AS x,
      |         (l_suppkey % 64)::INT AS y,
      |         l_quantity AS intensity
      |  FROM lineitem)""".stripMargin
}
