package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-ORDER (Morton-curve)
  * clustering — the storage-level answer to "my queries filter on TWO
  * columns and min/max file skipping only works for the sort key". Sorting
  * files by the bit-interleaved Z-value keeps rows close in BOTH
  * dimensions physically together, so each file's (min, max) box is TIGHT
  * in both columns and a range predicate on either (or both) touches a
  * small fraction of files — the same idea behind lakehouse OPTIMIZE
  * ZORDER (Morton 1966; the min/max-skipping effect is the "small
  * materialized aggregates" of Moerkotte 1998).
  *
  * Everything here is deterministic integer/bit arithmetic on quantized
  * cells, so the whole layout — Z-values, file assignment, per-file
  * min/max stats — replays cross-engine in SQL (q127), and the pruning
  * claim itself is spec-asserted by counting touched files under a box
  * predicate (LayoutSpec: Z-order beats the single-column sort layout).
  *
  * Scale shape: one quantize+interleave projection (pure codegen'd bit
  * math), the [[Positional]] distributed global rank (two bounded
  * exchanges — no single-task global window), and a file-grain
  * aggregation. At a real 100 TB table the rank becomes
  * `repartitionByRange(zval)` + per-partition files; the file-stats table
  * IS the skipping index parquet row-group min/max gives for free once
  * data is written in this order.
  */
object Layout {

  /** Quantize a value in [lo, hi] to an integer cell in [0, 2^bits). */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column =
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c - lit(lo)) / lit(hi - lo) * lit(1L << bits)).cast("bigint")))

  /** Bit-interleaved Morton value of two quantized cells: x takes the
    * even bits, y the odd — pure shifts/masks, codegen-friendly,
    * SQL-replayable.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Assign each row to one of `nFiles` equal-size files in Z-value order
    * (ties broken by `tieCol` for determinism): `file_id = (rank-1) ·
    * nFiles / total` over the distributed global rank.
    */
  def zorderFileAssignment(df: DataFrame, zCol: Column, tieCol: Column,
                           nFiles: Int): DataFrame = {
    val (numbered, total) = Positional.numberedWithTotal(
      df.withColumn("_z", zCol), Seq(col("_z"), tieCol), "_rn")
    numbered
      .withColumn("_num", (col("_rn") - 1) * lit(nFiles.toLong))
      .withColumn("file_id", expr(s"_num div ${total}L"))
      .drop("_rn", "_num")
  }

  /** Per-file min/max boxes + row counts over `statCols` — the skipping
    * index a reader consults before touching a file.
    */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame =
    df.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** How many files a box predicate must read under this layout: files
    * whose [min, max] interval intersects the queried range in EVERY
    * constrained dimension. The measure LayoutSpec uses to assert the
    * Z-layout's pruning beats a single-column sort.
    */
  def filesTouched(stats: DataFrame,
                   ranges: Map[String, (Double, Double)]): Long =
    stats.filter(ranges.map { case (c, (lo, hi)) =>
        col(s"max_$c") >= lo && col(s"min_$c") <= hi
      }.reduce(_ && _)).count()
}
