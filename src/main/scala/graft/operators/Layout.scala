package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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

  /** Bit-interleaved Morton value of n quantized cells: column j takes
    * bit positions j, j+n, j+2n, … — pure shifts/masks, codegen-friendly,
    * SQL-replayable. The 2-column [[zValue]] is the n=2 instance (x on
    * even bits, y on odd).
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValueN needs at least one column")
    require(n * bits <= 63,
      s"zValueN: $n columns at $bits bits overflow a signed long")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Bit-interleaved Morton value of two quantized cells. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

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

  // --------------------------------------------- written layout + skipping

  /** Materialize the Z-order layout as REAL parquet files: range-shuffle
    * on the z-value into `nFiles` partitions, sort within each, write one
    * file per partition (overwrite). Each output file then covers one
    * contiguous z-range, so its parquet footer min/max on BOTH clustered
    * columns is the tight box [[fileStats]] models — this is exactly the
    * lakehouse OPTIMIZE ZORDER write path, and `repartitionByRange` is
    * the 100 TB-safe shuffle (no global single-task sort; boundaries come
    * from sampling).
    */
  def zorderWrite(df: DataFrame, zCol: Column, tieCol: Column, nFiles: Int,
                  path: String): Unit =
    df.withColumn("_z", zCol).withColumn("_t", tieCol)
      .repartitionByRange(nFiles, col("_z"), col("_t"))
      .sortWithinPartitions(col("_z"), col("_t"))
      .drop("_z", "_t")
      .write.mode("overwrite").parquet(path)

  /** One parquet row group's min/max box, read from the file FOOTER —
    * the metadata a skipping reader consults without touching any data
    * page. Columns absent from a footer's statistics are simply missing
    * from the maps (a pruner must then keep the group).
    */
  final case class RowGroupStats(file: String, group: Int, rows: Long,
                                 mins: Map[String, Double],
                                 maxs: Map[String, Double])

  /** Walk the written layout's parquet footers and return every row
    * group's min/max box over `statCols` (numeric columns). This is the
    * real-metadata twin of [[fileStats]]: what parquet itself recorded
    * for the layout that was actually written. Driver-side by design —
    * footers are the skipping INDEX, tiny by construction; at warehouse
    * scale this table is persisted once per write (exactly what a
    * lakehouse transaction log stores) rather than re-walked per query.
    */
  def parquetStats(spark: SparkSession, path: String,
                   statCols: Seq[String]): Seq[RowGroupStats] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    files.flatMap { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
      try rd.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
        case (b, i) =>
          val stats = b.getColumns.asScala
            .filter(c => statCols.contains(c.getPath.toDotString))
            .flatMap { c =>
              val st = c.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: Number, mx: Number) =>
                  Some(c.getPath.toDotString ->
                    (mn.doubleValue(), mx.doubleValue()))
                case _ => None
              }
            }.toSeq
          RowGroupStats(f.getPath.toString, i, b.getRowCount,
            stats.map { case (c, (mn, _)) => c -> mn }.toMap,
            stats.map { case (c, (_, mx)) => c -> mx }.toMap)
      } finally rd.close()
    }
  }

  private val StatsDir = "_graft_stats"

  /** Persist the footer-stats skipping index as a tiny parquet table
    * under the layout (underscore-prefixed, so data reads ignore it) —
    * the transaction-log step: walk footers ONCE at write time, serve
    * every later scan's pruning from the saved table. The saved stats
    * DEFINE the table, exactly like a lakehouse log: a data file added
    * behind the index's back is invisible until stats are re-saved.
    */
  def saveStats(spark: SparkSession, path: String,
                statCols: Seq[String]): Unit = {
    import spark.implicits._
    // coalesce(1): the index is one row PER ROW GROUP — thousands of
    // entries for a real table, safely one file. If a layout ever grows
    // to ~10^6+ row groups (100 TB at tiny groups), shard this write by
    // file-name prefix instead of forcing one task.
    parquetStats(spark, path, statCols)
      .map(g => (g.file, g.group, g.rows, statCols,
        statCols.map(c => g.mins.get(c)),
        statCols.map(c => g.maxs.get(c))))
      .toDF("file", "group", "rows", "cols", "mins", "maxs")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** The saved skipping index, if one exists. The box arrays zip against
    * the STORED column list (the save-time order), never a caller's.
    */
  def loadStats(spark: SparkSession,
                path: String): Option[Seq[RowGroupStats]] = {
    val p = new Path(s"$path/$StatsDir")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString).collect().toSeq.map { r =>
      val cols = r.getSeq[String](3)
      def optSeq(i: Int): Seq[Option[Double]] =
        r.getSeq[Any](i).map(Option(_).map {
          case d: Double => d
          case n: Number => n.doubleValue()
        })
      RowGroupStats(r.getString(0), r.getInt(1), r.getLong(2),
        cols.zip(optSeq(4)).collect { case (c, Some(v)) => c -> v }.toMap,
        cols.zip(optSeq(5)).collect { case (c, Some(v)) => c -> v }.toMap)
    })
  }

  /** Scan the written layout under a box predicate, opening ONLY the
    * files whose footer boxes intersect the queried range in every
    * constrained dimension (a group missing statistics for a queried
    * column is conservatively kept). Returns the pruned frame — the
    * box FILTER still applies on top, so the result is row-identical to
    * a full scan with the same predicate (footer boxes are bounds, not
    * exact membership) — plus the kept file list and the total file
    * count, so callers and specs can measure the skipping that actually
    * happened.
    */
  def prunedScan(spark: SparkSession, path: String,
                 ranges: Map[String, (Double, Double)])
      : (DataFrame, Seq[String], Int) = {
    val stats = loadStats(spark, path)
      .getOrElse(parquetStats(spark, path, ranges.keys.toSeq))
    val allFiles = stats.map(_.file).distinct
    val keep = stats.filter { g =>
      ranges.forall { case (c, (lo, hi)) =>
        (g.mins.get(c), g.maxs.get(c)) match {
          // NaN bounds compare false against everything, which would
          // SKIP a file that may hold matching rows — conservatively keep
          case (Some(mn), Some(mx)) if !mn.isNaN && !mx.isNaN =>
            mx >= lo && mn <= hi
          case _ => true
        }
      }
    }.map(_.file).distinct
    val pred = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _)
    val df =
      if (keep.nonEmpty) spark.read.parquet(keep: _*).filter(pred)
      else spark.read.parquet(path).filter(lit(false))
    (df, keep, allFiles.size)
  }
}
