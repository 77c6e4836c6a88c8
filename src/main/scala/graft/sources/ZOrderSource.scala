package graft.sources

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import graft.operators.Layout

/** `spark.read.format("graft-zorder").load(path)` — the written Z-order
  * layout ([[graft.operators.Layout.zorderWrite]]) as a REAL read path:
  * a plain `.filter()` on the returned frame pushes its predicates into
  * this source (Spark's `PrunedFilteredScan` contract), which consults
  * the SAVED skipping index (`Layout.saveStats`' footer-stats table, the
  * transaction-log step) and opens ONLY the files whose min/max boxes
  * intersect the implied per-column ranges. No more calling
  * `Layout.prunedScan` by hand — the skipping happens at planner level
  * for anyone reading the layout.
  *
  * Correctness contract: file skipping is a SUPERSET guarantee, so every
  * pushed filter is also declared unhandled — Spark re-applies the exact
  * predicate on top, and the result is row-identical to a full scan.
  * Filters that imply no numeric range (Or, In, IsNull, string
  * comparisons) derive no bound and prune nothing — conservative, never
  * wrong. A layout without a saved index falls back to the plain
  * directory scan.
  *
  * Implemented on the stable `org.apache.spark.sql.sources` DSv1
  * extension surface (RelationProvider + PrunedFilteredScan): the data
  * itself is still read by Spark's native parquet reader over the kept
  * file list, so codegen/vectorization are unchanged; this source only
  * decides WHICH files that reader sees.
  */
class ZOrderSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-zorder"
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-zorder needs a path: spark.read.format(\"graft-zorder\").load(dir)"))
    ZOrderRelation(sqlContext.sparkSession, path)
  }

  /** The WRITE path —
    * {{{
    *   df.write.format("graft-zorder")
    *     .option("zcols", "n_tok,q,nchar")   // clustering columns
    *     .option("bits", "8")                // cells/dim = 2^bits
    *     .option("nFiles", "64")
    *     .option("tieCol", "doc_id")         // deterministic order
    *     .save(dir)
    * }}}
    * — one step does what the hand-driven recipe did: quantization
    * bounds come from ONE min/max aggregation over the clustering
    * columns, the n-column Morton value orders the range shuffle
    * ([[Layout.zorderWrite]]), and the footer-stats skipping index is
    * saved immediately ([[Layout.saveStats]]) so the read path prunes
    * from day one. Only Overwrite mode: a Z-order layout is a SORTED
    * physical arrangement — appending unsorted files would silently
    * break the tight-box property, so it is refused rather than
    * degraded (re-layout to add data, exactly like lakehouse OPTIMIZE).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.functions.{col, max, min}
    require(mode == SaveMode.Overwrite,
      s"graft-zorder writes are Overwrite-only (got $mode): a Z-order " +
        "layout is a sorted arrangement; re-layout to add data")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-zorder needs a path"))
    val zcols = parameters.getOrElse("zcols",
        throw new IllegalArgumentException(
          "graft-zorder needs option zcols=<c1,c2,...>"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(zcols.nonEmpty, "zcols must name at least one column")
    zcols.foreach(c => require(data.columns.contains(c),
      s"zcols column $c not in ${data.columns.mkString(", ")}"))
    val bits = parameters.getOrElse("bits", "8").toInt
    val nFiles = parameters.getOrElse("nFiles", "64").toInt
    val tieCol = parameters.get("tieCol")
    require(bits >= 1 && zcols.size * bits <= 63,
      s"${zcols.size} columns at $bits bits overflow a signed long")

    // quantization bounds from the data: one bounded aggregation
    // (min_c0, max_c0, min_c1, max_c1, ...)
    val aggExprs = zcols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val boundsRow = data.agg(aggExprs.head, aggExprs.tail: _*).head()
    val bounds = zcols.indices.map { i =>
      val (lo, hi) =
        if (boundsRow.isNullAt(2 * i)) (0.0, 1.0) // empty/all-null column
        else (boundsRow.getDouble(2 * i), boundsRow.getDouble(2 * i + 1))
      if (hi > lo) (lo, hi) else (lo, lo + 1.0) // constant column guard
    }
    val z = Layout.zValueN(zcols.zip(bounds).map { case (c, (lo, hi)) =>
      Layout.quantize(col(c).cast("double"), lo, hi, bits) }, bits)
    val spark = sqlContext.sparkSession
    Layout.zorderWrite(data, z,
      tieCol.map(col).getOrElse(z), nFiles, path)
    Layout.saveStats(spark, path, zcols)
    ZOrderRelation(spark, path)
  }
}

object ZOrderSource {
  /** (files kept, files total) of the most recent buildScan on this
    * driver — the spec hook measuring that skipping actually happened.
    */
  val lastScan = new AtomicReference[(Int, Int)]((0, 0))
}

case class ZOrderRelation(spark: SparkSession, path: String)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = spark.read.parquet(path).schema

  // skipping is a superset guarantee, not row-exact: every filter is
  // re-applied by Spark on top of the pruned scan
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val ranges = ZOrderRelation.ranges(filters)
    val (files, total) = Layout.loadStats(spark, path) match {
      case Some(stats) =>
        val all = stats.map(_.file).distinct
        (stats.filter(g => ZOrderRelation.mayMatch(g, ranges))
          .map(_.file).distinct, all.size)
      case None => (Seq(path), 1) // no saved index: plain full scan
    }
    ZOrderSource.lastScan.set((files.size, total))
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    base.select(requiredColumns.toSeq
      .map(org.apache.spark.sql.functions.col): _*).rdd
  }
}

object ZOrderRelation {

  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case o => Seq(o)
  }

  /** FINITE numeric values only — a NaN bound would compare false in
    * the intersect test and skip files whose rows can match under
    * Spark's NaN-equals-NaN semantics (see [[graft.plans.ZOrderPruneRule]]).
    */
  private def num(v: Any): Option[Double] = (v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }).filter(d => !d.isNaN && !d.isInfinite)

  /** Per-column closed [lo, hi] bounds implied by the pushed filters —
    * strict bounds widen to closed ones (skipping only needs a
    * superset); non-range filters derive nothing.
    */
  private[graft] def ranges(
      filters: Array[Filter]): Map[String, (Double, Double)] = {
    val b = scala.collection.mutable.Map[String, (Double, Double)]()
    def tighten(c: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = b.getOrElse(c,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      b(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    filters.flatMap(conjuncts).foreach {
      case GreaterThan(c, v) =>
        num(v).foreach(d => tighten(c, d, Double.PositiveInfinity))
      case GreaterThanOrEqual(c, v) =>
        num(v).foreach(d => tighten(c, d, Double.PositiveInfinity))
      case LessThan(c, v) =>
        num(v).foreach(d => tighten(c, Double.NegativeInfinity, d))
      case LessThanOrEqual(c, v) =>
        num(v).foreach(d => tighten(c, Double.NegativeInfinity, d))
      case EqualTo(c, v) => num(v).foreach(d => tighten(c, d, d))
      case _ => () // Or/In/IsNull/strings: conservative, no bound
    }
    b.toMap
  }

  /** NaN footer bounds compare false against everything, which would
    * SKIP a file that may hold matching rows — conservatively keep
    * (same rule as [[Layout.prunedScan]]).
    */
  private[graft] def mayMatch(g: Layout.RowGroupStats,
      ranges: Map[String, (Double, Double)]): Boolean =
    ranges.forall { case (c, (lo, hi)) =>
      (g.mins.get(c), g.maxs.get(c)) match {
        case (Some(mn), Some(mx)) if !mn.isNaN && !mx.isNaN =>
          mx >= lo && mn <= hi
        case _ => true
      }
    }
}
