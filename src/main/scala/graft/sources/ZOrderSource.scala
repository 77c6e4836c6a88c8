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
  * Bounds are per-column range UNIONS, so disjunctive probes (`IN`
  * lists, OR-of-ranges) prune as interval sets; filters that imply no
  * numeric constraint (IsNull, strings, mixed-column Or) derive no
  * bound and prune nothing — conservative, never wrong. A layout
  * without a saved index falls back to the plain directory scan.
  *
  * Implemented on the stable `org.apache.spark.sql.sources` DSv1
  * extension surface (RelationProvider + PrunedFilteredScan): the data
  * itself is still read by Spark's native parquet reader over the kept
  * file list, so codegen/vectorization are unchanged; this source only
  * decides WHICH files that reader sees.
  */
class ZOrderSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSinkProvider {
  override def shortName(): String = "graft-zorder"

  /** The STREAMING write path —
    * {{{
    *   rows.writeStream.format("graft-zorder")
    *     .option("zcols", "x,y").option("bits", "8")
    *     .option("nFiles", "16").option("tieCol", "id")
    *     .option("compactFactor", "4")
    *     .option("checkpointLocation", ckpt)
    *     .start(dir)
    * }}}
    * — [[graft.streaming.StreamingZLayout]] behind the registered
    * format: bootstrap from the first non-empty batch, per-batch
    * appendDelta, drift-bounded compaction, and EXACTLY-ONCE via the
    * batch-id tag riding the atomic index-epoch commit. Append output
    * mode only (a Z-layout has no keyed update semantics), no
    * partitionBy (the layout IS the physical arrangement).
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-zorder streaming sink is Append-only (got $outputMode)")
    require(partitionColumns.isEmpty,
      "graft-zorder streaming sink: partitionBy is unsupported — the " +
        "Z-order layout IS the physical arrangement")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-zorder streaming sink needs a path: .start(dir)"))
    val zcols = parameters.getOrElse("zcols",
        throw new IllegalArgumentException(
          "graft-zorder streaming sink needs option zcols=<c1,c2,...>"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(zcols.nonEmpty, "zcols must name at least one column")
    val p = graft.streaming.StreamingZLayout.Params(
      zcols = zcols,
      bits = parameters.getOrElse("bits", "8").toInt,
      nFiles = parameters.getOrElse("nFiles", "16").toInt,
      tieCol = parameters.get("tieCol"),
      compactFactor = parameters.getOrElse("compactFactor", "4").toInt,
      curve = parameters.getOrElse("curve", "morton"),
      bloomCols = parameters.get("bloomCols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
    // resetProgress: one-shot acceptance of a NEW checkpoint's batch 0
    // against an existing layout's higher committed watermark — remove
    // the option once the stream is running again
    new ZOrderStreamSink(path, p,
      parameters.get("resetProgress").exists(_.toBoolean))
  }
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
    * — one step does what the hand-driven recipe did
    * ([[Layout.buildLayout]]): quantization bounds come from ONE min/max
    * aggregation over the clustering columns, the n-column Morton value
    * orders the range shuffle ([[Layout.zorderWrite]]), the footer-stats
    * skipping index is committed immediately so the read path prunes
    * from day one, and the build manifest makes the layout
    * MAINTAINABLE: `.mode("append")` on the same path routes through
    * [[Layout.appendDelta]] — the delta is Z-sorted under the saved
    * bounds and made visible by one atomic index-epoch commit, never by
    * dropping unsorted files into the directory. `Layout.compact`
    * restores clustering quality and garbage-collects superseded files
    * (the lakehouse OPTIMIZE + VACUUM loop). ErrorIfExists/Ignore are
    * refused: a layout is either built or maintained, never silently
    * skipped.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-zorder needs a path"))
    val spark = sqlContext.sparkSession
    mode match {
      case SaveMode.Overwrite =>
        val zcols = parameters.getOrElse("zcols",
            throw new IllegalArgumentException(
              "graft-zorder needs option zcols=<c1,c2,...>"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(zcols.nonEmpty, "zcols must name at least one column")
        zcols.foreach(c => require(data.columns.contains(c),
          s"zcols column $c not in ${data.columns.mkString(", ")}"))
        val bits = parameters.getOrElse("bits", "8").toInt
        val nFiles = parameters.getOrElse("nFiles", "64").toInt
        require(bits >= 1 && zcols.size * bits <= 63,
          s"${zcols.size} columns at $bits bits overflow a signed long")
        // curve=hilbert (2 clustering columns only) orders the range
        // shuffle by the Hilbert index instead of the Morton interleave;
        // the choice persists in the manifest so appends/compactions
        // replay it
        val curve = parameters.getOrElse("curve", "morton")
        require(Layout.Curves.contains(curve),
          s"graft-zorder: unknown curve '$curve' " +
            s"(one of ${Layout.Curves.mkString(", ")})")
        Layout.buildLayout(data, zcols, bits, nFiles,
          parameters.get("tieCol"), path, curve = curve)
      case SaveMode.Append =>
        // build params come from the layout's own manifest — zcols/bits
        // options on an append are refused rather than silently ignored
        Seq("zcols", "bits", "nFiles", "tieCol", "curve").foreach(o =>
          require(!parameters.contains(o),
            s"graft-zorder append: option $o is fixed at build time " +
              "(read from the layout manifest); re-build to change it"))
        Layout.appendDelta(data, path)
      case other =>
        throw new IllegalArgumentException(
          s"graft-zorder: unsupported SaveMode $other — Overwrite builds " +
            "a layout, Append maintains one")
    }
    ZOrderRelation(spark, path)
  }
}

/** The DSv1 streaming sink behind `writeStream.format("graft-zorder")`:
  * each micro-batch re-wraps as a plain batch frame (the ForeachBatchSink
  * move — [[org.apache.spark.sql.graft.PlanExec.freshBatchDF]]) and runs
  * [[graft.streaming.StreamingZLayout.processBatch]], whose committed
  * batch-id tag makes replays exact no-ops.
  */
private[graft] class ZOrderStreamSink(path: String,
    p: graft.streaming.StreamingZLayout.Params,
    resetProgress: Boolean) extends
    org.apache.spark.sql.execution.streaming.Sink {
  // the reset is a ONE-SHOT escape for a new checkpoint over an
  // existing layout (batch ids restart at 0, below the committed
  // watermark): it clears as soon as one batch APPLIES, so replay
  // protection resumes for the rest of the run — a standing bypass
  // would double-apply replays within the new run
  @volatile private var resetPending = resetProgress
  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    val r = graft.streaming.StreamingZLayout.processBatch(
      org.apache.spark.sql.graft.PlanExec.freshBatchDF(data),
      batchId, path, p, resetProgress = resetPending)
    if (r.applied) resetPending = false
    ()
  }
  override def toString: String = s"ZOrderStreamSink[$path]"
}

object ZOrderSource {
  /** (files kept, files total) of the most recent buildScan on this
    * driver — the spec hook measuring that skipping actually happened.
    */
  private[graft] val lastScan = new AtomicReference[(Int, Int)]((0, 0))
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
        val kept = stats.filter(g => ZOrderRelation.mayMatch(g, ranges))
          .map(_.file).distinct
        (ZOrderRelation.bloomNarrow(spark, path, filters, kept), all.size)
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
    * Temporal values convert to the UNIT PARQUET FOOTER STATISTICS use —
    * micros for timestamps, epoch days for dates — so a layout
    * Z-ordered on a time column prunes too (translateFilter hands the
    * EXTERNAL value here, not the internal long).
    */
  private def num(v: Any): Option[Double] = (v match {
    case n: Number => Some(n.doubleValue())
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000.0 + (t.getNanos % 1000000) / 1000.0)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1e6 + i.getNano / 1000.0)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
    case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
    case dt: java.time.LocalDateTime =>
      Some(dt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1e6 +
        dt.getNano / 1000.0)
    case _ => None
  }).filter(d => !d.isNaN && !d.isInfinite)

  /** Members above which an IN-list collapses to its [min, max]
    * envelope: the prune test is O(files × intervals), and a 10k-member
    * probe list as 10k point intervals buys little over its envelope.
    */
  private val MaxUnionIntervals = 64

  /** Per-column RANGE UNIONS implied by the pushed filters: column `c`
    * must lie in AT LEAST ONE of its `[lo, hi]` intervals (strict bounds
    * widen to closed — skipping only needs a superset). Disjunctive
    * shapes derive real bounds now:
    *   - `In(c, vs)` → the union of point intervals (its [min, max]
    *     envelope past [[MaxUnionIntervals]] members);
    *   - `Or` → the union of its sides' bounds, when EVERY side
    *     constrains the SAME single column (each side may itself be a
    *     conjunction — `(x >= 10 AND x < 20) OR (x >= 50 AND x < 60)`
    *     intersects within a side, unions across sides);
    *   - conjuncts on one column INTERSECT their unions (pairwise
    *     interval intersection; an empty result proves the predicate
    *     unsatisfiable and prunes every file).
    * Anything else (IsNull, strings, mixed-column Or, a NULL In member)
    * derives nothing — conservative, never wrong.
    */
  private[graft] def ranges(
      filters: Array[Filter]): Map[String, Seq[(Double, Double)]] = {
    val b = scala.collection.mutable.Map[String, Seq[(Double, Double)]]()
    filters.flatMap(conjuncts).foreach { f =>
      bound(f).foreach { case (c, ivs) =>
        b(c) = b.get(c).map(intersect(_, ivs)).getOrElse(ivs)
      }
    }
    b.toMap
  }

  /** The interval union one filter implies, when it constrains exactly
    * one column (see [[ranges]]).
    */
  private def bound(f: Filter): Option[(String, Seq[(Double, Double)])] =
    f match {
      case GreaterThan(c, v) =>
        num(v).map(d => c -> Seq((d, Double.PositiveInfinity)))
      case GreaterThanOrEqual(c, v) =>
        num(v).map(d => c -> Seq((d, Double.PositiveInfinity)))
      case LessThan(c, v) =>
        num(v).map(d => c -> Seq((Double.NegativeInfinity, d)))
      case LessThanOrEqual(c, v) =>
        num(v).map(d => c -> Seq((Double.NegativeInfinity, d)))
      case EqualTo(c, v) => num(v).map(d => c -> Seq((d, d)))
      case In(c, vs) =>
        val ds = vs.toSeq.map(num)
        // ANY non-numeric/NULL member poisons the whole list (that
        // member's rows could live anywhere)
        if (ds.isEmpty || ds.exists(_.isEmpty)) None
        else {
          val pts = ds.flatten
          if (pts.size > MaxUnionIntervals) Some(c -> Seq((pts.min, pts.max)))
          else Some(c -> pts.map(d => (d, d)))
        }
      case Or(a, b) =>
        // each side is a conjunction: intersect within, union across
        def side(s: Filter): Option[(String, Seq[(Double, Double)])] = {
          val bs = conjuncts(s).map(bound)
          if (bs.isEmpty || bs.exists(_.isEmpty)) None
          else {
            val flat = bs.flatten
            val c = flat.head._1
            if (flat.forall(_._1 == c))
              Some(c -> flat.map(_._2).reduce(intersect))
            else None
          }
        }
        (side(a), side(b)) match {
          case (Some((ca, ia)), Some((cb, ib))) if ca == cb =>
            val u = ia ++ ib
            if (u.size > MaxUnionIntervals)
              Some(ca -> Seq((u.map(_._1).min, u.map(_._2).max)))
            else Some(ca -> u)
          case _ => None
        }
      case _ => None // IsNull/strings/Not: conservative, no bound
    }

  /** Intersection of two interval unions: pairwise overlaps, empties
    * dropped. An empty result is a PROOF of unsatisfiability.
    */
  private def intersect(a: Seq[(Double, Double)],
      b: Seq[(Double, Double)]): Seq[(Double, Double)] =
    for {
      (l1, h1) <- a; (l2, h2) <- b
      lo = math.max(l1, l2); hi = math.min(h1, h2)
      if lo <= hi
    } yield (lo, hi)

  /** Bloom-sidecar narrowing of an interval-kept file list: every pushed
    * `EqualTo`/`In` conjunct on a column with a committed sidecar
    * ([[Layout.saveBloom]]) drops covered files whose bitmap rules the
    * probe out — the pruning shape footer boxes cannot do (a
    * high-cardinality id is uniform across files, so every [min, max]
    * contains every probed id). Only integral and string literals probe
    * (their Spark `cast(col as string)` rendering is reproducible
    * driver-side; float corners are not) and IN-lists cap at 64 members;
    * anything else — and every file the sidecar does not cover — is
    * conservatively kept. Conjuncts INTERSECT (each must pass); an
    * IN-list keeps a file if ANY member may be present.
    */
  private[graft] def bloomNarrow(spark: SparkSession, path: String,
      filters: Array[Filter], kept: Seq[String]): Seq[String] = {
    def probeable(v: Any): Boolean = v match {
      case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
           _: java.lang.Byte | _: String => true
      case _ => false
    }
    val probes: Seq[(String, Seq[Any])] =
      filters.flatMap(conjuncts).collect {
        case EqualTo(c, v) if probeable(v) => c -> Seq(v)
        case In(c, vs) if vs.nonEmpty && vs.length <= 64 &&
            vs.forall(probeable) => c -> vs.toSeq
      }.toSeq
    if (probes.isEmpty) kept
    else probes.groupBy(_._1).foldLeft(kept) { case (files, (c, ps)) =>
      Layout.loadBloom(spark, path, c) match {
        case None => files
        case Some(sc) => ps.foldLeft(files) { case (fs, (_, vs)) =>
          fs.filter(f => vs.exists(v => sc.mayContain(f, v)))
        }
      }
    }
  }

  /** NaN footer bounds compare false against everything, which would
    * SKIP a file that may hold matching rows — conservatively keep
    * (same rule as [[Layout.prunedScan]]). A file survives a column's
    * constraint iff its [min, max] intersects ANY interval of the union.
    */
  private[graft] def mayMatch(g: Layout.RowGroupStats,
      ranges: Map[String, Seq[(Double, Double)]]): Boolean =
    ranges.forall { case (c, ivs) =>
      (g.mins.get(c), g.maxs.get(c)) match {
        case (Some(mn), Some(mx)) if !mn.isNaN && !mx.isNaN =>
          ivs.exists { case (lo, hi) => mx >= lo && mn <= hi }
        case _ => true
      }
    }
}
