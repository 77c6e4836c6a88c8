package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ScatteringFunctions
import graft.functions.ScatteringFunctions.Poni
import graft.operators.{Azav, Filters, Reduction}
import graft.sources.{Bundle, ImageSource}

/** End-to-end orchestration of the reference's two entry points
  * (SURVEY §3):
  *
  *  E1 `id9.doFolder_azav` (trx/id9.py:191-223): folder of detector frames
  *     + beamline log → per-image 1-D curves, with incremental processing
  *     and parameter-hash cache invalidation (T2, trx/azav.py:300-362).
  *  E2 `id9.doFolder_dataRed` (trx/id9.py:226-303): curves → per-delay
  *     difference signal with chi² outlier filtering.
  *
  * The reference's per-file loop becomes ONE declarative plan: decode →
  * mask filter → geometry binning → hash aggregation; Catalyst fuses all
  * stages and the only shuffles are the (image, q_bin) partial agg and the
  * tiny delay-level agg.
  */
object Pipeline {

  final case class AzavConfig(
      geometry: Poni,
      grid: Azav.QGrid,
      dark: Double = 0.0,
      mask: Option[Column] = None,
      maskFn: Option[(Int, Int) => Boolean] = None,
      maskDescription: String = "",
      dezinger: Option[Double] = None) {
    /** T2 manifest — any change here invalidates saved results. */
    def manifest: Map[String, String] = Map(
      "dist" -> geometry.dist.toString,
      "poni1" -> geometry.poni1.toString,
      "poni2" -> geometry.poni2.toString,
      "rot1" -> geometry.rot1.toString,
      "rot2" -> geometry.rot2.toString,
      "rot3" -> geometry.rot3.toString,
      "pixel1" -> geometry.pixel1.toString,
      "pixel2" -> geometry.pixel2.toString,
      "wavelength" -> geometry.wavelengthA.toString,
      "qMin" -> grid.qMin.toString, "qMax" -> grid.qMax.toString,
      "nQ" -> grid.nQ.toString,
      "dark" -> dark.toString,
      "mask" -> maskDescription,
      "dezinger" -> dezinger.map(_.toString).getOrElse(""))
  }

  /** E1 — integrate every new frame in `folder`, reusing `storageDir` when
    * the config manifest matches (T2) and anti-joining already-processed
    * images (J3, trx/azav.py:361-362). Returns the full curve table and
    * persists it.
    */
  def doFolderAzav(spark: SparkSession, folder: String, storageDir: String,
                   config: AzavConfig,
                   log: Option[DataFrame] = None): DataFrame = {
    // Persistence is APPEND-mode: an incremental pass writes only the new
    // images' curves (O(new), not O(history) — at 10⁷ images rewriting the
    // store per increment would dominate). A manifest mismatch (T2) drops
    // the store and reintegrates everything.
    val curvesPath = s"$storageDir/curves.parquet"
    val valid = Bundle.isValid(storageDir, config.manifest)
    if (!valid) Bundle.deleteRecursively(curvesPath)
    val saved: Option[DataFrame] =
      if (valid && Bundle.exists(curvesPath))
        Some(spark.read.parquet(curvesPath))
      else None

    // J1 (log semi-join) and J3 (already-processed anti-join) are resolved
    // on METADATA ONLY: binaryFile reads file content lazily per projected
    // column, and a join cannot push its filter into the scan — so the
    // reconciliation runs on (path, image_id) alone and only the FRESH
    // paths are loaded with content. (This is the same driver-side file
    // tracking the Structured Streaming file source uses.)
    def withId(df: DataFrame): DataFrame =
      df.withColumn("image_id", element_at(split(col("path"), "/"), -1))
    val meta = withId(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.edf*").load(folder).select(col("path")))

    def notProcessed(df: DataFrame): DataFrame = {
      val withLog = log match {
        case Some(l) => df.join(broadcast(l.select(col("file").as("image_id"))),
          Seq("image_id"), "left_semi")
        case None => df
      }
      saved match {
        case Some(s) => withLog.join(broadcast(s.select("image_id").distinct()),
          Seq("image_id"), "left_anti")
        case None => withLog
      }
    }
    val freshPaths = notProcessed(meta).select("path").collect().map(_.getString(0))
    if (freshPaths.isEmpty) {
      Bundle.writeManifest(storageDir, config.manifest)
      return saved.getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "image_id STRING, q_bin INT, i DOUBLE, err DOUBLE, n_pix BIGINT, " +
              "q DOUBLE, twotheta_rad DOUBLE, twotheta_deg DOUBLE")))
    }
    val freshBinary = withId(
      spark.read.format("binaryFile").load(freshPaths: _*))

    // The fused frame kernel (Azav.integrateFrames) is ~10-20× faster but
    // cannot evaluate Column masks or dezinger; fall back to the pixel
    // table when those are requested.
    val useFused = config.mask.isEmpty && config.dezinger.isEmpty

    val integrated =
      if (useFused) {
        // decode fused into the kernel task — no Dataset[Frame] hop
        Azav.integrateBinary(freshBinary,
          config.geometry, config.grid, config.dark, config.maskFn)
      } else {
        val pixels = ImageSource.pixelsFromBinary(freshBinary)
        // The pixel path must honour BOTH mask forms: a maskFn supplied
        // together with dezinger/mask would otherwise be silently dropped.
        // The UDF bridge is acceptable here — this is already the slow
        // path, and correctness beats codegen for a user-supplied closure.
        val maskFnCol = config.maskFn.map { f =>
          val u = udf(f)
          u(col("x"), col("y"))
        }
        val fullMask = (config.mask, maskFnCol) match {
          case (Some(a), Some(b)) => Some(a || b)
          case (a, b)             => a.orElse(b)
        }
        val geo = Azav.withGeometry(pixels, config.geometry, config.grid,
          config.dark, fullMask)
        val dez = config.dezinger.map(p => Azav.dezinger(geo, p)).getOrElse(geo)
        dez.groupBy(col("image_id"), col("q_bin"))
          .agg(avg(col("i_corr")).as("i"),
            (sqrt(sum(col("i_corr"))) / count(lit(1))).as("err"),
            count(lit(1)).as("n_pix"))
          .withColumn("q", config.grid.center(col("q_bin")))
      }
    val curves = integrated
      .withColumn("twotheta_rad",
        ScatteringFunctions.qToTwoTheta(col("q"), config.geometry.wavelengthA))
      .withColumn("twotheta_deg", degrees(col("twotheta_rad")))

    curves.write.mode("append").parquet(curvesPath)
    Bundle.writeManifest(storageDir, config.manifest)
    spark.read.parquet(curvesPath)
  }

  /** Mask-geometry scan (the M7 border / M8 center-line inputs): the
    * detector's (width, height) for a frame folder, read through the
    * REGISTERED graft-edf source with a dims-only projection — the scan
    * decodes EDF header prefixes only and never inflates or copies a
    * pixel payload, whatever the frame count (`EdfSource.lastScan`
    * reports payload=false; PipelineSpec pins that end-to-end). Mixed
    * geometries in one folder fail loudly rather than masking wrong.
    */
  def detectorDims(spark: SparkSession, folder: String,
                   glob: String = "*.edf*"): (Int, Int) = {
    val dims = spark.read.format("graft-edf")
      .option("pathGlobFilter", glob).load(folder)
      .select(col("width"), col("height")).distinct().collect()
    require(dims.nonEmpty, s"no EDF frames under $folder (glob $glob)")
    require(dims.length == 1,
      s"mixed detector geometries in $folder: " +
        dims.map(r => s"${r.getInt(0)}x${r.getInt(1)}").mkString(", "))
    (dims(0).getInt(0), dims(0).getInt(1))
  }

  final case class ReductionConfig(
      refDelay: Option[Double] = None,
      monitorRange: Option[(Double, Double)] = None,
      useRatio: Boolean = false,
      useMedian: Boolean = false,
      chi2Threshold: Option[Double] = None,
      /** F8 — extra split keys (e.g. "angle"): one more grouping column
        * instead of the reference's per-angle reduction loop.
        */
      splitKeys: Seq[String] = Nil)

  /** E2 — curves (image grain, with a `delay` column attached from the
    * log) → per-delay difference signal. Composition:
    * A6 monitor normalization → J5 tag → J4 interp → diff → W2 thin →
    * A3 average; A4 chi² per repetition feeds the A10 outlier filter and
    * surviving repetitions are re-averaged (trx/filters.py:26-48 semantics
    * without mutation).
    */
  def doDataRed(curves: DataFrame, config: ReductionConfig = ReductionConfig())
      : DataFrame = {
    val normalized = config.monitorRange match {
      case Some((lo, hi)) =>
        Azav.normalizeQRange(curves, lo, hi, useMedian = true, idCol = "image_idx")
          .withColumn("_i", col("i_norm")).drop("i").withColumnRenamed("_i", "i")
      case None => curves
    }
    // F8: the reference's split_angle runs the WHOLE reduction per angle
    // subset (id9.py:246-263) — every stage below partitions by the split
    // keys, equivalent to that loop in one pass
    val tagged = Reduction.tagReferences(normalized, config.refDelay,
      extraKeys = config.splitKeys)
    val withRef = Reduction.interpolateReferences(tagged, config.splitKeys)
    val diffs = Reduction.diffSignal(withRef, config.useRatio)

    // A4 + A10 — per-repetition chi² outlier cut, then re-average survivors
    val chi2 = Reduction.chi2PerRepetition(diffs, config.splitKeys)
    val keep = Filters.chi2Filter(chi2, config.chi2Threshold, config.splitKeys)
      .select(col("delay"), col("image_idx"))
    val surviving = diffs.join(keep, Seq("delay", "image_idx"), "left_semi")

    val marked = Reduction.markThinnedReferences(surviving,
      extraKeys = config.splitKeys)
    Reduction.averageScanPoints(marked, config.useMedian, config.splitKeys,
      keepCol = Some(col("_keep")))
  }
}
