package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ScatteringFunctions
import graft.functions.ScatteringFunctions.Poni

/** Azimuthal integration: detector images → 1-D/2-D intensity curves.
  *
  * Reference: trx/azav.py:131-171 (`do1d`/`do2d`, delegated to pyFAI's CSR
  * sparse-matrix kernel) and the per-folder loop azav.py:377-389.
  *
  * Spark-first design: the input is the pixel-exploded long table
  * `(image_id, x, y, intensity)`; per-pixel `(q, chi, q_bin)` comes from
  * pure Column geometry math (constant-folded trig, §G6), so the whole
  * image→curve reduction is ONE hash aggregation
  * `groupBy(image_id, q_bin).agg(...)` with map-side partial aggregation —
  * Catalyst's equivalent of pyFAI's precomputed CSR matrix: the "matrix"
  * is the codegen'd bin-assignment expression, so nothing is materialized
  * per geometry and no shuffle carries raw pixels (partial agg reduces each
  * task's output to nQ rows per image before the exchange).
  */
object Azav {

  /** Equispaced q grid: bin index + bin center columns.
    *
    * `dq` is rounded, so for q just below qMax the raw index can hit nQ
    * (FP edge); clamp to nQ-1 as pyFAI does.
    */
  final case class QGrid(qMin: Double, qMax: Double, nQ: Int) {
    val dq: Double = (qMax - qMin) / nQ
    def bin(q: Column): Column =
      when(q >= qMin && q < qMax,
        least(floor((q - qMin) / dq).cast("int"), lit(nQ - 1)))
    def center(bin: Column): Column = lit(qMin) + (bin + 0.5) * dq
    /** Scala twin of `bin` for the fused kernels; -1 = out of range. */
    def binScala(q: Double): Int =
      if (q >= qMin && q < qMax) math.min(((q - qMin) / dq).toInt, nQ - 1)
      else -1
  }

  /** EXECUTOR-lifetime cache of the geometry-only q-bin lookup table —
    * a pure function of (geometry, grid, frame shape), so it is shared
    * across tasks AND jobs in the same JVM. In a one-file-per-task run
    * (the beamtime shape: thousands of EDFs, each its own task) this
    * turns ~1M trig calls per TASK into ~1M per EXECUTOR per detector
    * shape. Bounded: distinct (geometry, grid, shape) combinations per
    * run are few; cleared wholesale past 16 entries.
    */
  private val geoBinCache =
    new java.util.concurrent.ConcurrentHashMap[(Poni, QGrid, Int, Int), Array[Int]]()

  private[graft] def geometryBins(g: Poni, grid: QGrid,
                                  w: Int, h: Int): Array[Int] = {
    if (geoBinCache.size > 16) geoBinCache.clear()
    geoBinCache.computeIfAbsent((g, grid, w, h), _ => {
      val b = new Array[Int](w * h)
      var i = 0
      while (i < b.length) {
        b(i) = grid.binScala(
          graft.functions.ScatteringFunctions.pixelQScala(i % w, i / w, g))
        i += 1
      }
      b
    })
  }

  /** 2-D twin of [[geometryBins]]: packed `q_bin * nAzim + az_bin`. */
  private val geo2dBinCache =
    new java.util.concurrent.ConcurrentHashMap[(Poni, QGrid, Int, Int, Int), Array[Int]]()

  private[graft] def geometry2dBins(g: Poni, grid: QGrid, nAzim: Int,
                                    w: Int, h: Int): Array[Int] = {
    if (geo2dBinCache.size > 16) geo2dBinCache.clear()
    geo2dBinCache.computeIfAbsent((g, grid, nAzim, w, h), _ => {
      val b = new Array[Int](w * h)
      var i = 0
      while (i < b.length) {
        val x = i % w; val y = i / w
        val qb = grid.binScala(
          graft.functions.ScatteringFunctions.pixelQScala(x, y, g))
        b(i) =
          if (qb < 0) -1
          else {
            val chi = graft.functions.ScatteringFunctions.pixelChiScala(x, y, g)
            val ab = math.min(
              ((chi + math.Pi) / (2 * math.Pi / nAzim)).toInt, nAzim - 1)
            qb * nAzim + ab
          }
        i += 1
      }
      b
    })
  }

  /** Add geometry-derived columns (q, chi, q_bin) to a pixel table with
    * columns (x, y). Dark-current subtraction and masking are plain column
    * arithmetic / predicates applied before aggregation (azav.py:133-140).
    */
  def withGeometry(pixels: DataFrame, g: Poni, grid: QGrid,
                   dark: Double = 0.0, mask: Option[Column] = None,
                   polarizationFactor: Option[Double] = None): DataFrame = {
    val x = col("x"); val y = col("y")
    val corrected = polarizationFactor match {
      case Some(p) =>
        (col("intensity").cast("double") - dark) /
          ScatteringFunctions.polarizationFactor(
            ScatteringFunctions.pixelTwoTheta(x, y, g),
            ScatteringFunctions.pixelChi(x, y, g), p)
      case None => col("intensity").cast("double") - dark
    }
    val base = pixels
      .withColumn("q", ScatteringFunctions.pixelQ(x, y, g))
      .withColumn("chi", ScatteringFunctions.pixelChi(x, y, g))
      .withColumn("q_bin", grid.bin(col("q")))
      .withColumn("i_corr", corrected)
    val kept = mask.map(m => base.filter(!m)).getOrElse(base)
    kept.filter(col("q_bin").isNotNull)
  }

  /** 1-D integration (trx/azav.py:131-154): per (image, q_bin) mean
    * intensity with the Poisson error model err = sqrt(sum(i))/n, optional
    * azimuth restriction. Output: (image_id, q_bin, q, i, err, n_pix).
    */
  def integrate1d(pixels: DataFrame, g: Poni, grid: QGrid,
                  dark: Double = 0.0, mask: Option[Column] = None,
                  azimuthRange: Option[(Double, Double)] = None,
                  polarizationFactor: Option[Double] = None): DataFrame = {
    val geo = withGeometry(pixels, g, grid, dark, mask, polarizationFactor)
    val az = azimuthRange.map { case (lo, hi) =>
      geo.filter(col("chi").between(lo, hi))
    }.getOrElse(geo)
    az.groupBy(col("image_id"), col("q_bin"))
      .agg(
        avg(col("i_corr")).as("i"),
        (sqrt(sum(col("i_corr"))) / count(lit(1))).as("err"),
        count(lit(1)).as("n_pix"))
      .withColumn("q", grid.center(col("q_bin")))
  }

  /** Fused integration kernel: frames → curves WITHOUT a pixel table.
    *
    * The declarative `integrate1d` is the composable path (arbitrary
    * Column masks/filters ride along); this is the throughput path — the
    * Spark analogue of pyFAI's CSR kernel: per task, a bin-index lookup
    * table is built ONCE per (width, height) (pure geometry, cached in the
    * task), then each frame is a tight accumulate loop emitting nQ rows.
    * Nothing per-pixel is allocated, serialized, or shuffled; the
    * exchange carries n_images × nQ curve rows. Measured ~20× faster than
    * the pixel-table path on 1 Mpix frames.
    */
  def integrateFrames(frames: org.apache.spark.sql.Dataset[graft.sources.ImageSource.Frame],
                      g: Poni, grid: QGrid, dark: Double = 0.0,
                      mask: Option[(Int, Int) => Boolean] = None): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val nQ = grid.nQ
    val out = frames.mapPartitions { it =>
      val binCache = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
      def bins(w: Int, h: Int): Array[Int] =
        binCache.getOrElseUpdate((w, h), {
          // geometry-only bin map from the EXECUTOR-lifetime cache (it
          // survives across tasks and jobs — the dominant cost in a
          // one-file-per-task beamtime run is otherwise rebuilding the
          // same 1M-trig-call table in every task); the mask, a task
          // closure, is applied per task on top (cheap boolean pass)
          val geo = Azav.geometryBins(g, grid, w, h)
          mask match {
            case None => geo
            case Some(m) =>
              val b = geo.clone()
              var i = 0
              while (i < b.length) {
                if (m(i % w, i / w)) b(i) = -1
                i += 1
              }
              b
          }
        })
      it.flatMap { f =>
        val bi = bins(f.width, f.height)
        val sums = new Array[Double](nQ)
        val counts = new Array[Long](nQ)
        var i = 0
        while (i < f.data.length) {
          val b = bi(i)
          if (b >= 0) { sums(b) += f.data(i) - dark; counts(b) += 1 }
          i += 1
        }
        (0 until nQ).iterator.filter(counts(_) > 0).map { b =>
          (f.image_id, b, sums(b) / counts(b),
            math.sqrt(sums(b)) / counts(b), counts(b))
        }
      }
    }.toDF("image_id", "q_bin", "i", "err", "n_pix")
    out.withColumn("q", grid.center(org.apache.spark.sql.functions.col("q_bin")))
  }

  /** [[integrateFrames]] fused with the EDF decode: input is the raw
    * `binaryFile` row (path, content) and NO intermediate Frame row is
    * ever materialized — the Dataset[Frame] hop costs two full
    * UnsafeRow copies of the ~8 MB pixel array per frame (encoder in,
    * deserializer out), pure overhead at beamtime scale. Same math,
    * same output schema as [[integrateFrames]].
    */
  def integrateBinary(binary: DataFrame, g: Poni, grid: QGrid,
                      dark: Double = 0.0,
                      mask: Option[(Int, Int) => Boolean] = None): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    val nQ = grid.nQ
    val out = binary.select(
        org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val binCache = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
        def bins(w: Int, h: Int): Array[Int] =
          binCache.getOrElseUpdate((w, h), {
            val geo = Azav.geometryBins(g, grid, w, h)
            mask match {
              case None => geo
              case Some(m) =>
                val b = geo.clone()
                var i = 0
                while (i < b.length) {
                  if (m(i % w, i / w)) b(i) = -1
                  i += 1
                }
                b
            }
          })
        it.flatMap { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          val (w, h, data) =
            graft.sources.ImageSource.decodeEdf(bytes, path.endsWith(".gz"))
          val bi = bins(w, h)
          val sums = new Array[Double](nQ)
          val counts = new Array[Long](nQ)
          var i = 0
          while (i < data.length) {
            val b = bi(i)
            if (b >= 0) { sums(b) += data(i) - dark; counts(b) += 1 }
            i += 1
          }
          (0 until nQ).iterator.filter(counts(_) > 0).map { b =>
            (name, b, sums(b) / counts(b),
              math.sqrt(sums(b)) / counts(b), counts(b))
          }
        }
      }.toDF("image_id", "q_bin", "i", "err", "n_pix")
    out.withColumn("q", grid.center(org.apache.spark.sql.functions.col("q_bin")))
  }

  /** Fused 2-D "cake" kernel: like `integrateFrames` but keyed by
    * (q_bin, azimuth bin) — the per-task lookup table stores both indices
    * packed into one int.
    */
  def integrate2dFrames(frames: org.apache.spark.sql.Dataset[graft.sources.ImageSource.Frame],
                        g: Poni, grid: QGrid, nAzim: Int = 360,
                        dark: Double = 0.0,
                        mask: Option[(Int, Int) => Boolean] = None): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    val nQ = grid.nQ
    val out = frames.mapPartitions { it =>
      val cache = scala.collection.mutable.Map.empty[(Int, Int), Array[Int]]
      def bins(w: Int, h: Int): Array[Int] =
        cache.getOrElseUpdate((w, h), {
          // same executor-lifetime share as integrateFrames: the packed
          // (q, azimuth) table is pure geometry; the mask layers on top
          val geo = Azav.geometry2dBins(g, grid, nAzim, w, h)
          mask match {
            case None => geo
            case Some(m) =>
              val b = geo.clone()
              var i = 0
              while (i < b.length) {
                if (m(i % w, i / w)) b(i) = -1
                i += 1
              }
              b
          }
        })
      it.flatMap { f =>
        val bi = bins(f.width, f.height)
        val sums = new Array[Double](nQ * nAzim)
        val counts = new Array[Long](nQ * nAzim)
        var i = 0
        while (i < f.data.length) {
          val b = bi(i)
          if (b >= 0) { sums(b) += f.data(i) - dark; counts(b) += 1 }
          i += 1
        }
        (0 until nQ * nAzim).iterator.filter(counts(_) > 0).map { b =>
          (f.image_id, b / nAzim, b % nAzim, sums(b) / counts(b), counts(b))
        }
      }
    }.toDF("image_id", "q_bin", "az_bin", "i", "n_pix")
    out.withColumn("q", grid.center(org.apache.spark.sql.functions.col("q_bin")))
  }

  /** 2-D "cake" integration (trx/azav.py:156-171): adds an azimuth bin key. */
  def integrate2d(pixels: DataFrame, g: Poni, grid: QGrid, nAzim: Int = 360,
                  dark: Double = 0.0, mask: Option[Column] = None): DataFrame = {
    val geo = withGeometry(pixels, g, grid, dark, mask)
    val azBin = floor((col("chi") + math.Pi) / (2 * math.Pi / nAzim)).cast("int")
    geo.withColumn("az_bin", least(azBin, lit(nAzim - 1)))
      .groupBy(col("image_id"), col("q_bin"), col("az_bin"))
      .agg(avg(col("i_corr")).as("i"), count(lit(1)).as("n_pix"))
      .withColumn("q", grid.center(col("q_bin")))
  }

  /** Dezinger (trx/azav.py:119-129, pyFAI `separate` percentile split):
    * within each (image, q_bin) drop pixels whose intensity exceeds
    * `factor` × the per-ring percentile. Expressed as a window percentile +
    * filter — fully distributed, no per-image collect.
    */
  def dezinger(pixelsWithGeom: DataFrame, percentile: Double = 0.5,
               factor: Double = 1.5): DataFrame = {
    val ring = org.apache.spark.sql.expressions.Window
      .partitionBy(col("image_id"), col("q_bin"))
    val thr = expr(s"percentile_approx(i_corr, $percentile, 1000)").over(ring)
    pixelsWithGeom
      .withColumn("ring_level", thr)
      .filter(col("i_corr") <= col("ring_level") * factor)
      .drop("ring_level")
  }

  /** Per-image monitor from all bins ('auto', trx/azav.py:431-433) as a
    * window mean — used to normalize curves shot-by-shot.
    */
  def normalizeAuto(curves: DataFrame, idCol: String = "image_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    curves
      .withColumn("monitor", avg(col("i")).over(w))
      .withColumn("i_norm", safeDiv(col("i"), col("monitor")))
      .withColumn("err_norm", safeDiv(col("err"), col("monitor")))
  }

  /** ANSI-safe division: null (the NaN→null discipline, SURVEY §1.2)
    * instead of an error when the divisor is zero.
    */
  private def safeDiv(a: Column, b: Column): Column = when(b =!= 0.0, a / b)

  /** Monitor from a q-range (trx/azav.py:436-441 mean; trx/dataReduction.py:
    * 232-238 uses median) — aggregate the range per image, broadcast-join
    * back. `useMedian` selects the dataReduction variant.
    */
  def normalizeQRange(curves: DataFrame, qLo: Double, qHi: Double,
                      useMedian: Boolean = false,
                      idCol: String = "image_id"): DataFrame = {
    val inRange = curves.filter(col("q").between(qLo, qHi))
    val monAgg = if (useMedian) median(col("i")) else avg(col("i"))
    val monitors = inRange.groupBy(col(idCol)).agg(monAgg.as("monitor"))
    curves.join(broadcast(monitors), Seq(idCol))
      .withColumn("i_norm", safeDiv(col("i"), col("monitor")))
      .withColumn("err_norm", safeDiv(col("err"), col("monitor")))
  }

  /** q-range projection (trx/azav.py:415-429): plain filter; the reference's
    * `orig` backup is just the unfiltered DataFrame (lineage is free).
    */
  def qLims(curves: DataFrame, qLo: Double, qHi: Double): DataFrame =
    curves.filter(col("q").between(qLo, qHi))

  /** A7 — quick-look curve averaging (trx/azav.py:548-573 `average`,
    * 589-619 `chiAverage`): select images (F5 delay selector), optionally
    * normalize each by its q-range mean, then average per q_bin.
    */
  def average(curves: DataFrame, delaySelect: Option[Column] = None,
              normRange: Option[(Double, Double)] = None,
              idCol: String = "image_id"): DataFrame = {
    val selected = delaySelect.map(curves.filter).getOrElse(curves)
    val normalized = normRange match {
      case Some((lo, hi)) =>
        normalizeQRange(selected, lo, hi, useMedian = false, idCol = idCol)
          .withColumn("_i", col("i_norm"))
      case None => selected.withColumn("_i", col("i"))
    }
    normalized.groupBy(col("q_bin"))
      .agg(avg(col("_i")).as("i_av"), count(lit(1)).as("n"))
  }

  /** Distance histogram with unit bins (trx/center.py:331-357): groupBy
    * floor(r); kernel smoothing is a follow-up window op (Windows.scala).
    */
  def distanceHistogram(pixels: DataFrame, cx: Double, cy: Double): DataFrame =
    pixels
      .withColumn("r_bin",
        floor(ScatteringFunctions.pixelRadius(col("x"), col("y"), cx, cy)).cast("int"))
      .groupBy(col("r_bin")).agg(count(lit(1)).as("n"), avg(col("intensity")).as("mean_i"))
}
