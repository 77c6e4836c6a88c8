package graft.extras

import breeze.linalg.{DenseMatrix, DenseVector, eig, inv, pinv}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side model fitting (SURVEY §2.9): these consume aggregated data
  * (≤ thousands of points) collected from distributed pipelines, so they
  * run on the driver with Breeze — matching the reference's scipy/lmfit
  * usage (trx/center.py, trx/peaks.py) without distributed machinery.
  */
object Fits {

  final case class Circle(cx: Double, cy: Double, r: Double, rmse: Double)

  /** X1 — least-squares circle fit (trx/azav.py:494-503, trx/center.py:59-68).
    * Kåsa algebraic fit (linear LSQ) refined by Gauss–Newton on the
    * geometric residuals — converges to the same optimum the reference's
    * Levenberg–Marquardt finds.
    */
  def leastsqCircle(pts: Seq[(Double, Double)]): Circle = {
    require(pts.size >= 3, "circle fit needs >= 3 points")
    val n = pts.size
    // Kåsa: minimize ||x² + y² + D x + E y + F||
    val A = DenseMatrix.zeros[Double](n, 3)
    val b = DenseVector.zeros[Double](n)
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      A(i, 0) = x; A(i, 1) = y; A(i, 2) = 1.0
      b(i) = x * x + y * y
    }
    val sol = pinv(A) * b
    var cx = sol(0) / 2; var cy = sol(1) / 2
    var r = math.sqrt(sol(2) + cx * cx + cy * cy)
    // Gauss–Newton refinement on geometric distance residuals
    var it = 0
    while (it < 50) {
      val J = DenseMatrix.zeros[Double](n, 3)
      val res = DenseVector.zeros[Double](n)
      pts.zipWithIndex.foreach { case ((x, y), i) =>
        val d = math.max(math.hypot(x - cx, y - cy), 1e-12)
        res(i) = d - r
        J(i, 0) = -(x - cx) / d; J(i, 1) = -(y - cy) / d; J(i, 2) = -1.0
      }
      val step = pinv(J) * res
      cx -= step(0); cy -= step(1); r -= step(2)
      it += 1
      if (breeze.linalg.norm(step) < 1e-12) it = 50
    }
    val rmse = math.sqrt(pts.map { case (x, y) =>
      val d = math.hypot(x - cx, y - cy) - r; d * d
    }.sum / n)
    Circle(cx, cy, r, rmse)
  }

  final case class Ellipse(cx: Double, cy: Double, a: Double, b: Double,
                           angleRad: Double)

  /** X2 — direct algebraic ellipse fit (trx/center.py:71-105): Fitzgibbon's
    * scatter-matrix pencil eigenvector method (the same published algorithm
    * the reference implements).
    */
  def fitEllipse(pts: Seq[(Double, Double)]): Ellipse = {
    require(pts.size >= 6, "ellipse fit needs >= 6 points")
    val n = pts.size
    val D1 = DenseMatrix.zeros[Double](n, 3) // x², xy, y²
    val D2 = DenseMatrix.zeros[Double](n, 3) // x, y, 1
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      D1(i, 0) = x * x; D1(i, 1) = x * y; D1(i, 2) = y * y
      D2(i, 0) = x; D2(i, 1) = y; D2(i, 2) = 1.0
    }
    val S1 = D1.t * D1; val S2 = D1.t * D2; val S3 = D2.t * D2
    val T = -inv(S3) * S2.t
    val M0 = S1 + S2 * T
    val C = DenseMatrix((0.0, 0.0, 2.0), (0.0, -1.0, 0.0), (2.0, 0.0, 0.0))
    val M = inv(C) * M0
    val e = eig(M)
    // pick the eigenvector with 4ac - b² > 0
    val cand = (0 until 3).map { i =>
      val v = e.eigenvectors(::, i)
      (v, 4 * v(0) * v(2) - v(1) * v(1))
    }.filter(_._2 > 0)
    require(cand.nonEmpty, "no elliptical solution")
    val a1 = cand.head._1
    val a2 = T * a1
    val Array(ca, cb, cc, cd, ce, cf) =
      Array(a1(0), a1(1), a1(2), a2(0), a2(1), a2(2))
    // conic → geometric parameters (standard formulas)
    val den = cb * cb - 4 * ca * cc
    val cx = (2 * cc * cd - cb * ce) / den
    val cy = (2 * ca * ce - cb * cd) / den
    val num = 2 * (ca * ce * ce + cc * cd * cd + cf * cb * cb -
      cb * cd * ce - 4 * ca * cc * cf)
    val s = math.sqrt(math.pow(ca - cc, 2) + cb * cb)
    val axA = -math.sqrt(num * ((ca + cc) + s)) / den
    val axB = -math.sqrt(num * ((ca + cc) - s)) / den
    val angle =
      if (cb == 0) { if (ca < cc) 0.0 else math.Pi / 2 }
      else math.atan2(cc - ca - s, cb)
    Ellipse(cx, cy, math.max(axA, axB), math.min(axA, axB), angle)
  }

  final case class Peak(center: Double, fwhm: Double, amplitude: Double,
                        eta: Double, offset: Double, chi2: Double)

  /** X6 — pseudo-Voigt peak fit (trx/peaks.py:14-40): Gauss–Newton with a
    * numerical Jacobian; initial guess from the data extremum and FWHM
    * search, as the reference does.
    *
    * `autorange = true` restricts the fit window around the peak before
    * fitting, exactly as trx/peaks.py:28-35: find the half-maximum
    * crossings p1/p2 bracketing the argmax, centre c = (p1+p2)/2, half
    * width dp = |p1−p2|, fit on [c−dp, c+dp) (clamped to the array; full
    * range when no crossing exists on either side or the window is
    * degenerate). Keeps a distant second structure from biasing the fit.
    */
  def fitPeak(x: Array[Double], y: Array[Double],
              errY: Option[Array[Double]] = None,
              autorange: Boolean = false): Peak = {
    if (autorange) {
      val iMax = y.indices.maxBy(y)
      val half = y.max / 2
      val idx = y.indices.filter(i => y(i) < half)
      val below = idx.filter(_ < iMax)
      val above = idx.filter(_ > iMax)
      if (below.nonEmpty && above.nonEmpty) {
        val p1 = below.last
        val p2 = above.head
        val c = (p1 + p2) / 2
        val dp = math.abs(p1 - p2)
        val lo = math.max(0, c - dp)
        val hi = math.min(y.length, c + dp)
        if (hi - lo >= 5)
          return fitPeak(x.slice(lo, hi), y.slice(lo, hi),
            errY.map(_.slice(lo, hi)))
      }
      return fitPeak(x, y, errY)
    }
    require(x.length == y.length && x.length >= 5)
    val w = errY.map(_.map(e => 1.0 / math.max(e, 1e-12)))
      .getOrElse(Array.fill(x.length)(1.0))
    val iMax = y.indices.maxBy(y)
    val off0 = y.min
    val amp0 = y(iMax) - off0
    val half = off0 + amp0 / 2
    val iL = (iMax to 0 by -1).find(i => y(i) < half).getOrElse(0)
    val iR = (iMax until y.length).find(i => y(i) < half).getOrElse(y.length - 1)
    var p = DenseVector(x(iMax), math.max(math.abs(x(iR) - x(iL)), 1e-6), amp0, 0.5, off0)

    def model(p: DenseVector[Double], xi: Double): Double = {
      val Array(c, fw, a, eta0, off) = p.toArray
      val eta = math.min(math.max(eta0, 0.0), 1.0)
      val sg = fw / (2 * math.sqrt(2 * math.log(2)))
      val g = math.exp(-0.5 * math.pow((xi - c) / sg, 2))
      val l = 1.0 / (1.0 + math.pow((xi - c) / (fw / 2), 2))
      off + a * (eta * l + (1 - eta) * g)
    }

    var it = 0
    while (it < 100) {
      val res = DenseVector(x.indices.map(i => (y(i) - model(p, x(i))) * w(i)).toArray)
      val J = DenseMatrix.zeros[Double](x.length, 5)
      for (j <- 0 until 5) {
        val h = math.max(math.abs(p(j)) * 1e-7, 1e-10)
        val pj = p.copy; pj(j) += h
        for (i <- x.indices)
          J(i, j) = -(model(pj, x(i)) - model(p, x(i))) / h * w(i)
      }
      val step = pinv(J) * res
      p = p - step
      it += 1
      if (breeze.linalg.norm(step) < 1e-10) it = 100
    }
    val chi2 = x.indices.map(i => math.pow((y(i) - model(p, x(i))) * w(i), 2)).sum / x.length
    Peak(p(0), math.abs(p(1)), p(2), math.min(math.max(p(3), 0.0), 1.0), p(4), chi2)
  }

  /** X7 — iterative baseline estimation per curve (trx/utils/numeric.py:66-82
    * wraps a dual-tree wavelet method from an external package; we use the
    * published SNIP clipping algorithm — same intent: a smooth lower
    * envelope — implemented on plain arrays so it can run distributed via
    * mapGroups over images).
    */
  def snipBaseline(y: Array[Double], iterations: Int = 24): Array[Double] = {
    val n = y.length
    val b = y.clone()
    var m = math.min(iterations, n / 2 - 1)
    while (m >= 1) {
      var i = m
      while (i < n - m) {
        val avg = 0.5 * (b(i - m) + b(i + m))
        if (avg < b(i)) b(i) = avg
        i += 1
      }
      m -= 1
    }
    b
  }

  /** X7 distributed wrapper: subtract the SNIP baseline per image over the
    * ordered q axis — embarrassingly parallel `mapGroups`.
    */
  def removeBaseline(spark: SparkSession, curves: DataFrame,
                     iterations: Int = 24): DataFrame = {
    import spark.implicits._
    curves.select(col("image_id").cast("string"), col("q_bin").cast("int"),
        col("i").cast("double"))
      .as[(String, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (img, it) =>
        val rows = it.toArray.sortBy(_._2)
        val base = snipBaseline(rows.map(_._3), iterations)
        rows.iterator.zipWithIndex.map { case ((_, qb, i), k) =>
          (img, qb, i, i - base(k))
        }
      }
      .toDF("image_id", "q_bin", "i", "i_sub")
  }

  /** X3 — ring-based center finder (trx/center.py:213-469, simplified):
    * instead of canny edges (scikit-image), rings are located as peaks of
    * the smoothed radial intensity profile around the starting center (the
    * A11 distance histogram + W4 smoothing, both distributed); pixels of
    * each ring band above a per-band intensity quantile are circle-fitted
    * (X1) and the median fitted center wins. Optionally iterate
    * (`reprocess` in the reference) — each pass re-profiles around the
    * improved center.
    */
  def findCenterRings(pixels: DataFrame, cx0: Double, cy0: Double,
                      nRings: Int = 3, bandWidth: Double = 2.0,
                      iterations: Int = 4): Circle = {
    var cx = cx0; var cy = cy0
    var last: Circle = Circle(cx0, cy0, 0.0, Double.MaxValue)
    for (_ <- 0 until iterations) {
      val withR = pixels.withColumn("_r",
        sqrt(pow(col("x") - cx, 2) + pow(col("y") - cy, 2)))
      // radial profile (A11) — small result, smoothed on the driver (W4)
      val profile = withR
        .groupBy(floor(col("_r")).cast("int").as("rb"))
        .agg(avg(col("intensity")).as("mi"), count(lit(1)).as("n"))
        .filter(col("n") > 10)
        .orderBy("rb").collect()
        .map(r => r.getAs[Int]("rb") -> r.getAs[Double]("mi"))
      val smooth = profile.indices.map { i =>
        val w = Seq(-2 -> 1.0, -1 -> 2.0, 0 -> 3.0, 1 -> 2.0, 2 -> 1.0)
        val terms = w.flatMap { case (off, wt) =>
          profile.lift(i + off).map(p => (p._2 * wt, wt))
        }
        profile(i)._1 -> terms.map(_._1).sum / terms.map(_._2).sum
      }
      // ring radii = local maxima of the smoothed profile, strongest first
      val peaks = smooth.indices.drop(1).dropRight(1).filter { i =>
        smooth(i)._2 > smooth(i - 1)._2 && smooth(i)._2 > smooth(i + 1)._2
      }.sortBy(i => -smooth(i)._2).take(nRings).map(smooth(_)._1)

      val centers = peaks.flatMap { r0 =>
        val band = withR.filter(abs(col("_r") - r0) < bandWidth)
        // midpoint of the band's intensity range separates ring from
        // background regardless of how small the ring arc's pixel share is
        // (a percentile would need the arc fraction known in advance)
        val mm = band.agg(min(col("intensity")).as("lo"), max(col("intensity")).as("hi"))
          .collect()(0)
        val thr = (mm.getDouble(0) + mm.getDouble(1)) / 2
        val pts = band.filter(col("intensity") >= thr)
          .select(col("x").cast("double"), col("y").cast("double"))
          .limit(100000)
          .collect().map(p => (p.getDouble(0), p.getDouble(1))).toSeq
        if (pts.size >= 3) Some(leastsqCircle(pts)) else None
      }
      if (centers.nonEmpty) {
        def median(xs: Seq[Double]): Double = {
          val s = xs.sorted; val n = s.size
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
        }
        cx = median(centers.map(_.cx)); cy = median(centers.map(_.cy))
        last = Circle(cx, cy, median(centers.map(_.r)),
          median(centers.map(_.rmse)))
      }
    }
    last
  }

  /** Canny edge detector on a dense single image (the reference's
    * `feature.canny` at trx/center.py:305-307): Gaussian smooth → Sobel
    * gradients → 4-sector non-maximum suppression → hysteresis
    * thresholding (8-connected BFS from strong edges through weak ones).
    * Thresholds are fractions of the max gradient magnitude (skimage's
    * default 0.1/0.2 convention). One calibrant frame — driver-side by
    * design, like every fit in this file.
    *
    * Deviation noted: skimage interpolates the two along-gradient
    * neighbours in NMS; the 4-sector form keeps edges within ±1 px, which
    * the downstream circle fit's median absorbs.
    */
  def cannyEdges(w: Int, h: Int, img: Array[Double], sigma: Double = 1.0,
                 lowFrac: Double = 0.1, highFrac: Double = 0.2): Seq[(Int, Int)] = {
    require(img.length == w * h, "image size mismatch")
    def clampAt(a: Array[Double], x: Int, y: Int): Double =
      a(math.min(h - 1, math.max(0, y)) * w + math.min(w - 1, math.max(0, x)))
    // separable Gaussian, clamped borders
    val radius = math.max(1, math.ceil(3 * sigma).toInt)
    val kern = Array.tabulate(2 * radius + 1)(i =>
      math.exp(-0.5 * math.pow((i - radius) / sigma, 2)))
    val ksum = kern.sum
    val tmp = new Array[Double](w * h)
    val sm = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0; var k = -radius
        while (k <= radius) { s += kern(k + radius) * clampAt(img, x + k, y); k += 1 }
        tmp(y * w + x) = s / ksum
        x += 1
      }
      y += 1
    }
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 0.0; var k = -radius
        while (k <= radius) { s += kern(k + radius) * clampAt(tmp, x, y + k); k += 1 }
        sm(y * w + x) = s / ksum
        x += 1
      }
      y += 1
    }
    // Sobel gradients + magnitude
    val mag = new Array[Double](w * h)
    val gxA = new Array[Double](w * h)
    val gyA = new Array[Double](w * h)
    var maxMag = 0.0
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gx = -clampAt(sm, x - 1, y - 1) + clampAt(sm, x + 1, y - 1) +
          2 * (-clampAt(sm, x - 1, y) + clampAt(sm, x + 1, y)) +
          -clampAt(sm, x - 1, y + 1) + clampAt(sm, x + 1, y + 1)
        val gy = -clampAt(sm, x - 1, y - 1) - 2 * clampAt(sm, x, y - 1) -
          clampAt(sm, x + 1, y - 1) + clampAt(sm, x - 1, y + 1) +
          2 * clampAt(sm, x, y + 1) + clampAt(sm, x + 1, y + 1)
        val m = math.hypot(gx, gy)
        val i = y * w + x
        mag(i) = m; gxA(i) = gx; gyA(i) = gy
        if (m > maxMag) maxMag = m
        x += 1
      }
      y += 1
    }
    if (maxMag == 0.0) return Seq.empty
    // non-maximum suppression with bilinear interpolation of the two
    // along-gradient neighbours (skimage-faithful — a sector-quantized NMS
    // leaves spurs on exact diagonals)
    val nms = new Array[Double](w * h)
    y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val i = y * w + x
        if (mag(i) > 0) {
          val ax = math.abs(gxA(i)); val ay = math.abs(gyA(i))
          val s = if (gxA(i) * gyA(i) >= 0) 1 else -1
          val (n1, n2) =
            if (ax >= ay) {
              val wt = if (ax == 0) 0.0 else ay / ax
              ((1 - wt) * mag(i + 1) + wt * mag(i + 1 + s * w),
                (1 - wt) * mag(i - 1) + wt * mag(i - 1 - s * w))
            } else {
              val wt = ax / ay
              ((1 - wt) * mag(i + w) + wt * mag(i + w + s),
                (1 - wt) * mag(i - w) + wt * mag(i - w - s))
            }
          if (mag(i) >= n1 && mag(i) >= n2) nms(i) = mag(i)
        }
        x += 1
      }
      y += 1
    }
    // hysteresis: BFS from strong pixels through weak neighbours
    val lo = lowFrac * maxMag
    val hi = highFrac * maxMag
    val state = new Array[Byte](w * h) // 0 none, 1 weak, 2 edge
    val queue = scala.collection.mutable.ArrayDeque.empty[Int]
    var i = 0
    while (i < nms.length) {
      if (nms(i) >= hi) { state(i) = 2; queue.append(i) }
      else if (nms(i) >= lo) state(i) = 1
      i += 1
    }
    while (queue.nonEmpty) {
      val c = queue.removeHead()
      val cx = c % w; val cy = c / w
      var dy = -1
      while (dy <= 1) {
        var dx = -1
        while (dx <= 1) {
          val nx = cx + dx; val ny = cy + dy
          if (nx >= 0 && nx < w && ny >= 0 && ny < h) {
            val n = ny * w + nx
            if (state(n) == 1) { state(n) = 2; queue.append(n) }
          }
          dx += 1
        }
        dy += 1
      }
    }
    (0 until w * h).iterator.filter(state(_) == 2).map(i => (i % w, i / w)).toSeq
  }

  /** X3 (reference-parity path) — ring center from CANNY EDGE POINTS,
    * matching trx/center.py:305-342: detect edges once, then iterate —
    * histogram the edge-point distances from the current center, take the
    * strongest histogram peaks as ring radii, circle-fit each ring's edge
    * points, and move to the median fitted center.
    *
    * The calibrant image is ONE frame, so it is collected dense to the
    * driver (the same bound as every X-series fit); `findCenterRings`
    * remains the fully-distributed fallback for profiles where edges are
    * unreliable.
    */
  def findCenterRingsCanny(pixels: DataFrame, cx0: Double, cy0: Double,
                           nRings: Int = 3, bandWidth: Double = 3.0,
                           iterations: Int = 10, sigma: Double = 1.0): Circle = {
    val rows = pixels.select(col("x").cast("int"), col("y").cast("int"),
      col("intensity").cast("double")).collect()
    val w = rows.map(_.getInt(0)).max + 1
    val h = rows.map(_.getInt(1)).max + 1
    val img = new Array[Double](w * h)
    rows.foreach(r => img(r.getInt(1) * w + r.getInt(0)) = r.getDouble(2))
    val edges = cannyEdges(w, h, img, sigma)
    var cx = cx0; var cy = cy0
    var last = Circle(cx0, cy0, 0.0, Double.MaxValue)
    var moved = Double.MaxValue
    // a wrong starting center SMEARS the edge-distance histogram, so each
    // pass captures only a partial arc and steps part-way — iterate to a
    // movement fixpoint (the reference's `reprocess` loop)
    for (_ <- 0 until iterations if edges.nonEmpty && moved > 0.01) {
      val dist = edges.map { case (x, y) => math.hypot(x - cx, y - cy) }
      // 1-px histogram of edge distances; smoothed local maxima = rings
      val hist = dist.groupBy(_.toInt).view.mapValues(_.size).toMap
      val rbs = (hist.keys.min to hist.keys.max).toSeq
      val smooth = rbs.map { rb =>
        val terms = Seq(-2 -> 1.0, -1 -> 2.0, 0 -> 3.0, 1 -> 2.0, 2 -> 1.0)
          .map { case (off, wt) => (hist.getOrElse(rb + off, 0) * wt, wt) }
        rb -> terms.map(_._1).sum / terms.map(_._2).sum
      }
      val peaks = smooth.indices.drop(1).dropRight(1).filter { i =>
        smooth(i)._2 > smooth(i - 1)._2 && smooth(i)._2 > smooth(i + 1)._2
      }.sortBy(i => -smooth(i)._2).take(nRings).map(smooth(_)._1)
      val centers = peaks.flatMap { r0 =>
        val pts = edges.zip(dist).collect {
          case ((x, y), d) if math.abs(d - (r0 + 0.5)) < bandWidth + 0.5 =>
            (x.toDouble, y.toDouble)
        }
        if (pts.size >= 3) Some(leastsqCircle(pts)) else None
      }
      if (centers.nonEmpty) {
        def med(xs: Seq[Double]): Double = {
          val s = xs.sorted; val n = s.size
          if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
        }
        val (ncx, ncy) = (med(centers.map(_.cx)), med(centers.map(_.cy)))
        moved = math.hypot(ncx - cx, ncy - cy)
        cx = ncx; cy = ncy
        last = Circle(cx, cy, med(centers.map(_.r)), med(centers.map(_.rmse)))
      } else moved = 0.0
    }
    last
  }

  /** X4 — liquid-peak beam-center finder (trx/center.py:107-166): select
    * pixels whose intensity lies in a percentile band (distributed), then
    * fit a circle to them (driver).
    */
  def findCenterLiquidPeak(pixels: DataFrame, pLo: Double = 0.99,
                           pHi: Double = 0.999, maxPts: Int = 200000): Circle = {
    val bounds = pixels.agg(
      expr(s"percentile_approx(intensity, $pLo, 10000)").as("lo"),
      expr(s"percentile_approx(intensity, $pHi, 10000)").as("hi")).collect()(0)
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val pts = pixels.filter(col("intensity").between(lo, hi))
      .select(col("x").cast("double"), col("y").cast("double"))
      .limit(maxPts)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    leastsqCircle(pts)
  }
}
