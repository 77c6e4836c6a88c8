package graft

import graft.extras.Fits

/** X1/X2/X4/X6/X7 — driver-side numerics on synthetic ground truth. */
class FitsSpec extends SparkSpec {
  import spark.implicits._

  test("leastsqCircle recovers a known circle") {
    val pts = (0 until 24).map { k =>
      val a = 2 * math.Pi * k / 24
      (5.0 + 3.0 * math.cos(a), -2.0 + 3.0 * math.sin(a))
    }
    val c = Fits.leastsqCircle(pts)
    assert(approx(c.cx, 5.0, 1e-9) && approx(c.cy, -2.0, 1e-9))
    assert(approx(c.r, 3.0, 1e-9) && c.rmse < 1e-9)
  }

  test("leastsqCircle tolerates noise and a partial arc") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 40).map { k =>
      val a = 0.3 + 2.0 * k / 40 // arc only
      (10.0 + 7.0 * math.cos(a) + rnd.nextGaussian() * 0.01,
        4.0 + 7.0 * math.sin(a) + rnd.nextGaussian() * 0.01)
    }
    val c = Fits.leastsqCircle(pts)
    assert(approx(c.cx, 10.0, 0.05) && approx(c.cy, 4.0, 0.05))
    assert(approx(c.r, 7.0, 0.05))
  }

  test("fitEllipse recovers a known ellipse") {
    val (cx, cy, a, b, th) = (1.0, 2.0, 5.0, 3.0, 0.4)
    val pts = (0 until 36).map { k =>
      val t = 2 * math.Pi * k / 36
      val (x0, y0) = (a * math.cos(t), b * math.sin(t))
      (cx + x0 * math.cos(th) - y0 * math.sin(th),
        cy + x0 * math.sin(th) + y0 * math.cos(th))
    }
    val e = Fits.fitEllipse(pts)
    assert(approx(e.cx, cx, 1e-6) && approx(e.cy, cy, 1e-6))
    assert(approx(e.a, a, 1e-6) && approx(e.b, b, 1e-6))
    assert(approx(math.abs(math.cos(2 * (e.angleRad - th))), 1.0, 1e-6))
  }

  test("fitPeak recovers a pseudo-Voigt") {
    val (c0, fw, amp, eta, off) = (3.0, 0.8, 10.0, 0.3, 1.5)
    val xs = (0 until 200).map(i => i * 0.05).toArray
    def pv(x: Double): Double = {
      val sg = fw / (2 * math.sqrt(2 * math.log(2)))
      val g = math.exp(-0.5 * math.pow((x - c0) / sg, 2))
      val l = 1.0 / (1.0 + math.pow((x - c0) / (fw / 2), 2))
      off + amp * (eta * l + (1 - eta) * g)
    }
    val ys = xs.map(pv)
    val p = Fits.fitPeak(xs, ys)
    assert(approx(p.center, c0, 1e-6))
    assert(approx(p.fwhm, fw, 1e-5))
    assert(approx(p.amplitude, amp, 1e-4))
    assert(approx(p.offset, off, 1e-5))
  }

  test("fitPeak autorange windows around the FWHM (trx/peaks.py:28-35)") {
    // gaussian peak at x=3 plus a broad shoulder centred at x=7 that
    // drags a full-range fit off centre
    val xs = (0 until 200).map(i => i * 0.05).toArray
    def shape(x: Double): Double =
      10.0 * math.exp(-0.5 * math.pow((x - 3.0) / 0.3, 2)) +
        6.0 * math.exp(-0.5 * math.pow((x - 7.0) / 1.8, 2))
    val ys = xs.map(shape)
    // hand-trace the reference window: half = max/2, p1/p2 = crossings
    // around argmax, c = (p1+p2)/2, dp = |p1-p2| → slice [c-dp, c+dp)
    val iMax = ys.indices.maxBy(ys)
    val idx = ys.indices.filter(i => ys(i) < ys.max / 2)
    val p1 = idx.filter(_ < iMax).last
    val p2 = idx.filter(_ > iMax).head
    val (c, dp) = ((p1 + p2) / 2, p2 - p1)
    val windowed = Fits.fitPeak(xs.slice(c - dp, c + dp), ys.slice(c - dp, c + dp))
    val auto = Fits.fitPeak(xs, ys, autorange = true)
    assert(auto == windowed, "autorange must equal the hand-traced window fit")
    val full = Fits.fitPeak(xs, ys)
    assert(math.abs(auto.center - 3.0) < 0.02)
    assert(math.abs(auto.center - 3.0) < math.abs(full.center - 3.0),
      s"autorange ${auto.center} should beat full-range ${full.center}")
  }

  test("snipBaseline lies under peaks and follows the background") {
    val xs = (0 until 300).map(_ * 0.02)
    val y = xs.map(x => 2.0 + 0.5 * x +
      8.0 * math.exp(-0.5 * math.pow((x - 3) / 0.1, 2))).toArray
    val base = Fits.snipBaseline(y, iterations = 40)
    val peakIdx = 150
    assert(base(peakIdx) < y(peakIdx) - 5.0) // baseline clipped under peak
    assert(math.abs(base(20) - y(20)) < 0.1) // follows smooth background
  }

  test("removeBaseline runs distributed per image") {
    val rows = for (img <- Seq("a", "b"); q <- 0 until 50) yield
      (img, q, 1.0 + (if (q == 25) 10.0 else 0.0))
    val df = rows.toDF("image_id", "q_bin", "i")
    val out = Fits.removeBaseline(spark, df).collect()
    assert(out.length == 100)
    val sub = out.filter(r => r.getString(0) == "a" && r.getInt(1) == 25)(0).getDouble(3)
    assert(sub > 8.0) // the spike survives baseline subtraction
  }

  test("findCenterRings recovers the center from concentric rings") {
    val (tx, ty) = (33.0, 29.0)
    val pts = for {
      y <- 0 until 72; x <- 0 until 72
      r = math.hypot(x - tx, y - ty)
    } yield (x, y,
      if (math.abs(r - 10) < 1.0 || math.abs(r - 20) < 1.0) 500.0 else 5.0)
    val px = pts.toDF("x", "y", "intensity")
    // start from a deliberately wrong center
    val c = Fits.findCenterRings(px, 36.0, 36.0, nRings = 2, iterations = 4)
    assert(approx(c.cx, tx, 1.0) && approx(c.cy, ty, 1.0))
  }

  test("cannyEdges traces a ring as a thin closed contour") {
    val (tx, ty, r0) = (31.5, 35.5, 14.0)
    val w = 72; val h = 72
    val img = Array.tabulate(w * h) { i =>
      val r = math.hypot(i % w - tx, i / w - ty)
      // smooth ring profile — canny should fire on both flanks
      300.0 * math.exp(-0.5 * math.pow((r - r0) / 1.5, 2)) + 5.0
    }
    val edges = Fits.cannyEdges(w, h, img, sigma = 1.0)
    assert(edges.size > 50, s"only ${edges.size} edge points")
    // every edge point sits near the ring's flanks
    val ds = edges.map { case (x, y) => math.hypot(x - tx, y - ty) }
    assert(ds.forall(d => math.abs(d - r0) < 5.0))
    // and the fitted circle through them recovers the center
    val c = Fits.leastsqCircle(edges.map(p => (p._1.toDouble, p._2.toDouble)))
    assert(approx(c.cx, tx, 0.5) && approx(c.cy, ty, 0.5))
  }

  test("canny-edge path and radial-profile path agree on the calibrant center") {
    val (tx, ty) = (33.0, 29.0)
    val pts = for {
      y <- 0 until 72; x <- 0 until 72
      r = math.hypot(x - tx, y - ty)
    } yield (x, y,
      500.0 * math.exp(-0.5 * math.pow((r - 10) / 1.0, 2)) +
        500.0 * math.exp(-0.5 * math.pow((r - 20) / 1.0, 2)) + 5.0)
    val px = pts.toDF("x", "y", "intensity")
    val radial = Fits.findCenterRings(px, 36.0, 36.0, nRings = 2, iterations = 4)
    val canny = Fits.findCenterRingsCanny(px, 36.0, 36.0, nRings = 2)
    assert(approx(canny.cx, tx, 1.0) && approx(canny.cy, ty, 1.0))
    assert(approx(canny.cx, radial.cx, 1.0) && approx(canny.cy, radial.cy, 1.0))
  }

  test("findCenterLiquidPeak locates the beam center from a ring") {
    val pts = for {
      y <- 0 until 64; x <- 0 until 64
      r = math.hypot(x - 30.0, y - 34.0)
    } yield (x, y, if (math.abs(r - 12) < 1.0) 1000.0 else 10.0)
    val px = pts.toDF("x", "y", "intensity")
    // the ring is ~3.7% of pixels — the band must sit inside that fraction
    val c = Fits.findCenterLiquidPeak(px, pLo = 0.97, pHi = 1.0)
    assert(approx(c.cx, 30.0, 1.0) && approx(c.cy, 34.0, 1.0))
  }
}
