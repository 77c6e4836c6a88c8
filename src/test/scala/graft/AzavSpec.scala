package graft

import org.apache.spark.sql.functions._
import graft.functions.ScatteringFunctions.Poni
import graft.operators.{Azav, Masks}

/** A1/A2/A5/A6/X8 — azimuthal integration and normalization. */
class AzavSpec extends SparkSpec {
  import spark.implicits._

  // flat detector, beam center at pixel (32,32) (poni = 32.5 px offsets so
  // pixel centers land symmetrically), 1 mm pixels, 100 mm distance
  private val g = Poni(dist = 0.1, poni1 = 0.0325, poni2 = 0.0325,
    pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
  private val grid = Azav.QGrid(0.0, 4.0, 40)

  private lazy val flatImage = {
    val px = for (y <- 0 until 64; x <- 0 until 64) yield ("img0", y, x, 100.0)
    px.toDF("image_id", "y", "x", "intensity")
  }

  test("integrate1d of a flat image is flat with Poisson errors") {
    val out = Azav.integrate1d(flatImage, g, grid).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(approx(r.getAs[Double]("i"), 100.0, 1e-9))
      val n = r.getAs[Long]("n_pix")
      // err = sqrt(sum(i))/n = sqrt(100 n)/n = 10/sqrt(n)
      assert(approx(r.getAs[Double]("err"), 10.0 / math.sqrt(n.toDouble), 1e-9))
    }
  }

  test("integrate1d respects dark subtraction and q binning") {
    val out = Azav.integrate1d(flatImage, g, grid, dark = 40.0).collect()
    out.foreach(r => assert(approx(r.getAs[Double]("i"), 60.0, 1e-9)))
    // q of the central region is small → bin 0 exists; beyond corner radius
    // (~45 px ≈ 0.045 m → 2θ ≈ 0.42 rad → q ≈ 2.6) no bins
    val maxBin = out.map(_.getAs[Int]("q_bin")).max
    assert(maxBin <= (2.8 / grid.dq).toInt)
  }

  test("polarization correction: P = 1 at 2θ = 0, boosts in-plane intensity") {
    val out = Azav.integrate1d(flatImage, g, grid,
      polarizationFactor = Some(0.99)).collect()
      .map(r => r.getAs[Int]("q_bin") -> r.getAs[Double]("i")).toMap
    val raw = Azav.integrate1d(flatImage, g, grid).collect()
      .map(r => r.getAs[Int]("q_bin") -> r.getAs[Double]("i")).toMap
    // near the beam center 2θ≈0 → P≈1 → unchanged; outer bins 2θ>0 →
    // average P < 1 → corrected intensity above raw
    assert(approx(out(0), raw(0), 0.01))
    val outer = out.keys.max
    assert(out(outer) > raw(outer))
  }

  test("masked pixels are excluded") {
    val mask = Masks.rectangle(col("x").cast("double"), col("y").cast("double"),
      -1, -1, 64, 64) // everything
    assert(Azav.integrate1d(flatImage, g, grid, mask = Some(mask)).count() == 0)
  }

  test("fused frame kernel is equivalent to the declarative pixel path") {
    import spark.implicits._
    val frames = Seq(
      graft.sources.ImageSource.Frame("a", 64, 64,
        Array.tabulate(64 * 64)(i => (i % 37).toDouble)),
      graft.sources.ImageSource.Frame("b", 64, 64,
        Array.tabulate(64 * 64)(i => ((i * 7) % 53).toDouble))).toDS()
    val pixels = frames.toDF().select(col("image_id"), col("width"),
        posexplode(col("data")).as(Seq("pos", "intensity")))
      .select(col("image_id"),
        (col("pos") % col("width")).cast("int").as("x"),
        expr("pos div width").cast("int").as("y"), col("intensity"))
    val borderFn = (x: Int, y: Int) => x < 2 || x >= 62 || y < 2 || y >= 62
    val borderCol = Masks.border(col("x"), col("y"), 2, 64, 64)
    val a = Azav.integrate1d(pixels, g, grid, dark = 1.0, mask = Some(borderCol))
      .select("image_id", "q_bin", "i", "err", "n_pix")
      .orderBy("image_id", "q_bin").collect()
    val b = Azav.integrateFrames(frames, g, grid, dark = 1.0, mask = Some(borderFn))
      .select("image_id", "q_bin", "i", "err", "n_pix")
      .orderBy("image_id", "q_bin").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (r1, r2) =>
      assert(r1.getString(0) == r2.getString(0) && r1.getInt(1) == r2.getInt(1))
      assert(approx(r1.getDouble(2), r2.getDouble(2)))
      assert(approx(r1.getDouble(3), r2.getDouble(3)))
      assert(r1.getLong(4) == r2.getLong(4))
    }
  }

  test("fused 2-D cake kernel equals the declarative integrate2d") {
    import spark.implicits._
    val frames = Seq(graft.sources.ImageSource.Frame("a", 64, 64,
      Array.tabulate(64 * 64)(i => ((i * 13) % 41).toDouble))).toDS()
    val pixels = frames.toDF().select(col("image_id"), col("width"),
        posexplode(col("data")).as(Seq("pos", "intensity")))
      .select(col("image_id"),
        (col("pos") % col("width")).cast("int").as("x"),
        expr("pos div width").cast("int").as("y"), col("intensity"))
    val a = Azav.integrate2d(pixels, g, grid, nAzim = 8)
      .select("image_id", "q_bin", "az_bin", "i", "n_pix")
      .orderBy("q_bin", "az_bin").collect()
    val b = Azav.integrate2dFrames(frames, g, grid, nAzim = 8)
      .select("image_id", "q_bin", "az_bin", "i", "n_pix")
      .orderBy("q_bin", "az_bin").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (r1, r2) =>
      assert(r1.getInt(1) == r2.getInt(1) && r1.getInt(2) == r2.getInt(2))
      assert(approx(r1.getDouble(3), r2.getDouble(3)))
      assert(r1.getLong(4) == r2.getLong(4))
    }
  }

  test("integrate2d covers all azimuth bins for a centered flat image") {
    val out = Azav.integrate2d(flatImage, g, grid, nAzim = 8).collect()
    val azBins = out.map(_.getAs[Int]("az_bin")).toSet
    assert(azBins == (0 until 8).toSet)
    out.foreach(r => assert(approx(r.getAs[Double]("i"), 100.0, 1e-9)))
  }

  test("geometry fidelity: a ring at known q lands in the right bin") {
    // place a bright ring at the radius where q(r) = q0, verify the
    // integrated peak appears in q0's bin (SURVEY §7.4 risk 3)
    val q0 = 1.2
    // invert q = 4π/λ sin(atan(r_m/L)/2) for the flat geometry
    val tth = 2 * math.asin(q0 * g.wavelengthA / (4 * math.Pi))
    val rPix = g.dist * math.tan(tth) / g.pixel1 // metres → pixels
    val px = (for (y <- 0 until 64; x <- 0 until 64) yield {
      val r = math.hypot(x + 0.5 - 32.5, y + 0.5 - 32.5)
      ("ring", y, x, if (math.abs(r - rPix) < 0.7) 1000.0 else 1.0)
    }).toDF("image_id", "y", "x", "intensity")
    val out = Azav.integrate1d(px, g, grid).collect()
    val peakBin = out.maxBy(_.getAs[Double]("i")).getAs[Int]("q_bin")
    assert(math.abs(peakBin - ((q0 - grid.qMin) / grid.dq).toInt) <= 1,
      s"peak bin $peakBin vs expected ${((q0 - grid.qMin) / grid.dq).toInt}")
  }

  test("q just below qMax clamps to the last bin (FP edge, no index nQ)") {
    // dq = 3.3/40 rounds so that nextDown(3.3)/dq truncates to 40 == nQ —
    // unclamped this crashed the fused kernels and emitted q_bin == nQ rows
    val edgeGrid = Azav.QGrid(0.0, 3.3, 40)
    val qEdge = math.nextAfter(3.3, 0.0)
    assert(((qEdge - edgeGrid.qMin) / edgeGrid.dq).toInt == 40) // edge is real
    assert(edgeGrid.binScala(qEdge) == 39)
    assert(edgeGrid.binScala(3.3) == -1 && edgeGrid.binScala(-0.1) == -1)
    val colBin = Seq(qEdge).toDF("q")
      .select(edgeGrid.bin(col("q")).as("b")).as[Int].collect()
    assert(colBin.sameElements(Array(39)))
  }

  test("dezinger drops outlier pixels within a ring") {
    val spiked = flatImage.withColumn("intensity",
      when(col("x") === 40 && col("y") === 32, 10000.0).otherwise(col("intensity")))
    val geo = Azav.withGeometry(spiked, g, grid)
    val kept = Azav.dezinger(geo, percentile = 0.5, factor = 1.5)
    assert(kept.count() == geo.count() - 1)
    assert(kept.filter(col("i_corr") > 9000).count() == 0)
  }

  test("normalizeAuto makes per-image mean 1") {
    val curves = Seq(("a", 1, 2.0, 0.1), ("a", 2, 4.0, 0.1),
      ("b", 1, 10.0, 0.1), ("b", 2, 30.0, 0.1))
      .toDF("image_id", "q_bin", "i", "err")
    val out = Azav.normalizeAuto(curves)
      .groupBy("image_id").agg(avg(col("i_norm")).as("m")).collect()
    out.foreach(r => assert(approx(r.getAs[Double]("m"), 1.0, 1e-12)))
  }

  test("normalizeQRange divides by the range monitor (median variant)") {
    val curves = Seq(("a", 1.0, 1, 2.0, 0.1), ("a", 2.0, 2, 4.0, 0.1),
      ("a", 3.0, 3, 6.0, 0.1))
      .toDF("image_id", "q", "q_bin", "i", "err")
    val out = Azav.normalizeQRange(curves, 1.0, 3.0, useMedian = true)
      .filter(col("q_bin") === 1).select("i_norm").as[Double].collect()
    assert(approx(out(0), 0.5)) // monitor = median(2,4,6) = 4
  }

  test("qLims filters the q range, lineage keeps the original") {
    val curves = Seq(("a", 0.5, 1.0), ("a", 1.5, 2.0), ("a", 2.5, 3.0))
      .toDF("image_id", "q", "i")
    assert(Azav.qLims(curves, 1.0, 2.0).count() == 1)
    assert(curves.count() == 3)
  }

  test("distanceHistogram bins by integer radius") {
    val px = Seq((0, 0, 1.0), (3, 4, 2.0), (6, 8, 3.0)).toDF("x", "y", "intensity")
    val m = Azav.distanceHistogram(px, 0.0, 0.0).collect()
      .map(r => r.getAs[Int]("r_bin") -> r.getAs[Double]("mean_i")).toMap
    assert(m(0) == 1.0 && m(5) == 2.0 && m(10) == 3.0)
  }
}
