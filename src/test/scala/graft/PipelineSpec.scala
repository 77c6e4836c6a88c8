package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.ScatteringFunctions.Poni
import graft.operators.Azav
import graft.pipeline.Pipeline
import graft.sources.ImageSource

/** E1/E2 — end-to-end: synthetic EDF frames → curves (with incremental
  * reprocessing + T2 invalidation) → per-delay reduction.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val g = Poni(dist = 0.1, poni1 = 0.016, poni2 = 0.016,
    pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
  private val cfg = Pipeline.AzavConfig(g, Azav.QGrid(0.0, 3.0, 10))

  private def writeFrame(dir: String, name: String, level: Double): Unit = {
    val data = Array.fill(32 * 32)(level)
    Files.write(java.nio.file.Paths.get(dir, name),
      ImageSource.encodeEdf(32, 32, data))
  }

  test("E1 integrates a folder, processes incrementally, invalidates on config change") {
    val folder = Files.createTempDirectory("e1-frames").toString
    val storage = Files.createTempDirectory("e1-store").toString
    writeFrame(folder, "img_000.edf", 100.0)
    writeFrame(folder, "img_001.edf", 200.0)

    val first = Pipeline.doFolderAzav(spark, folder, storage, cfg)
    val images1 = first.select("image_id").distinct().as[String].collect().toSet
    assert(images1 == Set("img_000.edf", "img_001.edf"))
    first.filter($"image_id" === "img_000.edf").select("i").as[Double]
      .collect().foreach(v => assert(approx(v, 100.0, 1e-9)))

    // new frame arrives → only it is integrated, union with saved
    writeFrame(folder, "img_002.edf", 300.0)
    val second = Pipeline.doFolderAzav(spark, folder, storage, cfg)
    assert(second.select("image_id").distinct().count() == 3)

    // config change (different grid) → manifest mismatch → full redo
    val cfg2 = cfg.copy(grid = Azav.QGrid(0.0, 3.0, 20))
    val third = Pipeline.doFolderAzav(spark, folder, storage, cfg2)
    assert(third.select("image_id").distinct().count() == 3)
    assert(graft.sources.Bundle.isValid(storage, cfg2.manifest))
    assert(!graft.sources.Bundle.isValid(storage, cfg.manifest))
  }

  test("maskFn is honoured on the pixel path (with dezinger set)") {
    val folder = Files.createTempDirectory("maskfn-frames").toString
    val storage1 = Files.createTempDirectory("maskfn-store1").toString
    val storage2 = Files.createTempDirectory("maskfn-store2").toString
    writeFrame(folder, "img_000.edf", 100.0)
    // dezinger forces the pixel path; maskFn must not be dropped there
    val masked = Pipeline.doFolderAzav(spark, folder, storage1,
      cfg.copy(dezinger = Some(0.999), maskFn = Some((x, _) => x < 16),
        maskDescription = "x<16"))
    val unmasked = Pipeline.doFolderAzav(spark, folder, storage2,
      cfg.copy(dezinger = Some(0.999)))
    val nMasked = masked.agg(sum("n_pix")).as[Long].collect()(0)
    val nAll = unmasked.agg(sum("n_pix")).as[Long].collect()(0)
    assert(nMasked < nAll, s"maskFn dropped: $nMasked vs $nAll pixels")
  }

  test("F8 split keys: one-pass split reduction equals the per-angle loop") {
    // interleaved angles: every reduction stage (ref tagging, as-of
    // interpolation, thinning, chi2 auto-threshold, averaging) must behave
    // as if each angle subset were reduced separately (id9.py:246-263)
    val rows = for (i <- 0 until 60; q <- 1 to 2) yield
      (i, if (i % 5 == 0) 0.0 else (i % 3 + 1) * 1e-9, q,
        (i * 7 % 13 + q).toDouble, i % 2)
    val df = rows.toDF("image_idx", "delay", "q_bin", "i", "angle")
      .withColumn("err", lit(1.0))
    val cfg = Pipeline.ReductionConfig(splitKeys = Seq("angle"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Double]("delay"), r.getAs[Int]("q_bin"), r.getAs[Int]("angle"))
    def vals(r: org.apache.spark.sql.Row) =
      (r.getAs[Double]("diff_av"), r.getAs[Double]("noise"),
        r.getAs[Long]("n_rep"), r.getAs[Double]("err"))
    val onePass = Pipeline.doDataRed(df, cfg).collect()
      .map(r => key(r) -> vals(r)).toMap
    val looped = (0 to 1).flatMap { a =>
      Pipeline.doDataRed(df.filter($"angle" === a),
          Pipeline.ReductionConfig())
        .withColumn("angle", lit(a)).collect()
        .map(r => key(r) -> vals(r))
    }.toMap
    assert(onePass.keySet == looped.keySet)
    onePass.foreach { case (k, (av1, n1, nr1, e1)) =>
      val (av2, n2, nr2, e2) = looped(k)
      assert(approx(av1, av2, 1e-12) && approx(n1, n2, 1e-12) &&
        nr1 == nr2 && approx(e1, e2, 1e-12), s"split group $k diverged")
    }
  }

  test("E1 log semi-join (J1): only frames present in the log integrate") {
    val folder = Files.createTempDirectory("j1-frames").toString
    val storage = Files.createTempDirectory("j1-store").toString
    writeFrame(folder, "in_log.edf", 100.0)
    writeFrame(folder, "not_in_log.edf", 200.0)
    val log = Seq(("in_log.edf", 1e-9)).toDF("file", "delay")
    val curves = Pipeline.doFolderAzav(spark, folder, storage, cfg, log = Some(log))
    val ids = curves.select("image_id").distinct().as[String].collect().toSet
    assert(ids == Set("in_log.edf"))
  }

  test("E2 splitKeys (F8): one pass groups per angle, no loop") {
    val rows = for (img <- 0 until 8; q <- 0 until 3) yield
      (img, if (img % 2 == 0) 0.0 else 1e-9, q,
        10.0 + q + (if (img % 2 == 1) (if (img < 4) 1.0 else 3.0) else 0.0),
        0.1, if (img < 4) 0.0 else 45.0)
    val curves = rows.toDF("image_idx", "delay", "q_bin", "i", "err", "angle")
    // explicit chi2 threshold: the fixture's repetitions agree exactly, so
    // the 'auto' 95th-percentile cut (strict <) would reject everything
    val reduced = Pipeline.doDataRed(curves,
      Pipeline.ReductionConfig(chi2Threshold = Some(100.0),
        splitKeys = Seq("angle")))
    val m = reduced.collect().map(r =>
      (r.getAs[Double]("delay"), r.getAs[Double]("angle")) ->
        r.getAs[Double]("diff_av")).toMap
    assert(approx(m((1e-9, 0.0)), 1.0, 1e-9))
    assert(approx(m((1e-9, 45.0)), 3.0, 1e-9))
  }

  test("mask-geometry scan is header-only END-TO-END: detectorDims " +
       "through the registered graft-edf source decodes zero payload " +
       "and feeds a real mask stage") {
    import graft.sources.EdfSource
    import graft.operators.Masks
    val dir = Files.createTempDirectory("dims-only").toString
    (0 until 4).foreach { k =>
      Files.write(java.nio.file.Paths.get(dir, s"g$k.edf"),
        ImageSource.encodeEdf(6, 4, Array.fill(24)(k.toDouble)))
    }
    val (w, h) = Pipeline.detectorDims(spark, dir)
    assert((w, h) == ((6, 4)))
    // THE pipeline-grain assertion: a width/height-only stage must
    // report payload=false — the per-scan hook, now pinned end-to-end
    assert(EdfSource.lastScan.get() == ((4, 4, false)),
      s"dims-only pipeline stage decoded payload: ${EdfSource.lastScan.get()}")
    // the scanned geometry drives M7 directly: a 1-pixel border over the
    // 6x4 detector masks exactly the perimeter
    import spark.implicits._
    val px = (for (y <- 0 until h; x <- 0 until w) yield (x, y))
      .toDF("x", "y")
    val masked = px.filter(Masks.border(col("x"), col("y"), 1, w, h)).count()
    assert(masked == 2 * (w + h) - 4, s"border over scanned dims: $masked")
  }

  test("E2 reduces curves to per-delay differences with chi2 filtering") {
    // 8 images × 5 bins; delays alternate 0 (ref) and 1e-9
    val rows = for (img <- 0 until 8; q <- 0 until 5) yield
      (img, if (img % 2 == 0) 0.0 else 1e-9, q,
        10.0 + q + (if (img % 2 == 1) 1.0 else 0.0), 0.1)
    val curves = rows.toDF("image_idx", "delay", "q_bin", "i", "err")
    val reduced = Pipeline.doDataRed(curves)
    val m = reduced.collect().map(r =>
      r.getAs[Double]("delay") -> r.getAs[Double]("diff_av")).toMap
    // pumped shots sit exactly 1.0 above the interpolated reference
    assert(approx(m(1e-9), 1.0, 1e-9))
  }
}
