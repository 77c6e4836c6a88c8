package graft

import org.apache.spark.sql.functions._
import graft.operators.Filters

/** A8/A9/A10/F1/W3 — robust statistics and outlier rejection. */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("zingerStats: median and MAD per bin") {
    // bin 1: i = 1..5 → med 3, |i-3| = 2,1,0,1,2 → MAD 1
    val curves = (1 to 5).map(i => (i, 1, i.toDouble))
      .toDF("image_idx", "q_bin", "i")
    val r = Filters.zingerStats(curves).collect()(0)
    assert(approx(r.getAs[Double]("med_i"), 3.0))
    assert(approx(r.getAs[Double]("mad_i"), 1.0))
  }

  test("single-pass median+MAD equals the two-pass formulation") {
    val rnd = new scala.util.Random(5)
    val rows = for (q <- 1 to 6; i <- 1 to 40)
      yield (i, q, rnd.nextInt(1000) / 10.0)
    val curves = rows.toDF("image_idx", "q_bin", "i")
    val twoPass = Filters.zingerStats(curves).collect()
      .map(r => r.getAs[Int]("q_bin") ->
        (r.getAs[Double]("med_i"), r.getAs[Double]("mad_i"))).toMap
    val onePass = Filters.zingerStatsOnePass(curves).collect()
      .map(r => r.getAs[Int]("q_bin") ->
        (r.getAs[Double]("med_i"), r.getAs[Double]("mad_i"))).toMap
    assert(twoPass.keySet == onePass.keySet)
    twoPass.foreach { case (k, (m, d)) =>
      assert(approx(onePass(k)._1, m) && approx(onePass(k)._2, d), s"bin $k")
    }
  }

  test("removeZingers drops far outliers, keeps the bulk") {
    val base = (1 to 20).map(i => (i, 1, 10.0 + (i % 3)))
    val withZinger = base :+ (21, 1, 1000.0)
    val curves = withZinger.toDF("image_idx", "q_bin", "i")
    val kept = Filters.removeZingers(curves, nSigma = 5.0)
      .select("image_idx").as[Int].collect().toSet
    assert(!kept.contains(21) && kept.size == 20)
  }

  test("detrend reproduces np.gradient edge handling") {
    val curves = Seq((0, 1, 1.0), (1, 1, 4.0), (2, 1, 9.0))
      .toDF("image_idx", "q_bin", "i")
    val g = Filters.detrend(curves).orderBy("image_idx")
      .select("i_grad").as[Double].collect()
    assert(approx(g(0), 3.0))  // one-sided: 4-1
    assert(approx(g(1), 4.0))  // central: (9-1)/2
    assert(approx(g(2), 5.0))  // one-sided: 9-4
  }

  test("outlierChi2 + chi2Filter: explicit and auto thresholds") {
    // 3 well-behaved curves + 1 outlier across 4 bins
    val rows = for (img <- 1 to 4; bin <- 1 to 4) yield
      (img, bin, if (img == 4) 50.0 else 10.0 + img * 0.1, 1.0)
    val curves = rows.toDF("image_idx", "q_bin", "i", "err")
    val chi2 = Filters.outlierChi2(curves).withColumnRenamed("chi2", "chi2_0")
    val keptExplicit = Filters.chi2Filter(chi2, Some(10.0))
      .select("image_idx").as[Int].collect().toSet
    assert(keptExplicit == Set(1, 2, 3))
    val keptAuto = Filters.chi2Filter(chi2, None)
      .select("image_idx").as[Int].collect().toSet
    assert(!keptAuto.contains(4))
  }

  test("flagFilter annotates instead of dropping") {
    val df = Seq(1, 2, 3).toDF("x")
    val flagged = Filters.flagFilter(df, col("x") > 1)
    assert(flagged.count() == 3)
    assert(flagged.filter(col("kept")).count() == 2)
  }
}
