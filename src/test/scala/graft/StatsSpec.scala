package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Exact type-7 quantiles and the shared prefix-sum primitive: pinned
  * against driver-side brute force over any partitioning, plus the
  * interpolation edge cases (integral h, duplicate values, p ∈ {0, 1}).
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side type-7 reference. */
  private def t7(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val h = p * (s.size - 1)
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    s(lo) + (h - lo) * (s(hi) - s(lo))
  }

  test("prefixSums: global inclusive cumulative across any partitioning") {
    val df = (1 to 97).map(i => (i.toDouble, i.toLong % 5 + 1))
      .toDF("v", "c").repartition(7)
    val (cum, totals) = Stats.prefixSums(df, "v", Seq("c"))
    val got = cum.orderBy("v").select("v", "_cum_c")
      .as[(Double, Long)].collect().toSeq
    var run = 0L
    val want = (1 to 97).map { i => run += i % 5 + 1; (i.toDouble, run) }
    assert(got == want)
    assert(totals("c") == run)
  }

  test("exactQuantiles: matches brute-force type-7 on random data with ties") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(1000)(rnd.nextInt(200).toDouble / 3.0)
    val probs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = xs.toDF("x").repartition(9)
      .transform(Stats.exactQuantiles(_, "x", probs))
      .orderBy("prob").as[(Double, Double)].collect().toSeq
    probs.zip(got).foreach { case (p, (gp, gq)) =>
      assert(gp == p)
      assert(approx(gq, t7(xs, p), 1e-12), s"p=$p: $gq vs ${t7(xs, p)}")
    }
  }

  test("exactQuantiles: integral h needs no interpolation; NULLs dropped") {
    val df = Seq[java.lang.Double](10.0, 20.0, 30.0, 40.0, 50.0, null)
      .toDF("x")
    // n=5: p=0.5 → h=2 exactly → v[2]=30
    val r = Stats.exactQuantiles(df, "x", Seq(0.5, 0.25))
      .orderBy("prob").as[(Double, Double)].collect()
    assert(r(0) == (0.25, 20.0)) // h=1 → v[1]
    assert(r(1) == (0.5, 30.0))
  }

  test("exactQuantiles grouped: per-group type-7 against brute force") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(600)(i =>
      (s"g${i % 3}", rnd.nextInt(50).toDouble + (if (i % 3 == 1) 100 else 0)))
    val probs = Seq(0.1, 0.5, 0.9)
    val got = rows.toDF("g", "x").repartition(8)
      .transform(Stats.exactQuantiles(_, "x", probs, Seq("g")))
      .orderBy("g", "prob")
      .as[(String, Double, Double)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (g, rs) =>
      probs.map(p => (g, p, t7(rs.map(_._2), p)))
    }
    got.zip(want).foreach { case ((gg, gp, gq), (wg, wp, wq)) =>
      assert(gg == wg && gp == wp)
      assert(approx(gq, wq, 1e-12), s"$gg p=$gp: $gq vs $wq")
    }
  }

  test("correlationMatrix: brute-force parity with pairwise-complete NULLs") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(400) { i =>
      val x = rnd.nextDouble() * 10
      val y = 2.0 * x + rnd.nextDouble() // strongly correlated with x
      val z = rnd.nextDouble() * 5       // independent
      // x NULL every 7th row, z NULL every 11th — pairwise deletion differs
      (if (i % 7 == 0) None else Some(x), Some(y),
        if (i % 11 == 0) None else Some(z))
    }
    val df = rows.toDF("x", "y", "z").repartition(6)
    val got = Stats.correlationMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.map(g => (g._1, g._2)).toSeq ==
      Seq(("x", "y"), ("x", "z"), ("y", "z")))
    // driver-side replay with the same scaled-integer power sums
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    def ssum(xs: Seq[Double]): Double =
      xs.map(v => BigDecimal(math.round(v * 1e6))).sum.toDouble / 1e6
    def brute(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sx, sy) = (ssum(a), ssum(b))
      val sxx = ssum(a.map(v => v * v))
      val syy = ssum(b.map(v => v * v))
      val sxy = ssum(a.zip(b).map { case (u, v) => u * v })
      r6((n * sxy - sx * sy) /
        math.sqrt(n * sxx - sx * sx) / math.sqrt(n * syy - sy * sy))
    }
    def pair(fa: ((Option[Double], Option[Double], Option[Double])) => Option[Double],
             fb: ((Option[Double], Option[Double], Option[Double])) => Option[Double]) = {
      val both = rows.flatMap(r => for (a <- fa(r); b <- fb(r)) yield (a, b))
      (both.size.toLong, brute(both.map(_._1), both.map(_._2)))
    }
    val want = Seq(pair(_._1, _._2), pair(_._1, _._3), pair(_._2, _._3))
    got.zip(want).foreach { case ((cx, cy, n, c), (wn, wc)) =>
      assert(n == wn, s"($cx,$cy) n: $n vs $wn")
      assert(approx(c, wc, 1e-6), s"($cx,$cy): $c vs $wc")
    }
    // the strong pair really is strong, the independent one weak
    assert(got(0)._4 > 0.95 && math.abs(got(1)._4) < 0.2)
  }

  test("correlationMatrix: constant column yields NULL corr, not NaN") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "k")
    val r = Stats.correlationMatrix(df, Seq("x", "k")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("corr")))
  }

  test("profile: exact counts, NULL accounting, stable mean") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (3.0, null), (null, 50.0))
      .toDF("a", "b").repartition(3)
    val got = Stats.profile(df, Seq("a", "b")).orderBy("column").collect()
    val a = got(0); val b = got(1)
    assert(a.getAs[Long]("n") == 5 && a.getAs[Long]("n_null") == 1)
    assert(a.getAs[Long]("n_distinct") == 3) // 1, 2, 3
    assert(a.getAs[Double]("min_v") == 1.0 && a.getAs[Double]("max_v") == 3.0)
    assert(a.getAs[Double]("mean") == 2.0)
    assert(b.getAs[Long]("n_null") == 2 && b.getAs[Long]("n_distinct") == 3)
    assert(b.getAs[Double]("mean") == 30.0)
  }

  test("profile: scaled limb sums exact for negative and large values") {
    // the limb identity x = (x>>22)·2^22 + (x & mask) must hold for
    // NEGATIVE scaled values (arithmetic shift + nonneg mask) and values
    // whose scaled form exceeds one limb
    val vals = Seq(-1.000001, 2.5, -3.25, 0.000001, 123456789.654321,
      -987654321.123456, 7.0e9, -7.0e9)
    val df = vals.toDF("v").repartition(4)
    val got = Stats.profile(df, Seq("v")).collect()(0)
    val expectedMean = {
      val scaled = vals.map(v => BigDecimal(math.round(v * 1e6)))
      val mean = (scaled.sum / 1e6 / vals.size).toDouble
      math.rint(mean * 1e6) / 1e6
    }
    assert(approx(got.getAs[Double]("mean"), expectedMean, 1e-12),
      s"${got.getAs[Double]("mean")} vs $expectedMean")
  }

  test("exactQuantiles: single value, and empty input throws") {
    val one = Seq(42.0).toDF("x")
    val r = Stats.exactQuantiles(one, "x", Seq(0.0, 0.5, 1.0))
      .orderBy("prob").as[(Double, Double)].collect()
    assert(r.forall(_._2 == 42.0))
    intercept[IllegalArgumentException] {
      Stats.exactQuantiles(Seq.empty[Double].toDF("x"), "x", Seq(0.5))
        .collect()
    }
  }
}
