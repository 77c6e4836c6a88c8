package graft

import org.apache.spark.sql.functions._
import graft.operators.Drift

/** Drift detectors: PSI bucket arithmetic, the exact distributed KS
  * statistic vs a driver-side brute force, and token log-odds shift.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("bucketIdx: half-open buckets with sorted breaks") {
    val df = Seq(-1.0, 0.0, 0.5, 1.0, 2.0, 3.0).toDF("v")
    val got = df.select(Drift.bucketIdx(col("v"), Seq(0.0, 1.0, 2.0)).as("b"))
      .as[Int].collect().toSeq
    // (-inf,0)→0, [0,1)→1, [1,2)→2, [2,inf)→3
    assert(got == Seq(0, 1, 1, 2, 3, 3))
  }

  test("psiBuckets: identical sides give exactly zero contributions") {
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val r = Drift.psiBuckets(a, a, "v", Seq(25.0, 50.0, 75.0)).collect()
    assert(r.length == 4)
    r.foreach(row => assert(row.getAs[Double]("contrib") == 0.0))
  }

  test("psi: hand-computed shifted distribution, empty buckets stay finite") {
    // a: all mass in bucket 0; b: all mass in bucket 1 (plus smoothing)
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(11.0, 12.0).toDF("v")
    val breaks = Seq(10.0)
    val pa0 = 3.5 / 4.0; val pa1 = 0.5 / 4.0
    val pb0 = 0.5 / 3.0; val pb1 = 2.5 / 3.0
    val expected = BigDecimal(
      math.rint(((pa0 - pb0) * math.log(pa0 / pb0)) * 1e6) / 1e6 +
        math.rint(((pa1 - pb1) * math.log(pa1 / pb1)) * 1e6) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Drift.psi(a, b, "v", breaks).collect()(0).getAs[Double]("psi")
    assert(approx(got, expected, 1e-9), s"$got vs $expected")
  }

  test("ksStatistic: disjoint supports give D = 1 at the last value of A") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 5.0).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").collect()(0)
    assert(r.getAs[Double]("ks_d") == 1.0)
    assert(r.getAs[Double]("at_value") == 3.0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
  }

  test("ksStatistic: matches driver-side brute force on random data, any partitioning") {
    val rnd = new scala.util.Random(42)
    val av = Seq.fill(500)(rnd.nextInt(80).toDouble)
    val bv = Seq.fill(300)(rnd.nextInt(80).toDouble + (rnd.nextInt(3) - 1))
    def ecdf(xs: Seq[Double])(t: Double): Double =
      xs.count(_ <= t).toDouble / xs.size
    val pooled = (av ++ bv).distinct.sorted
    val brute = pooled.map(t => math.abs(ecdf(av)(t) - ecdf(bv)(t))).max
    val a = av.toDF("v").repartition(7)
    val b = bv.toDF("v").repartition(3)
    val r = Drift.ksStatistic(a, b, "v").collect()(0)
    assert(approx(r.getAs[Double]("ks_d"), math.rint(brute * 1e6) / 1e6, 1e-6),
      s"${r.getAs[Double]("ks_d")} vs $brute")
    // argmax is the smallest value attaining the sup
    val argmaxes = pooled.filter(t =>
      math.rint(math.abs(ecdf(av)(t) - ecdf(bv)(t)) * 1e9) ==
        math.rint(brute * 1e9))
    assert(r.getAs[Double]("at_value") == argmaxes.min)
  }

  test("ksStatistic: identical distributions give D = 0") {
    val a = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val r = Drift.ksStatistic(a, a, "v").collect()(0)
    assert(r.getAs[Double]("ks_d") == 0.0)
  }

  test("tokenShift: sign convention — over-represented in A is positive") {
    // In a two-token vocab the complement ('the') moves symmetrically and,
    // with larger counts, carries the SMALLER variance → larger |z|; both
    // directions must surface with the right signs.
    val a = (Seq.fill(50)("quantum") ++ Seq.fill(50)("the")).toDF("tok")
    val b = (Seq.fill(2)("quantum") ++ Seq.fill(98)("the")).toDF("tok")
    val rows = Drift.tokenShift(a, b, "tok", alpha = 0.5, minCount = 5, k = 5)
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    assert(rows("quantum").getAs[Double]("z") > 0) // over-represented in a
    assert(rows("the").getAs[Double]("z") < 0)     // over-represented in b
    assert(rows("the").getAs[Int]("rank") == 1)    // tighter variance wins
    assert(rows("quantum").getAs[Long]("c_a") == 50L &&
      rows("quantum").getAs[Long]("c_b") == 2L)
  }

  test("tokenShift: hand-computed log-odds for a two-token vocabulary") {
    val a = (Seq.fill(30)("x") ++ Seq.fill(10)("y")).toDF("tok")
    val b = (Seq.fill(10)("x") ++ Seq.fill(30)("y")).toDF("tok")
    // V = 2, tA = tB = 40, α = 0.5
    def side(c: Double, tot: Double) =
      math.log((c + 0.5) / (tot + 0.5 * 2 - c - 0.5))
    val deltaX = side(30, 40) - side(10, 40)
    val zX = deltaX / math.sqrt(1 / 30.5 + 1 / 10.5)
    val row = Drift.tokenShift(a, b, "tok", alpha = 0.5, minCount = 1, k = 2)
      .filter(col("token") === "x").collect()(0)
    assert(approx(row.getAs[Double]("delta"), math.rint(deltaX * 1e6) / 1e6, 1e-9))
    assert(approx(row.getAs[Double]("z"), math.rint(zX * 1e6) / 1e6, 1e-9))
  }

  test("jsDivergence: identical 0, disjoint ln 2, symmetric, hand-computed") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(11.0, 12.0).toDF("v")
    val breaks = Seq(10.0)
    assert(Drift.jsDivergence(a, a, "v", breaks)
      .collect()(0).getAs[Double]("js") == 0.0)
    // disjoint bucket masses → exactly ln 2 (per-bucket rounding first)
    val disjoint = Drift.jsDivergence(a, b, "v", breaks).collect()(0)
    val ln2r = math.rint(math.log(2.0) / 2 * 1e6) / 1e6 * 2
    assert(approx(disjoint.getAs[Double]("js"),
      math.rint(ln2r * 1e6) / 1e6, 1e-9))
    assert(disjoint.getAs[Long]("n_a") == 3L && disjoint.getAs[Long]("n_b") == 2L)
    // asymmetric masses vs a driver-side replay; symmetry
    val c = Seq(1.0, 2.0, 11.0).toDF("v")
    def t(p: Double, m: Double) = if (p > 0) p * math.log(p / m) / 2 else 0.0
    val (pa0, pa1) = (1.0, 0.0); val (pc0, pc1) = (2.0 / 3, 1.0 / 3)
    val expected = math.rint((
      math.rint((t(pa0, (pa0 + pc0) / 2) + t(pc0, (pa0 + pc0) / 2)) * 1e6) / 1e6 +
      math.rint((t(pa1, (pa1 + pc1) / 2) + t(pc1, (pa1 + pc1) / 2)) * 1e6) / 1e6
    ) * 1e6) / 1e6
    val got = Drift.jsDivergence(a, c, "v", breaks)
      .collect()(0).getAs[Double]("js")
    assert(approx(got, expected, 1e-9), s"$got vs $expected")
    val flipped = Drift.jsDivergence(c, a, "v", breaks)
      .collect()(0).getAs[Double]("js")
    assert(got == flipped)
  }

  test("suggestBreaks: equal-mass interior quantiles; ties collapse") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    // quartile breaks of 1..100 (type-7): h = p*99
    val got = Drift.suggestBreaks(ref, "v", 4)
    assert(got == Seq(25.75, 50.5, 75.25))
    // reference-derived breaks feed straight into psiBuckets
    val r = Drift.psiBuckets(ref, ref, "v", got).collect()
    assert(r.length == 4 && r.forall(_.getAs[Double]("contrib") == 0.0))
    // a heavily tied reference collapses duplicate quantiles
    val tied = Seq.fill(100)(5.0).toDF("v")
    assert(Drift.suggestBreaks(tied, "v", 4) == Seq(5.0))
  }

  test("chiSquared: hand-computed 2x2 table; identical distributions near 0") {
    // a: 30 x / 10 y; b: 10 x / 30 y — classic 2x2
    val a = (Seq.fill(30)("x") ++ Seq.fill(10)("y")).toDF("cat")
    val b = (Seq.fill(10)("x") ++ Seq.fill(30)("y")).toDF("cat")
    val r = Drift.chiSquared(a, b, "cat").collect()(0)
    // expected = 20 per cell; chi2 = 4 * (10^2 / 20) = 20
    assert(r.getAs[Double]("chi2") == 20.0)
    assert(r.getAs[Long]("dof") == 1L && r.getAs[Long]("n_cats") == 2L)
    assert(r.getAs[Long]("n_a") == 40L && r.getAs[Long]("n_b") == 40L)
    // V = sqrt(20 / 80) = 0.5
    assert(r.getAs[Double]("cramers_v") == 0.5)
    val same = Drift.chiSquared(a, a, "cat").collect()(0)
    assert(same.getAs[Double]("chi2") == 0.0)
    assert(same.getAs[Double]("cramers_v") == 0.0)
  }

  test("chiSquared: empty sides fail FAST in every shape — one side " +
       "empty, and BOTH sides empty (the streamed-monitor-polled-early " +
       "case, where the merged frame has zero rows)") {
    val a = Seq.fill(5)("x").toDF("cat")
    val none = Seq.empty[String].toDF("cat")
    for ((l, r, what) <- Seq((a, none, "right empty"),
        (none, a, "left empty"), (none, none, "both empty"))) {
      val e = intercept[Exception](Drift.chiSquared(l, r, "cat").collect())
      assert(e.getMessage.contains("empty side"),
        s"$what must raise the empty-side error, got: ${e.getMessage}")
    }
    // all-NULL categories reduce to the same zero-row merged frame
    val allNull = Seq[Option[String]](None, None).toDF("cat")
    val e = intercept[Exception](
      Drift.chiSquared(allNull, allNull, "cat").collect())
    assert(e.getMessage.contains("empty side"))
  }

  test("chiSquared: category present on one side only still contributes") {
    val a = (Seq.fill(10)("x") ++ Seq.fill(5)("only_a")).toDF("cat")
    val b = Seq.fill(10)("x").toDF("cat")
    val r = Drift.chiSquared(a, b, "cat").collect()(0)
    assert(r.getAs[Long]("n_cats") == 2L)
    // driver-side replay of the same rounded-cell arithmetic
    val cells = Seq((10L, 10L), (5L, 0L)).map { case (cA, cB) =>
      val (ta, tb) = (15.0, 10.0); val n = 25.0
      val ct = (cA + cB).toDouble
      val (ea, eb) = (ta * ct / n, tb * ct / n)
      math.rint((math.pow(cA - ea, 2) / ea +
        math.pow(cB - eb, 2) / eb) * 1e6) / 1e6
    }
    assert(approx(r.getAs[Double]("chi2"),
      math.rint(cells.sum * 1e6) / 1e6, 1e-9))
  }

  test("psiSeries: pairs adjacent observed periods, matches pairwise PSI") {
    val rnd = new scala.util.Random(5)
    val rows = for {
      d <- Seq("d1", "d2", "d4"); _ <- 1 to 120 // d3 missing: d4 pairs d2
    } yield (d, rnd.nextDouble() * 100 + (if (d == "d4") 30 else 0))
    val df = rows.toDF("period", "v").repartition(5)
    val breaks = Seq(25.0, 50.0, 75.0)
    val series = Drift.psiSeries(df, "period", "v", breaks)
      .collect().map(r => r.getAs[String]("period") -> r).toMap
    assert(series.keySet == Set("d2", "d4")) // d1 has no predecessor
    // each series point equals the pairwise operator on the same two days
    for ((cur, prev) <- Seq(("d2", "d1"), ("d4", "d2"))) {
      val pair = Drift.psi(
        df.filter(col("period") === prev), df.filter(col("period") === cur),
        "v", breaks).collect()(0).getAs[Double]("psi")
      assert(series(cur).getAs[Double]("psi") == pair,
        s"$cur: ${series(cur).getAs[Double]("psi")} vs $pair")
      assert(series(cur).getAs[Long]("n_prev") == 120L &&
        series(cur).getAs[Long]("n_cur") == 120L)
    }
  }

  test("chiSquaredSf: independent closed-form fixtures (erfc / exp family) " +
       "and published critical values; Column twin matches the Scala twin") {
    import graft.functions.PValues
    // EXACT closed forms, independent of the series implementation:
    // dof=1: Q = 2(1 − Φ(√x)); dof=2: Q = e^{−x/2}; dof=4: e^{−x/2}(1+x/2)
    val exact = Seq(
      (1.0, 1.0, 0.3173105078629141), // 2(1−Φ(1))
      (3.841458820694124, 1.0, 0.05), // z²_{0.975}
      (4.605170185988091, 2.0, 0.1), // −2 ln 0.1
      (5.991464547107979, 2.0, 0.05), // −2 ln 0.05
      (2.0, 4.0, 2.0 / math.E), // e⁻¹(1+1)
      (9.48772903678115, 4.0, 0.05)) // published χ²₀.₉₅(4)
    for ((chi2, dof, want) <- exact)
      assert(approx(PValues.chiSquaredSf(chi2, dof), want, 1e-9),
        s"sf($chi2, $dof) = ${PValues.chiSquaredSf(chi2, dof)} vs $want")
    // published critical value at dof=10 (4-ulp table precision)
    assert(approx(PValues.chiSquaredSf(18.307038053275146, 10.0), 0.05, 1e-6))
    // edges: chi2 ≤ 0 → 1; deep tail → exactly 0
    assert(PValues.chiSquaredSf(0.0, 5.0) == 1.0)
    assert(PValues.chiSquaredSf(-1.0, 5.0) == 1.0)
    assert(PValues.chiSquaredSf(1000.0, 5.0) == 0.0)
    // Column twin ≡ Scala twin over a (chi2, dof) grid incl. odd dof
    val grid = for {
      chi2 <- Seq(0.0, 0.5, 3.0, 19.0, 40.0, 300.0)
      dof <- Seq(1, 2, 3, 10, 19, 50)
    } yield (chi2, dof.toDouble)
    val got = grid.toDF("chi2", "dof")
      .select(col("chi2"), col("dof"),
        PValues.chiSquaredSf(col("chi2"), col("dof")).as("p"))
      .collect()
    got.foreach { r =>
      val want = PValues.chiSquaredSf(
        r.getAs[Double]("chi2"), r.getAs[Double]("dof"))
      assert(approx(r.getAs[Double]("p"), want, 1e-12),
        s"column twin diverged at (${r.get(0)}, ${r.get(1)})")
    }
  }

  test("kolmogorovSf: published critical values, edges, monotonicity; " +
       "Column twin matches the Scala twin") {
    import graft.functions.PValues
    // published two-sided KS critical λ (Smirnov table)
    assert(approx(PValues.kolmogorovSf(1.2238), 0.10, 1e-3))
    assert(approx(PValues.kolmogorovSf(1.3581), 0.05, 1e-3))
    assert(approx(PValues.kolmogorovSf(1.6276), 0.01, 1e-3))
    // Q(1) — classical reference value
    assert(approx(PValues.kolmogorovSf(1.0), 0.2699996716773546, 1e-9))
    assert(PValues.kolmogorovSf(0.0) == 1.0)
    assert(PValues.kolmogorovSf(0.15) == 1.0) // below the λ≤0.2 clamp
    val pts = Seq(0.3, 0.6, 0.9, 1.2, 1.5, 2.0, 3.0)
    val vals = pts.map(PValues.kolmogorovSf)
    assert(vals == vals.sorted.reverse, "sf must be non-increasing")
    val got = pts.toDF("lam")
      .select(col("lam"), PValues.kolmogorovSf(col("lam")).as("p")).collect()
    got.foreach { r =>
      assert(approx(r.getAs[Double]("p"),
        PValues.kolmogorovSf(r.getAs[Double]("lam")), 1e-12))
    }
  }

  test("reports carry the p_value: chi² 2x2 fixture and a shifted KS " +
       "fixture agree with the driver-side survival functions") {
    import graft.functions.PValues
    val a = (Seq.fill(30)("x") ++ Seq.fill(10)("y")).toDF("cat")
    val b = (Seq.fill(10)("x") ++ Seq.fill(30)("y")).toDF("cat")
    val r = Drift.chiSquared(a, b, "cat").collect()(0)
    // chi2 = 20, dof = 1 → Q = 2(1 − Φ(√20)) ≈ 7.744e-6
    assert(r.getAs[Double]("p_value") ==
      math.rint(PValues.chiSquaredSf(20.0, 1.0) * 1e6) / 1e6)
    val ka = (1 to 200).map(_.toDouble).toDF("v")
    val kb = (1 to 200).map(_ + 30.0).toDF("v")
    val kr = Drift.ksStatistic(ka, kb, "v").collect()(0)
    val lam = math.sqrt(200.0 * 200.0 / 400.0) * kr.getAs[Double]("ks_d")
    assert(kr.getAs[Double]("p_value") ==
      math.rint(PValues.kolmogorovSf(lam) * 1e6) / 1e6)
  }

  test("tokenShift: minCount filters the ranking but not the prior's vocab") {
    val a = (Seq.fill(20)("common") ++ Seq("rare")).toDF("tok")
    val b = Seq.fill(20)("common").toDF("tok")
    val toks = Drift.tokenShift(a, b, "tok", alpha = 0.5, minCount = 5, k = 10)
      .select("token").as[String].collect().toSet
    assert(toks == Set("common")) // 'rare' (count 1) excluded from ranking
  }
}
