package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.{NumericFunctions, ScatteringFunctions}
import graft.operators.{Azav, Masks}
import graft.sources.LogReader

/** A7/G7/G9/G14/G15/M2/S8 — late-inventory operators. */
class ExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("snapToGrid snaps to nearest grid value (ties go up)") {
    val df = Seq(0.0, 2.9, 3.0, 7.4, 40.0, 99.0).toDF("v")
    val got = df.select(NumericFunctions.snapToGrid($"v",
      Seq(1.0, 5.0, 10.0, 20.0, 35.0, 50.0)).as("s"))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.0, 5.0, 5.0, 35.0, 50.0))
  }

  test("snapEquispaced and rebin") {
    val df = Seq(0.26, 0.74).toDF("v")
    assert(df.select(NumericFunctions.snapEquispaced($"v", 0.0, 0.5).as("s"))
      .as[Double].collect().toSeq == Seq(0.5, 0.5))
    val data = Seq((0.1, 1.0), (0.15, 3.0), (0.9, 10.0)).toDF("x", "y")
    val binned = NumericFunctions.rebin(data, "x", "y", 0.0, 1.0, 2).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Double]("y_mean")).toMap
    assert(approx(binned(0), 2.0) && approx(binned(1), 10.0))
  }

  test("A7 quick-look average with delay selection and normalization") {
    val curves = Seq(
      ("a", 0.0, 1, 1.0, 2.0), ("a", 0.0, 2, 2.0, 2.0),
      ("b", 1.0, 1, 10.0, 2.0), ("b", 1.0, 2, 20.0, 2.0))
      .toDF("image_id", "delay", "q_bin", "i", "err")
      .withColumn("q", $"q_bin".cast("double"))
    val av = Azav.average(curves, delaySelect = Some($"delay" === 1.0),
      normRange = Some((1.0, 2.0)))
      .collect().map(r => r.getAs[Int]("q_bin") -> r.getAs[Double]("i_av")).toMap
    // image b monitor = avg(10,20)=15 → normalized 2/3, 4/3
    assert(approx(av(1), 10.0 / 15.0) && approx(av(2), 20.0 / 15.0))
  }

  test("M2 mask table anti-join removes listed coordinates") {
    val px = Seq((0, 0, 1.0), (1, 1, 2.0), (2, 2, 3.0)).toDF("x", "y", "intensity")
    val mask = Seq((1, 1)).toDF("x", "y")
    val kept = Masks.applyMaskTable(px, mask).select("intensity").as[Double].collect()
    assert(kept.toSet == Set(1.0, 3.0))
  }

  test("G7 absorption corrections: limits and monotonicity") {
    def one(c: org.apache.spark.sql.Column): Double =
      Seq(1).toDF("_").select(c.as("v")).collect()(0).getDouble(0)
    // normal incidence: phosphor correction = 1 - exp(-t/Λ)
    assert(approx(one(ScatteringFunctions.phosphorCorrection(lit(0.0), lit(0.1), lit(2.0))),
      1.0 - math.exp(-0.05), 1e-12))
    // sheet correction → 1 at 2θ = 0
    assert(approx(one(ScatteringFunctions.liquidSheetAbsorptionCorrection(
      lit(0.0), lit(0.1), lit(2.0))), 1.0, 1e-12))
    // more photons per coulomb at higher energy
    val n1 = one(ScatteringFunctions.chargeToPhoton(lit(1e-12), lit(10.0)))
    val n2 = one(ScatteringFunctions.chargeToPhoton(lit(1e-12), lit(20.0)))
    assert(n1 > 0 && approx(n2, n1 / 2, n1 * 1e-9))
  }

  test("G7 element-table override loader: a user CSV shifts a compound's " +
       "mu/rho, adds an unknown element (weight+density carried), beats " +
       "the built-in whole-table, and errors NAME the line/element") {
    import graft.functions.ScatteringFunctions
    def muAt(f: String, e: Double): Double = Seq(e).toDF("e")
      .select(ScatteringFunctions.massAttenuation(f, $"e").as("m"))
      .as[Double].head()
    val fe10 = muAt("Fe2O3", 10.0)
    try {
      // override Fe with a uniformly +10% table (same grid points)
      val feCsv = "element,energy_keV,mu_rho\n" +
        ScatteringFunctions.Elements("Fe").mu
          .map { case (e, m) => s"Fe,$e,${m * 1.1}" }.mkString("\n")
      ScatteringFunctions.loadElementOverrides(feCsv)
      val shifted = muAt("Fe2O3", 10.0)
      val wFe = ScatteringFunctions.formulaWeights("Fe2O3").toMap.apply("Fe")
      assert(approx(shifted - fe10, wFe * 170.6 * 0.1, 1e-6),
        s"override must shift the compound by w_Fe * 10%: $fe10 -> $shifted")
      // a single-element formula served from the override, not any
      // legacy path
      assert(approx(muAt("Fe", 10.0), 170.6 * 1.1, 1e-9))
      // an element the built-ins don't know, with weight and density
      ScatteringFunctions.loadElementOverrides(
        """# zirconium, user-measured grid
          |element,energy_keV,mu_rho,weight,density
          |Zr,10.0,69.0,91.224,6.52
          |Zr,20.0,10.5
          |Zr,30.0,3.3
          |""".stripMargin)
      assert(ScatteringFunctions.formulaWeights("ZrO2").nonEmpty)
      assert(approx(muAt("Zr", 10.0), 69.0, 1e-9))
      val lam = Seq(10.0).toDF("e")
        .select(ScatteringFunctions.attenuationLength("Zr", $"e").as("l"))
        .as[Double].head()
      assert(approx(lam, 0.01 / (69.0 * 6.52), 1e-12),
        "override density must feed attenuationLength")
    } finally ScatteringFunctions.clearElementOverrides()
    // cleared: back to the built-ins
    assert(approx(muAt("Fe2O3", 10.0), fe10, 1e-12))
    // missing element (beyond Z=92): the error names it and the remedy
    val e1 = intercept[IllegalArgumentException](
      ScatteringFunctions.formulaWeights("PuO2"))
    assert(e1.getMessage.contains("element Pu") &&
      e1.getMessage.contains("loadElementOverrides"))
    // unknown element without a weight column: named
    val e2 = intercept[IllegalArgumentException](
      ScatteringFunctions.parseElementTable("Pu,10.0,100.0"))
    assert(e2.getMessage.contains("Pu") && e2.getMessage.contains("weight"))
    // malformed line: line number and field named
    val e3 = intercept[IllegalArgumentException](
      ScatteringFunctions.parseElementTable("Fe,ten,1.0"))
    assert(e3.getMessage.contains("line 1") &&
      e3.getMessage.contains("energy_keV"))
  }

  test("G7 round-15 tabulated elements: Na/Mg/P/Mo/Ag/Sn/Ba resolve end " +
       "to end; in-grid K edges (Mo/Ag/Sn) and Ba's L edges jump in the " +
       "textbook bands; NaCl is now fully tabulated") {
    import graft.functions.ScatteringFunctions
    def muAt(f: String, e: Double): Double = Seq(e).toDF("e")
      .select(ScatteringFunctions.massAttenuation(f, $"e").as("m"))
      .as[Double].head()
    // K edges INSIDE the grid: two-sided, jumps in the 5-8x Z-band
    for ((el, edge, loJ, hiJ) <- Seq(("Mo", 20.0, 5.0, 7.0),
        ("Ag", 25.514, 4.5, 7.0), ("Sn", 29.2, 4.5, 7.0))) {
      val r = muAt(el, edge + 0.005) / muAt(el, edge - 0.005)
      assert(r > loJ && r < hiJ, s"$el K jump $r outside [$loJ,$hiJ]")
    }
    // Ba's L3 jump ~2.4
    val baL3 = muAt("Ba", 5.249) / muAt("Ba", 5.245)
    assert(baL3 > 2.0 && baL3 < 3.0, s"Ba L3 jump $baL3 outside [2,3]")
    // compounds across the additions resolve with known densities
    assert(muAt("NaCl", 10.0) > 0 && muAt("MgO", 10.0) > 0 &&
      muAt("BaTiO3", 10.0) > 0)
    // Na anchor consistent with the O-Al calibration (~3%)
    assert(math.abs(muAt("Na", 10.0) - 15.44) < 1e-9)
    val lamMo = Seq(17.479).toDF("e")
      .select(ScatteringFunctions.attenuationLength("Mo", $"e").as("l"))
      .as[Double].head()
    assert(lamMo > 0, "Mo bulk density must resolve")
  }

  test("G7 full periodic table: every element Z=1..92 resolves out of " +
       "the box, generated grids are structurally sound, and spot values " +
       "land on the published figures") {
    import graft.functions.{ElementTable, ScatteringFunctions}
    def muAt(f: String, e: Double): Double = Seq(e).toDF("e")
      .select(ScatteringFunctions.massAttenuation(f, $"e").as("m"))
      .as[Double].head()
    assert(ScatteringFunctions.tabulatedElements.size >= 92)
    ElementTable.data.foreach { d =>
      val info = ScatteringFunctions.elementInfo(d.symbol).get
      assert(info.mu.nonEmpty && info.mu.forall(_._2 > 0), d.symbol)
      assert(info.mu.map(_._1) == info.mu.map(_._1).sorted.distinct,
        s"${d.symbol}: grid energies must be strictly ascending")
      // every in-grid edge of a GENERATED grid is a two-sided
      // discontinuity, above > below (anchored grids keep their
      // historical shapes — some predate two-sided edges)
      if (ScatteringFunctions.GeneratedElements.contains(d.symbol))
        Seq(d.k, d.l1, d.l2, d.l3).filter(e => e > 5.02 && e < 29.98)
          .foreach { e =>
            val lo = info.mu.find(p => math.abs(p._1 - (e - 0.001)) < 5e-4)
            val hi = info.mu.find(p => math.abs(p._1 - (e + 0.001)) < 5e-4)
            assert(lo.nonEmpty && hi.nonEmpty,
              s"${d.symbol}: edge at $e keV has no two-sided points")
            val r = hi.get._2 / lo.get._2
            assert(r > 1.04 && r < 12,
              s"${d.symbol}: edge jump $r at $e keV outside (1.04, 12)")
          }
    }
    // spot checks against published XCOM figures (generated regions):
    // Zr and U bracket the well-anchored gaps, Be the low-Z extension
    val zr10 = muAt("Zr", 10.0); val u10 = muAt("U", 10.0)
    val be10 = muAt("Be", 10.0); val gd8 = muAt("Gd", 8.0)
    assert(zr10 > 58 && zr10 < 85, s"Zr@10keV $zr10 vs published ~72")
    assert(u10 > 150 && u10 < 215, s"U@10keV $u10 vs published ~179")
    assert(be10 > 0.5 && be10 < 0.8, s"Be@10keV $be10 vs published ~0.65")
    // Gd@8 keV sits 0.76 keV above its L3 edge — near-edge-top, so the
    // band is wide; the bound pins the edge-aligned Sn<->W bracket (the
    // r18 adjudication) against both the superseded Ba/Ce-family value
    // (~200, uniformly low) and any naive fixed-E blowup (~540)
    assert(gd8 > 260 && gd8 < 480, s"Gd@8keV $gd8 vs aligned-law ~365")
    // the verdict's named compounds compute end to end
    val zro2 = muAt("ZrO2", 10.0)
    assert(zro2 > 44 && zro2 < 66, s"ZrO2@10keV $zro2 vs published ~54")
    assert(muAt("C22H10N2O5", 10.0) > 0) // Kapton (anchored elements)
    assert(muAt("Gd2O3", 8.0) > 0 && muAt("LaB6", 10.0) > 0 &&
      muAt("UO2", 17.0) > 0)
    // single-element density rides into attenuationLength for generated
    // elements too (Zr bulk 6.52)
    val lamZr = Seq(10.0).toDF("e")
      .select(ScatteringFunctions.attenuationLength("Zr", $"e").as("l"))
      .as[Double].head()
    assert(math.abs(lamZr - 0.01 / (muAt("Zr", 10.0) * 6.52)) < 1e-12)
    // anchors always win over the generated table
    assert(ScatteringFunctions.elementInfo("Fe").get.mu ==
      ScatteringFunctions.Elements("Fe").mu)
  }

  test("G7 generation accuracy, measured: leave-one-out on well-anchored " +
       "elements reproduces the real anchor within 12% away from edges") {
    import graft.functions.{ElementTable, ScatteringFunctions}
    // uniform 12% everywhere: the r18 Ba/Ce adjudication removed the
    // inconsistent anchor family that used to drag Sn's leave-one-out
    // to ~30%, and the edge-aligned L-region method brings it to ~1-3%
    val tol = Map.empty[String, Double].withDefaultValue(0.12)
    for (el <- Seq("Mn", "Zn", "Mo", "Ag", "Sn", "P")) {
      val real = ScatteringFunctions.Elements(el)
      val gen = ElementTable.generate(ScatteringFunctions.Elements,
        exclude = Set(el))(el)
      val edges = {
        val d = ElementTable.bySymbol(el)
        Seq(d.k, d.l1, d.l2, d.l3)
      }
      def interp(grid: Seq[(Double, Double)], e: Double): Double = {
        if (e <= grid.head._1) return grid.head._2
        if (e >= grid.last._1) return grid.last._2
        val i = grid.lastIndexWhere(_._1 <= e)
        val (e1, m1) = grid(i); val (e2, m2) = grid(i + 1)
        def x(v: Double) = 1.0 / (v * v * v)
        m1 + (x(e) - x(e1)) * (m2 - m1) / (x(e2) - x(e1))
      }
      for (e <- Seq(5.0, 6.0, 8.0, 10.0, 15.0, 20.0, 30.0)
           if edges.forall(k => math.abs(k - e) > 1.0)) {
        val want = interp(real.mu, e)
        val got = interp(gen.mu, e)
        val rel = math.abs(got - want) / want
        assert(rel < tol(el),
          f"$el@$e%.0f keV: generated $got%.1f vs anchored $want%.1f " +
            f"(${rel * 100}%.1f%% off)")
      }
    }
  }

  test("S8 SPEC reader parses scans, labels, and motor snapshots") {
    val f = Files.createTempDirectory("spec").resolve("run.spec")
    Files.writeString(f,
      """#F run.spec
        |#O0 mot1 mot2
        |
        |#S 1 ascan
        |#P0 1.5 2.5
        |#L x  det
        |0.0 10.0
        |1.0 20.0
        |
        |#S 2 ascan
        |#P0 3.5 4.5
        |#L x  det
        |5.0 30.0
        |""".stripMargin)
    val (df, motors) = LogReader.readSpec(spark, f.toString)
    assert(df.columns.toSeq == Seq("scan", "x", "det"))
    assert(df.filter($"scan" === 1).count() == 2)
    assert(df.filter($"scan" === 2).select("det").collect()(0).getDouble(0) == 30.0)
    assert(motors(1) == Map("mot1" -> 1.5, "mot2" -> 2.5))
    assert(motors(2)("mot1") == 3.5)
  }

  test("G14/G15 — duration wrap and reprate parsing") {
    assert(LogReader.timesToDurationSec("23:30:00", "00:30:00") == 3600)
    assert(LogReader.timesToDurationSec("10:00:00", "10:00:30") == 30)
    assert(LogReader.readReprate(Seq("# time between pulses: 1 ms"))
      .exists(r => approx(r, 1000.0)))
    assert(LogReader.readReprate(Seq("# nothing here")).isEmpty)
  }
}
