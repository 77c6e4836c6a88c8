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
    // missing element: the error names it and the remedy
    val e1 = intercept[IllegalArgumentException](
      ScatteringFunctions.formulaWeights("UO2"))
    assert(e1.getMessage.contains("element U") &&
      e1.getMessage.contains("loadElementOverrides"))
    // unknown element without a weight column: named
    val e2 = intercept[IllegalArgumentException](
      ScatteringFunctions.parseElementTable("U,10.0,100.0"))
    assert(e2.getMessage.contains("U") && e2.getMessage.contains("weight"))
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
