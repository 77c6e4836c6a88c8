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
