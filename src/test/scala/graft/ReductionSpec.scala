package graft

import org.apache.spark.sql.functions._
import graft.operators.Reduction

/** J4/J5/A3/A4/W2 — the semantic heart (SURVEY §7.4 risk #1): hand-traced
  * fixtures for the interpolated as-of reference join, including every edge
  * regime of trx/dataReduction.py:15-85.
  */
class ReductionSpec extends SparkSpec {
  import spark.implicits._

  /** (image_idx, delay, q_bin, i) — refs are delay == 0. */
  private def curves(rows: (Int, Double, Int, Double)*) =
    rows.toDF("image_idx", "delay", "q_bin", "i")
      .withColumn("err", lit(1.0))

  private def interp(rows: (Int, Double, Int, Double)*): Map[Int, Option[Double]] = {
    val out = Reduction.interpolateReferences(
      Reduction.tagReferences(curves(rows: _*)))
    out.select("image_idx", "i_ref").collect()
      .map(r => r.getInt(0) ->
        Option(r.getAs[java.lang.Double]("i_ref")).map(_.toDouble)).toMap
  }

  private implicit class OptApprox(o: Option[Double]) {
    def ~=(v: Double): Boolean = o.exists(x => approx(x, v))
  }

  test("non-ref shot interpolates linearly between surrounding refs") {
    // refs at idx 0 (i=10) and idx 4 (i=20); shot at idx 1 → 10 + 10*(1/4)
    val m = interp((0, 0.0, 1, 10.0), (1, 1.0, 1, 5.0),
      (2, 1.0, 1, 6.0), (4, 0.0, 1, 20.0))
    assert(m(1) ~= 12.5)
    assert(m(2) ~= 15.0)
  }

  test("shots before first ref and after last ref clamp") {
    val m = interp((0, 1.0, 1, 5.0), (1, 0.0, 1, 10.0),
      (3, 0.0, 1, 20.0), (5, 1.0, 1, 7.0))
    assert(m(0) ~= 10.0) // clamp to first ref
    assert(m(5) ~= 20.0) // clamp to last ref
  }

  test("a reference's own reference excludes itself (interpolates neighbours)") {
    // refs at 0 (10), 2 (14), 4 (30): ref@2 must interpolate 0→4 = 20,
    // not use itself.
    val m = interp((0, 0.0, 1, 10.0), (2, 0.0, 1, 14.0), (4, 0.0, 1, 30.0))
    assert(m(2) ~= 20.0)
    assert(m(0) ~= 14.0) // first ref clamps forward to next ref (2)
    assert(m(4) ~= 14.0) // last ref clamps backward to prev ref (2)
  }

  test("single reference: everything uses it verbatim") {
    val m = interp((0, 1.0, 1, 5.0), (1, 0.0, 1, 10.0), (2, 1.0, 1, 7.0))
    assert(m(0) ~= 10.0)
    assert(m(2) ~= 10.0)
    // the lone ref itself also uses its own curve (py:50-52) — the strict
    // frames alone would leave it null
    assert(m(1) ~= 10.0)
  }

  test("interpolation matches a brute-force reference on random inputs") {
    val rnd = new scala.util.Random(42)
    val delays = Seq(0.0, 1e-9, 2e-9)
    val rows = for {
      q <- 1 to 4
      idx <- 0 until 60
      if rnd.nextDouble() > 0.2 // ragged: not every (bin, idx) present
    } yield (idx, delays(rnd.nextInt(delays.size)), q, rnd.nextDouble() * 100)

    // brute force, per q_bin: scan for nearest refs, mirror the clamping
    // and self-exclusion rules of trx/dataReduction.py:15-85
    def brute(part: Seq[(Int, Double, Int, Double)]): Map[Int, Option[Double]] = {
      val sorted = part.sortBy(_._1)
      val refs = sorted.filter(_._2 == 0.0)
      sorted.map { case (idx, delay, _, _) =>
        val usable = if (delay == 0.0) refs.filterNot(_._1 == idx) else refs
        val before = usable.filter(_._1 < idx).lastOption
        val after = usable.find(_._1 > idx)
        val v = (before, after) match {
          // a ref with no OTHER refs uses its own curve (py:50-52);
          // a non-ref with no refs at all has no reference
          case (None, None) => if (delay == 0.0) Some(part.find(_._1 == idx).get._4) else None
          case (Some(b), None) => Some(b._4)
          case (None, Some(a)) => Some(a._4)
          case (Some(b), Some(a)) =>
            Some(b._4 + (a._4 - b._4) * (idx - b._1).toDouble / (a._1 - b._1))
        }
        idx -> v
      }.toMap
    }

    val got = Reduction.interpolateReferences(
      Reduction.tagReferences(rows.toDF("image_idx", "delay", "q_bin", "i")))
      .select("q_bin", "image_idx", "i_ref").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        Option(r.getAs[java.lang.Double]("i_ref")).map(_.toDouble)).toMap

    rows.groupBy(_._3).foreach { case (q, part) =>
      val expected = brute(part)
      part.foreach { case (idx, _, _, _) =>
        val (g, e) = (got((q, idx)), expected(idx))
        (g, e) match {
          case (Some(a), Some(b)) => assert(approx(a, b), s"bin $q idx $idx: $a vs $b")
          case (None, None) =>
          case _ => fail(s"bin $q idx $idx: $g vs $e")
        }
      }
    }
  }

  test("tagReferences excludes the laser-off sentinel from min()") {
    val df = curves((0, -10.0, 1, 1.0), (1, 2.0, 1, 1.0), (2, 5.0, 1, 1.0))
    val refs = Reduction.tagReferences(df)
      .filter($"is_ref").select("image_idx").as[Int].collect()
    assert(refs.toSeq == Seq(1)) // min over {2,5}, not -10
  }

  test("tagReferences with explicit refDelay uses atol matching") {
    val df = curves((0, 1.0, 1, 1.0), (1, 2.0, 1, 1.0))
    val refs = Reduction.tagReferences(df, refDelay = Some(2.0))
      .filter($"is_ref").select("image_idx").as[Int].collect()
    assert(refs.toSeq == Seq(1))
  }

  test("thinReferences keeps every 2nd reference repetition, all non-refs") {
    val df = curves((0, 0.0, 1, 1.0), (1, 0.0, 1, 1.0), (2, 0.0, 1, 1.0),
      (3, 0.0, 1, 1.0), (4, 1.0, 1, 1.0), (5, 1.0, 1, 1.0))
    val kept = Reduction.thinReferences(Reduction.tagReferences(df))
      .select("image_idx").as[Int].collect().sorted
    assert(kept.toSeq == Seq(0, 2, 4, 5)) // refs 0,2 (rows 1,3 thinned)
  }

  test("averageScanPoints: mean, population noise, error-of-mean") {
    val diffs = Seq((0, 1.0, 1, 1.0), (1, 1.0, 1, 3.0), (2, 1.0, 1, 5.0))
      .toDF("image_idx", "delay", "q_bin", "diff")
    val r = Reduction.averageScanPoints(diffs).collect()(0)
    assert(approx(r.getAs[Double]("diff_av"), 3.0))
    val popSd = math.sqrt(8.0 / 3.0) // np.nanstd ddof=0, as the reference
    assert(approx(r.getAs[Double]("noise"), popSd))
    assert(r.getAs[Long]("n_rep") == 3)
    assert(approx(r.getAs[Double]("err"), popSd / math.sqrt(3.0)))
  }

  test("averageScanPoints with keepCol: center over kept, noise over all") {
    // 4 ref reps (1,2,3,4) at one delay: thinning keeps reps 1,3
    val diffs = Seq((0, 0.0, 1, 1.0, true), (1, 0.0, 1, 2.0, true),
      (2, 0.0, 1, 3.0, true), (3, 0.0, 1, 4.0, true))
      .toDF("image_idx", "delay", "q_bin", "diff", "is_ref")
    val marked = Reduction.markThinnedReferences(diffs)
    val r = Reduction.averageScanPoints(marked,
      keepCol = Some($"_keep")).collect()(0)
    assert(approx(r.getAs[Double]("diff_av"), 2.0)) // mean of {1, 3}
    val popSd = math.sqrt(1.25) // over ALL of {1,2,3,4}
    assert(approx(r.getAs[Double]("noise"), popSd))
    assert(r.getAs[Long]("n_rep") == 2)
    assert(approx(r.getAs[Double]("err"), popSd / 2.0)) // /sqrt(4), unthinned
  }


  test("averageScanPoints median variant") {
    val diffs = Seq((0, 1.0, 1, 1.0), (1, 1.0, 1, 2.0), (2, 1.0, 1, 100.0))
      .toDF("image_idx", "delay", "q_bin", "diff")
    val r = Reduction.averageScanPoints(diffs, useMedian = true).collect()(0)
    assert(approx(r.getAs[Double]("diff_av"), 2.0))
  }

  test("chi2PerRepetition matches hand computation") {
    // one delay, one q_bin, diffs 1,3 → mean 2, pop noise 1.0;
    // chi2 per image = ((d-2)/1)^2 / 1 = 1.0
    val diffs = Seq((0, 1.0, 1, 1.0), (1, 1.0, 1, 3.0))
      .toDF("image_idx", "delay", "q_bin", "diff")
    val m = Reduction.chi2PerRepetition(diffs).collect()
      .map(r => r.getAs[Int]("image_idx") -> r.getAs[Double]("chi2_0")).toMap
    assert(approx(m(0), 1.0) && approx(m(1), 1.0))
  }

  test("diffSignal ratio mode") {
    val df = Seq((0, 1.0, 1, 6.0, 2.0)).toDF("image_idx", "delay", "q_bin", "i", "i_ref")
    assert(approx(Reduction.diffSignal(df, useRatio = true)
      .select("diff").as[Double].collect()(0), 3.0))
  }
}
