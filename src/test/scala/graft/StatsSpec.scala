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
