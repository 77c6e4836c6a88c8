package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Generate
import graft.plans.RangeJoinRewriteRule

/** The injected optimizer rule: declarative point-in-interval joins
  * rewrite to the bucketized equi-join (plan shape + result equivalence),
  * guard rails hold (type/join-type gates, no re-fire on its own output,
  * empty intervals), and the conf gate scopes it.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def withWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(RangeJoinRewriteRule.WidthConf, w.toString)
    try body finally spark.conf.unset(RangeJoinRewriteRule.WidthConf)
  }

  private def points = (1L to 1000L).map(i => (i, i % 37 * 100L))
    .toDF("pid", "sec")
  private def intervals = Seq(
    (100L, 0L, 250L), (101L, 240L, 260L), (102L, 3000L, 3600L),
    (103L, 500L, 500L),   // empty
    (104L, 700L, 600L))   // inverted
    .toDF("iid", "lo", "hi")

  private def declarative = points.join(intervals,
    col("sec") >= col("lo") && col("sec") < col("hi"))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rewrites a declarative pure-range join into a bucket equi-join " +
       "with identical results (the BNLJ shape disappears)") {
    val off = declarative
    assert(off.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.isEmpty, "rule must not fire without the conf")
    assert(off.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "baseline pure-range join should be the nested-loop shape")
    val expected = pairs(off)
    assert(expected.nonEmpty, "fixture must produce matches")

    withWidth(100L) {
      val on = declarative
      val gens = on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }
      assert(gens.size == 1,
        s"expected exactly one interval explode, got ${gens.size}")
      assert(!on.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "rewritten plan must not nested-loop")
      assert(pairs(on) == expected,
        "rewrite changed the join result")
      // output schema untouched
      assert(on.columns.toSeq == off.columns.toSeq)
    }
  }

  test("empty and inverted intervals match nothing; bucket width does " +
       "not change the result") {
    val expected = pairs(declarative)
    assert(!expected.exists(p => p._2 == 103L || p._2 == 104L))
    Seq(7L, 100L, 1000L, 100000L).foreach { w =>
      withWidth(w) {
        assert(pairs(declarative) == expected, s"width $w changed results")
      }
    }
  }

  test("guard rails: equi-key range joins keep their keys and gain the " +
       "bucket; non-long types, non-inner joins pass through; no re-fire") {
    // with an equi key, the rewrite composes: original condition kept
    val keyedP = points.withColumn("k", col("pid") % 5)
    val keyedI = intervals.withColumn("k", col("iid") % 5)
    def keyed = keyedP.join(keyedI,
      keyedP("k") === keyedI("k") &&
        col("sec") >= col("lo") && col("sec") < col("hi"))
    val base = pairs(keyed)
    withWidth(100L) {
      val on = keyed
      assert(on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.size == 1,
        "rule must fire exactly once on an equi-key range join " +
          "(and never on its own output)")
      assert(pairs(on) == base)
    }
    // double ts column → not eligible
    withWidth(100L) {
      val d = points.withColumn("secd", col("sec").cast("double"))
        .join(intervals
          .withColumn("lod", col("lo").cast("double"))
          .withColumn("hid", col("hi").cast("double")),
          col("secd") >= col("lod") && col("secd") < col("hid"))
      assert(d.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty,
        "non-long bounds must pass through unrewritten")
    }
    // outer join → not eligible
    withWidth(100L) {
      val o = points.join(intervals,
        col("sec") >= col("lo") && col("sec") < col("hi"), "left_outer")
      assert(o.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty,
        "outer joins must pass through unrewritten")
    }
  }

  test("the rewritten plan agrees with the operator form") {
    val got = withWidth(250L)(pairs(declarative))
    val op = graft.operators.RangeJoin.pointInInterval(
        points, intervals, "sec", "lo", "hi", Nil, bucketWidth = 250L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == op, "rule and operator disagreed")
  }
}
