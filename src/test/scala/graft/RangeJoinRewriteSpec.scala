package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Generate
import graft.plans.RangeJoinRewriteRule

/** The injected optimizer rule: declarative point-in-interval joins
  * rewrite to the bucketized equi-join (plan shape + result equivalence),
  * guard rails hold (type/join-type gates, no re-fire on its own output,
  * empty intervals), and the conf gate scopes it.
  */
@SlowSuite
class RangeJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def withWidth[A](w: Long)(body: => A): A = withConf(w.toString)(body)

  private def withConf[A](v: String)(body: => A): A = {
    spark.conf.set(RangeJoinRewriteRule.WidthConf, v)
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
       "with identical results (the BNLJ shape disappears); 'off' " +
       "disables the rule entirely") {
    val (expected, offCols) = withConf("off") {
      val off = declarative
      assert(off.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty, "rule must not fire when off")
      assert(off.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "ungated pure-range join should be the nested-loop shape")
      (pairs(off), off.columns.toSeq)
    }
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
      assert(on.columns.toSeq == offCols)
    }
  }

  test("width-free fire: with NO conf set, the point-in-interval shape " +
       "rewrites anyway — the width is sampled from the interval side " +
       "(stored bound columns, no literal shift to infer from)") {
    assert(!spark.conf.getOption(RangeJoinRewriteRule.WidthConf).isDefined)
    val expected = withConf("off")(pairs(declarative))
    val on = declarative
    assert(on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.size == 1,
      "auto mode must fire without any conf")
    assert(!on.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "width-free rewritten plan must not nested-loop")
    assert(pairs(on) == expected, "auto-width rewrite changed the result")
  }

  test("width-free fire, static path: an interval built as lo + literal " +
       "carries its length in the plan and rewrites with no sampling " +
       "job and no conf") {
    // range()-backed source: a local-Seq fixture would be folded by
    // ConvertToLocalRelation, evaluating the shift away before the rule
    // ever sees it (parquet-backed plans keep the projection symbolic,
    // which is what production queries look like)
    val shifted = spark.range(1, 40)
      .select(col("id").as("iid"), (col("id") % 37L * 100L).as("lo"))
      .select(col("iid"), col("lo"), (col("lo") + 300L).as("hi"))
    def decl = points.join(shifted,
      col("sec") >= col("lo") && col("sec") < col("hi"))
    val expected = withConf("off")(pairs(decl))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val on = decl
    assert(on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.size == 1, "static-shift width must fire")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"static inference must not run a sampling job ($before -> $after)")
    assert(pairs(on) == expected)
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
    // double bounds: eligible since the coarsening is floor-monotone —
    // must fire and agree with the ungated result
    def dJoin = points.withColumn("secd", col("sec").cast("double"))
      .join(intervals
        .withColumn("lod", col("lo").cast("double"))
        .withColumn("hid", col("hi").cast("double")),
        col("secd") >= col("lod") && col("secd") < col("hid"))
    val dExpected = withConf("off")(pairs(dJoin))
    withWidth(100L) {
      val d = dJoin
      assert(d.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.size == 1,
        "double bounds must fire the rewrite")
      assert(pairs(d) == dExpected, "double rewrite changed the result")
    }
    // string bounds → not eligible
    withWidth(100L) {
      val sJoin = points.withColumn("secs", col("sec").cast("string"))
        .join(intervals
          .withColumn("los", col("lo").cast("string"))
          .withColumn("his", col("hi").cast("string")),
          col("secs") >= col("los") && col("secs") < col("his"))
      assert(sJoin.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty,
        "non-bucketable bounds must pass through unrewritten")
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

  test("timestamp- and integer-typed range joins rewrite too: bucketing " +
       "is a monotone coarsening, the residual keeps exactness " +
       "(sub-second timestamps included)") {
    // timestamps with sub-second parts: bucket grain is SECONDS, so the
    // inclusive end bucket and the exact residual must cooperate
    val pts = points.withColumn("ts",
      timestamp_seconds(col("sec").cast("double") + 0.25))
    val ivs = intervals
      .withColumn("lo_ts", timestamp_seconds(col("lo").cast("double") + 0.5))
      .withColumn("hi_ts", timestamp_seconds(col("hi").cast("double") + 0.5))
    def declTs = pts.join(ivs,
      col("ts") >= col("lo_ts") && col("ts") < col("hi_ts"))
    val expectedTs = pairs(declTs)
    assert(expectedTs.nonEmpty)
    withWidth(100L) {
      val on = declTs
      assert(on.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.size == 1, "timestamp bounds must fire the rewrite")
      assert(!on.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(pairs(on) == expectedTs,
        "timestamp rewrite changed the result")
    }
    // integer bounds
    val pInt = points.withColumn("seci", col("sec").cast("int"))
    val iInt = intervals.withColumn("loi", col("lo").cast("int"))
      .withColumn("hii", col("hi").cast("int"))
    def declInt = pInt.join(iInt,
      col("seci") >= col("loi") && col("seci") < col("hii"))
    val expectedInt = pairs(declInt)
    withWidth(100L) {
      val on = declInt
      assert(!on.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "integer bounds must fire the rewrite")
      assert(pairs(on) == expectedInt, "integer rewrite changed the result")
    }
  }

  // ---------------------------------------------- interval-overlap pattern

  private def lIntervals = (1L to 400L)
    .map(i => (i, i * 13 % 97 * 50L, i * 13 % 97 * 50L + i % 7 * 120L))
    .toDF("lid", "ls", "le")   // i % 7 == 0 → empty interval
  private def rIntervals = (1L to 300L)
    .map(i => (i, i * 29 % 83 * 60L, i * 29 % 83 * 60L + 200L))
    .toDF("rid", "rs", "re")

  private def declOverlap = lIntervals.join(rIntervals,
    col("ls") < col("re") && col("rs") < col("le"))

  private def opairs(df: org.apache.spark.sql.DataFrame) =
    df.select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rewrites a declarative interval-overlap join into the bucketized " +
       "equi-join: BNLJ disappears, results identical, exactly one row " +
       "per overlapping pair across widths") {
    val off = declOverlap
    assert(off.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "baseline overlap join should be the nested-loop shape")
    val expected = opairs(off)
    assert(expected.nonEmpty, "fixture must produce matches")

    Seq(50L, 130L, 1000L).foreach { w =>
      withWidth(w) {
        val on = declOverlap
        assert(!on.queryExecution.executedPlan.toString
          .contains("BroadcastNestedLoopJoin"),
          s"width $w: rewritten overlap plan must not nested-loop")
        assert(opairs(on) == expected, s"width $w changed the pair set")
        // exactly-one-row-per-pair: the first-overlap-bucket filter must
        // dedup without a distinct
        val cnt = on.groupBy("lid", "rid").count()
          .filter(col("count") > 1).count()
        assert(cnt == 0, s"width $w emitted duplicate pairs")
        assert(on.columns.toSeq == off.columns.toSeq)
      }
    }
  }

  test("overlap rewrite preserves raw-predicate semantics for empty and " +
       "inverted intervals (the degenerate rows reduce to point probes)") {
    // left row 1: inverted interval [500, 100); row 3: empty [700, 700).
    // The raw predicate `ls < re && rs < le` can STILL hold for both
    // (rs < le <= ls < re), and a sound rule must keep the pairs a naive
    // interval operator would silently drop
    val l = Seq((1L, 500L, 100L), (2L, 50L, 60L), (3L, 700L, 700L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 0L, 1000L), (11L, 55L, 58L), (12L, 699L, 701L))
      .toDF("rid", "rs", "re")
    def decl = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
    val expected = opairs(decl)
    // sanity: the fixture exercises every leg — valid×valid pairs,
    // inverted-left pairs, and empty-left pairs
    assert(expected.contains((1L, 10L)), "inverted-left pair must match")
    assert(expected.contains((2L, 10L)) && expected.contains((2L, 11L)))
    assert(expected.contains((3L, 10L)) && expected.contains((3L, 12L)),
      "empty-interval rows that satisfy the raw predicate must match")
    assert(expected == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L),
      (3L, 12L)), s"unexpected baseline pair set $expected")
    Seq(64L, 500L).foreach { w =>
      withWidth(w) {
        assert(opairs(decl) == expected,
          s"width $w dropped or invented degenerate-interval pairs")
      }
    }
  }

  test("open point-in-range (lo < x AND x < hi) routes through the " +
       "overlap pattern's point-probe leg with identical results") {
    def decl = points.join(intervals,
      col("lo") < col("sec") && col("sec") < col("hi"))
    val expected = pairs(decl)
    assert(expected.nonEmpty)
    withWidth(100L) {
      val on = decl
      assert(!on.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "open point-in-range must not nested-loop under the rule")
      assert(pairs(on) == expected, "point-probe leg changed the result")
    }
  }

  test("overlap rewrite agrees with the operator form on well-formed " +
       "intervals and fires under an equi key") {
    val keyedL = lIntervals.filter(col("le") > col("ls"))
      .withColumn("k", col("lid") % 3)
    val keyedR = rIntervals.withColumn("k", col("rid") % 3)
    def keyed = keyedL.join(keyedR,
      keyedL("k") === keyedR("k") &&
        col("ls") < col("re") && col("rs") < col("le"))
    val base = opairs(keyed)
    withWidth(100L) {
      val on = keyed
      assert(!on.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(opairs(on) == base)
    }
    val op = graft.operators.RangeJoin.intervalOverlap(
        keyedL, keyedR, "ls", "le", "rs", "re", Seq("k"),
        bucketWidth = 100L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base == op, "rule and operator disagreed on well-formed input")
  }

  test("mixed-type overlap bounds (Long pair + Int pair) must not fire: " +
       "each conjunct is internally consistent but the four bounds don't " +
       "share a type, and a rewrite would build invalid mixed-type " +
       "Catalyst — the query must still run and keep its results") {
    val l = Seq((1L, 10L, 100), (2L, 500L, 2))
      .toDF("lid", "ls", "le")          // ls: Long, le: Int
    val r = Seq((10L, 5, 50L), (11L, 90, 600L))
      .toDF("rid", "rs", "re")          // rs: Int, re: Long
    def decl = l.join(r,
      col("ls") < col("re") && col("rs") < col("le"))
    val expected = opairs(decl)
    assert(expected.nonEmpty, "fixture must produce matches")
    withWidth(64L) {
      val on = decl
      assert(on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty,
        "mixed-type overlap pattern must not be rewritten")
      assert(opairs(on) == expected,
        "gated mixed-type join changed its results")
    }
  }

  test("double-typed range join with fractional bounds fires width-free " +
       "and keeps exact residual semantics") {
    val pts = (1L to 500L).map(i => (i, i % 37 * 100.0 + i % 3 * 0.25))
      .toDF("pid", "secd")
    val ivs = Seq((100L, 0.5, 250.25), (101L, 240.0, 260.75),
      (102L, 3000.0, 3600.5), (103L, 500.0, 500.0))
      .toDF("iid", "lod", "hid")
    def decl = pts.join(ivs,
      col("secd") >= col("lod") && col("secd") < col("hid"))
    val expected = withConf("off")(pairs(decl))
    assert(expected.nonEmpty)
    val on = decl
    assert(on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.size == 1,
      "double bounds must fire width-free")
    assert(!on.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(pairs(on) == expected, "double auto rewrite changed the result")
  }

  test("non-finite double interval bounds refuse the rewrite: a [lo, NaN) " +
       "interval matches unboundedly, so only the nested-loop plan is " +
       "correct — and the query must still answer right") {
    val pts = Seq((1L, 10.0), (2L, 1e6), (3L, -5.0)).toDF("pid", "secd")
    val ivs = Seq((100L, 0.0, 20.0), (101L, 5.0, Double.NaN),
      (102L, Double.NegativeInfinity, 0.0)).toDF("iid", "lod", "hid")
    def decl = pts.join(ivs,
      col("secd") >= col("lod") && col("secd") < col("hid"))
    val expected = withConf("off")(pairs(decl))
    // fixture sanity: the NaN-bounded interval matches every point >= 5
    // (NaN compares greatest), the -inf-start interval matches below 0
    assert(expected == Set((1L, 100L), (1L, 101L), (2L, 101L),
      (3L, 102L)), s"unexpected baseline $expected")
    val on = decl
    assert(on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.isEmpty,
      "non-finite interval bounds must refuse the rewrite")
    assert(pairs(on) == expected)
  }

  test("DATE-typed range join fires (epoch-day bucket grain via " +
       "UnixDate) and keeps exact residual semantics") {
    val pts = spark.range(0L, 200L).toDF("pid")
      .withColumn("d", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("pid") * 7 % 365).cast("int")))
    val ivs = spark.range(0L, 20L).toDF("iid")
      .withColumn("lo", date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("iid") * 17 % 300).cast("int")))
      .withColumn("hi", date_add(col("lo"), 14))
    def decl = pts.join(ivs, col("d") >= col("lo") && col("d") < col("hi"))
    def prs = decl.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = withConf("off")(prs)
    assert(expected.nonEmpty, "date fixture must produce matches")
    val on = decl
    assert(on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.size == 1,
      "date-typed range join must rewrite (auto width)")
    assert(!on.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(prs == expected, "date rewrite changed the result")
  }

  test("FIXED width runs the double-safety statistics too: NaN bounds " +
       "refuse the rewrite (floor(NaN)=0 — silent wrong buckets, lost " +
       "matches), saturating magnitudes refuse (floor saturates at " +
       "±Long.MaxValue), finite well-scaled bounds still fire — and " +
       "every variant answers exactly like the nested-loop baseline") {
    val pts = Seq((1L, 10.0), (2L, 1e6), (3L, -5.0)).toDF("pid", "secd")
    def decl(ivs: org.apache.spark.sql.DataFrame) = pts.join(ivs,
      col("secd") >= col("lod") && col("secd") < col("hid"))

    val nan = Seq((100L, 0.0, 20.0), (101L, 5.0, Double.NaN))
      .toDF("iid", "lod", "hid")
    val expNan = withConf("off")(pairs(decl(nan)))
    assert(expNan.contains((2L, 101L)),
      "the [5, NaN) interval must match the high point in the baseline")
    withWidth(60L) {
      val on = decl(nan)
      assert(on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty,
        "fixed width must refuse NaN interval bounds")
      assert(pairs(on) == expNan, "refusal changed the result")
    }

    val sat = Seq((100L, 0.0, 20.0), (102L, 1e300, 2e300))
      .toDF("iid", "lod", "hid")
    val expSat = withConf("off")(pairs(decl(sat)))
    withWidth(60L) {
      val on = decl(sat)
      assert(on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.isEmpty,
        "fixed width must refuse bucket-saturating bounds")
      assert(pairs(on) == expSat, "refusal changed the result")
    }
    // auto mode, unlike fixed, derives a PROPORTIONAL width from the
    // sampled lengths (fractional, unclamped Double widths): the huge-
    // but-proportional fixture buckets near ±1 and fires SAFELY — the
    // pre-fractional rule clamped the width to the long range and had
    // to refuse it
    val autoSat = decl(sat)
    assert(autoSat.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.nonEmpty,
      "proportional bounds must fire under auto's sampled double width")
    assert(pairs(autoSat) == expSat,
      "proportional-width rewrite changed the result")
    // the GENUINE saturation shape — astronomic magnitude with a SMALL
    // typical length, so the sampled width stays small and |bound|/w
    // would saturate a long bucket — still refuses through the
    // magnitude statistic
    val satSmall = ((1L to 9L).map(i =>
        (100L + i, i * 10.0, i * 10.0 + 20.0)) :+
      (110L, 1e300, 1.5e300)).toDF("iid", "lod", "hid")
    val expSmall = withConf("off")(pairs(decl(satSmall)))
    val autoSmall = decl(satSmall)
    assert(autoSmall.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.isEmpty,
      "auto mode must refuse bucket-saturating bounds")
    assert(pairs(autoSmall) == expSmall)

    val good = Seq((100L, 0.0, 20.0), (103L, 100.0, 160.0))
      .toDF("iid", "lod", "hid")
    val expGood = withConf("off")(pairs(decl(good)))
    withWidth(60L) {
      val on = decl(good)
      assert(on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.size == 1,
        "well-behaved double bounds must still fire under fixed width")
      assert(pairs(on) == expGood)
    }
  }

  test("auto mode inherits the multi-resolution skew bound: an " +
       "outlier-length interval in a declaratively-stated join routes " +
       "to a coarser level instead of exploding (the single-level " +
       "explosion would be a billion-element sequence), results equal " +
       "the nested-loop baseline") {
    val pts = (1L to 300L).map(i => (i, i * 317 % 40000 * 60L))
      .toDF("pid", "sec")
    // session-scale intervals (the sampled width lands near 300) plus a
    // 10^9-length outlier: level 0 capacity is ~width*256, so the
    // outlier forces a multi-level plan
    val ivs = ((1L to 150L).map(i =>
        (i, i * 37 % 500 * 60L, i * 37 % 500 * 60L + i % 5 * 90L + 1L)) ++
      Seq((900L, 5000L, 5000L + 1000000000L)))
      .toDF("iid", "lo", "hi")
    def decl = pts.join(ivs,
      col("sec") >= col("lo") && col("sec") < col("hi"))
    val expected = withConf("off")(pairs(decl))
    assert(expected.exists(_._2 == 900L),
      "the outlier interval must actually match points")
    val on = decl
    val gens = on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }
    assert(gens.size == 2,
      s"multi-level plan must explode points over levels AND intervals " +
        s"over buckets, got ${gens.size} Generates")
    assert(!on.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(pairs(on) == expected,
      "multi-level auto rewrite changed the result")
    // a fixed width keeps the expert single-level plan (and would crash
    // on this data with a tiny width — the conf is the opt-out)
    withWidth(1000000000L) {
      val fixed = decl
      assert(fixed.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.size == 1,
        "fixed width must keep the classic single-level plan")
      assert(pairs(fixed) == expected)
    }
  }

  test("a non-deterministic interval side refuses the sampled auto " +
       "rewrite (the sampled statistics would describe a different " +
       "dataset than the join executes over) — the query still runs") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // rand() projection over a LocalRelation into materialized — and thus
    // deterministic — values, which the sampler may legitimately sample
    val ivs = spark.range(0L, 40L).toDF("iid")
      .withColumn("lo2", (rand(7) * 3000).cast("long"))
      .withColumn("hi2", col("lo2") + 100L +
        (rand(11) * 50).cast("long"))
    def decl = points.join(ivs,
      col("sec") >= col("lo2") && col("sec") < col("hi2"))
    val on = decl
    assert(on.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.isEmpty,
      "non-deterministic interval bounds must not sample-rewrite")
    assert(on.count() >= 0L, "the unrewritten join must still run")
    // an explicit width is the user's assertion that the bounds are
    // well-behaved — the fixed path still fires
    withWidth(100L) {
      assert(decl.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.size == 1,
        "fixed width must fire regardless of determinism")
    }
  }

  test("overlap shape is opt-in: silent with no conf, fires under an " +
       "explicit 'auto' with a sampled width") {
    val silent = declOverlap
    assert(silent.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.isEmpty,
      "two-strict-inequality shape must not fire without an explicit conf")
    val expected = opairs(silent)
    withConf("auto") {
      val on = declOverlap
      assert(on.queryExecution.optimizedPlan.collect {
        case g: Generate => g }.nonEmpty,
        "explicit auto must fire the overlap rewrite")
      assert(!on.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(opairs(on) == expected,
        "sampled-width overlap rewrite changed the result")
    }
  }

  test("opt-in stats cache: with a TTL set, re-planning the SAME join " +
       "runs NO second sampling job; the default stays uncached and the " +
       "results are identical either way") {
    // opaque interval side (checkpoint) so the width must be SAMPLED
    val ivs = intervals.localCheckpoint(true)
    def decl = points.join(ivs,
      col("sec") >= col("lo") && col("sec") < col("hi"))
    val expected = withConf("off")(pairs(decl))
    def jobs(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // default: each optimization pays its own sampling job
    val j0 = jobs()
    decl.queryExecution.optimizedPlan
    val j1 = jobs()
    assert(j1 > j0, "uncached sampling must run a planning job")
    decl.queryExecution.optimizedPlan
    assert(jobs() > j1,
      "default (no TTL) must re-sample on every optimization")
    // TTL set: first plan samples and fills, the second is free
    spark.conf.set(RangeJoinRewriteRule.StatsCacheConf, "60000")
    try {
      val k0 = jobs()
      val first = decl
      first.queryExecution.optimizedPlan
      val k1 = jobs()
      assert(k1 > k0, "first cached plan still samples once")
      val second = decl
      second.queryExecution.optimizedPlan
      assert(jobs() == k1,
        "second optimization of the same join must hit the stats cache")
      assert(RangeJoinRewriteRule.statsCacheSize >= 1)
      assert(pairs(second) == expected, "cached width changed the result")
    } finally spark.conf.unset(RangeJoinRewriteRule.StatsCacheConf)
  }

  test("interval_overlap marker fires WIDTH-FREE with no conf set — the " +
       "three-leg rewrite, no BNLJ, results identical to the predicate " +
       "baseline; the swapped argument order and the degenerate legs " +
       "hold; an unrewritable marker join fails loudly") {
    assert(!spark.conf.getOption(RangeJoinRewriteRule.WidthConf).isDefined,
      "this test is about the conf-free path")
    val expected = opairs(declOverlap) // silent predicate baseline
    val marked = lIntervals.join(rIntervals,
      expr("interval_overlap(ls, le, rs, re)"))
    assert(marked.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.nonEmpty,
      "the marker must fire the overlap rewrite with NO conf")
    assert(!marked.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "marker rewrite must not nested-loop")
    assert(opairs(marked) == expected,
      "marker rewrite changed the result (incl. degenerate intervals)")
    // argument order is side-normalized: stating the RIGHT pair first
    // is the same join
    val swapped = lIntervals.join(rIntervals,
      expr("interval_overlap(rs, re, ls, le)"))
    assert(opairs(swapped) == expected, "swapped marker order diverged")
    // extra equi conjuncts ride along as residual
    val keyed = lIntervals.withColumn("k", col("lid") % 5)
      .join(rIntervals.withColumn("k2", col("rid") % 5),
        col("k") === col("k2") &&
          expr("interval_overlap(ls, le, rs, re)"))
    val keyedExp = withConf("off") {
      opairs(lIntervals.withColumn("k", col("lid") % 5)
        .join(rIntervals.withColumn("k2", col("rid") % 5),
          col("k") === col("k2") && col("ls") < col("re") &&
            col("rs") < col("le")))
    }
    assert(opairs(keyed) == keyedExp, "keyed marker join diverged")
    // unrewritable shape (bounds mixed across sides) leaves the
    // Unevaluable marker in the plan → loud failure, never a silent scan
    val bad = lIntervals.join(rIntervals,
      expr("interval_overlap(ls, re, rs, le)"))
    val err = intercept[Exception](bad.collect())
    assert(err.getMessage != null)
  }

  test("interval_overlap marker in a LEFT OUTER join: unmatched left " +
       "rows keep null right columns, matched rows equal the inner " +
       "marker join, no BNLJ, duplicates preserve multiplicity") {
    assert(!spark.conf.getOption(RangeJoinRewriteRule.WidthConf).isDefined)
    // guaranteed-unmatched left rows: far beyond every right interval
    // (one well-formed, one empty — the empty one can't even point-probe)
    val lOuter = lIntervals.unionAll(Seq(
      (999L, 100000L, 100100L), (998L, 200000L, 200000L))
      .toDF("lid", "ls", "le"))
    // silent left-outer predicate baseline (BNLJ, but exact)
    val expected = withConf("off") {
      lOuter.join(rIntervals,
          col("ls") < col("re") && col("rs") < col("le"), "left_outer")
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), Option(r.getAs[Any]("rid")))).toSet
    }
    assert(expected.exists(_._2.isEmpty),
      "fixture must have unmatched left rows")
    assert(expected.exists(_._2.nonEmpty), "and matched ones")
    val marked = lOuter.join(rIntervals,
      expr("interval_overlap(ls, le, rs, re)"), "left_outer")
    assert(marked.queryExecution.optimizedPlan.collect {
      case g: Generate => g }.nonEmpty,
      "the left-outer marker must fire the rewrite")
    assert(!marked.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "left-outer marker rewrite must not nested-loop")
    val got = marked.select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("rid")))).toSet
    assert(got == expected, "left-outer marker rewrite changed the result")
    // multiplicity: a value-duplicated unmatched left row yields TWO
    // null-extended rows (the anti complement is a bag, not a set)
    val dupRow = lOuter.filter(col("lid") === 999L)
    val dupped = lOuter.unionAll(dupRow)
    val dupGot = dupped.join(rIntervals,
        expr("interval_overlap(ls, le, rs, re)"), "left_outer")
      .filter(col("rid").isNull)
      .groupBy("lid").count()
    val dupLid = dupRow.collect().head.getLong(0)
    assert(dupGot.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .apply(dupLid) == 2L,
      "duplicated unmatched left row must appear twice")
    // extra equi conjuncts ride into the outer form too
    val keyed = lIntervals.withColumn("k", col("lid") % 5)
      .join(rIntervals.withColumn("k2", col("rid") % 5),
        col("k") === col("k2") &&
          expr("interval_overlap(ls, le, rs, re)"), "left_outer")
    val keyedExp = withConf("off") {
      lIntervals.withColumn("k", col("lid") % 5)
        .join(rIntervals.withColumn("k2", col("rid") % 5),
          col("k") === col("k2") && col("ls") < col("re") &&
            col("rs") < col("le"), "left_outer")
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), Option(r.getAs[Any]("rid")))).toSet
    }
    val keyedGot = keyed.select("lid", "rid").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("rid")))).toSet
    assert(keyedGot == keyedExp, "keyed left-outer marker join diverged")
    // RIGHT OUTER mirrors through the flipped left-outer machinery;
    // FULL OUTER unions both complements — each equals its silent
    // predicate baseline, still no BNLJ
    val rOuter = rIntervals.unionAll(Seq((888L, 300000L, 300050L))
      .toDF("rid", "rs", "re"))
    // SEMI and ANTI: output = left columns; equal the silent baselines
    for (jt <- Seq("left_semi", "left_anti")) {
      val exp = withConf("off") {
        lOuter.join(rIntervals,
            col("ls") < col("re") && col("rs") < col("le"), jt)
          .select("lid").collect().map(_.getLong(0)).toSeq.sorted
      }
      val m = lOuter.join(rIntervals,
        expr("interval_overlap(ls, le, rs, re)"), jt)
      assert(!m.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), s"$jt marker must not BNLJ")
      assert(m.columns.toSeq == Seq("lid", "ls", "le"),
        s"$jt output must be the left columns only")
      val g = m.select("lid").collect().map(_.getLong(0)).toSeq.sorted
      assert(g == exp, s"$jt marker rewrite changed the result")
    }
    // a non-deterministic side refuses the complement forms loudly
    // (the side would be evaluated twice) — the marker stays Unevaluable
    val nd = lOuter.withColumn("r", rand())
    val ndErr = intercept[Exception](
      nd.join(rIntervals,
          expr("interval_overlap(ls, le, rs, re)"), "left_anti")
        .collect())
    assert(ndErr.getMessage != null)
    for (jt <- Seq("right_outer", "full_outer")) {
      val exp = withConf("off") {
        lOuter.join(rOuter,
            col("ls") < col("re") && col("rs") < col("le"), jt)
          .select("lid", "rid").collect()
          .map(r => (Option(r.getAs[Any]("lid")),
            Option(r.getAs[Any]("rid")))).toSet
      }
      val m = lOuter.join(rOuter,
        expr("interval_overlap(ls, le, rs, re)"), jt)
      assert(!m.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), s"$jt marker must not BNLJ")
      val g = m.select("lid", "rid").collect()
        .map(r => (Option(r.getAs[Any]("lid")),
          Option(r.getAs[Any]("rid")))).toSet
      assert(g == exp, s"$jt marker rewrite changed the result")
      if (jt == "full_outer") {
        assert(g.exists(p => p._1.isEmpty), "full outer must keep the " +
          "unmatched right row with a null left side")
        assert(g.exists(p => p._2.isEmpty))
      }
    }
  }

  test("fractional widths: a sub-second double-interval corpus gets a " +
       "sub-1.0 bucket width (static literal AND sampled), not the " +
       "1000x-over-wide floor-to-1 — and the results stay exact") {
    // widths live inside the explode's Sequence as bucket = floor(x / w)
    def widthsOf(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.queryExecution.optimizedPlan.collect { case g: Generate => g }
        .flatMap(_.generator.collect {
          case org.apache.spark.sql.catalyst.expressions.Divide(
              _, org.apache.spark.sql.catalyst.expressions.Literal(
                w: Double, _), _) => w
        })
    // millisecond-scale double intervals: 800 intervals of length 0.01
    // across [0, 4); 1000 points on a 0.0035 grid
    val pts = spark.range(1000).select(col("id").as("pid"),
      (col("id").cast("double") * 0.0035).as("x"))
    val ivsStatic = spark.range(800).select(col("id").as("iid"),
      (col("id").cast("double") * 0.005).as("lo"),
      (col("id").cast("double") * 0.005 + 0.01).as("hi"))
    val expected = withConf("off") {
      pts.join(ivsStatic, col("x") >= col("lo") && col("x") < col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(expected.nonEmpty, "fixture must produce matches")
    // static path: the `lo + 0.01` literal is the width, read off the plan
    val onStatic = pts.join(ivsStatic,
      col("x") >= col("lo") && col("x") < col("hi"))
    assert(widthsOf(onStatic).distinct == Seq(0.01),
      s"static fractional width must be 0.01, got ${widthsOf(onStatic)}")
    assert(onStatic.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    // sampled path: opaque bounds (checkpoint hides the arithmetic);
    // p75 of the lengths is 0.01 — the width must stay sub-1.0
    val ivsOpaque = ivsStatic.localCheckpoint(true)
    val onSampled = pts.join(ivsOpaque,
      col("x") >= col("lo") && col("x") < col("hi"))
    val ws = widthsOf(onSampled)
    assert(ws.nonEmpty && ws.forall(w => w > 0 && w < 1.0),
      s"sampled width must be fractional for 0.01-length intervals: $ws")
    assert(onSampled.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    // per-bucket bound: with w ≈ 0.01 no bucket holds more than a few
    // intervals — the explosion stays ~1-2 buckets per interval and the
    // bucket join's build side stays per-key tiny
    val w = ws.head
    val perBucket = ivsStatic
      .select(floor(col("lo") / w).as("b")).groupBy("b").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(perBucket <= 4,
      s"per-bucket interval count must stay small at w=$w, got $perBucket")
  }
}
