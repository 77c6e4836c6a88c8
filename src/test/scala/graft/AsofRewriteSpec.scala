package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** The declarative as-of join: `asof_backward`/`asof_forward` markers in
  * a plain join condition must rewrite to the union-and-window plan —
  * join-free, identical to the operator form — and malformed marker use
  * must fail loudly rather than compute something else.
  */
class AsofRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def purchases = Seq(
    (1L, "u", 100L), (2L, "u", 90L), (3L, "u", 120L), (4L, "u", 5000L),
    (5L, "u", 10L), (6L, "v", 100L))
    .toDF("pid", "k", "sec")
  private def clicks = Seq(
    ("u", 60L, 900L), ("u", 120L, 901L), ("v", 40L, 902L))
    .toDF("ck", "csec", "click_id")

  private def planStr(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.toString

  test("asof_backward marker on a left-outer join == the operator form, " +
       "and the plan has NO join operator at all") {
    val decl = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_backward(sec, csec)"),
        "left_outer")
      .select(col("pid"), col("click_id"), col("csec").as("asof_sec"))
      .orderBy("pid")
    val plan = planStr(decl)
    assert(!plan.contains("Join"), s"as-of rewrite must be join-free:\n$plan")
    val op = RangeJoin.asofBackward(purchases,
        clicks.select(col("ck").as("k"), col("csec"), col("click_id"))
          .withColumnRenamed("csec", "sec2")
          .select(col("k"), col("sec2").as("sec"), col("click_id")),
        "sec", Seq("k"), Seq("click_id"))
      .select(col("pid"), col("click_id"), col("asof_ts").as("asof_sec"))
      .orderBy("pid")
    val got = decl.collect().map(r => (r.getLong(0),
      Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toSeq
    val want = op.collect().map(r => (r.getLong(0),
      Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toSeq
    assert(got == want, s"declarative $got != operator $want")
    // the specific semantics, spelled out
    val m = got.map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(m(3L) == (Some(901L), Some(120L)),
      "same-instant right row must match (zero-gap backward)")
    assert(m(5L) == (None, None), "no prior right row -> null payload")
    assert(m(6L) == (Some(902L), Some(40L)), "keys must isolate")
  }

  test("inner join type drops unmatched left rows; forward marker " +
       "matches the next at-or-after row") {
    val inner = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_backward(sec, csec)"))
      .select(col("pid")).as[Long].collect().toSet
    assert(inner == Set(1L, 2L, 3L, 4L, 6L),
      s"inner as-of must drop the unmatched row, got $inner")
    val fwd = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_forward(sec, csec)"),
        "left_outer")
      .select(col("pid"), col("click_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(fwd(5L) == Some(900L), "forward must match the next row")
    assert(fwd(2L) == Some(901L))
    assert(fwd(3L) == Some(901L), "forward at-or-after is inclusive")
    assert(fwd(4L) == None, "no following right row -> null")
    assert(!planStr(purchases.join(clicks,
      col("k") === col("ck") && expr("asof_forward(sec, csec)"),
      "left_outer")).contains("Join"))
  }

  test("duplicate column names across the two sides resolve (positional " +
       "temp renaming), and NULL right payloads never mix rows") {
    val l = Seq((1L, "u", 20L)).toDF("id", "k", "ts")
    val r = Seq(("u", 5L, Option.empty[String], Some("y5")),
        ("u", 10L, Some("x10"), Option.empty[String]))
      .toDF("k", "ts", "a", "b")
    // both sides carry `k` and `ts` upstream — the rewrite must keep
    // them apart via its positional temp renaming
    val rr = r.select(col("k").as("k2"), col("ts").as("ts2"),
      col("a"), col("b"))
    val decl = l.join(rr,
        col("k") === col("k2") && expr("asof_backward(ts, ts2)"),
        "left_outer")
      .select(col("id"), col("ts2"), col("a"), col("b")).head()
    assert(decl.getLong(1) == 10L && decl.getString(2) == "x10" &&
      decl.isNullAt(3),
      s"matched row must be carried whole, got $decl")
  }

  test("asof_nearest marker: smaller gap wins, ties go backward, " +
       "same-instant is a zero-gap backward match — equal to the " +
       "operator form, join-free") {
    def decl = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_nearest(sec, csec)"),
        "left_outer")
      .select(col("pid"), col("click_id"), col("csec").as("asof_sec"))
      .orderBy("pid")
    assert(!planStr(decl).contains("Join"),
      "nearest as-of rewrite must be join-free")
    val got = decl.collect().map(r => r.getLong(0) ->
      (Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toMap
    val op = RangeJoin.asofNearest(purchases,
        clicks.select(col("ck").as("k"), col("csec").as("sec"),
          col("click_id")),
        "sec", Seq("k"), Seq("click_id"))
      .select(col("pid"), col("click_id"), col("asof_ts"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toMap
    assert(got == op, s"declarative nearest $got != operator $op")
    // semantics spelled out: pid=1 sec=100 -> forward 120 (gap 20 < 40);
    // pid=2 sec=90 -> tie (30/30) goes backward to 60; pid=3 sec=120 ->
    // zero-gap backward; pid=5 sec=10 -> only forward arm exists
    assert(got(1L) == (Some(901L), Some(120L)))
    assert(got(2L) == (Some(900L), Some(60L)))
    assert(got(3L) == (Some(901L), Some(120L)))
    assert(got(5L) == (Some(900L), Some(60L)))
    assert(got(6L) == (Some(902L), Some(40L)), "keys must isolate")
  }

  test("literal tolerance argument bounds the gap: out-of-window matches " +
       "null out WHOLE (payload and ts together) on every mode, and " +
       "inner joins drop them") {
    // backward with tol 25: pid=1 sec=100 gap to 60 is 40 -> nulls;
    // pid=3 sec=120 zero-gap survives
    val b = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_backward(sec, csec, 25)"),
        "left_outer")
      .select(col("pid"), col("click_id"), col("csec")).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toMap
    assert(b(1L) == (None, None), "gap 40 > tol 25 must null out whole")
    assert(b(3L) == (Some(901L), Some(120L)), "zero gap survives")
    // the operator with the same tolerance agrees on every row
    val op = RangeJoin.asofBackward(purchases,
        clicks.select(col("ck").as("k"), col("csec").as("sec"),
          col("click_id")),
        "sec", Seq("k"), Seq("click_id"), tolerance = Some(25L))
      .select(col("pid"), col("click_id"), col("asof_ts")).collect()
      .map(r => r.getLong(0) ->
        (Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toMap
    assert(b == op, s"declarative tolerance $b != operator $op")
    // nearest with per-arm tolerance: forward gap 20 survives tol 25
    // where both 30-gap arms die
    val n = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_nearest(sec, csec, 25)"),
        "left_outer")
      .select(col("pid"), col("csec")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(n(1L) == Some(120L), "forward gap 20 survives tol 25")
    assert(n(2L) == None, "both gaps 30 exceed tol 25")
    // inner + tolerance: out-of-window rows DROP
    val inner = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_backward(sec, csec, 25)"))
      .select(col("pid")).as[Long].collect().toSet
    assert(!inner.contains(1L) && inner.contains(3L))
  }

  test("the markers resolve in plain SQL: an ASOF stated entirely as a " +
       "SQL LEFT JOIN lands the same join-free plan and rows") {
    purchases.createOrReplaceTempView("p_asof")
    clicks.createOrReplaceTempView("c_asof")
    val q = spark.sql(
      """SELECT p.pid, c.click_id, c.csec AS asof_sec
        |FROM p_asof p LEFT JOIN c_asof c
        |  ON p.k = c.ck AND asof_backward(p.sec, c.csec)
        |ORDER BY p.pid""".stripMargin)
    assert(!planStr(q).contains("Join"),
      "SQL-stated as-of must rewrite join-free")
    val got = q.collect().map(r => (r.getLong(0),
      Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toSeq
    val df = purchases.join(clicks,
        col("k") === col("ck") && expr("asof_backward(sec, csec)"),
        "left_outer")
      .select(col("pid"), col("click_id"), col("csec").as("asof_sec"))
      .orderBy("pid").collect().map(r => (r.getLong(0),
        Option(r.getAs[Any](1)), Option(r.getAs[Any](2)))).toSeq
    assert(got == df, "SQL and DataFrame statements must agree")
  }

  test("malformed marker use fails loudly instead of silently computing " +
       "something else") {
    // extra non-equi conjunct -> the rewrite refuses, and the marker is
    // unevaluable at execution
    val bad = purchases.join(clicks,
      col("k") === col("ck") && expr("asof_backward(sec, csec)") &&
        col("pid") > col("click_id"), "left_outer")
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
    // marker outside a join entirely
    val e2 = intercept[Exception](
      purchases.filter(expr("asof_backward(sec, sec)")).collect())
    assert(e2.getMessage != null)
  }

  test("a left row with NULL ts matches NOTHING in every mode: it sorts " +
       "NULLS FIRST, where forward/nearest's FOLLOWING frame would " +
       "otherwise hand it the earliest right row") {
    val p = Seq((1L, "u", Option(100L)), (2L, "u", Option.empty[Long]))
      .toDF("pid", "k", "sec")
    for (mode <- Seq("asof_backward", "asof_forward", "asof_nearest")) {
      val m = p.join(clicks,
          col("k") === col("ck") && expr(s"$mode(sec, csec)"), "left_outer")
        .select(col("pid"), col("click_id")).collect()
        .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
      assert(m(2L).isEmpty,
        s"$mode matched a NULL-ts left row to ${m(2L)}")
      assert(m(1L).nonEmpty, s"$mode lost the valid row")
      val inner = p.join(clicks,
          col("k") === col("ck") && expr(s"$mode(sec, csec)"))
        .select(col("pid")).as[Long].collect().toSet
      assert(inner == Set(1L),
        s"inner $mode must drop the NULL-ts left row, got $inner")
    }
    // operator forms: the same guarantee
    val l = p.withColumnRenamed("sec", "ts")
    val r = clicks.select(col("ck").as("k"), col("csec").as("ts"),
      col("click_id"))
    val fw = RangeJoin.asofForward(l, r, "ts", Seq("k"), Seq("click_id"))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("click_id"))).toMap
    assert(fw(2L).isEmpty, "operator asofForward matched a NULL left ts")
    assert(fw(1L).nonEmpty)
    val nr = RangeJoin.asofNearest(l, r, "ts", Seq("k"), Seq("click_id"))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("click_id"))).toMap
    assert(nr(2L).isEmpty, "operator asofNearest matched a NULL left ts")
    assert(nr(1L).nonEmpty)
  }

  test("NULL equi keys never match (SQL equality): a NULL-key right row " +
       "donates payload to nothing, a NULL-key left row keeps null " +
       "payloads — the window partition would otherwise group the NULLs " +
       "together and hand one to the other") {
    val p = Seq((1L, Option("u"), 100L), (2L, Option.empty[String], 100L))
      .toDF("pid", "k", "sec")
    // valid right rows on BOTH sides of the left ts, plus NULL-key rows
    // on both sides of it — every mode has a real match for pid 1 and a
    // would-be NULL-key donor for pid 2
    val c = Seq((Option("u"), 60L, 900L), (Option("u"), 160L, 901L),
      (Option.empty[String], 50L, 998L),
      (Option.empty[String], 150L, 999L))
      .toDF("ck", "csec", "click_id")
    val expect = Map("asof_backward" -> 900L, "asof_forward" -> 901L,
      "asof_nearest" -> 900L)
    for (mode <- Seq("asof_backward", "asof_forward", "asof_nearest")) {
      val m = p.join(c,
          col("k") === col("ck") && expr(s"$mode(sec, csec)"), "left_outer")
        .select(col("pid"), col("click_id")).collect()
        .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
      assert(m(2L).isEmpty,
        s"$mode matched NULL keys to each other: ${m(2L)}")
      assert(m(1L).contains(expect(mode)), s"$mode lost the valid match: $m")
      val inner = p.join(c,
          col("k") === col("ck") && expr(s"$mode(sec, csec)"))
        .select(col("pid")).as[Long].collect().toSet
      assert(inner == Set(1L),
        s"inner $mode must drop the NULL-key left row, got $inner")
    }
    // operator forms: same guarantee
    val l = p.withColumnRenamed("sec", "ts")
    val r = c.select(col("ck").as("k"), col("csec").as("ts"),
      col("click_id"))
    for ((name, want, res) <- Seq(
        ("backward", 900L, RangeJoin.asofBackward(l, r, "ts", Seq("k"),
          Seq("click_id"))),
        ("forward", 901L, RangeJoin.asofForward(l, r, "ts", Seq("k"),
          Seq("click_id"))),
        ("nearest", 900L, RangeJoin.asofNearest(l, r, "ts", Seq("k"),
          Seq("click_id"))))) {
      val m = res.collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("click_id"))).toMap
      assert(m(2L).isEmpty, s"operator $name matched NULL keys: $m")
      assert(m(1L).contains(want), s"operator $name lost the match: $m")
    }
  }

  test("DateType markers rewrite too, tolerance in DAYS — declarative " +
       "and operator forms agree") {
    val p = Seq((1L, "u", "2024-01-10"), (2L, "u", "2024-03-01"))
      .toDF("pid", "k", "s").withColumn("lts", to_date(col("s")))
    val c = Seq(("u", "2024-01-05", 900L))
      .toDF("ck", "cs", "click_id").withColumn("rts", to_date(col("cs")))
    val decl = p.join(c,
        col("k") === col("ck") && expr("asof_backward(lts, rts, 7)"),
        "left_outer")
      .select(col("pid"), col("click_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(decl(1L) == Some(900L), "5-day gap within a 7-day tolerance")
    assert(decl(2L).isEmpty, "a 56-day gap must exceed 7 days")
  }

  test("DateType tolerance bounds the gap in DAYS on the operator form " +
       "(a date difference is not long-comparable either)") {
    val l = Seq((1L, "u", "2024-01-10"), (2L, "u", "2024-03-01"))
      .toDF("pid", "k", "s").withColumn("ts", to_date(col("s"))).drop("s")
    val r = Seq(("u", "2024-01-05", 900L))
      .toDF("k", "s", "payload").withColumn("ts", to_date(col("s")))
      .drop("s")
    val got = RangeJoin.asofBackward(l, r, "ts", Seq("k"), Seq("payload"),
        tolerance = Some(7L))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("payload"))).toMap
    assert(got(1L) == Some(900L), "5-day gap within a 7-day tolerance")
    assert(got(2L).isEmpty, "a 56-day gap must exceed a 7-day tolerance")
  }

  test("TimestampType columns with a literal tolerance resolve (the raw " +
       "difference is a DayTimeInterval) and bound the gap in SECONDS") {
    val p = Seq((1L, "u", "2024-01-01 00:00:10"),
      (2L, "u", "2024-01-01 00:02:00"))
      .toDF("pid", "k", "s").withColumn("lts", to_timestamp(col("s")))
    val c = Seq(("u", "2024-01-01 00:00:00", 900L))
      .toDF("ck", "cs", "click_id")
      .withColumn("rts", to_timestamp(col("cs")))
    def run(mode: String) = p.join(c,
        col("k") === col("ck") && expr(s"$mode(lts, rts, 30)"),
        "left_outer")
      .select(col("pid"), col("click_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    val b = run("asof_backward")
    assert(b(1L) == Some(900L), "10 s gap within a 30 s tolerance")
    assert(b(2L).isEmpty, "120 s gap must exceed a 30 s tolerance")
    val n = run("asof_nearest")
    assert(n(1L) == Some(900L) && n(2L).isEmpty,
      s"nearest timestamp tolerance must bound in seconds: $n")
    // operator form, same units
    val got = RangeJoin.asofBackward(
        p.select(col("pid"), col("k"), col("lts").as("ts")),
        c.select(col("ck").as("k"), col("rts").as("ts"), col("click_id")),
        "ts", Seq("k"), Seq("click_id"), tolerance = Some(30L))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("click_id"))).toMap
    assert(got(1L) == Some(900L) && got(2L).isEmpty,
      s"operator timestamp tolerance must bound in seconds: $got")
  }

  test("FRACTIONAL tolerance on a double-seconds axis (the reference's " +
       "native delay type): 0.5 s admits a 0.3 s gap and rejects 0.7 s; " +
       "whole tolerances keep the long path; nearest arms bound " +
       "independently") {
    val p = Seq((1L, "u", 10.3), (2L, "u", 20.7), (3L, "u", 30.0),
      (4L, "v", 10.4))
      .toDF("pid", "k", "secd")
    val c = Seq(("u", 10.0, 900L), ("u", 20.0, 901L), ("u", 30.0, 902L),
      ("v", 10.0, 903L))
      .toDF("ck", "csecd", "click_id")
    def run(tol: String) = p.join(c,
        col("k") === col("ck") && expr(s"asof_backward(secd, csecd, $tol)"),
        "left_outer")
      .select(col("pid"), col("click_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    val half = run("0.5")
    assert(half(1L) == Some(900L), "0.3 s gap within 0.5 s tolerance")
    assert(half(2L).isEmpty, "0.7 s gap must exceed 0.5 s tolerance")
    assert(half(3L) == Some(902L), "zero gap always within")
    assert(half(4L) == Some(903L), "keys isolate under fractional tol")
    // sub-0.3: even the near match drops
    val tight = run("0.25")
    assert(tight(1L).isEmpty && tight(3L) == Some(902L), s"got $tight")
    // a WHOLE tolerance on the same axis still matches the raw-gap path
    val one = run("1")
    assert(one(1L) == Some(900L) && one(2L) == Some(901L), s"got $one")
    // nearest: backward gap 0.3 vs forward gap 9.7 — the 0.5 bound
    // keeps the backward arm only; 0.25 drops both
    val near = p.join(c,
        col("k") === col("ck") && expr("asof_nearest(secd, csecd, 0.5)"),
        "left_outer")
      .select(col("pid"), col("click_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(near(1L) == Some(900L) && near(2L).isEmpty, s"got $near")
  }

  test("FRACTIONAL + INTERVAL tolerance on TimestampType compares the " +
       "EXACT microsecond gap: 0.5 s admits 300 ms and rejects 700 ms, " +
       "and INTERVAL '500' MILLISECOND is the same bound") {
    val p = Seq((1L, "u", "2024-01-01 00:00:10.300"),
      (2L, "u", "2024-01-01 00:00:10.700"),
      (3L, "u", "2024-01-01 00:00:10.000"))
      .toDF("pid", "k", "s").withColumn("lts", to_timestamp(col("s")))
    val c = Seq(("u", "2024-01-01 00:00:10.000", 900L))
      .toDF("ck", "cs", "click_id")
      .withColumn("rts", to_timestamp(col("cs")))
    def run(tol: String) = p.join(c,
        col("k") === col("ck") && expr(s"asof_backward(lts, rts, $tol)"),
        "left_outer")
      .select(col("pid"), col("click_id")).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    for (tol <- Seq("0.5", "INTERVAL '500' MILLISECOND",
        "INTERVAL '0.5' SECOND")) {
      val m = run(tol)
      assert(m(1L) == Some(900L), s"$tol: 300 ms gap must pass, got $m")
      assert(m(2L).isEmpty, s"$tol: 700 ms gap must drop, got $m")
      assert(m(3L) == Some(900L), s"$tol: zero gap must pass, got $m")
    }
    // whole tolerances share the SAME exact-microsecond bound, so the
    // admitted set is MONOTONE in t: 0 admits only the zero gap, and
    // 1 is a superset of 0.5 (an epoch-second floor would have let
    // t=0 admit both sub-second gaps while t=0.5 rejects the 700 ms
    // one — raising the tolerance removing matches)
    val whole = run("0")
    assert(whole(1L).isEmpty && whole(2L).isEmpty &&
      whole(3L) == Some(900L),
      s"tolerance 0 must admit exactly the zero gap, got $whole")
    val one = run("1")
    assert(one(1L) == Some(900L) && one(2L) == Some(900L) &&
      one(3L) == Some(900L),
      s"tolerance 1 must be a superset of 0.5, got $one")
    // a fractional DATE tolerance cannot mean anything — fail fast
    val pd = Seq((1L, "u", "2024-01-05")).toDF("pid", "k", "s")
      .withColumn("ld", to_date(col("s")))
    val cd = Seq(("u", "2024-01-01", 1L)).toDF("ck", "cs", "click_id")
      .withColumn("rd", to_date(col("cs")))
    val err = intercept[Exception] {
      pd.join(cd, col("k") === col("ck") &&
          expr("asof_backward(ld, rd, 1.5)"), "left_outer")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("whole number of days"),
      s"fractional DATE tolerance must fail fast, got: ${err.getMessage}")
  }
}
