package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketized interval join: must equal the declarative range join
  * exactly — half-open boundaries, multi-bucket spans, key isolation,
  * degenerate intervals — while planning as an equi-join.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval == the declarative range join; [start, end) " +
       "boundaries; multi-bucket spans; empty intervals match nothing") {
    val pts = Seq(
      (1L, "u", 0L), (2L, "u", 99L), (3L, "u", 100L), (4L, "u", 250L),
      (5L, "u", 999L), (6L, "u", 1000L), (7L, "v", 250L), (8L, "u", 5000L))
      .toDF("pid", "k", "ts")
    val ivs = Seq(
      (10L, "u", 100L, 1000L),  // spans many width-64 buckets
      (11L, "u", 99L, 100L),    // single point interval [99, 100)
      (12L, "v", 0L, 300L),
      (13L, "u", 400L, 400L),   // empty: matches nothing
      (14L, "u", 500L, 400L))   // inverted: matches nothing
      .toDF("wid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "ts", "lo", "hi",
        Seq("k"), bucketWidth = 64L)
      .select(col("wid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.as[(Long, String, Long)].collect().flatMap {
      case (pid, k, ts) =>
        ivs.as[(Long, String, Long, Long)].collect().collect {
          case (wid, ik, lo, hi) if ik == k && ts >= lo && ts < hi =>
            (wid, pid)
        }
    }.toSet
    assert(got == want, s"got $got, want $want")
    // the specific boundary cases, spelled out
    assert(got.contains((10L, 3L)), "start is inclusive")
    assert(!got.contains((10L, 6L)), "end is exclusive")
    assert(got.contains((11L, 2L)) && !got.contains((11L, 3L)))
    assert(got.contains((12L, 7L)) && !got.contains((12L, 4L)),
      "equi keys must isolate")
    assert(!got.exists(p => p._1 == 13L || p._1 == 14L),
      "empty/inverted intervals must match nothing")
    // no duplicate pairs even though interval 10 spans ~14 buckets
    val rows = RangeJoin.pointInInterval(pts, ivs, "ts", "lo", "hi",
      Seq("k"), bucketWidth = 64L).count()
    assert(rows == want.size, "multi-bucket spans must not duplicate pairs")
    // bucket width does not change the result, only the plan
    val wide = RangeJoin.pointInInterval(pts, ivs, "ts", "lo", "hi",
        Seq("k"), bucketWidth = 100000L)
      .select(col("wid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide == want)
  }

  test("intervalOverlap == the declarative overlap join: one row per " +
       "pair however many buckets the overlap spans; touching intervals " +
       "do not overlap") {
    val a = Seq(
      (1L, "u", 0L, 1000L),    // long: overlaps b1, b2; touches b3
      (2L, "u", 1500L, 1600L),
      (3L, "u", 50L, 60L),     // inside b1
      (4L, "v", 0L, 1000L),    // other key
      (5L, "u", 700L, 700L))   // empty
      .toDF("aid", "k", "a_lo", "a_hi")
    val b = Seq(
      (10L, "u", 0L, 900L),    // overlap with a1 spans many width-64 buckets
      (11L, "u", 40L, 55L),
      (12L, "u", 1000L, 1100L), // touches a1 at 1000: NOT an overlap
      (13L, "v", 500L, 501L))
      .toDF("bid", "k", "b_lo", "b_hi")
    def run(width: Long) = RangeJoin.intervalOverlap(a, b,
        "a_lo", "a_hi", "b_lo", "b_hi", Seq("k"), width)
      .select(col("aid"), col("bid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Set((1L, 10L), (1L, 11L), (3L, 10L), (3L, 11L), (4L, 13L))
    val got = run(64L)
    assert(got.toSet == want, s"got ${got.toSet}, want $want")
    assert(got.length == want.size,
      "an overlap spanning many buckets must emit exactly one row")
    assert(run(1000000L).toSet == want, "width must not change the result")
  }

  test("asofBackward: greatest right ts <= left ts, same-instant " +
       "matches, tolerance nulls, unmatched nulls, key isolation") {
    val l = Seq((1L, "u", 100L), (2L, "u", 150L), (3L, "u", 5000L),
      (4L, "u", 10L), (5L, "v", 100L), (6L, "w", 100L))
      .toDF("pid", "k", "ts")
    val r = Seq(("u", 50L, 900L), ("u", 150L, 901L), ("u", 151L, 902L),
      ("v", 99L, 903L))
      .toDF("k", "ts", "payload")
    val got = RangeJoin.asofBackward(l, r, "ts", Seq("k"), Seq("payload"),
        tolerance = Some(1000L))
      .collect().map(row => row.getAs[Long]("pid") ->
        (Option(row.getAs[Any]("payload")),
          Option(row.getAs[Any]("asof_ts")))).toMap
    assert(got(1L) == (Some(900L), Some(50L)), "strictly-prior match")
    assert(got(2L) == (Some(901L), Some(150L)),
      "a right row at the SAME instant matches (<=, not <)")
    assert(got(3L) == (None, None),
      "a match farther back than tolerance must null out")
    assert(got(4L) == (None, None), "no prior right row -> nulls")
    assert(got(5L) == (Some(903L), Some(99L)))
    assert(got(6L) == (None, None), "keys must isolate")
    // without tolerance the stale match comes back
    val loose = RangeJoin.asofBackward(l, r, "ts", Seq("k"), Seq("payload"))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("payload"))).toMap
    assert(loose(3L) == Some(902L), "no tolerance -> latest prior row")
  }

  test("suggestBucketWidth tracks the typical interval length, ignores " +
       "empty/inverted intervals, floors at 1") {
    val iv = ((1 to 90).map(i => (i.toLong, 100L + i * 10L)) ++
      Seq((500L, 500L), (700L, 600L)))   // empty + inverted: excluded
      .toDF("lo", "hi")
    val w = graft.operators.RangeJoin.suggestBucketWidth(iv, "lo", "hi")
    // lengths ~ 100+9i for i=1..90: p75 lands in the hundreds band
    assert(w >= 100L && w <= 1000L, s"unexpected width $w")
    // degenerate data: sub-1 lengths floor to 1; empty side floors to 1
    val tiny = Seq((10L, 11L)).toDF("lo", "hi")
    assert(graft.operators.RangeJoin.suggestBucketWidth(tiny, "lo", "hi") == 1L)
    val none = Seq((5L, 5L)).toDF("lo", "hi")
    assert(graft.operators.RangeJoin.suggestBucketWidth(none, "lo", "hi") == 1L)
  }

  test("asofForward: smallest right ts >= left ts, same-instant matches, " +
       "tolerance nulls, unmatched nulls, key isolation") {
    val l = Seq((1L, "u", 100L), (2L, "u", 150L), (3L, "u", 5000L),
      (4L, "u", 999999L), (5L, "v", 100L), (6L, "w", 100L))
      .toDF("pid", "k", "ts")
    val r = Seq(("u", 120L, 900L), ("u", 150L, 901L), ("u", 7000L, 902L),
      ("v", 101L, 903L))
      .toDF("k", "ts", "payload")
    val got = RangeJoin.asofForward(l, r, "ts", Seq("k"), Seq("payload"),
        tolerance = Some(1000L))
      .collect().map(row => row.getAs[Long]("pid") ->
        (Option(row.getAs[Any]("payload")),
          Option(row.getAs[Any]("asof_ts")))).toMap
    assert(got(1L) == (Some(900L), Some(120L)), "strictly-later match")
    assert(got(2L) == (Some(901L), Some(150L)),
      "a right row at the SAME instant matches (>=, not >)")
    assert(got(3L) == (None, None),
      "a match farther ahead than tolerance must null out")
    assert(got(4L) == (None, None), "no later right row -> nulls")
    assert(got(5L) == (Some(903L), Some(101L)))
    assert(got(6L) == (None, None), "keys must isolate")
    val loose = RangeJoin.asofForward(l, r, "ts", Seq("k"), Seq("payload"))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("payload"))).toMap
    assert(loose(3L) == Some(902L), "no tolerance -> earliest later row")
  }

  test("asofNearest: smaller gap wins, equal gaps go backward, " +
       "same-instant is a zero-gap backward match, per-arm tolerance, " +
       "one-arm fallback") {
    val l = Seq(
      (1L, "u", 100L),   // b gap 40 (60) vs f gap 20 (120) -> forward
      (2L, "u", 90L),    // b gap 30 vs f gap 30 (120) -> tie -> backward
      (3L, "u", 120L),   // same-instant right row -> gap 0 backward
      (4L, "u", 5000L),  // b gap 4880 > tol, f none -> nulls
      (5L, "u", 10L),    // no prior; f gap 50 -> forward
      (6L, "v", 100L))   // keys isolate
      .toDF("pid", "k", "ts")
    val r = Seq(("u", 60L, 900L), ("u", 120L, 901L))
      .toDF("k", "ts", "payload")
    val got = RangeJoin.asofNearest(l, r, "ts", Seq("k"), Seq("payload"),
        tolerance = Some(1000L))
      .collect().map(row => row.getAs[Long]("pid") ->
        (Option(row.getAs[Any]("payload")),
          Option(row.getAs[Any]("asof_ts")),
          Option(row.getAs[String]("asof_dir")))).toMap
    assert(got(1L) == (Some(901L), Some(120L), Some("forward")),
      "strictly smaller forward gap must win")
    assert(got(2L) == (Some(900L), Some(60L), Some("backward")),
      "equal gaps must break backward")
    assert(got(3L) == (Some(901L), Some(120L), Some("backward")),
      "a same-instant right row is a zero-gap backward match")
    assert(got(4L) == (None, None, None),
      "both arms out of tolerance/absent -> nulls")
    assert(got(5L) == (Some(900L), Some(60L), Some("forward")),
      "missing backward arm falls back to forward")
    assert(got(6L) == (None, None, None), "keys must isolate")
    // tight tolerance kills the farther arm only
    val tight = RangeJoin.asofNearest(l, r, "ts", Seq("k"), Seq("payload"),
        tolerance = Some(25L))
      .collect().map(row => row.getAs[Long]("pid") ->
        Option(row.getAs[Any]("asof_ts"))).toMap
    assert(tight(1L) == Some(120L), "forward gap 20 survives tol 25")
    assert(tight(2L) == None, "both gaps 30 exceed tol 25")
  }

  test("as-of payload columns all come from the SAME matched row: a NULL " +
       "in the matched row stays NULL instead of being donated by a " +
       "farther row, and NULL-ts right rows never match") {
    val l = Seq((1L, "u", 20L)).toDF("pid", "k", "ts")
    // backward: matched row (ts=10) has b NULL; ts=5 must NOT donate b
    val rB = Seq(
      ("u", Some(5L), Option.empty[String], Some("y5")),
      ("u", Some(10L), Some("x10"), Option.empty[String]),
      ("u", Option.empty[Long], Some("nullts"), Some("nullts")))
      .toDF("k", "ts", "a", "b")
    val gb = RangeJoin.asofBackward(l, rB, "ts", Seq("k"), Seq("a", "b"))
      .select("asof_ts", "a", "b").head()
    assert(gb.getLong(0) == 10L && gb.getString(1) == "x10" &&
      gb.isNullAt(2),
      s"backward must carry the matched row whole, got $gb")
    // forward: matched row (ts=30) has a NULL; ts=50 must NOT donate a
    val rF = Seq(
      ("u", 30L, Option.empty[String], Some("f30")),
      ("u", 50L, Some("x50"), Option.empty[String]))
      .toDF("k", "ts", "a", "b")
    val gf = RangeJoin.asofForward(l, rF, "ts", Seq("k"), Seq("a", "b"))
      .select("asof_ts", "a", "b").head()
    assert(gf.getLong(0) == 30L && gf.isNullAt(1) &&
      gf.getString(2) == "f30",
      s"forward must carry the matched row whole, got $gf")
    // nearest: backward tie-winner (ts=19) has a NULL; neither the
    // farther-back ts=3 row nor the forward ts=21 row may donate it
    val rN = Seq(
      ("u", 3L, Some("oldA"), Option.empty[String]),
      ("u", 19L, Option.empty[String], Some("b19")),
      ("u", 21L, Some("a21"), Option.empty[String]))
      .toDF("k", "ts", "a", "b")
    val gn = RangeJoin.asofNearest(l, rN, "ts", Seq("k"), Seq("a", "b"))
      .select("asof_ts", "a", "b", "asof_dir").head()
    assert(gn.getLong(0) == 19L && gn.isNullAt(1) &&
      gn.getString(2) == "b19" && gn.getString(3) == "backward",
      s"nearest must carry the matched row whole, got $gn")
    // nearest with both arms out of tolerance: NO column may survive
    // (previously a per-column carry could leak an out-of-tolerance row)
    val far = Seq(("u", 1L, Some("farA"), Some("farB")))
      .toDF("k", "ts", "a", "b")
    val gt = RangeJoin.asofNearest(l, far, "ts", Seq("k"), Seq("a", "b"),
      tolerance = Some(5L)).select("asof_ts", "a", "b").head()
    assert(gt.isNullAt(0) && gt.isNullAt(1) && gt.isNullAt(2),
      s"out-of-tolerance rows must not donate any column, got $gt")
  }

  test("multi-resolution bucketing bounds the interval explosion: one " +
       "huge interval among session-scale ones stays within cap rows, " +
       "results identical to brute force across widths and caps") {
    // adversarial length mix: session-scale intervals plus one 10^6-wide
    // and one 10^9-wide outlier — at width 60 the naive explosion would
    // be 16k and 16M rows respectively
    val ivs = ((1L to 200L).map(i =>
        (i, "u", i * 37 % 500 * 60L, i * 37 % 500 * 60L + i % 5 * 90L)) ++
      Seq((900L, "u", 1000L, 1000L + 1000000L),
          (901L, "u", 5000L, 5000L + 1000000000L)))
      .toDF("wid", "k", "lo", "hi")
    val pts = (1L to 400L).map(i => (i, "u", i * 317 % 40000 * 60L))
      .toDF("pid", "k", "ts")
    val want = pts.as[(Long, String, Long)].collect().flatMap {
      case (pid, k, ts) =>
        ivs.as[(Long, String, Long, Long)].collect().collect {
          case (wid, ik, lo, hi) if ik == k && ts >= lo && ts < hi =>
            (wid, pid)
        }
    }.toSet
    assert(want.exists(_._1 == 900L) && want.exists(_._1 == 901L),
      "outlier intervals must actually match points")
    for (w <- Seq(60L, 1L); cap <- Seq(16, 256)) {
      val got = RangeJoin.pointInInterval(pts, ivs, "ts", "lo", "hi",
          Seq("k"), bucketWidth = w, maxBucketsPerInterval = cap)
        .select(col("wid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"width $w cap $cap changed the result")
      // the per-interval explosion bound that makes it skew-safe
      val exploded = RangeJoin.explodedIntervals(ivs, "lo", "hi", w,
        cap.toLong).count()
      assert(exploded <= ivs.count() * (cap + 2),
        s"width $w cap $cap exploded $exploded rows " +
          s"(> ${ivs.count() * (cap + 2)})")
    }
    // width=1 against the 10^9 interval: the single-level explosion
    // would be a 10^9-element sequence (a hard runtime error), so
    // completing AT ALL proves the cap routed it to a coarser level
  }

  test("multi-resolution overlap join: outlier-length intervals on both " +
       "sides, exactly one row per overlapping pair, equal to brute " +
       "force") {
    val ls = ((1L to 150L).map(i =>
        (i, "u", i * 53 % 400 * 60L, i * 53 % 400 * 60L + i % 7 * 150L)) ++
      Seq((800L, "u", 2000L, 2000L + 5000000L)))
      .toDF("lid", "k", "ls", "le")
    val rs = ((1L to 120L).map(i =>
        (i, "u", i * 71 % 380 * 60L, i * 71 % 380 * 60L + 200L)) ++
      Seq((901L, "u", 0L, 900000000L)))
      .toDF("rid", "k", "rs", "re")
    val want = ls.as[(Long, String, Long, Long)].collect().flatMap {
      case (lid, k, s1, e1) =>
        rs.as[(Long, String, Long, Long)].collect().collect {
          case (rid, rk, s2, e2)
              if rk == k && s1 < e2 && s2 < e1 && e1 > s1 && e2 > s2 =>
            (lid, rid)
        }
    }.toSet
    assert(want.exists(_._1 == 800L) && want.exists(_._2 == 901L))
    for (w <- Seq(60L, 1L); cap <- Seq(16, 256)) {
      val df = RangeJoin.intervalOverlap(ls, rs, "ls", "le", "rs", "re",
        Seq("k"), bucketWidth = w, maxBucketsPerInterval = cap)
      val rows = df.select(col("lid"), col("rid")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSet == want, s"width $w cap $cap changed the result")
      assert(rows.length == want.size,
        s"width $w cap $cap emitted duplicate pairs")
    }
  }
}
