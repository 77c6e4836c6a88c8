package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Mergeable-sketch contracts: the integer register/counter STATE is
  * pinned by the q102/q103 oracles; here we pin the things SQL can't —
  * estimator accuracy against exact counts, merge associativity and
  * idempotence (the shard-partial and replay guarantees), and the
  * count-min overestimate-only property.
  */
class SketchesSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
  private lazy val toks = docs.select(col("doc_id"),
    explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))

  test("HLL estimate lands within the expected error band of the exact " +
       "distinct count") {
    val b = 9 // m=512 → typical error 1.04/sqrt(512) ≈ 4.6%
    val regs = Sketches.hllRegisters(toks, "tok", b)
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Int]("max_rho")))
    val est = Sketches.hllEstimate(regs.toSeq, b)
    val exact = toks.select(col("tok")).distinct().count().toDouble
    assert(math.abs(est - exact) / exact < 0.15,
      s"HLL estimate $est too far from exact $exact")
  }

  test("HLL merge of shard partials == one-pass sketch; re-merging a " +
       "shard (replay) changes nothing") {
    val a = Sketches.hllRegisters(toks.filter(col("doc_id") % 2 === 0), "tok", 7)
    val bb = Sketches.hllRegisters(toks.filter(col("doc_id") % 2 === 1), "tok", 7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Int]("max_rho")))
        .sorted.toSeq
    val whole = rows(Sketches.hllRegisters(toks, "tok", 7))
    val merged = rows(Sketches.hllMerge(a.unionByName(bb)))
    assert(merged == whole, "shard partials must merge into the one-pass sketch")
    // idempotence: an at-least-once replay of shard A merges to the same state
    val replayed = rows(Sketches.hllMerge(a.unionByName(bb).unionByName(a)))
    assert(replayed == whole, "replayed partial changed the merged sketch")
  }

  test("per-group HLL estimates track exact per-source distinct counts") {
    val st = docs.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val regs = Sketches.hllRegisters(st, "tok", b = 9, groupCols = Seq("source"))
    val est = Sketches.hllEstimateByGroup(regs, 9, Seq("source"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("est_distinct")).toMap
    val exact = st.distinct().groupBy("source").count()
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("count"))
      .toMap
    exact.foreach { case (src, ex) =>
      val e = est(src)
      assert(math.abs(e - ex) / ex < 0.2,
        s"source $src: estimate $e vs exact $ex")
    }
  }

  test("HLL sparse state: sparse groups are EXACT, dense groups match the " +
       "direct register build, both representations appear") {
    val st = docs.select(col("source"), col("lang"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val state = Sketches.hllSparseState(st, "tok", b = 7, threshold = 30,
      groupCols = Seq("source", "lang"))
    assert(state.filter(col("kind") === 0).count() > 0 &&
      state.filter(col("kind") === 1).count() > 0,
      "sf0.01 grain must exercise BOTH representations at threshold 30")

    val exact = st.distinct().groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val est = Sketches.hllSparseEstimate(state, 7, Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("est_distinct")).toMap
    assert(est.keySet == exact.keySet, "estimate must cover every group")
    exact.foreach { case (g, n) =>
      if (n <= 30) assert(est(g) == n.toDouble,
        s"sparse group $g must be exact: ${est(g)} vs $n")
      else assert(math.abs(est(g) - n) / n < 0.25,
        s"dense group $g estimate ${est(g)} too far from $n")
    }

    // dense groups' registers == hllRegisters run directly on those groups
    val denseGroups = exact.filter(_._2 > 30).keySet
    val denseDirect = Sketches.hllRegisters(
        st.filter(concat_ws("\u0000", col("source"), col("lang"))
          .isin(denseGroups.toSeq.map(g => g._1 + "\u0000" + g._2): _*)),
        "tok", 7, Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Int]("bucket").toLong, r.getAs[Int]("max_rho"))).sorted.toSeq
    val denseFromState = state.filter(col("kind") === 1)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("k"), r.getAs[Int]("v"))).sorted.toSeq
    assert(denseFromState == denseDirect,
      "promoted registers must equal the direct dense build")
  }

  test("HLL sparse merge: shard partials == one-pass state; sparse shards " +
       "crossing the threshold promote; replay is idempotent") {
    import spark.implicits._
    // gA: 40 distinct values (each shard's 20 stay sparse at T=25, the
    // union must promote); gB: 10 distinct (stays sparse end to end)
    def half(which: Int) =
      ((0 until 20).map(i => ("gA", s"a${which * 20 + i}")) ++
        (0 until 5).map(i => ("gB", s"b${which * 5 + i}")))
        .toDF("grp", "value")
    val all = half(0).unionByName(half(1))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getAs[Int]("kind"),
        r.getAs[Long]("k"),
        if (r.isNullAt(r.fieldIndex("v"))) -1 else r.getAs[Int]("v")))
        .sorted.toSeq
    val onePass = rows(
      Sketches.hllSparseState(all, "value", 7, 25, Seq("grp")))
    val pa = Sketches.hllSparseState(half(0), "value", 7, 25, Seq("grp"))
    val pb = Sketches.hllSparseState(half(1), "value", 7, 25, Seq("grp"))
    assert(rows(pa).forall(_._2 == 0), "each shard alone must stay sparse")
    val merged = rows(
      Sketches.hllSparseMerge(pa.unionByName(pb), 7, 25, Seq("grp")))
    assert(merged == onePass,
      "shard partials must merge into exactly the one-pass state")
    assert(merged.filter(_._1 == "gA").forall(_._2 == 1) &&
      merged.filter(_._1 == "gB").forall(_._2 == 0),
      "gA must promote to dense, gB must stay sparse")
    // at-least-once replay of shard A cannot move the merged state
    val replayed = rows(Sketches.hllSparseMerge(
      pa.unionByName(pb).unionByName(pa), 7, 25, Seq("grp")))
    assert(replayed == onePass, "replayed partial changed the merged state")
    // merging an already-merged state with a late sparse shard still works
    val staged = rows(Sketches.hllSparseMerge(
      Sketches.hllSparseMerge(pa.unionByName(pb), 7, 25, Seq("grp"))
        .unionByName(pa), 7, 25, Seq("grp")))
    assert(staged == onePass, "re-merging dense state with a replayed " +
      "sparse shard diverged")
  }

  test("moments sketch: shard partials merge into the one-pass state " +
       "exactly; Cornish-Fisher quantiles track exact percentiles on " +
       "near-normal data; degenerate groups clamp") {
    import spark.implicits._
    // deterministic near-normal values: Irwin-Hall sum of 4 pseudo-
    // uniforms (skew 0, so the CF expansion is in its sweet spot); the
    // four streams use DISTINCT multiplier permutations mod a prime —
    // additive offsets of one stream would sum to a uniform, not a bell
    val primes = Seq(31, 73, 149, 233)
    def u(i: Int, k: Int) = ((i * primes(k)) % 1009) / 1009.0
    val xs = (1 to 4000).map(i => u(i,0) + u(i,1) + u(i,2) + u(i,3))
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x").withColumn("g", lit("a"))

    def rows(s: org.apache.spark.sql.DataFrame) = s.collect().map(r =>
      (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("s1"),
        r.getAs[java.math.BigDecimal]("s2"),
        r.getAs[java.math.BigDecimal]("s3"),
        r.getAs[java.math.BigDecimal]("s4"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toSeq
    val whole = rows(Sketches.momentsState(df, "x", Seq("g")))
    val pa = Sketches.momentsState(df.filter(col("id") % 2 === 0), "x", Seq("g"))
    val pb = Sketches.momentsState(df.filter(col("id") % 2 === 1), "x", Seq("g"))
    assert(rows(Sketches.momentsMerge(pa.unionByName(pb), Seq("g"))) == whole,
      "shard moments must merge into the one-pass state exactly")

    val est = Sketches.momentsQuantiles(
        Sketches.momentsState(df, "x", Seq("g")), Seq(0.5, 0.9), Seq("g"))
      .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("est"))
      .toMap
    val sorted = xs.sorted
    def exact(q: Double) = sorted((q * (sorted.size - 1)).round.toInt)
    assert(math.abs(est(0.5) - exact(0.5)) < 0.05,
      s"p50 estimate ${est(0.5)} vs exact ${exact(0.5)}")
    assert(math.abs(est(0.9) - exact(0.9)) < 0.1,
      s"p90 estimate ${est(0.9)} vs exact ${exact(0.9)}")

    // a constant group: sd = 0, every quantile is the constant (clamped)
    val const = Seq((1L, 2.5), (2L, 2.5)).toDF("id", "x")
      .withColumn("g", lit("c"))
    val cq = Sketches.momentsQuantiles(
        Sketches.momentsState(const, "x", Seq("g")), Seq(0.1, 0.99), Seq("g"))
      .collect().map(_.getAs[Double]("est"))
    assert(cq.forall(_ == 2.5), s"constant group must answer the constant")
  }

  test("count-min never underestimates, and merged shard counters equal " +
       "whole-corpus counters") {
    val d = 4; val w = 512
    val counters = Sketches.cmCounters(toks, "tok", d, w)
    val probes = toks.select(col("tok")).distinct()
    val got = Sketches.cmEstimate(counters, probes, "tok", d, w)
      .join(toks.groupBy("tok").agg(count(lit(1)).as("exact")), Seq("tok"))
    assert(got.filter(col("cm_est") < col("exact")).isEmpty,
      "count-min must only overestimate")
    // sketch-of-union == sum of shard sketches
    val ca = Sketches.cmCounters(toks.filter(col("doc_id") % 2 === 0), "tok", d, w)
    val cb = Sketches.cmCounters(toks.filter(col("doc_id") % 2 === 1), "tok", d, w)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Int]("j"), r.getAs[Int]("bucket"),
        r.getAs[Long]("cnt"))).sorted.toSeq
    assert(rows(Sketches.cmMerge(ca.unionByName(cb))) == rows(counters))
  }

  test("moments store round-trip: ensure builds once then reuses; served " +
       "quantiles are bit-identical to live; grain drift rebuilds") {
    val dir = java.nio.file.Files.createTempDirectory("momstore").toString
    val in = docs.select(col("source"), col("lang"),
      round(graft.functions.TextFunctions.qualityScore(col("text")), 6)
        .as("q"))
    def est(state: org.apache.spark.sql.DataFrame) =
      Sketches.momentsQuantiles(state, Seq(0.5, 0.9), Seq("source", "lang"))
        .orderBy("source", "lang", "q").collect().map(_.toSeq).toSeq
    val (s1, built1) = Sketches.ensureMomentsState(in, dir, "q",
      Seq("source", "lang"))
    assert(built1, "first ensure must build")
    assert(est(s1) == est(Sketches.momentsState(in, "q",
        Seq("source", "lang"))),
      "served quantiles diverged from the live state")
    // reuse: same grain → no rebuild, no rewrite of the saved table
    val files = new java.io.File(s"$dir/moments.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    val (s2, built2) = Sketches.ensureMomentsState(
      sys.error("reuse must not evaluate the corpus"), dir, "q",
      Seq("source", "lang"))
    assert(!built2, "matching grain must reuse")
    assert(new java.io.File(s"$dir/moments.parquet").listFiles()
        .map(f => f.getName -> f.lastModified()).toMap == files,
      "reuse must not rewrite the saved state")
    assert(est(s2) == est(s1), "reloaded state answered differently")
    // grain drift invalidates (T2): different group columns rebuild
    val (s3, built3) = Sketches.ensureMomentsState(
      in.select(col("source"), col("q")), dir, "q", Seq("source"))
    assert(built3, "grain drift must rebuild")
    assert(s3.columns.toSeq ==
      Seq("source", "n", "s1", "s2", "s3", "s4", "lo", "hi"))
    // crash mid-save (no manifest) is invalid
    graft.sources.Bundle.deleteRecursively(s"$dir/manifest.json")
    intercept[IllegalStateException] { Sketches.loadMomentsState(spark, dir) }
    assert(Sketches.ensureMomentsState(in.select(col("source"), col("q")),
      dir, "q", Seq("source"))._2, "manifest-less store must rebuild")
  }

  test("overlap matrix: planted 50% overlap is estimated, disjoint pairs " +
       "shrink to near zero, identical groups are EXACTLY fully contained") {
    import spark.implicits._
    // x: 1..1000; y: 501..1500 (|x∩y| = 500); z: 2001..2500 (disjoint);
    // x2: a byte-identical twin of x (same values → same registers)
    val vals =
      (1 to 1000).map(i => ("x", s"v$i")) ++
      (501 to 1500).map(i => ("y", s"v$i")) ++
      (2001 to 2500).map(i => ("z", s"v$i")) ++
      (1 to 1000).map(i => ("x2", s"v$i"))
    val df = vals.toDF("g", "v")
    val regs = Sketches.hllRegisters(df, "v", b = 9, groupCols = Seq("g"))
    val m = Sketches.hllOverlapMatrix(regs, 9, "g")
      .collect().map(r => (r.getAs[String]("g1"), r.getAs[String]("g2")) -> r)
      .toMap
    assert(m.size == 6, s"4 groups -> 6 unordered pairs, got ${m.size}")

    val xy = m(("x", "y"))
    assert(math.abs(xy.getAs[Double]("est_inter") - 500) / 500 < 0.3,
      s"planted 500-value overlap estimated as ${xy.getAs[Double]("est_inter")}")
    assert(math.abs(xy.getAs[Double]("containment") - 0.5) < 0.15,
      s"containment of the 50%-overlapped pair: ${xy.getAs[Double]("containment")}")

    val xz = m(("x", "z"))
    assert(xz.getAs[Double]("jaccard_est") < 0.08,
      s"disjoint pair jaccard ${xz.getAs[Double]("jaccard_est")}")

    // identical register sets: union == single, so inclusion-exclusion is
    // EXACT arithmetic (est + est - est = est) — no error band needed
    val xx = m(("x", "x2"))
    assert(xx.getAs[Double]("jaccard_est") == 1.0 &&
      xx.getAs[Double]("containment") == 1.0,
      "byte-identical twin groups must be exactly fully overlapping")
    assert(xx.getAs[Double]("est_union") == xx.getAs[Double]("est_a"),
      "union of identical sketches must equal the single estimate")
  }

  test("KMV sketch: estimates track exact distincts, unsaturated groups " +
       "are EXACT, state is partition-order independent, and the direct " +
       "theta intersection lands in band") {
    import spark.implicits._
    // x: 1..5000; y: 4001..9000 (|x∩y| = 1000); tiny: 10 values
    val vals =
      (1 to 5000).map(i => ("x", s"v$i")) ++
      (4001 to 9000).map(i => ("y", s"v$i")) ++
      (1 to 10).map(i => ("tiny", s"t$i"))
    val df = vals.toDF("g", "v")
    val k = 256
    val state = Sketches.kmvState(df, "v", k, Seq("g"))
    // partition-order independence: the bounded aggregator's merge must
    // produce the identical state from any partitioning
    val state8 = Sketches.kmvState(df.repartition(8), "v", k, Seq("g"))
    def rows(s: org.apache.spark.sql.DataFrame) =
      s.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(state) == rows(state8),
      "KMV state must not depend on partitioning")

    val est = Sketches.kmvEstimate(state, k, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    assert(est("tiny") == 10.0, "an unsaturated group must be exact")
    assert(math.abs(est("x") - 5000) / 5000 < 0.2,
      s"KMV estimate for x: ${est("x")}")
    assert(math.abs(est("y") - 5000) / 5000 < 0.2,
      s"KMV estimate for y: ${est("y")}")

    val m = Sketches.kmvOverlapMatrix(state, k, "g").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = m(("x", "y"))
    val inter = xy.getAs[Double]("est_inter")
    assert(inter > 300 && inter < 3000,
      s"planted 1000-value intersection estimated as $inter")
    // tiny is disjoint from both → zero common hashes below any theta
    assert(m(("tiny", "x")).getAs[Long]("common_below") == 0L &&
      m(("tiny", "x")).getAs[Double]("est_inter") == 0.0)
  }

  test("KMV store round-trip: ensure builds once then reuses without " +
       "touching the corpus; k or grain drift rebuilds; manifest-less " +
       "state is invalid") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("kmv-store").toString + "/st"
    val in = (1 to 2000).map(i => ("g" + (i % 3), s"v$i")).toDF("g", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val (s1, built1) = Sketches.ensureKmvState(in, dir, "v", 64, Seq("g"))
    assert(built1, "first ensure must build")
    assert(rows(s1) == rows(Sketches.kmvState(in, "v", 64, Seq("g"))),
      "served state diverged from the live build")
    val (s2, built2) = Sketches.ensureKmvState(
      sys.error("reuse must not evaluate the corpus"), dir, "v", 64,
      Seq("g"))
    assert(!built2 && rows(s2) == rows(s1), "matching params must reuse")
    val (_, built3) = Sketches.ensureKmvState(in, dir, "v", 32, Seq("g"))
    assert(built3, "k drift must rebuild")
    graft.sources.Bundle.deleteRecursively(s"$dir/manifest.json")
    intercept[IllegalStateException] { Sketches.loadKmvState(spark, dir) }
    assert(Sketches.ensureKmvState(in, dir, "v", 32, Seq("g"))._2,
      "manifest-less store must rebuild")
  }

  test("KMV: identical sets are exactly fully overlapping; the state " +
       "caps at k rows per group") {
    import spark.implicits._
    val vals = (1 to 3000).flatMap(i =>
      Seq(("a", s"v$i"), ("b", s"v$i")))
    val state = Sketches.kmvState(vals.toDF("g", "v"), "v", 128, Seq("g"))
    assert(state.groupBy("g").count().collect()
      .forall(_.getLong(1) == 128L), "state must cap at k rows")
    val m = Sketches.kmvOverlapMatrix(state, 128, "g").collect().head
    assert(m.getAs[Double]("jaccard_est") == 1.0,
      "identical k-sets must be exactly fully overlapping")
    assert(m.getAs[Double]("est_inter") == m.getAs[Double]("est_a"),
      "intersection of identical sketches must equal the single estimate")
  }

  test("overlap matrix arithmetic is consistent: inter <= min single, " +
       "union >= max single, jaccard = inter/union on every pair") {
    val st = docs.select(col("source"),
      explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val regs = Sketches.hllRegisters(st, "tok", b = 7,
      groupCols = Seq("source"))
    Sketches.hllOverlapMatrix(regs, 7, "source").collect().foreach { r =>
      val (a, b, u, i) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
        r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"))
      assert(u >= math.max(a, b) - 1e-6,
        s"union $u below a single estimate ($a, $b)")
      assert(i <= math.min(a, b) + 1e-6, s"inter $i above min($a, $b)")
      assert(math.abs(r.getAs[Double]("jaccard_est") -
        BigDecimal(i / u).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9, "jaccard must be round-6 of inter/union")
    }
  }

  test("overlap matrix clamps est_inter at min(est_a, est_b) when the " +
       "linear-counting branch switch makes the union estimate " +
       "non-monotone (containment stays <= 1)") {
    import spark.implicits._
    // crafted registers, b = 7 (m = 128): group A fills 127 buckets at
    // rho 1 (raw e ~ 182 <= 2.5m with one zero -> linear counting gives
    // 128*ln(128) ~ 621); group B fills only bucket 127 (LC ~ 1.004);
    // their union fills ALL buckets (zeros = 0 -> raw ~ 183 < 621). So
    // inclusion-exclusion yields est_a + est_b - est_union ~ 439 >>
    // min = est_b — exactly the excursion the clamp must cap.
    val regs = ((0 until 127).map(b => ("A", b, 1)) :+ ("B", 127, 1))
      .toDF("g", "bucket", "max_rho")
    val r = Sketches.hllOverlapMatrix(regs, 7, "g").collect()
    assert(r.length == 1)
    val (a, b, u, i, c) = (r(0).getAs[Double]("est_a"),
      r(0).getAs[Double]("est_b"), r(0).getAs[Double]("est_union"),
      r(0).getAs[Double]("est_inter"), r(0).getAs[Double]("containment"))
    assert(u < a, s"test premise: union estimate $u must dip below $a")
    assert(a + b - u > math.min(a, b),
      "test premise: raw inclusion-exclusion must exceed the min")
    assert(i == math.min(a, b), s"est_inter $i must clamp to min($a, $b)")
    assert(c == 1.0, s"containment must cap at 1.0, got $c")
  }

  test("KMV aggregator self-heals a zero-capacity buffer: reduce after a " +
       "merge of two empty partials grows from length 0") {
    val agg = new Sketches.KmvAgg(4)
    val empty = Sketches.KmvBuf(new Array[Long](0), 0)
    // merge(empty, empty) legally returns a zero-length data array
    val merged = agg.merge(empty, empty)
    assert(merged.data.length == 0 && merged.n == 0)
    val filled = Seq(50L, 10L, 40L, 20L, 30L).foldLeft(merged)(agg.reduce)
    assert(agg.finish(filled).toSeq == Seq(10L, 20L, 30L, 40L),
      "k smallest must survive growth from the empty merge result")
  }
}
