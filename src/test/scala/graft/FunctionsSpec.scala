package graft

import org.apache.spark.sql.functions._
import graft.functions.{ScatteringFunctions, TextFunctions, TimeFunctions, VectorFunctions}

/** G1–G12 scalar functions + text/vector primitives. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("_x").select(c.as("v")).collect()(0).getAs[T]("v")

  // -------------------------------------------------------- normalize ----
  test("NfcNormalize composes combining sequences, passes through the rest") {
    import graft.functions.Normalize.nfcNormalize
    // e + combining acute → é; b + combining acute has no precomposed form
    assert(one[String](nfcNormalize(lit("é"))) == "é")
    assert(one[String](nfcNormalize(lit("b́"))) == "b́")
    assert(one[String](nfcNormalize(lit("plain ascii"))) == "plain ascii")
    assert(one[String](nfcNormalize(lit(null).cast("string"))) == null)
    // registered in SQL through GraftExtensions too
    assert(spark.sql("SELECT nfc_normalize('Å') AS v")
      .collect()(0).getString(0) == "Å")
    // stays inside whole-stage codegen: the projection over it compiles
    val df = Seq("å", "x").toDF("s")
      .select(nfcNormalize($"s").as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("WholeStageCodegen") ||
      df.collect().map(_.getString(0)).toSet == Set("å", "x"))
    assert(df.collect().map(_.getString(0)).toSet == Set("å", "x"))
  }

  // ------------------------------------------------------------- time ----
  test("strToTime parses units, off sentinel, null on garbage") {
    def p(s: String): java.lang.Double =
      Seq(s).toDF("s").select(TimeFunctions.strToTime($"s").as("v"))
        .collect()(0).getAs[java.lang.Double]("v")
    assert(approx(p("100ps"), 1e-10))
    assert(approx(p("1.5ns"), 1.5e-9))
    assert(approx(p("-2us"), -2e-6))
    assert(approx(p("3ms"), 3e-3))
    assert(approx(p("5fs"), 5e-15))
    assert(approx(p("7s"), 7.0))
    assert(approx(p("42"), 42.0)) // bare number = seconds
    assert(approx(p("off"), -10.0))
    assert(p("xyz") == null)
  }

  test("timeToStr formats engineering units with sign") {
    def f(v: Double): String =
      Seq(v).toDF("v").select(TimeFunctions.timeToStr($"v").as("s"))
        .collect()(0).getAs[String]("s")
    assert(f(1e-10) == "+100.00ps")
    assert(f(-1.5e-9) == "-1.50ns")
    assert(f(0.0) == "+0.00s")
    assert(f(2.5e-6) == "+2.50us")
    assert(f(3.0) == "+3.00s")
  }

  test("strToTime ∘ timeToStr round-trips on representable values") {
    val vals = Seq(1e-12, 2.5e-9, -4e-6, 1.25e-3, 7.0)
    val df = vals.toDF("v")
      .select($"v", TimeFunctions.strToTime(TimeFunctions.timeToStr($"v")).as("rt"))
    df.collect().foreach { r =>
      val (v, rt) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(v - rt) <= math.abs(v) * 1e-9 + 1e-30, s"$v -> $rt")
    }
  }

  test("basename / removeExtension / delay token") {
    val df = Seq("/a/b/run3_+100ps_0001.edf.gz").toDF("p")
    val r = df.select(
      TimeFunctions.basename($"p").as("b"),
      TimeFunctions.removeExtension(TimeFunctions.basename($"p")).as("s"),
      TimeFunctions.delayTokenFromFilename($"p").as("d")).collect()(0)
    assert(r.getAs[String]("b") == "run3_+100ps_0001.edf.gz")
    assert(r.getAs[String]("s") == "run3_+100ps_0001")
    assert(r.getAs[String]("d") == "+100ps")
  }

  test("safeFloat: parse-or-null under ANSI") {
    val df = Seq("1.5", " 2e3 ", "n/a", "", "-.5").toDF("s")
    val got = df.select(TimeFunctions.safeFloat($"s").as("v"))
      .collect().map(r => Option(r.getAs[java.lang.Double]("v")).map(_.toDouble))
    assert(got.toSeq == Seq(Some(1.5), Some(2000.0), None, None, Some(-0.5)))
  }

  test("SQL registry: graft_* functions callable from spark.sql") {
    graft.functions.SqlRegistry.register(spark)
    val r = spark.sql(
      """SELECT graft_str_to_time('100ps') AS a,
        |       graft_str_to_time('off') AS b,
        |       graft_time_to_str(1.5e-9) AS c,
        |       graft_transmission(1.0, 2.0) AS d""".stripMargin).collect()(0)
    assert(approx(r.getAs[Double]("a"), 1e-10))
    assert(approx(r.getAs[Double]("b"), -10.0))
    assert(r.getAs[String]("c") == "+1.50ns")
    assert(approx(r.getAs[Double]("d"), math.exp(-0.5), 1e-12))
  }

  // ------------------------------------------------------- scattering ----
  test("q ↔ 2θ round-trip and E ↔ λ") {
    val lambda = 1.54
    val df = Seq(1.0, 2.0, 3.5).toDF("q")
    df.select($"q", ScatteringFunctions.radToQ(
        ScatteringFunctions.qToTwoTheta($"q", lambda), lambda).as("rt"))
      .collect().foreach(r => assert(approx(r.getDouble(0), r.getDouble(1), 1e-12)))
    assert(approx(one[Double](ScatteringFunctions.xrayWavelength(lit(12.398419843320026))), 1.0, 1e-12))
  }

  test("cubic cell d-spacing: d(100)=a, multiplicity structure") {
    val cell = ScatteringFunctions.UnitCell(5.0, 5.0, 5.0)
    val d100 = one[Double](ScatteringFunctions.dSpacing(lit(1), lit(0), lit(0), cell))
    assert(approx(d100, 5.0, 1e-9))
    val d110 = one[Double](ScatteringFunctions.dSpacing(lit(1), lit(1), lit(0), cell))
    assert(approx(d110, 5.0 / math.sqrt(2), 1e-9))
    val q100 = one[Double](ScatteringFunctions.qOfReflection(lit(1), lit(0), lit(0), cell))
    assert(approx(q100, 2 * math.Pi / 5.0, 1e-9))
  }

  test("transmission / absorbance") {
    assert(approx(one[Double](ScatteringFunctions.transmission(lit(1.0), lit(2.0))),
      math.exp(-0.5), 1e-12))
    assert(approx(one[Double](ScatteringFunctions.absorbance(lit(math.exp(-2.0)))), 2.0, 1e-12))
  }

  // ------------------------------------------------------------- text ----
  test("tokens, shingles, counts") {
    val df = Seq("The quick brown fox, the lazy dog!").toDF("t")
    val r = df.select(
      TextFunctions.tokenCount($"t").as("n"),
      TextFunctions.shingles($"t", 3).as("sh"),
      TextFunctions.wordOccurrences($"t", "the").as("the")).collect()(0)
    assert(r.getAs[Int]("n") == 7)
    val sh = r.getSeq[String](1)
    assert(sh.head == "the quick brown" && sh.size == 5)
    assert(r.getAs[Long]("the") == 2L)
  }

  test("shingles on short text are empty, minhashJaccard null-safe") {
    val df = Seq("one two").toDF("t")
    assert(df.select(TextFunctions.shingles($"t", 3).as("sh"))
      .collect()(0).getSeq[String](0).isEmpty)
    val j = df.select(VectorFunctions.minhashJaccard(
      TextFunctions.shingles($"t", 3), TextFunctions.shingles($"t", 3)).as("j"))
      .collect()(0).getAs[java.lang.Double]("j")
    assert(j == null)
  }

  test("langId picks the dominant profile; und on no hits") {
    def lid(s: String): String =
      Seq(s).toDF("t").select(TextFunctions.langId($"t").as("l"))
        .collect()(0).getAs[String]("l")
    assert(lid("the cat and the dog is here with food") == "en")
    assert(lid("der hund und die katze ist nicht hier") == "de")
    assert(lid("zzz qqq 123") == "und")
  }

  test("quality score stays in [0,1]") {
    val docs = Seq("", "short", "the " * 200, "!!!???;;;:::", "a solid sentence with the usual words in it.")
    val vals = docs.toDF("t").select(TextFunctions.qualityScore($"t").as("q"))
      .collect().map(_.getDouble(0))
    vals.foreach(v => assert(v >= 0.0 && v <= 1.0, s"score $v out of range"))
  }

  test("fingerprint normalizes whitespace and case; rollingHash is stable") {
    val df = Seq(("Hello   World", "hello world"), ("a  b", "A B")).toDF("x", "y")
    df.select((TextFunctions.fingerprint($"x") === TextFunctions.fingerprint($"y")).as("eq"))
      .collect().foreach(r => assert(r.getBoolean(0)))
    val rh = Seq("ab").toDF("t").select(TextFunctions.rollingHash($"t").as("h"))
      .collect()(0).getLong(0)
    assert(rh == 97L * 31 + 98) // 'a'*31 + 'b'
  }

  test("G8 volumeFraction / molecularMassFromI0 match reference formulas") {
    // volumeFraction(1 mM, 17 kDa, 1.347 g/ml) = 17/1.347/1e3 (scattering.py:12-19)
    val r = Seq((1.0, 17.0, 0.05, 0.002)).toDF("conc", "mw", "i0", "c")
      .select(
        ScatteringFunctions.volumeFraction($"conc", $"mw", lit(1.347)).as("vf"),
        ScatteringFunctions.molecularMassFromI0($"i0", $"c", lit(1.347)).as("mm"))
      .collect()(0)
    assert(approx(r.getAs[Double]("vf"), 17.0 / 1.347 / 1e3))
    val drm = 2.67e10 / 1.347
    assert(approx(r.getAs[Double]("mm"), 0.05 * 6e23 / (0.002 * drm * drm)))
  }

  test("G7 attenuationLength: exact at table points, monotone between") {
    // at a tabulated energy the interpolation hits the point exactly:
    // Si @ 10 keV: 0.01/(33.89*2.33) m
    val df = Seq(10.0, 12.5, 15.0).toDF("e")
    val lam = df.select(ScatteringFunctions
        .attenuationLength("Si", $"e").as("l")).as[Double].collect()
    assert(approx(lam(0), 0.01 / (33.89 * 2.33)))
    assert(approx(lam(2), 0.01 / (10.34 * 2.33)))
    assert(lam(0) < lam(1) && lam(1) < lam(2)) // harder X-rays go further
    // density override (reference phosphor screen, absorption.py:62);
    // the expected value reads the served Ce grid point (15 keV is a
    // base grid energy of the r18 generated table)
    val muCe15 = ScatteringFunctions.elementInfo("Ce").get.mu
      .find(_._1 == 15.0).get._2
    val ce = Seq(15.0).toDF("e").select(ScatteringFunctions
      .attenuationLength("Ce", $"e", Some(4.75)).as("l")).as[Double].collect()
    assert(approx(ce(0), 0.01 / (muCe15 * 4.75)))
  }

  test("G7 formula parser: symbols, counts, parentheses, errors") {
    import ScatteringFunctions.parseFormula
    assert(parseFormula("H2O") == Seq("H" -> 2, "O" -> 1))
    assert(parseFormula("CeO2") == Seq("Ce" -> 1, "O" -> 2))
    assert(parseFormula("C22H10N2O5") ==
      Seq("C" -> 22, "H" -> 10, "N" -> 2, "O" -> 5))
    assert(parseFormula("Al2(SiO4)3") ==
      Seq("Al" -> 2, "O" -> 12, "Si" -> 3))
    assert(parseFormula("Fe") == Seq("Fe" -> 1))
    intercept[IllegalArgumentException](parseFormula("(H2O"))
    intercept[IllegalArgumentException](parseFormula("h2o"))
    // parseable but untabulated element → clear error at weights time
    // (Z > 92 stays outside even the r18 full-table generation; U and F
    // both joined in r18, Na in r15, Ca in r14)
    intercept[IllegalArgumentException](
      ScatteringFunctions.formulaWeights("PuF6"))
    assert(ScatteringFunctions.formulaWeights("UF6").size == 2)
    assert(ScatteringFunctions.formulaWeights("NaCl").size == 2)
    assert(ScatteringFunctions.formulaWeights("Ca(OH)2").size == 3)
  }

  test("G7 extended element table: two-sided K edges (Fe 7.112 jumps " +
       "~8x), heavy-metal L edges, monotone photoelectric branches, and " +
       "PVC (needs Cl) resolves end to end") {
    import ScatteringFunctions.{Elements, attenuationLength, massAttenuation}
    def muAt(el: String, e: Double): Double = Seq(e).toDF("e")
      .select(massAttenuation(el, $"e").as("m")).as[Double].head()
    // Fe ACROSS its K edge: the discontinuity is real now, not smeared
    val feBelow = muAt("Fe", 7.0)
    val feAbove = muAt("Fe", 7.2)
    assert(feAbove / feBelow > 5.0 && feAbove / feBelow < 10.0,
      s"Fe K-edge jump must be ~8x: $feBelow -> $feAbove")
    // original anchors unchanged (q51/q54 stability); approx: the
    // interpolation chain reconstructs an anchor to ~1 ulp, not ==
    assert(approx(muAt("Fe", 8.0), 305.6, 1e-9))
    assert(approx(muAt("Fe", 10.0), 170.6, 1e-9))
    assert(approx(muAt("Cu", 10.0), 215.9, 1e-9))
    assert(approx(muAt("Si", 10.0), 33.89, 1e-9))
    // published-value spot checks on the extension's anchors
    assert(approx(muAt("W", 20.0), 65.7, 1e-9))
    assert(approx(muAt("W", 30.0), 22.7, 1e-9))
    assert(approx(muAt("Pb", 10.0), 130.6, 1e-9))
    assert(approx(muAt("Au", 20.0), 78.8, 1e-9))
    assert(approx(muAt("Ca", 10.0), 102.0, 1e-9))
    assert(approx(muAt("Ti", 10.0), 110.7, 1e-9))
    // L3 jumps land in the textbook 2-3x band
    for ((el, l3) <- Seq(("W", 10.207), ("Pt", 11.564), ("Au", 11.919),
        ("Pb", 13.035))) {
      val r = muAt(el, l3 + 0.002) / muAt(el, l3 - 0.002)
      assert(r > 2.0 && r < 3.0, s"$el L3 jump $r outside [2,3]")
    }
    // within every inter-edge branch the table is strictly decreasing
    for ((el, info) <- Elements) {
      info.mu.sliding(2).foreach { case Seq((e1, m1), (e2, m2)) =>
        if (e2 - e1 > 0.01) // same-branch pair (not an edge step)
          assert(m2 < m1, s"$el: mu must decrease $e1->$e2 ($m1 -> $m2)")
      }
    }
    // PVC: parser -> Cl table -> mixture -> known compound density
    val wts = ScatteringFunctions.formulaWeights("C2H3Cl").toMap
    assert(math.abs(wts("Cl") - 35.45 / (2 * 12.011 + 3 * 1.008 + 35.45))
      < 1e-12)
    val muPvc = Seq(10.0).toDF("e")
      .select(massAttenuation("C2H3Cl", $"e").as("m")).as[Double].head()
    val hand = wts("C") * 2.373 + wts("H") * 0.3854 + wts("Cl") * 57.8
    assert(approx(muPvc, hand, 1e-9), s"PVC mixture $muPvc != $hand")
    val lam = Seq(10.0).toDF("e")
      .select(attenuationLength("C2H3Cl", $"e").as("l")).as[Double].head()
    assert(approx(lam, 0.01 / (hand * 1.38), 1e-12))
  }

  test("G7 arbitrary compounds: mass-weighted mixture of per-element " +
       "tables — hand-computed CeO2, polyimide, alumina; element-built " +
       "H2O agrees with the legacy compound table") {
    import ScatteringFunctions.formulaWeights
    // the hand computation: the SAME mixture arithmetic, written out here
    // independently over the element tables
    def muAt(el: String, e: Double): Double = {
      val pts = ScatteringFunctions.elementInfo(el).get.mu
      def x(v: Double) = 1.0 / (v * v * v)
      if (e <= pts.head._1) pts.head._2
      else pts.sliding(2).collectFirst {
        case Seq((e1, m1), (e2, m2)) if e <= e2 =>
          (x(e) - x(e1)) * ((m2 - m1) / (x(e2) - x(e1))) + m1
      }.getOrElse(pts.last._2)
    }
    def mixture(f: String, e: Double): Double =
      formulaWeights(f).map { case (el, w) => muAt(el, e) * w }.sum
    for ((f, e) <- Seq(("CeO2", 10.0), ("CeO2", 12.5),
        ("C22H10N2O5", 8.0), ("C22H10N2O5", 17.0), ("Al2O3", 10.0))) {
      val got = Seq(e).toDF("e")
        .select(ScatteringFunctions.massAttenuation(f, $"e").as("mu"))
        .as[Double].head()
      assert(approx(got, mixture(f, e), 1e-9),
        s"$f @ $e keV: engine $got != hand ${mixture(f, e)}")
    }
    // CeO2 @ 10 keV sanity vs the weights themselves: w(Ce)=0.8141,
    // both element points tabulated, so the value is exact arithmetic
    // (Ce's 10 keV point read from the served r18 grid)
    val wCe = 140.116 / (140.116 + 2 * 15.999)
    val ceo2 = Seq(10.0).toDF("e")
      .select(ScatteringFunctions.massAttenuation("CeO2", $"e").as("mu"))
      .as[Double].head()
    assert(approx(ceo2, wCe * muAt("Ce", 10.0) + (1 - wCe) * 5.952, 1e-9))
    // element-built H2O tracks the legacy compound table (<0.5% at the
    // shared grid; the tables were sourced independently)
    for (e <- Seq(5.0, 8.0, 10.0, 15.0, 20.0, 30.0)) {
      val legacy = Seq(e).toDF("e")
        .select(ScatteringFunctions.massAttenuation("H2O", $"e").as("mu"))
        .as[Double].head()
      val built = mixture("H2O1", e) // H2O1 dodges the legacy-table name
      assert(math.abs(built - legacy) / legacy < 0.005,
        s"H2O element mixture off at $e keV: $built vs $legacy")
    }
    // attenuationLength density resolution: known compound density,
    // single-element bulk, explicit override, and the loud failure
    val lamCeO2 = Seq(10.0).toDF("e")
      .select(ScatteringFunctions.attenuationLength("CeO2", $"e").as("l"))
      .as[Double].head()
    assert(approx(lamCeO2, 0.01 / (ceo2 * 7.22), 1e-12))
    val lamFe = Seq(10.0).toDF("e")
      .select(ScatteringFunctions.attenuationLength("Fe", $"e").as("l"))
      .as[Double].head()
    assert(approx(lamFe, 0.01 / (170.6 * 7.874), 1e-12))
    intercept[IllegalArgumentException](
      ScatteringFunctions.attenuationLength("C3H6", lit(10.0)))
  }

  test("md5Hash60: matches hand-parsed md5 prefix, words independent") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    val r = Seq("abc").toDF("t").select(
      TextFunctions.md5Hash60($"t").as("h1"),
      TextFunctions.md5Hash60b($"t").as("h2")).collect()(0)
    assert(r.getLong(0) == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(r.getLong(1) == java.lang.Long.parseLong("0d6963f7d28e17f", 16))
    assert(r.getLong(0) >= 0 && r.getLong(1) >= 0) // 60-bit: always positive
  }

  // ----------------------------------------------------------- vector ----
  test("dot / norm / cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot($"a", $"b").as("d"),
      VectorFunctions.l2Norm($"a").as("n"),
      VectorFunctions.cosine($"a", $"a").as("cs")).collect()(0)
    assert(approx(r.getAs[Double]("d"), 32.0))
    assert(approx(r.getAs[Double]("n"), math.sqrt(14.0)))
    assert(approx(r.getAs[Double]("cs"), 1.0, 1e-12))
  }

  test("simhash: identical docs collide, hamming64 counts bits") {
    val df = Seq(("a b c d e", "a b c d e"), ("a b c d e", "x y z w v")).toDF("x", "y")
    val r = df.select(
      VectorFunctions.hamming64(
        VectorFunctions.simhash(TextFunctions.tokens($"x")),
        VectorFunctions.simhash(TextFunctions.tokens($"y"))).as("h")).collect()
    assert(r(0).getAs[Int]("h") == 0)
    assert(r(1).getAs[Int]("h") > 0)
  }

  test("lshSignatures row-form equals the per-row expression path") {
    val rnd = new scala.util.Random(3)
    val df = (0L until 50L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val rowForm = VectorFunctions.lshSignatures(df, nBits = 6, dim = 16)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket")).toMap
    val exprForm = df.select($"vec_id",
      VectorFunctions.lshSignature($"embedding", 6, 16).as("b"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("b")).toMap
    rowForm.foreach { case (id, b) => assert(exprForm(id) == b, s"vec $id") }
  }

  test("minhash signature: identical sets agree, jaccard estimate sane") {
    val df = Seq(("a b c d e f g h", "a b c d e f g h")).toDF("x", "y")
    val j = df.select(VectorFunctions.minhashJaccard(
      VectorFunctions.minhashSignature(TextFunctions.shingles($"x", 2), 16),
      VectorFunctions.minhashSignature(TextFunctions.shingles($"y", 2), 16)).as("j"))
      .collect()(0).getDouble(0)
    assert(approx(j, 1.0))
  }

  test("t-digest: exact below compression, bounded rank error at scale") {
    import graft.functions.TDigestSketch
    // exact regime: every value survives as a singleton centroid and the
    // interpolated median equals the exact even-count median
    val small = (1 to 50).map(_.toDouble)
    val (sm, sw) = TDigestSketch.compress(small, Seq.fill(50)(1.0), 200)
    assert(sm.length == 50)
    assert(approx(TDigestSketch.quantile(sm, sw, 0.5), 25.5))
    // compressed regime: 10k skewed values at compression 100 — size stays
    // ~compression, quantile rank error within the 1/compression bound
    val vals = (0 until 10000).map(i => math.pow(i.toDouble / 9999.0, 3))
    val (m, w) = TDigestSketch.compress(vals, Seq.fill(10000)(1.0), 100)
    assert(m.length >= 90 && m.length <= 250, s"${m.length} centroids")
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = TDigestSketch.quantile(m, w, q)
      val rank = vals.count(_ <= est).toDouble / vals.size
      assert(math.abs(rank - q) <= 0.015, s"q=$q rank=$rank")
    }
    // merge of two half-sketches ranks the same as one full sketch
    val (m1, w1) = TDigestSketch.compress(vals.take(5000), Seq.fill(5000)(1.0), 100)
    val (m2, w2) = TDigestSketch.compress(vals.drop(5000), Seq.fill(5000)(1.0), 100)
    val (mm, mw) = TDigestSketch.compress(m1 ++ m2, w1 ++ w2, 100)
    val est = TDigestSketch.quantile(mm, mw, 0.5)
    val rank = vals.count(_ <= est).toDouble / vals.size
    assert(math.abs(rank - 0.5) <= 0.015, s"merged rank=$rank")
  }

  // -------------------------------------------------------------- URLs ---
  test("urlNormalize canonicalizes case, www, ports, tracking, fragments") {
    def n(u: String): String =
      one[String](graft.functions.TextFunctions.urlNormalize(lit(u)))
    assert(n("HTTPS://WWW.Example.COM:443/Path/?utm_source=a&q=1#frag")
      == "https://example.com/Path/?q=1")
    assert(n("http://www.site.org:80/a/") == "http://site.org/a")
    assert(n("https://sub.domain.co.uk/x?fbclid=abc")
      == "https://sub.domain.co.uk/x")
    assert(n("https://example.com/") == "https://example.com")
    assert(n("https://example.com/a?q=1&utm_medium=m&r=2")
      == "https://example.com/a?q=1&r=2")
    // port only stripped when it is the scheme default
    assert(n("http://example.com:8080/a") == "http://example.com:8080/a")
  }

  test("registeredDomain extracts eTLD+1 with multi-label suffixes") {
    def d(u: String): String =
      one[String](graft.functions.TextFunctions.registeredDomain(lit(u)))
    assert(d("https://a.b.example.co.uk/x") == "example.co.uk")
    assert(d("http://www.example.com/page?x=1") == "example.com")
    assert(d("deep.sub.example.com") == "example.com")
    assert(d("https://example.org") == "example.org")
    assert(d("localhost") == "localhost")
    assert(d("https://shop.example.com.au/cart") == "example.com.au")
  }

  test("native PQ expressions equal the lambda forms bit-for-bit, " +
       "codegen and interpreted") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cbs = Similarity.trainPqCodebooks(emb, m = 8, k = 16, dim = 64,
      iters = 10)
    val qv = emb.orderBy("vec_id").limit(1).select(col("embedding"))
      .collect()(0).getSeq[Float](0).map(_.toDouble)

    def check(): Unit = {
      // encode: float input path (embeddings are array<float>)
      val enc = emb.select(
        Similarity.pqCodes(col("embedding"), cbs).as("native"),
        Similarity.pqCodesLambda(col("embedding"), cbs).as("lambda"))
      assert(enc.filter(not(col("native") <=> col("lambda"))).count() == 0,
        "native pq_encode diverged from the lambda form")
      // ADC: double query path, codes from the (already equal) encoder
      val adc = emb.select(
          Similarity.pqCodes(col("embedding"), cbs).as("codes"),
          typedLit(qv).as("qv"))
        .select(Similarity.adcDist(cbs).as("native"),
          Similarity.adcDistLambda(cbs).as("lambda"))
      assert(adc.filter(not(col("native") <=> col("lambda"))).count() == 0,
        "native adc_dist diverged from the lambda form")
    }

    // codegen'd path, with fallback DISABLED: under the default FALLBACK
    // mode a doGenCode that emits uncompilable Java silently degrades to
    // the interpreted path and this A/B pin still passes (it did — the
    // r8 kernel referenced UnsafeArrayData under the wrong package and
    // nobody noticed); CODEGEN_ONLY turns a compile failure into a test
    // failure
    // both knobs: factoryMode covers expression-level projections,
    // codegen.fallback covers whole-stage codegen compile failures
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try check() finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
    // interpreted path (nullSafeEval): force the expression factory off
    // codegen — a generated-code bug and an eval bug must not differ
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("native vector kernels equal the HOF lambda forms bit-for-bit, " +
       "codegen and interpreted (r18 optimization)") {
    import org.apache.spark.sql.functions._
    import graft.functions.{VectorExpressions, VectorFunctions => VF}
    import org.apache.spark.sql.graft.PlanExec
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // pair every vector with a rotated copy: float-input path, plus edge
    // rows — null vector, null element, length mismatch, NaN element
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .withColumn("b", reverse(col("a")))
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(null AS array<double>), array(1.0d, 2.0d)),
        |  (array(1.0d, CAST(null AS double)), array(1.0d, 2.0d)),
        |  (array(1.0d, 2.0d), array(1.0d)),
        |  (array(1.0d, CAST('NaN' AS double)), array(3.0d, 4.0d)),
        |  (array(), array()),
        |  (array(-1e-9d, 0.0d), array(1.0d, 0.0d))
        |AS t(a, b)""".stripMargin)

    def check(): Unit = {
      for (df <- Seq(pairs.select(col("a"), col("b")), edge)) {
        val out = df.select(
          VF.cosine(col("a"), col("b")).as("n_cos"),
          VF.cosineLambda(col("a"), col("b")).as("l_cos"),
          VF.sqL2(col("a"), col("b")).as("n_l2"),
          VF.sqL2Lambda(col("a"), col("b")).as("l_l2"),
          VF.dot(col("a"), col("b")).as("n_dot"),
          VF.dotLambda(col("a"), col("b")).as("l_dot"))
        assert(out.filter(not(col("n_cos") <=> col("l_cos"))).count() == 0,
          "native cosine diverged from the lambda form")
        assert(out.filter(not(col("n_l2") <=> col("l_l2"))).count() == 0,
          "native sqL2 diverged from the lambda form")
        assert(out.filter(not(col("n_dot") <=> col("l_dot"))).count() == 0,
          "native dot diverged from the lambda form")
      }
      // lsh bits: float path + null/NaN edges, multi-table offsets. The
      // edge vectors are built at the FULL dim (64) with the null/NaN
      // element inside — shorter edge rows were silently filtered out of
      // the pin, leaving the '0'-on-null and NaN-dot branches uncompared.
      val vecs = emb.select(col("embedding").as("v"))
        .unionByName(spark.sql(
          """SELECT CAST(null AS array<double>) AS v
            |UNION ALL SELECT transform(sequence(1, 64), i ->
            |  CASE WHEN i = 3 THEN CAST(null AS double)
            |       ELSE CAST(i AS double) END)
            |UNION ALL SELECT transform(sequence(1, 64), i ->
            |  CASE WHEN i = 5 THEN CAST('NaN' AS double)
            |       ELSE CAST(i - 32 AS double) END)""".stripMargin)
          .select(col("v").cast("array<float>")))
      for (start <- Seq(0, 6)) {
        // the lambda twin of lshBits(start, n, dim): per-bit when/concat
        val lambdaBits = concat((0 until 6).map(j =>
          when(VF.hyperplaneBit(col("v"), start + j, 64) === 1, "1")
            .otherwise("0")): _*)
        val lb = vecs
          .select(VF.lshBits(col("v"), start, 6, 64).as("native"),
            coalesce(lambdaBits, lit("0" * 6)).as("lambda"))
        assert(lb.filter(not(col("native") <=> col("lambda"))).count() == 0,
          s"native lshBits(start=$start) diverged from the lambda form")
      }
      // minhash jaccard incl. length mismatch + empty
      val sigs = spark.sql(
        """SELECT * FROM VALUES
          |  (array(1L, 2L, 3L), array(1L, 9L, 3L)),
          |  (array(1L, 2L), array(1L, 2L, 3L)),
          |  (array(1L, 2L, 3L), array(1L)),
          |  (array(), array(1L)),
          |  (CAST(null AS array<bigint>), array(1L))
          |AS t(a, b)""".stripMargin)
      val mj = sigs.select(
        VF.minhashJaccard(col("a"), col("b")).as("native"),
        VF.minhashJaccardLambda(col("a"), col("b")).as("lambda"))
      assert(mj.filter(not(col("native") <=> col("lambda"))).count() == 0,
        "native minhashJaccard diverged from the lambda form")
      // nearest-centroid kernel vs the struct-sort / max(struct) forms
      val cents = emb.orderBy("vec_id").limit(3)
        .select(VF.asDouble(col("embedding"))).collect()
        .map(_.getSeq[Double](0)).toSeq
      val cids = Seq(2L, 5L, 9L) // non-contiguous, ascending
      def l2Lambda(v: org.apache.spark.sql.Column) = {
        val dists = cents.zipWithIndex.map { case (cv, i) =>
          struct(round(VF.sqL2Lambda(v, typedLit(cv)), 6).as("d2"),
            lit(cids(i)).as("cell"))
        }
        element_at(array_sort(array(dists: _*)), 1).getField("cell")
      }
      def cosLambda(v: org.apache.spark.sql.Column) = {
        val cands = cents.zipWithIndex.map { case (cv, i) =>
          struct(round(VF.cosineLambda(v, typedLit(cv)), 6).as("_cos"),
            lit(-cids(i)).as("_negcid"))
        }
        -greatest(cands: _*).getField("_negcid")
      }
      val nc = emb.select(col("embedding").as("v")).select(
        PlanExec.column(VectorExpressions.NearestCentroidExpr(
          PlanExec.expression(col("v").cast("array<double>")),
          cents, cids, cosineMode = false)).as("n_l2"),
        l2Lambda(col("v")).as("l_l2"),
        PlanExec.column(VectorExpressions.NearestCentroidExpr(
          PlanExec.expression(col("v").cast("array<double>")),
          cents, cids, cosineMode = true)).as("n_cos"),
        cosLambda(col("v")).as("l_cos"))
      assert(nc.filter(not(col("n_l2") <=> col("l_l2"))).count() == 0,
        "nearest-centroid (l2) diverged from the struct-sort form")
      assert(nc.filter(not(col("n_cos") <=> col("l_cos"))).count() == 0,
        "nearest-centroid (cos) diverged from the max(struct) form")
      // identical-score tie-break: duplicate centroids → smallest cid
      val dupCents = Seq(cents.head, cents.head)
      val tie = emb.limit(8).select(col("embedding").as("v")).select(
        PlanExec.column(VectorExpressions.NearestCentroidExpr(
          PlanExec.expression(col("v").cast("array<double>")),
          dupCents, Seq(3L, 7L), cosineMode = true)).as("c"),
        PlanExec.column(VectorExpressions.NearestCentroidExpr(
          PlanExec.expression(col("v").cast("array<double>")),
          dupCents, Seq(3L, 7L), cosineMode = false)).as("l"))
      assert(tie.filter(col("c") =!= 3L || col("l") =!= 3L).count() == 0,
        "tie-break must pick the smallest cid in both modes")
    }

    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try check() finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() finally
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
