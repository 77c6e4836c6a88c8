package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{ScatteringFunctions, TimeFunctions}
import graft.functions.ScatteringFunctions.UnitCell
import QueryUtil._
import Tables._

/** Scalar-function queries (SURVEY §2.8/§2.9): time-with-unit parsing and
  * formatting, filename munging, scattering conversions, unit-cell
  * reflection enumeration (A13). Oracle SQL interpolates the exact Scala
  * double constants so both engines evaluate identical IEEE expressions.
  */
object FunctionQueries {

  val Cell = UnitCell(5.64, 5.64, 5.64) // cubic NaCl-like cell

  val defs: Seq[QueryDef] = Seq(

    // G1 — `"100ps"`-style parsing with the 'off' sentinel.
    QueryDef("q26_g1_str_to_time",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val unit = when(col("l_orderkey") % 3 === 0, "ps")
          .when(col("l_orderkey") % 3 === 1, "ns").otherwise("us")
        val str = when(col("l_orderkey") % 11 === 0, "off")
          .otherwise(concat((col("l_linenumber") * 10).cast("string"), unit))
        // Project the string BEFORE parsing: strToTime references its input
        // several times (trim/regexp/off-check); inlined, the when-concat
        // tree is duplicated per reference and the generated class takes
        // seconds to janino-compile (measured 5.2 s inline vs 1.5 s split —
        // CollapseProject keeps the barrier because `_s` is non-cheap and
        // multiply referenced).
        li.select(str.as("_s"))
          .select(TimeFunctions.strToTime(col("_s")).as("delay"))
          .groupBy(col("delay")).agg(count(lit(1)).as("n"))
          .orderBy("delay")
      },
      Some("""WITH parsed AS (
        |  SELECT CASE WHEN l_orderkey % 11 = 0 THEN -10.0
        |    ELSE (l_linenumber * 10)::DOUBLE *
        |      CASE WHEN l_orderkey % 3 = 0 THEN 1e-12
        |           WHEN l_orderkey % 3 = 1 THEN 1e-9
        |           ELSE 1e-6 END
        |    END AS delay
        |  FROM lineitem)
        |SELECT delay, count(*) AS n FROM parsed
        |GROUP BY delay ORDER BY delay""".stripMargin)),

    // G2 — engineering-unit time formatting.
    QueryDef("q27_g2_time_to_str",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val factor = when(col("l_orderkey") % 2 === 0, 1e-12).otherwise(1e-9)
        val t = (col("l_quantity") * factor) *
          when(col("l_linenumber") % 2 === 0, -1.0).otherwise(1.0)
        li.select(TimeFunctions.timeToStr(t).as("delay_str"))
          .groupBy(col("delay_str")).agg(count(lit(1)).as("n"))
          .orderBy("delay_str")
      },
      Some("""WITH t AS (
        |  SELECT (l_quantity *
        |           CASE WHEN l_orderkey % 2 = 0 THEN 1e-12 ELSE 1e-9 END) *
        |         CASE WHEN l_linenumber % 2 = 0 THEN -1.0 ELSE 1.0 END AS v
        |  FROM lineitem),
        |fmt AS (
        |  SELECT CASE
        |    WHEN abs(v) >= 1e-9 THEN printf('%+.2f', v / 1e-9) || 'ns'
        |    ELSE printf('%+.2f', v / 1e-12) || 'ps' END AS delay_str
        |  FROM t)
        |SELECT delay_str, count(*) AS n FROM fmt
        |GROUP BY delay_str ORDER BY delay_str""".stripMargin)),

    // G4 — basename / extension stripping on constructed paths.
    QueryDef("q28_g4_paths",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val path = concat(lit("/data/run"), (col("l_orderkey") % 10).cast("string"),
          lit("/img_"), col("l_orderkey").cast("string"), lit(".edf.gz"))
        // `base` = "img_<okey>.edf.gz" and `stem` = "img_<okey>" are both
        // injective in l_orderkey, so count(DISTINCT base/stem) ==
        // count(DISTINCT l_orderkey): ONE bigint distinct instead of two
        // string distincts (two distinct aggregates force expand-mode — 2×
        // the shuffled rows; one distinct column plans as a plain two-stage
        // hash agg).
        // Project `base` before removeExtension: the latter references its
        // input several times (gz check / reverse / substr), so the barrier
        // keeps the codegen tree flat (same janino-bloat fix as q26).
        val nDistinct = countDistinct(col("l_orderkey"))
        li.select((col("l_orderkey") % 10).as("run"), col("l_orderkey"),
            TimeFunctions.basename(path).as("base"))
          .select(col("run"), col("l_orderkey"),
            TimeFunctions.removeExtension(col("base")).as("stem"))
          .groupBy(col("run"))
          .agg(count(lit(1)).as("n"),
            nDistinct.as("n_base"),
            nDistinct.as("n_stem"),
            min(col("stem")).as("first_stem"))
          .orderBy("run")
      },
      Some("""WITH p AS (
        |  SELECT l_orderkey % 10 AS run,
        |         'img_' || l_orderkey || '.edf.gz' AS base,
        |         'img_' || l_orderkey AS stem
        |  FROM lineitem)
        |SELECT run, count(*) AS n, count(DISTINCT base) AS n_base,
        |       count(DISTINCT stem) AS n_stem, min(stem) AS first_stem
        |FROM p GROUP BY run ORDER BY run""".stripMargin)),

    // G5/G7 — q↔2θ conversion round-trip + transmission correction.
    QueryDef("q29_g5_scattering",
      (s, dir) => {
        val lambda = 1.54
        val li = table(s, dir, "lineitem")
        val q = col("l_quantity") / 10.0
        li.select(q.as("q"),
            ScatteringFunctions.qToTwoTheta(q, lambda).as("tth"),
            ScatteringFunctions.transmission(q, lit(5.0)).as("trans"))
          .groupBy(col("q"))
          .agg(count(lit(1)).as("n"), r6(first(col("tth"))).as("tth"),
            r6(first(col("trans"))).as("trans"))
          .orderBy("q")
      },
      Some(s"""WITH v AS (
        |  SELECT l_quantity / 10.0 AS q,
        |         asin((l_quantity / 10.0) * ${1.54 / (4.0 * math.Pi)}) * 2.0 AS tth,
        |         exp(-(l_quantity / 10.0) / 5.0) AS trans
        |  FROM lineitem)
        |SELECT q, count(*) AS n, round(any_value(tth), 6) AS tth,
        |       round(any_value(trans), 6) AS trans
        |FROM v GROUP BY q ORDER BY q""".stripMargin)),

    // G9 — snap-to-grid rebinning (nearest allowed value).
    QueryDef("q30_g9_rebin",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val snapped = (floor(col("l_extendedprice") / 500.0 + 0.5) * 500.0)
        li.select(snapped.as("price_bin"))
          .groupBy(col("price_bin")).agg(count(lit(1)).as("n"))
          .orderBy("price_bin")
      },
      Some("""SELECT floor(l_extendedprice / 500.0 + 0.5) * 500.0 AS price_bin,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // G11 — safe float parsing (parse-or-null).
    QueryDef("q31_g11_safe_float",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val str = when(col("l_orderkey") % 13 === 0, lit("n/a"))
          .otherwise(col("l_quantity").cast("string"))
        li.select(TimeFunctions.safeFloat(str).as("v"))
          .agg(count(lit(1)).as("n_total"), count(col("v")).as("n_parsed"),
            sum(col("v")).cast("double").as("sum_v"))
      },
      Some("""WITH p AS (
        |  SELECT TRY_CAST(CASE WHEN l_orderkey % 13 = 0 THEN 'n/a'
        |                       ELSE l_quantity::VARCHAR END AS DOUBLE) AS v
        |  FROM lineitem)
        |SELECT count(*) AS n_total, count(v) AS n_parsed,
        |       sum(v)::DOUBLE AS sum_v FROM p""".stripMargin)),

    // A13/G12 — unit-cell reflection list: enumerate hkl, q = 2π/d,
    // group identical q → multiplicity (trx/cell.py:43-61).
    QueryDef("q32_a13_reflections",
      (s, dir) => {
        val r = s.range(-3, 4)
        val hkl = r.toDF("h").crossJoin(r.toDF("k")).crossJoin(r.toDF("l"))
          .filter(!(col("h") === 0 && col("k") === 0 && col("l") === 0))
        hkl.select(round(ScatteringFunctions.qOfReflection(
            col("h"), col("k"), col("l"), Cell), 6).as("q"))
          .filter(col("q") < 4.0)
          .groupBy(col("q")).agg(count(lit(1)).as("multiplicity"))
          .orderBy("q")
      },
      Some {
        val c = Cell
        val vol2 = c.volume * c.volume
        s"""WITH hkl AS (
          |  SELECT h.range AS h, k.range AS k, l.range AS l
          |  FROM range(-3, 4) h, range(-3, 4) k, range(-3, 4) l
          |  WHERE NOT (h.range = 0 AND k.range = 0 AND l.range = 0)),
          |q AS (
          |  SELECT round(${2.0 * math.Pi} * sqrt(
          |    (${c.s11} * h * h + ${c.s22} * k * k + ${c.s33} * l * l
          |     + ${2 * c.s12} * h * k + ${2 * c.s23} * k * l
          |     + ${2 * c.s13} * h * l) / $vol2), 6) AS q
          |  FROM hkl)
          |SELECT q, count(*) AS multiplicity FROM q
          |WHERE q < 4.0 GROUP BY q ORDER BY q""".stripMargin
      }),

    // G7/G8 — attenuation-length lookup (tabulated Si/H2O/Ce, E^-3
    // piecewise-linear) + SAXS volume fraction and molecular mass from I0
    // (trx/utils/absorption.py:10-22, trx/utils/scattering.py:12-42).
    // Everything is rational arithmetic (no transcendentals), so the values
    // are emitted UNROUNDED — both engines produce identical doubles given
    // the identical op order the oracle SQL spells out.
    QueryDef("q54_g7g8_saxs",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val e = col("k") * 0.1 + 5.0
        val conc = (col("k") % 17 + 1).cast("double")
        val mw = (col("k") % 7 * 3 + 2).cast("double")
        val i0 = (col("k") % 11 + 1) / 10.0
        val cg = (col("k") % 5 + 1) / 1000.0
        val cmp = when(col("k") % 3 === 0, "Si")
          .when(col("k") % 3 === 1, "H2O").otherwise("Ce")
        // Ce uses the reference's phosphor-screen density override (4.75,
        // absorption.py:62) instead of bulk cerium
        val lam = when(col("k") % 3 === 0,
            ScatteringFunctions.attenuationLength("Si", e))
          .when(col("k") % 3 === 1,
            ScatteringFunctions.attenuationLength("H2O", e))
          .otherwise(ScatteringFunctions.attenuationLength("Ce", e, Some(4.75)))
        // aggregate FIRST: vf/mm/lam depend only on k, so the (large) NIST
        // when-chains run on 251 aggregated rows, not every lineitem row
        li.select((col("l_orderkey") % 251).cast("int").as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("n"))
          .select(col("k"), cmp.as("cmp"), col("n"),
            ScatteringFunctions.volumeFraction(conc, mw, lit(1.347)).as("vf"),
            ScatteringFunctions.molecularMassFromI0(i0, cg, lit(1.347)).as("mm"),
            // r6: the μ interpolation chain differs by 1 ulp between the
            // engines' expression rewrites (vf/mm are short enough to match
            // exactly and stay unrounded)
            r6(lam * 1000000.0).as("lam_um"),
            // the FORMULA path (parser + per-element mixture rule — the
            // reference's arbitrary-compound surface, absorption.py:10-23):
            // ceria and polyimide (Kapton), densities from the compound map
            r6(ScatteringFunctions.attenuationLength("CeO2", e)
              * 1000000.0).as("ceo2_um"),
            r6(ScatteringFunctions.attenuationLength("C22H10N2O5", e)
              * 1000000.0).as("kapton_um"),
            // PVC needs Cl — the r14 extended element table's new row
            r6(ScatteringFunctions.attenuationLength("C2H3Cl", e)
              * 1000000.0).as("pvc_um"))
          .orderBy("k")
      },
      Some {
        def chainSql(pts: Seq[(Double, Double)], eE: String): String = {
          def xOf(en: Double) = 1.0 / (en * en * en)
          val segs = pts.sliding(2).toSeq.collect { case Seq((e1, m1), (e2, m2)) =>
            val slope = (m2 - m1) / (xOf(e2) - xOf(e1))
            s"WHEN $eE <= $e2 THEN (1.0 / ($eE * $eE * $eE) - ${xOf(e1)}) * $slope + $m1"
          }
          s"CASE WHEN $eE <= ${pts.head._1} THEN ${pts.head._2} " +
            s"${segs.mkString(" ")} ELSE ${pts.last._2} END"
        }
        def muSql(compound: String, eE: String): String =
          chainSql(ScatteringFunctions.MassAttenuation(compound).points, eE)
        // the formula path's mixture: Σ wᵢ · per-element chain, in the
        // SAME element-sorted summation order as the engine
        def muFormulaSql(formula: String, eE: String): String =
          ScatteringFunctions.formulaWeights(formula).map { case (el, w) =>
            s"(${chainSql(ScatteringFunctions.elementInfo(el).get.mu, eE)}) * $w"
          }.mkString("(", " + ", ")")
        val drm = "(26700000000.0 / 1.347)"
        s"""WITH base AS (SELECT (l_orderkey % 251)::INT AS k FROM lineitem),
          |v AS (
          |  SELECT k,
          |    CASE WHEN k % 3 = 0 THEN 'Si'
          |         WHEN k % 3 = 1 THEN 'H2O' ELSE 'Ce' END AS cmp,
          |    (k % 17 + 1)::DOUBLE * (k % 7 * 3 + 2)::DOUBLE / 1.347 / 1000.0 AS vf,
          |    (k % 11 + 1) / 10.0 * 6e23 /
          |      ((k % 5 + 1) / 1000.0 * $drm * $drm) AS mm,
          |    round(CASE WHEN k % 3 = 0 THEN
          |           0.01 / ((${muSql("Si", "(k * 0.1 + 5.0)")}) * 2.33) * 1000000.0
          |         WHEN k % 3 = 1 THEN
          |           0.01 / ((${muSql("H2O", "(k * 0.1 + 5.0)")}) * 1.0) * 1000000.0
          |         ELSE
          |           0.01 / ((${muSql("Ce", "(k * 0.1 + 5.0)")}) * 4.75) * 1000000.0
          |    END, 6) AS lam_um,
          |    round(0.01 / ((${muFormulaSql("CeO2", "(k * 0.1 + 5.0)")})
          |      * 7.22) * 1000000.0, 6) AS ceo2_um,
          |    round(0.01 / ((${muFormulaSql("C22H10N2O5", "(k * 0.1 + 5.0)")})
          |      * 1.42) * 1000000.0, 6) AS kapton_um,
          |    round(0.01 / ((${muFormulaSql("C2H3Cl", "(k * 0.1 + 5.0)")})
          |      * 1.38) * 1000000.0, 6) AS pvc_um
          |  FROM base)
          |SELECT k, cmp, count(*) AS n, any_value(vf) AS vf,
          |       any_value(mm) AS mm, any_value(lam_um) AS lam_um,
          |       any_value(ceo2_um) AS ceo2_um,
          |       any_value(kapton_um) AS kapton_um,
          |       any_value(pvc_um) AS pvc_um
          |FROM v GROUP BY k, cmp ORDER BY k""".stripMargin
      }),

    // t-digest quantiles (TDigestSketch) in the EXACT regime: below
    // `compression` points per group every value stays a singleton
    // centroid, so the sketch's interpolated quantile is deterministic
    // arithmetic over the sorted values — t = q·n against cumulative-mass
    // midpoints (i + 0.5), clamped to min/max past the extreme centers,
    // linear between neighbours otherwise. The oracle spells out exactly
    // that rule (NOT quantile_cont — type-7 interpolates at q·(n−1), a
    // different estimator). This is the one engine-side numeric state
    // that had no driver oracle; compression 4096 keeps every sf0.01
    // group (~62 rows) in the exact regime with wide margin — and the
    // group count keeps the typed-Aggregator buffer (ser/de per input
    // row is proportional to buffer size) small at bench scale.
    QueryDef("q154_tdigest_quantiles",
      (s, dir) => {
        import graft.functions.TDigestSketch
        val sk = table(s, dir, "lineitem")
          .select((col("l_orderkey") % 997).cast("int").as("k"),
            col("l_extendedprice").cast("double").as("x"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            TDigestSketch.tdigest(col("x"), compression = 4096).as("sk"))
        def qt(q: Double) = TDigestSketch.tdigestQuantile(
          col("sk.means"), col("sk.weights"), lit(q))
        sk.select(col("k"), col("n"),
            r6(qt(0.25)).as("q25"), r6(qt(0.5)).as("q50"),
            r6(qt(0.75)).as("q75"))
          .orderBy("k")
      },
      Some {
        def probe(p: String, lo: String, hi: String): String =
          s"""round(CASE WHEN $p * n <= 0.5 THEN xmin
             |  WHEN $p * n >= n - 0.5 THEN xmax
             |  ELSE $lo + ($p * n - 0.5 - floor($p * n - 0.5)) * ($hi - $lo)
             |END, 6)""".stripMargin
        def idxCols(tag: String, p: String): String =
          s"""max(CASE WHEN rn = floor($p * n - 0.5)::BIGINT + 1 THEN x END)
             |  AS lo$tag,
             |max(CASE WHEN rn = floor($p * n - 0.5)::BIGINT + 2 THEN x END)
             |  AS hi$tag""".stripMargin
        s"""WITH v AS (
          |  SELECT (l_orderkey % 997)::INT AS k, l_extendedprice::DOUBLE AS x
          |  FROM lineitem),
          |r AS (
          |  SELECT k, x, row_number() OVER (PARTITION BY k ORDER BY x) AS rn,
          |    count(*) OVER (PARTITION BY k) AS n
          |  FROM v),
          |a AS (
          |  SELECT k, any_value(n) AS n, min(x) AS xmin, max(x) AS xmax,
          |    ${idxCols("25", "0.25")},
          |    ${idxCols("50", "0.5")},
          |    ${idxCols("75", "0.75")}
          |  FROM r GROUP BY k)
          |SELECT k, n::BIGINT AS n,
          |  ${probe("0.25", "lo25", "hi25")} AS q25,
          |  ${probe("0.5", "lo50", "hi50")} AS q50,
          |  ${probe("0.75", "lo75", "hi75")} AS q75
          |FROM a ORDER BY k""".stripMargin
      })
  )
}
