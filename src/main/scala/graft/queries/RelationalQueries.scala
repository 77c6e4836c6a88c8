package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.ScatteringFunctions.Poni
import graft.operators.{Azav, Clusters, Drift, Masks, Stats}
import QueryUtil._
import Tables._

/** Joins, filters, set ops, windows, masks and the azimuthal-integration
  * aggregations (SURVEY §2.3/§2.4/§2.5/§2.6/§2.11) on the driver tables.
  */
object RelationalQueries {

  /** Geometry used by the integration queries — irrational-ish poni offsets
    * so no pixel lands exactly on a bin boundary.
    */
  val G = Poni(dist = 0.1, poni1 = 0.03217, poni2 = 0.03203,
    pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
  val Grid = Azav.QGrid(0.0, 3.0, 30)

  /** Oracle SQL fragment: per-pixel q and chi under `G` (rot1=rot2=rot3=0 →
    * t1/t2 are the in-plane offsets, t3 = dist). Literals are interpolated
    * from the same Scala constants the Spark side uses, so both engines
    * evaluate identical IEEE expressions.
    */
  private val geoSql: String = {
    val fourPiOverLambda = 4.0 * math.Pi / G.wavelengthA
    s"""geo AS (
       |  SELECT image_id, x, y, intensity,
       |         $fourPiOverLambda * sin(atan2(sqrt(t1*t1 + t2*t2), ${G.dist}) / 2.0) AS q,
       |         atan2(t1, t2) AS chi
       |  FROM (SELECT *,
       |          (y + 0.5) * ${G.pixel1} - ${G.poni1} AS t1,
       |          (x + 0.5) * ${G.pixel2} - ${G.poni2} AS t2
       |        FROM pixels
       |        WHERE NOT (x < 2 OR x >= 62 OR y < 2 OR y >= 62)))""".stripMargin
  }

  /** Shared q186/q192 oracle: three unrolled PageRank rounds over an
    * `e(src, dst, w)` edge CTE. `degSql` aggregates e's per-src out-mass
    * (count for the simple graph, exact decimal weight sum otherwise);
    * `contribSql` is the per-edge contribution the inflow sum folds —
    * both sides mirror the Spark arithmetic exactly (14 dp decimal-exact
    * inflow, 10 dp decimal-exact dangling, 10 dp round per r_k, teleport
    * constant interpolated from the SAME JVM double).
    */
  private def pageRankOracle(edgeCte: String, degSql: String,
                             contribSql: String): String = {
    val d = 0.85
    val tele = 1.0 - d // the exact JVM double Spark's lit() uses
    def iter(k: Int): String = {
      val p = s"r${k - 1}"
      s"""i$k AS (
         |  SELECT e.dst AS id,
         |    sum(round($contribSql, 14)::DECIMAL(38,14))::DOUBLE
         |      AS inflow
         |  FROM e JOIN $p r ON r.id = e.src
         |         JOIN deg dg ON dg.src = e.src
         |  GROUP BY 1),
         |d$k AS (
         |  SELECT coalesce(sum(r.rank::DECIMAL(20,10))::DOUBLE, 0.0)
         |      AS dm
         |  FROM $p r LEFT JOIN deg dg ON dg.src = r.id
         |  WHERE dg.src IS NULL),
         |r$k AS (
         |  SELECT v.id,
         |    round($tele / (SELECT n FROM nn) + $d *
         |      (coalesce(i.inflow, 0.0) +
         |       (SELECT dm FROM d$k) / (SELECT n FROM nn)), 10) AS rank
         |  FROM v LEFT JOIN i$k i ON i.id = v.id)""".stripMargin
    }
    s"""WITH $edgeCte,
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM v),
       |deg AS (SELECT src, $degSql AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT id, round(1.0 / (SELECT n FROM nn), 10) AS rank
       |       FROM v),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT id, round(rank, 6) AS rank FROM r3 ORDER BY id"""
      .stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // J1 — equi-joins with broadcast dims (orders ⋈ customer ⋈ nation).
    QueryDef("q13_j1_join_broadcast",
      (s, dir) =>
        table(s, dir, "orders")
          .join(broadcast(table(s, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            r2(exactSum(col("o_totalprice"))).as("total"))
          .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS n_orders,
        |       round(sum(o_totalprice::DECIMAL(18,6))::DOUBLE, 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // J2 — left-semi join (customers having orders).
    QueryDef("q14_j2_semi_join",
      (s, dir) =>
        table(s, dir, "customer")
          .join(table(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c WHERE EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // J3 — left-anti join (customers with no orders).
    QueryDef("q15_j3_anti_join",
      (s, dir) =>
        table(s, dir, "customer")
          .join(table(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
            r2(exactSum(col("c_acctbal"))).as("bal"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal::DECIMAL(18,6))::DOUBLE, 2) AS bal
        |FROM customer c WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // F2/F4/F5 — range + equality row predicates.
    QueryDef("q16_f_filters",
      (s, dir) =>
        table(s, dir, "lineitem")
          .filter(col("l_quantity").between(10, 20))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            r2(exactSum(col("l_extendedprice"))).as("revenue"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS n,
        |       round(sum(l_extendedprice::DECIMAL(18,6))::DOUBLE, 2) AS revenue
        |FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // F3 — skip_first / skip_last positional slice over file order, via
    // the distributed rank (range repartition + per-partition window +
    // broadcast offsets) — no single-task global window.
    QueryDef("q17_f3_skip_slice",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        // (l_orderkey, l_linenumber) is not unique in the synthetic data —
        // the extended key makes the positional slice deterministic.
        val key = Seq(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_partkey"),
          col("l_suppkey"))
        graft.operators.Positional.skipSlice(li, key, 100, 100)
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).cast("double").as("sum_qty"),
            min(col("l_orderkey")).as("first_key"),
            max(col("l_orderkey")).as("last_key"))
      },
      Some("""WITH ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY l_orderkey, l_linenumber,
        |           l_quantity, l_extendedprice, l_partkey, l_suppkey) AS rn,
        |         count(*) OVER () AS total
        |  FROM lineitem)
        |SELECT count(*) AS n, sum(l_quantity)::DOUBLE AS sum_qty,
        |       min(l_orderkey) AS first_key, max(l_orderkey) AS last_key
        |FROM ranked WHERE rn > 100 AND rn <= total - 100""".stripMargin)),

    // M1/M3/M4/M6 — ordered add/subtract mask composition over pixels.
    QueryDef("q18_m_mask_compose",
      (s, dir) => {
        val px = pixels(s, dir)
        val x = col("x").cast("double"); val y = col("y").cast("double")
        val mask = Masks.compose(Seq(
          Masks.Component(Masks.rectangle(x, y, 5, 5, 40, 40), add = true),
          Masks.Component(Masks.circle(x, y, 20, 20, 10), add = false),
          Masks.Component(Masks.halfPlane("x>55", x, y), add = true)))
        px.filter(Masks.keep(mask))
          .groupBy(col("image_id"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("intensity")).cast("double").as("sum_i"))
          .orderBy("image_id")
      },
      Some(s"""WITH ${pixelsSql}
        |SELECT image_id, count(*) AS n_kept, sum(intensity)::DOUBLE AS sum_i
        |FROM pixels
        |WHERE NOT (((x > 5 AND x < 40 AND y > 5 AND y < 40)
        |            AND NOT ((x - 20.0)*(x - 20.0) + (y - 20.0)*(y - 20.0) < 100.0))
        |           OR x > 55)
        |GROUP BY image_id ORDER BY image_id""".stripMargin)),

    // W4 — triangular-kernel smoothing of a histogram (zero-padded 'same').
    // The unpartitioned window is intentional and safe: its input is the
    // POST-AGGREGATION histogram — one row per price bin, bounded by the
    // value range (thousands of rows at any corpus size), not by the table.
    QueryDef("q19_w4_smoothing",
      (s, dir) => {
        val hist = table(s, dir, "lineitem")
          .groupBy(floor(col("l_extendedprice") / 1000).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
        def at(off: Int) = coalesce(
          (if (off < 0) lag(col("n"), -off).over(w)
           else if (off > 0) lead(col("n"), off).over(w)
           else col("n")).cast("double"), lit(0.0))
        hist.withColumn("smooth",
            r6((at(-2) + at(-1) * 2 + at(0) * 3 + at(1) * 2 + at(2)) / 9.0))
          .select(col("bin"), col("n"), col("smooth"))
          .orderBy("bin")
      },
      Some("""WITH hist AS (
        |  SELECT floor(l_extendedprice / 1000)::BIGINT AS bin, count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT bin, n, round((
        |    coalesce(lag(n, 2)  OVER w, 0)::DOUBLE
        |  + coalesce(lag(n, 1)  OVER w, 0)::DOUBLE * 2
        |  + n::DOUBLE * 3
        |  + coalesce(lead(n, 1) OVER w, 0)::DOUBLE * 2
        |  + coalesce(lead(n, 2) OVER w, 0)::DOUBLE) / 9.0, 6) AS smooth
        |FROM hist WINDOW w AS (ORDER BY bin) ORDER BY bin""".stripMargin)),

    // W6 — top-k per group with deterministic tie-breaks.
    QueryDef("q20_w6_topk",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        table(s, dir, "lineitem")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("l_returnflag"), col("rank"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))
          .orderBy("l_returnflag", "rank")
      },
      Some("""SELECT l_returnflag, rank, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
        |      FROM lineitem)
        |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin)),

    // F8 as multi-granularity grouping — GROUPING SETS in one pass.
    QueryDef("q21_f8_grouping_sets",
      (s, dir) => {
        table(s, dir, "lineitem").createOrReplaceTempView("q21_lineitem")
        s.sql("""SELECT coalesce(l_returnflag, '(all)') AS flag, l_linestatus,
                |       count(*) AS n, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
                |FROM q21_lineitem
                |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
                |ORDER BY flag, l_linestatus""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, '(all)') AS flag, l_linestatus,
        |       count(*) AS n, sum(l_quantity)::DOUBLE AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
        |ORDER BY flag, l_linestatus""".stripMargin)),

    // §2.11 — INTERSECT / EXCEPT set semantics.
    QueryDef("q22_setops",
      (s, dir) => {
        val withOrders = table(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
        val rich = table(s, dir, "customer").filter(col("c_acctbal") > 500)
          .select(col("c_custkey").as("k")).distinct()
        val nInter = withOrders.intersect(rich).agg(count(lit(1)).as("n_intersect"))
        val nExcept = withOrders.except(rich).agg(count(lit(1)).as("n_except"))
        nInter.crossJoin(nExcept)
      },
      Some("""SELECT
        |  (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |    INTERSECT SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 500)) AS n_intersect,
        |  (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |    EXCEPT SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 500)) AS n_except""".stripMargin)),

    // A11 — distance histogram with unit bins.
    QueryDef("q23_a11_dist_histogram",
      (s, dir) =>
        Azav.distanceHistogram(pixels(s, dir), 32.0, 32.0)
          .select(col("r_bin"), col("n"), r6(col("mean_i")).as("mean_i"))
          .orderBy("r_bin"),
      Some(s"""WITH ${pixelsSql}
        |SELECT floor(sqrt((x - 32.0)*(x - 32.0) + (y - 32.0)*(y - 32.0)))::INT AS r_bin,
        |       count(*) AS n, round(avg(intensity), 6) AS mean_i
        |FROM pixels GROUP BY 1 ORDER BY 1""".stripMargin)),

    // A1 — 1-D azimuthal integration (the reference's core kernel) with a
    // border mask; Poisson error model err = sqrt(sum(i))/n.
    QueryDef("q24_a1_integrate1d",
      (s, dir) => {
        val px = pixels(s, dir)
        val border = Masks.border(col("x"), col("y"), 2, 64, 64)
        Azav.integrate1d(px, G, Grid, mask = Some(border))
          .select(col("image_id"), col("q_bin"), r6(col("i")).as("i"),
            r6(col("err")).as("err"), col("n_pix"))
          .orderBy("image_id", "q_bin")
      },
      Some(s"""WITH ${pixelsSql},
        |${geoSql},
        |binned AS (
        |  SELECT image_id, floor(q / ${Grid.dq})::INT AS q_bin, intensity
        |  FROM geo WHERE q >= ${Grid.qMin} AND q < ${Grid.qMax})
        |SELECT image_id, q_bin, round(avg(intensity), 6) AS i,
        |       round(sqrt(sum(intensity)) / count(*), 6) AS err,
        |       count(*) AS n_pix
        |FROM binned GROUP BY image_id, q_bin
        |ORDER BY image_id, q_bin""".stripMargin)),

    // A7 + F5 — quick-look averaging: delay-select, q-range normalize,
    // mean per bin (trx/azav.py:548-573).
    QueryDef("q48_a7_quick_average",
      (s, dir) => {
        val c = curves(s, dir).withColumn("q", col("q_bin").cast("double"))
        Azav.average(c, delaySelect = Some(col("delay") > 1e-9),
            normRange = Some((1.0, 4.0)), idCol = "image_idx")
          .select(col("q_bin"), r6(col("i_av")).as("i_av"), col("n"))
          .orderBy("q_bin")
      },
      Some(s"""WITH ${Tables.curvesSql},
        |sel AS (SELECT * FROM curves WHERE delay > 1e-9),
        |mon AS (SELECT image_idx, avg(i) AS monitor FROM sel
        |        WHERE q_bin::DOUBLE BETWEEN 1.0 AND 4.0 GROUP BY image_idx)
        |SELECT s.q_bin, round(avg(s.i / m.monitor), 6) AS i_av, count(*) AS n
        |FROM sel s JOIN mon m ON s.image_idx = m.image_idx
        |GROUP BY s.q_bin ORDER BY s.q_bin""".stripMargin)),

    // G9 — snap to an arbitrary sorted grid (digitize-style rebin).
    QueryDef("q49_g9_snap_grid",
      (s, dir) => {
        val grid = Seq(1.0, 5.0, 10.0, 20.0, 35.0, 50.0)
        table(s, dir, "lineitem")
          .select(graft.functions.NumericFunctions
            .snapToGrid(col("l_quantity"), grid).as("snapped"))
          .groupBy(col("snapped")).agg(count(lit(1)).as("n"))
          .orderBy("snapped")
      },
      Some("""WITH snapped AS (
        |  SELECT CASE
        |    WHEN l_quantity < 3.0 THEN 1.0
        |    WHEN l_quantity < 7.5 THEN 5.0
        |    WHEN l_quantity < 15.0 THEN 10.0
        |    WHEN l_quantity < 27.5 THEN 20.0
        |    WHEN l_quantity < 42.5 THEN 35.0
        |    ELSE 50.0 END AS snapped
        |  FROM lineitem)
        |SELECT snapped, count(*) AS n FROM snapped
        |GROUP BY snapped ORDER BY snapped""".stripMargin)),

    // M2 — mask from a materialized table via broadcast anti-join.
    QueryDef("q50_m2_mask_table",
      (s, dir) => {
        val maskTable = table(s, dir, "supplier").select(
          (col("s_suppkey") % 64).cast("int").as("x"),
          (col("s_nationkey") % 64).cast("int").as("y"))
        Masks.applyMaskTable(pixels(s, dir), maskTable)
          .groupBy(col("image_id"))
          .agg(count(lit(1)).as("n_kept"), sum(col("intensity")).cast("double").as("sum_i"))
          .orderBy("image_id")
      },
      Some(s"""WITH ${pixelsSql},
        |mask AS (SELECT DISTINCT (s_suppkey % 64)::INT AS x,
        |                (s_nationkey % 64)::INT AS y FROM supplier)
        |SELECT image_id, count(*) AS n_kept, sum(intensity)::DOUBLE AS sum_i
        |FROM pixels p WHERE NOT EXISTS
        |  (SELECT 1 FROM mask m WHERE m.x = p.x AND m.y = p.y)
        |GROUP BY image_id ORDER BY image_id""".stripMargin)),

    // G7 — absorption corrections as pure column math.
    QueryDef("q51_g7_absorption",
      (s, dir) => {
        val tth = col("l_quantity") / 100.0 // 0.01..0.5 rad
        val t = lit(0.1); val lam = lit(2.0)
        table(s, dir, "lineitem")
          .select((col("l_quantity") / 100.0).as("tth"),
            graft.functions.ScatteringFunctions
              .phosphorCorrection(tth, t, lam).as("phosphor"),
            graft.functions.ScatteringFunctions
              .liquidSheetAbsorptionCorrection(tth, t, lam).as("sheet"))
          .groupBy(col("tth"))
          .agg(count(lit(1)).as("n"), r6(first(col("phosphor"))).as("phosphor"),
            r6(first(col("sheet"))).as("sheet"))
          .orderBy("tth")
      },
      Some("""WITH v AS (
        |  SELECT l_quantity / 100.0 AS tth,
        |         1.0 - exp(-(0.1) / (2.0 * cos(l_quantity / 100.0))) AS phosphor,
        |         CASE WHEN abs((0.1/2.0) * (1.0/cos(l_quantity/100.0) - 1.0)) < 1e-12
        |              THEN 1.0
        |              ELSE (exp(-(0.1/2.0)) - exp(-(0.1/2.0) * (1.0/cos(l_quantity/100.0))))
        |                   / ((0.1/2.0) * (1.0/cos(l_quantity/100.0) - 1.0))
        |                   / exp(-(0.1/2.0)) END AS sheet
        |  FROM lineitem)
        |SELECT tth, count(*) AS n, round(any_value(phosphor), 6) AS phosphor,
        |       round(any_value(sheet), 6) AS sheet
        |FROM v GROUP BY tth ORDER BY tth""".stripMargin)),

    // A1 with azimuth restriction (trx/azav.py:131-154 `azimuth_range`).
    QueryDef("q53_a1_azimuth_range",
      (s, dir) => {
        val px = pixels(s, dir)
        val border = Masks.border(col("x"), col("y"), 2, 64, 64)
        Azav.integrate1d(px, G, Grid, mask = Some(border),
            azimuthRange = Some((0.0, math.Pi / 2)))
          .select(col("image_id"), col("q_bin"), r6(col("i")).as("i"),
            col("n_pix"))
          .orderBy("image_id", "q_bin")
      },
      Some(s"""WITH ${pixelsSql},
        |${geoSql},
        |binned AS (
        |  SELECT image_id, floor(q / ${Grid.dq})::INT AS q_bin, intensity
        |  FROM geo
        |  WHERE q >= ${Grid.qMin} AND q < ${Grid.qMax}
        |    AND chi >= 0.0 AND chi <= ${math.Pi / 2})
        |SELECT image_id, q_bin, round(avg(intensity), 6) AS i,
        |       count(*) AS n_pix
        |FROM binned GROUP BY image_id, q_bin
        |ORDER BY image_id, q_bin""".stripMargin)),

    // A2 — 2-D "cake" integration (q_bin × azimuth bin).
    QueryDef("q25_a2_integrate2d",
      (s, dir) => {
        val px = pixels(s, dir)
        val border = Masks.border(col("x"), col("y"), 2, 64, 64)
        Azav.integrate2d(px, G, Grid, nAzim = 8, mask = Some(border))
          .select(col("image_id"), col("q_bin"), col("az_bin"),
            r6(col("i")).as("i"), col("n_pix"))
          .orderBy("image_id", "q_bin", "az_bin")
      },
      Some(s"""WITH ${pixelsSql},
        |${geoSql},
        |binned AS (
        |  SELECT image_id, floor(q / ${Grid.dq})::INT AS q_bin,
        |         least(floor((chi + pi()) / (2 * pi() / 8))::INT, 7) AS az_bin,
        |         intensity
        |  FROM geo WHERE q >= ${Grid.qMin} AND q < ${Grid.qMax})
        |SELECT image_id, q_bin, az_bin, round(avg(intensity), 6) AS i,
        |       count(*) AS n_pix
        |FROM binned GROUP BY image_id, q_bin, az_bin
        |ORDER BY image_id, q_bin, az_bin""".stripMargin)),

    // Population Stability Index decomposition (Drift.psiBuckets) between
    // the even- and odd-orderkey halves of orders on o_totalprice, fixed
    // literal breaks — the scorecard drift metric. Each side reduces to
    // 6 bucket counts in one map-side-combined aggregation; add-half
    // smoothing keeps empty buckets finite. The oracle replays the bucket
    // chain, the smoothed proportions (explicit DOUBLE casts — DECIMAL
    // division would round differently), and the ln contribution.
    QueryDef("q163_drift_psi",
      (s, dir) => {
        val o = table(s, dir, "orders")
        Drift.psiBuckets(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1),
          "o_totalprice",
          Seq(50000.0, 100000.0, 200000.0, 300000.0, 400000.0))
      },
      Some {
        val bucketExpr = Seq(50000, 100000, 200000, 300000, 400000)
          .map(b => s"CASE WHEN v >= $b THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")::INT")
        s"""WITH a AS (
           |  SELECT o_totalprice AS v FROM orders
           |  WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
           |b AS (
           |  SELECT o_totalprice AS v FROM orders
           |  WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL),
           |ca AS (SELECT $bucketExpr AS bucket, count(*)::BIGINT AS c
           |       FROM a GROUP BY 1),
           |cb AS (SELECT $bucketExpr AS bucket, count(*)::BIGINT AS c
           |       FROM b GROUP BY 1),
           |bk AS (SELECT unnest(generate_series(0, 5))::INT AS bucket),
           |m AS (
           |  SELECT bk.bucket, coalesce(ca.c, 0) AS n_a, coalesce(cb.c, 0) AS n_b
           |  FROM bk LEFT JOIN ca ON ca.bucket = bk.bucket
           |           LEFT JOIN cb ON cb.bucket = bk.bucket),
           |t AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb FROM m),
           |p AS (
           |  SELECT bucket, n_a, n_b,
           |    (n_a::DOUBLE + 0.5) / (ta::DOUBLE + 3.0) AS pa,
           |    (n_b::DOUBLE + 0.5) / (tb::DOUBLE + 3.0) AS pb
           |  FROM m, t)
           |SELECT bucket, n_a, n_b, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
           |       round((pa - pb) * ln(pa / pb), 6) AS contrib
           |FROM p ORDER BY bucket""".stripMargin
      }),

    // Jensen–Shannon divergence (Drift.jsDivergence) between the same two
    // orders halves as q163 — the symmetric, bounded ([0, ln 2]) drift
    // metric: no smoothing (a zero-mass bucket's term against the mixture
    // is exactly 0), portable thresholds. The oracle replays raw
    // proportions, the mixture, and the guarded p·ln(p/m) terms.
    QueryDef("q173_drift_js",
      (s, dir) => {
        val o = table(s, dir, "orders")
        Drift.jsDivergence(
          o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1),
          "o_totalprice",
          Seq(50000.0, 100000.0, 200000.0, 300000.0, 400000.0))
      },
      Some {
        val bucketExpr = Seq(50000, 100000, 200000, 300000, 400000)
          .map(b => s"CASE WHEN v >= $b THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")::INT")
        s"""WITH a AS (
           |  SELECT o_totalprice AS v FROM orders
           |  WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
           |b AS (
           |  SELECT o_totalprice AS v FROM orders
           |  WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL),
           |ca AS (SELECT $bucketExpr AS bucket, count(*)::BIGINT AS c
           |       FROM a GROUP BY 1),
           |cb AS (SELECT $bucketExpr AS bucket, count(*)::BIGINT AS c
           |       FROM b GROUP BY 1),
           |bk AS (SELECT unnest(generate_series(0, 5))::INT AS bucket),
           |m AS (
           |  SELECT bk.bucket, coalesce(ca.c, 0) AS n_a, coalesce(cb.c, 0) AS n_b
           |  FROM bk LEFT JOIN ca ON ca.bucket = bk.bucket
           |           LEFT JOIN cb ON cb.bucket = bk.bucket),
           |t AS (SELECT sum(n_a)::BIGINT AS ta, sum(n_b)::BIGINT AS tb FROM m),
           |p AS (
           |  SELECT n_a::DOUBLE / ta::DOUBLE AS pa,
           |         n_b::DOUBLE / tb::DOUBLE AS pb
           |  FROM m, t),
           |c AS (
           |  SELECT round(
           |    (CASE WHEN pa > 0
           |       THEN pa * ln(pa / ((pa + pb) / 2)) / 2 ELSE 0 END) +
           |    (CASE WHEN pb > 0
           |       THEN pb * ln(pb / ((pa + pb) / 2)) / 2 ELSE 0 END),
           |    6) AS contrib
           |  FROM p)
           |SELECT round(sum(contrib::DECIMAL(28,6))::DOUBLE, 6) AS js,
           |       ta AS n_a, tb AS n_b
           |FROM c, t GROUP BY ta, tb""".stripMargin
      }),

    // Exact distributed type-7 quantiles (Stats.exactQuantiles) of
    // lineitem prices: the corpus reduces to per-distinct-value counts in
    // one map-side-combined aggregation; order statistics are located by
    // rank interval on the reduced frame (range-partitioned prefix sums +
    // broadcast offsets — no global sort, no single-task window); the
    // h = p·(n−1) interpolation is the same arithmetic DuckDB's
    // quantile_cont runs, so the oracle is the BUILT-IN — an independent
    // implementation, not a replay.
    // The toHdf5 EXPORT chain under a DuckDB hash gate: real lineitem
    // aggregates pivot to long form, leave as a trx-layout HDF5 container
    // (Bundle.toHdf5 — numeric grid + vlen-string table + typed attr),
    // re-ingest through fromHdf5, and the served report must hash-match
    // the oracle computed STRAIGHT from lineitem — the oracle never sees
    // the .h5, so any export/import corruption (layout, GCOL, attrs)
    // breaks the hash. Driver-side collect is 21 rows (the documented
    // export cost model); the attr rides the output as n_total.
    QueryDef("q185_hdf5_export_roundtrip",
      (s, dir) => {
        import graft.sources.Bundle
        import s.implicits._
        val li = table(s, dir, "lineitem")
        val agg = li.groupBy(col("l_returnflag"), col("l_linenumber"))
          .agg(stableSum(col("l_quantity")).as("v"))
          .collect()
        val flags = agg.map(_.getString(0)).distinct.sorted
        val flagIdx = flags.zipWithIndex.toMap
        val grid = agg.toSeq.map(r => (flagIdx(r.getString(0)).toLong,
            r.getInt(1).toLong - 1L, r.getDouble(2)))
          .toDF("row", "col", "value")
        val flagTable = flags.toSeq.zipWithIndex
          .map { case (f, i) => (i.toLong, f) }.toDF("idx", "value")
        val st = System.getProperty("java.io.tmpdir") + "/graft_q185"
        locally { val (fs, sp) = Bundle.fsPath(st); fs.mkdirs(sp) }
        val h5 = s"$st/export.h5"
        Bundle.toHdf5(h5, Map("qty" -> grid, "flags" -> flagTable),
          Map("n_total" -> li.count().toString))
        val (tables, params) = Bundle.fromHdf5(s, h5)
        tables("qty")
          .join(tables("flags").select(col("idx").as("row"),
            col("value").as("l_returnflag")), Seq("row"))
          .select(col("l_returnflag"),
            (col("col") + 1L).as("l_linenumber"),
            round(col("value"), 6).as("sum_qty"),
            lit(params("n_total").toLong).as("n_total"))
          .orderBy("l_returnflag", "l_linenumber")
      },
      Some(s"""SELECT l_returnflag, l_linenumber::BIGINT AS l_linenumber,
        |  ${stableSumSql("l_quantity")} AS sum_qty,
        |  (SELECT count(*) FROM lineitem)::BIGINT AS n_total
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY l_returnflag, l_linenumber""".stripMargin)),

    QueryDef("q166_exact_quantiles",
      (s, dir) =>
        Stats.exactQuantiles(table(s, dir, "lineitem"), "l_extendedprice",
            Seq(0.01, 0.25, 0.5, 0.75, 0.99))
          .select(col("prob"), round(col("q"), 6).as("q"))
          .orderBy("prob"),
      Some(Seq(0.01, 0.25, 0.5, 0.75, 0.99).map(p =>
          s"""SELECT $p::DOUBLE AS prob,
             |  round(quantile_cont(l_extendedprice, $p), 6) AS q
             |FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY prob"))),

    // The grouped form: per-returnflag price quantiles. The cumulative
    // runs in per-group windows over the REDUCED (group, value) frame —
    // per-task state is the group's distinct-value count, never its row
    // count. Same built-in oracle, grouped.
    QueryDef("q167_exact_quantiles_grouped",
      (s, dir) =>
        Stats.exactQuantiles(table(s, dir, "lineitem"), "l_extendedprice",
            Seq(0.5, 0.9), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("prob"),
            round(col("q"), 6).as("q"))
          .orderBy("l_returnflag", "prob"),
      Some(Seq(0.5, 0.9).map(p =>
          s"""SELECT l_returnflag, $p::DOUBLE AS prob,
             |  round(quantile_cont(l_extendedprice, $p), 6) AS q
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY l_returnflag, prob"))),

    // Pairwise Pearson correlation matrix (Stats.correlationMatrix) over
    // four lineitem measures in ONE scan: all six moments of every pair
    // ride one map-side-combined aggregation with EXACT scaled-integer
    // power sums (rint(term·1e6) limb-summed as longs — plain double corr
    // is partition-order dependent and can't hash across engines; decimal
    // sums are BigDecimal-boxed and ~20x slower). The oracle replays the
    // same scaled sums (BIGINT accumulates in HUGEINT there, no limbs
    // needed) — NOT the built-in corr(), whose accumulation is unstable.
    QueryDef("q170_correlation_matrix",
      (s, dir) =>
        Stats.correlationMatrix(table(s, dir, "lineitem"),
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy("col_x", "col_y"),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val arms = for {
          i <- cols.indices; j <- (i + 1) until cols.size
        } yield {
          val (x, y) = (cols(i), cols(j))
          def d(e: String) =
            s"(sum(CAST(round(($e) * 1000000.0) AS BIGINT))::DOUBLE / 1e6)"
          s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
             |  round(CASE WHEN n::DOUBLE*sxx - sx*sx > 0
             |         AND n::DOUBLE*syy - sy*sy > 0
             |    THEN (n::DOUBLE*sxy - sx*sy) / sqrt(n::DOUBLE*sxx - sx*sx)
             |                         / sqrt(n::DOUBLE*syy - sy*sy) END,
             |    6) AS corr
             |FROM (
             |  SELECT count(*)::BIGINT AS n,
             |    ${d(s"$x")} AS sx, ${d(s"$y")} AS sy,
             |    ${d(s"$x * $x")} AS sxx, ${d(s"$y * $y")} AS syy,
             |    ${d(s"$x * $y")} AS sxy
             |  FROM lineitem
             |  WHERE $x IS NOT NULL AND $y IS NOT NULL)""".stripMargin
        }
        arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_x, col_y")
      }),

    // PageRank (Clusters.pageRank, 3 synchronous rounds, d = 0.85) over
    // the directed customer→supplier fulfilment graph (orders ⋈ lineitem;
    // customer ids NEGATED so the two key spaces cannot collide) — the
    // authority score a web-corpus pipeline computes over its domain/host
    // link graph to weight sampling and quality priors. Every supplier is
    // DANGLING (no out-edges), so the uniform mass-redistribution path is
    // exercised on ~6% of total mass per round, not just the textbook
    // inflow term. The oracle unrolls all three rounds; both engines use
    // decimal-exact (order-independent) inflow/dangling sums and round
    // each round's ranks to 10 dp, so no float drift can accumulate, and
    // the teleport constant is interpolated from the SAME JVM double the
    // Spark side multiplies by.
    QueryDef("q186_pagerank_authority",
      (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select((-col("o_custkey")).as("src"), col("l_suppkey").as("dst"))
        Clusters.pageRank(e, "src", "dst", iterations = 3, damping = 0.85)
          .select(col("id"), round(col("rank"), 6).as("rank"))
          .orderBy("id")
      },
      Some(pageRankOracle(
        edgeCte = """e AS (
           |  SELECT DISTINCT -o_custkey AS src, l_suppkey AS dst, 1.0 AS w
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey)"""
          .stripMargin,
        degSql = "count(*)::DOUBLE",
        contribSql = "r.rank / dg.outdeg"))),

    // q186 with edge WEIGHTS: the fulfilment graph weighted by lineitem
    // multiplicity per (customer, supplier) — a supplier shipping 40
    // lines to one customer earns proportionally more of that customer's
    // rank than one shipping 2 (the host-graph form: link counts weight
    // the authority flow). Parallel edges collapse by EXACT decimal
    // weight sums; contributions are rank·w/W(u); the oracle replays the
    // same three weighted rounds.
    QueryDef("q192_pagerank_weighted",
      (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select((-col("o_custkey")).as("src"), col("l_suppkey").as("dst"),
            lit(1.0).as("w"))
        Clusters.pageRank(e, "src", "dst", iterations = 3, damping = 0.85,
            weightCol = Some("w"))
          .select(col("id"), round(col("rank"), 6).as("rank"))
          .orderBy("id")
      },
      Some(pageRankOracle(
        edgeCte = """e AS (
           |  SELECT -o_custkey AS src, l_suppkey AS dst,
           |         sum((1.0)::DECIMAL(28,10))::DOUBLE AS w
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           |  GROUP BY 1, 2)""".stripMargin,
        degSql = "sum(w::DECIMAL(28,10))::DOUBLE",
        contribSql = "r.rank * e.w / dg.outdeg"))),

    // Personalized PageRank (Clusters.personalizedPageRank): the random
    // surfer teleports to the SEED customers (custkey < 50) instead of
    // uniformly — trust propagation from a vetted set through the
    // fulfilment graph; dangling mass returns to the seeds too, so rank
    // mass stays 1 and off-seed vertices earn rank only through
    // in-links. Oracle unrolls the three rounds with the normalized
    // teleport weights pinned at 12 dp on both sides.
    QueryDef("q197_personalized_pagerank",
      (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select((-col("o_custkey")).as("src"), col("l_suppkey").as("dst"))
        val seeds = o.filter(col("o_custkey") < 50)
          .select((-col("o_custkey")).as("id")).distinct()
          .withColumn("w", lit(1.0))
        Clusters.personalizedPageRank(e, seeds, iterations = 3)
          .select(col("id"), round(col("rank"), 6).as("rank"))
          .orderBy("id")
      },
      Some {
        val d = 0.85
        val tele = 1.0 - d
        def iter(k: Int): String = {
          val p = s"r${k - 1}"
          s"""i$k AS (
             |  SELECT e.dst AS id,
             |    sum(round(r.rank / dg.outdeg, 14)::DECIMAL(38,14))::DOUBLE
             |      AS inflow
             |  FROM e JOIN $p r ON r.id = e.src
             |         JOIN deg dg ON dg.src = e.src
             |  GROUP BY 1),
             |d$k AS (
             |  SELECT coalesce(sum(r.rank::DECIMAL(20,10))::DOUBLE, 0.0)
             |      AS dm
             |  FROM $p r LEFT JOIN deg dg ON dg.src = r.id
             |  WHERE dg.src IS NULL),
             |r$k AS (
             |  SELECT w.id,
             |    round(w.wv * ($tele + $d * (SELECT dm FROM d$k)) + $d *
             |      coalesce(i.inflow, 0.0), 10) AS rank
             |  FROM w LEFT JOIN i$k i ON i.id = w.id)""".stripMargin
        }
        s"""WITH e AS (
           |  SELECT DISTINCT -o_custkey AS src, l_suppkey AS dst
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |tp AS (
           |  SELECT id, sum(round(wt, 10)::DECIMAL(28,10))::DOUBLE AS wt
           |  FROM (SELECT DISTINCT -o_custkey AS id, (1.0)::DOUBLE AS wt
           |        FROM orders WHERE o_custkey < 50)
           |  GROUP BY id),
           |wtot AS (SELECT sum(wt::DECIMAL(28,10))::DOUBLE AS t FROM tp),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e
           |      UNION SELECT id FROM tp),
           |deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e
           |        GROUP BY 1),
           |w AS (
           |  SELECT v.id,
           |    round(coalesce(tp.wt, 0.0) / (SELECT t FROM wtot), 12)
           |      AS wv
           |  FROM v LEFT JOIN tp ON tp.id = v.id),
           |r0 AS (SELECT id, round(wv, 10) AS rank FROM w),
           |${iter(1)},
           |${iter(2)},
           |${iter(3)}
           |SELECT id, round(rank, 6) AS rank FROM r3 ORDER BY id"""
          .stripMargin
      }),

    // HITS hubs & authorities (Clusters.hits, 3 rounds) on the same
    // fulfilment graph — the score family PageRank CANNOT produce here:
    // customers point and are never pointed at, so their PageRank is
    // pure teleport (uniform), while their HUB score ranks them by the
    // authority of the suppliers they buy from; suppliers get the
    // complementary authority ranking. The oracle unrolls all six
    // half-rounds with the same decimal-exact sums and L1 norms.
    QueryDef("q193_hits_hub_authority",
      (s, dir) => {
        val o = table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val l = table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"))
        val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select((-col("o_custkey")).as("src"), col("l_suppkey").as("dst"))
        Clusters.hits(e, "src", "dst", iterations = 3)
          .select(col("id"), round(col("hub"), 6).as("hub"),
            round(col("auth"), 6).as("auth"))
          .orderBy("id")
      },
      Some {
        def half(prevRel: String, prevCol: String, from: String,
                 to: String, outRel: String, outCol: String): String =
          s"""r$outRel AS (
             |  SELECT v.id, coalesce(s._raw, (0.0)::DOUBLE) AS raw
             |  FROM v LEFT JOIN (
             |    SELECT e.$to AS id,
             |      sum(p.$prevCol::DECIMAL(28,10))::DOUBLE AS _raw
             |    FROM e JOIN $prevRel p ON p.id = e.$from
             |    GROUP BY 1) s ON s.id = v.id),
             |$outRel AS (
             |  SELECT id, round(raw /
             |    (SELECT sum(raw::DECIMAL(28,10))::DOUBLE FROM r$outRel),
             |    10) AS $outCol
             |  FROM r$outRel)""".stripMargin
        val rounds = (1 to 3).map { k =>
          half(if (k == 1) "h0" else s"h${k - 1}", "hub", "src", "dst",
            s"a$k", "auth") + ",\n" +
            half(s"a$k", "auth", "dst", "src", s"h$k", "hub")
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT DISTINCT -o_custkey AS src, l_suppkey AS dst
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
           |h0 AS (SELECT id, (1.0)::DOUBLE AS hub FROM v),
           |$rounds
           |SELECT h.id, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
           |FROM h3 h JOIN a3 a USING (id) ORDER BY id""".stripMargin
      }),

    // One-scan numeric profile (Stats.profile): the survey report a
    // pipeline runs before writing expectations. Exact distinct counts
    // (the explode keeps the single distinct a plain two-phase agg, no
    // Expand), scaled-integer exact means. The oracle replays each
    // column's aggregates (the mean must be order-independent to hash).
    QueryDef("q171_numeric_profile",
      (s, dir) =>
        Stats.profile(table(s, dir, "lineitem"),
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy("column"),
      Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map {
          c =>
          s"""SELECT '$c' AS "column", count(*)::BIGINT AS n,
             |  (count(*) - count($c))::BIGINT AS n_null,
             |  count(DISTINCT $c)::BIGINT AS n_distinct,
             |  min($c)::DOUBLE AS min_v, max($c)::DOUBLE AS max_v,
             |  round(sum(CAST(round($c * 1000000.0) AS BIGINT))::DOUBLE
             |        / 1e6 / count($c), 6) AS mean
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")))
  )
}
