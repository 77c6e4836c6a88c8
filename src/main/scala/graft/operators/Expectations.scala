package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suites for ingest gating at corpus scale —
  * declare constraints on a table, measure them in one pass, and route
  * violating rows to quarantine (the Deequ / Great Expectations / Delta
  * CHECK-constraint capability, re-expressed as Spark plans).
  *
  * A [[Expectations.Rule]] is a named boolean `Column`; a row PASSES a rule
  * iff the check evaluates to exactly TRUE. NULL fails (stricter than the
  * ANSI CHECK constraint, which lets NULL through — a data gate that
  * silently admits NULLs is the classic ingest bug), so `inRange` on a NULL
  * value is a violation unless the rule itself admits it.
  *
  * Scale design, per surface:
  *  - row-level annotation ([[annotate]], [[split]], [[violationRows]]) is
  *    ONE codegen'd projection over the input — no shuffle, no UDFs; the
  *    violated-rule names materialize as a filtered array of literals;
  *  - [[metrics]] is ONE partial aggregation (map-side combine to a single
  *    row of counters, then an explode of that row into the tall report) —
  *    the corpus is scanned once no matter how many rules;
  *  - [[uniquenessReport]] is one exact two-stage hash aggregation on the
  *    key (group-by NULL semantics: NULL keys compare equal);
  *  - [[referentialReport]] counts orphans with a LEFT ANTI join — Catalyst
  *    broadcasts the dimension side when it is small (the usual case: the
  *    allowed-key universe), and AQE handles the rest;
  *  - [[suite]] unions the tiny per-check report frames — the input is
  *    scanned once per *family* (rows / each uniqueness key / each
  *    referential dim), never once per rule.
  *
  * Streaming: [[metrics]] and [[split]] are plain batch transforms, so a
  * `foreachBatch` sink gets per-micro-batch quality gating for free; the
  * report frame is tiny (rules × 1 rows) and safe to append anywhere.
  */
object Expectations {

  /** One named expectation; `check` must evaluate TRUE for a row to pass. */
  final case class Rule(name: String, check: Column)

  // ------------------------------------------------------------- builders

  def notNull(c: String): Rule = Rule(s"not_null($c)", col(c).isNotNull)

  /** Closed interval `[lo, hi]` — NULL fails (see object doc). */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)", col(c) >= lo && col(c) <= hi)

  def isIn(c: String, values: Seq[String]): Rule =
    Rule(s"is_in($c)", col(c).isin(values: _*))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", col(c).rlike(regex))

  /** Arbitrary named predicate (cross-column consistency checks etc.). */
  def satisfies(name: String, predicate: Column): Rule = Rule(name, predicate)

  /** TRUE iff the row VIOLATES the rule (NULL checks count as violations). */
  def violated(r: Rule): Column = !coalesce(r.check, lit(false))

  // ----------------------------------------------------------- row-level

  /** Refuse to shadow a pre-existing input column: `withColumn` REPLACES a
    * same-named column silently, so an input that already carries e.g.
    * `violated` would lose user data without error on the clean side.
    */
  private def requireFresh(df: DataFrame, names: Seq[String]): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")}; rename them " +
        "before gating (the gate columns would silently replace them)")
  }

  /** Input plus one boolean `_ok_<rule>` column per rule and an
    * `_n_violations` count — one codegen'd projection.
    */
  def annotate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    requireFresh(df, rules.map(r => s"_ok_${r.name}") :+ "_n_violations")
    val flagged = rules.foldLeft(df) { (d, r) =>
      d.withColumn(s"_ok_${r.name}", coalesce(r.check, lit(false)))
    }
    flagged.withColumn("_n_violations",
      rules.map(r => when(col(s"_ok_${r.name}"), 0).otherwise(1))
        .reduce(_ + _))
  }

  /** The violated-rule names of a row, in rule declaration order, as an
    * `array<string>` (empty = clean row). A filtered array of literals —
    * stays inside codegen.
    */
  def violatedArray(rules: Seq[Rule]): Column =
    filter(array(rules.map(r =>
      when(violated(r), lit(r.name)).otherwise(lit(null))): _*),
      x => x.isNotNull)

  /** Tall violation table: one `(idCols..., rule)` row per violated rule —
    * the quarantine audit log. One projection + an explode bounded by the
    * rule count.
    */
  def violationRows(df: DataFrame, idCols: Seq[String],
                    rules: Seq[Rule]): DataFrame =
    df.select(idCols.map(col) :+
        explode(violatedArray(rules)).as("rule"): _*)

  /** Route rows: (clean, quarantine). The quarantine side carries the
    * violated-rule names in `violated` (declaration order). Two filters
    * over one annotated projection — cache the input upstream if both
    * sides are consumed.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    requireFresh(df, Seq("violated"))
    val arr = violatedArray(rules)
    val tagged = df.withColumn("violated", arr)
    (tagged.filter(size(col("violated")) === 0).drop("violated"),
      tagged.filter(size(col("violated")) > 0))
  }

  // --------------------------------------------------------- suite report

  private val ReportCols = Seq("rule", "violations", "total",
    "violation_frac", "pass")

  private def reportRow(rule: Column, violations: Column,
                        total: Column): Seq[Column] = Seq(
    rule.as("rule"),
    violations.cast("long").as("violations"),
    total.cast("long").as("total"),
    round(violations.cast("double") / total, 6).as("violation_frac"),
    (violations === 0).as("pass"))

  /** Per-rule violation counts over ONE scan: a single-row conditional
    * aggregation (map-side combined) exploded into the tall
    * `(rule, violations, total, violation_frac, pass)` report.
    */
  def metrics(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("_total") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(violated(r), 1L).otherwise(0L)).as(s"_v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = explode(array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"_v$i").as("violations"))
    }: _*)).as("e")
    one.select(col("_total"), entries)
      .select(reportRow(col("e.rule"), col("e.violations"), col("_total")): _*)
  }

  /** Key-uniqueness report row: violations = surplus rows beyond the first
    * of each duplicated key (0 ⇔ the key is unique). Group-by NULL
    * semantics — NULL keys compare equal, as in DuckDB's `DISTINCT`.
    */
  def uniquenessReport(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val name = s"unique(${keyCols.mkString(",")})"
    df.agg(count(lit(1)).as("_total"),
        countDistinct(struct(keyCols.map(col): _*)).as("_distinct"))
      .select(reportRow(lit(name), col("_total") - col("_distinct"),
        col("_total")): _*)
  }

  /** Referential-integrity report row: violations = rows of `df` whose
    * `fkCol` (non-null) has no match in `dim.pkCol`. NULL foreign keys are
    * NOT orphans — pair with [[notNull]] when they should be. LEFT ANTI
    * join; Catalyst broadcasts small dims.
    */
  def referentialReport(df: DataFrame, fkCol: String,
                        dim: DataFrame, pkCol: String): DataFrame = {
    val name = s"ref($fkCol->$pkCol)"
    val total = df.agg(count(lit(1)).as("_total"))
    val orphans = df.filter(col(fkCol).isNotNull)
      .join(dim.select(col(pkCol)), col(fkCol) === col(pkCol), "left_anti")
      .agg(count(lit(1)).as("_orphans"))
    total.crossJoin(orphans)
      .select(reportRow(lit(name), col("_orphans"), col("_total")): _*)
  }

  /** The full suite: row rules + uniqueness keys + referential checks as
    * one tall report, ordered by rule name. One corpus scan for all row
    * rules; one aggregation per uniqueness key; one anti-join per
    * referential check.
    */
  def suite(df: DataFrame, rules: Seq[Rule],
            uniqueKeys: Seq[Seq[String]] = Nil,
            refs: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    val parts =
      (if (rules.nonEmpty) Seq(metrics(df, rules)) else Nil) ++
        uniqueKeys.map(k => uniquenessReport(df, k)) ++
        refs.map { case (fk, dim, pk) => referentialReport(df, fk, dim, pk) }
    require(parts.nonEmpty, "empty expectation suite")
    parts.reduce(_.unionByName(_)).orderBy("rule")
  }
}
