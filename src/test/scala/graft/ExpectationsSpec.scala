package graft

import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations.Rule

/** Data-quality expectation suites: NULL semantics, routing, single-pass
  * metrics, uniqueness/referential report rows, and the no-shuffle plan
  * contract for the row-level surface.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma", 16, "en"),
    (2L, null.asInstanceOf[String], 0, "en"), // null text
    (3L, "x", 1, "zz"),                       // short + bad lang
    (4L, "delta epsilon", 13, "de")
  ).toDF("id", "text", "n_chars", "lang")

  private def rules = Seq(
    Expectations.notNull("text"),
    Expectations.inRange("n_chars", 2, 100),
    Expectations.isIn("lang", Seq("en", "de")))

  test("NULL fails every rule, including range checks on NULL values") {
    val r = Rule("r", length(col("text")) > 5) // NULL text → NULL check
    val viol = docs.filter(Expectations.violated(r))
      .select("id").as[Long].collect().sorted
    // id 2 (NULL check) and id 3 (length 1) violate; 4 has length 13
    assert(viol.toSeq == Seq(2L, 3L))
  }

  test("split partitions the input; violated array in declaration order") {
    val (clean, quarantine) = Expectations.split(docs, rules)
    assert(clean.count() + quarantine.count() == docs.count())
    val q = quarantine.select(col("id"), col("violated"))
      .as[(Long, Seq[String])].collect().toMap
    assert(q(2L) == Seq("not_null(text)", "in_range(n_chars)"))
    assert(q(3L) == Seq("in_range(n_chars)", "is_in(lang)")) // n_chars=1 < 2
    assert(!q.contains(1L) && !q.contains(4L))
    assert(clean.columns.toSeq == docs.columns.toSeq) // no leftover cols
  }

  test("metrics: one-pass counts equal brute force; frac and pass derived") {
    val m = Expectations.metrics(docs, rules).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("violations"), r.getAs[Long]("total"),
          r.getAs[Boolean]("pass"))).toMap
    assert(m("not_null(text)") == ((1L, 4L, false)))
    assert(m("in_range(n_chars)") == ((2L, 4L, false))) // null-text row: 0 ∉ [2,100]
    assert(m("is_in(lang)") == ((1L, 4L, false)))
    val frac = Expectations.metrics(docs, rules).collect()
      .find(_.getAs[String]("rule") == "not_null(text)").get
      .getAs[Double]("violation_frac")
    assert(approx(frac, 0.25))
  }

  test("metrics plan: single scan, no shuffle-producing join") {
    val plan = Expectations.metrics(docs, rules)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("uniqueness: surplus rows; NULL keys compare equal (group-by semantics)") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), (null, 4), (null, 5))
      .toDF("k", "v")
    val r = Expectations.uniquenessReport(df, Seq("k")).collect()(0)
    // 5 rows, 3 distinct keys (a, b, NULL) → 2 surplus
    assert(r.getAs[Long]("violations") == 2L)
    assert(r.getAs[Long]("total") == 5L)
    assert(!r.getAs[Boolean]("pass"))
    val ok = Expectations.uniquenessReport(docs, Seq("id")).collect()(0)
    assert(ok.getAs[Long]("violations") == 0L && ok.getAs[Boolean]("pass"))
  }

  test("referential: orphans counted, NULL foreign keys are not orphans") {
    val fact = Seq((1L, Some(10L)), (2L, Some(99L)), (3L, None))
      .toDF("id", "fk")
    val dim = Seq(10L, 11L).toDF("pk")
    val r = Expectations.referentialReport(fact, "fk", dim, "pk").collect()(0)
    assert(r.getAs[String]("rule") == "ref(fk->pk)")
    assert(r.getAs[Long]("violations") == 1L) // only fk=99
    assert(r.getAs[Long]("total") == 3L)
  }

  test("suite: all families in one ordered report") {
    val dim = Seq("en", "de").toDF("code")
    val rep = Expectations.suite(docs, rules,
      uniqueKeys = Seq(Seq("id"), Seq("lang")),
      refs = Seq(("lang", dim, "code")))
    val names = rep.select("rule").as[String].collect().toSeq
    assert(names == names.sorted)
    assert(names.size == rules.size + 2 + 1)
    // the lang referential check: 'zz' orphaned once
    val ref = rep.filter(col("rule") === "ref(lang->code)").collect()(0)
    assert(ref.getAs[Long]("violations") == 1L)
  }

  test("violationRows: tall audit log matches split's quarantine") {
    val tall = Expectations.violationRows(docs, Seq("id"), rules)
      .as[(Long, String)].collect().toSet
    assert(tall == Set(
      (2L, "not_null(text)"), (2L, "in_range(n_chars)"),
      (3L, "in_range(n_chars)"), (3L, "is_in(lang)")))
  }
}
