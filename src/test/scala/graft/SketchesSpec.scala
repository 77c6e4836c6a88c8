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
}
