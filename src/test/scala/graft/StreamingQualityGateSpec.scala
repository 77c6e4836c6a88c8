package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.streaming.StreamingQualityGate

/** The streaming expectation gate: streamed metrics EXACTLY equal the
  * batch suite over the union, routing partitions the input, replays are
  * idempotent, rule drift fails fast, and compaction is invisible.
  */
@SlowSuite
class StreamingQualityGateSpec extends SparkSpec {
  import spark.implicits._

  private def rules = Seq(
    Expectations.notNull("text"),
    Expectations.inRange("n_chars", 100, 500),
    Expectations.satisfies("min_words(text)",
      graft.functions.TextFunctions.tokenCount(col("text")) >= 20))

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "n_chars")

  private def slices = Seq(0L, 150L, 300L).map(lo =>
    docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 150))

  test("streamed metrics report == batch Expectations.metrics over the union") {
    val st = Files.createTempDirectory("gate-st").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      StreamingQualityGate.processBatch(s, st, i.toLong, rules)
    }
    val streamed = StreamingQualityGate.metricsReport(spark, st)
      .collect().map(_.toSeq).toSeq
    val batch = Expectations.metrics(docs.filter(col("doc_id") < 450), rules)
      .orderBy("rule").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("clean + quarantine partition the input; violated arrays carried") {
    val st = Files.createTempDirectory("gate-rt").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      StreamingQualityGate.processBatch(s, st, i.toLong, rules)
    }
    val in = docs.filter(col("doc_id") < 450)
    val clean = StreamingQualityGate.clean(spark, st)
    val quar = StreamingQualityGate.quarantine(spark, st)
    assert(clean.count() + quar.count() == in.count())
    assert(clean.select("doc_id").intersect(quar.select("doc_id")).count() == 0)
    // every quarantined row violates exactly the rules its array names
    val (cleanTwin, quarTwin) = Expectations.split(in, rules)
    assert(quar.select(col("doc_id"), col("violated").cast("string"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      quarTwin.select(col("doc_id"), col("violated").cast("string"))
        .orderBy("doc_id").collect().map(_.toSeq).toSeq)
    assert(clean.columns.toSeq == cleanTwin.columns.toSeq)
  }

  test("replayed batch rewrites its own partitions — nothing double-counts") {
    val st = Files.createTempDirectory("gate-rp").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      StreamingQualityGate.processBatch(s, st, i.toLong, rules)
    }
    val before = StreamingQualityGate.metricsReport(spark, st)
      .collect().map(_.toSeq).toSeq
    val cnt = StreamingQualityGate.clean(spark, st).count() +
      StreamingQualityGate.quarantine(spark, st).count()
    StreamingQualityGate.processBatch(slices(1), st, 1L, rules) // replay
    assert(StreamingQualityGate.metricsReport(spark, st)
      .collect().map(_.toSeq).toSeq == before)
    assert(StreamingQualityGate.clean(spark, st).count() +
      StreamingQualityGate.quarantine(spark, st).count() == cnt)
  }

  test("rule drift fails fast; unstamped existing state refused") {
    val st = Files.createTempDirectory("gate-dr").toString
    StreamingQualityGate.processBatch(slices(0), st, 0L, rules)
    // renamed rule
    val renamed = rules.updated(0, Expectations.Rule("renamed",
      col("text").isNotNull))
    intercept[IllegalArgumentException] {
      StreamingQualityGate.processBatch(slices(1), st, 1L, renamed)
    }
    // same name, different predicate
    val repredicated = rules.updated(1,
      Expectations.Rule("in_range(n_chars)", col("n_chars") >= 0))
    intercept[IllegalArgumentException] {
      StreamingQualityGate.processBatch(slices(1), st, 1L, repredicated)
    }
    // state without a fingerprint marker: refuse to guess
    val orphan = Files.createTempDirectory("gate-or").toString
    Seq(("r", 1L, 2L)).toDF("rule", "violations", "total")
      .write.parquet(s"$orphan/metrics/batch=0")
    intercept[IllegalStateException] {
      StreamingQualityGate.processBatch(slices(0), orphan, 1L, rules)
    }
  }

  test("compaction folds metrics partials; reports and routed data unchanged") {
    val st = Files.createTempDirectory("gate-cp").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      StreamingQualityGate.processBatch(s, st, i.toLong, rules)
    }
    val report = StreamingQualityGate.metricsReport(spark, st)
      .collect().map(_.toSeq).toSeq
    val nClean = StreamingQualityGate.clean(spark, st).count()
    StreamingQualityGate.compact(spark, st, keepBatches = 1)
    assert(new java.io.File(s"$st/metrics_base").exists())
    assert(StreamingQualityGate.metricsReport(spark, st)
      .collect().map(_.toSeq).toSeq == report)
    assert(StreamingQualityGate.clean(spark, st).count() == nClean)
    // a recent batch's replay after the fold still lands in its partition
    StreamingQualityGate.processBatch(slices(2), st, 2L, rules)
    assert(StreamingQualityGate.metricsReport(spark, st)
      .collect().map(_.toSeq).toSeq == report)
  }

  test("real writeStream sink gates a file stream like the batch suite") {
    val in = Files.createTempDirectory("gate-in").toString
    val st = Files.createTempDirectory("gate-sk").toString
    val ck = Files.createTempDirectory("gate-ck").toString
    docs.filter(col("doc_id") < 150).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, n_chars LONG").parquet(in)
    val q = StreamingQualityGate.sink(stream, st, ck, rules,
      autoCompactEvery = 0)
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = StreamingQualityGate.metricsReport(spark, st)
        .collect().map(_.toSeq).toSeq
      val batch = Expectations.metrics(docs.filter(col("doc_id") < 300), rules)
        .orderBy("rule").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
