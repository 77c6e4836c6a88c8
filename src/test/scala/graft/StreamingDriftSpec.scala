package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Drift
import graft.streaming.StreamingDrift

/** The streaming drift monitor: streamed PSI and KS are EXACTLY the batch
  * detectors over (reference, streamed union) — counts merge losslessly —
  * with replay idempotence, an immutable reference, and fold-invisibility.
  */
@SlowSuite
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private lazy val reference = orders.filter(col("o_orderkey") % 2 === 0)
  private lazy val liveAll = orders.filter(col("o_orderkey") % 2 === 1)
  private val breaks = Seq(50000.0, 150000.0, 300000.0)

  private def initAndFeed(st: String, nSlices: Int = 3): Unit = {
    StreamingDrift.init(reference, st, "o_totalprice", breaks)
    (0 until nSlices).foreach { i =>
      StreamingDrift.processBatch(
        liveAll.filter(pmod(col("o_orderkey"), lit(7)) === i), st, i.toLong)
    }
  }

  private def live(nSlices: Int = 3) =
    liveAll.filter(pmod(col("o_orderkey"), lit(7)) < nSlices)

  test("streamed PSI decomposition == batch psiBuckets(reference, union)") {
    val st = Files.createTempDirectory("drift-psi").toString
    initAndFeed(st)
    val streamed = StreamingDrift.psiReport(spark, st)
      .collect().map(_.toSeq).toSeq
    val batch = Drift.psiBuckets(reference, live(), "o_totalprice", breaks)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    val psiS = StreamingDrift.psiTotal(spark, st)
      .collect()(0).getAs[Double]("psi")
    val psiB = Drift.psi(reference, live(), "o_totalprice", breaks)
      .collect()(0).getAs[Double]("psi")
    assert(psiS == psiB)
  }

  test("streamed JS divergence == batch jsDivergence(reference, union)") {
    val st = Files.createTempDirectory("drift-js").toString
    initAndFeed(st)
    val streamed = StreamingDrift.jsReport(spark, st).collect()(0).toSeq
    val batch = Drift.jsDivergence(reference, live(), "o_totalprice", breaks)
      .collect()(0).toSeq
    assert(streamed == batch)
  }

  test("streamed KS == batch ksStatistic(reference, union)") {
    val st = Files.createTempDirectory("drift-ks").toString
    initAndFeed(st)
    val streamed = StreamingDrift.ksReport(spark, st)
      .collect()(0).toSeq
    val batch = Drift.ksStatistic(reference, live(), "o_totalprice")
      .collect()(0).toSeq
    assert(streamed == batch)
  }

  test("replayed batch is absorbed; compaction is invisible to both reports") {
    val st = Files.createTempDirectory("drift-rp").toString
    initAndFeed(st)
    val psi0 = StreamingDrift.psiReport(spark, st)
      .collect().map(_.toSeq).toSeq
    val ks0 = StreamingDrift.ksReport(spark, st).collect()(0).toSeq
    // replay batch 1
    StreamingDrift.processBatch(
      liveAll.filter(pmod(col("o_orderkey"), lit(7)) === 1), st, 1L)
    assert(StreamingDrift.psiReport(spark, st)
      .collect().map(_.toSeq).toSeq == psi0)
    StreamingDrift.compact(spark, st, keepBatches = 1)
    assert(new java.io.File(s"$st/psi_base").exists() &&
      new java.io.File(s"$st/ks_base").exists())
    assert(StreamingDrift.psiReport(spark, st)
      .collect().map(_.toSeq).toSeq == psi0)
    assert(StreamingDrift.ksReport(spark, st).collect()(0).toSeq == ks0)
    // a recent batch's replay after the fold still lands in its partition
    StreamingDrift.processBatch(
      liveAll.filter(pmod(col("o_orderkey"), lit(7)) === 2), st, 2L)
    assert(StreamingDrift.psiReport(spark, st)
      .collect().map(_.toSeq).toSeq == psi0)
  }

  test("streamed chi-squared == batch chiSquared over the union; " +
       "catCol-less monitor refuses") {
    val st = Files.createTempDirectory("drift-chi").toString
    StreamingDrift.init(reference, st, "o_totalprice", breaks,
      catCol = Some("o_orderstatus"))
    (0 until 3).foreach { i =>
      StreamingDrift.processBatch(
        liveAll.filter(pmod(col("o_orderkey"), lit(7)) === i), st, i.toLong)
    }
    val streamed = StreamingDrift.chiSquaredReport(spark, st)
      .collect()(0).toSeq
    val batch = Drift.chiSquared(reference, live(), "o_orderstatus")
      .collect()(0).toSeq
    assert(streamed == batch)
    // fold-invariant
    StreamingDrift.compact(spark, st, keepBatches = 1)
    assert(StreamingDrift.chiSquaredReport(spark, st)
      .collect()(0).toSeq == streamed)
    // a monitor initialized without a catCol refuses the report
    val st2 = Files.createTempDirectory("drift-nocat").toString
    StreamingDrift.init(reference, st2, "o_totalprice", breaks)
    intercept[IllegalArgumentException] {
      StreamingDrift.chiSquaredReport(spark, st2)
    }
  }

  test("streamed exact quantiles == batch exactQuantiles over the union") {
    val st = Files.createTempDirectory("drift-q").toString
    initAndFeed(st)
    val probs = Seq(0.1, 0.5, 0.9)
    val streamed = StreamingDrift.quantilesReport(spark, st, probs)
      .orderBy("prob").collect().map(_.toSeq).toSeq
    val batch = graft.operators.Stats
      .exactQuantiles(live(), "o_totalprice", probs)
      .orderBy("prob").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    // the fold changes nothing
    StreamingDrift.compact(spark, st, keepBatches = 1)
    assert(StreamingDrift.quantilesReport(spark, st, probs)
      .orderBy("prob").collect().map(_.toSeq).toSeq == streamed)
  }

  test("KsBinning bounds KS state under an adversarial all-distinct " +
       "stream, and the binned statistic stays within one cell mass of " +
       "the exact KS") {
    val st = Files.createTempDirectory("drift-ksbin").toString
    val bins = 50
    // adversarial: EVERY value distinct on both sides; live shifted +8
    val ref = (0 until 4000).map(i => i * 0.025 + 0.0125).toDF("v")
    val liveRaw = (0 until 4000).map(i => i * 0.025 + 8.0071).toDF("v")
    StreamingDrift.init(ref, st, "v", Seq(50.0),
      ksBinning = Some(StreamingDrift.KsBinning(0.0, 110.0, bins)))
    (0 until 3).foreach { i =>
      StreamingDrift.processBatch(
        liveRaw.filter(pmod(floor(col("v") * 40), lit(3)) === i), st,
        i.toLong)
    }
    // state bound: ≤ bins + 2 rows per side despite 4000 distinct values
    val stateRows = spark.read.parquet(s"$st/ks")
      .select("v").distinct().count()
    assert(stateRows <= bins + 2,
      s"binned KS state must stay ≤ ${bins + 2} rows, got $stateRows")
    val refRows = spark.read.parquet(s"$st/reference/ks").count()
    assert(refRows <= bins + 2)
    // resolution: |KS_binned − KS_exact| ≤ max single-cell mass (≈1/bins
    // for this near-uniform fixture, with slack for edge-cell rounding)
    val binned = StreamingDrift.ksReport(spark, st)
      .collect()(0).getAs[Double]("ks_d")
    val exact = Drift.ksStatistic(ref, liveRaw, "v")
      .collect()(0).getAs[Double]("ks_d")
    assert(math.abs(binned - exact) <= 1.0 / bins + 1e-6,
      s"binned $binned vs exact $exact exceeds the one-cell bound")
    // quantiles stay within one cell width of the exact ones
    val qB = StreamingDrift.quantilesReport(spark, st, Seq(0.5))
      .collect()(0).getAs[Double]("q")
    val qE = graft.operators.Stats.exactQuantiles(
      liveRaw, "v", Seq(0.5)).collect()(0).getAs[Double]("q")
    assert(math.abs(qB - qE) <= 110.0 / bins + 1e-6)
  }

  test("monitor shape is immutable: double init refused, pre-init batch fails") {
    val st = Files.createTempDirectory("drift-im").toString
    StreamingDrift.init(reference, st, "o_totalprice", breaks)
    intercept[IllegalArgumentException] {
      StreamingDrift.init(reference, st, "o_totalprice", Seq(1.0))
    }
    val st2 = Files.createTempDirectory("drift-pre").toString
    intercept[IllegalStateException] {
      StreamingDrift.processBatch(liveAll, st2, 0L)
    }
    // markerless existing state: refuse to guess
    Seq((0, 5L)).toDF("bucket", "n").write.parquet(s"$st2/psi/batch=0")
    intercept[IllegalStateException] {
      StreamingDrift.init(reference, st2, "o_totalprice", breaks)
    }
  }

  test("pre-stream polls: PSI reads all-zero live mass, KS throws like batch") {
    val st = Files.createTempDirectory("drift-es").toString
    StreamingDrift.init(reference, st, "o_totalprice", breaks)
    val rows = StreamingDrift.psiReport(spark, st).collect()
    assert(rows.length == breaks.size + 1)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_b") == 0L)
      assert(!r.getAs[Double]("contrib").isNaN) // smoothing keeps it finite
    }
    intercept[IllegalArgumentException] {
      StreamingDrift.ksReport(spark, st).collect()
    }
  }

  test("real writeStream sink tracks a file stream exactly") {
    val in = Files.createTempDirectory("drift-in").toString
    val st = Files.createTempDirectory("drift-sk").toString
    val ck = Files.createTempDirectory("drift-ck").toString
    StreamingDrift.init(reference, st, "o_totalprice", breaks)
    val feed = liveAll.select(col("o_orderkey"), col("o_totalprice"))
    feed.filter(pmod(col("o_orderkey"), lit(7)) === 0)
      .write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema("o_orderkey LONG, o_totalprice DOUBLE").parquet(in)
    val q = StreamingDrift.sink(stream, st, ck, autoCompactEvery = 0)
    try {
      q.processAllAvailable()
      feed.filter(pmod(col("o_orderkey"), lit(7)) === 1)
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val streamed = StreamingDrift.psiReport(spark, st)
        .collect().map(_.toSeq).toSeq
      val batch = Drift.psiBuckets(reference, live(2), "o_totalprice", breaks)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
