package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout
import graft.streaming.StreamingZLayout
import graft.streaming.StreamingZLayout.{BatchResult, Params}

/** The streaming Z-layout maintenance sink: bootstrap-from-first-batch,
  * per-batch append, exactly-once under foreachBatch replay (the batch id
  * rides the atomic index-epoch commit), and drift-bounded compaction —
  * the stream must converge to the same table a batch build would.
  */
@SlowSuite
class StreamingZLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def rows(lo: Int, hi: Int) = (lo to hi).map { i =>
    val x = (i * 2654435761L % 10000).toDouble / 10000.0
    val y = (i * 40503L % 10000).toDouble / 10000.0
    (i.toLong, x, y)
  }.toDF("id", "x", "y")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private val p = Params(zcols = Seq("x", "y"), bits = 8, nFiles = 4,
    tieCol = Some("id"), compactFactor = 2)

  test("bootstrap + appends converge to the batch table; an empty first " +
       "batch defers; replayed batches are skipped exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("zstream").toString + "/t"

    // empty first batch: no bounds to derive from — defer bootstrap
    val r0 = StreamingZLayout.processBatch(rows(1, 0), 0L, dir, p)
    assert(r0 == BatchResult(false, false, false, 0))
    assert(Layout.readLayoutManifest(spark, dir).isEmpty)

    val r1 = StreamingZLayout.processBatch(rows(1, 2000), 1L, dir, p)
    assert(r1.applied && r1.bootstrapped && r1.nFiles == p.nFiles)
    val r2 = StreamingZLayout.processBatch(rows(2001, 3000), 2L, dir, p)
    assert(r2.applied && !r2.bootstrapped)

    def served = spark.read.format("graft-zorder").load(dir)
    assert(ids(served) == (1L to 3000L).toSet,
      "stream must converge to the batch table")

    // foreachBatch replay: batch 2's append committed but the offset
    // checkpoint didn't — the sink must recognize the committed
    // streamBatchId tag and skip, or every replay doubles rows
    val replay = StreamingZLayout.processBatch(rows(2001, 3000), 2L, dir, p)
    assert(!replay.applied, "replayed batch must be skipped")
    assert(served.count() == 3000L, "replay doubled rows")
    // a LATER batch still applies
    val r3 = StreamingZLayout.processBatch(rows(3001, 3200), 3L, dir, p)
    assert(r3.applied)
    assert(served.count() == 3200L)

    // an EMPTY batch reports applied=false (nothing committed, no
    // watermark advance) and the next real batch still applies
    val r4 = StreamingZLayout.processBatch(rows(1, 0), 4L, dir, p)
    assert(!r4.applied && !r4.compacted,
      s"empty append must not report a commit: $r4")
    val r5 = StreamingZLayout.processBatch(rows(3201, 3300), 5L, dir, p)
    assert(r5.applied)
    assert(served.count() == 3300L)

    // box-query parity against the plain batch baseline, with pruning —
    // a CORNER box: with nFiles=4 the build files are z-quadrants, so a
    // center box would legitimately touch all four; the corner box must
    // skip at least the opposite quadrants (delta files each span wide
    // ranges until compaction, so they stay kept)
    val want = ids(rows(1, 3300)
      .filter(col("x").between(0.05, 0.15) && col("y").between(0.05, 0.15)))
    val got = ids(served
      .filter(col("x").between(0.05, 0.15) && col("y").between(0.05, 0.15)))
    assert(got == want && want.nonEmpty)
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(kept < total, s"maintained layout must still prune: $kept/$total")
  }

  test("writeStream.format(\"graft-zorder\") drives the sink end-to-end: " +
       "a real streaming query bootstraps, appends per micro-batch, " +
       "commits the batch-id watermark, and the table serves with " +
       "pruning") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("zsink").toString
    val dir = s"$base/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Double, Double)]
    val q = ms.toDF().toDF("id", "x", "y")
      .writeStream.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8")
      .option("nFiles", "4").option("tieCol", "id")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start(dir)
    try {
      def tup(lo: Int, hi: Int) = (lo to hi).map { i =>
        val x = (i * 2654435761L % 10000).toDouble / 10000.0
        val y = (i * 40503L % 10000).toDouble / 10000.0
        (i.toLong, x, y)
      }
      ms.addData(tup(1, 1500): _*)
      q.processAllAvailable()
      ms.addData(tup(1501, 2000): _*)
      q.processAllAvailable()
      val served = spark.read.format("graft-zorder").load(dir)
      assert(ids(served) == (1L to 2000L).toSet,
        "streamed layout must converge to the batch table")
      assert(Layout.readLayoutManifest(spark, dir).exists(
        _.zcols == Seq("x", "y")), "sink must persist the manifest")
      assert(Layout.epochTags(spark, dir).contains("streamBatchId"),
        "the batch-id watermark must ride the committed epoch")
      served.filter(col("x").between(0.05, 0.15) &&
          col("y").between(0.05, 0.15)).collect()
      val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
      assert(kept < total,
        s"streamed layout must prune a corner box: $kept/$total")
    } finally q.stop()
    // update mode is refused at sink creation
    val e = intercept[Exception] {
      ms.toDF().toDF("id", "x", "y")
        .writeStream.format("graft-zorder")
        .option("zcols", "x,y")
        .option("checkpointLocation", s"$base/ckpt2")
        .outputMode("update").start(s"$base/t2")
    }
    assert(e.getMessage != null)
  }

  test("resetProgress is the one-shot escape for a NEW checkpoint over " +
       "an existing layout: low batch ids apply once, then replay " +
       "protection resumes; the registered sink exposes it as an option") {
    val base = java.nio.file.Files.createTempDirectory("zreset").toString
    val dir = s"$base/t"
    // a layout whose watermark is already at batch 5
    assert(StreamingZLayout.processBatch(rows(1, 500), 5L, dir, p)
      .bootstrapped)
    // new checkpoint: ids restart at 0 — silently dropped without reset
    val dropped = StreamingZLayout.processBatch(rows(501, 600), 0L, dir, p)
    assert(!dropped.applied, "low batch id must be skipped by default")
    val reset = StreamingZLayout.processBatch(rows(501, 600), 0L, dir, p,
      resetProgress = true)
    assert(reset.applied, "resetProgress must accept the new run's batch")
    // the watermark is now the new run's id: a replay of it is skipped
    // WITHOUT the flag (the sink clears it after the first apply)
    val replay = StreamingZLayout.processBatch(rows(501, 600), 0L, dir, p)
    assert(!replay.applied, "replay after reset must be recognized")
    assert(ids(spark.read.format("graft-zorder").load(dir)) ==
      (1L to 600L).toSet)

    // the registered sink: a fresh checkpoint + resetProgress option
    // applies new data against the old watermark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Double, Double)]
    val q = ms.toDF().toDF("id", "x", "y")
      .writeStream.format("graft-zorder")
      .option("zcols", "x,y").option("resetProgress", "true")
      .option("checkpointLocation", s"$base/ckpt2")
      .outputMode("append").start(dir)
    try {
      ms.addData((601 to 700).map { i =>
        val x = (i * 2654435761L % 10000).toDouble / 10000.0
        val y = (i * 40503L % 10000).toDouble / 10000.0
        (i.toLong, x, y)
      }: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(spark.read.format("graft-zorder").load(dir)) ==
      (1L to 700L).toSet,
      "the sink's resetProgress option must accept the new checkpoint")
  }

  test("randomized maintenance property: any interleaving of appends, " +
       "replays, crashed-writer orphans, and compactions serves EXACTLY " +
       "the union of committed batches") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 2) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"zprop$trial").toString + "/t"
      var nextRow = 1
      var committed = Set.empty[Long]
      var batchId = 0L
      var lastBatch: org.apache.spark.sql.DataFrame = null
      def freshBatch(n: Int) = {
        val df = rows(nextRow, nextRow + n - 1)
        committed ++= (nextRow.toLong to (nextRow + n - 1).toLong)
        nextRow += n
        df
      }
      // bootstrap
      lastBatch = freshBatch(400 + rnd.nextInt(400))
      assert(StreamingZLayout.processBatch(lastBatch, batchId, dir, p)
        .bootstrapped)
      def servedIds() = ids(spark.read.format("graft-zorder").load(dir))
      for (_ <- 1 to 8) {
        rnd.nextInt(4) match {
          case 0 => // append a fresh batch
            batchId += 1
            lastBatch = freshBatch(50 + rnd.nextInt(200))
            assert(StreamingZLayout.processBatch(
              lastBatch, batchId, dir, p).applied)
          case 1 => // replay the last applied batch (lost offset commit)
            val r = StreamingZLayout.processBatch(
              lastBatch, batchId, dir, p)
            assert(!r.applied, "replay must be recognized")
          case 2 => // a writer that crashed before its index commit
            Layout.zorderWrite(rows(800001, 800020),
              col("id"), col("id"), 1, dir, mode = "append")
          case 3 =>
            Layout.compact(spark, dir)
        }
        assert(servedIds() == committed,
          s"trial $trial: served table diverged from the committed union")
      }
      // a final compact leaves the directory itself clean of orphans
      Layout.compact(spark, dir)
      assert(ids(spark.read.parquet(dir)) == committed,
        s"trial $trial: compact left orphan rows in the directory")
    }
  }

  test("file-count drift triggers compaction; tags survive it (a replay " +
       "AFTER compact is still skipped) and results are unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("zstreamc").toString + "/t"
    StreamingZLayout.processBatch(rows(1, 2000), 0L, dir, p)
    // each append adds >= 1 file over nFiles=4, factor 2 → a compact
    // must fire within a handful of batches
    var compactedAt = -1L
    var id = 1L
    while (compactedAt < 0 && id <= 12L) {
      val lo = 2000 + (id.toInt - 1) * 100 + 1
      val r = StreamingZLayout.processBatch(rows(lo, lo + 99), id, dir, p)
      assert(r.applied)
      if (r.compacted) compactedAt = id
      id += 1
    }
    assert(compactedAt > 0, "drifting file count must trigger compaction")
    val nAfter = Layout.listDataFiles(spark, dir).size
    assert(nAfter == p.nFiles,
      s"compaction must restore the build file count, got $nAfter")

    val hi = 2000 + (id.toInt - 1) * 100
    def served = spark.read.format("graft-zorder").load(dir)
    assert(ids(served) == (1L to hi.toLong).toSet,
      "compaction changed the table")

    // the compact carried the watermark: replaying the batch whose
    // append preceded the compact must STILL be recognized as applied
    val lo = 2000 + (compactedAt.toInt - 1) * 100 + 1
    val replay = StreamingZLayout.processBatch(
      rows(lo, lo + 99), compactedAt, dir, p)
    assert(!replay.applied,
      "compaction lost the streamBatchId watermark — replay doubled rows")
    assert(served.count() == hi.toLong)
  }

  test("bloomCols sink param: bootstrap commits the sidecar, point " +
       "probes narrow from batch 0, appended rows stay findable, and " +
       "the automatic compaction refreshes coverage") {
    import graft.sources.ZOrderSource
    val dir = java.nio.file.Files.createTempDirectory("zstream_b")
      .toString + "/t"
    val pb = p.copy(bloomCols = Seq("id"))
    assert(StreamingZLayout.processBatch(rows(1, 2000), 0L, dir, pb)
      .bootstrapped)
    def probe(id: Long): (Seq[Long], (Int, Int)) = {
      val got = spark.read.format("graft-zorder").load(dir)
        .filter(col("id") === id).select("id")
        .collect().map(_.getLong(0)).toSeq
      (got, ZOrderSource.lastScan.get())
    }
    val (r1, (k1, t1)) = probe(777L)
    assert(r1 == Seq(777L) && k1 < t1,
      s"bootstrap sidecar must narrow a point probe: $k1/$t1")
    // append until the file-count drift triggers the automatic
    // compaction — which must REFRESH the sidecar over the new files
    var compacted = false
    var b = 1L
    while (!compacted && b <= 12L) {
      val lo = 2000 + (b.toInt - 1) * 100 + 1
      compacted = StreamingZLayout.processBatch(
        rows(lo, lo + 99), b, dir, pb).compacted
      b += 1
    }
    assert(compacted, "fixture must reach a compaction")
    val late = 2000 + (b.toInt - 2) * 100 + 50L // an id from a late batch
    val (r2, (k2, t2)) = probe(late)
    assert(r2 == Seq(late),
      "post-compaction bloom read lost an appended row")
    assert(k2 < t2,
      s"compaction must refresh the sidecar (full coverage): $k2/$t2")
  }

  test("curve=hilbert streams: bootstrap persists the curve, appends " +
       "replay it, a morton-configured sink against the hilbert layout " +
       "fails fast, and the served table stays row-exact") {
    val dir = java.nio.file.Files.createTempDirectory("zstream_h")
      .toString + "/t"
    val ph = p.copy(curve = "hilbert")
    val r1 = StreamingZLayout.processBatch(rows(1, 2000), 0L, dir, ph)
    assert(r1.applied && r1.bootstrapped)
    assert(Layout.readLayoutManifest(spark, dir).exists(_.curve == "hilbert"),
      "bootstrap must persist the configured curve")
    val r2 = StreamingZLayout.processBatch(rows(2001, 2500), 1L, dir, ph)
    assert(r2.applied)
    assert(ids(spark.read.format("graft-zorder").load(dir)) ==
      (1L to 2500L).toSet, "hilbert stream must converge to the batch table")
    val e = intercept[IllegalArgumentException] {
      StreamingZLayout.processBatch(rows(2501, 2600), 2L, dir, p)
    }
    assert(e.getMessage.contains("curve"),
      s"curve drift must fail fast naming the curve: ${e.getMessage}")
  }
}
