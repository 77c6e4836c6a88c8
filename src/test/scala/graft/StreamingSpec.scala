package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Online

/** T1/T3 — incremental folder processing via Structured Streaming must
  * reproduce the batch reduction as files arrive.
  */
@SlowSuite
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Run `f` with the RocksDB state-store provider — the corpus-scale
    * configuration every stateful-dedup scaladoc claims. Streaming state
    * then lives off-heap/on-disk per executor instead of in an in-memory
    * HashMap, which is what makes 10⁹-key dedup state survivable; these
    * specs prove the operators (signatures, band keys, timeouts,
    * checkpoint restart) behave identically under it.
    */
  private def withRocksDB[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Assert the finished query really ran its stateful operators on
    * RocksDB (provider silently falling back would make withRocksDB a
    * placebo): RocksDB surfaces rocksdb* custom metrics in progress.
    */
  private def assertRocksDbEngaged(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val progress = q.recentProgress
    assert(progress.nonEmpty, "no progress recorded")
    val metrics = progress.flatMap(_.stateOperators)
      .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
    assert(metrics.exists(_.startsWith("rocksdb")),
      s"state operators ran without RocksDB metrics: ${metrics.distinct.mkString(",")}")
  }

  private def curveBatch(idxFrom: Int, idxTo: Int) =
    (idxFrom until idxTo).flatMap { idx =>
      (1 to 3).map(q => (idx, (idx % 3).toDouble, q, (idx + q).toDouble, 1.0))
    }.toDF("image_idx", "delay", "q_bin", "i", "err")

  test("incremental delay average equals the batch aggregation") {
    val inDir = Files.createTempDirectory("stream-in").toString
    curveBatch(0, 4).write.mode("append").parquet(inDir)

    val q = Online.incrementalDelayAverage(spark, inDir,
      curveBatch(0, 1), "t_inc_avg")
    try {
      q.processAllAvailable()
      // second file arrives
      curveBatch(4, 8).write.mode("append").parquet(inDir)
      q.processAllAvailable()

      val streamed = spark.table("t_inc_avg")
        .select("delay", "q_bin", "i_av", "n").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
      val batch = curveBatch(0, 8)
        .groupBy($"delay", $"q_bin")
        .agg(avg($"i").as("i_av"), count(lit(1)).as("n")).collect()
        .map(r => (r.getDouble(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamingAzav integrates frames as they arrive") {
    val frames = Files.createTempDirectory("sa-frames").toString
    val store = Files.createTempDirectory("sa-store").toString
    val curves = s"$store/curves.parquet"
    def frame(name: String, level: Double): Unit =
      Files.write(java.nio.file.Paths.get(frames, name),
        graft.sources.ImageSource.encodeEdf(16, 16, Array.fill(256)(level)))
    frame("f0.edf", 50.0)

    val g = graft.functions.ScatteringFunctions.Poni(
      dist = 0.1, poni1 = 0.008, poni2 = 0.008,
      pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
    val cfg = graft.pipeline.Pipeline.AzavConfig(g,
      graft.operators.Azav.QGrid(0.0, 3.0, 10))
    val q = graft.streaming.Online.streamingAzav(spark, frames, store, cfg,
      pollSeconds = 1)
    try {
      q.processAllAvailable()
      val ids1 = spark.read.parquet(curves).select("image_id")
        .distinct().as[String].collect().toSet
      assert(ids1 == Set("f0.edf"))
      frame("f1.edf", 80.0)
      q.processAllAvailable()
      val after = spark.read.parquet(curves)
      assert(after.select("image_id").distinct().count() == 2)
      after.filter($"image_id" === "f1.edf").select("i").as[Double]
        .collect().foreach(v => assert(approx(v, 80.0, 1e-9)))
    } finally q.stop()
  }

  test("streamingBundleIngest decodes trx bundles as the beamline drops " +
       "them, appends complete curve tables per run, and a restart " +
       "never re-ingests") {
    import graft.sources.{Bundle, Hdf5Writer}
    val drop = Files.createTempDirectory("sb-drop").toString
    val store = Files.createTempDirectory("sb-store").toString
    val curves = s"$store/curves.parquet"
    val nQ = 3
    def bundle(run: Int): Unit = {
      val nImg = 2 + run
      val delays = Array.tabulate(nImg)(r => r * 1e-9)
      val data = Array.tabulate(nImg * nQ)(i => run * 10.0 + i)
      Hdf5Writer.write(s"$drop/run$run.h5", Hdf5Writer.Node(datasets = Seq(
        "data" -> Hdf5Writer.Doubles(Seq(nImg, nQ), data),
        "delays" -> Hdf5Writer.Doubles(Seq(nImg), delays))))
    }
    bundle(0)
    val curveCols =
      Seq("file", "image_idx", "delay", "q_bin", "i", "err")
    def curveSet() = spark.read.parquet(curves)
      .select(curveCols.map(col): _*)
      .collect().map(_.toSeq).toSet
    val q = graft.streaming.Online.streamingBundleIngest(
      spark, drop, store, pollSeconds = 1)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(curves).count() == 2 * nQ)
      bundle(1)
      q.processAllAvailable()
      assert(spark.read.parquet(curves).count() == (2 + 3) * nQ)
      // streamed union == the batch dir ingest of the same folder
      // (modulo the batch partition column the replay-idempotent
      // batch-keyed overwrite layout adds)
      val batch = Bundle.azavFromHdf5Dir(spark, s"$drop/*.h5")
      assert(curveSet() == batch.collect().map(_.toSeq).toSet,
        "streamed curves must equal the batch directory ingest")
    } finally q.stop()
    // restart on the same checkpoint: nothing re-ingests
    val q2 = graft.streaming.Online.streamingBundleIngest(
      spark, drop, store, pollSeconds = 1)
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(curves).count() == (2 + 3) * nQ,
        "checkpoint restart must not duplicate curves")
      bundle(2)
      q2.processAllAvailable()
      assert(spark.read.parquet(curves).count() == (2 + 3 + 4) * nQ)
    } finally q2.stop()
  }

  test("checkpoint restart resumes without reprocessing old frames") {
    val frames = Files.createTempDirectory("cr-frames").toString
    val store = Files.createTempDirectory("cr-store").toString
    val curves = s"$store/curves.parquet"
    def frame(name: String, level: Double): Unit =
      Files.write(java.nio.file.Paths.get(frames, name),
        graft.sources.ImageSource.encodeEdf(8, 8, Array.fill(64)(level)))
    val g = graft.functions.ScatteringFunctions.Poni(
      dist = 0.1, poni1 = 0.004, poni2 = 0.004,
      pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
    val cfg = graft.pipeline.Pipeline.AzavConfig(g,
      graft.operators.Azav.QGrid(0.0, 3.0, 5))

    frame("f0.edf", 10.0)
    val q1 = graft.streaming.Online.streamingAzav(spark, frames, store, cfg)
    try { q1.processAllAvailable() } finally q1.stop()
    val n1 = spark.read.parquet(curves).count()

    // restart from the same checkpoint; add one new frame
    frame("f1.edf", 20.0)
    val q2 = graft.streaming.Online.streamingAzav(spark, frames, store, cfg)
    try { q2.processAllAvailable() } finally q2.stop()
    val after = spark.read.parquet(curves)
    // f0 appears exactly once (not reprocessed), f1 appended
    assert(after.filter($"image_id" === "f0.edf").count() == n1)
    assert(after.select("image_id").distinct().count() == 2)
  }

  test("T2: config change drops streaming checkpoint + curves, reintegrates") {
    val frames = Files.createTempDirectory("t2-frames").toString
    val store = Files.createTempDirectory("t2-store").toString
    val curves = s"$store/curves.parquet"
    def frame(name: String, level: Double): Unit =
      Files.write(java.nio.file.Paths.get(frames, name),
        graft.sources.ImageSource.encodeEdf(8, 8, Array.fill(64)(level)))
    val g = graft.functions.ScatteringFunctions.Poni(
      dist = 0.1, poni1 = 0.004, poni2 = 0.004,
      pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
    // this 8×8 detector only reaches q ≈ 0.36 — grids must resolve that
    val cfg5 = graft.pipeline.Pipeline.AzavConfig(g,
      graft.operators.Azav.QGrid(0.0, 0.4, 5))

    frame("f0.edf", 10.0)
    val q1 = graft.streaming.Online.streamingAzav(spark, frames, store, cfg5)
    try { q1.processAllAvailable() } finally q1.stop()
    val binsBefore = spark.read.parquet(curves)
      .select("q_bin").distinct().count()

    // nQ changes → manifest mismatch → old checkpoint AND curves dropped,
    // the stream reintegrates f0 on the new grid (old rows would otherwise
    // silently keep the stale geometry)
    val cfg10 = cfg5.copy(grid = graft.operators.Azav.QGrid(0.0, 0.4, 10))
    val q2 = graft.streaming.Online.streamingAzav(spark, frames, store, cfg10)
    try { q2.processAllAvailable() } finally q2.stop()
    val after = spark.read.parquet(curves)
    assert(after.select("image_id").distinct().count() == 1)
    // every row is on the new (finer) grid, exactly once — no stale rows
    assert(after.count() == after.select("q_bin").distinct().count())
    assert(after.select("q_bin").distinct().count() > binsBefore)
    assert(graft.sources.Bundle.isValid(store, cfg10.manifest))
  }

  test("incremental reduction equals the batch result at every step with " +
       "per-batch work bounded by tail + batch, not history") {
    val stateDir = Files.createTempDirectory("inc-red").toString
    val cuts = Seq((0, 20), (20, 40), (40, 60))
    var last: graft.streaming.IncrementalReduction.BatchResult = null
    cuts.zipWithIndex.foreach { case ((a, b), k) =>
      last = graft.streaming.IncrementalReduction.processBatch(
        spark, curveBatch(a, b), stateDir)
      assert(last.fullRecompute == (k == 0), s"batch $k")
      val got = last.reduced
        .select("delay", "q_bin", "diff_av", "noise", "n_rep", "err").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
      val want = graft.operators.Reduction.timeResolvedSignal(curveBatch(0, b))
        .select("delay", "q_bin", "diff_av", "noise", "n_rep", "err").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
      assert(got.keySet == want.keySet, s"batch $k groups")
      want.foreach { case (key, (av, no, n, er)) =>
        val (gav, gno, gn, ger) = got(key)
        assert(approx(gav, av, 1e-9) && approx(gno, no, 1e-9) &&
          gn == n && approx(ger, er, 1e-9), s"batch $k group $key")
      }
      // median-mode twin: the incremental t-digest median equals the exact
      // full-history median at every step (groups here are far below the
      // sketch compression, so the digest is exact — see TDigestSketch)
      val gotMed = spark.read.parquet(s"$stateDir/reduced_median")
        .select("delay", "q_bin", "diff_med").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val wantMed = graft.operators.Reduction.timeResolvedSignal(
          curveBatch(0, b), useMedian = true)
        .select("delay", "q_bin", "diff_av").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(gotMed.keySet == wantMed.keySet, s"batch $k median groups")
      wantMed.foreach { case (key, v) =>
        assert(approx(gotMed(key), v, 1e-9), s"batch $k median group $key") }
    }
    // churn contract: the recompute window is the raw tail (bounded by the
    // inter-reference spacing, here ≤ 2 spacings × 3 bins) plus the new
    // batch — NOT the 60-image history
    val batchRows = 20 * 3
    assert(last.windowRows <= batchRows + 6 * 3,
      s"window ${last.windowRows} rows — re-reducing history?")
    assert(last.pendingRows <= 6 * 3, s"tail ${last.pendingRows} unbounded")

    // out-of-order arrival below the frontier: falls back to a full
    // recompute and still matches batch over the union
    val late = graft.streaming.IncrementalReduction.processBatch(
      spark, curveBatch(60, 61).withColumn("image_idx", lit(5) + col("image_idx") * 0),
      stateDir)
    assert(late.fullRecompute)
  }

  test("curve-history compaction: directory count bounded across triggers, " +
       "incremental outputs untouched, and a post-compaction fallback " +
       "recomputes identically to the uncompacted twin") {
    import graft.streaming.IncrementalReduction
    val sA = Files.createTempDirectory("inc-cpA").toString // compacted
    val sB = Files.createTempDirectory("inc-cpB").toString // twin, never
    val nB = 12
    (0 until nB).foreach { k =>
      val b = curveBatch(k * 5, (k + 1) * 5)
      val rA = IncrementalReduction.processBatch(spark, b, sA,
        batchKey = Some(k.toLong))
      IncrementalReduction.processBatch(spark, b, sB,
        batchKey = Some(k.toLong))
      assert(rA.fullRecompute == (k == 0),
        s"batch $k must stay incremental through compactions")
      if (k > 0 && k % 4 == 0)
        IncrementalReduction.compact(spark, sA, keepBatches = 2)
    }
    def snap(s: String, table: String, cols: Seq[String]) =
      spark.read.parquet(s"$s/$table").select(cols.map(col): _*)
        .collect().map(r => (r.getDouble(0), r.getInt(1)) ->
          cols.drop(2).indices.map(i => r.getDouble(2 + i))).toMap
    Seq(("reduced", Seq("delay", "q_bin", "diff_av", "noise", "err")),
        ("reduced_median", Seq("delay", "q_bin", "diff_med"))).foreach {
      case (t, cs) =>
        val a = snap(sA, t, cs); val b = snap(sB, t, cs)
        assert(a.keySet == b.keySet, s"$t groups diverged")
        b.foreach { case (k, vs) => vs.indices.foreach(i =>
          assert(approx(a(k)(i), vs(i), 1e-9), s"$t $k col $i")) }
    }
    // directory count: live batch dirs bounded by compact cadence + keep,
    // segments bounded by the geometric (binary-counter) discipline
    val (fs, cv) = graft.sources.Bundle.fsPath(s"$sA/curves")
    val liveA = fs.listStatus(cv).count(_.getPath.getName.startsWith("batch="))
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$sA/curves_base"))
      .map(_.getPath.getName).filter(_.startsWith("seg="))
    assert(liveA <= 2 + 4, s"live dirs $liveA — compaction not folding")
    assert(segs.length <= 3,
      s"segments ${segs.toSeq} — geometric merge not bounding the store")
    val (_, cvB) = graft.sources.Bundle.fsPath(s"$sB/curves")
    assert(fs.listStatus(cvB).count(_.getPath.getName.startsWith("batch=")) == nB)

    // forced fallback on BOTH stores (out-of-order index below the
    // frontier): the compacted history must recompute the exact same
    // reduction as the one-directory-per-batch twin
    def late() = curveBatch(200, 201)
      .withColumn("image_idx", lit(7) + col("image_idx") * 0)
    val fA = IncrementalReduction.processBatch(spark, late(), sA,
      batchKey = Some(nB.toLong))
    val fB = IncrementalReduction.processBatch(spark, late(), sB,
      batchKey = Some(nB.toLong))
    assert(fA.fullRecompute && fB.fullRecompute)
    val a2 = snap(sA, "reduced", Seq("delay", "q_bin", "diff_av", "err"))
    val b2 = snap(sB, "reduced", Seq("delay", "q_bin", "diff_av", "err"))
    assert(a2.keySet == b2.keySet, "fallback over compacted history diverged")
    b2.foreach { case (k, vs) => vs.indices.foreach(i =>
      assert(approx(a2(k)(i), vs(i), 1e-9), s"fallback $k col $i")) }
  }

  test("curve-history compaction heals every torn-crash shape and a " +
       "replay of a folded batch never double-counts") {
    import graft.streaming.IncrementalReduction
    val sA = Files.createTempDirectory("inc-czA").toString
    val sB = Files.createTempDirectory("inc-czB").toString
    (0 until 8).foreach { k =>
      val b = curveBatch(k * 5, (k + 1) * 5)
      IncrementalReduction.processBatch(spark, b, sA, batchKey = Some(k.toLong))
      IncrementalReduction.processBatch(spark, b, sB, batchKey = Some(k.toLong))
    }
    IncrementalReduction.compact(spark, sA, keepBatches = 2) // folds 0..5
    val (fs, base) = graft.sources.Bundle.fsPath(s"$sA/curves_base")
    val seg = fs.listStatus(base).map(_.getPath)
      .filter(_.getName.startsWith("seg=")).head
    // crash shape 1: replay of a FOLDED batch rewrote its partition
    curveBatch(15, 20).write.mode("overwrite").parquet(s"$sA/curves/batch=3")
    // crash shape 2: a segment write that never committed (stale .tmp)
    spark.read.parquet(seg.toString).write
      .parquet(s"$sA/curves_base/.tmp-6-9")
    // crash shape 3: a completed merge whose contained input survived
    // its delete — readers must drop the contained range entirely
    spark.read.parquet(seg.toString).write
      .parquet(s"$sA/curves_base/seg=0-2")
    // fallback over the torn store ≡ fallback over the clean twin
    def late() = curveBatch(200, 201)
      .withColumn("image_idx", lit(7) + col("image_idx") * 0)
    val fA = IncrementalReduction.processBatch(spark, late(), sA,
      batchKey = Some(8L))
    val fB = IncrementalReduction.processBatch(spark, late(), sB,
      batchKey = Some(8L))
    assert(fA.fullRecompute && fB.fullRecompute)
    def snap(s: String) = spark.read.parquet(s"$s/reduced")
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val a = snap(sA); val b = snap(sB)
    assert(a.keySet == b.keySet)
    b.foreach { case (k, (av, n)) =>
      assert(approx(a(k)._1, av, 1e-9) && a(k)._2 == n,
        s"torn store double-counted at $k") }
    // the next compact heals all three shapes
    IncrementalReduction.compact(spark, sA, keepBatches = 2)
    val names = fs.listStatus(base).map(_.getPath.getName).toSet
    assert(!names.exists(_.startsWith(".tmp-")), "stale tmp must be removed")
    assert(!names.contains("seg=0-2"), "contained segment must be removed")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$sA/curves/batch=3")),
      "resurrected folded batch dir must be removed")
  }

  test("curve-history compaction under a RANDOM fold/crash/replay storm: " +
       "any interleaving of compactions, torn shapes, and garbage " +
       "resurrections of folded state reduces identically to the " +
       "untouched twin, and the segment store stays bounded") {
    import graft.streaming.IncrementalReduction
    val rnd = new scala.util.Random(20260817L)
    def garbage() = curveBatch(900, 901) // rows that must stay INVISIBLE
    (0 until 3).foreach { trial =>
      val sA = Files.createTempDirectory(s"inc-storm$trial-A").toString
      val sB = Files.createTempDirectory(s"inc-storm$trial-B").toString
      val (fs, base) = graft.sources.Bundle.fsPath(s"$sA/curves_base")
      def segs() =
        if (!fs.exists(base)) Seq.empty
        else fs.listStatus(base).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("seg="))
      def segRange(p: org.apache.hadoop.fs.Path): (Long, Long) = {
        val Array(lo, hi) = p.getName.stripPrefix("seg=").split("-")
        (lo.toLong, hi.toLong)
      }
      val n = 8 + rnd.nextInt(4)
      (0 until n).foreach { k =>
        val b = curveBatch(k * 4, (k + 1) * 4)
        IncrementalReduction.processBatch(spark, b, sA,
          withMetrics = false, batchKey = Some(k.toLong))
        IncrementalReduction.processBatch(spark, b, sB,
          withMetrics = false, batchKey = Some(k.toLong))
        if (rnd.nextInt(3) == 0)
          IncrementalReduction.compact(spark, sA,
            keepBatches = 1 + rnd.nextInt(3))
        if (rnd.nextInt(3) == 0) rnd.nextInt(3) match {
          case 0 => // crash before a segment commit: stale garbage tmp
            garbage().write.mode("overwrite")
              .parquet(s"$sA/curves_base/.tmp-0-999")
          case 1 => // crash after a merge commit: contained input survives
            segs().map(segRange).filter(r => r._1 < r._2).headOption
              .foreach { case (lo, _) =>
                garbage().write.mode("overwrite")
                  .parquet(s"$sA/curves_base/seg=$lo-$lo") }
          case _ => // at-least-once replay resurrects a FOLDED batch dir
            val folded = segs().map(segRange).map(_._2).maxOption
            folded.filter(_ >= 0).foreach { f =>
              val k2 = rnd.nextInt(f.toInt + 1)
              garbage().write.mode("overwrite")
                .parquet(s"$sA/curves/batch=$k2") }
        }
      }
      // forced fallback on both stores: the stormed history must reduce
      // exactly like the one-directory-per-batch twin
      def late() = curveBatch(200, 201)
        .withColumn("image_idx", lit(3) + col("image_idx") * 0)
      val fA = IncrementalReduction.processBatch(spark, late(), sA,
        withMetrics = false, batchKey = Some(n.toLong))
      val fB = IncrementalReduction.processBatch(spark, late(), sB,
        withMetrics = false, batchKey = Some(n.toLong))
      assert(fA.fullRecompute && fB.fullRecompute, s"trial $trial")
      Seq(("reduced", Seq("delay", "q_bin", "diff_av", "noise")),
          ("reduced_median", Seq("delay", "q_bin", "diff_med"))).foreach {
        case (t, cs) =>
          def snap(s: String) = spark.read.parquet(s"$s/$t")
            .select(cs.map(col): _*).collect()
            .map(r => (r.getDouble(0), r.getInt(1)) ->
              cs.drop(2).indices.map(i => r.getDouble(2 + i))).toMap
          val a = snap(sA); val b = snap(sB)
          assert(a.keySet == b.keySet,
            s"trial $trial $t groups diverged under the storm")
          b.foreach { case (k, vs) => vs.indices.foreach(i =>
            assert(approx(a(k)(i), vs(i), 1e-9),
              s"trial $trial $t $k col $i: ${a(k)(i)} vs ${vs(i)}")) }
      }
      assert(segs().size <= 6,
        s"trial $trial: ${segs().size} segments — geometric merge broken")
    }
  }

  test("a replay after a crash between the state swaps and the manifest " +
       "write routes through the full recompute instead of double-counting") {
    import graft.streaming.IncrementalReduction
    val stateDir = Files.createTempDirectory("inc-torn").toString
    val frontier = s"$stateDir/frontier"
    IncrementalReduction.processBatch(spark, curveBatch(0, 20), stateDir,
      batchKey = Some(1L))
    val manifestAfter1 = graft.sources.Bundle.readManifest(frontier).get
    IncrementalReduction.processBatch(spark, curveBatch(20, 40), stateDir,
      batchKey = Some(2L))
    // crash simulation: batch 2's swap wave completed (state/tail/curves
    // all carry its rows) but the manifest write did not — restore the
    // post-batch-1 manifest; the intent marker still says batch 2
    graft.sources.Bundle.writeManifest(frontier, manifestAfter1)
    // at-least-once replay of batch 2: the stale manifest's maxIdx (19)
    // would pass the strict-append check and re-merge rows already folded
    // into state.parquet — the unmatched intent must force the fallback
    val replay = IncrementalReduction.processBatch(spark, curveBatch(20, 40),
      stateDir, batchKey = Some(2L))
    assert(replay.fullRecompute,
      "a torn commit's replay must not take the incremental path")
    val got = replay.reduced
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val want = graft.operators.Reduction.timeResolvedSignal(curveBatch(0, 40))
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (av, n)) =>
      assert(approx(got(k)._1, av, 1e-9) && got(k)._2 == n, s"group $k") }
    // the healed commit re-arms the incremental path
    val next = IncrementalReduction.processBatch(spark, curveBatch(40, 60),
      stateDir, batchKey = Some(3L))
    assert(!next.fullRecompute, "the fallback must heal, not stick")
  }

  test("incremental median surfaces its exact regime per group: the flag " +
       "flips when kept count reaches 2·tdCompression while mean-mode " +
       "output and in-regime medians stay exact") {
    import graft.streaming.IncrementalReduction
    val stateDir = Files.createTempDirectory("inc-exact").toString
    // tdCompression=10 → compress starts pairing at total weight ≥ 20.
    // 60 images → 20 rows per (delay, q_bin) group; the delay=0 groups
    // are references (W2-thinned to 10 kept) and stay in-regime, the
    // delay=1/2 groups keep all 20 and cross the line on batch 2.
    Seq((0, 30), (30, 60)).zipWithIndex.foreach { case ((a, b), k) =>
      IncrementalReduction.processBatch(spark, curveBatch(a, b), stateDir,
        withMetrics = false, batchKey = Some(k.toLong), tdCompression = 10)
      if (k == 0) {
        val all = spark.read.parquet(s"$stateDir/reduced_median")
          .select("exact").collect().map(_.getBoolean(0))
        assert(all.nonEmpty && all.forall(identity),
          "below the regime every group must report exact=true")
      }
    }
    val med = spark.read.parquet(s"$stateDir/reduced_median")
      .select("delay", "q_bin", "diff_med", "n_rep", "exact").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3), r.getBoolean(4))).toMap
    med.foreach { case ((d, q), (_, n, ex)) =>
      if (d == 0.0) assert(n == 10 && ex,
        s"thinned ref group ($d,$q) n=$n must stay exact")
      else assert(n == 20 && !ex,
        s"group ($d,$q) n=$n crossed 2·compression — flag must flip")
    }
    // in-regime groups' median is still the sorted-history median, and
    // the mean-mode output is untouched by the telemetry column
    val want = graft.operators.Reduction
      .timeResolvedSignal(curveBatch(0, 60), useMedian = true)
      .select("delay", "q_bin", "diff_av").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
    med.filter(_._2._3).foreach { case (k, (m, _, _)) =>
      assert(approx(m, want(k), 1e-9), s"exact-regime median diverged at $k") }
    val gotMean = spark.read.parquet(s"$stateDir/reduced")
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val wantMean = graft.operators.Reduction
      .timeResolvedSignal(curveBatch(0, 60))
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(gotMean.keySet == wantMean.keySet)
    wantMean.foreach { case (k, (av, n)) =>
      assert(approx(gotMean(k)._1, av, 1e-9) && gotMean(k)._2 == n,
        s"mean-mode output changed at $k") }
  }

  test("foreachBatch full re-reduction converges to the batch result") {
    val inDir = Files.createTempDirectory("s2-in").toString
    val ckDir = Files.createTempDirectory("s2-ck").toString
    val outDir = Files.createTempDirectory("s2-out").toString
    curveBatch(0, 6).write.mode("append").parquet(inDir)

    val q = Online.curveFolderReduction(spark, inDir, ckDir, outDir,
      pollSeconds = 1, schemaSource = curveBatch(0, 1))
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$outDir/reduced")
        .select("delay", "q_bin", "diff_av").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val batch = graft.operators.Reduction.timeResolvedSignal(curveBatch(0, 6))
        .select("delay", "q_bin", "diff_av").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (k, v) => assert(approx(streamed(k), v, 1e-9), s"$k") }
    } finally q.stop()
  }

  test("incremental streaming sink with in-line auto-compaction: the " +
       "real foreachBatch loop folds its own history, stays incremental, " +
       "and converges to the batch result") {
    import graft.streaming.IncrementalReduction
    val inDir = Files.createTempDirectory("s3-in").toString
    val ckDir = Files.createTempDirectory("s3-ck").toString
    val stateDir = Files.createTempDirectory("s3-state").toString
    curveBatch(0, 5).coalesce(1).write.mode("append").parquet(inDir)
    val q = IncrementalReduction.incrementalCurveFolderReduction(spark,
      inDir, ckDir, stateDir, pollSeconds = 1,
      schemaSource = curveBatch(0, 1),
      autoCompactEvery = 2, keepBatches = 1)
    try {
      q.processAllAvailable()
      (1 until 7).foreach { k =>
        curveBatch(k * 5, (k + 1) * 5).coalesce(1)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      // the loop compacted its own history: bounded live dirs + segments
      val (fs, cv) = graft.sources.Bundle.fsPath(s"$stateDir/curves")
      val live = fs.listStatus(cv)
        .count(_.getPath.getName.startsWith("batch="))
      assert(live <= 1 + 2, s"live batch dirs $live — sink never compacted")
      val (_, base) = graft.sources.Bundle.fsPath(s"$stateDir/curves_base")
      assert(fs.exists(base) && fs.listStatus(base)
        .exists(_.getPath.getName.startsWith("seg=")),
        "no committed segments under curves_base")
      val streamed = spark.read.parquet(s"$stateDir/reduced")
        .select("delay", "q_bin", "diff_av", "n_rep").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) ->
          (r.getDouble(2), r.getLong(3))).toMap
      val batch = graft.operators.Reduction
        .timeResolvedSignal(curveBatch(0, 35))
        .select("delay", "q_bin", "diff_av", "n_rep").collect()
        .map(r => (r.getDouble(0), r.getInt(1)) ->
          (r.getDouble(2), r.getLong(3))).toMap
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (k, (av, n)) =>
        assert(approx(streamed(k)._1, av, 1e-9) && streamed(k)._2 == n,
          s"group $k") }
    } finally q.stop()
  }

  test("streaming minhash near-dup flags the batch blocker's pair set " +
       "across micro-batches, surviving a checkpoint restart " +
       "(RocksDB state store)") { withRocksDB {
    val inDir = Files.createTempDirectory("sminhash-in").toString
    val ckDir = Files.createTempDirectory("sminhash-ck").toString
    // 24 tokens — one token changed leaves trigram Jaccard ≈ 19/25 = 0.76,
    // comfortably above the 0.6 threshold (an 11-token doc would sit at
    // ~0.5 and flag nothing)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      1L -> base,
      5L -> base.replace("mu", "muon"), // near-dup of 1
      2L -> "completely unrelated text about spark partitions and shuffles",
      // batch 2
      9L -> base, // exact copy of 1 (cross-batch), near 5
      4L -> "another unrelated document mentioning catalyst and codegen",
      // batch 3 (after restart)
      12L -> base.replace("sigma", "sigmaprime"), // near-dup of 1/9, maybe 5
      7L -> "final unrelated row with totally different vocabulary here")
    def writeBatch(ids: Seq[Long]): Unit =
      docs.filter(p => ids.contains(p._1)).toDF("doc_id", "text")
        .write.mode("append").parquet(inDir)

    val outDir = Files.createTempDirectory("sminhash-out").toString
    // file sink (memory sink cannot recover from a checkpoint)
    def startStream() = graft.streaming.StreamingDedup.minhashPairsStream(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(inDir),
        nHashes = 32, nBands = 16, threshold = 0.6)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append").start()

    def rows(): Array[(Long, Long, Double)] = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("est_jaccard")))

    writeBatch(Seq(1L, 5L, 2L))
    val q1 = startStream()
    val n1 = try {
      q1.processAllAvailable()
      writeBatch(Seq(9L, 4L))
      q1.processAllAvailable()
      assertRocksDbEngaged(q1)
      rows().length
    } finally q1.stop()

    // restart from the checkpoint; batch 3 arrives after the restart —
    // the band-keyed (id, sig) state must survive, and batches 1-2 must
    // not reprocess: every post-restart row flags the one new document
    writeBatch(Seq(12L, 7L))
    val q2 = startStream()
    val all = try { q2.processAllAvailable(); rows() } finally q2.stop()
    val newRows = all.length - n1
    assert(newRows > 0, "batch 3's near-dups never emitted")
    assert(all.length >= n1, "file sink lost rows across restart")

    val streamed = all.map(t => (t._1, t._2)).toSet
    val batchPairs = graft.operators.Dedup.minhashLshPairs(
        docs.toDF("doc_id", "text"), nHashes = 32, nBands = 16,
        threshold = 0.6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(batchPairs.nonEmpty, "fixture planted no near-dup pairs")
    assert(batchPairs.contains((1L, 9L)), "exact copy pair missing from batch")
    assert(streamed == batchPairs.keySet,
      s"stream pairs $streamed != batch pairs ${batchPairs.keySet}")
    // per-pair estimates agree with the batch blocker's exactly
    all.foreach { case (a, b, est) => assert(est == batchPairs((a, b)), s"($a,$b)") }
    // only the new doc can be the flagged (larger) side after the restart:
    // old pairs re-emitting would mean state or source progress was lost
    assert(all.map(t => (t._1, t._2)).drop(n1).forall(_._2 == 12L) ||
      all.count { case (_, b, _) => b != 12L } == n1,
      "restart reprocessed earlier batches")
  }}

  test("streaming simhash near-dup flags the batch pair set across " +
       "micro-batches and a checkpoint restart (RocksDB state store)") {
    withRocksDB {
    val inDir = Files.createTempDirectory("ssim-in").toString
    val ckDir = Files.createTempDirectory("ssim-ck").toString
    val outDir = Files.createTempDirectory("ssim-out").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      1L -> base,
      2L -> "completely unrelated text about spark partitions and shuffles",
      5L -> base.replace("mu", "muon"),
      // after restart
      9L -> base, // exact copy: hamming 0
      7L -> "final unrelated row with totally different vocabulary here")
    def writeBatch(ids: Seq[Long]): Unit =
      docs.filter(p => ids.contains(p._1)).toDF("doc_id", "text")
        .write.mode("append").parquet(inDir)

    def startStream() = graft.streaming.StreamingDedup.simhashPairsStream(
        spark.readStream.schema("doc_id LONG, text STRING").parquet(inDir),
        nBands = 16, maxHamming = 10)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append").start()

    writeBatch(Seq(1L, 2L))
    val q1 = startStream()
    try {
      q1.processAllAvailable()
      writeBatch(Seq(5L))
      q1.processAllAvailable()
    } finally q1.stop()
    writeBatch(Seq(9L, 7L))
    val q2 = startStream()
    try {
      q2.processAllAvailable()
      assertRocksDbEngaged(q2)
    } finally q2.stop()

    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("hamming")).toMap
    val batch = graft.operators.Dedup.simhashPairs(
        docs.toDF("doc_id", "text"), nBands = 16, maxHamming = 10).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Int]("hamming")).toMap
    assert(batch.contains((1L, 9L)) && batch((1L, 9L)) == 0,
      "exact copy must pair at hamming 0")
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }}

  test("streaming embedding near-dup equals the batch blocker, cosines " +
       "bit-identical, across a checkpoint restart (RocksDB state store)") {
    withRocksDB {
    val inDir = Files.createTempDirectory("semb-in").toString
    val ckDir = Files.createTempDirectory("semb-ck").toString
    val outDir = Files.createTempDirectory("semb-out").toString
    val vecs = Seq(
      1L -> Seq(1.0, 0.02, 0.0, 0.01, 0.0, 0.0, 0.03, 0.0),
      2L -> Seq(0.0, 1.0, 0.0, 0.0, 0.9, 0.0, 0.0, 0.1),
      4L -> Seq(0.99, 0.03, 0.01, 0.01, 0.0, 0.0, 0.02, 0.0), // near 1
      // after restart
      9L -> Seq(1.0, 0.02, 0.0, 0.01, 0.0, 0.0, 0.03, 0.0),   // copy of 1
      7L -> Seq(-1.0, 0.0, 0.5, 0.0, 0.0, 0.8, 0.0, 0.0))
    def writeBatch(ids: Seq[Long]): Unit =
      vecs.filter(p => ids.contains(p._1)).toDF("vec_id", "embedding")
        .write.mode("append").parquet(inDir)

    def startStream() = graft.streaming.StreamingDedup.embeddingPairsStream(
        spark.readStream
          .schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(inDir),
        dim = 8, nBits = 4, threshold = 0.9)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append").start()

    writeBatch(Seq(1L, 2L))
    val q1 = startStream()
    try {
      q1.processAllAvailable()
      writeBatch(Seq(4L))
      q1.processAllAvailable()
    } finally q1.stop()
    writeBatch(Seq(9L, 7L))
    val q2 = startStream()
    try {
      q2.processAllAvailable()
      assertRocksDbEngaged(q2)
    } finally q2.stop()

    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    val batch = graft.operators.Dedup.embeddingNearDupPairs(
        vecs.toDF("vec_id", "embedding"), dim = 8, nBits = 4,
        threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    assert(batch.keySet == Set((1L, 4L), (1L, 9L), (4L, 9L)),
      s"fixture drifted: ${batch.keySet}")
    assert(streamed.keySet == batch.keySet,
      s"stream ${streamed.keySet} != batch ${batch.keySet}")
    // the driver-side fold must reproduce the Column expression exactly
    streamed.foreach { case (p, c) => assert(c == batch(p), s"$p cosine") }
  }}

  test("PQ-compressed embedding near-dup stream: recall >= 0.95 vs the " +
       "exact variant with measurably smaller state") {
    // real 64-dim background corpus (pairwise cosines bounded by ~0.5)
    // plus PLANTED near-duplicates (cos ≈ 1) — the bimodal shape dedup
    // actually runs on, with the threshold in the gap. All planted pairs
    // arrive CROSS-batch, so the PQ reconstruction path decides every one
    // of them; a threshold inside the background continuum instead
    // measures quantization noise on non-duplicates (m=8, k=16 at
    // threshold 0.3 scored ~0.64 recall here for exactly that reason).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding"))
          .as("embedding"))
    // near-copies: scale (cosine-invariant) + small shift → cos ≈ 0.99
    val clones = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.02) + lit(0.01))
          .as("embedding"))
    // m=16 sub-spaces x 64 centroids: cosine-level verification needs
    // reconstruction fidelity, not just ranking fidelity (m=8, k=16
    // reconstructions sit at cos ~0.75 from their source — every true
    // pair missed); 16 ints per member is still ~8x less state than 64
    // doubles
    val codebooks = graft.operators.Similarity.trainPqCodebooks(emb,
      m = 16, k = 64, dim = 64, iters = 10)
    val threshold = 0.9
    val nBits = 4 // 16 expected buckets over 550 vectors: payload-dominated state

    def run(pq: Boolean): (Set[(Long, Long)], Long) = {
      val inDir = Files.createTempDirectory(s"sembpq-in-$pq").toString
      val ckDir = Files.createTempDirectory(s"sembpq-ck-$pq").toString
      emb.write.mode("append").parquet(inDir)
      val src = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(inDir)
      val ds =
        if (pq) graft.streaming.StreamingDedup.embeddingPairsStreamPq(
          src, codebooks, dim = 64, nBits = nBits, threshold = threshold)
        else graft.streaming.StreamingDedup.embeddingPairsStream(
          src, dim = 64, nBits = nBits, threshold = threshold)
      val name = s"t_sembpq_$pq"
      val q = ds.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckDir).outputMode("append").start()
      try {
        q.processAllAvailable()
        clones.write.mode("append").parquet(inDir)
        q.processAllAvailable()
        val pairs = spark.table(name).collect()
          .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
        val stateBytes = q.lastProgress.stateOperators
          .map(_.memoryUsedBytes).sum
        (pairs, stateBytes)
      } finally q.stop()
    }

    val (exactPairs, exactBytes) = run(pq = false)
    val (pqPairs, pqBytes) = run(pq = true)
    assert(exactPairs.nonEmpty, "fixture produced no near-dup pairs")
    val recall = (pqPairs & exactPairs).size.toDouble / exactPairs.size
    val precision = (pqPairs & exactPairs).size.toDouble / pqPairs.size
    info(f"PQ state recall = $recall%.3f, precision = $precision%.3f over " +
      f"${exactPairs.size} pairs; state $exactBytes%d -> $pqBytes%d bytes")
    assert(recall >= 0.95, f"PQ recall $recall%.3f below 0.95")
    assert(precision >= 0.8,
      f"margin turned the PQ filter mushy: precision $precision%.3f")
    // the compressed state must actually be smaller — 8 ints vs 64
    // doubles per member, visible through per-key overhead
    assert(pqBytes < exactBytes,
      s"PQ state ($pqBytes B) not smaller than raw state ($exactBytes B)")
    assert(pqBytes < exactBytes * 3 / 4,
      s"PQ state cut too small: $pqBytes vs $exactBytes")
  }

  test("streaming corpus recipe: jsonl -> dedup -> quality -> parquet " +
       "equals the batch twin across 3 triggers with a checkpoint restart " +
       "(RocksDB state store)") { withRocksDB {
    val inDir = Files.createTempDirectory("screcipe-in").toString
    val ckDir = Files.createTempDirectory("screcipe-ck").toString
    val outDir = Files.createTempDirectory("screcipe-out").toString + "/shards"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING")
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text"}"""
    val goodA = "the alpha survey continues here today.\\n" +
      "javascript boilerplate line gets dropped.\\n" +
      "the last line of the alpha survey also stays."
    val goodB = "the beta report opens with findings and numbers.\\n" +
      "lorem ipsum filler is removed entirely.\\n" +
      "the beta conclusion line closes the report."
    val goodC = "the gamma memo states the final outcome clearly.\\n" +
      "short line.\\nthe gamma appendix line ends the memo."
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(inDir, name),
        lines.mkString("\n").getBytes("UTF-8"))

    // trigger 1: two keepers (3 a within-batch dup of 1), a quality fail,
    // and a malformed line that must route, not crash
    writeFile("b1.jsonl", Seq(
      doc(1, goodA), doc(2, goodB), doc(3, goodA),
      doc(4, "too short here."),
      """{"doc_id":5,"text": BROKEN"""))
    val q1 = graft.streaming.StreamingCorpus.corpusRecipeStream(spark, inDir,
      schema, outDir, ckDir, minWords = 5, minStopHits = 1, minLineWords = 3)
    try {
      q1.processAllAvailable()
      // trigger 2 (same query): cross-batch dup of 1 + a new keeper
      writeFile("b2.jsonl", Seq(doc(6, goodA), doc(7, goodC)))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterTwo = spark.read.parquet(outDir).count()

    // restart from the checkpoint: dedup state and source progress resume
    writeFile("b3.jsonl", Seq(
      doc(8, goodB), // cross-restart dup - state must remember fp of 2
      doc(9, goodC.replace("gamma", "delta")),
      """not json at all"""))
    val q2 = graft.streaming.StreamingCorpus.corpusRecipeStream(spark, inDir,
      schema, outDir, ckDir, minWords = 5, minStopHits = 1, minLineWords = 3)
    try {
      q2.processAllAvailable()
      assertRocksDbEngaged(q2)
    } finally q2.stop()

    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text_clean"),
        r.getAs[Int]("n_tok_clean"), r.getAs[Int]("n_words"),
        r.getAs[Long]("stop_hits"))).sortBy(_._1).toSeq
    val streamed = key(spark.read.parquet(outDir))
    val batch = key(graft.streaming.StreamingCorpus.corpusRecipeBatch(
      spark, inDir, schema, minWords = 5, minStopHits = 1, minLineWords = 3))
    assert(batch.map(_._1) == Seq(1L, 2L, 7L, 9L),
      s"batch twin kept ${batch.map(_._1)} - fixture drifted")
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.size.toLong == afterTwo + 1,
      "restart duplicated or dropped output rows")
    // C4 line cleaning really fired: boilerplate middle lines are gone
    val cleanById = streamed.map(t => t._1 -> t._2).toMap
    assert(!cleanById(1L).contains("javascript"))
    assert(!cleanById(2L).contains("lorem ipsum"))
    assert(cleanById(1L).linesIterator.size == 2)
  }}

  test("watermarked tumbling windows: closed windows equal the batch " +
       "aggregation, late rows beyond the watermark are dropped") {
    val inDir = Files.createTempDirectory("wm-in").toString
    def ev(sec: Long, typ: String, v: Double) =
      (new java.sql.Timestamp(sec * 1000L), typ, v)
    def writeBatch(rows: Seq[(java.sql.Timestamp, String, Double)]): Unit =
      rows.toDF("ts", "event_type", "value")
        .write.mode("append").parquet(inDir)

    // hour-0 and hour-1 events
    writeBatch(Seq(ev(100, "click", 1.5), ev(200, "click", 2.0),
      ev(300, "view", 1.0), ev(3700, "click", 4.0)))
    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(inDir)
    val q = graft.streaming.EventStream.windowedEventStats(stream,
        windowLength = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("t_wm")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // nothing closed yet: watermark is still before hour-0's end
      assert(spark.table("t_wm").count() == 0)

      // jump event time far ahead: watermark (max - 10 min) passes the
      // ends of hours 0 and 1. Also deliver a LATE hour-0 click that the
      // watermark must drop once it has advanced.
      writeBatch(Seq(ev(90000, "view", 9.0)))
      q.processAllAvailable()
      writeBatch(Seq(ev(150, "click", 100.0), ev(90010, "view", 1.0)))
      q.processAllAvailable()
      // one more micro-batch so windows closed by the new watermark emit
      writeBatch(Seq(ev(90020, "view", 1.0)))
      q.processAllAvailable()

      val got = spark.table("t_wm").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 1000,
          r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      // the late 100.0 click must NOT be in hour 0 (watermark dropped it)
      assert(got((0L, "click")) == ((2L, 3.5)), s"hour-0 click: $got")
      assert(got((0L, "view")) == ((1L, 1.0)))
      assert(got((3600L, "click")) == ((1L, 4.0)))
      // matches the batch twin computed WITHOUT the late row
      val batch = graft.streaming.EventStream.windowedEventStatsBatch(
          Seq(ev(100, "click", 1.5), ev(200, "click", 2.0),
            ev(300, "view", 1.0), ev(3700, "click", 4.0))
            .toDF("ts", "event_type", "value"))
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 1000,
          r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      batch.foreach { case (k, v) => assert(got(k) == v, s"window $k") }
    } finally q.stop()
  }

  test("stream-stream temporal join: watermarked click attribution " +
       "equals the batch join; state stays bounded by the horizon") {
    val pDir = Files.createTempDirectory("ss-p").toString
    val cDir = Files.createTempDirectory("ss-c").toString
    def row(user: Long, id: Long, sec: Long) =
      (user, id, new java.sql.Timestamp(sec * 1000L))
    def write(dir: String, rows: Seq[(Long, Long, java.sql.Timestamp)]) =
      rows.toDF("user_id", "event_id", "ts")
        .write.mode("append").parquet(dir)

    // clicks at 100/200 (user 1), 150 (user 2); purchases at 300 (u1),
    // 4000 (u1, outside the 1h horizon of nothing — click 200 is 3800
    // back, outside), 160 (u2)
    write(cDir, Seq(row(1, 10, 100), row(1, 11, 200), row(2, 12, 150)))
    write(pDir, Seq(row(1, 20, 300), row(1, 21, 4000), row(2, 22, 160)))
    val schema = "user_id LONG, event_id LONG, ts TIMESTAMP"
    val q = graft.streaming.EventStream.clickAttribution(
        spark.readStream.schema(schema).parquet(pDir),
        spark.readStream.schema(schema).parquet(cDir),
        horizon = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("ss_attr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance both watermarks past everything so all joins emit
      write(cDir, Seq(row(9, 98, 90000)))
      write(pDir, Seq(row(9, 99, 90000)))
      q.processAllAvailable()
      write(cDir, Seq(row(9, 96, 90010)))
      write(pDir, Seq(row(9, 97, 90010)))
      q.processAllAvailable()

      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("purchase_id"), col("click_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamed = pairs(spark.table("ss_attr"))
      // batch twin: the SAME operator on batch frames plans as the
      // plain declarative join over identical inputs
      val batch = pairs(graft.streaming.EventStream.clickAttribution(
        spark.read.parquet(pDir), spark.read.parquet(cDir),
        horizon = "1 hour"))
      assert(streamed == batch,
        s"stream-stream join diverged: $streamed vs $batch")
      // the horizon semantics, spelled out
      assert(streamed.contains((20L, 10L)) && streamed.contains((20L, 11L)),
        "both in-horizon clicks must attribute")
      assert(streamed.contains((22L, 12L)))
      assert(!streamed.exists(_._1 == 21L),
        "a purchase with no click inside the horizon must not match")
      // the join ran with watermarked state (bounded, not accumulating)
      assert(q.lastProgress.stateOperators.nonEmpty,
        "expected stateful symmetric-hash join state")
    } finally q.stop()
  }

  test("streaming funnel state machine: completions match the funnel " +
       "semantics, idle users expire via event-time timeout as abandoned, " +
       "orphan steps create no state") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("funnel-in").toString
    def row(user: Long, typ: String, sec: Long) =
      (user, typ, new java.sql.Timestamp(sec * 1000L))
    def write(rows: Seq[(Long, String, java.sql.Timestamp)]) =
      rows.toDF("user_id", "event_type", "ts")
        .write.mode("append").parquet(inDir)

    val q = graft.streaming.EventStream.funnelStream(
        spark.readStream
          .schema("user_id LONG, event_type STRING, ts TIMESTAMP")
          .parquet(inDir),
        horizonSec = 600L, lateness = "1 minute")
      .writeStream.format("memory").queryName("t_funnel")
      .outputMode("append").start()
    try {
      // wave 1: u1 view+click; u2 view only; u3 orphan click (no view)
      write(Seq(row(1, "view", 100), row(1, "click", 160),
        row(2, "view", 100), row(3, "click", 100)))
      q.processAllAvailable()
      // wave 2: u1 purchase completes; u2 purchase WITHOUT click is
      // ignored; u4's click sorts before its view inside the batch —
      // ignored, then the view opens the state
      write(Seq(row(1, "purchase", 300), row(2, "purchase", 300),
        row(4, "click", 290), row(4, "view", 300)))
      q.processAllAvailable()
      // waves 3+4: far-future events advance the watermark past
      // last-event + horizon for u1/u2/u4; the next batch fires the
      // event-time timeouts
      write(Seq(row(9, "view", 90000)))
      q.processAllAvailable()
      write(Seq(row(9, "click", 90010)))
      q.processAllAvailable()

      val rows = spark.table("t_funnel").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4), r.getBoolean(5))).toSet
      assert(rows.contains((1L, 100L, Some(160L), Some(300L), 3L, true)),
        s"u1 funnel must complete: $rows")
      assert(rows.contains((2L, 100L, None, None, 1L, false)),
        "u2 (view only, purchase without click ignored) must expire at " +
          "stage 1")
      assert(rows.contains((4L, 300L, None, None, 1L, false)),
        "u4's pre-view click must not count; stage-1 expiry expected")
      assert(!rows.exists(_._1 == 3L),
        "an orphan click must create no state and emit nothing")
      assert(!rows.exists(_._1 == 9L), "the watermark driver is still live")
      assert(rows.size == 3, s"unexpected extra emissions: $rows")

      // completed rows agree with the batch q129 shape on the same input
      val ev = spark.read.parquet(inDir)
        .select(col("user_id"), col("event_type"),
          (col("ts").cast("long")).as("sec"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("sec")).as("v_sec"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("sec") >= col("v_sec"))
        .groupBy("user_id").agg(min(col("sec")).as("c_sec"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("sec") >= col("c_sec"))
        .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
      val batchCompleted = v.join(c, "user_id").join(p, "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), Some(r.getLong(2)),
          Some(r.getLong(3)), 3L, true)).toSet
      assert(rows.filter(_._6) == batchCompleted,
        "streamed completions diverged from the batch funnel")
    } finally q.stop()
  }

  test("buffered funnel: events delivered whole batches out of order " +
       "(purchase first, view last) still fold in event-time order — " +
       "streamed completions equal the batch funnel under adversarial " +
       "arrival, same-instant ties fold view->click->purchase") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("bfunnel-in").toString
    def row(user: Long, typ: String, sec: Long) =
      (user, typ, new java.sql.Timestamp(sec * 1000L))
    def write(rows: Seq[(Long, String, java.sql.Timestamp)]) =
      rows.toDF("user_id", "event_type", "ts")
        .write.mode("append").parquet(inDir)

    val q = graft.streaming.EventStream.funnelStreamBuffered(
        spark.readStream
          .schema("user_id LONG, event_type STRING, ts TIMESTAMP")
          .parquet(inDir),
        horizonSec = 600L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("t_bfunnel")
      .outputMode("append").start()
    try {
      // u1's funnel arrives FULLY REVERSED across batches (the greedy
      // variant would fold purchase/click into nothing and abandon at
      // stage 1); u6's click arrives two batches before its same-second
      // view; u2/u5 will abandon; all inside the 10-min lateness bound
      write(Seq(row(1, "purchase", 300), row(5, "view", 320),
        row(6, "click", 500)))
      q.processAllAvailable()
      write(Seq(row(1, "click", 160), row(6, "purchase", 505)))
      q.processAllAvailable()
      write(Seq(row(1, "view", 100), row(2, "view", 150),
        row(6, "view", 500)))
      q.processAllAvailable()
      // watermark drivers: u9's far-future events advance the watermark
      // past every buffered event AND past last-event + horizon, then
      // fire the event-time wake/expiry timeouts on the next trigger
      write(Seq(row(9, "view", 2000)))
      q.processAllAvailable()
      write(Seq(row(9, "click", 2010)))
      q.processAllAvailable()

      val rows = spark.table("t_bfunnel").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4), r.getBoolean(5))).toSet
      assert(rows.contains((1L, 100L, Some(160L), Some(300L), 3L, true)),
        s"u1's reversed funnel must still complete exactly: $rows")
      assert(rows.contains((6L, 500L, Some(500L), Some(505L), 3L, true)),
        "same-instant view/click must fold view first (c_sec == v_sec)")
      assert(rows.contains((2L, 150L, None, None, 1L, false)) &&
        rows.contains((5L, 320L, None, None, 1L, false)),
        s"view-only users must expire as stage-1 abandonments: $rows")
      assert(!rows.exists(_._1 == 9L), "the watermark driver is still live")
      assert(rows.size == 4, s"unexpected extra emissions: $rows")

      // completions == the batch funnel over the SAME (unordered) input
      val ev = spark.read.parquet(inDir)
        .select(col("user_id"), col("event_type"),
          (col("ts").cast("long")).as("sec"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("sec")).as("v_sec"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("sec") >= col("v_sec"))
        .groupBy("user_id").agg(min(col("sec")).as("c_sec"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("sec") >= col("c_sec"))
        .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
      val batchCompleted = v.join(c, "user_id").join(p, "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), Some(r.getLong(2)),
          Some(r.getLong(3)), 3L, true)).toSet
      assert(rows.filter(_._6) == batchCompleted,
        "buffered streamed completions diverged from the batch funnel " +
          "under adversarial arrival order")
    } finally q.stop()
  }

  test("buffered funnel property: a RANDOM event set delivered in a " +
       "RANDOM arrival order equals the batch funnel model — " +
       "completions and abandonments both") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // random journeys over 12 users: event times in [0, 1000], all well
    // inside the 1-hour lateness bound, so NO arrival order drops rows
    val events = (1 to 12).flatMap { u =>
      (0 until 2 + rnd.nextInt(5)).map { _ =>
        val typ = Seq("view", "click", "purchase")(rnd.nextInt(3))
        (u.toLong, typ, rnd.nextInt(1000).toLong)
      }
    }
    // driver-side batch model (the q129 chain + expiry semantics)
    val model = events.groupBy(_._1).flatMap { case (u, evs) =>
      val vs = evs.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None
      else {
        val v = vs.min
        val c = evs.filter(e => e._2 == "click" && e._3 >= v)
          .map(_._3).minOption
        val p = c.flatMap(cs => evs.filter(e =>
          e._2 == "purchase" && e._3 >= cs).map(_._3).minOption)
        p match {
          case Some(ps) => Some((u, v, c, Some(ps), 3L, true))
          case None => Some((u, v, c, None, 1L + c.size, false))
        }
      }
    }.toSet

    val inDir = Files.createTempDirectory("bfunnel-prop").toString
    val shuffled = rnd.shuffle(events)
    val waves = shuffled.grouped(math.max(1, shuffled.size / 4)).toSeq
    val q = graft.streaming.EventStream.funnelStreamBuffered(
        spark.readStream
          .schema("user_id LONG, event_type STRING, ts TIMESTAMP")
          .parquet(inDir),
        horizonSec = 600L, lateness = "1 hour")
      .writeStream.format("memory").queryName("t_bfprop")
      .outputMode("append").start()
    try {
      waves.foreach { w =>
        w.map { case (u, t, s) =>
            (u, t, new java.sql.Timestamp(s * 1000L)) }
          .toDF("user_id", "event_type", "ts")
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      // watermark drivers push past every event + horizon, then trigger
      for (s <- Seq(99000L, 99100L)) {
        Seq((999L, "view", new java.sql.Timestamp(s * 1000L)))
          .toDF("user_id", "event_type", "ts")
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      val got = spark.table("t_bfprop").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4), r.getBoolean(5)))
        .filter(_._1 != 999L).toSet
      assert(got == model,
        s"random-arrival funnel diverged from the batch model\n got: " +
          s"${got.toSeq.sortBy(_._1)}\n want: ${model.toSeq.sortBy(_._1)}")
    } finally q.stop()
  }

  test("online near-dup admission: greedy first-seen-wins across batches, " +
       "idempotent under batch replay") {
    val stateDir = Files.createTempDirectory("ond-state").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      1L -> base,
      2L -> "completely unrelated text about spark partitions and shuffles",
      3L -> base.replace("mu", "muon"),       // near 1 → dropped
      5L -> base,                              // exact copy of 1 → dropped
      6L -> base.replace("sigma", "sigmaprime"), // near 1 → dropped
      7L -> "xy",                              // no shingles → always admitted
      9L -> "another unrelated document mentioning catalyst and codegen")
    val batches = Seq(Seq(1L, 2L, 3L), Seq(5L, 6L), Seq(7L, 9L))
    def df(ids: Seq[Long]) =
      docs.filter(p => ids.contains(p._1)).toDF("doc_id", "text")

    // greedy reference over the batch blocker's pair relation (id order)
    val pairs = graft.operators.Dedup.minhashLshPairs(
        docs.toDF("doc_id", "text"), nHashes = 32, nBands = 16,
        threshold = 0.6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val matchedBy = pairs.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).toSet }
    val keptRef = scala.collection.mutable.Set[Long]()
    docs.map(_._1).sorted.foreach { id =>
      if (!matchedBy.getOrElse(id, Set.empty).exists(keptRef)) keptRef += id
    }
    assert(keptRef.toSet == Set(1L, 2L, 7L, 9L), s"fixture drifted: $keptRef")

    var admittedAll = Set.empty[Long]
    batches.foreach { ids =>
      val r = graft.streaming.OnlineNearDup.processBatch(spark, df(ids),
        stateDir, nHashes = 32, nBands = 16, threshold = 0.6)
      admittedAll ++= r.admitted.select("doc_id").collect().map(_.getLong(0))
      assert(r.nReplayed == 0)
    }
    assert(admittedAll == keptRef.toSet,
      s"online admitted $admittedAll != greedy reference $keptRef")

    // replaying batch 2 is a no-op (ids already in state - incl. dropped?
    // no: dropped ids are NOT in state, so they are re-evaluated against
    // the same kept set and dropped again; admitted stays fixed)
    val replay = graft.streaming.OnlineNearDup.processBatch(spark,
      df(batches(1)), stateDir, nHashes = 32, nBands = 16, threshold = 0.6)
    assert(replay.nAdmitted == 0, "replay admitted previously-dropped docs")
    // replaying batch 3 (all admitted, incl. the signature-less doc 7)
    val replay3 = graft.streaming.OnlineNearDup.processBatch(spark,
      df(batches(2)), stateDir, nHashes = 32, nBands = 16, threshold = 0.6)
    assert(replay3.nReplayed == 2 && replay3.nAdmitted == 0,
      "replayed batch re-admitted documents")
  }

  test("online near-dup admission: in-batch duplicate ids collapse to one " +
       "row; orphan band rows from a torn write do not poison admission") {
    val stateDir = Files.createTempDirectory("ond-state2").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"

    // source redelivery INSIDE one batch: same id three times
    val dup = Seq(11L -> text, 11L -> text, 11L -> (text + " "),
      12L -> "unrelated words about broadcast joins and partition pruning")
      .toDF("doc_id", "text")
    val r1 = graft.streaming.OnlineNearDup.processBatch(spark, dup, stateDir,
      nHashes = 32, nBands = 16, threshold = 0.6)
    assert(r1.nAdmitted == 2, s"in-batch dup ids inflated nAdmitted: ${r1.nAdmitted}")
    assert(r1.admitted.select("doc_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(11L, 12L))

    // torn write: a crash after bands.parquet but before sigs.parquet left
    // orphan band rows for doc 20. The doc must still be processed on
    // replay (it is not in sigs), must NOT be dropped against its own
    // orphan rows, and ends fully admitted.
    val orphan = Seq(20L -> ("a novel document shared with nobody else " +
      "first second third fourth fifth sixth seventh eighth"))
      .toDF("doc_id", "text")
    val sigs0 = spark.read.parquet(s"$stateDir/sigs.parquet")
      .filter(col("id") === 20L).count()
    assert(sigs0 == 0)
    // simulate the torn state exactly as processBatch would have written it
    val sigRows = graft.operators.Dedup.minhashSignatures(orphan, nHashes = 32)
    sigRows.select(col("id"),
      explode(graft.functions.VectorFunctions.minhashBands(col("sig"), 16, 2))
        .as("band"))
      .select(col("band"), col("id"))
      .write.mode("append").parquet(s"$stateDir/bands.parquet")
    val r2 = graft.streaming.OnlineNearDup.processBatch(spark, orphan,
      stateDir, nHashes = 32, nBands = 16, threshold = 0.6)
    assert(r2.nAdmitted == 1 && r2.nReplayed == 0,
      s"torn-write recovery failed: admitted ${r2.nAdmitted}, replayed ${r2.nReplayed}")
    // state converged: signature present, replay now skips the doc
    val r3 = graft.streaming.OnlineNearDup.processBatch(spark, orphan,
      stateDir, nHashes = 32, nBands = 16, threshold = 0.6)
    assert(r3.nReplayed == 1 && r3.nAdmitted == 0)
  }

  test("streaming exact dedup admits each fingerprint once across batches") {
    val inDir = Files.createTempDirectory("sdedup-in").toString
    // batch 1: two distinct docs + an in-batch duplicate (same normalized text)
    Seq((3L, "Alpha  Beta"), (1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text").write.mode("append").parquet(inDir)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(inDir)
    val q = graft.streaming.StreamingDedup.exactDedupStream(stream)
      .writeStream.format("memory").queryName("t_sdedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val pass1 = spark.table("t_sdedup").collect()
        .map(r => r.getAs[Long]("id")).toSet
      // in-batch dup resolved to the smallest id; distinct docs admitted
      assert(pass1 == Set(1L, 2L))

      // batch 2: a cross-batch duplicate plus one genuinely new doc
      Seq((9L, "ALPHA BETA"), (4L, "epsilon zeta"))
        .toDF("doc_id", "text").write.mode("append").parquet(inDir)
      q.processAllAvailable()
      val pass2 = spark.table("t_sdedup").collect()
        .map(r => r.getAs[Long]("id")).toSet
      assert(pass2 == Set(1L, 2L, 4L), "cross-batch duplicate leaked through")
    } finally q.stop()
  }

  test("streamed unified dashboard == the batch-assembled twin over the " +
       "union: profile, HLL, source-grain quantiles, theta top-overlap") {
    import graft.streaming.StreamingReport
    import graft.operators.{Quality, Sketches}
    import graft.functions.TextFunctions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stDir = Files.createTempDirectory("dash-st").toString
    for ((lo, i) <- Seq(0L, 150L, 300L).zipWithIndex) {
      val slice = docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 150)
      StreamingReport.processBatch(slice, stDir, i.toLong)
      StreamingReport.processBatchDistinct(slice, stDir, i.toLong)
      StreamingReport.processBatchMoments(slice, stDir, i.toLong)
      StreamingReport.processBatchKmv(slice, stDir, i.toLong)
    }
    val streamed = StreamingReport.dashboard(spark, stDir)
      .orderBy("source").collect().map(_.toSeq).toSeq

    val uni = docs.filter(col("doc_id") < 450)
    val toks = uni.select(col("source"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val est = Sketches.hllEstimateByGroup(
        Sketches.hllRegisters(toks, "tok", 9, Seq("source")), 9,
        Seq("source"))
      .select(col("source"),
        round(col("est_distinct"), 6).as("est_distinct_tokens"))
    val piv = Sketches.momentsQuantiles(
        Sketches.momentsState(
          uni.select(col("source"),
            round(TextFunctions.qualityScore(col("text")), 6).as("q")),
          "q", Seq("source")),
        Seq(0.5, 0.9), Seq("source"))
      .groupBy(col("source"))
      .agg(round(max(when(col("q") === 0.5, col("est"))), 6)
          .as("p50_quality"),
        round(max(when(col("q") === 0.9, col("est"))), 6)
          .as("p90_quality"))
    val top = Sketches.kmvTopOverlap(
      Sketches.kmvState(toks, "tok", 64, Seq("source")), 64, "source")
    val twin = Quality.corpusReport(uni)
      .join(est, Seq("source"), "left")
      .join(piv, Seq("source"), "left")
      .join(top, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("lang_entropy"),
        col("est_distinct_tokens"), col("p50_quality"),
        col("p90_quality"), col("top_overlap_source"),
        col("top_overlap_jaccard"), col("top_overlap_containment"))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(streamed == twin,
      "streamed dashboard diverged from the batch-assembled twin — every " +
        "leg's merge must be exact (profile sums, register max, moments " +
        "DECIMAL sums, KMV sorted-union-truncate)")
    assert(streamed.nonEmpty && streamed.head.size == 11)
  }

  test("streaming corpus report equals the batch report over the union, " +
       "replays are idempotent") {
    import graft.streaming.StreamingReport
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val inDir = Files.createTempDirectory("rep-in").toString
    val ckDir = Files.createTempDirectory("rep-ck").toString
    val stDir = Files.createTempDirectory("rep-st").toString

    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("source")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("mean_quality"),
        r.getAs[Double]("lang_entropy"))).toSeq

    // a dashboard polling BEFORE the first micro-batch lands must get an
    // empty report, not a path-missing read failure
    val early = StreamingReport.report(spark, stDir)
    assert(early.isEmpty, "pre-stream report must be empty")
    assert(early.columns.toSeq ==
      Seq("source", "n_docs", "n_tokens", "mean_quality", "lang_entropy"))

    val q = StreamingReport.sink(
      spark.readStream.schema(docs.schema).parquet(inDir), stDir, ckDir,
      pollSeconds = 1, trackDistinct = true, trackFreq = true)
    try {
      for (lo <- Seq(0L, 150L, 300L)) { // three arrival waves
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 150)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = rows(StreamingReport.report(spark, stDir))
    val batch = rows(graft.operators.Quality.corpusReport(
      docs.filter(col("doc_id") < 450)))
    assert(streamed == batch,
      "streamed report diverged from the batch report over the union")

    // HLL companion: registers merge by max, so the streamed per-source
    // distinct-token estimate is BIT-IDENTICAL to the batch-side estimate
    // over the union, not merely close
    def distinctRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect().map(r =>
        (r.getAs[String]("source"), r.getAs[Double]("est_distinct"))).toSeq
    val streamedDistinct =
      distinctRows(StreamingReport.distinctReport(spark, stDir))
    val batchToks = docs.filter(col("doc_id") < 450)
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val batchDistinct = distinctRows(graft.operators.Sketches
      .hllEstimateByGroup(
        graft.operators.Sketches.hllRegisters(batchToks, "tok", 9,
          Seq("source")), 9, Seq("source")))
    assert(streamedDistinct == batchDistinct,
      "streamed HLL estimate diverged from the batch sketch over the union")

    // ... and so is the pairwise overlap matrix served from the same
    // streamed registers (register max-merge is exact)
    def matrixRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g1", "g2").collect().map(_.toSeq).toSeq
    assert(matrixRows(StreamingReport.overlapReport(spark, stDir)) ==
      matrixRows(graft.operators.Sketches.hllOverlapMatrix(
        graft.operators.Sketches.hllRegisters(batchToks, "tok", 9,
          Seq("source")), 9, "source")),
      "streamed overlap matrix diverged from the batch matrix")

    // the sink's trackFreq leg: count-min estimates over the stream ==
    // the batch sketch over the union (exact integer sums)
    val unionToks = docs.filter(col("doc_id") < 450)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
    val probeToks = unionToks.distinct()
    assert(StreamingReport.freqReport(spark, stDir, probeToks, "tok")
        .orderBy("tok").collect().map(_.toSeq).toSeq ==
      graft.operators.Sketches.cmEstimate(
          graft.operators.Sketches.cmCounters(unionToks, "tok", 4, 1024),
          probeToks, "tok", 4, 1024)
        .orderBy("tok").collect().map(_.toSeq).toSeq,
      "sink-fed count-min diverged from the batch sketch over the union")

    // at-least-once replay: reprocessing a delivered batch id rewrites its
    // own partition — neither report may change
    StreamingReport.processBatch(
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), stDir, 1L)
    StreamingReport.processBatchDistinct(
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300), stDir, 1L)
    assert(rows(StreamingReport.report(spark, stDir)) == batch,
      "replayed batch double-counted")
    assert(distinctRows(StreamingReport.distinctReport(spark, stDir))
      == batchDistinct, "replayed batch moved the HLL estimate")
  }

  test("streaming-report compaction: folds old partials into a base, " +
       "reports byte-identical, crash mid-swap heals, folded leftovers " +
       "never double-count") {
    import graft.streaming.StreamingReport
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stDir = Files.createTempDirectory("rep-cp").toString
    def slice(i: Long) =
      docs.filter(col("doc_id") >= i * 50 && col("doc_id") < (i + 1) * 50)
    for (i <- 0L until 6L) {
      StreamingReport.processBatch(slice(i), stDir, i)
      StreamingReport.processBatchDistinct(slice(i), stDir, i, b = 7)
      StreamingReport.processBatchFreq(slice(i), stDir, i, d = 4, w = 256)
      StreamingReport.processBatchMoments(slice(i), stDir, i)
      StreamingReport.processBatchSparseDistinct(slice(i), stDir, i,
        b = 7, threshold = 25)
    }
    def rep() = StreamingReport.report(spark, stDir)
      .orderBy("source").collect().map(_.toSeq).toSeq
    def drep() = StreamingReport.distinctReport(spark, stDir)
      .orderBy("source").collect().map(_.toSeq).toSeq
    def toksOf(hi: Long) = docs.filter(col("doc_id") < hi)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("tok"))
    val allProbes = toksOf(400).distinct()
    def frep() = StreamingReport.freqReport(spark, stDir, allProbes, "tok")
      .orderBy("tok").collect().map(_.toSeq).toSeq
    val before = rep()
    val dBefore = drep()

    def qrep() = StreamingReport.quantileReport(spark, stDir)
      .orderBy("source", "lang", "q").collect().map(_.toSeq).toSeq
    val qBefore = qrep()

    // sparse-HLL family: every per-batch partial is sparse (a 50-doc
    // batch rarely exceeds 25 distinct tokens per (source, lang)), but
    // the UNION crosses the threshold for many groups — the merge must
    // promote exactly as a one-pass build would, so the streamed report
    // equals the batch-built sparse estimates
    def sdrep() = StreamingReport.sparseDistinctReport(spark, stDir)
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq
    val sdBefore = sdrep()
    val slToks = docs.filter(col("doc_id") < 300)
      .select(col("source"), col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val onePassState = graft.operators.Sketches.hllSparseState(
      slToks, "tok", 7, 25, Seq("source", "lang"))
    assert(onePassState.filter(col("kind") === 0).count() > 0 &&
      onePassState.filter(col("kind") === 1).count() > 0,
      "test corpus must exercise cross-batch promotion AND surviving " +
        "sparse groups")
    assert(sdBefore == graft.operators.Sketches.hllSparseEstimate(
        onePassState, 7, Seq("source", "lang"))
      .orderBy("source", "lang").collect().map(_.toSeq).toSeq,
      "streamed sparse-distinct report diverged from the one-pass build")
    // streamed quantile estimates == the batch-built moments sketch, at
    // the same (source, lang) grain the sparse-distinct report keys
    assert(qBefore == graft.operators.Sketches.momentsQuantiles(
        graft.operators.Sketches.momentsState(
          docs.filter(col("doc_id") < 300).select(col("source"), col("lang"),
            round(graft.functions.TextFunctions.qualityScore(col("text")), 6)
              .as("q")),
          "q", Seq("source", "lang")),
        Seq(0.5, 0.9), Seq("source", "lang"))
      .orderBy("source", "lang", "q").collect().map(_.toSeq).toSeq,
      "streamed quantile report diverged from the batch moments sketch")

    // streamed CM estimates == the batch sketch over the union, exactly
    // (integer sums), including zero-count probes from the wider probe set
    val fBefore = frep()
    assert(fBefore == graft.operators.Sketches.cmEstimate(
        graft.operators.Sketches.cmCounters(toksOf(300), "tok", 4, 256),
        allProbes, "tok", 4, 256)
      .orderBy("tok").collect().map(_.toSeq).toSeq,
      "streamed count-min diverged from the batch sketch")

    // distinctReport must use the PERSISTED b=7, not its old default of 9
    val batchToks = docs.filter(col("doc_id") < 300)
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val batchB7 = graft.operators.Sketches.hllEstimateByGroup(
        graft.operators.Sketches.hllRegisters(batchToks, "tok", 7,
          Seq("source")), 7, Seq("source"))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(dBefore == batchB7,
      "distinctReport did not honor the persisted bucket-bit count")

    StreamingReport.compact(spark, stDir, keepBatches = 2)
    val fs = new org.apache.hadoop.fs.Path(stDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def liveBatches(fam: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$stDir/$fam")).toSeq
        .map(_.getPath.getName).filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong).sorted
    assert(liveBatches("partials") == Seq(4L, 5L),
      "only the keepBatches most recent partials may stay unfolded")
    assert(liveBatches("hll") == Seq(4L, 5L))
    assert(liveBatches("cm") == Seq(4L, 5L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$stDir/partials_base")))
    assert(liveBatches("moments") == Seq(4L, 5L))
    assert(liveBatches("hlls") == Seq(4L, 5L))
    assert(rep() == before, "compaction changed the profile report")
    assert(drep() == dBefore, "compaction changed the distinct report")
    assert(frep() == fBefore, "compaction changed the count-min report")
    assert(qrep() == qBefore, "compaction changed the quantile report")
    assert(sdrep() == sdBefore,
      "compaction changed the sparse-distinct report")

    // a replay of a recent (unfolded) batch id still overwrites in place
    StreamingReport.processBatch(slice(5), stDir, 5)
    assert(rep() == before, "post-compaction replay double-counted")

    // crash-after-rename leftover: a folded batch dir that resurfaces is
    // below _folded_up_to and must be ignored, not summed again
    StreamingReport.processBatch(slice(1), stDir, 1)
    assert(rep() == before, "folded leftover directory double-counted")

    // more batches, second compaction folds ONLY the (folded, cutoff] range
    for (i <- 6L until 8L) {
      StreamingReport.processBatch(slice(i), stDir, i)
      StreamingReport.processBatchFreq(slice(i), stDir, i, d = 4, w = 256)
    }
    StreamingReport.compact(spark, stDir, keepBatches = 2)
    val after2 = rep()
    val expect2 = graft.operators.Quality.corpusReport(
        docs.filter(col("doc_id") < 400))
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(after2 == expect2,
      "second compaction lost or double-counted a range")

    // crash between base delete and rename: only the temp copy exists —
    // the next reader must finish the rename and see identical data
    val base = new org.apache.hadoop.fs.Path(s"$stDir/partials_base")
    val tmp = new org.apache.hadoop.fs.Path(s"$stDir/partials_base_compact")
    assert(fs.rename(base, tmp))
    assert(rep() == after2, "heal after torn swap lost data")
    assert(fs.exists(base) && !fs.exists(tmp), "heal did not finish rename")

    // crash before the base delete: a stale temp alongside a live base is
    // IGNORED by readers — a read-path delete would race an in-progress
    // compaction between its temp write and base delete and destroy the
    // only compacted copy. The next compaction cleans it up instead.
    fs.mkdirs(tmp)
    assert(rep() == after2,
      "stale temp alongside a live base changed the report")
    assert(fs.exists(tmp),
      "a reader must not delete a temp next to a live base")
    for (i <- 8L until 10L) StreamingReport.processBatch(slice(i), stDir, i)
    StreamingReport.compact(spark, stDir, keepBatches = 2)
    assert(!fs.exists(tmp), "compaction did not clean the stale temp")
    assert(rep() == graft.operators.Quality.corpusReport(
        docs.filter(col("doc_id") < 500))
      .orderBy("source").collect().map(_.toSeq).toSeq,
      "compaction over a stale temp lost data")

    // register shape is pinned: a later writer with a different b refuses
    intercept[IllegalArgumentException] {
      StreamingReport.processBatchDistinct(slice(0), stDir, 99L, b = 9)
    }
    // and the CM shape likewise
    intercept[IllegalArgumentException] {
      StreamingReport.processBatchFreq(slice(0), stDir, 99L, d = 4, w = 512)
    }
    // and the sparse-HLL shape (b AND threshold are both state-shaping)
    intercept[IllegalArgumentException] {
      StreamingReport.processBatchSparseDistinct(slice(0), stDir, 99L,
        b = 7, threshold = 64)
    }
    // state whose shape marker is MISSING (legacy/lost) is an error, not
    // a silent default: a writer must not stamp its own shape onto it and
    // a reader must not guess one — mixed-shape registers are garbage
    val hllB = new org.apache.hadoop.fs.Path(s"$stDir/hll/_b")
    assert(fs.delete(hllB, false))
    intercept[IllegalStateException] {
      StreamingReport.processBatchDistinct(slice(0), stDir, 99L, b = 7)
    }
    intercept[IllegalStateException] {
      StreamingReport.distinctReport(spark, stDir)
    }
    locally { // restore the marker for the assertions below
      val out = fs.create(hllB, true)
      try out.write("7".getBytes("UTF-8")) finally out.close()
    }
    // the compacted CM state still answers exactly: union of batches 0..7
    assert(frep() == graft.operators.Sketches.cmEstimate(
        graft.operators.Sketches.cmCounters(toksOf(400), "tok", 4, 256),
        allProbes, "tok", 4, 256)
      .orderBy("tok").collect().map(_.toSeq).toSeq,
      "compacted count-min state diverged from the batch sketch over 0..400")
  }

  test("sink auto-compaction: a long-running sink bounds its own state " +
       "directories with no external calls; reports stay byte-identical") {
    import graft.streaming.StreamingReport
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stDir = Files.createTempDirectory("rep-ac").toString
    val fs = new org.apache.hadoop.fs.Path(stDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def liveDirs(fam: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$stDir/$fam")
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(_.getPath.getName.startsWith("batch="))
    }
    // 60 triggers of the foreachBatch body (driving Spark's scheduler 60
    // real triggers would measure the scheduler, not this logic), tiny
    // rotating slices, compaction cadence 8, keepBatches 2
    val every = 8
    for (i <- 0L until 60L) {
      val lo = (i * 7) % 490
      StreamingReport.processSinkBatch(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 7),
        stDir, i, trackDistinct = true, trackFreq = true,
        autoCompactEvery = every, keepBatches = 2)
      // bound holds at EVERY point of the run, tightest right after a
      // fold: never more than base + cadence + keepBatches per family
      for (fam <- Seq("partials", "hll", "cm"))
        assert(liveDirs(fam) <= every + 2,
          s"$fam grew to ${liveDirs(fam)} live dirs at batch $i")
      if (i > 0 && i % every == 0)
        assert(liveDirs("partials") == 2,
          s"auto-compact at batch $i did not fold down to keepBatches")
    }
    // the report over the auto-compacted state equals the batch report
    // over exactly the union of the 60 slices (overlaps and all)
    val union = (0L until 60L).map { i =>
      val lo = (i * 7) % 490
      docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 7)
    }.reduce(_ unionByName _)
    assert(StreamingReport.report(spark, stDir)
        .orderBy("source").collect().map(_.toSeq).toSeq ==
      graft.operators.Quality.corpusReport(union)
        .orderBy("source").collect().map(_.toSeq).toSeq,
      "auto-compacted streamed report diverged from the batch report")

    // and through the REAL sink: an actual streaming query with a short
    // cadence folds in-line between triggers
    val inDir = Files.createTempDirectory("rep-ac-in").toString
    val ckDir = Files.createTempDirectory("rep-ac-ck").toString
    val st2 = Files.createTempDirectory("rep-ac-st2").toString
    val q = StreamingReport.sink(
      spark.readStream.schema(docs.schema).parquet(inDir), st2, ckDir,
      pollSeconds = 1, trackQuantiles = true, trackSparseDistinct = true,
      autoCompactEvery = 3, keepBatches = 1)
    try {
      for (w <- 0 until 7) {
        docs.filter(col("doc_id") >= w * 60 && col("doc_id") < (w + 1) * 60)
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    } finally q.stop()
    for (fam <- Seq("partials", "moments", "hlls")) {
      val p2 = new org.apache.hadoop.fs.Path(s"$st2/$fam")
      val live2 =
        fs.listStatus(p2).count(_.getPath.getName.startsWith("batch="))
      assert(live2 <= 4, s"real sink kept $live2 live $fam dirs (cadence 3)")
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$st2/${fam}_base")),
        s"real sink never folded a $fam base")
    }
    val streamedDocs = docs.filter(col("doc_id") < 420)
    assert(StreamingReport.report(spark, st2)
        .orderBy("source").collect().map(_.toSeq).toSeq ==
      graft.operators.Quality.corpusReport(streamedDocs)
        .orderBy("source").collect().map(_.toSeq).toSeq,
      "real-sink auto-compacted report diverged from the batch report")
    // the sink's quantile leg: streamed + auto-compacted moments state
    // serves the same estimates as the batch-built sketch
    assert(StreamingReport.quantileReport(spark, st2)
        .orderBy("source", "lang", "q").collect().map(_.toSeq).toSeq ==
      graft.operators.Sketches.momentsQuantiles(
          graft.operators.Sketches.momentsState(
            streamedDocs.select(col("source"), col("lang"),
              round(graft.functions.TextFunctions.qualityScore(col("text")),
                6).as("q")),
            "q", Seq("source", "lang")),
          Seq(0.5, 0.9), Seq("source", "lang"))
        .orderBy("source", "lang", "q").collect().map(_.toSeq).toSeq,
      "sink-fed quantile report diverged from the batch moments sketch")
    // and the sparse-distinct leg, exact below threshold / HLL above
    assert(StreamingReport.sparseDistinctReport(spark, st2)
        .orderBy("source", "lang").collect().map(_.toSeq).toSeq ==
      graft.operators.Sketches.hllSparseEstimate(
          graft.operators.Sketches.hllSparseState(
            streamedDocs.select(col("source"), col("lang"),
              explode(graft.functions.TextFunctions.tokens(col("text")))
                .as("tok")),
            "tok", 9, 256, Seq("source", "lang")),
          9, Seq("source", "lang"))
        .orderBy("source", "lang").collect().map(_.toSeq).toSeq,
      "sink-fed sparse-distinct report diverged from the one-pass build")
  }

  test("streaming KMV partials: report and overlap matrix bit-identical " +
       "to the batch build over the union; replay and compaction change " +
       "nothing") {
    import graft.streaming.StreamingReport
    import graft.operators.Sketches
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stDir = Files.createTempDirectory("kmv-st").toString
    def slice(i: Long) =
      docs.filter(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100)
    for (i <- 0L until 4L)
      StreamingReport.processBatchKmv(slice(i), stDir, i, k = 32)

    def toks = docs.filter(col("doc_id") < 400)
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    def est(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect().map(_.toSeq).toSeq
    def mat(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g1", "g2").collect().map(_.toSeq).toSeq

    val batchState = Sketches.kmvState(toks, "tok", 32, Seq("source"))
    val streamedEst = est(StreamingReport.kmvReport(spark, stDir))
    assert(streamedEst == est(Sketches.kmvEstimate(batchState, 32,
      Seq("source"))), "streamed KMV estimate diverged from batch")
    val streamedMat = mat(StreamingReport.kmvOverlapReport(spark, stDir))
    assert(streamedMat == mat(Sketches.kmvOverlapMatrix(batchState, 32,
      "source")), "streamed KMV overlap diverged from batch")

    // mismatched shape refused
    intercept[IllegalArgumentException] {
      StreamingReport.processBatchKmv(slice(0), stDir, 9L, k = 64)
    }
    // replay: idempotent merge absorbs the re-delivered partial
    StreamingReport.processBatchKmv(slice(1), stDir, 1L, k = 32)
    assert(est(StreamingReport.kmvReport(spark, stDir)) == streamedEst,
      "replayed KMV partial moved the estimate")
    // compaction folds the family; both reports unchanged
    StreamingReport.compact(spark, stDir, keepBatches = 1)
    assert(new java.io.File(s"$stDir/kmv").listFiles()
      .count(_.getName.startsWith("batch=")) <= 1,
      "kmv partials were not folded")
    assert(est(StreamingReport.kmvReport(spark, stDir)) == streamedEst &&
      mat(StreamingReport.kmvOverlapReport(spark, stDir)) == streamedMat,
      "compaction changed the KMV reports")
  }

  test("streaming SCD2 history == the batch scd2Apply chain; a replayed " +
       "batch changes nothing; snapshotAt time-travels the streamed state") {
    import spark.implicits._
    import graft.streaming.StreamingSnapshot
    import graft.operators.Snapshot
    val inDir = Files.createTempDirectory("scd2-in").toString
    val ckDir = Files.createTempDirectory("scd2-ck").toString
    val stDir = Files.createTempDirectory("scd2-st").toString

    intercept[IllegalStateException] {
      StreamingSnapshot.history(spark, stDir, "id")
    }

    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val b1 = Seq((2L, "b2"), (3L, "c")).toDF("id", "text")
    val b2 = Seq((1L, "a"), (3L, "c3")).toDF("id", "text")

    val q = StreamingSnapshot.sink(
      spark.readStream.schema("id LONG, text STRING").parquet(inDir),
      stDir, ckDir, "id", Seq("text"), pollSeconds = 1)
    try Seq(b0, b1, b2).foreach { b =>
      b.write.mode("append").parquet(inDir)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "text", "row_hash", "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
        .sortBy(t => (t._1, t._4)).toSeq

    val streamed = rows(StreamingSnapshot.history(spark, stDir, "id"))
    // the batch twin: init at version 1, then two partial upserts
    val twin = rows(Snapshot.scd2Apply(
      Snapshot.scd2Apply(
        Snapshot.scd2Init(b0, "id", Seq("text"), 1L),
        b1, "id", Seq("text"), 2L, closeMissing = false),
      b2, "id", Seq("text"), 3L, closeMissing = false))
    assert(streamed == twin,
      "streamed history diverged from the batch scd2 chain")

    // at-least-once: re-deliver batch 1 directly — state must not move
    StreamingSnapshot.processBatch(b1, stDir, 1L, "id", Seq("text"))
    assert(rows(StreamingSnapshot.history(spark, stDir, "id")) == streamed,
      "replaying batch 1 moved the history")

    // time travel over the streamed state
    val at2 = Snapshot.snapshotAt(
        StreamingSnapshot.history(spark, stDir, "id"), 2L)
      .select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(at2 == Seq((1L, "a"), (2L, "b2"), (3L, "c")),
      s"version-2 snapshot wrong: $at2")
  }

  test("streaming SCD2 same-key micro-batch rows: identical duplicates " +
       "collapse, conflicts fail fast without orderCol, orderCol picks " +
       "the greatest deterministically") {
    import spark.implicits._
    import graft.streaming.StreamingSnapshot
    val stDir = Files.createTempDirectory("scd2-dup").toString
    // byte-identical duplicate rows in one batch: must collapse silently
    val dupSame = Seq((1L, "a", 10L), (1L, "a", 10L), (2L, "b", 10L))
      .toDF("id", "text", "seq")
    StreamingSnapshot.processBatch(dupSame, stDir, 0L, "id", Seq("text"))
    def live() = StreamingSnapshot.history(spark, stDir, "id")
      .filter(col("valid_to").isNull).select("id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(live() == Seq((1L, "a"), (2L, "b")),
      "identical duplicates must land as one opened row")

    // conflicting same-key rows without orderCol: refuse the batch
    val conflict = Seq((3L, "x", 1L), (3L, "y", 2L)).toDF("id", "text", "seq")
    val err = intercept[IllegalArgumentException] {
      StreamingSnapshot.processBatch(conflict, stDir, 1L, "id", Seq("text"))
    }
    assert(err.getMessage.contains("id=3"), err.getMessage)

    // with orderCol the greatest seq wins — and a replay re-picks it
    StreamingSnapshot.processBatch(conflict, stDir, 1L, "id", Seq("text"),
      orderCol = Some("seq"))
    assert(live() == Seq((1L, "a"), (2L, "b"), (3L, "y")),
      "orderCol must pick the greatest-seq row")
    StreamingSnapshot.processBatch(conflict, stDir, 1L, "id", Seq("text"),
      orderCol = Some("seq"))
    assert(live() == Seq((1L, "a"), (2L, "b"), (3L, "y")),
      "replaying the deduped batch must be a no-op")
  }

  test("streaming SCD2 compaction: history identical across folds, delta " +
       "dirs bounded, recent replays reconstruct, folded reconstruction " +
       "refused, torn swap heals") {
    import spark.implicits._
    import graft.streaming.StreamingSnapshot
    import graft.operators.Snapshot
    val stDir = Files.createTempDirectory("scd2-cp").toString
    // churny batches: key 1 revises every batch (guarantees closures),
    // key 2 stable, key 10+i newly added per batch
    def frame(i: Int) =
      Seq((1L, s"v$i"), (2L, "stable"), (10L + i, s"n$i"))
        .toDF("id", "text")
    for (i <- 0 until 8)
      StreamingSnapshot.processBatch(frame(i), stDir, i.toLong, "id",
        Seq("text"))

    def rows() = StreamingSnapshot.history(spark, stDir, "id")
      .select("id", "text", "row_hash", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._4)).toSeq
    def dirCount(fam: String) =
      new java.io.File(s"$stDir/$fam").listFiles()
        .count(_.getName.startsWith("batch="))

    val before = rows()
    StreamingSnapshot.compact(spark, stDir, "id", keepBatches = 2)
    assert(rows() == before, "history changed across the first fold")
    assert(dirCount("opened") == 2 && dirCount("closures") == 2,
      "folded delta dirs were not removed")
    // fold cutoff unchanged → second compact is a no-op
    StreamingSnapshot.compact(spark, stDir, "id", keepBatches = 2)
    assert(rows() == before, "idle re-compact moved the history")

    // a RECENT batch replay still reconstructs its pre-state exactly
    StreamingSnapshot.processBatch(frame(7), stDir, 7L, "id", Seq("text"))
    assert(rows() == before, "replaying a recent batch moved the history")
    // reconstructing strictly before the fold cutoff is refused
    intercept[IllegalStateException] {
      StreamingSnapshot.processBatch(frame(3), stDir, 3L, "id", Seq("text"))
    }

    // keep streaming past the fold, fold again, compare to the batch twin
    for (i <- 8 until 10)
      StreamingSnapshot.processBatch(frame(i), stDir, i.toLong, "id",
        Seq("text"))
    StreamingSnapshot.compact(spark, stDir, "id", keepBatches = 2)
    // checkpoint between refreshes: chaining N scd2Apply PLANS without
    // truncation is the exponential-analysis trap (in production each
    // refresh reads the PERSISTED history, so lineage never chains)
    val twin = (1 until 10).foldLeft(
        Snapshot.scd2Init(frame(0), "id", Seq("text"), 1L)
          .localCheckpoint(true)) { (h, i) =>
      Snapshot.scd2Apply(h, frame(i), "id", Seq("text"), i + 1L,
        closeMissing = false).localCheckpoint(true)
    }
    val twinRows = twin
      .select("id", "text", "row_hash", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._4)).toSeq
    assert(rows() == twinRows,
      "compacted streamed history diverged from the batch scd2 chain")

    // torn swap: simulate a crash between base delete and rename — the
    // next reader must finish the rename and answer identically
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(s"$stDir/base")
    val tmp = new org.apache.hadoop.fs.Path(s"$stDir/base_compact")
    assert(fs.rename(base, tmp), "test setup: simulate torn swap")
    assert(rows() == twinRows, "torn swap not healed by the reader")
    assert(fs.exists(base) && !fs.exists(tmp),
      "heal must finish the rename")
  }

  test("streaming contamination monitor: the cumulative report equals the " +
       "batch scan over every delivery, replays are exact no-ops, " +
       "parameter drift fails loudly") {
    import graft.streaming.StreamingContamination
    val stateDir = Files.createTempDirectory("contam-state").toString
    val passage = (1 to 10).map(i => s"c$i").mkString(" ")
    val evalDocs = Seq(
      (100L, s"e1 e2 $passage e3"),
      (200L, "clean eval words only here nothing shared at all")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"t1 $passage t2"),           // delivered in batch 0
      (2L, "unrelated train text entirely"),
      (3L, s"t3 t4 t5 $passage"),        // delivered in batch 1
      (4L, s"x1 ${(3 to 8).map(i => s"c$i").mkString(" ")} x2")) // partial
    def df(ids: Seq[Long]) = train.filter(t => ids.contains(t._1))
      .toDF("doc_id", "text")
    val p = StreamingContamination.Params(minLen = 4)
    StreamingContamination.prepareEval(spark, evalDocs, stateDir, p)

    StreamingContamination.processBatch(spark, df(Seq(1L, 2L)), stateDir,
      p, batchKey = Some(0L))
    StreamingContamination.processBatch(spark, df(Seq(3L, 4L)), stateDir,
      p, batchKey = Some(1L))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Long]("n_partners"))).toSet
    val streamed = rows(StreamingContamination.report(spark, stateDir, p))
    val batch = rows(graft.operators.Dedup.contaminationSpans(
      train.toDF("doc_id", "text"), evalDocs, minLen = 4))
    assert(streamed == batch,
      s"streamed report $streamed != batch scan $batch")
    // the passage sits at eval tokens [2, 11]; doc 4 contributes the
    // inner [4, 9] slice — merged into ONE region credited to 3 sources
    assert(streamed.contains((100L, 2, 11, 3L)), streamed)
    assert(!streamed.exists(_._1 == 200L), "clean eval doc flagged")

    // replay (same batchKey) overwrites its own hits: report unchanged
    StreamingContamination.processBatch(spark, df(Seq(3L, 4L)), stateDir,
      p, batchKey = Some(1L))
    assert(rows(StreamingContamination.report(spark, stateDir, p))
      == streamed, "replay changed the report")

    // drifted parameters are refused before any scan
    val ex = intercept[IllegalArgumentException] {
      StreamingContamination.processBatch(spark, df(Seq(1L)), stateDir,
        StreamingContamination.Params(minLen = 6), batchKey = Some(2L))
    }
    assert(ex.getMessage.contains("drifted"), ex.getMessage)
  }

  test("streaming contamination cap is GLOBAL: an anchor under the " +
       "per-delivery cap but over the cumulative cap is dropped exactly " +
       "as the one-shot batch scan drops it") {
    import graft.streaming.StreamingContamination
    val stateDir = Files.createTempDirectory("contam-cap").toString
    val hotP = (1 to 10).map(i => s"p$i").mkString(" ")   // in all 4 docs
    val coldP = (1 to 8).map(i => s"q$i").mkString(" ")   // in 2 docs
    val evalDocs = Seq((9L, s"head $hotP mid $coldP tail"))
      .toDF("doc_id", "text")
    val t1 = Seq((1L, s"a1 $hotP $coldP"), (2L, s"b1 $hotP"))
    val t2 = Seq((3L, s"c1 $hotP $coldP"), (4L, s"d1 $hotP"))
    // every hotP anchor occurs 2× per delivery (≤ maxOcc = 2) but 4× in
    // aggregate (> maxOcc): the one-shot scan drops it, and so must the
    // cumulative report — the per-delivery cap alone would leak it
    val p = StreamingContamination.Params(minLen = 4, maxOcc = 2)
    StreamingContamination.prepareEval(spark, evalDocs, stateDir, p)
    StreamingContamination.processBatch(spark, t1.toDF("doc_id", "text"),
      stateDir, p, batchKey = Some(0L))
    StreamingContamination.processBatch(spark, t2.toDF("doc_id", "text"),
      stateDir, p, batchKey = Some(1L))
    def spans(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Long]("n_partners"))).toSet
    val streamed = spans(StreamingContamination.report(spark, stateDir, p))
    val batch = spans(graft.operators.Dedup.contaminationSpans(
      (t1 ++ t2).toDF("doc_id", "text"), evalDocs, minLen = 4, maxOcc = 2))
    assert(streamed == batch,
      s"cap-straddling divergence: streamed $streamed != batch $batch")
    // and concretely: coldP (2 ≤ cap) is reported, hotP (4 > cap) is not
    assert(streamed.exists { case (_, st, en, n) =>
      en - st + 1 == 8 && n == 2L }, s"cold passage lost: $streamed")
    assert(!streamed.exists { case (_, st, en, _) =>
      en - st + 1 >= 10 }, s"hot passage leaked through the cap: $streamed")
  }

  test("streaming scrub equals the one-shot batch decontamination across " +
       "deliveries, including a cap-straddling hot anchor, and scrubs " +
       "any re-presented subset") {
    import graft.streaming.StreamingContamination
    val stateDir = Files.createTempDirectory("contam-scrub").toString
    val hotP = (1 to 10).map(i => s"p$i").mkString(" ")   // in all 4 docs
    val coldP = (1 to 8).map(i => s"q$i").mkString(" ")   // in 2 docs
    val evalDocs = Seq((9L, s"head $hotP mid $coldP tail"))
      .toDF("doc_id", "text")
    val t1 = Seq((1L, s"a1 $hotP $coldP"), (2L, s"b1 $hotP"))
    val t2 = Seq((3L, s"c1 $hotP $coldP"), (4L, s"d1 $hotP"))
    // hotP anchors: 2 per delivery (≤ maxOcc = 2) but 4 in aggregate
    // (> maxOcc) — the batch transform keeps those tokens, so the
    // streamed scrub must too; coldP (2 ≤ cap) is removed on both sides
    val p = StreamingContamination.Params(minLen = 4, maxOcc = 2)
    StreamingContamination.prepareEval(spark, evalDocs, stateDir, p)
    StreamingContamination.processBatch(spark, t1.toDF("doc_id", "text"),
      stateDir, p, batchKey = Some(0L))
    StreamingContamination.processBatch(spark, t2.toDF("doc_id", "text"),
      stateDir, p, batchKey = Some(1L))
    val union = (t1 ++ t2).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text"))).toMap
    val streamed = rows(StreamingContamination.scrub(spark, union,
      stateDir, p))
    val batch = rows(graft.operators.Dedup.removeContaminated(
      union, evalDocs, minLen = 4, maxOcc = 2))
    assert(streamed == batch,
      s"scrub divergence:\nstreamed $streamed\nbatch    $batch")
    // concretely: doc 1 lost exactly the cold passage (8 tokens), doc 2
    // (hot-only) lost nothing — the global cap protected it
    assert(streamed(1L)._2 == 8L, s"doc 1: ${streamed(1L)}")
    assert(streamed(2L)._2 == 0L &&
      streamed(2L)._3.contains("p1 p2"), s"doc 2: ${streamed(2L)}")
    // a re-presented SUBSET scrubs only its own docs
    val sub = rows(StreamingContamination.scrub(spark,
      t1.toDF("doc_id", "text"), stateDir, p))
    assert(sub.keySet == Set(1L, 2L) && sub(1L) == streamed(1L))
  }

  test("streaming contamination compaction: folded hit/count partitions " +
       "report byte-identically (global cap included), a resurrected " +
       "folded batch never double-counts, torn swaps heal") {
    import graft.streaming.StreamingContamination
    val stateDir = Files.createTempDirectory("contam-compact").toString
    val hotP = (1 to 10).map(i => s"h$i").mkString(" ")   // 6 docs: over cap
    val coldP = (1 to 8).map(i => s"k$i").mkString(" ")   // 3 docs: at cap
    val evalDocs = Seq((5L, s"top $hotP mid $coldP end")).toDF("doc_id", "text")
    val p = StreamingContamination.Params(minLen = 4, maxOcc = 3)
    StreamingContamination.prepareEval(spark, evalDocs, stateDir, p)
    // six deliveries; the cold passage rides batches 0/2/4 only
    val batches = (0 until 6).map { k =>
      val extra = if (k % 2 == 0) s" $coldP" else ""
      Seq((k.toLong + 10, s"x$k $hotP$extra")).toDF("doc_id", "text")
    }
    batches.zipWithIndex.foreach { case (b, k) =>
      StreamingContamination.processBatch(spark, b, stateDir, p,
        batchKey = Some(k.toLong)) }
    def spans() = StreamingContamination.report(spark, stateDir, p)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
        r.getAs[Long]("n_partners"))).toSet
    val before = spans()
    // sanity: hot passage (6 > 3) capped away, cold (3 <= 3) reported
    assert(before.exists { case (_, st, en, n) => en - st + 1 == 8 && n == 3L },
      s"cold passage missing pre-compaction: $before")
    assert(!before.exists { case (_, st, en, _) => en - st + 1 >= 10 }, before)

    StreamingContamination.compact(spark, stateDir, keepBatches = 2)
    assert(spans() == before, "compaction changed the report")
    val (fs, hd) = graft.sources.Bundle.fsPath(s"$stateDir/hits")
    def liveDirs(d: String) = fs.listStatus(
        new org.apache.hadoop.fs.Path(d)).count(
        _.getPath.getName.startsWith("batch="))
    assert(liveDirs(s"$stateDir/hits") == 2 &&
      liveDirs(s"$stateDir/counts") == 2,
      "fold must leave only keepBatches live partitions")

    // a folded batch resurfacing (crash after rename, before the live
    // delete — simulated by re-delivering batch 0) must not double-count
    // the summed counts: the cap would over-trigger and drop coldP
    StreamingContamination.processBatch(spark, batches(0), stateDir, p,
      batchKey = Some(0L))
    assert(spans() == before, "resurrected folded batch double-counted")

    // torn swap: base renamed away mid-compaction — the reader heals
    val base = new org.apache.hadoop.fs.Path(s"$stateDir/counts_base")
    val tmp = new org.apache.hadoop.fs.Path(s"$stateDir/counts_base_compact")
    assert(fs.rename(base, tmp), "fixture: simulate the torn swap")
    assert(spans() == before, "torn compaction swap not healed by report()")
    assert(fs.exists(base) && !fs.exists(tmp), "heal must finish the rename")
  }

  test("streaming contamination monitor end-to-end: the registered sink " +
       "scans drops as they arrive") {
    import graft.streaming.StreamingContamination
    val stateDir = Files.createTempDirectory("contam-sink").toString
    val inDir = Files.createTempDirectory("contam-in").toString
    val ckDir = Files.createTempDirectory("contam-ck").toString
    val passage = (1 to 8).map(i => s"z$i").mkString(" ")
    val evalDocs = Seq((7L, s"a0 $passage a1")).toDF("doc_id", "text")
    val p = StreamingContamination.Params(minLen = 4)
    StreamingContamination.prepareEval(spark, evalDocs, stateDir, p)
    val t1 = Seq((1L, s"junk $passage more")).toDF("doc_id", "text")
    val t2 = Seq((2L, "nothing shared"), (3L, s"$passage tail"))
      .toDF("doc_id", "text")
    // drops 3-5 only pad the trigger count so the in-line auto-compaction
    // (every 2 batches) actually fires inside the running sink
    val pads = (4L to 6L).map(i =>
      Seq((i, s"pad$i $passage p")).toDF("doc_id", "text"))
    t1.write.mode("append").parquet(inDir)
    val q = StreamingContamination.sink(spark, inDir, ckDir, stateDir, p,
      pollSeconds = 1, schemaSource = t1,
      autoCompactEvery = 2, keepBatches = 1)
    try {
      q.processAllAvailable()
      t2.write.mode("append").parquet(inDir)
      q.processAllAvailable()
      pads.foreach { d =>
        d.write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rep = StreamingContamination.report(spark, stateDir, p).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Long]("n_partners"))).toSet
    assert(rep == Set((7L, 1, 8, 5L)), s"sink report drifted: $rep")
    // the self-compacting sink folded old partitions into the bases
    val (fs, _) = graft.sources.Bundle.fsPath(stateDir)
    def liveDirs(d: String) = fs.listStatus(
        new org.apache.hadoop.fs.Path(d))
      .count(_.getPath.getName.startsWith("batch="))
    assert(graft.sources.Bundle.exists(s"$stateDir/hits_base"),
      "auto-compaction never ran inside the sink")
    assert(liveDirs(s"$stateDir/hits") <= 3 &&
      liveDirs(s"$stateDir/counts") <= 3,
      s"sink state unbounded: ${liveDirs(s"$stateDir/hits")} live hit dirs")
  }
}
