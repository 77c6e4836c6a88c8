package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}
import graft.sources.Bundle

/** Persisted IVF-PQ index: build-once/serve-many must be bit-identical to
  * the live path, parameter changes must invalidate, and incremental
  * append must equal encoding everything with the build-time quantizers.
  */
@SlowSuite
class AnnIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("dist"))).toSeq

  test("saved-index search is bit-identical to the live IVF-ADC path, " +
       "raw and residual") {
    for (byResidual <- Seq(false, true)) {
      val dir = Files.createTempDirectory("annix").toString
      val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8,
        iters = 10, byResidual = byResidual)
      AnnIndex.build(emb, dir, p)

      // the live path, trained with the same deterministic calls
      val cents = Similarity.sampledKMeans(emb, p.kCells, p.iters, p.sampleN)
      val cbs =
        if (byResidual) Similarity.trainPqCodebooksResidual(emb, cents,
          p.m, p.k, p.dim, p.iters, p.sampleN)
        else Similarity.trainPqCodebooks(emb, p.m, p.k, p.dim, p.iters,
          p.sampleN)
      val live = rows(Similarity.ivfAdcTopK(emb, queries, cents, cbs,
        k = 10, nProbe = 3, byResidual = byResidual))
      val served = rows(AnnIndex.topK(spark, dir, queries, k = 10,
        nProbe = 3))
      assert(served == live,
        s"byResidual=$byResidual: saved-index results diverged from live")
      assert(served.nonEmpty && served.count(_._2 == 1) == 5)
    }
  }

  test("build with init=oversample serves bit-identical to the live path " +
       "trained by the same calls; init drift invalidates") {
    val dir = Files.createTempDirectory("annix-os").toString
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8,
      iters = 2, init = "oversample")
    AnnIndex.build(emb, dir, p)
    // live twin: the exact trainer the build ran (oversampled seeding +
    // full-corpus Lloyd), then the in-memory IVF-ADC path
    val cents = AnnIndex.trainCentroids(emb, p)
    val cbs = Similarity.trainPqCodebooks(emb, p.m, p.k, p.dim, p.iters,
      p.sampleN)
    val live = rows(Similarity.ivfAdcTopK(emb, queries, cents, cbs,
      k = 10, nProbe = 3))
    val served = rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
    assert(served == live, "oversample-built index diverged from live")
    assert(served.nonEmpty && served.count(_._2 == 1) == 5)
    // the de-biased init must actually train different centroids than the
    // stride default here, and switching init must invalidate the index
    assert(cents != AnnIndex.trainCentroids(emb, p.copy(init = "stride")),
      "oversample init trained the same centroids as stride (test is vacuous)")
    assert(!AnnIndex.ensure(emb, dir, p), "same params must reuse")
    assert(AnnIndex.ensure(emb, dir, p.copy(init = "farthest")),
      "init drift must rebuild (T2 invalidation)")
    assert(Bundle.readManifest(dir).get("init") == "farthest")
    intercept[IllegalArgumentException] {
      AnnIndex.Params(dim = 64, init = "bogus")
    }
  }

  test("ensure(): manifest match reuses, parameter change rebuilds") {
    val dir = Files.createTempDirectory("annix-ens").toString
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 2)
    assert(AnnIndex.ensure(emb, dir, p), "first ensure must build")
    val codesFiles = new java.io.File(s"$dir/codes.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(!AnnIndex.ensure(emb, dir, p), "same params must reuse")
    val after = new java.io.File(s"$dir/codes.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == codesFiles, "reuse must not rewrite the code table")
    // any parameter drift drops and rebuilds (T2 invalidation)
    assert(AnnIndex.ensure(emb, dir, p.copy(kCells = 12)))
    assert(Bundle.readManifest(dir).get("kCells") == "12")
    // a manifest-less directory (crash mid-build) is invalid
    Bundle.deleteRecursively(s"$dir/manifest.json")
    assert(AnnIndex.ensure(emb, dir, p.copy(kCells = 12)))
  }

  test("append encodes with saved quantizers: equals full encode, " +
       "replay is a no-op") {
    val dir = Files.createTempDirectory("annix-app").toString
    val first = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    AnnIndex.build(first, dir, p)
    val r1 = AnnIndex.append(spark, dir, rest)
    assert(r1.nAppended == rest.count() && r1.nSkipped == 0)

    // reference: encode the WHOLE corpus with the quantizers trained on
    // `first` (append never retrains), serve in memory
    val cents = Similarity.sampledKMeans(first, p.kCells, p.iters, p.sampleN)
    val cbs = Similarity.trainPqCodebooks(first, p.m, p.k, p.dim, p.iters,
      p.sampleN)
    val full = Similarity.ivfAdcTopK(emb, queries, cents, cbs, k = 10,
      nProbe = 3)
    val served = AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3)
    assert(rows(served) == rows(full),
      "append-then-query diverged from full encode with the same quantizers")

    // replaying the delivery appends nothing and changes nothing
    val r2 = AnnIndex.append(spark, dir, rest)
    assert(r2.nAppended == 0 && r2.nSkipped == rest.count())
    assert(rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
      == rows(full))
  }

  test("append collapses in-delivery duplicate ids (at-least-once batch " +
       "with a doubled row)") {
    val dir = Files.createTempDirectory("annix-dup").toString
    val first = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    AnnIndex.build(first, dir, p)
    // one delivery carrying every row twice: the anti-join alone would
    // pass both copies (neither id is in the index yet)
    val r = AnnIndex.append(spark, dir, rest.union(rest))
    assert(r.nAppended == rest.count() && r.nSkipped == 0,
      s"in-batch duplicates must collapse before counting, got $r")
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    assert(codes.count() == emb.count() &&
      codes.select("id").distinct().count() == emb.count(),
      "duplicate id rows landed in codes.parquet")
    // no id may appear at two ranks for one query
    val topk = AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3)
    assert(topk.groupBy("query_id", "id").count()
      .filter(col("count") > 1).isEmpty,
      "an id surfaced at two ranks for one query")
  }

  test("streaming bootstrap: an empty first batch defers (no index, no " +
       "crash); an in-batch duplicate id is encoded once") {
    import graft.streaming.StreamingAnnIndex
    val ixDir = Files.createTempDirectory("annix-boot").toString + "/ix"
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    val empty = emb.filter(col("vec_id") < 0)
    val r0 = StreamingAnnIndex.processBatch(spark, empty, ixDir, p)
    assert(r0.nAppended == 0 && r0.nSkipped == 0)
    assert(Bundle.readManifest(ixDir).isEmpty,
      "an empty batch must not build an index")
    val first = emb.filter(col("vec_id") < 400)
    val r1 = StreamingAnnIndex.processBatch(spark, first.union(first), ixDir, p)
    assert(r1.nAppended == first.count(),
      s"bootstrap must collapse in-batch duplicate ids, got $r1")
    val codes = spark.read.parquet(s"$ixDir/codes.parquet")
    assert(codes.count() == first.count() &&
      codes.select("id").distinct().count() == first.count())
  }

  test("streaming maintenance: bootstrap from the first batch, append " +
       "later batches, replay-idempotent across a restart") {
    import graft.streaming.StreamingAnnIndex
    val inDir = Files.createTempDirectory("annix-str-in").toString
    val ckDir = Files.createTempDirectory("annix-str-ck").toString
    val ixDir = Files.createTempDirectory("annix-str-ix").toString + "/ix"
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    val first = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)

    def stream = spark.readStream.schema(emb.schema).parquet(inDir)

    first.write.mode("append").parquet(inDir)
    val q = StreamingAnnIndex.sink(stream, ixDir, ckDir, p, pollSeconds = 1)
    try {
      q.processAllAvailable() // bootstrap: quantizers trained on `first`
      assert(Bundle.isValid(ixDir, p.asMap))
      rest.write.mode("append").parquet(inDir)
      q.processAllAvailable() // append with the SAVED quantizers
    } finally q.stop()

    // reference: encode everything with quantizers trained on `first`
    val cents = Similarity.sampledKMeans(first, p.kCells, p.iters, p.sampleN)
    val cbs = Similarity.trainPqCodebooks(first, p.m, p.k, p.dim, p.iters,
      p.sampleN)
    val full = rows(Similarity.ivfAdcTopK(emb, queries, cents, cbs,
      k = 10, nProbe = 3))
    assert(rows(AnnIndex.topK(spark, ixDir, queries, k = 10, nProbe = 3))
      == full, "streamed index diverged from the batch-built reference")

    // restart from the checkpoint; re-deliver `rest` as NEW files (the
    // file source sees new files, append's anti-join skips the ids)
    val q2 = StreamingAnnIndex.sink(stream, ixDir, ckDir, p, pollSeconds = 1)
    try {
      rest.write.mode("append").parquet(inDir)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(AnnIndex.topK(spark, ixDir, queries, k = 10, nProbe = 3))
      == full, "replayed delivery changed the index")
    assert(AnnIndex.load(spark, ixDir).codes.count() == emb.count(),
      "replay duplicated code rows")
  }

  test("compact() defragments appended codes; serving is bit-identical; " +
       "a crash between delete and rename heals on load") {
    val dir = Files.createTempDirectory("annix-cmp").toString
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    AnnIndex.build(emb.filter(col("vec_id") < 200), dir, p)
    for (lo <- Seq(200L, 300L, 400L))
      AnnIndex.append(spark, dir,
        emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 100))

    def parquetFiles() = new java.io.File(s"$dir/codes.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val fragmented = parquetFiles()
    assert(fragmented >= 4, s"expected >=4 fragments, got $fragmented")

    val before = rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
    AnnIndex.compact(spark, dir, nFiles = 1)
    assert(parquetFiles() == 1, "compaction must leave one data file")
    assert(rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
      == before, "compaction changed serving results")
    assert(AnnIndex.load(spark, dir).codes.count() == emb.count())

    // simulate the delete-then-crash window: live table gone, copy present
    assert(new java.io.File(s"$dir/codes.parquet")
      .renameTo(new java.io.File(s"$dir/codes_compact.parquet")))
    assert(rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
      == before, "heal-on-load failed after a simulated compaction crash")
    assert(new java.io.File(s"$dir/codes.parquet").exists())
  }

  test("compaction crash matrix: every reachable interrupted state — " +
       "before/after each swap step, with and without a concurrent " +
       "append — serves correctly, never loses rows, and converges") {
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    def freshIndex(): String = {
      val dir = Files.createTempDirectory("annix-crash").toString
      AnnIndex.build(emb.filter(col("vec_id") < 200), dir, p)
      AnnIndex.append(spark, dir,
        emb.filter(col("vec_id") >= 200 && col("vec_id") < 300))
      dir
    }
    val refDir = freshIndex()
    val expect = rows(AnnIndex.topK(spark, refDir, queries, k = 10, nProbe = 3))
    val expectN = 300L
    def live(dir: String) = new java.io.File(s"$dir/codes.parquet")
    def tmp(dir: String) = new java.io.File(s"$dir/codes_compact.parquet")
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach(f => java.nio.file.Files.copy(f.toPath,
        dst.toPath.resolve(f.getName)))
    }
    def check(dir: String, label: String, n: Long = expectN,
              want: Seq[(Long, Int, Long, Double)] = expect): Unit = {
      assert(rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
        == want, s"$label: serving drifted")
      assert(AnnIndex.load(spark, dir).codes.count() == n,
        s"$label: row count drifted")
      AnnIndex.compact(spark, dir, nFiles = 1)
      assert(live(dir).listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"$label: follow-up compaction must converge to one file")
      assert(rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
        == want, s"$label: post-convergence serving drifted")
    }

    // crash AFTER the compacted copy is written, BEFORE the live delete:
    // live + complete stale tmp coexist
    locally {
      val dir = freshIndex()
      copyDir(live(dir), tmp(dir))
      check(dir, "stale-complete-tmp")
    }
    // crash MID-copy: live + partial tmp (no complete parquet footer)
    locally {
      val dir = freshIndex()
      tmp(dir).mkdirs()
      java.nio.file.Files.writeString(
        tmp(dir).toPath.resolve("part-00000.parquet"), "torn")
      check(dir, "partial-tmp")
    }
    // crash BETWEEN delete and rename: only the compacted copy exists —
    // load/topK must heal and serve the full index
    locally {
      val dir = freshIndex()
      assert(live(dir).renameTo(tmp(dir)))
      check(dir, "post-delete-pre-rename")
    }
    // append-concurrent × stale tmp: rows appended AFTER the crashed
    // compaction's copy must survive the retried compaction (it must
    // re-read the LIVE table, never the stale copy)
    locally {
      val dir = freshIndex()
      copyDir(live(dir), tmp(dir))
      AnnIndex.append(spark, dir,
        emb.filter(col("vec_id") >= 300 && col("vec_id") < 350))
      val want = rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
      check(dir, "append-over-stale-tmp", n = 350L, want = want)
      assert(AnnIndex.load(spark, dir).codes.count() == 350L,
        "appended rows lost to the stale compacted copy")
    }
    // append-concurrent × healed state: an append issued FIRST against
    // the post-delete state must heal, then append — nothing lost
    locally {
      val dir = freshIndex()
      assert(live(dir).renameTo(tmp(dir)))
      val r = AnnIndex.append(spark, dir,
        emb.filter(col("vec_id") >= 300 && col("vec_id") < 350))
      assert(r.nAppended == 50L, s"append after crash: $r")
      val want = rows(AnnIndex.topK(spark, dir, queries, k = 10, nProbe = 3))
      check(dir, "append-first-after-crash", n = 350L, want = want)
    }
  }

  test("streaming maintenance fails fast on parameter drift instead of " +
       "shrinking the index to one batch") {
    import graft.streaming.StreamingAnnIndex
    val ixDir = Files.createTempDirectory("annix-drift").toString + "/ix"
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    val first = emb.filter(col("vec_id") < 400)
    StreamingAnnIndex.processBatch(spark, first, ixDir, p) // bootstrap
    val e = intercept[IllegalStateException] {
      StreamingAnnIndex.processBatch(spark, emb, ixDir, p.copy(kCells = 12))
    }
    assert(e.getMessage.contains("rebuild offline"))
    // the original index is untouched
    assert(Bundle.isValid(ixDir, p.asMap))
  }
}
