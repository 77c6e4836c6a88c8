package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Snapshot}
import graft.sources.Bundle

/** Store/state management on CLUSTER storage. Every dir here is addressed
  * through `graftfs://` ([[GraftTestFs]]): a Hadoop filesystem whose paths
  * `java.io.File` can never resolve — the deployment shape of HDFS/S3. A
  * store path that silently falls back to java.io probes reads "absent"
  * forever here, so these specs catch the cluster-only degradation class
  * (incremental paths that never engage, invalidation deletes that no-op,
  * closed history partitions that vanish) that a plain local-tmp spec
  * cannot: on local disk both APIs agree.
  */
class ClusterFsSpec extends SparkSpec {
  import spark.implicits._

  /** A fresh graftfs:// directory (backed by local tmp, resolvable ONLY
    * through the Hadoop FileSystem API).
    */
  private def graftDir(prefix: String): String = {
    spark.sparkContext // force the session: graftfs registers through it
    "graftfs://" + java.nio.file.Files.createTempDirectory(prefix).toString
  }

  private def curveBatch(idxFrom: Int, idxTo: Int) =
    (idxFrom until idxTo).flatMap { idx =>
      (1 to 3).map(q => (idx, (idx % 3).toDouble, q, (idx + q).toDouble, 1.0))
    }.toDF("image_idx", "delay", "q_bin", "i", "err")

  test("graftfs paths are invisible to java.io — the fixture is honest") {
    val dir = graftDir("gfs-honest")
    assert(!new java.io.File(dir).exists(),
      "the graftfs:// URI string must not be a resolvable local path")
    val (fs, p) = Bundle.fsPath(dir)
    assert(fs.isInstanceOf[GraftTestFs] && fs.exists(p),
      "the same string must resolve through the Hadoop FileSystem")
  }

  test("manifest write/read/invalidate cycle works on a non-local scheme") {
    val dir = graftDir("gfs-manifest")
    assert(Bundle.readManifest(dir).isEmpty)
    Bundle.writeManifest(dir, Map("a" -> "1", "b" -> "x\ny"))
    assert(Bundle.readManifest(dir).contains(Map("a" -> "1", "b" -> "x\ny")))
    // overwrite (the renameOverwrite fallback path: graftfs registers no
    // AbstractFileSystem binding, so FileContext is unsupported)
    Bundle.writeManifest(dir, Map("a" -> "2"))
    assert(Bundle.readManifest(dir).contains(Map("a" -> "2")))
    // T2 invalidation delete must actually delete on cluster storage
    Bundle.deleteRecursively(dir)
    assert(!Bundle.exists(dir) && Bundle.readManifest(dir).isEmpty)
  }

  test("bundle save/load on a non-local scheme") {
    val dir = graftDir("gfs-bundle")
    val t = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Bundle.save(dir, Map("t" -> t), Map("p" -> "1"))
    val back = Bundle.load(spark, dir)
    assert(back.keySet == Set("t"))
    assert(back("t").orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "b")))
    assert(Bundle.isValid(dir, Map("p" -> "1")))
    assert(!Bundle.isValid(dir, Map("p" -> "2")))
  }

  test("incremental reduction ENGAGES on cluster storage: second batch is " +
       "not a full recompute and matches the batch oracle") {
    val stateDir = graftDir("gfs-incred")
    val r1 = graft.streaming.IncrementalReduction.processBatch(
      spark, curveBatch(0, 20), stateDir)
    assert(r1.fullRecompute, "first batch has no state — full recompute")
    val r2 = graft.streaming.IncrementalReduction.processBatch(
      spark, curveBatch(20, 40), stateDir)
    // THE cluster bug this spec exists for: state-validity probes through
    // java.io.File read false on a non-local scheme, silently forcing
    // fullRecompute (O(history) per trigger) while every write succeeds
    assert(!r2.fullRecompute,
      "incremental path must engage when state lives on cluster storage")
    // work stays bounded by tail + batch, not history
    assert(r2.windowRows < 20 * 3 + 6 * 3 + 1,
      s"window ${r2.windowRows} rows — re-reducing history on graftfs?")
    val got = r2.reduced
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
  }

  test("ANN index build/compact/append/serve on cluster storage; " +
       "mid-compaction crash states heal") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("id"))).toSeq

    val dir = graftDir("gfs-annix")
    val p = AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 8, iters = 5)
    AnnIndex.build(emb.filter(col("vec_id") < 300), dir, p)
    val before = rows(AnnIndex.topK(spark, dir, queries, k = 5, nProbe = 3))
    assert(before.nonEmpty)
    AnnIndex.append(spark, dir,
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400))
    AnnIndex.compact(spark, dir, nFiles = 1)
    val after = rows(AnnIndex.topK(spark, dir, queries, k = 5, nProbe = 3))

    // crash between delete and rename: only the compacted copy remains —
    // load() must heal by renaming it into place, all through Hadoop FS
    val (fs, live) = Bundle.fsPath(s"$dir/codes.parquet")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/codes_compact.parquet")
    assert(fs.rename(live, tmp), "fixture: simulate the crash window")
    val healed = rows(AnnIndex.topK(spark, dir, queries, k = 5, nProbe = 3))
    assert(healed == after, "healed index must serve identically")
    assert(fs.exists(live) && !fs.exists(tmp), "heal must finish the rename")
  }

  test("SCD2 history store on cluster storage: closed partitions stay " +
       "visible and invalidation rebuilds") {
    val dir = graftDir("gfs-scd2") + "/st"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val v2 = Seq((1L, "a2"), (2L, "b")).toDF("id", "text")
    Snapshot.ensureHistory(v1, dir, "id", Seq("text"), 1L)
    Snapshot.ensureHistory(v2, dir, "id", Seq("text"), 2L)
    // key 1's v1 row is CLOSED at version 2 — it lives in closed/version=2,
    // whose existence probe must go through the Hadoop FS (a java.io probe
    // would silently drop all closed history from reads)
    val hist = Snapshot.loadHistory(spark, dir)
    assert(hist.count() == 3, "open slice + closed revision")
    val at1 = Snapshot.snapshotAt(hist, 1L).select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(at1 == Seq((1L, "a"), (2L, "b")), "time travel needs closed rows")
    // drift invalidation must DELETE the old store on cluster storage
    val (h3, wrote) = Snapshot.ensureHistory(v1, dir, "id",
      Seq("text", "id"), 1L)
    assert(wrote && h3.count() == 2)
    assert(!Bundle.exists(s"$dir/closed"),
      "invalidation left stale closed partitions behind")
  }

  test("curve-history compaction on cluster storage: segments commit " +
       "through the non-local FileSystem, the incremental path stays " +
       "engaged, and the fallback over the compacted store matches batch") {
    import graft.streaming.IncrementalReduction
    val stateDir = graftDir("gfs-compact")
    (0 until 6).foreach { k =>
      val r = IncrementalReduction.processBatch(spark,
        curveBatch(k * 5, (k + 1) * 5), stateDir, batchKey = Some(k.toLong))
      assert(r.fullRecompute == (k == 0), s"batch $k")
    }
    IncrementalReduction.compact(spark, stateDir, keepBatches = 1)
    val (fs, base) = Bundle.fsPath(s"$stateDir/curves_base")
    assert(fs.exists(base) && fs.listStatus(base)
      .exists(_.getPath.getName.startsWith("seg=")),
      "no committed segment under the graftfs curves_base")
    val (_, cv) = Bundle.fsPath(s"$stateDir/curves")
    assert(fs.listStatus(cv).count(_.getPath.getName.startsWith("batch=")) <= 1,
      "folded batch dirs must be deleted on cluster storage")
    // still incremental after the fold
    val r6 = IncrementalReduction.processBatch(spark,
      curveBatch(30, 35), stateDir, batchKey = Some(6L))
    assert(!r6.fullRecompute, "compaction must not disturb the frontier")
    // forced fallback reduces the segment store + live dirs correctly
    // (the late rows join the history, so the oracle includes them)
    val lateRows = curveBatch(100, 101)
      .withColumn("image_idx", lit(2) + col("image_idx") * 0)
      .localCheckpoint(true)
    val late = IncrementalReduction.processBatch(spark, lateRows,
      stateDir, batchKey = Some(7L))
    assert(late.fullRecompute)
    val got = late.reduced
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val want = graft.operators.Reduction.timeResolvedSignal(
        curveBatch(0, 35).unionByName(lateRows))
      .select("delay", "q_bin", "diff_av", "n_rep").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (av, n)) =>
      assert(approx(got(k)._1, av, 1e-9) && got(k)._2 == n, s"group $k") }
  }

  test("reliable closure checkpoints ride cluster storage: components and " +
       "pageRank rounds checkpoint through the registered non-local " +
       "FileSystem with results identical to local mode") {
    import graft.operators.Clusters
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (0L until 16L).toDF("id")
    val edges = (0L until 15L).map(i => (i, i + 1)).toDF("src", "dst")
    def run() = (
      Clusters.components(pairs, vertices).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      Clusters.pageRank(edges, iterations = 3).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    val (ccLocal, prLocal) = run()
    val ckRoot = graftDir("gfs-ck")
    spark.conf.set(graft.operators.Checkpoints.DirConf, ckRoot)
    try {
      // adopt the graftfs root explicitly (the shared context may carry
      // an earlier suite's dir; an explicit set wins by contract)
      spark.sparkContext.setCheckpointDir(ckRoot)
      val adopted = spark.sparkContext.getCheckpointDir.get
      assert(adopted.startsWith("graftfs:"),
        s"checkpoint dir must resolve through graftfs, got $adopted")
      val (ccRel, prRel) = run()
      assert(ccRel == ccLocal, "graftfs-mode components diverged")
      assert(prRel == prLocal, "graftfs-mode pageRank diverged")
      // the rounds really wrote through the non-local scheme: the final
      // (still-referenced) checkpoints live under the graftfs root
      val (fs, p) = Bundle.fsPath(adopted)
      val rddDirs = fs.listStatus(p).map(_.getPath.getName)
        .count(_.startsWith("rdd-"))
      assert(rddDirs >= 1,
        "no rdd-* checkpoint dirs under the graftfs root — reliable " +
          "mode silently fell back to local checkpoints")
    } finally spark.conf.unset(graft.operators.Checkpoints.DirConf)
  }

  test("reliable checkpoint mode: the EAGER dedup operators (persist-once " +
       "lifecycles) produce identical results through the registered " +
       "non-local FileSystem, and the persist is released either way") {
    import graft.operators.Dedup
    val passage = (1 to 25).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage unique one tail words here"),
      (2L, s"other head material first $passage"),
      (3L, passage),
      (4L, "completely different text with nothing shared at all among"))
      .toDF("doc_id", "text")
    def run() = (
      Dedup.ngramJaccardPairs(docs, threshold = 0.5).collect()
        .map(_.toSeq).sortBy(_.toString()).toSeq,
      Dedup.exactSubstringPairSpans(docs, minLen = 20).collect()
        .map(_.toSeq).sortBy(_.toString()).toSeq,
      Dedup.contaminationSpans(docs.filter(col("doc_id") <= 2),
          docs.filter(col("doc_id") === 3), minLen = 20).collect()
        .map(_.toSeq).sortBy(_.toString()).toSeq)
    val local = run()
    assert(local._1.nonEmpty && local._2.nonEmpty && local._3.nonEmpty,
      "fixture must exercise all three pair/span operators")
    val ckRoot = graftDir("gfs-dedup-ck")
    spark.conf.set(graft.operators.Checkpoints.DirConf, ckRoot)
    try {
      spark.sparkContext.setCheckpointDir(ckRoot)
      assert(run() == local,
        "reliable-mode dedup operators diverged from local mode")
      // sc nests checkpoints under <root>/<uuid>/rdd-*
      val (fs, p) = Bundle.fsPath(spark.sparkContext.getCheckpointDir.get)
      assert(fs.listStatus(p).map(_.getPath.getName).count(_.startsWith("rdd-")) >= 1,
        "no rdd-* dirs under the graftfs root — eagerCheckpoint fell back")
    } finally spark.conf.unset(graft.operators.Checkpoints.DirConf)
  }

  test("grep gate: NO main-source code path touches java.io.File — " +
       "store, state, query harness, and entry points all ride Hadoop FS") {
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) walk(f)
        else if (f.getName.endsWith(".scala")) Seq(f) else Nil)
    val files = walk(new java.io.File("src/main/scala/graft"))
    assert(files.size > 50, s"gate walked only ${files.size} files")
    val offenders = files.sortBy(_.getPath).flatMap { f =>
      scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
        .getLines().zipWithIndex.collect {
          case (l, i) if l.contains("java.io.File") &&
            !l.trim.startsWith("//") && !l.trim.startsWith("*") =>
            s"${f.getPath}:${i + 1}: ${l.trim}"
        }
    }
    assert(offenders.isEmpty,
      "main sources must use the Hadoop FS API, found:\n" +
        offenders.mkString("\n"))
  }
}
