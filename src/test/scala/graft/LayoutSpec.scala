package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout contracts: the bit-interleave arithmetic, quantization
  * clamps, deterministic file assignment — and the claim that justifies
  * the operator at 100 TB: under a box predicate, per-file min/max
  * pruning over the Z-layout touches FEWER files than over a
  * single-column sort layout.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits: x on even positions, y on odd") {
    val rows = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L),
      (255L, 255L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3, 1): x bits at 0,2 → 0b101; y bit at 1 → 0b010; z = 0b111 = 7
    assert(rows == Seq(7L, 0L, 0x5555L, 0xAAAAL, 0xFFFFL),
      s"unexpected z-values $rows")
  }

  test("quantize maps [lo, hi] onto [0, 2^bits) and clamps outliers") {
    val rows = Seq(-5.0, 0.0, 0.5, 0.999, 1.0, 7.0).toDF("v")
      .select(Layout.quantize(col("v"), 0.0, 1.0, 8).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 0L, 128L, 255L, 255L, 255L),
      s"unexpected cells $rows")
  }

  test("file assignment is deterministic, covers all files, and balances " +
       "sizes within one row") {
    val pts = (1 to 4096).map { i =>
      val x = (i * 2654435761L % 1000).toDouble / 1000.0
      val y = (i * 40503L % 1000).toDouble / 1000.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 1.0, 8))
    def assign() = Layout.zorderFileAssignment(pts,
        Layout.zValue(col("xq"), col("yq"), 8), col("id"), nFiles = 32)
      .select("id", "file_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = assign()
    assert(assign() == a, "re-running the assignment moved rows")
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until 32L).toSet, "every file must be used")
    assert(sizes.values.max - sizes.values.min <= 1,
      s"4096 rows over 32 files must balance exactly, got $sizes")
  }

  test("Z-layout pruning beats the single-column sort layout on a box " +
       "predicate, and y-range queries don't degrade to a full scan") {
    // deterministic pseudo-uniform 2-D corpus
    val pts = (1 to 8192).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      val y = (i * 40503L % 10000).toDouble / 10000.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 1.0, 8))
    val nFiles = 64
    val zStats = Layout.fileStats(Layout.zorderFileAssignment(pts,
      Layout.zValue(col("xq"), col("yq"), 8), col("id"), nFiles),
      Seq("x", "y")).cache()
    val xStats = Layout.fileStats(Layout.zorderFileAssignment(pts,
      col("xq"), col("id"), nFiles), Seq("x", "y")).cache()
    try {
      // 10% × 10% box: both layouts prune on x, only Z prunes on y too
      val box = Map("x" -> (0.45, 0.55), "y" -> (0.45, 0.55))
      val (zBox, xBox) = (Layout.filesTouched(zStats, box),
        Layout.filesTouched(xStats, box))
      assert(zBox < xBox,
        s"Z-layout must beat the x-sort layout on a 2-D box: $zBox vs $xBox")
      assert(zBox <= nFiles / 4,
        s"a 1% box should touch a small fraction of files, got $zBox/$nFiles")
      // y-only range: the x-sorted layout cannot prune at all
      val yr = Map("y" -> (0.45, 0.55))
      val (zY, xY) = (Layout.filesTouched(zStats, yr),
        Layout.filesTouched(xStats, yr))
      assert(xY == nFiles, "x-sorted layout must full-scan a y-range")
      assert(zY < nFiles / 2,
        s"Z-layout must skip y-range files, touched $zY/$nFiles")
    } finally { zStats.unpersist(); xStats.unpersist() }
  }

  test("written Z-layout end-to-end: real parquet footers skip files " +
       "under a 2-D box, the pruned scan is row-identical to the full " +
       "scan, and the x-sorted layout cannot skip a y-range") {
    val pts = (1 to 8192).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      val y = (i * 40503L % 10000).toDouble / 10000.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 1.0, 8))
    val nFiles = 32
    val base = java.nio.file.Files.createTempDirectory("zlay").toString
    val zDir = s"$base/z"
    val xDir = s"$base/x"
    Layout.zorderWrite(pts,
      Layout.zValue(col("xq"), col("yq"), 8), col("id"), nFiles, zDir)
    Layout.zorderWrite(pts, col("xq"), col("id"), nFiles, xDir)

    // the write produced one tight-footer file per range partition
    val zStats = Layout.parquetStats(spark, zDir, Seq("x", "y"))
    assert(zStats.map(_.file).distinct.size == nFiles,
      s"expected $nFiles written files, got ${zStats.map(_.file).distinct.size}")
    assert(zStats.forall(g => g.mins.contains("x") && g.maxs.contains("y")),
      "footers must carry min/max statistics for both clustered columns")

    val box = Map("x" -> (0.45, 0.55), "y" -> (0.45, 0.55))
    val (zScan, zKept, zTotal) = Layout.prunedScan(spark, zDir, box)
    assert(zTotal == nFiles)
    assert(zKept.size <= nFiles / 2,
      s"a 1% box must skip most files, opened ${zKept.size}/$nFiles")
    // row-identity against the unpruned full scan with the same predicate
    val full = spark.read.parquet(zDir)
      .filter(col("x").between(0.45, 0.55) && col("y").between(0.45, 0.55))
      .select("id").collect().map(_.getLong(0)).toSet
    val pruned = zScan.select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == full,
      "footer pruning changed the scan result — files were wrongly skipped")
    assert(full.nonEmpty, "fixture box must select rows")

    // y-range: the x-sorted layout's footers cannot skip anything
    val yr = Map("y" -> (0.45, 0.55))
    val (_, xKeptY, _) = Layout.prunedScan(spark, xDir, yr)
    val (_, zKeptY, _) = Layout.prunedScan(spark, zDir, yr)
    assert(xKeptY.size == nFiles,
      "x-sorted layout must open every file for a y-range")
    assert(zKeptY.size < nFiles,
      s"Z-layout must skip y-range files, opened ${zKeptY.size}/$nFiles")

    // persisted skipping index: save the footer walk once, serve pruning
    // from the table — identical kept set and rows
    assert(Layout.loadStats(spark, zDir).isEmpty,
      "no index saved yet: the footer walk is the fallback")
    Layout.saveStats(spark, zDir, Seq("x", "y"))
    val saved = Layout.loadStats(spark, zDir)
    assert(saved.exists(_.map(_.file).distinct.size == nFiles))
    val (sScan, sKept, sTotal) = Layout.prunedScan(spark, zDir, box)
    assert(sKept.toSet == zKept.toSet && sTotal == zTotal,
      "stats-table pruning must equal the footer walk")
    assert(sScan.select("id").collect().map(_.getLong(0)).toSet == full,
      "stats-table pruned scan changed the result")

    // transaction-log semantics: a data file added behind the index's
    // back is INVISIBLE until stats are re-saved — the saved table
    // defines the table, exactly like a lakehouse log
    val firstPart = new java.io.File(zDir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(firstPart.toPath,
      new java.io.File(zDir, "part-zz-stale.snappy.parquet").toPath)
    val (_, lateKept, lateTotal) = Layout.prunedScan(spark, zDir, box)
    assert(lateTotal == nFiles && lateKept.toSet == zKept.toSet,
      "a file outside the saved index leaked into the pruned scan")
    // ... and a re-saved index admits it
    Layout.saveStats(spark, zDir, Seq("x", "y"))
    val (_, _, afterTotal) = Layout.prunedScan(spark, zDir, box)
    assert(afterTotal == nFiles + 1,
      "re-saving the index must admit the new file")
  }

  test("zValueN: n-column interleave places column j's bit i at i*n+j, " +
       "and the 2-column form is its n=2 instance") {
    val df = Seq((1L, 1L, 1L), (2L, 0L, 1L), (3L, 5L, 2L))
      .toDF("a", "b", "c")
    val r3 = df.select(
      Layout.zValueN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .as[Long].collect()
    // (1,1,1): bit 0 of each -> positions 0,1,2 -> 0b111 = 7
    assert(r3(0) == 7L)
    // (2,0,1): a bit1 -> pos 3; c bit0 -> pos 2 -> 8 + 4 = 12
    assert(r3(1) == 12L)
    // (3,5,2): a bits{0,1} -> pos 0,3; b bits{0,2} -> pos 1,7;
    // c bit1 -> pos 5 -> 1+8+2+128+32 = 171
    assert(r3(2) == 171L)
    // n=2 delegation: zValue == zValueN(Seq(x, y))
    val pairs = Seq((173L, 92L), (0L, 255L), (255L, 0L), (37L, 201L))
      .toDF("x", "y")
    val same = pairs.select(
        (Layout.zValue(col("x"), col("y"), 8) ===
          Layout.zValueN(Seq(col("x"), col("y")), 8)).as("eq"))
      .as[Boolean].collect()
    assert(same.forall(identity))
    intercept[IllegalArgumentException](
      Layout.zValueN(Seq(col("x"), col("y")), 32))
  }

  test("3-D Z-layout: a 3-D box predicate touches fewer files than any " +
       "2-D layout of the same data") {
    // enough files that the per-dimension resolution survives the third
    // axis (512^(1/3) = 8 cells/dim): with too few files a 2-D layout's
    // finer in-plane resolution can win — n-D clustering pays off at the
    // file counts real tables have
    val pts = (1 to 32768).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      val y = (i * 40503L % 10000).toDouble / 10000.0
      val w = (i * 9176L % 10000).toDouble / 10000.0
      (i.toLong, x, y, w)
    }.toDF("id", "x", "y", "w")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 1.0, 8))
      .withColumn("wq", Layout.quantize(col("w"), 0.0, 1.0, 8))
      .localCheckpoint(true)
    val nFiles = 512
    def touched(z: org.apache.spark.sql.Column) = {
      val stats = Layout.fileStats(
        Layout.zorderFileAssignment(pts, z, col("id"), nFiles),
        Seq("x", "y", "w"))
      Layout.filesTouched(stats,
        Map("x" -> (0.4, 0.6), "y" -> (0.4, 0.6), "w" -> (0.4, 0.6)))
    }
    val t3 = touched(Layout.zValueN(
      Seq(col("xq"), col("yq"), col("wq")), 8))
    val t2xy = touched(Layout.zValue(col("xq"), col("yq"), 8))
    val t2xw = touched(Layout.zValue(col("xq"), col("wq"), 8))
    val t2yw = touched(Layout.zValue(col("yq"), col("wq"), 8))
    assert(t3 < Seq(t2xy, t2xw, t2yw).min,
      s"3-D layout must beat every 2-D layout on a 3-D box: " +
        s"3d=$t3, 2d=(${t2xy}, ${t2xw}, ${t2yw})")
    assert(t3 < nFiles / 8, s"3-D box must skip most files, touched $t3")
  }

  test("graft-zorder write path: df.write.format lays out, quantizes " +
       "from data-derived bounds, saves the index; the read path prunes " +
       "it; append refuses build-time options") {
    val pts = (1 to 8192).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      val y = (i * 40503L % 10000).toDouble / 10000.0
      val w = (i * 9176L % 10000).toDouble / 10000.0
      (i.toLong, x, y, w)
    }.toDF("id", "x", "y", "w")
    val dir = java.nio.file.Files.createTempDirectory("zwrite").toString + "/t"
    pts.write.format("graft-zorder")
      .option("zcols", "x,y,w").option("bits", "8")
      .option("nFiles", "32").option("tieCol", "id")
      .mode("overwrite").save(dir)
    // index saved at write time, covering all files
    val stats = Layout.loadStats(spark, dir)
    assert(stats.exists(_.map(_.file).distinct.size == 32),
      "write must save a skipping index over every written file")
    // read path: row-identical under a box, with real pruning
    def boxed = spark.read.format("graft-zorder").load(dir)
      .filter(col("x").between(0.4, 0.6) && col("y").between(0.4, 0.6) &&
        col("w").between(0.4, 0.6))
      .select("id")
    val got = boxed.collect().map(_.getLong(0)).toSet
    val want = pts
      .filter(col("x").between(0.4, 0.6) && col("y").between(0.4, 0.6) &&
        col("w").between(0.4, 0.6))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty,
      "write-path layout changed the data")
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(total == 32 && kept < 32,
      s"3-D box must prune the written layout, opened $kept/$total")
    // build params are fixed at build time: restating them on an append
    // is refused rather than silently ignored
    val e = intercept[Exception] {
      pts.limit(10).write.format("graft-zorder")
        .option("zcols", "x,y,w").mode("append").save(dir)
    }
    assert(e.getMessage.contains("fixed at build time"), e.getMessage)
  }

  test("graft-zorder read path: a plain .filter() on the registered " +
       "source pushes its predicates, prunes from the saved index, and " +
       "is row-identical to the full scan") {
    val pts = (1 to 4096).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      val y = (i * 40503L % 10000).toDouble / 10000.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 1.0, 8))
    val nFiles = 16
    val dir = java.nio.file.Files.createTempDirectory("zsrc").toString + "/z"
    Layout.zorderWrite(pts,
      Layout.zValue(col("xq"), col("yq"), 8), col("id"), nFiles, dir)
    Layout.saveStats(spark, dir, Seq("x", "y"))

    def boxed = spark.read.format("graft-zorder").load(dir)
      .filter(col("x").between(0.45, 0.55) && col("y").between(0.45, 0.55))
      .select("id")
    // predicates reach the source: the scan node reports them pushed —
    // and with the extensions installed the scan is the NATIVE parquet
    // reader over the pruned file list (ZOrderPruneRule), not the DSv1
    // RDD[Row] bridge paying a per-row conversion
    val plan = boxed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(x,0.45"),
      s"filters must push into the graft-zorder scan:\n$plan")
    assert(plan.contains("FileScan parquet") &&
      !plan.contains("RowDataSourceScan"),
      s"scan must upgrade to the native parquet reader:\n$plan")
    val got = boxed.collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(dir)
      .filter(col("x").between(0.45, 0.55) && col("y").between(0.45, 0.55))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == full && full.nonEmpty,
      "source read path changed the scan result")
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(total == nFiles, s"index must cover all $nFiles files, saw $total")
    assert(kept <= nFiles / 2,
      s"a 1% box must skip most files through the source, opened $kept/$total")
    // an unfiltered read opens everything and stays row-complete
    val all = spark.read.format("graft-zorder").load(dir).count()
    assert(all == 4096L, s"unfiltered source read lost rows: $all")
    assert(graft.sources.ZOrderSource.lastScan.get()._1 == nFiles,
      "no predicate -> no skipping")
  }

  test("disjunctive pruning: an IN(3 keys) probe and an OR-of-two-ranges " +
       "each open only the files their interval UNION touches, " +
       "row-identical to the full scan; a NULL In member disables the " +
       "bound conservatively") {
    // 1-D layout on x = id: 16 files, each covering ~256 consecutive x
    val pts = (1 to 4096).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
      .withColumn("xq", Layout.quantize(col("x"), 1.0, 4096.0, 8))
    val nFiles = 16
    val dir = java.nio.file.Files.createTempDirectory("zdisj").toString + "/z"
    Layout.zorderWrite(pts, col("xq").cast("long"), col("id"), nFiles, dir)
    Layout.saveStats(spark, dir, Seq("x"))
    def src = spark.read.format("graft-zorder").load(dir)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet

    // IN(3 far-apart keys): 3 point intervals → ≤ 3 files opened
    val inProbe = src.filter(col("x").isin(100.0, 2000.0, 3900.0))
    assert(ids(inProbe) == Set(100L, 2000L, 3900L))
    val (keptIn, totalIn) = graft.sources.ZOrderSource.lastScan.get()
    assert(totalIn == nFiles, s"index must cover $nFiles files, saw $totalIn")
    assert(keptIn <= 3,
      s"IN(3 keys) must open at most 3 of $nFiles files, opened $keptIn")

    // OR of two disjoint ranges: two interval boxes → ≤ 4 files
    val orProbe = src.filter(
      (col("x") >= 100.0 && col("x") < 200.0) ||
        (col("x") >= 3800.0 && col("x") < 3900.0))
    val wantOr = (100L until 200L).toSet ++ (3800L until 3900L).toSet
    assert(ids(orProbe) == wantOr)
    val (keptOr, _) = graft.sources.ZOrderSource.lastScan.get()
    assert(keptOr <= 4,
      s"OR-of-two-ranges must open ≤ 4 of $nFiles files, opened $keptOr")

    // a conjunct on the SAME column intersects the union: the second
    // range drops entirely
    val both = src.filter(
      ((col("x") >= 100.0 && col("x") < 200.0) ||
        (col("x") >= 3800.0 && col("x") < 3900.0)) &&
        col("x") < 250.0)
    assert(ids(both) == (100L until 200L).toSet)
    assert(graft.sources.ZOrderSource.lastScan.get()._1 <= 2,
      "intersected union must prune the second range's files")

    // mixed-column OR derives nothing — full (conservative) scan, exact
    val mixed = src.filter(col("x") < 100.0 || col("id") > 4000L)
    assert(ids(mixed) == ((1L until 100L).toSet ++ (4001L to 4096L).toSet))

    // a NULL member poisons the In-list: no bound, all files, exact
    val withNull = src.filter(col("x").isin(100.0, null))
    assert(ids(withNull) == Set(100L))
    assert(graft.sources.ZOrderSource.lastScan.get()._1 == nFiles,
      "NULL In member must disable the bound, not mis-prune")
  }

  // ------------------------------------------- incremental maintenance

  private def corpus(n: Int) = (1 to n).map { i =>
    val x = (i * 2654435761L % 10000).toDouble / 10000.0
    val y = (i * 40503L % 10000).toDouble / 10000.0
    (i.toLong, x, y)
  }.toDF("id", "x", "y")

  private def boxIds(df: org.apache.spark.sql.DataFrame) = df
    .filter(col("x").between(0.45, 0.55) && col("y").between(0.45, 0.55))
    .select("id").collect().map(_.getLong(0)).toSet

  test("append maintains the layout: the delta becomes visible through " +
       "ONE index commit, pruning still fires over old+new files, and " +
       "results equal the full-table baseline") {
    val all = corpus(8192)
    val dir = java.nio.file.Files.createTempDirectory("zapp").toString + "/t"
    val nFiles = 32
    all.filter(col("id") % 3 =!= 0).write.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8")
      .option("nFiles", nFiles.toString).option("tieCol", "id")
      .mode("overwrite").save(dir)
    // the build wrote a manifest: the layout is maintainable
    val mf0 = Layout.readLayoutManifest(spark, dir)
    assert(mf0.exists(m => m.zcols == Seq("x", "y") && m.nFiles == nFiles),
      s"build must persist the layout manifest, got $mf0")

    all.filter(col("id") % 3 === 0).write.format("graft-zorder")
      .mode("append").save(dir)

    // every row visible, results equal the full-table baseline
    def boxed = spark.read.format("graft-zorder").load(dir)
      .filter(col("x").between(0.45, 0.55) && col("y").between(0.45, 0.55))
      .select("id")
    assert(boxed.collect().map(_.getLong(0)).toSet == boxIds(all),
      "append changed the box-query result")
    assert(spark.read.format("graft-zorder").load(dir).count() == 8192L,
      "append lost rows")
    // the index covers the delta files and still skips
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(total > nFiles,
      s"delta files must join the index: $total files indexed")
    val stats = Layout.loadStats(spark, dir).get
    assert(stats.map(_.rows).sum == 8192L,
      "index row counts must cover build + delta")
    boxed.collect()
    val (keptBox, totalBox) = graft.sources.ZOrderSource.lastScan.get()
    assert(keptBox < totalBox,
      s"pruning must still fire after append: $keptBox/$totalBox")
    // an empty delta is a no-op, not a new epoch of noise
    all.limit(0).write.format("graft-zorder").mode("append").save(dir)
    assert(Layout.loadStats(spark, dir).get.map(_.rows).sum == 8192L)
  }

  test("crash-window + compact: data files written without an index " +
       "commit stay INVISIBLE (never adopted); compact rewrites to " +
       "nFiles, garbage-collects orphans and superseded files, keeps " +
       "one committed epoch, and re-derives drifted bounds") {
    val base = corpus(8192)
    val dir = java.nio.file.Files.createTempDirectory("zcomp").toString + "/t"
    val nFiles = 16
    base.write.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8")
      .option("nFiles", nFiles.toString).option("tieCol", "id")
      .mode("overwrite").save(dir)
    val want = boxIds(base)

    // simulate a writer that crashed AFTER its data-file job committed
    // but BEFORE the index commit: files exist, index doesn't know them
    val orphan = Seq((900001L, 0.5, 0.5), (900002L, 0.51, 0.49))
      .toDF("id", "x", "y")
    Layout.zorderWrite(orphan, col("id"), col("id"), 1, dir, mode = "append")
    def served = spark.read.format("graft-zorder").load(dir)
      .filter(col("x").between(0.45, 0.55) && col("y").between(0.45, 0.55))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(served == want,
      "uncommitted orphan files leaked into the served result")

    // a real append on top (with out-of-range values: bounds drift)
    val delta = Seq((910001L, 2.0, 3.0), (910002L, 0.5, 0.5))
      .toDF("id", "x", "y")
    Layout.appendDelta(delta, dir)
    assert(served == want + 910002L, "committed delta must serve")
    // ... the orphan is still not adopted by the append's commit
    assert(spark.read.format("graft-zorder").load(dir).count() == 8194L)

    val mfBefore = Layout.readLayoutManifest(spark, dir).get
    Layout.compact(spark, dir)

    // results unchanged; orphan rows gone from the DIRECTORY too (VACUUM)
    assert(served == want + 910002L, "compact changed the served result")
    assert(spark.read.parquet(dir).count() == 8194L,
      "compact must vacuum orphan + superseded files from the directory")
    assert(Layout.listDataFiles(spark, dir).size == nFiles,
      "compact must restore the manifest file count")
    // exactly one committed epoch remains
    val epochs = new java.io.File(s"$dir/_graft_stats").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(epochs.length == 1, s"stale epochs must be GC'd: ${epochs.toSeq}")
    // bounds re-derived to cover the drifted delta
    val mfAfter = Layout.readLayoutManifest(spark, dir).get
    assert(mfAfter.bounds != mfBefore.bounds &&
      mfAfter.bounds(0)._2 >= 2.0 && mfAfter.bounds(1)._2 >= 3.0,
      s"compact must re-derive bounds: ${mfBefore.bounds} -> ${mfAfter.bounds}")
    // and the compacted layout still prunes
    served
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(total == nFiles && kept < total,
      s"compacted layout must prune: $kept/$total")
  }

  test("a layout Z-ordered on a TIMESTAMP column prunes through the " +
       "registered source: the pushed filter's external Timestamp value " +
       "converts to the micros unit parquet footer statistics use") {
    val pts = (1 to 4096).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
          .plusSeconds(i * 40503L % 86400)), x)
    }.toDF("id", "ts", "x")
    val dir = java.nio.file.Files.createTempDirectory("zts").toString + "/t"
    pts.write.format("graft-zorder")
      .option("zcols", "ts,x").option("bits", "8")
      .option("nFiles", "16").option("tieCol", "id")
      .mode("overwrite").save(dir)
    val lo = java.sql.Timestamp.valueOf("2024-01-01 02:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-01 04:00:00")
    val boxed = spark.read.format("graft-zorder").load(dir)
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi) &&
        col("x").between(0.4, 0.6))
      .select("id")
    val got = boxed.collect().map(_.getLong(0)).toSet
    val want = pts.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi) &&
        col("x").between(0.4, 0.6))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want && want.nonEmpty,
      "timestamp-clustered read changed the result")
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(total == 16 && kept < total,
      s"a timestamp range must prune the ts-clustered layout: $kept/$total")
  }

  test("legacy flat stats tables (pre-epoch format) still load and " +
       "serve pruning") {
    val pts = corpus(2048)
    val dir = java.nio.file.Files.createTempDirectory("zleg").toString + "/t"
    Layout.zorderWrite(pts,
      Layout.zValue(Layout.quantize(col("x"), 0.0, 1.0, 8),
        Layout.quantize(col("y"), 0.0, 1.0, 8), 8), col("id"), 8, dir)
    Layout.saveStats(spark, dir, Seq("x", "y"))
    // rewrite the index in the legacy layout: parquet directly under
    // _graft_stats, no pointer, no epoch dirs
    val statsDir = new java.io.File(s"$dir/_graft_stats")
    val epochDir = statsDir.listFiles().find(_.getName.startsWith("epoch=")).get
    epochDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(statsDir, f.getName).toPath)
    }
    assert(new java.io.File(statsDir, "_CURRENT").delete())
    epochDir.listFiles().foreach(_.delete()); epochDir.delete()
    val loaded = Layout.loadStats(spark, dir)
    assert(loaded.exists(_.map(_.file).distinct.size == 8),
      s"legacy flat stats must load: $loaded")
    val (scan, kept, total) = Layout.prunedScan(spark, dir,
      Map("x" -> (0.45, 0.55), "y" -> (0.45, 0.55)))
    assert(total == 8 && kept.size < 8, "legacy stats must prune")
    assert(scan.select("id").collect().map(_.getLong(0)).toSet ==
      boxIds(pts), "legacy-stats pruned scan changed the result")

    // a crashed FIRST epoch commit next to the legacy table (epoch dir
    // written, pointer move never happened) must stay invisible: the
    // legacy read is file-explicit, never a directory scan that would
    // partition-discover — or die on conflicting structures with — the
    // orphan epoch dir
    val orphanDir = new java.io.File(statsDir, "epoch=0")
    assert(orphanDir.mkdirs())
    statsDir.listFiles().filter(_.getName.endsWith(".parquet")).take(1)
      .foreach { f => java.nio.file.Files.copy(f.toPath,
        new java.io.File(orphanDir, f.getName).toPath) }
    val reloaded = Layout.loadStats(spark, dir)
    assert(reloaded.exists(_.map(_.file).distinct.size == 8),
      s"an uncommitted orphan epoch dir broke the legacy read: $reloaded")
  }

  test("pruneReport: per-box kept counts agree with filesTouched, an " +
       "out-of-range box reports zero files AND zero rows, totals ride " +
       "every row") {
    val pts = (1 to 1000).map { i =>
      (i.toLong, (i % 100).toDouble, (i % 7).toDouble)
    }.toDF("id", "x", "y")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 100.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 7.0, 8))
    val stats = Layout.fileStats(Layout.zorderFileAssignment(pts,
      Layout.zValue(col("xq"), col("yq"), 8), col("id"), nFiles = 8),
      Seq("x", "y")).cache()
    try {
      val boxes = Seq(
        "hit" -> Map("x" -> (10.0, 30.0), "y" -> (1.0, 3.0)),
        "miss" -> Map("x" -> (500.0, 600.0)))
      val rep = Layout.pruneReport(stats, boxes).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val (hk, ht, hr, hrt) = rep("hit")
      assert(hk == Layout.filesTouched(stats, boxes.head._2),
        "files_kept must agree with filesTouched")
      assert(ht == 8L && hrt == 1000L, s"totals wrong: $rep")
      assert(hr > 0L && hr <= 1000L)
      assert(rep("miss") == ((0L, 8L, 0L, 1000L)),
        s"an out-of-range box must report zero kept: ${rep("miss")}")
    } finally stats.unpersist()
  }

  test("bloom file skipping: zero false negatives over every id, point " +
       "probes keep ~1 file where min/max boxes keep ALL, batch probe " +
       "matches per-id truth") {
    val pts = (1 to 4000).map { i =>
      (i.toLong, (i * 2654435761L % 10000).toDouble / 10000.0)
    }.toDF("id", "x")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
    // layout clustered on x: id is uniform across files — the min/max
    // story for an id probe is "keep everything"
    val assigned = Layout.zorderFileAssignment(pts, col("xq"), col("id"),
      nFiles = 16).cache()
    val idStats = Layout.fileStats(assigned, Seq("id")).cache()
    val bloom = Layout.fileBloom(assigned, "id").cache()
    try {
      // min/max boxes cannot prune a point probe on the unsorted id
      assert(Layout.filesTouched(idStats,
        Map("id" -> (1234.0, 1234.0))) == 16L,
        "fixture broke: min/max should keep all files for an id probe")
      // truth: where each id actually lives (exactly one file)
      val truth = assigned.select(col("id"), col("file_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // ALL 4000 ids probed at once — no false negatives, tiny keep sets
      val kept = Layout.bloomProbe(bloom, pts.select("id"), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      pts.select("id").collect().map(_.getLong(0)).foreach { id =>
        assert(kept(id).contains(truth(id)),
          s"FALSE NEGATIVE: id $id lives in file ${truth(id)}, kept ${kept(id)}")
      }
      val meanKept = kept.values.map(_.size).sum.toDouble / kept.size
      info(f"mean files kept per point probe: $meanKept%.2f of 16")
      assert(meanKept < 2.0,
        f"bloom pruning degraded: $meanKept%.2f files kept on average")
    } finally { assigned.unpersist(); idStats.unpersist(); bloom.unpersist() }
  }

  test("bloom sidecar on the maintained store: equality probes through " +
       "the registered read path open ~1 of 16 files, append leaves " +
       "uncovered files conservatively kept, rows stay exact") {
    import graft.sources.ZOrderSource
    val pts = (1 to 4000).map { i =>
      (i.toLong, (i * 2654435761L % 10000).toDouble / 10000.0,
        (i * 40503L % 10000).toDouble / 10000.0)
    }.toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_bsc_")
      .toFile.getAbsolutePath
    pts.filter(col("id") <= 3000L).write.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8").option("nFiles", "16")
      .option("tieCol", "id").mode("overwrite").save(dir)

    def readEq(id: Long) = {
      val got = spark.read.format("graft-zorder").load(dir)
        .filter(col("id") === id).select("id", "x").collect()
      (got.map(_.getLong(0)).toSeq, ZOrderSource.lastScan.get())
    }
    // no sidecar yet: the id interval keeps every file
    val (r0, (k0, t0)) = readEq(1234L)
    assert(r0 == Seq(1234L) && k0 == t0 && t0 == 16,
      s"pre-sidecar equality must full-scan: kept $k0/$t0")

    Layout.saveBloom(spark, dir, "id")
    val (r1, (k1, _)) = readEq(1234L)
    assert(r1 == Seq(1234L), "bloom-narrowed read lost the row")
    assert(k1 <= 2, s"bloom must narrow the equality probe: kept $k1/16")
    // IN-list: union of members' candidate files
    spark.read.format("graft-zorder").load(dir)
      .filter(col("id").isin(7L, 123L, 2999L)).select("id")
      .collect()
    val (kIn, _) = ZOrderSource.lastScan.get()
    assert(kIn <= 6, s"IN-probe must stay narrowed: kept $kIn/16")
    // a probe for an id NOT in the store: bloom may drop every file
    val (rMiss, (kMiss, _)) = readEq(999999L)
    assert(rMiss.isEmpty && kMiss <= 1,
      s"an absent id should prune (almost) everything: kept $kMiss")

    // append AFTER the sidecar: new files are uncovered -> kept
    // conservatively, so delta rows remain findable (no false negatives)
    pts.filter(col("id") > 3000L).write.format("graft-zorder")
      .mode("append").save(dir)
    val (r2, (k2, t2)) = readEq(3456L)
    assert(r2 == Seq(3456L),
      "a delta row must survive bloom narrowing (uncovered files kept)")
    assert(k2 < t2, s"covered files still narrow after append: $k2/$t2")
    // rebuilding the sidecar restores coverage over the delta files
    Layout.saveBloom(spark, dir, "id")
    val (r3, (k3, _)) = readEq(3456L)
    assert(r3 == Seq(3456L) && k3 <= 2,
      s"rebuilt sidecar must cover the delta: kept $k3")

    // COMPACT replaces every data file — it must refresh the sidecar
    // itself, or all bloom pruning silently degrades to full keeps
    Layout.compact(spark, dir)
    val (r4, (k4, t4)) = readEq(1234L)
    assert(r4 == Seq(1234L), "post-compact bloom read lost the row")
    assert(k4 <= 2 && k4 < t4,
      s"compact must refresh the sidecar, not strand it: kept $k4/$t4")
  }

  test("sharded bloom sidecar: same decisions as the inline format " +
       "through the real read path, torn commit reads as no sidecar") {
    import graft.sources.ZOrderSource
    val pts = (1 to 4000).map { i =>
      (i.toLong, (i * 2654435761L % 10000).toDouble / 10000.0,
        (i * 40503L % 10000).toDouble / 10000.0)
    }.toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_bshard_")
      .toFile.getAbsolutePath
    pts.write.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8").option("nFiles", "16")
      .option("tieCol", "id").mode("overwrite").save(dir)

    def readEq(id: Long) = {
      val got = spark.read.format("graft-zorder").load(dir)
        .filter(col("id") === id).select("id").collect()
      (got.map(_.getLong(0)).toSeq, ZOrderSource.lastScan.get())
    }
    // inline build first: record its decisions
    Layout.saveBloom(spark, dir, "id")
    val inline = Layout.loadBloom(spark, dir, "id").get
    assert(inline.isInstanceOf[Layout.InlineBloomSidecar])
    val (ri, (ki, _)) = readEq(1234L)
    // force the SHARDED format on the same store: identical decisions
    Layout.saveBloom(spark, dir, "id", shardWords = 64)
    val sharded = Layout.loadBloom(spark, dir, "id").get
    assert(sharded.isInstanceOf[Layout.ShardedBloomSidecar],
      "shardWords=64 must force the sharded format")
    val files = Layout.loadStats(spark, dir).get.map(_.file).distinct
    for (f <- files; v <- Seq(7L, 1234L, 2999L, 999999L))
      assert(sharded.mayContain(f, v) == inline.mayContain(f, v),
        s"decision drift on ($f, $v)")
    val (rs, (ks, _)) = readEq(1234L)
    assert(rs == ri && ks == ki,
      s"sharded read path drifted: rows $rs vs $ri, kept $ks vs $ki")

    // torn two-step commit (header committed, shard dir from another
    // build): loadBloom must answer None — no narrowing, never a skip
    val meta = new java.io.File(s"$dir/_graft_stats/bloom_id.d/_meta")
    java.nio.file.Files.writeString(meta.toPath, "9999 torn-build")
    new java.io.File(s"$dir/_graft_stats/bloom_id.d/._meta.crc").delete()
    assert(Layout.loadBloom(spark, dir, "id").isEmpty,
      "torn sharded commit must read as no sidecar")
    val (rt, (kt, tt)) = readEq(1234L)
    assert(rt == Seq(1234L) && kt == tt,
      "with a torn sidecar the probe must keep every file")
  }

  test("sharded bloom sidecar at 10^4 files: probe loads at most k " +
       "shards (bounded memory), decisions match the driver-side truth") {
    val (n, mBits, k) = (10000, 4096, 5)
    // synthetic store: file i holds exactly value i; its sidecar bitmap
    // is value i's k positions
    def fname(i: Int) = f"/fake/store/f$i%05d.parquet"
    val rows = (0 until n).flatMap { i =>
      Layout.bloomDriverPositions(i.toLong, mBits, k)
        .map(p => (fname(i), p / 63, 1L << (p % 63).toInt))
    }.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((f, w), ts) => (f, w, ts.map(_._3).reduce(_ | _)) }
    val words = rows.toDF("file", "word", "bits")
    val dir = java.nio.file.Files.createTempDirectory("graft_b10k_")
      .toFile.getAbsolutePath
    // ~41 shards at this shardWords: a point probe may touch only k
    Layout.writeShardedBloom(spark, dir, "id", mBits, k, words,
      (0 until n).map(fname), shardWords = 1 << 14)

    val sc = Layout.loadBloom(spark, dir, "id").get
      .asInstanceOf[Layout.ShardedBloomSidecar]
    // no false negatives, and a probe value keeps almost no files
    for (i <- 0 until n by 97)
      assert(sc.mayContain(fname(i), i.toLong), s"FALSE NEGATIVE at $i")
    assert(sc.loadedShards <= 64, "cache must stay bounded")
    // fresh sidecar: ONE point probe against every file loads at most
    // k word-bucket shards — memory independent of the 10^4 file count
    val fresh = Layout.loadBloom(spark, dir, "id").get
      .asInstanceOf[Layout.ShardedBloomSidecar]
    val keptFiles = (0 until n).count(i => fresh.mayContain(fname(i), 777L))
    assert(fresh.loadedShards <= k,
      s"a point probe loaded ${fresh.loadedShards} shards, > k=$k")
    assert(keptFiles <= 5,
      s"probe for one value kept $keptFiles of $n files")
    // decisions equal the driver-side truth for a sampled cross product
    for (i <- 0 until n by 509; v <- Seq(3L, 4242L, i.toLong)) {
      val fileBits = Layout.bloomDriverPositions(i.toLong, mBits, k).toSet
      val want = Layout.bloomDriverPositions(v, mBits, k)
        .forall(fileBits.contains)
      assert(sc.mayContain(fname(i), v) == want,
        s"decision mismatch at file $i value $v")
    }
    // an unknown file is conservatively kept
    assert(sc.mayContain("/fake/store/not-covered.parquet", 1L))
  }

  test("sharded bloom sidecar survives a concurrent rebuild mid-scan: " +
       "a swapped or in-flight build reads as 'keep everything', " +
       "never a wrong skip") {
    val (n, mBits, k) = (100, 4096, 5)
    def fname(i: Int) = f"/fake/store2/f$i%03d.parquet"
    def body(salt: Long) = (0 until n).flatMap { i =>
      Layout.bloomDriverPositions(i.toLong + salt, mBits, k)
        .map(p => (fname(i), p / 63, 1L << (p % 63).toInt))
    }.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((f, w), ts) => (f, w, ts.map(_._3).reduce(_ | _)) }
      .toDF("file", "word", "bits")
    val dir = java.nio.file.Files.createTempDirectory("graft_bswap_")
      .toFile.getAbsolutePath
    def rebuild(salt: Long) = Layout.writeShardedBloom(spark, dir, "id",
      mBits, k, body(salt), (0 until n).map(fname), shardWords = 256)

    rebuild(0L)
    val sc = Layout.loadBloom(spark, dir, "id").get
      .asInstanceOf[Layout.ShardedBloomSidecar]
    // a held sidecar answers correctly against its own build
    assert(sc.mayContain(fname(7), 7L) && !sc.isStale)
    val skips = (0 until n).count(i => !sc.mayContain(fname(i), 7L))
    assert(skips > 90, s"sanity: build 0 skips ($skips) most files for 7")

    // a concurrent saveBloom rerun swaps the directory to a NEW buildId
    // while a FRESH reader (empty shard cache) still holds the old
    // header: every uncached shard load must detect the foreign build
    // and flip the sidecar to keep-everything — the old code read the
    // new body under the old fileIdx map and could wrongly skip
    val fresh = Layout.loadBloom(spark, dir, "id").get
      .asInstanceOf[Layout.ShardedBloomSidecar]
    rebuild(5000L)
    assert((0 until n).forall(i => fresh.mayContain(fname(i), 7L)),
      "a reader holding a superseded build must keep every file")
    assert(fresh.isStale, "the foreign build must mark the sidecar stale")

    // shards CACHED before the rerun: a warm reader must not keep
    // skipping from the superseded build until an uncached load flips
    // stale — every would-be skip re-verifies the build first, so the
    // FIRST post-swap probe already answers keep-everything
    val warm = Layout.loadBloom(spark, dir, "id").get
      .asInstanceOf[Layout.ShardedBloomSidecar]
    assert((0 until n).count(i => !warm.mayContain(fname(i), 7L)) > 90,
      "sanity: warm the shard cache with build-1 skips")
    assert(!warm.isStale && warm.loadedShards > 0)
    rebuild(7000L)
    assert((0 until n).forall(i => warm.mayContain(fname(i), 7L)),
      "a warm reader must keep every file from the first post-swap probe")
    assert(warm.isStale && warm.loadedShards == 0,
      "the failed skip-verify must flip stale and drop cached shards")

    // the delete→rename window itself: shard dir momentarily absent
    val fresh2 = Layout.loadBloom(spark, dir, "id").get
      .asInstanceOf[Layout.ShardedBloomSidecar]
    val (fs, shardDir) = graft.sources.Bundle.fsPath(
      s"$dir/_graft_stats/bloom_id.d")
    assert(fs.delete(shardDir, true))
    assert((0 until n).forall(i => fresh2.mayContain(fname(i), 7L)),
      "an in-flight swap (absent shard dir) must keep every file")
    assert(fresh2.isStale)
  }

  test("hilbert index: bijective over the full grid, every consecutive " +
       "pair is a grid NEIGHBOR (the locality Z-order lacks), and the " +
       "inverse walk round-trips") {
    val bits = 5
    val n = 1 << bits
    val got = (0 until n * n).map(i => (i.toLong % n, i.toLong / n))
      .toDF("x", "y")
      .withColumn("d", Layout.hilbertValue(col("x"), col("y"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got.values.toSet.size == n * n && got.values.min == 0L &&
      got.values.max == (n * n - 1).toLong, "not a bijection onto 0..n²-1")
    // unit-step adjacency along the whole curve — the defining Hilbert
    // property; the Morton walk JUMPS every 2^k cells and fails this
    val byD = got.map(_.swap)
    (1 until n * n).foreach { d =>
      val (x0, y0) = byD((d - 1).toLong); val (x1, y1) = byD(d.toLong)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"curve jumped at d=$d: ($x0,$y0)→($x1,$y1)")
    }
    // d2xy is the independent inverse anchor
    (0 until n * n).foreach { d =>
      val (x, y) = graft.functions.HilbertExpressions.d2xy(bits, d.toLong)
      assert(got((x, y)) == d.toLong, s"inverse mismatch at d=$d")
    }
    // clamp contract: out-of-range cells behave as edge cells
    val clamped = Seq((-3L, 99L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), bits).as("d"))
      .collect()(0).getLong(0)
    assert(clamped == got((0L, (n - 1).toLong)), "clamp must hit the edge cell")
  }

  test("graft_hilbert2/graft_hilbertn: NULL bits literal is a clear " +
       "analysis error, not an NPE") {
    for (sql <- Seq(
        "SELECT graft_hilbert2(1L, 2L, CAST(NULL AS INT))",
        "SELECT graft_hilbertn(1L, 2L, 3L, CAST(NULL AS INT))")) {
      val ex = intercept[Exception] { spark.sql(sql).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("non-null integer literal")),
        s"wanted the descriptive bits error, got: $ex")
    }
  }

  test("filesTouched keeps files with NULL/NaN stats — mirrors the " +
       "conservative read path") {
    // file 1 has real stats outside the box; file 2 has NULL mins (e.g.
    // an all-NULL column chunk); file 3 has NaN stats. A reader must
    // open 2 and 3 — the report may not understate them.
    val stats = Seq(
      (1L, 10L, 5.0, 6.0), (2L, 10L, Double.NaN, Double.NaN))
      .toDF("file_id", "n", "min_x", "max_x")
      .unionByName(Seq((3L, 10L)).toDF("file_id", "n")
        .withColumn("min_x", lit(null).cast("double"))
        .withColumn("max_x", lit(null).cast("double")))
    assert(Layout.filesTouched(stats, Map("x" -> (0.0, 1.0))) == 2L)
    // and a box that also takes file 1 counts all three
    assert(Layout.filesTouched(stats, Map("x" -> (4.0, 7.0))) == 3L)
  }

  test("3-D hilbert (Skilling): bijective over the full 8^3 grid, " +
       "unit-step adjacency along the whole curve, inverse round-trip, " +
       "and the written 3-col store serves row-exact") {
    import graft.functions.HilbertExpressions
    val bits = 3; val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong)
    val got = cells.toDF("x", "y", "z")
      .withColumn("d", Layout.hilbertValueN(
        Seq(col("x"), col("y"), col("z")), bits))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got.values.toSet.size == n * n * n && got.values.min == 0L &&
      got.values.max == (n * n * n - 1).toLong, "not a bijection")
    val byD = got.map(_.swap)
    (1 until n * n * n).foreach { d =>
      val (a, b) = (byD((d - 1).toLong), byD(d.toLong))
      val step = math.abs(a._1 - b._1) + math.abs(a._2 - b._2) +
        math.abs(a._3 - b._3)
      assert(step == 1, s"3-D curve jumped at d=$d: $a -> $b")
    }
    (0 until n * n * n).foreach { d =>
      val ax = HilbertExpressions.indexToAxes(bits, 3, d.toLong)
      assert(got((ax(0), ax(1), ax(2))) == d.toLong,
        s"inverse mismatch at d=$d")
    }
    // written 3-col store on the hilbert curve: semantically invisible
    val pts = (1 to 3000).map { i =>
      (i.toLong, (i * 2654435761L % 997).toDouble,
        (i * 40503L % 991).toDouble, (i * 69069L % 983).toDouble)
    }.toDF("id", "x", "y", "z")
    val dir = java.nio.file.Files.createTempDirectory("graft_h3_")
      .toFile.getAbsolutePath
    pts.write.format("graft-zorder")
      .option("zcols", "x,y,z").option("bits", "6").option("nFiles", "16")
      .option("tieCol", "id").option("curve", "hilbert")
      .mode("overwrite").save(dir)
    val box = col("x").between(100.0, 400.0) &&
      col("y").between(100.0, 400.0) && col("z").between(100.0, 400.0)
    val gotIds = spark.read.format("graft-zorder").load(dir).filter(box)
      .select("id").collect().map(_.getLong(0)).toSet
    val expIds = pts.filter(box).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(gotIds == expIds, "3-D hilbert store lost or invented box rows")
    val (kept, total) = graft.sources.ZOrderSource.lastScan.get()
    assert(kept < total, s"a 3-D corner-ish box must skip files: $kept/$total")
  }

  test("hilbert layout: over a battery of boxes it opens no more files " +
       "than the morton layout, and the maintained store (write with " +
       "curve=hilbert, append, pruned read) stays row-exact") {
    // the same pseudo-uniform corpus as the Z-vs-sort test
    val pts = (1 to 8192).map { i =>
      val x = (i * 2654435761L % 10000).toDouble / 10000.0
      val y = (i * 40503L % 10000).toDouble / 10000.0
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
      .withColumn("xq", Layout.quantize(col("x"), 0.0, 1.0, 8))
      .withColumn("yq", Layout.quantize(col("y"), 0.0, 1.0, 8))
    val nFiles = 64
    val hStats = Layout.fileStats(Layout.zorderFileAssignment(pts,
      Layout.hilbertValue(col("xq"), col("yq"), 8), col("id"), nFiles),
      Seq("x", "y")).cache()
    val zStats = Layout.fileStats(Layout.zorderFileAssignment(pts,
      Layout.zValue(col("xq"), col("yq"), 8), col("id"), nFiles),
      Seq("x", "y")).cache()
    try {
      val boxes = for {
        cx <- Seq(0.15, 0.35, 0.55, 0.75)
        cy <- Seq(0.25, 0.5, 0.8)
      } yield Map("x" -> (cx - 0.08, cx + 0.08), "y" -> (cy - 0.08, cy + 0.08))
      val h = boxes.map(Layout.filesTouched(hStats, _)).sum
      val z = boxes.map(Layout.filesTouched(zStats, _)).sum
      info(s"files touched over ${boxes.size} boxes: hilbert $h vs morton $z")
      assert(h <= z,
        s"hilbert opened MORE files than morton over the battery: $h vs $z")
    } finally { hStats.unpersist(); zStats.unpersist() }

    // maintained store: curve persists in the manifest, the append
    // replays it, and the pruned read is semantically invisible
    val dir = java.nio.file.Files.createTempDirectory("graft_hilb_")
      .toFile.getAbsolutePath
    val base = pts.filter(col("id") % 4 =!= 0L).select("id", "x", "y")
    val delta = pts.filter(col("id") % 4 === 0L).select("id", "x", "y")
    base.write.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8").option("nFiles", "16")
      .option("tieCol", "id").option("curve", "hilbert")
      .mode("overwrite").save(dir)
    assert(Layout.readLayoutManifest(spark, dir).exists(_.curve == "hilbert"),
      "curve must persist in the layout manifest")
    delta.write.format("graft-zorder").mode("append").save(dir)
    val (scan, kept, total) = Layout.prunedScan(spark, dir,
      Map("x" -> (0.4, 0.6), "y" -> (0.4, 0.6)))
    val gotIds = scan.filter(col("x").between(0.4, 0.6) &&
        col("y").between(0.4, 0.6))
      .select("id").collect().map(_.getLong(0)).toSet
    val expIds = pts.filter(col("x").between(0.4, 0.6) &&
        col("y").between(0.4, 0.6))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expIds, "pruned hilbert scan lost or invented rows")
    assert(kept.size < total,
      s"a 20% box over the hilbert layout must skip files: $kept/$total")
  }
}
