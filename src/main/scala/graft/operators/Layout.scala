package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Multi-dimensional data layout for scan pruning: Z-ORDER (Morton-curve)
  * clustering — the storage-level answer to "my queries filter on TWO
  * columns and min/max file skipping only works for the sort key". Sorting
  * files by the bit-interleaved Z-value keeps rows close in BOTH
  * dimensions physically together, so each file's (min, max) box is TIGHT
  * in both columns and a range predicate on either (or both) touches a
  * small fraction of files — the same idea behind lakehouse OPTIMIZE
  * ZORDER (Morton 1966; the min/max-skipping effect is the "small
  * materialized aggregates" of Moerkotte 1998).
  *
  * Everything here is deterministic integer/bit arithmetic on quantized
  * cells, so the whole layout — Z-values, file assignment, per-file
  * min/max stats — replays cross-engine in SQL (q127), and the pruning
  * claim itself is spec-asserted by counting touched files under a box
  * predicate (LayoutSpec: Z-order beats the single-column sort layout).
  *
  * Scale shape: one quantize+interleave projection (pure codegen'd bit
  * math), the [[Positional]] distributed global rank (two bounded
  * exchanges — no single-task global window), and a file-grain
  * aggregation. At a real 100 TB table the rank becomes
  * `repartitionByRange(zval)` + per-partition files; the file-stats table
  * IS the skipping index parquet row-group min/max gives for free once
  * data is written in this order.
  */
object Layout {

  /** Quantize a value in [lo, hi] to an integer cell in [0, 2^bits). */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column =
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c - lit(lo)) / lit(hi - lo) * lit(1L << bits)).cast("bigint")))

  /** Bit-interleaved Morton value of n quantized cells: column j takes
    * bit positions j, j+n, j+2n, … — pure shifts/masks, codegen-friendly,
    * SQL-replayable. The 2-column [[zValue]] is the n=2 instance (x on
    * even bits, y on odd).
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zValueN needs at least one column")
    require(n * bits <= 63,
      s"zValueN: $n columns at $bits bits overflow a signed long")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Bit-interleaved Morton value of two quantized cells. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** Hilbert index of two quantized cells — the locality-tighter curve
    * (consecutive cells are always grid-neighbors, so equal-size file
    * ranges have tighter footer boxes than the Morton walk's). Native
    * codegen'd expression ([[graft.functions.HilbertExpressions]]);
    * needs [[graft.plans.GraftExtensions]] registered, exactly like the
    * pruned `graft-zorder` read path.
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_hilbert2",
      x.cast("bigint"), y.cast("bigint"), lit(bits))

  /** n-D Hilbert index (Skilling transpose walk; its n = 2 instance is
    * proven equal to [[hilbertValue]]'s xy2d cell for cell — one curve
    * family across every dimensionality).
    */
  def hilbertValueN(cells: Seq[Column], bits: Int): Column = {
    require(cells.size >= 2, "hilbertValueN needs at least two columns")
    org.apache.spark.sql.functions.call_function("graft_hilbertn",
      cells.map(_.cast("bigint")) :+ lit(bits): _*)
  }

  /** Assign each row to one of `nFiles` equal-size files in Z-value order
    * (ties broken by `tieCol` for determinism): `file_id = (rank-1) ·
    * nFiles / total` over the distributed global rank.
    */
  def zorderFileAssignment(df: DataFrame, zCol: Column, tieCol: Column,
                           nFiles: Int): DataFrame = {
    val (numbered, total) = Positional.numberedWithTotal(
      df.withColumn("_z", zCol), Seq(col("_z"), tieCol), "_rn")
    numbered
      .withColumn("_num", (col("_rn") - 1) * lit(nFiles.toLong))
      .withColumn("file_id", expr(s"_num div ${total}L"))
      .drop("_rn", "_num")
  }

  /** Per-file min/max boxes + row counts over `statCols` — the skipping
    * index a reader consults before touching a file.
    */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame =
    df.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n"),
        statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** How many files a box predicate must read under this layout: files
    * whose [min, max] interval intersects the queried range in EVERY
    * constrained dimension. The measure LayoutSpec uses to assert the
    * Z-layout's pruning beats a single-column sort.
    */
  def filesTouched(stats: DataFrame,
                   ranges: Map[String, (Double, Double)]): Long =
    stats.filter(boxIntersects(ranges)).count()

  private def boxIntersects(ranges: Map[String, (Double, Double)]) =
    ranges.map { case (c, (lo, hi)) =>
      // NULL/NaN stats conservatively intersect — mirrors the read
      // path (ZOrderRelation.mayMatch), which keeps such files, so the
      // report never understates what the reader really opens
      val mn = col(s"min_$c")
      val mx = col(s"max_$c")
      mn.isNull || mx.isNull || isnan(mn) || isnan(mx) ||
        (mx >= lo && mn <= hi)
    }.reduce(_ && _)

  /** Pruning evaluation over a [[fileStats]] frame: for each NAMED box,
    * the files and rows a footer-box skipping reader must keep vs the
    * totals — the harness that turns a layout choice (clustering
    * columns, bits, file count, curve) into measured skipping numbers
    * for a representative query workload BEFORE the layout serves it.
    * One small aggregation per box over the per-file stats table (never
    * the data), unioned; totals ride a broadcast 1-row aggregate.
    *
    * Output: (box, files_kept, files_total, rows_kept, rows_total),
    * one row per box, ordered by the caller.
    */
  def pruneReport(stats: DataFrame,
                  boxes: Seq[(String, Map[String, (Double, Double)])])
      : DataFrame = {
    require(boxes.nonEmpty, "pruneReport needs at least one box")
    val tot = stats.agg(count(lit(1)).as("files_total"),
      sum(col("n")).as("rows_total"))
    boxes.map { case (name, ranges) =>
        stats.filter(boxIntersects(ranges))
          .agg(count(lit(1)).as("files_kept"),
            coalesce(sum(col("n")), lit(0L)).as("rows_kept"))
          .select(lit(name).as("box"), col("files_kept"), col("rows_kept"))
      }
      .reduce(_ unionByName _)
      .crossJoin(org.apache.spark.sql.functions.broadcast(tot))
      .select(col("box"), col("files_kept"), col("files_total"),
        col("rows_kept"), col("rows_total"))
  }

  /** Per-file BLOOM filter over a point-lookup column, as SPARSE bitmap
    * words `(file_id, word, bits)` — the skipping index for the probe
    * shape min/max boxes CANNOT prune: a high-cardinality id column is
    * uniform across files under any layout curve, so every file's
    * [min, max] interval contains every probed id and [[filesTouched]]
    * keeps all of them; a per-file Bloom filter keeps only the files
    * whose bit positions all match (plus a bounded false-positive
    * fraction ~(1 − e^{−kn/m})^k — false NEGATIVES are impossible, so
    * pruning stays exact-complete).
    *
    * Hashing is the engine's PORTABLE md5 double-hash (h1 ‖ h2 = two
    * 60-bit md5 words of `"bf_" + value`; position i = (h1 + i·h2) mod
    * mBits) — deterministic on every engine/executor and replayable in
    * SQL, which is what lets q191 hash-gate the whole index+probe chain.
    * Build is ONE pass: k exploded positions per row, map-side-combined
    * `bit_or` per (file, word); index size ≤ files · mBits/64 rows.
    */
  def fileBloom(assigned: DataFrame, colName: String,
                mBits: Int = 1 << 14, k: Int = 5): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits=$mBits must be a power of two >= 64")
    requireBloomK(k)
    bloomPositions(assigned.select(col("file_id"), col(colName)), colName,
        mBits, k)
      .groupBy(col("file_id"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
  }

  /** k ≤ 8: position i = h1 + i·h2 with h1, h2 < 2^60 — i = 8 is the
    * last multiplier that cannot overflow a signed long. Spark would
    * wrap silently past it but DuckDB RAISES on BIGINT overflow, so a
    * bigger k would break the oracle replay AND diverge cross-engine.
    */
  private def requireBloomK(k: Int): Unit =
    require(k >= 1 && k <= 8, s"k=$k hash functions out of range (1..8)")

  /** (rows × k) positions → (…, word, bit) rows; shared by build+probe.
    * NULL values drop: an equality probe can never be pushed for NULL
    * (that shape is IsNull), and a NULL row would otherwise ride the
    * build as a null position.
    */
  private def bloomPositions(df: DataFrame, colName: String,
                             mBits: Int, k: Int): DataFrame = {
    val v = concat(lit("bf_"), col(colName).cast("string"))
    val h1 = graft.functions.TextFunctions.md5Hash60(v)
    val h2 = graft.functions.TextFunctions.md5Hash60b(v)
    df.filter(col(colName).isNotNull)
      .withColumn("_p", explode(array((0 until k).map(i =>
        pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*)))
      // 63-bit words (bit 63 unused): DuckDB range-checks signed left
      // shifts, and portability is the point of the md5 scheme
      .withColumn("word", expr("_p div 63"))
      .withColumn("bit", expr("shiftleft(1L, cast(pmod(_p, 63) as int))"))
      .drop("_p")
  }

  /** Batch point-probe against a [[fileBloom]] index: for EVERY probe
    * value, the files that may contain it — `(probeCol, file_id)`
    * candidates. Fully distributed (the probe side can be millions of
    * ids): probes reduce to (value, word, mask) rows, join the index on
    * `word` (the index is the small side — broadcast it for big probe
    * sets), and a file survives a probe iff every required word is
    * present with all mask bits set. No false negatives by construction.
    */
  def bloomProbe(bloom: DataFrame, probes: DataFrame, probeCol: String,
                 mBits: Int = 1 << 14, k: Int = 5): DataFrame = {
    requireBloomK(k)
    val need = bloomPositions(probes.select(col(probeCol)).distinct(),
        probeCol, mBits, k)
      .groupBy(col(probeCol), col("word"))
      .agg(expr("bit_or(bit)").as("mask"))
    val nWords = need.groupBy(col(probeCol))
      .agg(count(lit(1)).as("_nw"))
    need.join(bloom, Seq("word"))
      .filter(col("bits").bitwiseAND(col("mask")) === col("mask"))
      .groupBy(col(probeCol), col("file_id"))
      .agg(count(lit(1)).as("_hit"))
      .join(nWords, Seq(probeCol))
      .filter(col("_hit") === col("_nw"))
      .select(col(probeCol), col("file_id"))
  }

  /** A loaded per-file Bloom sidecar. A file the sidecar does not cover
    * is conservatively kept by every probe (appends after the sidecar
    * build are uncovered until [[saveBloom]] reruns); a covered file is
    * skipped only when some probed bit is missing — files are immutable
    * once written, so a sidecar can never go stale, only lose coverage.
    */
  sealed trait BloomSidecar {
    def column: String
    def mBits: Int
    def k: Int

    /** May `file` contain `value`? No false negatives on covered files.
      * Lookups normalize the name ([[normFile]]) — the sidecar is keyed
      * by `input_file_name()` URIs, the skipping index by Hadoop path
      * strings, and a form mismatch must read as "uncovered", never as
      * a skip.
      */
    def mayContain(file: String, value: Any): Boolean
  }

  /** Small-store sidecar: the whole body (`words(file)(word) = bits`)
    * lives in one driver-loaded text file — zero Spark jobs to load,
    * bounded at files · ceil(mBits/63) words.
    */
  final case class InlineBloomSidecar(column: String, mBits: Int, k: Int,
                                      words: Map[String, Map[Long, Long]])
      extends BloomSidecar {
    def mayContain(file: String, value: Any): Boolean =
      words.get(normFile(file)) match {
        case None => true // uncovered file: keep
        case Some(w) =>
          bloomDriverPositions(value, mBits, k).forall { p =>
            (w.getOrElse(p / 63, 0L) & (1L << (p % 63).toInt)) != 0L
          }
      }
  }

  /** Large-store sidecar: the body lives in `nShards` word-bucketed text
    * shards (`shard = word % nShards`), loaded LAZILY — a point probe
    * touches at most k words, hence at most k shards, each bounded at
    * ~`BloomShardWords` entries, so probe-side memory is independent of
    * the store's file count (the single-file format would load the whole
    * O(nFiles · mBits/63) body into driver heap). Loaded shards are
    * cached (bounded — the cache resets past 64 shards); entries are
    * keyed `fileIdx << 24 | word` in an unboxed LongMap.
    */
  final class ShardedBloomSidecar(
      val column: String, val mBits: Int, val k: Int, nShards: Int,
      buildId: String, fileIdx: Map[String, Int], dir: Path,
      fs: org.apache.hadoop.fs.FileSystem) extends BloomSidecar {
    private val cache =
      scala.collection.mutable.Map.empty[Int, scala.collection.mutable.LongMap[Long]]

    /** Flipped when a shard read observes a different build than the one
      * this sidecar was loaded against (a concurrent [[saveBloom]] rerun
      * swapped the directory mid-scan): the held fileIdx map no longer
      * describes the on-disk body, so EVERY lookup from then on answers
      * "may contain" — conservative keep-everything, never a wrong skip.
      * The old inline format snapshotted the whole body at load time and
      * was immune; the lazy format must re-verify per load.
      */
    @volatile private var stale = false
    private[graft] def isStale: Boolean = stale

    /** Shards resident right now — the bounded-memory observable. */
    private[graft] def loadedShards: Int = cache.size

    /** Load shard `j`, or None when the build under `dir` is no longer
      * the one this sidecar holds. The `_meta` check runs AFTER the read
      * (an absent shard dir is a legal empty shard in OUR build, but a
      * delete→rename window of a NEW build reads identically — only the
      * post-read build check can tell them apart; builds never reuse a
      * buildId, so meta-matches-after implies the bytes read were ours).
      * Any read error mid-swap also reads as stale.
      */
    private def loadShard(j: Int): Option[scala.collection.mutable.LongMap[Long]] =
      if (stale) None
      else cache.get(j).orElse {
        val loaded = try {
          val m = scala.collection.mutable.LongMap.empty[Long]
          val sd = new Path(dir, s"shard=$j")
          if (fs.exists(sd)) fs.listStatus(sd).foreach { st =>
            val n = st.getPath.getName
            if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) {
              val in = fs.open(st.getPath)
              val txt = try new String(in.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8)
              finally in.close()
              txt.split("\n").foreach { l0 =>
                val l = l0.trim
                if (l.nonEmpty) {
                  val t = l.indexOf('\t')
                  val fi = l.substring(0, t).toLong
                  l.substring(t + 1).split(",").foreach { w =>
                    val c = w.indexOf(':')
                    m.update((fi << 24) | w.substring(0, c).toLong,
                      w.substring(c + 1).toLong)
                  }
                }
              }
            }
          }
          val metaNow = readSmallFile(fs, new Path(dir, "_meta"))
          if (metaNow.exists(_.trim == s"$nShards $buildId")) Some(m)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
        loaded match {
          case Some(m) =>
            if (cache.size >= 64) cache.clear()
            cache(j) = m
            Some(m)
          case None =>
            stale = true
            cache.clear() // degrade uniformly: drop superseded-build shards
            None
        }
      }

    /** A SKIP is the only dangerous answer (keeps are always safe), and
      * shards cached BEFORE a concurrent [[saveBloom]] rerun would keep
      * skipping from the superseded build until some uncached load flips
      * `stale` — so every would-be skip re-verifies `_meta` first. One
      * small driver read per skipped file, each saving that file's scan;
      * a failed check flips the whole sidecar to keep-everything at the
      * first would-be skip instead of mixing builds within one scan.
      */
    private def buildStillCurrent(): Boolean =
      !stale && {
        val ok = try readSmallFile(fs, new Path(dir, "_meta"))
          .exists(_.trim == s"$nShards $buildId")
        catch { case scala.util.control.NonFatal(_) => false }
        if (!ok) { stale = true; cache.clear() }
        ok
      }

    def mayContain(file: String, value: Any): Boolean =
      fileIdx.get(normFile(file)) match {
        case None => true // uncovered file: keep
        case Some(fi) =>
          val hit = bloomDriverPositions(value, mBits, k).forall { p =>
            val w = p / 63
            loadShard((w % nShards).toInt) match {
              case None => true // swapped/torn build: keep
              case Some(m) =>
                (m.getOrElse((fi.toLong << 24) | w, 0L) &
                  (1L << (p % 63).toInt)) != 0L
            }
          }
          hit || !buildStillCurrent()
      }
  }

  /** `file:///a/b`, `file:/a/b`, `/a/b` → one canonical form. */
  private[graft] def normFile(s: String): String =
    new Path(s).toUri.getPath

  /** Driver-side twin of [[bloomPositions]] — same md5 double-hash over
    * the same `"bf_" + value` rendering, for probing a sidecar with a
    * pushed filter literal. Only integral and string values render
    * identically to Spark's `cast(col as string)` in all cases, so
    * callers must restrict to those (floating-point renderings differ
    * in scientific-notation corners — no bloom narrowing there).
    */
  private[graft] def bloomDriverPositions(value: Any, mBits: Int,
                                          k: Int): Seq[Long] = {
    val s = "bf_" + String.valueOf(value)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    (0 until k).map(i => Math.floorMod(h1 + i.toLong * h2, mBits.toLong))
  }

  private def bloomSidecarFile(column: String) = s"bloom_$column.txt"
  private def bloomShardDir(column: String) = s"bloom_$column.d"
  private[graft] val BloomPrefix = "bloom_"

  /** Body-size bound (in (file, word) entries) above which [[saveBloom]]
    * writes the sharded format: ~256 Ki entries ≈ a few MB of text per
    * shard, the probe-side memory unit.
    */
  private[graft] val BloomShardWords = 1 << 18

  /** Build + commit the Bloom sidecar for a maintained layout's point-
    * lookup column: one distributed pass over exactly the COMMITTED
    * indexed files (per REAL file name via input_file_name). Small
    * stores (body ≤ `shardWords` (file, word) entries, e.g. the 16-file
    * default ≈ 4 k longs) commit ONE small atomic text file — header
    * `mBits k`, then `file<TAB>word:bits,…` per file — which readers
    * load with a driver FS read, NO Spark job before the scan. Bigger
    * stores switch to the SHARDED format ([[writeShardedBloom]]): the
    * body never touches the driver at build, and a probe lazily loads
    * at most k word-bucket shards of ~`shardWords` entries each, so
    * probe memory is independent of file count (a 10⁵-file store's
    * inline body would be ~0.5-1 GB of driver heap). Both read paths
    * consult the sidecar for pushed equality/IN probes on `column`;
    * rerun after appends to restore coverage (uncovered new files are
    * kept conservatively, never wrongly skipped); [[compact]] refreshes
    * every committed sidecar automatically (its rewrite replaces all
    * files, which would otherwise strand the sidecar at zero coverage).
    */
  def saveBloom(spark: SparkSession, path: String, column: String,
                mBits: Int = 1 << 14, k: Int = 5,
                shardWords: Int = BloomShardWords): Unit = {
    requireBloomK(k)
    val stats = loadStats(spark, path).getOrElse(throw new IllegalStateException(
      s"saveBloom: $path has no committed skipping index"))
    val files = stats.map(_.file).distinct.sorted
    val rows = spark.read.parquet(files: _*)
      .select(org.apache.spark.sql.functions.input_file_name().as("file"),
        col(column))
    val words = bloomPositions(rows, column, mBits, k)
      .groupBy(col("file"), col("word"))
      .agg(expr("bit_or(bit)").as("bits"))
    val wordsPerFile = (mBits + 62) / 63
    if (files.size.toLong * wordsPerFile <= shardWords) {
      // small store: one driver-composed text file, zero-job load
      val collected = words.collect()
      val body = collected.groupBy(r => normFile(r.getString(0)))
        .toSeq.sortBy(_._1)
        .map { case (f, rs) =>
          f + "\t" + rs.sortBy(_.getLong(1))
            .map(r => s"${r.getLong(1)}:${r.getLong(2)}").mkString(",")
        }.mkString("\n")
      writeFileAtomic(spark, new Path(statsRoot(path)),
        bloomSidecarFile(column), s"$mBits $k\n$body")
    } else writeShardedBloom(spark, path, column, mBits, k, words,
      files, shardWords)
  }

  /** Large-store sidecar write: the body NEVER touches the driver — the
    * (file, word, bits) rows are bucketed by `word % nShards`, rendered
    * to the same `fidx\tword:bits,…` lines distributedly, and written as
    * one text directory per shard. Commit order: shard directory (tmp +
    * swap, `_meta` carrying nShards + a build id) first, then the header
    * text — the atomic commit marker — listing the covered files in
    * index order. The loader cross-checks `_meta` against the header and
    * treats any mismatch (a torn two-step commit) as "no sidecar":
    * conservative keep-everything, never a wrong skip.
    */
  private[graft] def writeShardedBloom(spark: SparkSession, path: String,
      column: String, mBits: Int, k: Int, words: DataFrame,
      files: Seq[String], shardWords: Int): Unit = {
    val wordsPerFile = (mBits + 62) / 63
    require(wordsPerFile < (1 << 24),
      s"sharded sidecar: mBits=$mBits exceeds the 24-bit word-key budget")
    val normFiles = files.map(normFile)
    val nShards = math.max(1, math.ceil(
      normFiles.size.toLong * wordsPerFile.toDouble / shardWords).toInt)
    val buildId = java.util.UUID.randomUUID().toString
    import spark.implicits._
    val fmap = normFiles.zipWithIndex.toDF("nfile", "fidx")
    val nfUdf = udf((s: String) => normFile(s))
    val lines = words.withColumn("nfile", nfUdf(col("file")))
      .join(broadcast(fmap), Seq("nfile"))
      .withColumn("shard", pmod(col("word"), lit(nShards.toLong)).cast("int"))
      .groupBy(col("shard"), col("fidx"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("word"),
        concat_ws(":", col("word"), col("bits")).as("s")))),
        x => x.getField("s")), ",").as("ws"))
      .select(col("shard"), concat_ws("\t", col("fidx"), col("ws")).as("value"))
    val root = new Path(statsRoot(path))
    val fs = root.getFileSystem(hconf(spark))
    val finalDir = new Path(root, bloomShardDir(column))
    val tmpDir = new Path(root, bloomShardDir(column) + ".tmp")
    fs.delete(tmpDir, true)
    lines.repartition(col("shard")).sortWithinPartitions(col("fidx"))
      .write.partitionBy("shard").mode("overwrite").text(tmpDir.toString)
    writeFileAtomic(spark, tmpDir, "_meta", s"$nShards $buildId")
    fs.delete(finalDir, true)
    if (!fs.rename(tmpDir, finalDir))
      throw new java.io.IOException(
        s"saveBloom: rename $tmpDir -> $finalDir failed")
    writeFileAtomic(spark, root, bloomSidecarFile(column),
      (s"SHARDED $mBits $k $nShards $buildId" +: normFiles).mkString("\n"))
  }

  /** Load a committed Bloom sidecar — one driver FS read for the inline
    * format; header-only (file list, no body) for the sharded format,
    * whose shards load lazily at probe time. None if never built, and
    * None for a torn sharded commit (header/_meta mismatch) — the caller
    * then skips bloom narrowing entirely, which is conservative.
    */
  def loadBloom(spark: SparkSession, path: String,
                column: String): Option[BloomSidecar] =
    readSmallFile(spark, new Path(statsRoot(path),
        bloomSidecarFile(column)))
      .flatMap { text =>
        val lines = text.split("\n", -1).toSeq
        val head = lines.head.trim.split(" ")
        if (head.headOption.contains("SHARDED")) {
          val Array(_, m, k2, ns, bid) = head
          val dir = new Path(statsRoot(path), bloomShardDir(column))
          val fs = dir.getFileSystem(hconf(spark))
          // an unreadable _meta (missing, torn, checksum-corrupt) reads
          // as a torn commit: no sidecar, conservative keep-everything
          val metaOk = scala.util.Try(
              readSmallFile(spark, new Path(dir, "_meta")))
            .toOption.flatten.exists(_.trim == s"$ns $bid")
          if (!metaOk) None
          else Some(new ShardedBloomSidecar(column, m.toInt, k2.toInt,
            ns.toInt, bid, lines.tail.filter(_.nonEmpty).zipWithIndex.toMap,
            dir, fs))
        } else {
          val Array(m, k2) = head
          val words = lines.tail.filter(_.nonEmpty).map { l =>
            val Array(f, ws) = l.split("\t", 2)
            f -> (if (ws.isEmpty) Map.empty[Long, Long]
                  else ws.split(",").map { w =>
                    val Array(a, b) = w.split(":")
                    a.toLong -> b.toLong
                  }.toMap)
          }.toMap
          Some(InlineBloomSidecar(column, m.toInt, k2.toInt, words))
        }
      }

  /** Columns with a committed Bloom sidecar at `path`. */
  private[graft] def bloomColumns(spark: SparkSession,
                                  path: String): Seq[String] = {
    val dir = new Path(statsRoot(path))
    val fs = dir.getFileSystem(hconf(spark))
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(BloomPrefix) && n.endsWith(".txt"))
      .map(n => n.substring(BloomPrefix.length, n.length - 4))
  }

  // --------------------------------------------- written layout + skipping

  /** Materialize the Z-order layout as REAL parquet files: range-shuffle
    * on the z-value into `nFiles` partitions, sort within each, write one
    * file per partition (overwrite). Each output file then covers one
    * contiguous z-range, so its parquet footer min/max on BOTH clustered
    * columns is the tight box [[fileStats]] models — this is exactly the
    * lakehouse OPTIMIZE ZORDER write path, and `repartitionByRange` is
    * the 100 TB-safe shuffle (no global single-task sort; boundaries come
    * from sampling).
    */
  def zorderWrite(df: DataFrame, zCol: Column, tieCol: Column, nFiles: Int,
                  path: String, mode: String = "overwrite"): Unit =
    df.withColumn("_z", zCol).withColumn("_t", tieCol)
      .repartitionByRange(nFiles, col("_z"), col("_t"))
      .sortWithinPartitions(col("_z"), col("_t"))
      .drop("_z", "_t")
      .write.mode(mode).parquet(path)

  /** One parquet row group's min/max box, read from the file FOOTER —
    * the metadata a skipping reader consults without touching any data
    * page. Columns absent from a footer's statistics are simply missing
    * from the maps (a pruner must then keep the group).
    */
  final case class RowGroupStats(file: String, group: Int, rows: Long,
                                 mins: Map[String, Double],
                                 maxs: Map[String, Double])

  /** Walk the written layout's parquet footers and return every row
    * group's min/max box over `statCols` (numeric columns). This is the
    * real-metadata twin of [[fileStats]]: what parquet itself recorded
    * for the layout that was actually written. Driver-side by design —
    * footers are the skipping INDEX, tiny by construction; at warehouse
    * scale this table is persisted once per write (exactly what a
    * lakehouse transaction log stores) rather than re-walked per query.
    */
  def parquetStats(spark: SparkSession, path: String,
                   statCols: Seq[String]): Seq[RowGroupStats] =
    statsForFiles(spark, listDataFiles(spark, path), statCols)

  /** The layout's visible data files (committed part-files), sorted. */
  def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
  }

  /** Footer walk over an EXPLICIT file list — the incremental twin of
    * [[parquetStats]]: maintenance ops index only the files they just
    * wrote, never whatever else the directory holds (a crashed writer's
    * orphans must stay invisible, not get adopted).
    */
  def statsForFiles(spark: SparkSession, files: Seq[String],
                    statCols: Seq[String]): Seq[RowGroupStats] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    files.sorted.flatMap { f =>
      val p = new Path(f)
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try rd.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
        case (b, i) =>
          val stats = b.getColumns.asScala
            .filter(c => statCols.contains(c.getPath.toDotString))
            .flatMap { c =>
              val st = c.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: Number, mx: Number) =>
                  Some(c.getPath.toDotString ->
                    (mn.doubleValue(), mx.doubleValue()))
                case _ => None
              }
            }.toSeq
          RowGroupStats(p.toString, i, b.getRowCount,
            stats.map { case (c, (mn, _)) => c -> mn }.toMap,
            stats.map { case (c, (_, mx)) => c -> mx }.toMap)
      } finally rd.close()
    }
  }

  private val StatsDir = "_graft_stats"
  private val Pointer = "_CURRENT"
  private def statsRoot(path: String): String = s"$path/$StatsDir"

  private def hconf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration

  private def readSmallFile(spark: SparkSession,
                            p: Path): Option[String] =
    readSmallFile(p.getFileSystem(hconf(spark)), p)

  private def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
                            p: Path): Option[String] = {
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Small-file write committed by an ATOMIC rename — through Hadoop's
    * FileContext (Options.Rename.OVERWRITE), so pointer/tag/manifest
    * commits work on ANY Hadoop filesystem the data itself lives on
    * (local, HDFS; an object store without atomic rename would swap
    * this for a conditional put), not just java.nio local paths.
    */
  private def writeFileAtomic(spark: SparkSession, dir: Path,
                              name: String, content: String): Unit = {
    val fs = dir.getFileSystem(hconf(spark))
    fs.mkdirs(dir)
    val tmp = new Path(dir, name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, hconf(spark))
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(new Path(dir, name)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The committed stats epoch, if the index uses the epoch format. */
  private def readEpoch(spark: SparkSession,
                        path: String): Option[Long] =
    readSmallFile(spark, new Path(statsRoot(path), Pointer))
      .map(_.trim.toLong)

  /** Write one stats epoch and COMMIT it by atomically moving the
    * pointer file — the index's transaction-log step. A reader sees
    * either the previous epoch or the new one, never a torn table; a
    * crash before the pointer move leaves an unreferenced epoch dir
    * that the next commit garbage-collects. Single-writer discipline
    * (one maintenance op at a time), and epoch GC assumes no reader is
    * mid-scan during maintenance — a shared deployment would retain a
    * vacuum horizon of epochs instead of exactly one.
    */
  private val TagsFile = "_tags.txt"

  /** Key-value tags carried by the CURRENT committed epoch — they ride
    * the same atomic pointer commit as the stats themselves, which is
    * what makes an exactly-once streaming sink possible: a consumer that
    * records its progress (e.g. the last applied micro-batch id) as a
    * commit tag either sees its data AND its progress marker, or
    * neither. Tags are carried forward commit-to-commit (a [[compact]]
    * between two appends must not lose the stream's watermark) unless a
    * new commit overrides a key.
    */
  def epochTags(spark: SparkSession, path: String): Map[String, String] =
    readEpoch(spark, path) match {
      case None => Map.empty
      case Some(e) =>
        readSmallFile(spark,
          new Path(s"${statsRoot(path)}/epoch=$e", TagsFile))
          .map(_.linesIterator.filter(_.contains('=')).map { l =>
            val i = l.indexOf('=')
            l.substring(0, i) -> l.substring(i + 1)
          }.toMap)
          .getOrElse(Map.empty)
    }

  private def commitStats(spark: SparkSession, path: String,
                          statCols: Seq[String],
                          groups: Seq[RowGroupStats],
                          tags: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    // carry the previous epoch's tags unless overridden
    val allTags = epochTags(spark, path) ++ tags
    val epoch = readEpoch(spark, path).map(_ + 1L).getOrElse(0L)
    val dir = s"${statsRoot(path)}/epoch=$epoch"
    // coalesce(1): the index is one row PER ROW GROUP — thousands of
    // entries for a real table, safely one file. If a layout ever grows
    // to ~10^6+ row groups (100 TB at tiny groups), shard this write by
    // file-name prefix instead of forcing one task.
    groups
      .map(g => (g.file, g.group, g.rows, statCols,
        statCols.map(c => g.mins.get(c)),
        statCols.map(c => g.maxs.get(c))))
      .toDF("file", "group", "rows", "cols", "mins", "maxs")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
    if (allTags.nonEmpty) {
      allTags.keys.foreach(k => require(!k.contains('=') &&
        !k.contains('\n'), s"tag key may not contain '=' or newline: $k"))
      allTags.values.foreach(v => require(!v.contains('\n'),
        s"tag value may not contain a newline: $v"))
      // written INSIDE the epoch dir BEFORE the pointer move: the tag
      // commits atomically with the stats (underscore name: Spark's
      // reader ignores it)
      writeFileAtomic(spark, new Path(dir), TagsFile,
        allTags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
          .mkString("\n"))
    }
    writeFileAtomic(spark, new Path(statsRoot(path)), Pointer,
      epoch.toString)
    // GC: stale epoch dirs (including any uncommitted orphan epochs)
    val hRoot = new Path(statsRoot(path))
    val fs = hRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(hRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch=") &&
        s.getPath.getName != s"epoch=$epoch")
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Persist the footer-stats skipping index as a tiny parquet table
    * under the layout (underscore-prefixed, so data reads ignore it) —
    * the transaction-log step: walk footers ONCE at write time, serve
    * every later scan's pruning from the saved table. The saved stats
    * DEFINE the table, exactly like a lakehouse log: a data file added
    * behind the index's back is invisible until stats are re-saved (and
    * [[appendDelta]] / [[compact]] are exactly the ops that re-save it
    * incrementally, behind an atomic epoch-pointer commit).
    */
  def saveStats(spark: SparkSession, path: String, statCols: Seq[String],
                tags: Map[String, String] = Map.empty): Unit =
    commitStats(spark, path, statCols,
      parquetStats(spark, path, statCols), tags)

  /** The saved skipping index, if one exists: the epoch the pointer
    * commits, or the legacy flat `_graft_stats` table for layouts saved
    * before the epoch format. The box arrays zip against the STORED
    * column list (the save-time order), never a caller's.
    */
  def loadStats(spark: SparkSession,
                path: String): Option[Seq[RowGroupStats]] = {
    val p = new Path(statsRoot(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val dirs: Seq[String] = readEpoch(spark, path) match {
        case Some(e) => Seq(s"${statsRoot(path)}/epoch=$e")
        case None =>
          // legacy flat table — read the flat FILES explicitly, never
          // the directory: an epoch dir with no pointer is an
          // UNCOMMITTED write (crash before the first pointer move) and
          // must stay invisible, not get partition-discovered (a
          // directory read next to an orphan epoch dir would even fail
          // with conflicting directory structures)
          val flat = fs.listStatus(p).toSeq.filter(s => s.isFile &&
            s.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString)
          if (flat.nonEmpty) flat else return None
      }
      Some(spark.read.parquet(dirs: _*).collect().toSeq.map { r =>
        val cols = r.getSeq[String](3)
        def optSeq(i: Int): Seq[Option[Double]] =
          r.getSeq[Any](i).map(Option(_).map {
            case d: Double => d
            case n: Number => n.doubleValue()
          })
        RowGroupStats(r.getString(0), r.getInt(1), r.getLong(2),
          cols.zip(optSeq(4)).collect { case (c, Some(v)) => c -> v }.toMap,
          cols.zip(optSeq(5)).collect { case (c, Some(v)) => c -> v }.toMap)
      })
    }
  }

  // ------------------------------------------- incremental maintenance

  /** Quantization bounds from the data: one bounded min/max aggregation
    * over the clustering columns (empty/all-NULL → [0,1]; constant →
    * [lo, lo+1] so quantize never divides by zero).
    */
  def deriveBounds(df: DataFrame,
                   zcols: Seq[String]): Seq[(Double, Double)] = {
    val aggExprs = zcols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    zcols.indices.map { i =>
      val (lo, hi) =
        if (row.isNullAt(2 * i)) (0.0, 1.0)
        else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
      if (hi > lo) (lo, hi) else (lo, lo + 1.0)
    }
  }

  /** The curve names a maintained layout can carry in its manifest. */
  private[graft] val Curves = Set("morton", "hilbert")

  private def zExprOf(zcols: Seq[String], bounds: Seq[(Double, Double)],
                      bits: Int, curve: String = "morton"): Column = {
    val cells = zcols.zip(bounds).map { case (c, (lo, hi)) =>
      quantize(col(c).cast("double"), lo, hi, bits) }
    curve match {
      case "morton" => zValueN(cells, bits)
      case "hilbert" if cells.size == 2 =>
        hilbertValue(cells(0), cells(1), bits)
      case "hilbert" =>
        require(cells.size * bits <= 62,
          s"curve=hilbert: ${cells.size} columns at $bits bits overflow " +
            "a signed long")
        hilbertValueN(cells, bits)
      case other => throw new IllegalArgumentException(
        s"unknown layout curve '$other' (one of ${Curves.mkString(", ")})")
    }
  }

  private def boundsParam(bounds: Seq[(Double, Double)]): String =
    bounds.map { case (lo, hi) => s"$lo:$hi" }.mkString(",")

  private def parseBounds(s: String): Seq[(Double, Double)] =
    s.split(",").toSeq.map { p =>
      val Array(lo, hi) = p.split(":")
      (lo.toDouble, hi.toDouble)
    }

  /** Layout build params, persisted so [[appendDelta]]/[[compact]] can
    * replay the SAME quantization a later maintenance op needs.
    */
  final case class LayoutManifest(zcols: Seq[String], bits: Int,
                                  nFiles: Int, tieCol: Option[String],
                                  bounds: Seq[(Double, Double)],
                                  curve: String = "morton")

  private val ManifestFile = "manifest.json"

  /** Bundle's manifest format, but written through [[writeFileAtomic]]
    * so the maintained layout's ENTIRE metadata (manifest, pointer,
    * tags) lives on the same Hadoop filesystem as its data files.
    */
  private def writeLayoutManifest(spark: SparkSession, path: String,
                                  m: LayoutManifest): Unit =
    writeFileAtomic(spark, new Path(statsRoot(path)), ManifestFile,
      graft.sources.Bundle.manifestJson(
        Map("kind" -> "zorder-layout",
          "zcols" -> m.zcols.mkString(","),
          "bits" -> m.bits.toString,
          "nFiles" -> m.nFiles.toString,
          "bounds" -> boundsParam(m.bounds),
          "curve" -> m.curve) ++
          m.tieCol.map("tieCol" -> _)))

  def readLayoutManifest(spark: SparkSession,
                         path: String): Option[LayoutManifest] =
    readSmallFile(spark, new Path(statsRoot(path), ManifestFile))
      .map(graft.sources.Bundle.parseManifest)
      .filter(_.get("kind").contains("zorder-layout"))
      .map(p => LayoutManifest(
        p("zcols").split(",").toSeq, p("bits").toInt, p("nFiles").toInt,
        p.get("tieCol"), parseBounds(p("bounds")),
        // manifests written before the curve field are Morton by
        // construction — absent key reads as the historical default
        p.getOrElse("curve", "morton")))

  /** Build the full layout in one step: derive quantization bounds,
    * Z-order-write the data, commit the skipping index (epoch 0), and
    * persist the build manifest that makes the layout MAINTAINABLE
    * ([[appendDelta]]/[[compact]]). The `graft-zorder` writer delegates
    * here.
    */
  def buildLayout(df: DataFrame, zcols: Seq[String], bits: Int,
                  nFiles: Int, tieCol: Option[String], path: String,
                  tags: Map[String, String] = Map.empty,
                  curve: String = "morton"): Unit = {
    val spark = df.sparkSession
    val bounds = deriveBounds(df, zcols)
    val z = zExprOf(zcols, bounds, bits, curve)
    zorderWrite(df, z, tieCol.map(col).getOrElse(z), nFiles, path)
    saveStats(spark, path, zcols, tags)
    writeLayoutManifest(spark, path, LayoutManifest(zcols, bits, nFiles,
      tieCol, bounds, curve))
  }

  /** Append a delta to a maintained layout WITHOUT re-laying-out the
    * existing data: the delta is Z-sorted under the BUILD-TIME bounds
    * (values outside them clamp to the edge cells — footer boxes still
    * record true values, so pruning stays exact; only clustering quality
    * degrades at the extremes until the next [[compact]] re-derives
    * bounds), written as new files sized like the build's, and made
    * visible by ONE atomic index commit covering old rows + exactly the
    * files THIS call wrote. Crash before the commit → the delta is
    * invisible (re-run the append; orphans are GC'd by the next
    * [[compact]]); a crashed writer's orphans are never adopted.
    *
    * Returns whether a commit happened: an EMPTY delta is a no-op
    * (false) — no new epoch, no tag advance. The delta is PINNED
    * (localCheckpoint) so the emptiness check, the file-count sizing,
    * and the write all see one snapshot — a lineage containing
    * non-determinism or a re-read source that changed cannot diverge
    * between them.
    */
  def appendDelta(delta: DataFrame, path: String,
                  tags: Map[String, String] = Map.empty): Boolean = {
    val spark = delta.sparkSession
    val mf = readLayoutManifest(spark, path).getOrElse(
      throw new IllegalStateException(
      s"appendDelta: $path has no layout manifest — build it with " +
        "Layout.buildLayout / df.write.format(\"graft-zorder\") first"))
    val stats = loadStats(spark, path).getOrElse(throw new IllegalStateException(
      s"appendDelta: $path has no committed skipping index"))
    mf.zcols.foreach(c => require(delta.columns.contains(c),
      s"appendDelta: delta lacks clustering column $c"))
    val dataSchema = spark.read.parquet(
      stats.map(_.file).distinct.head).schema
    require(delta.columns.toSet == dataSchema.fieldNames.toSet,
      s"appendDelta: delta columns ${delta.columns.sorted.mkString(",")} " +
        s"!= layout columns ${dataSchema.fieldNames.sorted.mkString(",")}")
    val aligned = delta.select(dataSchema.fieldNames.toSeq.map(col): _*)
      .localCheckpoint(true)
    // release the pinned blocks on EVERY exit — the empty-delta return
    // and exception paths included, or an idle maintenance stream leaks
    // storage per batch
    try {
      val deltaRows = aligned.count()
      if (deltaRows == 0) return false
      // size delta files like the build's files
      val totalRows = stats.map(_.rows).sum
      val nIndexed = math.max(1, stats.map(_.file).distinct.size)
      val rowsPerFile = math.max(1L, totalRows / nIndexed)
      val nDelta = math.max(1L, (deltaRows + rowsPerFile - 1) / rowsPerFile)
        .min(1 << 20).toInt
      val before = listDataFiles(spark, path).toSet
      val z = zExprOf(mf.zcols, mf.bounds, mf.bits, mf.curve)
      zorderWrite(aligned, z, mf.tieCol.map(col).getOrElse(z), nDelta,
        path, mode = "append")
      val newFiles = listDataFiles(spark, path).filterNot(before)
      commitStats(spark, path, mf.zcols,
        stats ++ statsForFiles(spark, newFiles, mf.zcols), tags)
      true
    } finally Checkpoints.release(aligned)
  }

  /** Re-layout the WHOLE maintained table — the OPTIMIZE + VACUUM step:
    * read exactly the indexed files, re-derive bounds (restoring
    * clustering quality for appends that drifted outside the build-time
    * range), Z-order-write fresh files, commit the index to cover ONLY
    * them, then garbage-collect every unindexed data file (superseded
    * files AND any crashed writer's orphans) and refresh the manifest.
    * Every crash window leaves a committed, readable state: before the
    * index commit the old state stands (new files are invisible
    * orphans); after it the new state serves and the leftover deletes
    * are re-runnable by the next compact.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val mf = readLayoutManifest(spark, path).getOrElse(
      throw new IllegalStateException(
      s"compact: $path has no layout manifest"))
    val stats = loadStats(spark, path).getOrElse(throw new IllegalStateException(
      s"compact: $path has no committed skipping index"))
    val files = stats.map(_.file).distinct.sorted
    val df = spark.read.parquet(files: _*)
    val bounds = deriveBounds(df, mf.zcols)
    val z = zExprOf(mf.zcols, bounds, mf.bits, mf.curve)
    val before = listDataFiles(spark, path).toSet
    zorderWrite(df, z, mf.tieCol.map(col).getOrElse(z), mf.nFiles,
      path, mode = "append")
    val newFiles = listDataFiles(spark, path).filterNot(before)
    commitStats(spark, path, mf.zcols,
      statsForFiles(spark, newFiles, mf.zcols))
    // VACUUM: everything the committed index does not reference
    val keep = newFiles.toSet
    val conf = spark.sparkContext.hadoopConfiguration
    listDataFiles(spark, path).filterNot(keep).foreach { f =>
      val p = new Path(f)
      p.getFileSystem(conf).delete(p, false)
    }
    writeLayoutManifest(spark, path, mf.copy(bounds = bounds))
    // refresh every committed Bloom sidecar: the rewrite replaced every
    // data file, which would strand the old sidecars at zero coverage
    // (correct — uncovered files are kept — but all pruning is lost
    // until someone remembers to rebuild; compact is already the
    // full-rewrite op, so the extra pass belongs here)
    bloomColumns(spark, path).foreach { c =>
      loadBloom(spark, path, c).foreach(bs =>
        saveBloom(spark, path, c, bs.mBits, bs.k))
    }
  }

  /** Scan the written layout under a box predicate, opening ONLY the
    * files whose footer boxes intersect the queried range in every
    * constrained dimension (a group missing statistics for a queried
    * column is conservatively kept). Returns the pruned frame — the
    * box FILTER still applies on top, so the result is row-identical to
    * a full scan with the same predicate (footer boxes are bounds, not
    * exact membership) — plus the kept file list and the total file
    * count, so callers and specs can measure the skipping that actually
    * happened.
    */
  def prunedScan(spark: SparkSession, path: String,
                 ranges: Map[String, (Double, Double)])
      : (DataFrame, Seq[String], Int) = {
    val stats = loadStats(spark, path)
      .getOrElse(parquetStats(spark, path, ranges.keys.toSeq))
    val allFiles = stats.map(_.file).distinct
    val keep = stats.filter { g =>
      ranges.forall { case (c, (lo, hi)) =>
        (g.mins.get(c), g.maxs.get(c)) match {
          // NaN bounds compare false against everything, which would
          // SKIP a file that may hold matching rows — conservatively keep
          case (Some(mn), Some(mx)) if !mn.isNaN && !mx.isNaN =>
            mx >= lo && mn <= hi
          case _ => true
        }
      }
    }.map(_.file).distinct
    val pred = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lo && col(c) <= hi }.reduce(_ && _)
    val df =
      if (keep.nonEmpty) spark.read.parquet(keep: _*).filter(pred)
      else spark.read.parquet(path).filter(lit(false))
    (df, keep, allFiles.size)
  }
}
