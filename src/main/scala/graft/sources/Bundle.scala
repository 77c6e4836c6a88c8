package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** DataStorage-equivalent: a named bundle of DataFrames persisted as a
  * directory of Parquet tables plus a JSON manifest of scalar parameters.
  *
  * Reference: the external `datastorage` HDF5/npz bundles used throughout
  * trx (e.g. trx/azav.py:301,408,457; trx/id9.py:221,301) and the
  * args-comparison cache invalidation (trx/azav.py:303-343,
  * `compare_pyfai` azav.py:106-115).
  *
  * Parquet-per-table keeps each member independently scannable/prunable at
  * 100 TB; the manifest carries the reduction parameters whose change must
  * invalidate previous results (T2).
  */
object Bundle {

  final case class Manifest(params: Map[String, String])

  /** Hadoop configuration for store management: the active session's (so
    * `spark.hadoop.*` settings and test-registered schemes apply), or a
    * bare default before any session exists.
    */
  private def sessionConf: Option[org.apache.hadoop.conf.Configuration] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)

  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    sessionConf.getOrElse(new org.apache.hadoop.conf.Configuration())

  /** A path resolved through its OWN Hadoop FileSystem. Every store /
    * state probe, delete and rename in the engine routes through here:
    * a `java.io.File` probe is always false on HDFS/S3, which silently
    * disables any incremental/warm path guarded by it while the writes
    * keep succeeding — the worst kind of cluster-only degradation.
    *
    * A bare `new Configuration()` carries NONE of the session's
    * `spark.hadoop.*` settings (registered schemes, credentials), so a
    * non-local scheme resolved through it would reach the wrong/default
    * filesystem with valid-looking results — fail loudly instead of
    * guessing; local `file:` paths need no session settings and keep
    * working pre-session.
    */
  private[graft] def fsPath(path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    val conf = sessionConf.getOrElse {
      val scheme = Option(p.toUri.getScheme)
      require(scheme.forall(_ == "file"),
        s"Bundle: '$path' uses scheme '${scheme.getOrElse("")}' but no " +
          "SparkSession is active — its spark.hadoop.* settings " +
          "(registered filesystems, credentials) are required to resolve " +
          "non-local paths; create the session first")
      new org.apache.hadoop.conf.Configuration()
    }
    (p.getFileSystem(conf), p)
  }

  /** Existence through the path's Hadoop FileSystem (any scheme). */
  def exists(path: String): Boolean = {
    val (fs, p) = fsPath(path)
    fs.exists(p)
  }

  /** Modification time (epoch millis; 0 if absent) through the path's
    * Hadoop FileSystem — the T2 data-stamp input.
    */
  def mtimeMillis(path: String): Long = {
    val (fs, p) = fsPath(path)
    if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
  }

  /** Rename with overwrite, atomic where the filesystem can do it:
    * through Hadoop's FileContext (`Options.Rename.OVERWRITE`) when the
    * scheme has an AbstractFileSystem binding (local, HDFS, viewfs);
    * otherwise delete-then-rename — not atomic-replace, but a crash in
    * the window leaves the destination ABSENT, which every manifest
    * reader treats as "no store" (rebuild), never as torn content.
    */
  private[graft] def renameOverwrite(fs: FileSystem, src: HPath,
                                     dst: HPath): Unit = {
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, hadoopConf)
      fc.rename(fs.makeQualified(src), fs.makeQualified(dst),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        fs.delete(dst, true)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"rename $src -> $dst failed")
    }
  }

  /** Small-text write committed by [[renameOverwrite]]. */
  private[graft] def writeStringCommitted(fs: FileSystem, dir: HPath,
                                          name: String,
                                          content: String): Unit = {
    fs.mkdirs(dir)
    val tmp = new HPath(dir, name + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    renameOverwrite(fs, tmp, new HPath(dir, name))
  }

  /** Full contents of a small text file, if present. */
  private[graft] def readStringIfExists(fs: FileSystem,
                                        p: HPath): Option[String] = {
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Atomic where the filesystem can do it: several stores (notably
    * [[graft.operators.Snapshot]]'s SCD2 history) use the manifest write
    * as the COMMIT point of a multi-file refresh — a torn manifest would
    * param-mismatch on the next read and trigger a full store rebuild,
    * silently destroying committed state. Writing to a temp file and
    * renaming through [[renameOverwrite]] guarantees a reader sees the
    * old manifest, the new one, or (only on schemes without atomic
    * replace) no manifest — never a prefix. Routed through the path's
    * Hadoop FileSystem so manifests commit on the SAME storage the
    * tables live on (local, HDFS, any registered scheme).
    */
  def writeManifest(dir: String, params: Map[String, String]): Unit = {
    val (fs, d) = fsPath(dir)
    writeStringCommitted(fs, d, "manifest.json", manifestJson(params))
  }

  /** The manifest's JSON encoding, exposed so stores whose files live on
    * a Hadoop filesystem (e.g. [[graft.operators.Layout]]'s maintained
    * layouts) can carry the same format through their own atomic write
    * path.
    */
  def manifestJson(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")

  /** [[manifestJson]]'s inverse. */
  def parseManifest(txt: String): Map[String, String] = {
    val kv = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    kv.findAllMatchIn(txt)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }

  def readManifest(dir: String): Option[Map[String, String]] = {
    val (fs, d) = fsPath(dir)
    readStringIfExists(fs, new HPath(d, "manifest.json")).map(parseManifest)
  }

  /** Single left-to-right scan — sequential String.replace calls would
    * corrupt adjacent escapes (e.g. `\\` followed by `n` round-tripping to
    * a newline) and never decoded the `\uXXXX` forms `esc` emits.
    */
  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'  => sb.append('\n'); i += 2
          case '"'  => sb.append('"');  i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Recursive delete through the path's Hadoop FileSystem (no-op if
    * absent) — used by the T2 invalidation paths to drop stale curve
    * stores / stream checkpoints. The former `java.io.File` walk
    * silently NO-OPED on shared storage, degrading "drop stale store
    * then rewrite" to "rewrite over".
    */
  def deleteRecursively(path: String): Unit = {
    val (fs, p) = fsPath(path)
    fs.delete(p, true)
    ()
  }

  /** Save tables + manifest (overwrite). */
  def save(dir: String, tables: Map[String, DataFrame],
           params: Map[String, String] = Map.empty): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    writeManifest(dir, params)
  }

  /** Reopen a saved bundle (S9) — table discovery through the dir's
    * Hadoop FileSystem, so bundles open from any scheme they were saved
    * to.
    */
  def load(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val (fs, d) = fsPath(dir)
    fs.listStatus(d).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map { p =>
        val name = p.getName.stripSuffix(".parquet")
        name -> spark.read.parquet(p.toString)
      }.toMap
  }

  /** Read-only HDF5 ingest — the migration on-ramp for trx DataStorage
    * archives (the reference persists every azav/reduction bundle as
    * HDF5: trx/azav.py:457, trx/id9.py:221,301): every dataset reachable
    * from the root becomes a DataFrame keyed by its group path, and
    * every attribute becomes a manifest-style parameter — the same
    * (tables, params) shape [[load]]/[[readManifest]] serve for the
    * engine's own Parquet bundles.
    *
    * Array → table mapping (long form, the engine's curve grain):
    *  - rank ≤ 1 → `(idx LONG, value DOUBLE)` (strings: value STRING);
    *  - rank 2 → `(row LONG, col LONG, value DOUBLE)`;
    *  - rank n → `(i0..i{n-1} LONG, value DOUBLE)`, row-major.
    * Attribute keys are `name` at the root, `path@name` elsewhere;
    * numeric values render as integers when whole.
    *
    * Scale boundary, stated honestly: an HDF5 file is a single-node
    * artifact with no internal parallelism to hand Spark, so the decode
    * runs driver-side and the rows are parallelized after — the right
    * cost model for a ONE-TIME archive conversion (re-save with [[save]]
    * and every later read is parquet-parallel). A directory of many
    * bundles should map this per file inside tasks instead.
    */
  def fromHdf5(spark: SparkSession,
               path: String): (Map[String, DataFrame], Map[String, String]) = {
    val f = Hdf5.read(path)
    val tables = f.datasets.map { d =>
      d.path.stripPrefix("/") ->
        arrayFrame(spark, d.dims, d.numeric, d.strings)
    }.toMap
    val params = f.attrs.map { a =>
      val key =
        if (a.path == "/") a.name
        else s"${a.path.stripPrefix("/")}@${a.name}"
      // every element rendered (rank-1 numeric attrs are common in
      // DataStorage bundles), comma-joined like string attributes,
      // whole numbers formatted as integers per element
      val v = a.string.getOrElse {
        a.numeric.map { d =>
          if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
          else d.toString
        }.mkString(",")
      }
      key -> v
    }.toMap
    // a diamond hard link ingests its object once; the other paths are
    // recorded as alias parameters rather than duplicate tables
    val aliasParams = f.aliases.map { case (alias, canonical) =>
      s"alias:${alias.stripPrefix("/")}" -> canonical.stripPrefix("/")
    }
    (tables, params ++ aliasParams)
  }

  /** The array → long-form-table mapping shared by the HDF5 and npz
    * on-ramps (see [[fromHdf5]]'s doc for the shape contract).
    */
  private def arrayFrame(spark: SparkSession, dims: Seq[Long],
                         numeric: Array[Double],
                         strings: Array[String]): DataFrame = {
    import spark.implicits._
    val rank = dims.size
    if (strings.nonEmpty)
      strings.zipWithIndex.toSeq
        .map { case (v, i) => (i.toLong, v) }.toDF("idx", "value")
    else if (rank <= 1)
      numeric.zipWithIndex.toSeq
        .map { case (v, i) => (i.toLong, v) }.toDF("idx", "value")
    else if (rank == 2) {
      val nc = dims(1).toInt
      numeric.zipWithIndex.toSeq.map { case (v, i) =>
        ((i / nc).toLong, (i % nc).toLong, v)
      }.toDF("row", "col", "value")
    } else {
      val strides = dims.scanRight(1L)(_ * _).tail
      val rows = numeric.zipWithIndex.toSeq.map { case (v, i) =>
        org.apache.spark.sql.Row.fromSeq(
          strides.zip(dims).map { case (s, dim) => (i / s) % dim } :+ v)
      }
      val schema = org.apache.spark.sql.types.StructType(
        dims.indices.map(k => org.apache.spark.sql.types.StructField(
          s"i$k", org.apache.spark.sql.types.LongType, nullable = false)) :+
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.DoubleType, nullable = false))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows,
          math.max(1, math.min(64, rows.size / 65536))), schema)
    }
  }

  /** The npz twin of [[fromHdf5]] — the reference's `datastorage` saves
    * npz bundles too (a ZIP of `.npy` members; [[Npz]]). npz carries no
    * attributes, so the params map is empty; the table shapes are
    * identical to the HDF5 path (shared mapping).
    */
  def fromNpz(spark: SparkSession, path: String): Map[String, DataFrame] =
    Npz.read(path).map { a =>
      a.name -> arrayFrame(spark, a.dims, a.numeric, a.strings)
    }.toMap

  /** The azav-bundle pivot: a DataStorage file holding `data[nimg][nq]`
    * (+ optional `err`), the per-image `delays` and the q axis becomes
    * the engine's canonical curve table
    * `(image_idx, delay, q_bin, i[, err])` — directly consumable by the
    * E2 reduction chain ([[graft.operators.Reduction]]).
    */
  def azavFromHdf5(spark: SparkSession, path: String,
                   dataKey: String = "data", errKey: String = "err",
                   delaysKey: String = "delays"): DataFrame = {
    val f = Hdf5.read(path)
    val data = f.dataset(dataKey)
    azavCurves(spark, dataKey, data.dims, data.numeric,
      f.datasetOpt(errKey).map(_.numeric),
      delaysKey, f.dataset(delaysKey).numeric)
  }

  /** [[azavFromHdf5]]'s npz twin — same pivot, same curve table. */
  def azavFromNpz(spark: SparkSession, path: String,
                  dataKey: String = "data", errKey: String = "err",
                  delaysKey: String = "delays"): DataFrame = {
    val arrays = Npz.read(path).map(a => a.name -> a).toMap
    val data = arrays.getOrElse(dataKey, throw new NoSuchElementException(
      s"no array $dataKey in $path; have ${arrays.keys.mkString(", ")}"))
    azavCurves(spark, dataKey, data.dims, data.numeric,
      arrays.get(errKey).map(_.numeric),
      delaysKey, arrays.getOrElse(delaysKey,
        throw new NoSuchElementException(s"no array $delaysKey")).numeric)
  }

  private def azavCurves(spark: SparkSession, dataKey: String,
                         dims: Seq[Long], data: Array[Double],
                         err: Option[Array[Double]], delaysKey: String,
                         delays: Array[Double]): DataFrame = {
    import spark.implicits._
    require(dims.size == 2, s"$dataKey must be 2-D (nimg x nq)")
    val nImg = dims(0).toInt
    val nQ = dims(1).toInt
    require(delays.length == nImg,
      s"$delaysKey length ${delays.length} != $dataKey rows $nImg")
    err.foreach(e => require(e.length == data.length,
      s"err shape differs from $dataKey"))
    val rows = for (r <- 0 until nImg; c <- 0 until nQ) yield {
      val i = r * nQ + c
      (r.toLong, delays(r), c.toLong, data(i),
        err.map(_(i)).getOrElse(0.0))
    }
    rows.toDF("image_idx", "delay", "q_bin", "i", "err")
  }

  /** Write-back export — the inverse of [[fromHdf5]], making the trx
    * interop two-way: engine tables leave as an HDF5 container a user's
    * kept trx-side tooling (plots, scripts reading `datastorage` files:
    * trx/azav.py:398-408,457) can open. Tables must carry the long-form
    * shapes [[fromHdf5]] produces (`idx/value`, `row/col/value`,
    * `i0..iN/value`); slashes in table names become nested groups;
    * params become attributes (`name` at the root, `path@name`
    * elsewhere), written typed when the text parses back losslessly as
    * integer/double and as variable-length strings otherwise (h5py's own
    * default for `str`).
    *
    * Same honest scale boundary as the reader: an HDF5 file is a
    * single-node artifact, so each table is collected driver-side — the
    * right cost model for a one-time export of reduced (curve-grain)
    * results, never raw 100 TB inputs; the single-file re-read path maps
    * the container in windows (no size bound — only each decoded
    * dataset must fit a JVM array), while the DISTRIBUTED directory
    * ingest stays bounded by [[Hdf5.MaxFileBytes]] per file (binaryFile
    * hands each file to a task as one byte array).
    */
  def toHdf5(path: String, tables: Map[String, DataFrame],
             params: Map[String, String] = Map.empty): Unit = {
    val root = buildNode(splitTree(tables), params.toSeq)
    Hdf5Writer.write(path, root)
  }

  /** Typed attribute value: integers and doubles that round-trip
    * losslessly go back as numbers, everything else as a vlen string.
    */
  private def attrValue(v: String): Any =
    v.toLongOption.filter(_.toString == v)
      .orElse[Any](v.toDoubleOption.filter(_.toString == v))
      .getOrElse(Hdf5Writer.VStr(v))

  private final case class Tree(
      datasets: Map[String, DataFrame] = Map.empty,
      children: Map[String, Tree] = Map.empty)

  private def splitTree(tables: Map[String, DataFrame]): Tree =
    tables.foldLeft(Tree()) { case (t, (name, df)) =>
      def insert(node: Tree, parts: List[String]): Tree = parts match {
        case leaf :: Nil =>
          node.copy(datasets = node.datasets + (leaf -> df))
        case grp :: rest =>
          val child = node.children.getOrElse(grp, Tree())
          node.copy(children =
            node.children + (grp -> insert(child, rest)))
        case Nil => node
      }
      insert(t, name.stripPrefix("/").split("/").toList)
    }

  private def buildNode(tree: Tree,
                        params: Seq[(String, String)]): Hdf5Writer.Node = {
    // attrs owned here: no '@' → this group; 'dsName@attr' for a local
    // dataset; 'childGroup@attr' becomes attr 'attr' ON that child group
    // (h5py-side readers open f['childGroup'].attrs['attr'], so the name
    // must not stay mangled on the parent); 'child/...' routes down
    val (here, below) = params.partition(!_._1.contains("/"))
    def atPrefix(k: String): String = k.takeWhile(_ != '@')
    val (dsOwned, rest) = here.partition { case (k, _) =>
      k.contains("@") && tree.datasets.contains(atPrefix(k)) }
    val (childOwned, groupOwned) = rest.partition { case (k, _) =>
      k.contains("@") && tree.children.contains(atPrefix(k)) }
    val dsAttrs = dsOwned.groupBy(k => atPrefix(k._1)).map {
      case (ds, kvs) => ds -> kvs.map { case (k, v) =>
        k.drop(ds.length + 1) -> attrValue(v) }
    }
    val groups = tree.children.toSeq.sortBy(_._1).map { case (name, sub) =>
      val subParams = below.collect {
        case (k, v) if k.startsWith(s"$name/") => k.drop(name.length + 1) -> v
      } ++ childOwned.collect {
        case (k, v) if atPrefix(k) == name => k.drop(name.length + 1) -> v
      }
      name -> buildNode(sub, subParams)
    }
    Hdf5Writer.Node(
      datasets = tree.datasets.toSeq.sortBy(_._1).map { case (n, df) =>
        n -> datasetValue(n, df) },
      attrs = groupOwned.map { case (k, v) => k -> attrValue(v) },
      groups = groups,
      dsAttrs = dsAttrs)
  }

  /** Pivot a long-form table back to a dense array (driver-side; the
    * export cost model). Requires a complete grid — every (index)
    * combination present exactly once.
    */
  private def datasetValue(name: String, df: DataFrame): Hdf5Writer.Value = {
    val cols = df.columns.toSeq
    val idxCols = cols.filter(_ != "value")
    require(cols.contains("value") && idxCols.nonEmpty &&
      (idxCols == Seq("idx") || idxCols == Seq("row", "col") ||
        idxCols == idxCols.indices.map(i => s"i$i")),
      s"table $name must be long-form (idx/value, row+col/value, or " +
        s"i0..iN/value) to export; has ${cols.mkString(", ")}")
    val rows = df.select((idxCols :+ "value").map(df.col): _*).collect()
    val dims = idxCols.indices.map(d =>
      rows.iterator.map(_.getLong(d)).max.toInt + 1)
    val total = dims.map(_.toLong).product
    require(rows.length.toLong == total,
      s"table $name is sparse (${rows.length} rows for a " +
        s"${dims.mkString("x")} grid) — fill the grid before exporting")
    // a duplicate tuple would mask a missing cell behind the row-count
    // check (the overwrite is collect-order nondeterministic, the hole
    // exports as 0.0) — fail loudly instead
    val seen = new java.util.BitSet(total.toInt)
    def flat(r: org.apache.spark.sql.Row): Int = {
      var o = 0L
      idxCols.indices.foreach(d => o = o * dims(d) + r.getLong(d))
      val i = o.toInt
      require(!seen.get(i),
        s"table $name has a duplicate index tuple " +
          s"(${idxCols.indices.map(r.getLong).mkString(", ")}) — " +
          "deduplicate before exporting")
      seen.set(i)
      i
    }
    val isString =
      df.schema("value").dataType == org.apache.spark.sql.types.StringType
    if (isString) {
      val out = new Array[String](total.toInt)
      rows.foreach(r => out(flat(r)) = r.getString(idxCols.size))
      Hdf5Writer.VStrings(out)
    } else {
      val out = new Array[Double](total.toInt)
      val vAt = idxCols.size
      rows.foreach { r =>
        out(flat(r)) = r.get(vAt) match {
          case d: Double => d
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case f: Float => f.toDouble
          case x => x.toString.toDouble
        }
      }
      Hdf5Writer.Doubles(dims, out,
        chunked = if (total >= (1L << 16)) Some(chunkDims(dims)) else None)
    }
  }

  /** Chunk grid for large exported arrays: last axis whole (row-major
    * locality), leading axes split toward ~64k elements per chunk —
    * h5py-like defaults, shuffle+deflate applied by the writer.
    */
  private def chunkDims(dims: Seq[Int]): Seq[Int] = {
    val target = 1 << 16
    val lastAxis = dims.last.min(target)
    var budget = (target / lastAxis.max(1)).max(1)
    val leading = dims.dropRight(1).reverse.map { d =>
      val c = d.min(budget); budget = (budget / c.max(1)).max(1); c
    }.reverse
    leading :+ lastAxis
  }

  /** [[toHdf5]]'s npz twin (`java.util.zip` container, NPY v1 members):
    * numeric tables as `<f8` dense arrays, string tables as `|S` fixed
    * width (npz has no non-pickled vlen form). npz carries no
    * attributes, so params don't ride — pair with [[writeManifest]] if
    * they must travel.
    */
  def toNpz(path: String, tables: Map[String, DataFrame]): Unit = {
    // '/'→'_' flattening can collide ("a/b" and "a_b") and a duplicate
    // zip entry aborts MID-EXPORT leaving a truncated archive — check
    // up front with both offenders named
    tables.keys.groupBy(_.replace('/', '_')).foreach { case (m, ks) =>
      require(ks.size == 1,
        s"npz member name collision: ${ks.mkString(", ")} all flatten " +
          s"to $m.npy — rename the tables")
    }
    val (zfs, zp) = fsPath(path)
    val zos = new java.util.zip.ZipOutputStream(zfs.create(zp, true))
    try {
      tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
        val (dims, payload) = datasetValue(name, df) match {
          case Hdf5Writer.Doubles(d, a, _) =>
            val bb = java.nio.ByteBuffer.allocate(a.length * 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            a.foreach(bb.putDouble)
            (d, ("<f8", bb.array()))
          case Hdf5Writer.VStrings(a) =>
            val w = a.map(_.getBytes("UTF-8").length).max.max(1)
            val out = new Array[Byte](a.length * w)
            a.zipWithIndex.foreach { case (s, i) =>
              val bs = s.getBytes("UTF-8")
              System.arraycopy(bs, 0, out, i * w, bs.length) }
            (Seq(a.length), (s"|S$w", out))
          case other => throw new IllegalStateException(s"$other")
        }
        val (descr, data) = payload
        val shape = dims.map(_.toString).mkString("(", ", ",
          if (dims.size == 1) ",)" else ")")
        var header = s"{'descr': '$descr', 'fortran_order': False, " +
          s"'shape': $shape, }"
        // total header (magic+version+len+text) padded to 64, \n-ended
        val pad = 64 - ((10 + header.length + 1) % 64)
        header = header + " " * (if (pad == 64) 0 else pad) + "\n"
        val entry = new java.util.zip.ZipEntry(s"${name.replace('/', '_')}.npy")
        zos.putNextEntry(entry)
        zos.write(Array(0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0).map(_.toByte))
        zos.write(header.length & 0xff)
        zos.write((header.length >> 8) & 0xff)
        zos.write(header.getBytes("ISO-8859-1"))
        zos.write(data)
        zos.closeEntry()
      }
    } finally zos.close()
  }

  /** The azav-shaped export: the engine's canonical curve table
    * `(image_idx, delay, q_bin, i[, err])` leaves as the exact array
    * layout trx's `datastorage` bundles carry (trx/azav.py:398-408):
    * `data[nimg][nq]`, optional `err` alongside, the per-image `delays`,
    * and an optional `q` axis — directly re-openable by trx-side
    * tooling AND by [[azavFromHdf5]].
    */
  def azavToHdf5(path: String, curves: DataFrame,
                 qAxis: Option[Array[Double]] = None,
                 params: Map[String, String] = Map.empty): Unit = {
    val cols = curves.columns.toSet
    require(Set("image_idx", "delay", "q_bin", "i").subsetOf(cols),
      s"curve table needs image_idx/delay/q_bin/i; has ${cols.mkString(", ")}")
    val hasErr = cols.contains("err")
    val rows = curves.select(
      (Seq("image_idx", "q_bin", "delay", "i") ++
        (if (hasErr) Seq("err") else Nil)).map(curves.col): _*).collect()
    val nImg = rows.iterator.map(_.getLong(0)).max.toInt + 1
    val nQ = rows.iterator.map(_.getLong(1)).max.toInt + 1
    require(rows.length == nImg * nQ,
      s"curve table is sparse (${rows.length} rows for $nImg x $nQ)")
    val data = new Array[Double](nImg * nQ)
    val err = if (hasErr) Some(new Array[Double](nImg * nQ)) else None
    val delays = new Array[Double](nImg)
    val seen = new java.util.BitSet(nImg * nQ)
    rows.foreach { r =>
      val at = r.getLong(0).toInt * nQ + r.getLong(1).toInt
      require(!seen.get(at),
        s"duplicate (image_idx, q_bin) = (${r.getLong(0)}, " +
          s"${r.getLong(1)}) — deduplicate the curve table before export")
      seen.set(at)
      data(at) = r.getDouble(3)
      err.foreach(_(at) = r.getDouble(4))
      delays(r.getLong(0).toInt) = r.getDouble(2)
    }
    val ds = Seq("data" -> Hdf5Writer.Doubles(Seq(nImg, nQ), data)) ++
      err.map(e => "err" -> Hdf5Writer.Doubles(Seq(nImg, nQ), e)) ++
      qAxis.map(q => "q" -> Hdf5Writer.Doubles(Seq(q.length), q)) ++
      Seq("delays" -> Hdf5Writer.Doubles(Seq(nImg), delays))
    Hdf5Writer.write(path, Hdf5Writer.Node(datasets = ds,
      attrs = params.toSeq.map { case (k, v) => k -> attrValue(v) }))
  }

  /** DISTRIBUTED directory ingest — the scale path the single-file
    * on-ramps point at: a beamtime's worth of azav bundles (one .h5 per
    * run, thousands of runs) decodes FILE-PER-TASK across the cluster.
    * Spark's `binaryFile` source hands each matched file's bytes to one
    * task (per-file grain is exactly right: an HDF5 file has no internal
    * split points, and each stays under the documented 2 GiB bound —
    * binaryFile enforces the same JVM array limit); the pure-Scala
    * reader then runs INSIDE the task, and the union of curve tables
    * comes back as one distributed DataFrame
    * `(file, image_idx, delay, q_bin, i, err)` — re-save as Parquet once
    * and every later read is columnar. Decode failures name their file.
    *
    * Equivalent to the union of [[azavFromHdf5]] over every matched
    * file, with the driver never holding more than the plan.
    */
  def azavFromHdf5Dir(spark: SparkSession, pattern: String,
                      dataKey: String = "data", errKey: String = "err",
                      delaysKey: String = "delays"): DataFrame =
    azavDir(spark, pattern, dataKey, errKey, delaysKey, isNpz = false)

  /** [[azavFromHdf5Dir]]'s npz twin. */
  def azavFromNpzDir(spark: SparkSession, pattern: String,
                     dataKey: String = "data", errKey: String = "err",
                     delaysKey: String = "delays"): DataFrame =
    azavDir(spark, pattern, dataKey, errKey, delaysKey, isNpz = true)

  private def azavDir(spark: SparkSession, pattern: String,
                      dataKey: String, errKey: String, delaysKey: String,
                      isNpz: Boolean): DataFrame =
    azavCurvesFromBinary(
      spark.read.format("binaryFile").load(pattern),
      dataKey, errKey, delaysKey, isNpz)

  /** The per-task decode shared by the batch directory ingest and the
    * streaming on-ramp ([[graft.streaming.Online.streamingBundleIngest]]):
    * `files` is any (path, content) binary frame — a batch read or one
    * foreachBatch micro-batch.
    */
  private[graft] def azavCurvesFromBinary(files: DataFrame,
      dataKey: String, errKey: String, delaysKey: String,
      isNpz: Boolean): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
      val arrays: Map[String, (Seq[Long], Array[Double])] =
        try {
          if (isNpz)
            Npz.readBytes(bytes, path)
              .map(a => a.name -> ((a.dims, a.numeric))).toMap
          else {
            val f = Hdf5.readBytes(bytes)
            val base = f.datasets
              .map(d => d.path.stripPrefix("/") -> ((d.dims, d.numeric)))
              .toMap
            // hard-link alias paths serve the canonical array, so the
            // requested key matches no matter which diamond path it is
            base ++ f.aliases.flatMap { case (a, c) =>
              base.get(c.stripPrefix("/")).map(a.stripPrefix("/") -> _) }
          }
        } catch { case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"$path: bundle decode failed — ${e.getMessage}", e)
        }
      def need(k: String) = arrays.getOrElse(k,
        throw new NoSuchElementException(
          s"$path: no array $k; have ${arrays.keys.mkString(", ")}"))
      val (dims, data) = need(dataKey)
      require(dims.size == 2, s"$path: $dataKey must be 2-D (nimg x nq)")
      val nImg = dims(0).toInt
      val nQ = dims(1).toInt
      val delays = need(delaysKey)._2
      require(delays.length == nImg,
        s"$path: $delaysKey length ${delays.length} != $dataKey rows $nImg")
      val err = arrays.get(errKey).map(_._2)
      err.foreach(e => require(e.length == data.length,
        s"$path: err shape differs from $dataKey"))
      for (r <- 0 until nImg; c <- 0 until nQ) yield {
        val i = r * nQ + c
        (path, r.toLong, delays(r), c.toLong, data(i),
          err.map(_(i)).getOrElse(0.0))
      }
    }.toDF("file", "image_idx", "delay", "q_bin", "i", "err")
  }

  /** T2 — parameter-hash cache invalidation (trx/azav.py:303-343): a saved
    * bundle is reusable iff its manifest matches the requested parameters;
    * returns the (param, old, new) diffs otherwise, mirroring the
    * reference's detailed warn.
    */
  def invalidationDiff(dir: String,
                       requested: Map[String, String]): Option[Seq[(String, Option[String], Option[String])]] =
    readManifest(dir).map { saved =>
      (saved.keySet ++ requested.keySet).toSeq.sorted.flatMap { k =>
        val (o, n) = (saved.get(k), requested.get(k))
        if (o == n) None else Some((k, o, n))
      }
    }

  /** True when a saved bundle can be reused as-is. */
  def isValid(dir: String, requested: Map[String, String]): Boolean =
    invalidationDiff(dir, requested).exists(_.isEmpty)
}
