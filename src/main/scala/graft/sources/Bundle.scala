package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

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

  private def manifestPath(dir: String): Path = Paths.get(dir, "manifest.json")

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Atomic: several stores (notably [[graft.operators.Snapshot]]'s SCD2
    * history) use the manifest write as the COMMIT point of a multi-file
    * refresh — a torn manifest would param-mismatch on the next read and
    * trigger a full store rebuild, silently destroying committed state.
    * Writing to a temp file and renaming with ATOMIC_MOVE guarantees a
    * reader sees either the old manifest or the new one, never a prefix.
    */
  def writeManifest(dir: String, params: Map[String, String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, "manifest.json.tmp")
    Files.writeString(tmp, manifestJson(params))
    Files.move(tmp, manifestPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
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
    val p = manifestPath(dir)
    if (!Files.exists(p)) None
    else Some(parseManifest(Files.readString(p)))
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

  /** Recursive local-filesystem delete (no-op if absent) — used by the T2
    * invalidation paths to drop stale curve stores / stream checkpoints.
    */
  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val f = new java.io.File(path)
    if (f.exists()) rm(f)
  }

  /** Save tables + manifest (overwrite). */
  def save(dir: String, tables: Map[String, DataFrame],
           params: Map[String, String] = Map.empty): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    writeManifest(dir, params)
  }

  /** Reopen a saved bundle (S9). */
  def load(spark: SparkSession, dir: String): Map[String, DataFrame] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val name = p.getFileName.toString.stripSuffix(".parquet")
        name -> spark.read.parquet(p.toString)
      }.toMap

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
      val v = a.string.getOrElse {
        val d = a.numeric.head
        if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
        else d.toString
      }
      key -> v
    }.toMap
    (tables, params)
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
      f.datasets.find(_.path.stripPrefix("/") == errKey).map(_.numeric),
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
