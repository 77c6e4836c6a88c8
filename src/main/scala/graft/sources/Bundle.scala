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
