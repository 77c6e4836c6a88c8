package graft.sources

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** `spark.read.format("graft-edf").load(folder)` — ESRF EDF frames
  * (plain or gzipped) as a REGISTERED frame-grain source (reference:
  * trx's azav folder scan, azav.py:490-540), replacing the
  * binaryFile+flatMap on-ramp with a planner-integrated one:
  *
  *  - **partition = frame**: one file is one task, the natural decode
  *    grain (binaryFile would pack several compressed frames into one
  *    128 MB partition and serialize their decode); at beamtime scale
  *    (10⁵-10⁶ frames) `option("maxFramesPerTask", n)` bin-packs n
  *    frames per task so the scheduler sees ceil(N/n) tasks while decode
  *    stays per-frame, and `option("limit", n)` bounds a quick-look scan
  *    to the first n frames by name;
  *  - **projection pushdown**: if `data` is not required — a
  *    mask/geometry scan asking for `width`/`height` only — the task
  *    decodes the HEADER prefix and never inflates or copies the ~8 MB
  *    pixel payload ([[ImageSource.decodeEdfHeaderDims]]);
  *  - **file pruning on frame metadata**: pushed `EqualTo` / `In` /
  *    `StringStartsWith` filters on `image_id` (the file name, the only
  *    pre-read metadata) drop files BEFORE any byte is read. Superset
  *    guarantee: every filter is also declared unhandled, so Spark
  *    re-applies the exact predicate — row-identical to a full scan.
  *
  * Schema: `(image_id STRING, width INT, height INT, data ARRAY<DOUBLE>)`
  * — row-major pixels, the same frame the fused kernels consume.
  */
class EdfSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-edf"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-edf needs a path: spark.read.format(\"graft-edf\").load(dir)"))
    EdfRelation(sqlContext.sparkSession, path,
      parameters.getOrElse("pathGlobFilter", "*.edf*"),
      maxFramesPerTask =
        parameters.get("maxFramesPerTask").map(_.toInt).getOrElse(1),
      limit = parameters.get("limit").map(_.toInt).getOrElse(-1))
  }
}

object EdfSource {
  /** (files kept, files total, payload decoded?) of the most recent
    * buildScan on this driver — a TEST-ONLY observability hook (the
    * specs asserting that pruning and header-only projection actually
    * happened): process-global, so two concurrent scans interleave
    * their writes and the value is meaningful only in single-scan
    * test flows. Nothing in the engine reads it.
    */
  private[graft] val lastScan =
    new AtomicReference[(Int, Int, Boolean)]((0, 0, false))
}

case class EdfRelation(spark: SparkSession, path: String, glob: String,
                       maxFramesPerTask: Int = 1, limit: Int = -1)
    extends BaseRelation with PrunedFilteredScan {

  require(maxFramesPerTask >= 1,
    s"graft-edf: maxFramesPerTask=$maxFramesPerTask must be >= 1")

  override def sqlContext: SQLContext = spark.sqlContext

  override val schema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("data", ArrayType(DoubleType))))

  // file pruning is a superset guarantee — Spark re-applies everything
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters

  /** Frame paths under `path`. A plain directory (the 10⁵-10⁶-frame
    * beamtime shape) lists through the FileSystem's RemoteIterator with
    * a name-only glob match — the driver holds one path STRING per
    * frame, never a FileStatus array per `globStatus` (whose block
    * locations and permissions dominate memory at that count). Paths
    * that are themselves globs (or single files) keep the globStatus
    * path — their expansion is the user's explicit file set.
    */
  private def listFrames(): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val isDir = fs.getFileStatus(p).isDirectory
    val names =
      if (isDir && glob.contains("/")) {
        // a path-shaped glob ("sub/*.edf") cannot match a bare file NAME
        // — honor it with the explicit globStatus expansion the pre-
        // iterator listing used, instead of silently matching nothing
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(p, glob)))
          .map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.isFile)
          .map(_.getPath.toString)
      } else if (isDir) {
        val matcher = new org.apache.hadoop.fs.GlobFilter(glob)
        val it = fs.listStatusIterator(p)
        val buf = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && matcher.accept(
              new org.apache.hadoop.fs.Path(st.getPath.getName)))
            buf += st.getPath.toString
        }
        buf.result()
      } else
        Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.isFile)
          .map(_.getPath.toString)
    names.sorted
  }

  /** Name-derived keep-predicate from the pushed filters: only
    * conjuncts on `image_id` with literal shapes we can evaluate
    * pre-read narrow the list; everything else keeps (conservative).
    */
  private def nameKeep(filters: Array[Filter]): String => Boolean = {
    def conjuncts(f: Filter): Seq[Filter] = f match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case o => Seq(o)
    }
    val preds = filters.flatMap(conjuncts).collect {
      case EqualTo("image_id", v: String) => (n: String) => n == v
      case In("image_id", vs) if vs.forall(_.isInstanceOf[String]) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        (n: String) => set.contains(n)
      case StringStartsWith("image_id", p) => (n: String) => n.startsWith(p)
    }
    n => preds.forall(_(n))
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val all = listFrames()
    val keep = nameKeep(filters)
    val kept0 = all.filter(f => keep(f.substring(f.lastIndexOf('/') + 1)))
    // limit-N (first N frames in name order, after pruning) — the S2
    // quick-look contract: bound a scan without listing-side surprises
    val kept = if (limit >= 0) kept0.take(limit) else kept0
    val needData = requiredColumns.contains("data")
    EdfSource.lastScan.set((kept.size, all.size, needData))
    val cols = requiredColumns.toSeq
    val sc = spark.sparkContext
    if (kept.isEmpty) return sc.emptyRDD[Row]
    // the DRIVER's Hadoop conf rides to the tasks (fs.* auth/settings
    // would silently vanish under a fresh task-side Configuration)
    val confB = sc.broadcast(new org.apache.spark.SerializableWritable(
      spark.sessionState.newHadoopConf()))
    // one frame = one task (the decode grain, never the byte-size grain)
    // by default; a million-frame beamtime sets maxFramesPerTask to
    // bin-pack — scheduler overhead per task then amortizes over the
    // bundle while decode stays per-frame inside the task iterator
    val nTasks = math.max(1,
      (kept.size + maxFramesPerTask - 1) / maxFramesPerTask)
    sc.parallelize(kept, nTasks).map { fileStr =>
      val name = fileStr.substring(fileStr.lastIndexOf('/') + 1)
      val gz = fileStr.endsWith(".gz")
      val hp = new org.apache.hadoop.fs.Path(fileStr)
      val fs = hp.getFileSystem(confB.value.value)
      if (needData) {
        val in = fs.open(hp)
        val bytes = try in.readAllBytes() finally in.close()
        val (w, h, data) = ImageSource.decodeEdf(bytes, gz)
        Row.fromSeq(cols.map {
          case "image_id" => name
          case "width" => w
          case "height" => h
          case "data" => data.toSeq
        })
      } else {
        // header-only: the payload is never inflated or copied
        val (w, h) = ImageSource.decodeEdfHeaderDims(() => fs.open(hp), gz)
        Row.fromSeq(cols.map {
          case "image_id" => name
          case "width" => w
          case "height" => h
          case "data" => null
        })
      }
    }
  }
}
