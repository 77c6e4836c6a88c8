package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, functions}
import org.apache.spark.sql.functions._
import graft.functions.TimeFunctions
import scala.jdk.CollectionConverters._

/** Beamline log ingestion.
  *
  * Reference: trx/utils/files.py:31-82 (`readLogFile`: whitespace table,
  * `#` comment lines, header = LAST comment line, per-column converters,
  * skip_first/skip_last), trx/id9.py:27-56 (`readDiagnostic`),
  * trx/id9.py:112-188 (id9 log variant: delay-string conversion, ring-
  * current filter), trx/id9.py:338-362 (motor dump).
  *
  * Design: the header line is resolved driver-side (logs are metadata-sized;
  * one `take` over the comment prefix), then the body parses distributedly —
  * `spark.read.text` + regexp split — so a directory of thousands of log
  * files still scans in parallel.
  */
object LogReader {

  /** Generic whitespace-table reader with `#`-comment header extraction. */
  def readLogFile(spark: SparkSession, path: String,
                  skipFirst: Int = 0, skipLast: Int = 0): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    // Header = last `#` line of the leading comment block (files.py:47-53).
    val prefix = lines.take(1000).takeWhile(_.startsWith("#"))
    require(prefix.nonEmpty, s"no # header found in $path")
    val colNames = prefix.last.stripPrefix("#").trim.split("\\s+").toSeq

    val data = lines.filter(l => !l.startsWith("#") && l.trim.nonEmpty)
    val splitDf = data.toDF("line")
      .withColumn("_id", monotonically_increasing_id())
      .withColumn("_f", functions.split(trim(col("line")), "\\s+"))
    val typed = colNames.zipWithIndex.foldLeft(splitDf) { case (df, (name, i)) =>
      df.withColumn(name, element_at(col("_f"), i + 1))
    }.drop("line", "_f")

    // skip_first / skip_last (files.py:59) — positional slice via the
    // distributed rank (Positional.skipSlice), not a global window
    val sliced = graft.operators.Positional.skipSlice(
      typed, Seq(col("_id")), skipFirst, skipLast)
    sliced.drop("_id")
  }

  /** id9-style log: S3 + delay string→seconds + ring-current filter
    * (trx/id9.py:112-153). Expects `delay` and `currentmA` columns when
    * present; missing columns pass through untouched.
    */
  def readId9Log(spark: SparkSession, path: String,
                 srcurMin: Double = 30.0): DataFrame = {
    var df = readLogFile(spark, path)
    if (df.columns.contains("delay"))
      df = df.withColumn("delay", TimeFunctions.strToTime(col("delay")))
    if (df.columns.contains("currentmA"))
      df = df.filter(col("currentmA").cast("double") > srcurMin)
    df
  }

  /** Diagnostics reader (trx/id9.py:27-56): columns 2 (file) and 3 (delay);
    * drop non-finite delays; basename the file; round(delay, 12).
    * The reference's 4×0.2 s read-retry is an ingestion-time concern handled
    * by the streaming source's file-completion semantics.
    */
  def readDiagnostic(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path)
      .filter(l => !l.startsWith("#") && l.trim.nonEmpty)
      .toDF("line")
      .withColumn("_f", split(trim(col("line")), "\\s+"))
      .select(
        TimeFunctions.basename(element_at(col("_f"), 3)).as("file"),
        TimeFunctions.canonicalDelay(
          TimeFunctions.safeFloat(element_at(col("_f"), 4))).as("delay"))
      .filter(col("delay").isNotNull && !isnan(col("delay")))
  }

  /** J2 — log↔image reconciliation (trx/azav.py:351-356): keep only log
    * rows whose file still exists in the image set (images may have been
    * deleted); returns the surviving rows plus the dropped count for the
    * reference's warning.
    */
  def reconcileLog(log: DataFrame, images: DataFrame,
                   fileCol: String = "file"): (DataFrame, Long) = {
    val kept = log.join(images.select(col(fileCol)).distinct(),
      Seq(fileCol), "left_semi")
    (kept, log.count() - kept.count())
  }

  /** J6 — dark-current correction (trx/id9.py:130-143): per-diode dark
    * rates (parsed from log comments on the driver) are subtracted as
    * `pd_i − dark_i · timeic` — broadcast scalars, plain column math.
    */
  def applyDarks(log: DataFrame, darks: Map[String, Double],
                 integrationTimeCol: String = "timeic"): DataFrame =
    darks.foldLeft(log) { case (df, (colName, rate)) =>
      if (df.columns.contains(colName))
        df.withColumn(colName,
          col(colName).cast("double") - col(integrationTimeCol).cast("double") * rate)
      else df
    }

  /** T4 — tolerant read of partially-written files (trx/id9.py:27-40):
    * retry a driver-side read a few times before giving up.
    */
  def withRetry[A](attempts: Int = 4, sleepMs: Long = 200)(f: => A): A = {
    var left = attempts
    var last: Throwable = null
    while (left > 0) {
      try return f
      catch { case e: Throwable => last = e; left -= 1
        if (left > 0) Thread.sleep(sleepMs) }
    }
    throw last
  }

  /** Motor dump (trx/id9.py:338-362): named columns, drop interleaved
    * repeated header rows, output (name, user, dial).
    */
  def readMotorDump(spark: SparkSession, path: String): DataFrame =
    readLogFile(spark, path)
      .filter(col("name") =!= "name")
      .select(col("name"),
        col("user").cast("double").as("user"),
        col("dial").cast("double").as("dial"))

  /** S8 — ESRF SPEC file reader (trx/utils/spec.py:23-73): line-oriented
    * state machine: `#S n ...` starts a scan, `#L` carries space-separated
    * column labels, `#O`/`#P` carry motor names/positions, data rows until
    * the next control line. SPEC files are metadata-sized → parsed on the
    * driver, returned as one DataFrame with a `scan` column (plus the
    * motor snapshot per scan).
    */
  def readSpec(spark: SparkSession, path: String)
      : (DataFrame, Map[Int, Map[String, Double]]) = {
    import spark.implicits._
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala
    var scan = -1
    var labels: Seq[String] = Nil
    var motorNames: Seq[String] = Vector()
    val rows = scala.collection.mutable.ArrayBuffer[(Int, Seq[Double])]()
    val scanLabels = scala.collection.mutable.Map[Int, Seq[String]]()
    val motors = scala.collection.mutable.Map[Int, Map[String, Double]]()
    var pendingMotorVals = scala.collection.mutable.ArrayBuffer[Double]()
    lines.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("#S")) {
        scan = line.split("\\s+")(1).toInt
        pendingMotorVals = scala.collection.mutable.ArrayBuffer[Double]()
      } else if (line.startsWith("#O")) {
        motorNames = motorNames ++ line.split("\\s+").drop(1)
      } else if (line.startsWith("#P")) {
        pendingMotorVals ++= line.split("\\s+").drop(1).map(_.toDouble)
        if (scan >= 0)
          motors(scan) = motorNames.zip(pendingMotorVals).toMap
      } else if (line.startsWith("#L")) {
        labels = line.stripPrefix("#L").trim.split("\\s{2,}|\\s").toSeq
        scanLabels(scan) = labels
      } else if (line.nonEmpty && !line.startsWith("#") && scan >= 0) {
        val vals = line.split("\\s+").flatMap(v => scala.util.Try(v.toDouble).toOption)
        if (vals.length == labels.length) rows += ((scan, vals.toSeq))
      }
    }
    val allLabels = scanLabels.values.flatten.toSeq.distinct
    val df = rows.toSeq.map { case (s, vs) =>
      val byName = scanLabels(s).zip(vs).toMap
      (s, allLabels.map(l => byName.get(l)))
    }.toDF("scan", "vals")
      .select(col("scan") +: allLabels.zipWithIndex.map { case (l, i) =>
        col("vals").getItem(i).as(l)
      }: _*)
    (df, motors.toMap)
  }

  /** G14 — run duration between "HH:MM:SS" strings with midnight wrap
    * (trx/id9.py:69-85). Driver-side run metadata.
    */
  def timesToDurationSec(start: String, end: String): Int = {
    def sec(s: String): Int = {
      val p = s.split(":").map(_.toInt)
      p(0) * 3600 + p(1) * 60 + (if (p.length > 2) p(2) else 0)
    }
    val d = sec(end) - sec(start)
    if (d < 0) d + 24 * 3600 else d
  }

  /** G15 — parse "time between pulses" from log comment lines
    * (trx/id9.py:87-97): returns the repetition rate in Hz.
    */
  def readReprate(commentLines: Seq[String]): Option[Double] = {
    val re = """time between pulses.*?([0-9.eE+-]+)\s*(\w*)""".r
    commentLines.collectFirst {
      case l if re.findFirstMatchIn(l).isDefined =>
        val m = re.findFirstMatchIn(l).get
        val v = m.group(1).toDouble
        val unit = m.group(2).toLowerCase
        val factor = unit match {
          case "ms" => 1e-3; case "us" => 1e-6; case "ns" => 1e-9
          case _ => 1.0
        }
        1.0 / (v * factor)
    }
  }

  /** chi file (trx/azav.py:576-578): 2-column (q, i) text, optional scale. */
  def readChi(spark: SparkSession, path: String, scale: Double = 1.0): DataFrame =
    spark.read.textFile(path)
      .filter(l => !l.startsWith("#") && l.trim.nonEmpty)
      .toDF("line")
      .withColumn("_f", split(trim(col("line")), "\\s+"))
      .select(
        element_at(col("_f"), 1).cast("double").as("q"),
        (element_at(col("_f"), 2).cast("double") * scale).as("i"))
}
