package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Text-format sinks (SURVEY §2.2).
  *
  * Reference: trx/utils/misc.py:36-65 (K2 matrix save with `# key : value`
  * header), trx/dataReduction.py:245-291 (K4 reduced-data report),
  * trx/utils/misc.py:67-80 (K5 topas `.xy`), trx/mask.py:146-155 (K6 mask
  * save), trx/azav.py:385-387 (K3 per-image chi files).
  *
  * K2/K4/K5 format REDUCED data (n_delays × nQ — thousands of rows), so a
  * driver-side collect is the correct scale choice; K3 writes one file per
  * image and stays distributed via partitionBy.
  */
object TextSinks {

  private def fmt(v: Any): String = v match {
    case null => "nan"
    case d: Double if d.isNaN => "nan"
    case d: Double => f"$d%.9g"
    case x => x.toString
  }

  /** K2 — save a long-form table as a `(key, cols...)` text matrix with
    * `# key : value` header lines and a `# col` caption line.
    * `df` must be small (reduced data); enforced by a row cap.
    */
  def saveMatrixTxt(df: DataFrame, path: String,
                    header: Map[String, String] = Map.empty,
                    maxRows: Int = 1000000): Unit = {
    val rows = df.collect()
    require(rows.length <= maxRows, s"saveMatrixTxt is for reduced data (${rows.length} rows)")
    val sb = new StringBuilder
    header.toSeq.sortBy(_._1).foreach { case (k, v) => sb.append(s"# $k : $v\n") }
    sb.append(df.columns.mkString("# ", " ", "\n"))
    rows.foreach { r =>
      sb.append((0 until r.length).map(i => fmt(r.get(i))).mkString(" ")).append('\n')
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), sb.toString)
  }

  /** K4 — reduced-data report: one matrix file of per-delay averages, one
    * of errors, plus a per-delay 3-column (q, diff, err) file named by the
    * formatted delay (trx/dataReduction.py:245-291). `reduced` has grain
    * (delay, q_bin) with columns diff_av, err and a q column.
    */
  def saveReducedReport(reduced: DataFrame, outDir: String,
                        delayCol: String = "delay", qCol: String = "q",
                        valueCol: String = "diff_av", errCol: String = "err"): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val rows = reduced.select(col(delayCol), col(qCol), col(valueCol), col(errCol))
      .orderBy(delayCol, qCol).collect()
    val byDelay = rows.groupBy(_.getAs[Double](delayCol)).toSeq.sortBy(_._1)
    val qAxis = rows.map(_.getAs[Double](qCol)).distinct.sorted

    def matrix(get: Row => Any): String = {
      val sb = new StringBuilder
      sb.append("# q " + byDelay.map(d => graft.functions.TimeFunctions.timeToStrScala(d._1)).mkString(" ") + "\n")
      qAxis.foreach { q =>
        val vals = byDelay.map { case (_, rs) =>
          rs.find(_.getAs[Double](qCol) == q).map(get).map(fmt).getOrElse("nan")
        }
        sb.append(fmt(q) + " " + vals.mkString(" ") + "\n")
      }
      sb.toString
    }
    Files.writeString(Paths.get(outDir, "diff_av_matrix.txt"),
      matrix(_.getAs[Double](valueCol)))
    Files.writeString(Paths.get(outDir, "diff_av_matrix_err.txt"),
      matrix(_.getAs[Double](errCol)))

    byDelay.foreach { case (delay, rs) =>
      val name = s"diff_av_${graft.functions.TimeFunctions.timeToStrScala(delay)}.txt"
      val sb = new StringBuilder("# q diff err\n")
      rs.sortBy(_.getAs[Double](qCol)).foreach { r =>
        sb.append(s"${fmt(r.getAs[Double](qCol))} ${fmt(r.getAs[Double](valueCol))} ${fmt(r.getAs[Double](errCol))}\n")
      }
      Files.writeString(Paths.get(outDir, name), sb.toString)
    }
  }

  /** K5 — topas `.xy` export: per-delay 2-column (twotheta_deg, value)
    * files (trx/utils/misc.py:67-80).
    */
  def saveTopasXy(reduced: DataFrame, outDir: String,
                  delayCol: String = "delay", tthCol: String = "twotheta_deg",
                  valueCol: String = "diff_plus_ref"): Unit = {
    Files.createDirectories(Paths.get(outDir))
    reduced.select(col(delayCol), col(tthCol), col(valueCol))
      .orderBy(delayCol, tthCol).collect()
      .groupBy(_.getAs[Double](delayCol)).foreach { case (delay, rs) =>
        val name = s"${graft.functions.TimeFunctions.timeToStrScala(delay)}.xy"
        val sb = new StringBuilder
        rs.foreach(r => sb.append(
          s"${fmt(r.getAs[Double](tthCol))} ${fmt(r.getAs[Double](valueCol))}\n"))
        Files.writeString(Paths.get(outDir, name), sb.toString)
      }
  }

  /** K3 — one `(q, i, err)` text file per image, named after the image
    * (trx/azav.py:385-387). Distributed: partitioned CSV write, one
    * directory per image.
    */
  def saveChiFiles(curves: DataFrame, outDir: String): Unit =
    curves.select(col("image_id"), col("q"), col("i"), col("err"))
      .repartition(col("image_id"))
      .sortWithinPartitions(col("image_id"), col("q"))
      .write.mode("overwrite").partitionBy("image_id")
      .option("delimiter", " ").csv(outDir)

  /** K6 — boolean mask → uint8-style EDF file (True = 1.0 = masked out),
    * optional invert (trx/mask.py:146-155). The mask grid is evaluated on
    * the driver from the predicate — masks are per-geometry, not per-image.
    */
  def saveMaskEdf(mask: (Int, Int) => Boolean, width: Int, height: Int,
                  path: String, invert: Boolean = false): Unit = {
    val data = new Array[Double](width * height)
    for (y <- 0 until height; x <- 0 until width) {
      val m = mask(x, y) ^ invert
      data(y * width + x) = if (m) 1.0 else 0.0
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), ImageSource.encodeEdf(width, height, data))
  }
}
