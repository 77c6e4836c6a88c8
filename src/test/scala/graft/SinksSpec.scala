package graft

import java.nio.file.{Files, Paths}
import graft.sources.{ImageSource, TextSinks}

/** K2–K6 text/EDF sinks. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("saveMatrixTxt writes header comments, captions, and rows") {
    val dir = Files.createTempDirectory("k2")
    val df = Seq((0.1, 1.0), (0.2, 2.0)).toDF("q", "i")
    val path = dir.resolve("m.txt").toString
    TextSinks.saveMatrixTxt(df, path, Map("nQ" -> "2", "run" -> "test"))
    val lines = Files.readAllLines(Paths.get(path))
    assert(lines.get(0) == "# nQ : 2")
    assert(lines.get(1) == "# run : test")
    assert(lines.get(2) == "# q i")
    assert(lines.get(3).startsWith("0.1"))
  }

  test("saveReducedReport writes matrices and per-delay files") {
    val dir = Files.createTempDirectory("k4").toString
    val reduced = Seq(
      (0.0, 0.1, 1.0, 0.01), (0.0, 0.2, 2.0, 0.02),
      (1e-9, 0.1, 3.0, 0.03), (1e-9, 0.2, 4.0, 0.04))
      .toDF("delay", "q", "diff_av", "err")
    TextSinks.saveReducedReport(reduced, dir)
    val files = Files.list(Paths.get(dir)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(files)
      .asScala.map(_.getFileName.toString).toSet
    assert(names.contains("diff_av_matrix.txt"))
    assert(names.contains("diff_av_matrix_err.txt"))
    assert(names.contains("diff_av_+0.00s.txt"))
    assert(names.contains("diff_av_+1.00ns.txt"))
    val matrix = Files.readAllLines(Paths.get(dir, "diff_av_matrix.txt"))
    assert(matrix.get(0) == "# q +0.00s +1.00ns")
    assert(matrix.size == 3) // header + 2 q rows
  }

  test("saveTopasXy writes per-delay 2-column files") {
    val dir = Files.createTempDirectory("k5").toString
    val df = Seq((0.0, 10.0, 5.0), (0.0, 20.0, 6.0))
      .toDF("delay", "twotheta_deg", "diff_plus_ref")
    TextSinks.saveTopasXy(df, dir)
    val content = Files.readString(Paths.get(dir, "+0.00s.xy"))
    assert(content.linesIterator.size == 2)
    assert(content.startsWith("10.0"))
  }

  test("saveChiFiles partitions by image") {
    val dir = Files.createTempDirectory("k3").toString + "/chi"
    val curves = Seq(("imgA", 0.1, 1.0, 0.1), ("imgB", 0.1, 2.0, 0.1))
      .toDF("image_id", "q", "i", "err")
    TextSinks.saveChiFiles(curves, dir)
    val parts = Files.list(Paths.get(dir)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(parts)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("image_id=")).toSet
    assert(names == Set("image_id=imgA", "image_id=imgB"))
  }

  test("saveMaskEdf round-trips through the EDF decoder, honors invert") {
    val dir = Files.createTempDirectory("k6")
    val p = dir.resolve("mask.edf").toString
    TextSinks.saveMaskEdf((x, y) => x < 2, 4, 3, p)
    val (w, h, data) = ImageSource.decodeEdf(Files.readAllBytes(Paths.get(p)), gzipped = false)
    assert((w, h) == (4, 3))
    assert(data(0) == 1.0 && data(2) == 0.0)
    TextSinks.saveMaskEdf((x, y) => x < 2, 4, 3, p, invert = true)
    val (_, _, inv) = ImageSource.decodeEdf(Files.readAllBytes(Paths.get(p)), gzipped = false)
    assert(inv(0) == 0.0 && inv(2) == 1.0)
  }
}
