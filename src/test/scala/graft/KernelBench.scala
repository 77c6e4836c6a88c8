package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible micro-harness for the fused image-ingest kernel
  * (`ImageSource.readFrames` |> `Azav.integrateFrames`): 24 × 1 Mpix
  * gzipped double-EDF frames, local[32], 1 untimed warmup + 3 timed
  * suite runs — the numbers in SCALE.md's kernel table. Run with
  * `sbt "Test/runMain graft.KernelBench"`. A main, not a suite: it
  * never runs with `sbt test`.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val w = 1024; val h = 1024; val nFrames = sys.env.getOrElse("KB_FRAMES", "192").toInt
    val dir = java.nio.file.Files.createTempDirectory("kernel_bench")
    (0 until nFrames).foreach { k =>
      val data = Array.tabulate(w * h)(i => ((i * 31 + k * 7) % 1000).toDouble)
      val raw = graft.sources.ImageSource.encodeEdf(w, h, data)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(raw); gz.close()
      java.nio.file.Files.write(dir.resolve(f"f$k%03d.edf.gz"),
        bos.toByteArray)
    }

    val g = graft.functions.ScatteringFunctions.Poni(
      dist = 0.1, poni1 = 0.05, poni2 = 0.05,
      pixel1 = 1e-4, pixel2 = 1e-4, wavelengthA = 1.0)
    val grid = graft.operators.Azav.QGrid(0.0, 6.5, 100)

    // one frame = one task (binaryFile would otherwise pack ~16 of the
    // 8 MB files into one 128 MB partition and serialize the decode)
    spark.conf.set("spark.sql.files.maxPartitionBytes", (4L << 20).toString)
    def once(fused: Boolean): Double = {
      val binary = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.edf.gz").load(dir.toString)
      val t0 = System.nanoTime()
      val df =
        if (fused) graft.operators.Azav.integrateBinary(binary, g, grid)
        else graft.operators.Azav.integrateFrames(
          graft.sources.ImageSource.readFrames(binary), g, grid)
      df.agg(sum(col("i"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val mpix = nFrames.toDouble * w * h / 1e6
    for (fused <- Seq(false, true)) {
      once(fused) // warmup (JIT + codegen + geometry cache + page cache)
      val times = (1 to 3).map(_ => once(fused))
      val label = if (fused) "fused-binary" else "frame-hop   "
      times.foreach(t => println(
        f"[kernel-bench] $label ${mpix / t}%.1f Mpix/s total, " +
          f"${mpix / t / 32}%.2f Mpix/s/core ($t%.3f s for $mpix%.1f Mpix)"))
    }
    spark.stop()
  }
}
