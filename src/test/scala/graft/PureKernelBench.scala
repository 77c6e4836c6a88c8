package graft

/** Single-thread, no-Spark decomposition of the fused kernel's cost:
  * gzip inflate, EDF decode, bin-map build, accumulate — per stage, on
  * one 1 Mpix frame (warm, 50 reps). `sbt "Test/runMain graft.PureKernelBench"`.
  */
object PureKernelBench {
  def main(args: Array[String]): Unit = {
    val w = 1024; val h = 1024
    val data = Array.tabulate(w * h)(i => ((i * 31) % 1000).toDouble)
    val raw = graft.sources.ImageSource.encodeEdf(w, h, data)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    val gzBytes = bos.toByteArray

    val g = graft.functions.ScatteringFunctions.Poni(
      dist = 0.1, poni1 = 0.05, poni2 = 0.05,
      pixel1 = 1e-4, pixel2 = 1e-4, wavelengthA = 1.0)
    val grid = graft.operators.Azav.QGrid(0.0, 6.5, 100)

    def time(name: String, reps: Int)(f: => Unit): Unit = {
      f; f // warm
      val t0 = System.nanoTime()
      var i = 0; while (i < reps) { f; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[pure-kernel] $name%-22s ${dt * 1000}%8.2f ms/frame  " +
        f"${w * h / dt / 1e6}%8.1f Mpix/s/core")
    }
    time("decode (gz)", 50) {
      graft.sources.ImageSource.decodeEdf(gzBytes, gzipped = true)
    }
    time("decode (raw)", 50) {
      graft.sources.ImageSource.decodeEdf(raw, gzipped = false)
    }
    val bins = graft.operators.Azav.geometryBins(g, grid, w, h)
    time("bin-map build (cold)", 5) {
      // bypass the cache: a fresh grid each rep (different nQ wiggle
      // would change semantics; vary qMax in the 15th decimal instead)
      val g2 = grid.copy(qMax = grid.qMax + (System.nanoTime() % 97) * 1e-15)
      graft.operators.Azav.geometryBins(g, g2, w, h)
    }
    val nQ = grid.nQ
    time("accumulate", 50) {
      val sums = new Array[Double](nQ); val counts = new Array[Long](nQ)
      var i = 0
      while (i < data.length) {
        val b = bins(i)
        if (b >= 0) { sums(b) += data(i); counts(b) += 1 }
        i += 1
      }
    }
  }
}
