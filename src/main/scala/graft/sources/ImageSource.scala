package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.util.zip.GZIPInputStream
import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Detector-image ingestion: EDF frames → pixel-exploded long table.
  *
  * Reference: trx/azav.py:29-47 (`_read`/`read` via fabio, incl. `.gz`),
  * duplicated at trx/mask.py:26-31 and trx/center.py:22-36.
  *
  * Spark design: `spark.read.format("binaryFile")` lists and reads frames
  * in parallel (one task per file — the natural partition grain: one
  * detector shot); a typed `flatMap` decodes the (public, ESRF-documented)
  * EDF layout — ASCII `key = value ;` header in braces, then a raw binary
  * blob — directly into `(image_id, y, x, intensity)` rows. This is the one
  * generator-shaped operator in the engine (SURVEY §2.8): one 4 MB binary →
  * ~4M pixel rows, after which everything is relational.
  */
object ImageSource {

  final case class Pixel(image_id: String, y: Int, x: Int, intensity: Double)

  /** Decode one EDF payload (optionally gzipped) to row-major doubles.
    * Supports the common EDF `DataType`s; header fields per the public
    * ESRF EDF description.
    */
  def decodeEdf(bytes: Array[Byte], gzipped: Boolean): (Int, Int, Array[Double]) = {
    val raw =
      if (gzipped) {
        // 64 KB inflater buffer (the 512-byte default costs ~2× on MB
        // payloads) + a size hint so the output buffer doesn't re-grow
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
        val out = new java.io.ByteArrayOutputStream(
          math.min(bytes.length.toLong * 4, 1L << 27).toInt)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } else bytes

    // Header: starts with '{', ends with '}' padded to a 512-byte multiple.
    val headerEnd = raw.indexOf('}'.toByte)
    require(headerEnd > 0, "not an EDF file (no header brace)")
    val header = new String(raw, 0, headerEnd + 1, "ISO-8859-1")
    def field(key: String): Option[String] = {
      val re = ("(?m)^\\s*" + key + "\\s*=\\s*([^;]+);").r
      re.findFirstMatchIn(header).map(_.group(1).trim)
    }
    val dim1 = field("Dim_1").map(_.toInt).getOrElse(0) // fast axis (x)
    val dim2 = field("Dim_2").map(_.toInt).getOrElse(0) // slow axis (y)
    val dataType = field("DataType").getOrElse("UnsignedShort")
    val little = field("ByteOrder").forall(_.equalsIgnoreCase("LowByteFirst"))
    val size = field("Size").map(_.toInt)

    val dataStart = ((headerEnd / 512) + 1) * 512 // header padded to 512
    val order = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(raw, dataStart,
      size.getOrElse(raw.length - dataStart)).order(order)

    // bulk view-buffer reads into a primitive staging array, then one
    // widening pass — measured faster than per-element relative gets
    // (each carries ByteBuffer position+bounds bookkeeping)
    val n = dim1 * dim2
    val out = new Array[Double](n)
    dataType match {
      case "UnsignedShort" =>
        val st = new Array[Short](n); bb.asShortBuffer().get(st)
        var i = 0; while (i < n) { out(i) = st(i) & 0xffff; i += 1 }
      case "SignedInteger" | "Signed32" =>
        val st = new Array[Int](n); bb.asIntBuffer().get(st)
        var i = 0; while (i < n) { out(i) = st(i).toDouble; i += 1 }
      case "UnsignedInteger" | "Unsigned32" =>
        val st = new Array[Int](n); bb.asIntBuffer().get(st)
        var i = 0; while (i < n) { out(i) = st(i).toLong & 0xffffffffL; i += 1 }
      case "FloatValue" | "Float" =>
        val st = new Array[Float](n); bb.asFloatBuffer().get(st)
        var i = 0; while (i < n) { out(i) = st(i).toDouble; i += 1 }
      case "DoubleValue" =>
        bb.asDoubleBuffer().get(out)
      case other => throw new UnsupportedOperationException(s"EDF DataType $other")
    }
    (dim1, dim2, out)
  }

  /** Header-only decode: (width, height) from an EDF PREFIX — the
    * projection-pushdown path of the registered `graft-edf` source (a
    * geometry/mask-only scan needs frame dimensions, not the 8 MB
    * payload). For gzipped frames only the header's worth of stream is
    * inflated. `open` yields a fresh stream over the (possibly
    * compressed) file bytes; reads stop at the closing brace.
    */
  def decodeEdfHeaderDims(open: () => java.io.InputStream,
                          gzipped: Boolean): (Int, Int) = {
    val in0 = open()
    val in = if (gzipped) new GZIPInputStream(in0, 1 << 13) else in0
    try {
      val buf = new java.io.ByteArrayOutputStream(1 << 12)
      val chunk = new Array[Byte](1 << 12)
      var done = false
      while (!done && buf.size < (1 << 20)) {
        val n = in.read(chunk)
        if (n < 0) done = true
        else {
          buf.write(chunk, 0, n)
          if (chunk.take(n).contains('}'.toByte)) done = true
        }
      }
      val raw = buf.toByteArray
      val headerEnd = raw.indexOf('}'.toByte)
      require(headerEnd > 0, "not an EDF file (no header brace)")
      val header = new String(raw, 0, headerEnd + 1, "ISO-8859-1")
      def field(key: String): Option[String] = {
        val re = ("(?m)^\\s*" + key + "\\s*=\\s*([^;]+);").r
        re.findFirstMatchIn(header).map(_.group(1).trim)
      }
      (field("Dim_1").map(_.toInt).getOrElse(0),
        field("Dim_2").map(_.toInt).getOrElse(0))
    } finally in.close()
  }

  /** One decoded frame: a single JVM object per FILE (never per pixel). */
  final case class Frame(image_id: String, width: Int, height: Int,
                         data: Array[Double])

  /** Decode a (path, content) binary-file DataFrame into whole frames —
    * one object per FILE. Input to both the pixel-table explosion and the
    * fused integration kernel (Azav.integrateFrames).
    */
  def readFrames(binary: DataFrame): Dataset[Frame] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val gz = path.endsWith(".gz")
        val name = path.substring(path.lastIndexOf('/') + 1)
        val (w, h, data) = decodeEdf(bytes, gz)
        Frame(name, w, h, data)
      }
  }

  /** Decode a (path, content) binary-file DataFrame into the canonical
    * pixel table `(image_id, x, y, intensity)` via a lazy flatMap
    * iterator. (A whole-frame array column + posexplode was measured
    * ~8× SLOWER — the Encoder copies the 8 MB array row before the
    * generator runs; the flatMap streams pixels without materializing
    * the frame row.) For maximum integration throughput skip the pixel
    * table entirely: Azav.integrateFrames.
    */
  def pixelsFromBinary(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val gz = path.endsWith(".gz")
        val name = path.substring(path.lastIndexOf('/') + 1)
        val (w, h, data) = decodeEdf(bytes, gz)
        for (y <- 0 until h; x <- 0 until w)
          yield Pixel(name, y, x, data(y * w + x))
      }.toDF()
  }

  /** Read a folder of `*.edf` / `*.edf.gz` frames into the canonical pixel
    * table `(image_id, x, y, intensity)`. One input file = one task =
    * one image; downstream integration is a single hash aggregation.
    */
  def readEdfFolder(spark: SparkSession, pathGlob: String): DataFrame =
    pixelsFromBinary(
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.edf*")
        .load(pathGlob))

  /** Encode a double image as a minimal EDF (DoubleValue, little-endian) —
    * interop sink for masks (trx/mask.py:146-155 K6).
    */
  def encodeEdf(width: Int, height: Int, data: Array[Double]): Array[Byte] = {
    val body = ByteBuffer.allocate(data.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(body.putDouble)
    val hdr = new StringBuilder
    hdr.append("{\n")
    hdr.append("EDF_DataBlockID = 1.Image.Psd ;\n")
    hdr.append(s"Dim_1 = $width ;\n")
    hdr.append(s"Dim_2 = $height ;\n")
    hdr.append("DataType = DoubleValue ;\n")
    hdr.append("ByteOrder = LowByteFirst ;\n")
    hdr.append(s"Size = ${data.length * 8} ;\n")
    val padTo = ((hdr.length + 1 + 511) / 512) * 512
    while (hdr.length < padTo - 1) hdr.append(' ')
    hdr.append('}')
    hdr.toString.getBytes("ISO-8859-1") ++ body.array()
  }
}
