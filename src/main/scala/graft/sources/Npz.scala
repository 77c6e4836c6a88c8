package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** Minimal pure-JVM NPY/NPZ reader — the second half of the trx archive
  * on-ramp: the reference's `datastorage` persists bundles as HDF5 OR
  * npz (a ZIP of `.npy` members, one per array — NumPy's own public
  * format, NEP 1 / `numpy.lib.format`). `java.util.zip` opens the
  * container (stored and deflated members alike, so `np.savez` and
  * `np.savez_compressed` both read); the `.npy` member format is a
  * 6-byte magic, a version, and an ASCII literal dict header
  * (`{'descr': '<f8', 'fortran_order': False, 'shape': (3, 4), }`)
  * followed by the raw buffer.
  *
  * Supported dtypes: little/big-endian ints of 1/2/4/8 bytes (signed and
  * unsigned), float32/float64, booleans, and fixed-width byte strings
  * (`|S*`). Fortran-order buffers are transposed to row-major on read
  * (NumPy's default save order is C). Object arrays (pickled) are
  * refused loudly — they are Python-specific by construction.
  *
  * Same scale boundary as [[Hdf5]]: an npz is a single-node artifact,
  * decoded driver-side once on migration; the engine's own storage stays
  * Parquet.
  */
object Npz {

  /** One array: `dims` row-major; exactly one payload non-empty. */
  final case class NpArray(name: String, dims: Seq[Long],
                           numeric: Array[Double], strings: Array[String])

  /** Every `.npy` member of the archive, keyed by member name minus the
    * `.npy` suffix (NumPy's own convention for `np.load` of an npz).
    */
  /** Each member decodes into one JVM byte array, so members past
    * `Int.MaxValue` bytes cannot be read — checked loudly up front.
    */
  val MaxMemberBytes: Long = Int.MaxValue.toLong

  def read(path: String): Seq[NpArray] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      zf.entries().asScala.toSeq
        .filter(_.getName.endsWith(".npy"))
        .sortBy(_.getName)
        .map { e =>
          if (e.getSize > MaxMemberBytes)
            throw new UnsupportedOperationException(
              s"$path!${e.getName} is ${e.getSize} bytes uncompressed, " +
                s"past this reader's $MaxMemberBytes byte (2 GiB) bound — " +
                "split the array (e.g. np.savez per block) and ingest " +
                "each part")
          val in = zf.getInputStream(e)
          val bytes =
            try in.readAllBytes()
            finally in.close()
          val (dims, num, str) = parseNpy(bytes, e.getName)
          NpArray(e.getName.stripSuffix(".npy"), dims, num, str)
        }
    } finally zf.close()
  }

  /** [[read]] over an already-loaded archive byte array — the form
    * executor tasks use for file-per-task directory ingest (see
    * [[Bundle.azavFromNpzDir]]). `java.util.zip.ZipInputStream` streams
    * the members (no temp file).
    */
  def readBytes(bytes: Array[Byte], what: String): Seq[NpArray] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val out = Seq.newBuilder[NpArray]
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName.endsWith(".npy")) {
          // the entry's declared size may be UNKNOWN (-1: local headers
          // with data descriptors), so the bound is enforced while
          // reading — never trusted from the header alone
          val member = readBounded(zin, s"$what!${e.getName}")
          val (dims, num, str) = parseNpy(member, s"$what!${e.getName}")
          out += NpArray(e.getName.stripSuffix(".npy"), dims, num, str)
        }
        e = zin.getNextEntry
      }
      out.result().sortBy(_.name)
    } finally zin.close()
  }

  /** Read one member fully, failing LOUDLY the moment the uncompressed
    * size passes [[MaxMemberBytes]] — instead of an opaque
    * OutOfMemoryError inside an executor task.
    */
  private def readBounded(in: java.io.InputStream, what: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream(1 << 16)
    val tmp = new Array[Byte](1 << 16)
    var total = 0L
    var k = in.read(tmp)
    while (k >= 0) {
      total += k
      if (total > MaxMemberBytes)
        throw new UnsupportedOperationException(
          s"$what exceeds this reader's $MaxMemberBytes byte (2 GiB) " +
            "uncompressed bound — split the array and ingest each part")
      buf.write(tmp, 0, k)
      k = in.read(tmp)
    }
    buf.toByteArray
  }

  /** A single standalone `.npy` file. Files past 2 GiB take the
    * STREAMED path: header from a head slice, then the data region
    * decoded chunk-by-chunk into the value array (a 3 GiB f8 array is
    * 400 M doubles — well inside a JVM array) — supported for C-order
    * numeric arrays; Fortran order and fixed strings at that size are
    * refused loudly (both need whole-buffer random access).
    */
  def readNpy(path: String): NpArray = {
    val p = java.nio.file.Paths.get(path)
    val size = java.nio.file.Files.size(p)
    val name = path.substring(path.lastIndexOf('/') + 1)
      .stripSuffix(".npy")
    if (size <= MaxMemberBytes) {
      val bytes = java.nio.file.Files.readAllBytes(p)
      val (dims, num, str) = parseNpy(bytes, path)
      NpArray(name, dims, num, str)
    } else {
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.READ)
      try {
        def pread(off: Long, n: Int): Array[Byte] = {
          val a = new Array[Byte](n)
          val bb = ByteBuffer.wrap(a)
          var pos = off
          while (bb.hasRemaining) {
            val k = ch.read(bb, pos)
            require(k >= 0, s"$path: truncated at $pos")
            pos += k
          }
          a
        }
        // learn the header length from the fixed 12-byte prefix first:
        // a v1 text header may legally run to 12 + 65535 bytes and v2/v3
        // to 4 GiB, so a fixed-size head slice would fail a LEGAL
        // long-shape header with an opaque out-of-bounds parse error —
        // pread exactly the preamble instead, refusing loudly only when
        // headerLen itself is implausible
        val pre = pread(0L, 12)
        require(pre.take(6).sameElements(Magic),
          s"$path: not an NPY file (bad magic)")
        val hLen =
          if ((pre(6) & 0xff) == 1)
            ((pre(8) & 0xff) | ((pre(9) & 0xff) << 8)).toLong
          else ByteBuffer.wrap(pre, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
            .getInt.toLong & 0xffffffffL
        val hStart = if ((pre(6) & 0xff) == 1) 10L else 12L
        require(hStart + hLen <= size,
          s"$path: npy header length $hLen runs past the file")
        require(hLen <= (1L << 26),
          s"$path: npy header length $hLen exceeds this reader's 64 MiB " +
            "plausibility bound")
        val (dims, descr, fortran, dataStart) =
          parseNpyHeader(pread(0L, (hStart + hLen).toInt), path)
        val n = dims.product.max(1L)
        require(n <= Int.MaxValue,
          s"$path: $n elements exceed the JVM array bound — split the " +
            "array and ingest each part")
        require(!(fortran && dims.size > 1),
          s"$path: Fortran-order arrays past 2 GiB need whole-buffer " +
            "access — re-save in C order (np.ascontiguousarray)")
        require(!descr.contains("O"),
          s"$path: object (pickled) arrays are Python-specific — not readable")
        val code = descr.dropWhile(c =>
          c == '<' || c == '>' || c == '|' || c == '=')
        require(!code.startsWith("S"),
          s"$path: fixed-string arrays past 2 GiB are not supported — " +
            "split the array and ingest each part")
        val le = !descr.startsWith(">")
        val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
        val (elem, get) = numericCodec(code, descr, path)
        val out = new Array[Double](n.toInt)
        val chunkElems = (8 << 20) / elem // 8 MB reads
        var i = 0L
        while (i < n) {
          val m = math.min(chunkElems.toLong, n - i).toInt
          val bb = ByteBuffer.wrap(pread(dataStart + i * elem, m * elem))
            .order(order)
          var j = 0
          while (j < m) { out((i + j).toInt) = get(bb, j); j += 1 }
          i += m
        }
        NpArray(name, dims, out, Array.empty[String])
      } finally ch.close()
    }
  }

  // ------------------------------------------------------- implementation

  private val Magic = Array(0x93, 'N', 'U', 'M', 'P', 'Y').map(_.toByte)

  /** NPY preamble: (dims, descr, fortran_order, data offset). Needs only
    * the first `12 + headerLen` bytes — the streamed large-file path
    * parses a head slice, never the whole file.
    */
  private[graft] def parseNpyHeader(bytes: Array[Byte], what: String)
      : (Seq[Long], String, Boolean, Int) = {
    require(bytes.length >= 10 && bytes.take(6).sameElements(Magic),
      s"$what: not an NPY member (bad magic)")
    val major = bytes(6) & 0xff
    val headerLen =
      if (major == 1) (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
      else // v2/v3: 4-byte little-endian header length
        ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    val headerStart = if (major == 1) 10 else 12
    val header = new String(bytes, headerStart, headerLen, "ISO-8859-1")
    val dataStart = headerStart + headerLen

    def field(key: String): String = {
      val i = header.indexOf(s"'$key'")
      require(i >= 0, s"$what: npy header missing '$key': $header")
      header.substring(i + key.length + 2).dropWhile(c => c == ':' || c == ' ')
    }
    val descr = field("descr").dropWhile(_ == '\'').takeWhile(_ != '\'')
    val fortran = field("fortran_order").startsWith("True")
    val shapeTxt = field("shape").dropWhile(_ != '(').drop(1)
      .takeWhile(_ != ')')
    val dims: Seq[Long] = shapeTxt.split(",").toSeq.map(_.trim)
      .filter(_.nonEmpty).map(_.toLong)
    (dims, descr, fortran, dataStart)
  }

  /** element size + positioned decoder for one numeric NPY dtype code. */
  private def numericCodec(code: String, descr: String, what: String)
      : (Int, (ByteBuffer, Int) => Double) = code match {
    case "f8" => (8, (b, i) => b.getDouble(i * 8))
    case "f4" => (4, (b, i) => b.getFloat(i * 4).toDouble)
    case "i8" => (8, (b, i) => b.getLong(i * 8).toDouble)
    case "i4" => (4, (b, i) => b.getInt(i * 4).toDouble)
    case "i2" => (2, (b, i) => b.getShort(i * 2).toDouble)
    case "i1" => (1, (b, i) => b.get(i).toDouble)
    case "u1" | "b1" => (1, (b, i) => (b.get(i) & 0xff).toDouble)
    case "u2" => (2, (b, i) => (b.getShort(i * 2) & 0xffff).toDouble)
    case "u4" => (4, (b, i) => (b.getInt(i * 4) & 0xffffffffL).toDouble)
    case "u8" => (8, (b, i) => b.getLong(i * 8).toDouble)
    case _ => throw new UnsupportedOperationException(
      s"$what: npy dtype $descr")
  }

  private[graft] def parseNpy(bytes: Array[Byte], what: String)
      : (Seq[Long], Array[Double], Array[String]) = {
    val (dims, descr, fortran, dataStart) = parseNpyHeader(bytes, what)
    val n = dims.product.max(1L).toInt

    require(!descr.contains("O"),
      s"$what: object (pickled) arrays are Python-specific — not readable")
    val le = !descr.startsWith(">")
    val code = descr.dropWhile(c => c == '<' || c == '>' || c == '|' || c == '=')
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN

    def cToRowMajor[T](flat: Int => T, set: (Int, T) => Unit): Unit = {
      // transpose a Fortran-order buffer to row-major indexing
      val rank = dims.size
      val d = dims.map(_.toInt)
      var i = 0
      while (i < n) {
        // i is the ROW-MAJOR index; find its Fortran (column-major) slot
        var rem = i
        var f = 0L
        var strideF = 1L
        var k = rank - 1
        val coord = new Array[Int](rank)
        while (k >= 0) { coord(k) = (rem % d(k)); rem /= d(k); k -= 1 }
        k = 0
        while (k < rank) { f += coord(k) * strideF; strideF *= d(k); k += 1 }
        set(i, flat(f.toInt))
        i += 1
      }
    }

    if (code.startsWith("S")) {
      val w = code.drop(1).toInt
      val out = new Array[String](n)
      def strAt(j: Int): String = {
        val off = dataStart + j * w
        var e = 0
        while (e < w && bytes(off + e) != 0) e += 1
        new String(bytes, off, e, "UTF-8")
      }
      if (fortran && dims.size > 1) cToRowMajor(strAt, (i, v: String) => out(i) = v)
      else { var i = 0; while (i < n) { out(i) = strAt(i); i += 1 } }
      (dims, Array.empty[Double], out)
    } else {
      val (size, get) = numericCodec(code, descr, what)
      val bb = ByteBuffer.wrap(bytes, dataStart, n * size).slice().order(order)
      val out = new Array[Double](n)
      if (fortran && dims.size > 1)
        cToRowMajor(j => get(bb, j), (i, v: Double) => out(i) = v)
      else { var i = 0; while (i < n) { out(i) = get(bb, i); i += 1 } }
      (dims, out, Array.empty[String])
    }
  }
}
