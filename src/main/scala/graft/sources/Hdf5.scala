package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal pure-Scala HDF5 READER — the read-only on-ramp for trx
  * DataStorage bundles (the reference persists every azav/reduction
  * result as HDF5: trx/azav.py:457, trx/id9.py:221,301 via the external
  * `datastorage` package), whose archives were previously unreadable by
  * this engine. No native library and no external dependency: the HDF5
  * file format is publicly specified (HDF5 File Format Specification
  * v3.0, support.hdfgroup.org), and the subset a DataStorage-style file
  * uses is small:
  *
  *  - superblock v0 (the h5py/netCDF default) and v2/v3;
  *  - object headers v1 and v2 (`OHDR`), with continuation blocks;
  *  - groups: old-style symbol-table (B-tree v1 + local heap + `SNOD`,
  *    the h5py default) and new-style COMPACT link messages; dense
  *    (fractal-heap) groups are refused loudly — h5py only creates
  *    those past hundreds of links per group;
  *  - datasets: contiguous, compact, and chunked (B-tree v1 index) with
  *    the deflate (gzip, filter 1) and shuffle (filter 2) pipeline —
  *    `java.util.zip.Inflater` decompresses deflate; fletcher32
  *    (filter 3) chunks carry their checksum in-band and are accepted
  *    (stripped, not verified);
  *  - datatypes: fixed-point and IEEE-float scalars of 1/2/4/8 bytes in
  *    either endianness, FIXED-length strings, and VARIABLE-length
  *    strings (datatype class 9, string variant) resolved through the
  *    global heap (`GCOL` collections) — the shape h5py writes for
  *    Python `str` datasets and attributes by default, which is exactly
  *    what a real trx archive's saved log table carries
  *    (trx/azav.py:353,455). Variable-length SEQUENCES (non-string
  *    class 9) are refused loudly.
  *
  * Scale posture, stated honestly: an HDF5 file is a SINGLE-NODE
  * artifact — there is no row-group parallelism to exploit, and this
  * reader runs driver-side (or inside one task when a directory of
  * bundles is ingested file-per-task). The ingest path
  * ([[Bundle.fromHdf5]]) immediately re-shapes into DataFrames, and a
  * migrating archive is converted ONCE; the engine's own storage stays
  * Parquet.
  */
object Hdf5 {

  /** One dataset: `dims` row-major, values decoded to Double (numeric)
    * or String (fixed-length string type) — exactly one of the two
    * payloads is non-empty.
    */
  final case class Dataset(path: String, dims: Seq[Long],
                           numeric: Array[Double], strings: Array[String]) {
    def isNumeric: Boolean = strings.isEmpty
  }

  /** Attribute value: Double(s) or String — scalars are 1-element. */
  final case class Attr(path: String, name: String,
                        numeric: Array[Double], string: Option[String])

  /** `aliases` maps a hard-link alias path to the canonical (first-seen)
    * path of the same on-disk object — a diamond-linked dataset decodes
    * once and aliases elsewhere instead of ingesting twice.
    */
  final case class File(datasets: Seq[Dataset], attrs: Seq[Attr],
                        aliases: Map[String, String] = Map.empty) {
    /** A hard-link alias path resolves to its canonical (first-seen)
      * path; anything else resolves to itself — so lookups work no
      * matter which of a diamond's paths the caller asks for.
      */
    def resolve(path: String): String = {
      val want = path.stripPrefix("/")
      aliases.collectFirst {
        case (a, c) if a.stripPrefix("/") == want => c.stripPrefix("/")
      }.getOrElse(want)
    }

    /** Lookup by path, leading-slash agnostic (`data` == `/data`),
      * following hard-link aliases.
      */
    def datasetOpt(path: String): Option[Dataset] = {
      val want = resolve(path)
      datasets.find(_.path.stripPrefix("/") == want)
    }

    def dataset(path: String): Dataset =
      datasetOpt(path).getOrElse(
        throw new NoSuchElementException(
          s"no dataset $path; have ${datasets.map(_.path).mkString(", ")}" +
            (if (aliases.isEmpty) ""
             else s" (aliases: ${aliases.mkString(", ")})")))
  }

  /** The in-heap ingest form ([[readBytes]]) holds the whole archive in
    * one JVM byte array, so IT is bounded here; [[read]] maps the file
    * in windows ([[MappedByteSource]]) and has NO container bound —
    * only each decoded DATASET must still fit a JVM array (checked
    * loudly per dataset).
    */
  val MaxFileBytes: Long = Int.MaxValue.toLong

  /** Read every dataset and attribute reachable from the root group.
    * Memory-mapped in 1 GiB windows — archives past 2 GiB read fine;
    * the walk touches only the regions it parses.
    */
  def read(path: String): File = {
    val src = new MappedByteSource(Paths.get(path))
    try readSource(src)
    finally src.close()
  }

  /** [[read]] over an already-loaded byte array — the form executor
    * tasks use when a DIRECTORY of archives is ingested file-per-task
    * (Spark's binaryFile source hands each file's content to one task;
    * see [[Bundle.azavFromHdf5Dir]]). Bounded at [[MaxFileBytes]] by the
    * JVM array the bytes arrive in.
    */
  def readBytes(bytes: Array[Byte]): File = readSource(new HeapByteSource(bytes))

  private def readSource(src: ByteSource): File = {
    val r = new Reader(src)
    val root = r.superblockRootHeader()
    val ds = Seq.newBuilder[Dataset]
    val at = Seq.newBuilder[Attr]
    val aliases = Map.newBuilder[String, String]
    r.walk(root, "", ds, at,
      scala.collection.mutable.Map.empty[Long, String], aliases)
    File(ds.result(), at.result(), aliases.result())
  }

  // ======================================================== implementation

  private val Signature =
    Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private final class Reader(buf: ByteSource) {

    private def u8(p: Long): Int = buf.u8(p)
    private def u16(p: Long): Int = buf.u16(p)
    private def u32(p: Long): Long = buf.u32(p)
    private def u64(p: Long): Long = buf.u64(p)
    private def undef(a: Long): Boolean = a == -1L // 0xFFFF... = unset

    private def bytesAt(p: Long, n: Int): Array[Byte] = buf.bytesAt(p, n)

    private def cstr(p: Long): String = {
      var e = p
      while (buf.u8(e) != 0) e += 1
      new String(bytesAt(p, (e - p).toInt), "UTF-8")
    }

    // ---------------------------------------------------------- superblock
    /** Root group object-header address (signature at offset 0 only —
      * user blocks are out of scope for DataStorage files).
      */
    def superblockRootHeader(): Long = {
      require(bytesAt(0, 8).sameElements(Signature),
        "not an HDF5 file (bad signature)")
      val version = u8(8)
      version match {
        case 0 | 1 =>
          require(u8(13) == 8 && u8(14) == 8,
            "only 8-byte offsets/lengths supported")
          // v0: fixed part is 24 bytes (v1 adds 4); then base(8), free(8),
          // eof(8), driver(8), then the root symbol-table entry
          val fixed = if (version == 0) 24 else 28
          val steAt = fixed + 32
          u64(steAt + 8) // entry: name offset(8), OBJECT HEADER ADDR(8), ...
        case 2 | 3 =>
          require(u8(9) == 8 && u8(10) == 8,
            "only 8-byte offsets/lengths supported")
          u64(12 + 24) // base, ext, eof, then root header address
        case v => throw new UnsupportedOperationException(
          s"superblock version $v")
      }
    }

    // ------------------------------------------------------ object headers

    /** (type, body offset, body size) of every message, following
      * continuations; handles header v1 and v2.
      */
    def messages(headerAddr: Long): Seq[(Int, Long, Int)] = {
      val p = headerAddr
      val out = Seq.newBuilder[(Int, Long, Int)]
      if (bytesAt(p, 4).sameElements("OHDR".getBytes)) {
        // version 2
        require(u8(p + 4) == 2, "OHDR version")
        val flags = u8(p + 5)
        var q = p + 6
        // four 4-byte fields: access/modification/change/birth times
        // (libhdf5 tracks object times by default, so real libver='latest'
        // files set this bit — 16 bytes, not 8)
        if ((flags & 0x20) != 0) q += 16
        if ((flags & 0x10) != 0) q += 4 // max compact / min dense
        val sizeLen = 1 << (flags & 0x3)
        val chunk0 = sizeLen match {
          case 1 => u8(q).toLong
          case 2 => u16(q).toLong
          case 4 => u32(q)
          case _ => u64(q)
        }
        q += sizeLen
        val track = (flags & 0x04) != 0
        parseV2Block(q, chunk0.toInt, track, out)
      } else {
        require(u8(p) == 1, s"object header version ${u8(p)} at $headerAddr")
        val nMsgs = u16(p + 2)
        // 12-byte prefix padded to 16 for 8-alignment of the first message
        var q = p + 16
        var remaining = nMsgs
        var conts = List.empty[(Long, Long)]
        def parseV1(at: Long, limit: Long): Long = {
          var o = at
          while (remaining > 0 && o + 8 <= limit) {
            val t = u16(o); val sz = u16(o + 2)
            if (t == 0x0010) conts ::= ((u64(o + 8), u64(o + 16)))
            else out += ((t, o + 8, sz))
            o += 8 + sz
            remaining -= 1
          }
          o
        }
        parseV1(q, p + 16 + u32(p + 8).toInt)
        while (remaining > 0 && conts.nonEmpty) {
          val (addr, len) = conts.head
          conts = conts.tail
          parseV1(addr, addr + len)
        }
      }
      out.result()
    }

    /** One v2 header block (chunk 0 inline, `OCHK` continuations).
      * `msgBytes` is the span of header-message data EXCLUDING the
      * trailing checksum — the "size of chunk 0" field's own contract,
      * and `length − 8` for an OCHK block (4-byte signature + 4-byte
      * checksum live inside the continuation message's length).
      */
    private def parseV2Block(start: Long, msgBytes: Int, track: Boolean,
        out: scala.collection.mutable.Builder[(Int, Long, Int), Seq[(Int, Long, Int)]]): Unit = {
      var o = start
      val limit = start + msgBytes
      var conts = List.empty[(Long, Long)]
      while (o + 4 <= limit) {
        val t = u8(o); val sz = u16(o + 1) // type(1), size(2), flags(1)
        var body = o + 4
        if (track && t != 0) body += 2 // creation order
        if (t == 0x10) conts ::= ((u64(body), u64(body + 8)))
        else if (t != 0) out += ((t, body, sz))
        o = body + sz
        if (t == 0 && sz == 0) o = limit // gap smaller than a header
      }
      conts.foreach { case (addr, len) =>
        val a = addr
        require(bytesAt(a, 4).sameElements("OCHK".getBytes),
          "bad OCHK continuation")
        parseV2Block(a + 4, (len - 8).toInt, track, out)
      }
    }

    // ------------------------------------------------------------ walking

    /** Recursive group walk: datasets get decoded, subgroups recurse,
      * attributes collect at every node. The addr→first-path memo serves
      * double duty: it guards cycles AND diamond shapes — two hard links
      * to the SAME object (dataset or group) decode once at the
      * first-seen path and record an alias at every later path, instead
      * of ingesting the object twice.
      */
    def walk(headerAddr: Long, prefix: String,
             ds: scala.collection.mutable.Builder[Dataset, Seq[Dataset]],
             at: scala.collection.mutable.Builder[Attr, Seq[Attr]],
             memo: scala.collection.mutable.Map[Long, String],
             aliases: scala.collection.mutable.Builder[(String, String), Map[String, String]]): Unit = {
      memo.get(headerAddr) match {
        case Some(first) =>
          aliases += ((if (prefix.isEmpty) "/" else prefix,
            if (first.isEmpty) "/" else first))
          return
        case None => memo(headerAddr) = prefix
      }
      val msgs = messages(headerAddr)
      msgs.filter(_._1 == 0x000C).foreach { case (_, o, sz) =>
        at += readAttr(o, sz, if (prefix.isEmpty) "/" else prefix)
      }
      val isDataset = msgs.exists(_._1 == 0x0008)
      if (isDataset) {
        ds += readDataset(msgs, prefix)
        return
      }
      // group: links from the symbol table and/or compact link messages
      val links = Seq.newBuilder[(String, Long)]
      msgs.filter(_._1 == 0x0011).foreach { case (_, o, _) =>
        val btree = u64(o); val heap = u64(o + 8)
        links ++= symbolTableLinks(btree, heap)
      }
      msgs.filter(_._1 == 0x0006).foreach { case (_, o, _) =>
        readLinkMessage(o).foreach(links += _)
      }
      if (msgs.exists(_._1 == 0x0002) && // link info present
          !msgs.exists(_._1 == 0x0006) && !msgs.exists(_._1 == 0x0011)) {
        // link info alone with a defined fractal heap = dense storage
        val (_, o, _) = msgs.find(_._1 == 0x0002).get
        val flags = u8(o + 1)
        var q = o + 2
        if ((flags & 1) != 0) q += 8
        if (!undef(u64(q)))
          throw new UnsupportedOperationException(
            s"dense (fractal-heap) group links at $prefix — not supported")
      }
      links.result().foreach { case (name, addr) =>
        walk(addr, s"$prefix/$name", ds, at, memo, aliases)
      }
    }

    /** Old-style group: every (name, header addr) under a v1 B-tree of
      * `SNOD` symbol nodes, names resolved through the local heap.
      */
    private def symbolTableLinks(btreeAddr: Long,
                                 heapAddr: Long): Seq[(String, Long)] = {
      val h = heapAddr
      require(bytesAt(h, 4).sameElements("HEAP".getBytes), "bad local heap")
      val heapData = u64(h + 24)
      val out = Seq.newBuilder[(String, Long)]
      def node(addr: Long): Unit = {
        val p = addr
        val sig = new String(bytesAt(p, 4))
        if (sig == "TREE") {
          val level = u8(p + 5); val n = u16(p + 6)
          // keys/children alternate after left(8)+right(8)
          var o = p + 24
          var i = 0
          while (i < n) {
            o += 8 // key (heap offset)
            node(u64(o)); o += 8
            i += 1
          }
        } else if (sig == "SNOD") {
          val n = u16(p + 6)
          var o = p + 8
          var i = 0
          while (i < n) {
            val nameOff = u64(o); val hdr = u64(o + 8)
            out += ((cstr(heapData + nameOff), hdr))
            o += 40
            i += 1
          }
        } else throw new IllegalStateException(s"bad group node sig $sig")
      }
      node(btreeAddr)
      out.result()
    }

    /** New-style COMPACT link (message 0x0006), hard links only. */
    private def readLinkMessage(o: Long): Option[(String, Long)] = {
      require(u8(o) == 1, "link message version")
      val flags = u8(o + 1)
      var q = o + 2
      val linkType = if ((flags & 0x08) != 0) { val t = u8(q); q += 1; t }
                     else 0
      if ((flags & 0x04) != 0) q += 8 // creation order
      if ((flags & 0x10) != 0) q += 1 // charset
      val lenSize = 1 << (flags & 0x3)
      val nameLen = lenSize match {
        case 1 => u8(q); case 2 => u16(q)
        case 4 => u32(q).toInt; case _ => u64(q).toInt
      }
      q += lenSize
      val name = new String(bytesAt(q, nameLen), "UTF-8")
      q += nameLen
      if (linkType == 0) Some((name, u64(q))) else None // soft links skipped
    }

    // ----------------------------------------------------------- datatypes

    /** (class, size, littleEndian, signed) from a datatype message.
      * `bits0` keeps the raw first bit-field byte: for class 9
      * (variable-length) its low nibble distinguishes string (1) from
      * sequence (0).
      */
    private final case class DType(cls: Int, size: Int, le: Boolean,
                                   signed: Boolean, bits0: Int) {
      def isVlenString: Boolean = cls == 9 && (bits0 & 0x0f) == 1
    }

    private def readDType(o: Long): DType = {
      val clsVer = u8(o)
      val cls = clsVer & 0x0f
      val b0 = u8(o + 1)
      val size = u32(o + 4).toInt
      DType(cls, size, le = (b0 & 1) == 0, signed = (b0 & 0x08) != 0,
        bits0 = b0)
    }

    // --------------------------------------------------------- global heap

    /** Parsed `GCOL` collections, keyed by collection address: heap
      * object index → payload bytes. Parsed lazily once per collection —
      * every vlen element of every dataset in the same collection shares
      * the parse.
      */
    private val gcolCache =
      scala.collection.mutable.Map.empty[Long, Map[Int, Array[Byte]]]

    private def globalHeapObjects(addr: Long): Map[Int, Array[Byte]] =
      gcolCache.getOrElseUpdate(addr, {
        val p = addr
        require(bytesAt(p, 4).sameElements("GCOL".getBytes),
          s"bad global heap collection signature at $addr")
        require(u8(p + 4) == 1, s"global heap version ${u8(p + 4)}")
        val collSize = u64(p + 8) // includes the 16-byte header
        val limit = p + collSize
        val out = Map.newBuilder[Int, Array[Byte]]
        var o = p + 16
        var done = false
        while (!done && o + 16 <= limit) {
          val idx = u16(o)
          val objSize = u64(o + 8)
          if (idx == 0) done = true // free-space object spans the rest
          else {
            out += ((idx, bytesAt(o + 16, objSize.toInt)))
            // object data is padded to an 8-byte multiple
            o += 16 + ((objSize + 7) & ~7L)
          }
        }
        out.result()
      })

    /** Variable-length string elements: each is a 16-byte heap ID —
      * length (4), `GCOL` collection address (8), object index (4).
      */
    private def decodeVlenStrings(raw: Array[Byte], what: String): Array[String] = {
      val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val n = raw.length / 16
      val out = new Array[String](n)
      var i = 0
      while (i < n) {
        val len = bb.getInt(i * 16) & 0xffffffffL
        val coll = bb.getLong(i * 16 + 4)
        val idx = bb.getInt(i * 16 + 12)
        out(i) =
          if (len == 0 || coll == 0L || undef(coll)) ""
          else {
            val obj = globalHeapObjects(coll).getOrElse(idx,
              throw new IllegalStateException(
                s"$what: vlen string points at missing heap object " +
                  s"$idx in collection at $coll"))
            new String(obj, 0, math.min(len.toInt, obj.length), "UTF-8")
          }
        i += 1
      }
      out
    }

    private def decodeNumeric(raw: Array[Byte], dt: DType): Array[Double] = {
      val bb = ByteBuffer.wrap(raw)
        .order(if (dt.le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val n = raw.length / dt.size
      val out = new Array[Double](n)
      var i = 0
      dt.cls match {
        case 1 => // IEEE float
          dt.size match {
            case 4 => while (i < n) { out(i) = bb.getFloat(i * 4).toDouble; i += 1 }
            case 8 => while (i < n) { out(i) = bb.getDouble(i * 8); i += 1 }
            case s => throw new UnsupportedOperationException(s"float$s")
          }
        case 0 => // fixed-point
          dt.size match {
            case 1 => while (i < n) {
              val v = bb.get(i); out(i) = if (dt.signed) v else v & 0xff
              i += 1 }
            case 2 => while (i < n) {
              val v = bb.getShort(i * 2)
              out(i) = if (dt.signed) v else v & 0xffff; i += 1 }
            case 4 => while (i < n) {
              val v = bb.getInt(i * 4)
              out(i) = if (dt.signed) v.toDouble else v & 0xffffffffL
              i += 1 }
            case 8 => while (i < n) { out(i) = bb.getLong(i * 8).toDouble; i += 1 }
            case s => throw new UnsupportedOperationException(s"int$s")
          }
        case c => throw new UnsupportedOperationException(
          s"datatype class $c is not numeric")
      }
      out
    }

    private def decodeStrings(raw: Array[Byte], dt: DType): Array[String] = {
      require(dt.cls == 3, "not a fixed string type")
      val n = raw.length / dt.size
      (0 until n).map { i =>
        val s = raw.slice(i * dt.size, (i + 1) * dt.size)
        val z = s.indexOf(0.toByte)
        new String(if (z >= 0) s.take(z) else s, "UTF-8")
      }.toArray
    }

    // ----------------------------------------------------------- dataspace

    private def readDims(o: Long): Seq[Long] = {
      val v = u8(o)
      v match {
        case 1 =>
          val rank = u8(o + 1)
          (0 until rank).map(i => u64(o + 8 + i * 8))
        case 2 =>
          val rank = u8(o + 1)
          (0 until rank).map(i => u64(o + 4 + i * 8))
        case x => throw new UnsupportedOperationException(s"dataspace v$x")
      }
    }

    // ---------------------------------------------------------- attributes

    private def readAttr(o: Long, sz: Int, path: String): Attr = {
      val ver = u8(o)
      require(ver >= 1 && ver <= 3, s"attribute message v$ver")
      val nameSize = u16(o + 2)
      val dtSize = u16(o + 4)
      val dsSize = u16(o + 6)
      def pad8(x: Int): Int = (x + 7) & ~7
      var q = o + 8
      if (ver == 3) q += 1 // encoding
      if (ver == 2) q += 0
      // v1 pads name/datatype/dataspace to 8; v2/v3 do not
      val name = cstr(q)
      q += (if (ver == 1) pad8(nameSize) else nameSize)
      val dt = readDType(q)
      val dtAt = q
      q += (if (ver == 1) pad8(dtSize) else dtSize)
      val dims = if (dsSize >= 8) {
        // a scalar dataspace has rank 0
        val rank = u8(q + 1)
        if (rank == 0) Seq.empty[Long] else readDims(q)
      } else Seq.empty[Long]
      q += (if (ver == 1) pad8(dsSize) else dsSize)
      val n = dims.product.max(1L).toInt
      val raw = bytesAt(q, n * dt.size)
      if (dt.cls == 3) Attr(path, name, Array.empty,
        Some(decodeStrings(raw, dt).mkString(",")))
      else if (dt.isVlenString) Attr(path, name, Array.empty,
        Some(decodeVlenStrings(raw, s"$path@$name").mkString(",")))
      else if (dt.cls == 9) throw new UnsupportedOperationException(
        s"$path@$name: variable-length SEQUENCE attribute is not " +
          "supported (vlen strings are)")
      else Attr(path, name, decodeNumeric(raw, dt), None)
    }

    // ------------------------------------------------------------ datasets

    /** A single decoded dataset must fit a JVM byte array even though
      * the CONTAINER has no size bound on the mapped path.
      */
    private def requireDatasetFits(nBytes: Long, path: String): Unit =
      if (nBytes > Int.MaxValue)
        throw new UnsupportedOperationException(
          s"$path is $nBytes bytes decoded, past the 2 GiB JVM array " +
            "bound for one dataset — split the dataset (e.g. h5repack " +
            "with chunk-wise copies) and ingest each part")

    private def readDataset(msgs: Seq[(Int, Long, Int)],
                            path: String): Dataset = {
      val (_, dtO, _) = msgs.find(_._1 == 0x0003).getOrElse(
        throw new IllegalStateException(s"$path: dataset without datatype"))
      val dt = readDType(dtO)
      if (dt.cls == 9 && !dt.isVlenString)
        throw new UnsupportedOperationException(
          s"$path: variable-length SEQUENCE data is not supported " +
            "(vlen strings are)")
      val (_, dsO, _) = msgs.find(_._1 == 0x0001).getOrElse(
        throw new IllegalStateException(s"$path: dataset without dataspace"))
      val dims = readDims(dsO)
      val total = dims.product.max(1L)
      val filters = msgs.find(_._1 == 0x000B).map { case (_, o, _) =>
        readFilters(o) }.getOrElse(Seq.empty)

      val (_, lo, _) = msgs.find(_._1 == 0x0008).get
      require(u8(lo) == 3, s"$path: layout message v${u8(lo)} (need v3)")
      val raw: Array[Byte] = u8(lo + 1) match {
        case 0 => // compact
          val sz = u16(lo + 2)
          bytesAt(lo + 4, sz)
        case 1 => // contiguous
          val addr = u64(lo + 2)
          requireDatasetFits(total * dt.size, path)
          if (undef(addr)) new Array[Byte]((total * dt.size).toInt)
          else bytesAt(addr, (total * dt.size).toInt)
        case 2 => // chunked, v1 B-tree index
          val ndims = u8(lo + 2) // rank + 1
          val btree = u64(lo + 3)
          val chunkDims = (0 until ndims - 1)
            .map(i => u32(lo + 11 + i * 4).toInt)
          readChunked(btree, dims.map(_.toInt), chunkDims, dt.size,
            filters, path)
        case c => throw new UnsupportedOperationException(
          s"$path: layout class $c")
      }
      if (dt.cls == 3) Dataset(path, dims, Array.empty, decodeStrings(raw, dt))
      else if (dt.isVlenString)
        Dataset(path, dims, Array.empty, decodeVlenStrings(raw, path))
      else Dataset(path, dims, decodeNumeric(raw, dt), Array.empty)
    }

    /** Filter ids in pipeline order (1 = deflate, 2 = shuffle,
      * 3 = fletcher32); anything else is refused loudly.
      */
    private def readFilters(o: Long): Seq[(Int, Seq[Long])] = {
      val ver = u8(o)
      val n = u8(o + 1)
      var q = o + (if (ver == 1) 8 else 2)
      (0 until n).map { _ =>
        val id = u16(q)
        val nameLen =
          if (ver == 1) u16(q + 2)
          else if (id >= 256) u16(q + 2) else 0
        val base = if (ver == 1 || id >= 256) q + 4 else q + 2
        val nVals = u16(base + 2)
        var p = base + 4
        if (ver == 1) p += ((nameLen + 7) & ~7)
        else p += nameLen
        val vals = (0 until nVals).map(i => u32(p + i * 4))
        p += nVals * 4
        if (ver == 1 && nVals % 2 == 1) p += 4
        q = p
        require(id == 1 || id == 2 || id == 3,
          s"unsupported HDF5 filter id $id (deflate/shuffle/fletcher32 only)")
        (id, vals)
      }
    }

    /** Assemble a chunked dataset: walk the v1 chunk B-tree, undo the
      * filter pipeline per chunk (deflate → unshuffle), copy each chunk
      * into place with edge clipping.
      */
    private def readChunked(btreeAddr: Long, dims: Seq[Int],
        chunkDims: Seq[Int], elemSize: Int,
        filters: Seq[(Int, Seq[Long])], path: String): Array[Byte] = {
      val rank = dims.size
      val total = dims.map(_.toLong).product
      requireDatasetFits(total * elemSize, path)
      val out = new Array[Byte]((total * elemSize).toInt)
      val chunkElems = chunkDims.map(_.toLong).product.toInt

      def inflate(in: Array[Byte]): Array[Byte] = {
        val inf = new java.util.zip.Inflater()
        inf.setInput(in)
        val o = new java.io.ByteArrayOutputStream(chunkElems * elemSize)
        val b = new Array[Byte](65536)
        while (!inf.finished()) {
          val k = inf.inflate(b)
          if (k == 0 && inf.needsInput())
            throw new IllegalStateException(s"$path: truncated deflate chunk")
          o.write(b, 0, k)
        }
        inf.end()
        o.toByteArray
      }
      def unshuffle(in: Array[Byte]): Array[Byte] = {
        val n = in.length / elemSize
        val o = new Array[Byte](in.length)
        var j = 0
        while (j < elemSize) {
          var i = 0
          while (i < n) { o(i * elemSize + j) = in(j * n + i); i += 1 }
          j += 1
        }
        o
      }
      // filters applied in reverse pipeline order on read
      def defilter(in: Array[Byte], mask: Long): Array[Byte] =
        filters.reverse.zipWithIndex.foldLeft(in) {
          case (acc, ((id, _), i)) =>
            val skipped = (mask & (1L << (filters.size - 1 - i))) != 0
            if (skipped) acc
            else id match {
              case 1 => inflate(acc)
              case 2 => unshuffle(acc)
              case 3 => acc.dropRight(4) // fletcher32 checksum in-band
            }
        }

      def place(chunkOff: Seq[Long], data: Array[Byte]): Unit = {
        // row-major copy, clipping chunks that overhang the edge
        val copyDims = (0 until rank).map(d =>
          math.min(chunkDims(d).toLong, dims(d) - chunkOff(d)).toInt)
        val rowBytes = copyDims.last * elemSize
        val nRows = copyDims.dropRight(1).product.max(1)
        val srcRowStride = chunkDims.last * elemSize
        var r = 0
        while (r < nRows) {
          // decompose r into the chunk-local leading coordinates
          var rem = r
          val coord = new Array[Long](rank)
          var d = rank - 2
          while (d >= 0) {
            coord(d) = rem % copyDims(d); rem /= copyDims(d); d -= 1
          }
          // chunk-local source row index uses the FULL chunk dims
          var srcRow = 0L
          var dd = 0
          while (dd < rank - 1) {
            srcRow = srcRow * chunkDims(dd) + coord(dd); dd += 1
          }
          var dstIdx = 0L
          dd = 0
          while (dd < rank) {
            val c = if (dd == rank - 1) chunkOff(dd)
                    else chunkOff(dd) + coord(dd)
            dstIdx = dstIdx * dims(dd) + c
            dd += 1
          }
          System.arraycopy(data, (srcRow * srcRowStride).toInt,
            out, (dstIdx * elemSize).toInt, rowBytes)
          r += 1
        }
      }

      def node(addr: Long): Unit = {
        if (undef(addr)) return
        val p = addr
        require(bytesAt(p, 4).sameElements("TREE".getBytes),
          s"$path: bad chunk btree node")
        require(u8(p + 4) == 1, s"$path: btree type ${u8(p + 4)} (need 1)")
        val level = u8(p + 5); val n = u16(p + 6)
        val keySize = 8 + (rank + 1) * 8 // size(4)+mask(4)+offsets
        var o = p + 24
        var i = 0
        while (i < n) {
          val nbytes = u32(o).toInt
          val mask = u32(o + 4)
          val off = (0 until rank).map(d => u64(o + 8 + d * 8))
          val child = u64(o + keySize)
          if (level > 0) node(child)
          else place(off, defilter(bytesAt(child, nbytes), mask))
          o += keySize + 8
          i += 1
        }
      }
      node(btreeAddr)
      out
    }
  }
}
