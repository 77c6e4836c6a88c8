package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Pure-Scala HDF5 WRITER — the write-back half of the trx archive
  * interop: [[Bundle.toHdf5]] exports engine tables into the same
  * DataStorage container the reference's own tooling reads
  * (trx/azav.py:398-408,457 persists data/err/q/log via `datastorage`),
  * so a user keeping trx-side scripts can consume engine output. Written
  * against the same public HDF5 File Format Specification v3.0 the
  * [[Hdf5]] reader implements (no native library, no external
  * dependency). Two structural modes, covering both reader code paths:
  *  - default: superblock v0, v1 object headers, old-style symbol-table
  *    groups — the bytes h5py's defaults produce structurally;
  *  - `v2 = true`: superblock v3, `OHDR` v2 object headers, compact
  *    link-message groups — the "libver latest" shape
  *    (`v2Times = true` additionally sets the object-time flag with its
  *    four 4-byte timestamp fields, as libhdf5 does by default).
  *
  * Supports: contiguous float64/int64/fixed-string/variable-length-string
  * datasets of any rank, chunked float64 datasets with the
  * shuffle+deflate pipeline, scalar double/string/vlen-string
  * attributes, hard-link aliases to earlier-written datasets, and nested
  * subgroups. Variable-length strings go through a `GCOL` global-heap
  * collection exactly as h5py writes Python `str` data.
  */
object Hdf5Writer {

  sealed trait Value
  final case class Doubles(dims: Seq[Int], data: Array[Double],
                           chunked: Option[Seq[Int]] = None) extends Value
  final case class Longs(dims: Seq[Int], data: Array[Long]) extends Value
  final case class Strings(fixedLen: Int, data: Array[String]) extends Value
  /** Variable-length strings (global heap), h5py's default for `str`. */
  final case class VStrings(data: Array[String]) extends Value
  /** Hard link to a dataset already written EARLIER in traversal order,
    * named by its absolute slash path (e.g. `/grp/data`).
    */
  final case class Alias(target: String) extends Value

  /** Marks an attribute value as a variable-length string. */
  final case class VStr(s: String)

  /** `dsAttrs` attaches attributes to this node's datasets by name —
    * the shape DataStorage uses for per-array metadata.
    */
  final case class Node(datasets: Seq[(String, Value)] = Seq.empty,
                        attrs: Seq[(String, Any)] = Seq.empty,
                        groups: Seq[(String, Node)] = Seq.empty,
                        dsAttrs: Map[String, Seq[(String, Any)]] = Map.empty)

  /** `v2 = true` emits the "libver latest" structural shape: superblock
    * v3, `OHDR` v2 object headers, and COMPACT link-message groups (no
    * symbol tables) — the reader's other code path. `v2Times` adds the
    * access/modification/change/birth time fields (flag 0x20, 16 bytes).
    */
  def write(path: String, root: Node, v2: Boolean = false,
            v2Times: Boolean = false): Unit = {
    val b = new Builder(v2, v2Times)
    val rootAddr = b.writeGroup(root, "")
    b.finish(path, rootAddr)
  }

  private final class Builder(v2: Boolean, v2Times: Boolean) {
    // v0: superblock (56 bytes) + root symbol-table entry (40);
    // v3: 48-byte superblock (sig..root addr + checksum)
    private val buf = ArrayBuffer.fill[Byte](if (v2) 48 else 96)(0)

    private def pos: Long = buf.length.toLong
    private def pad8(): Unit = while (buf.length % 8 != 0) buf += 0
    private def raw(bs: Array[Byte]): Unit = buf ++= bs
    private def u8(v: Int): Unit = buf += v.toByte
    private def u16(v: Int): Unit = {
      buf += (v & 0xff).toByte; buf += ((v >> 8) & 0xff).toByte }
    private def u32(v: Long): Unit = (0 until 4).foreach(i =>
      buf += ((v >> (8 * i)) & 0xff).toByte)
    private def u64(v: Long): Unit = (0 until 8).foreach(i =>
      buf += ((v >> (8 * i)) & 0xff).toByte)
    private def patch64(at: Int, v: Long): Unit = (0 until 8).foreach(i =>
      buf(at + i) = ((v >> (8 * i)) & 0xff).toByte)

    // ------------------------------------------------------- message bodies

    private def doublesBytes(a: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putDouble); bb.array()
    }
    private def longsBytes(a: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(a.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      a.foreach(bb.putLong); bb.array()
    }
    private def stringsBytes(a: Array[String], len: Int): Array[Byte] = {
      val out = new Array[Byte](a.length * len)
      a.zipWithIndex.foreach { case (s, i) =>
        val bs = s.getBytes("UTF-8").take(len)
        System.arraycopy(bs, 0, out, i * len, bs.length)
      }
      out
    }

    private def dataspace(dims: Seq[Int]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * dims.size)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(dims.size.toByte).put(0.toByte)
      bb.position(8)
      dims.foreach(d => bb.putLong(d.toLong))
      bb.array()
    }
    private def scalarDataspace: Array[Byte] = {
      val bb = ByteBuffer.allocate(8)
      bb.put(0, 1.toByte); bb.put(1, 0.toByte) // v1, rank 0
      bb.array()
    }
    private val dtFloat64: Array[Byte] = {
      val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0x11.toByte) // v1, class 1 (float)
      bb.put(0x20.toByte).put(0x3f.toByte).put(0x00.toByte) // LE, sign 63
      bb.putInt(8)
      bb.putShort(0).putShort(64) // bit offset / precision
      bb.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
      bb.putInt(1023)
      bb.array()
    }
    private val dtInt64: Array[Byte] = {
      val bb = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0x10.toByte) // v1, class 0 (fixed)
      bb.put(0x08.toByte).put(0.toByte).put(0.toByte) // LE, signed
      bb.putInt(8)
      bb.putShort(0).putShort(64)
      bb.array()
    }
    private def dtString(len: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0x13.toByte) // v1, class 3 (string)
      bb.put(0.toByte).put(0.toByte).put(0.toByte) // null-terminated
      bb.putInt(len)
      bb.array()
    }
    /** Variable-length string type: class 9, type bits = string, 16-byte
      * heap-ID elements, base type a 1-byte string (h5py's shape).
      */
    private val dtVlenString: Array[Byte] = {
      val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(0x19.toByte) // v1, class 9 (variable-length)
      bb.put(0x01.toByte).put(0.toByte).put(0.toByte) // type=string
      bb.putInt(16)       // element size: 4-byte length + 12-byte heap ID
      bb.put(dtString(1)) // base type
      bb.array()
    }

    /** `GCOL` global-heap collections holding every string, in order;
      * returns per-string (collection address, index, byte length).
      * A heap-object index is a 16-bit field, so strings chunk across
      * collections at 65535 per `GCOL` — without this, string 65536
      * would wrap to index 0 (the free-space sentinel) and the file
      * would be silently unreadable. Each collection is terminated by
      * a 16-byte free-space object (index 0).
      */
    private def writeGcol(strings: Seq[Array[Byte]])
        : Seq[(Long, Int, Int)] = {
      def p8(n: Int) = (n + 7) & ~7
      strings.grouped(0xffff).flatMap { group =>
        pad8()
        val addr = pos
        val collSize = 16L + group.map(s => 16 + p8(s.length)).sum + 16
        raw("GCOL".getBytes)
        u8(1); u8(0); u8(0); u8(0) // version, reserved
        u64(collSize)
        val ids = group.zipWithIndex.map { case (s, i) =>
          u16(i + 1); u16(1); u32(0L) // index, refcount, reserved
          u64(s.length.toLong)
          raw(s)
          (s.length until p8(s.length)).foreach(_ => u8(0))
          (addr, i + 1, s.length)
        }
        // free-space terminator: index 0, size = the remaining bytes
        u16(0); u16(0); u32(0L); u64(16L)
        ids
      }.toSeq
    }

    /** The 16-byte heap-ID payload for vlen strings: write the GCOL
      * collection(s) first, then one (length, collection address,
      * index) per element.
      */
    private def vlenPayload(data: Array[String]): Array[Byte] = {
      val bytes = data.toSeq.map(_.getBytes("UTF-8"))
      val ids = writeGcol(bytes)
      val bb = ByteBuffer.allocate(data.length * 16)
        .order(ByteOrder.LITTLE_ENDIAN)
      ids.foreach { case (coll, idx, len) =>
        bb.putInt(len); bb.putLong(coll); bb.putInt(idx)
      }
      bb.array()
    }

    private def attrBody(name: String, value: Any): Array[Byte] = {
      val (dt, ds, data) = value match {
        case d: Double =>
          (dtFloat64, scalarDataspace, doublesBytes(Array(d)))
        case l: Long =>
          (dtInt64, scalarDataspace, longsBytes(Array(l)))
        case i: Int =>
          (dtInt64, scalarDataspace, longsBytes(Array(i.toLong)))
        case s: String =>
          val bs = s.getBytes("UTF-8")
          (dtString(bs.length + 1), scalarDataspace,
            stringsBytes(Array(s), bs.length + 1))
        case VStr(s) =>
          (dtVlenString, scalarDataspace, vlenPayload(Array(s)))
        case a: Array[Double] => // rank-1 numeric attr (common in bundles)
          (dtFloat64, dataspace(Seq(a.length)), doublesBytes(a))
        case other => throw new IllegalArgumentException(
          s"attr type ${other.getClass}")
      }
      def p8(n: Int) = (n + 7) & ~7
      val nameB = name.getBytes("UTF-8") :+ 0.toByte
      val bb = ByteBuffer.allocate(
          8 + p8(nameB.length) + p8(dt.length) + p8(ds.length) + data.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(0.toByte) // v1, reserved
      bb.putShort(nameB.length.toShort)
      bb.putShort(dt.length.toShort)
      bb.putShort(ds.length.toShort)
      bb.put(nameB); bb.position(8 + p8(nameB.length))
      bb.put(dt); bb.position(8 + p8(nameB.length) + p8(dt.length))
      bb.put(ds)
      bb.position(8 + p8(nameB.length) + p8(dt.length) + p8(ds.length))
      bb.put(data)
      bb.array()
    }

    /** Object header from (type, body) messages — v1 or `OHDR` v2 per
      * the builder mode. Returns its address.
      */
    private def objectHeader(msgs: Seq[(Int, Array[Byte])]): Long =
      if (v2) objectHeaderV2(msgs) else {
        pad8()
        val addr = pos
        def padded(n: Int) = (n + 7) & ~7
        val total = msgs.map { case (_, b) => 8 + padded(b.length) }.sum
        u8(1); u8(0)               // version, reserved
        u16(msgs.size)
        u32(1L)                    // reference count
        u32(total.toLong)          // header size
        u32(0L)                    // alignment pad to 16
        msgs.foreach { case (t, body) =>
          u16(t); u16(padded(body.length)); u8(0); u8(0); u8(0); u8(0)
          raw(body)
          (body.length until padded(body.length)).foreach(_ => u8(0))
        }
        addr
      }

    /** `OHDR` v2: flags 0x02 (4-byte chunk-0 size, no times, no creation
      * order), exact message sizes (v2 headers have no 8-byte padding
      * rule), chunk-0 size EXCLUDING the trailing checksum (the field's
      * spec contract), checksum written as zeros (the reader does not
      * verify — fixtures only).
      */
    private def objectHeaderV2(msgs: Seq[(Int, Array[Byte])]): Long = {
      pad8()
      val addr = pos
      raw("OHDR".getBytes)
      u8(2)                      // version
      // flags: 4-byte size of chunk 0, optionally object times tracked
      // (bit 5 — libhdf5's default, four 4-byte timestamp fields)
      u8(if (v2Times) 0x22 else 0x02)
      if (v2Times) { u32(1L); u32(2L); u32(3L); u32(4L) }
      val chunk0 = msgs.map { case (_, b) => 4 + b.length }.sum
      u32(chunk0.toLong)
      msgs.foreach { case (t, body) =>
        u8(t); u16(body.length); u8(0) // type, size, flags
        raw(body)
      }
      u32(0L)                    // checksum (unverified by the reader)
      addr
    }

    // ------------------------------------------------------------ datasets

    private def writeDataset(name: String, v: Value,
                             attrs: Seq[(String, Any)]): Long = {
      val (dt, dims, payload, chunked) = v match {
        case Doubles(d, a, c) => (dtFloat64, d, doublesBytes(a), c)
        case Longs(d, a) => (dtInt64, d, longsBytes(a), None)
        case Strings(len, a) =>
          (dtString(len), Seq(a.length), stringsBytes(a, len), None)
        case VStrings(a) =>
          (dtVlenString, Seq(a.length), vlenPayload(a), None)
        case Alias(t) => throw new IllegalStateException(
          s"Alias($t) resolves in writeGroup, not writeDataset")
      }
      val elemSize = v match {
        case Strings(len, _) => len
        case VStrings(_) => 16
        case _ => 8
      }
      val layout: Array[Byte] = chunked match {
        case None =>
          pad8()
          val dataAddr = pos
          raw(payload)
          val bb = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
          bb.put(3.toByte).put(1.toByte) // v3, contiguous
          bb.putLong(dataAddr).putLong(payload.length.toLong)
          bb.array()
        case Some(cdims) =>
          val btree = writeChunks(dims, cdims, payload, elemSize)
          val bb = ByteBuffer.allocate(3 + 8 + 4 * (dims.size + 1))
            .order(ByteOrder.LITTLE_ENDIAN)
          bb.put(3.toByte).put(2.toByte) // v3, chunked
          bb.put((dims.size + 1).toByte)
          bb.putLong(btree)
          cdims.foreach(c => bb.putInt(c))
          bb.putInt(elemSize)
          bb.array()
      }
      val filterMsg: Seq[(Int, Array[Byte])] = chunked match {
        case None => Seq.empty
        case Some(_) =>
          // pipeline v1: shuffle (elemSize) then deflate (level 6)
          val bb = ByteBuffer.allocate(8 + 16 + 16)
            .order(ByteOrder.LITTLE_ENDIAN)
          bb.put(1.toByte).put(2.toByte) // version, 2 filters
          bb.position(8)
          def filt(id: Int, value: Long): Unit = {
            bb.putShort(id.toShort).putShort(0).putShort(1.toShort)
            bb.putShort(1.toShort) // flags=1 (optional), 1 client value
            bb.putInt(value.toInt)
            bb.putInt(0) // pad to even client-value count
          }
          filt(2, elemSize.toLong)
          filt(1, 6L)
          Seq((0x000B, bb.array()))
      }
      objectHeader(
        Seq((0x0001, dataspace(dims)), (0x0003, dt)) ++ filterMsg ++
          Seq((0x0008, layout)) ++
          attrs.map { case (n, a) => (0x000C, attrBody(n, a)) })
    }

    /** Shuffle+deflate each chunk, lay them out, and index them with one
      * level-0 v1 chunk B-tree. Returns the btree address.
      */
    private def writeChunks(dims: Seq[Int], cdims: Seq[Int],
                            payload: Array[Byte], elemSize: Int): Long = {
      val rank = dims.size
      val grid = dims.zip(cdims).map { case (d, c) => (d + c - 1) / c }
      val chunkCoords = grid.foldLeft(Seq(Seq.empty[Int])) { (acc, g) =>
        acc.flatMap(pre => (0 until g).map(i => pre :+ i))
      }
      def shuffle(in: Array[Byte]): Array[Byte] = {
        val n = in.length / elemSize
        val o = new Array[Byte](in.length)
        var i = 0
        while (i < n) {
          var j = 0
          while (j < elemSize) {
            o(j * n + i) = in(i * elemSize + j); j += 1
          }
          i += 1
        }
        o
      }
      def deflate(in: Array[Byte]): Array[Byte] = {
        val d = new java.util.zip.Deflater(6)
        d.setInput(in); d.finish()
        val o = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](65536)
        while (!d.finished()) o.write(b, 0, d.deflate(b))
        d.end()
        o.toByteArray
      }
      val entries = chunkCoords.map { coord =>
        val off = coord.zip(cdims).map { case (c, w) => c * w }
        // extract the FULL chunk (edge chunks zero-padded, per the spec:
        // chunks are always whole; readers clip)
        val chunk = new Array[Byte](cdims.product * elemSize)
        val copyDims = (0 until rank).map(d =>
          math.min(cdims(d), dims(d) - off(d)))
        val nRows = copyDims.dropRight(1).product.max(1)
        val rowBytes = copyDims.last * elemSize
        (0 until nRows).foreach { r =>
          var rem = r
          val lc = new Array[Int](rank)
          ((rank - 2) to 0 by -1).foreach { d =>
            lc(d) = rem % copyDims(d); rem /= copyDims(d) }
          var src = 0L
          (0 until rank).foreach { d =>
            val c = if (d == rank - 1) off(d) else off(d) + lc(d)
            src = src * dims(d) + c
          }
          var dst = 0L
          (0 until rank - 1).foreach(d => dst = dst * cdims(d) + lc(d))
          System.arraycopy(payload, (src * elemSize).toInt,
            chunk, (dst * cdims.last * elemSize).toInt, rowBytes)
        }
        val enc = deflate(shuffle(chunk))
        pad8()
        val addr = pos
        raw(enc)
        (off, enc.length, addr)
      }
      pad8()
      val btree = pos
      raw("TREE".getBytes)
      u8(1); u8(0)                  // type 1 (chunk), level 0
      u16(entries.size)
      u64(-1L); u64(-1L)            // left/right siblings
      entries.foreach { case (off, nbytes, addr) =>
        u32(nbytes.toLong); u32(0L) // size, filter mask
        off.foreach(o => u64(o.toLong))
        u64(0L)                     // element-dimension offset
        u64(addr)
      }
      // trailing key
      u32(0L); u32(0L); (0 to rank).foreach(_ => u64(0L))
      btree
    }

    // -------------------------------------------------------------- groups

    /** Dataset addresses by absolute path, for hard-link aliases. */
    private val written = scala.collection.mutable.Map.empty[String, Long]

    def writeGroup(node: Node, prefix: String): Long = {
      val children: Seq[(String, Long)] =
        node.datasets.map {
          case (n, Alias(target)) =>
            n -> written.getOrElse(target, throw new IllegalArgumentException(
              s"Alias target $target not yet written " +
                s"(have ${written.keys.mkString(", ")})"))
          case (n, v) =>
            val addr = writeDataset(n, v,
              node.dsAttrs.getOrElse(n, Seq.empty))
            written(s"$prefix/$n") = addr
            n -> addr
        } ++
          node.groups.map { case (n, g) => n -> writeGroup(g, s"$prefix/$n") }
      if (v2) {
        // new-style COMPACT group: one hard-link message per child
        val linkMsgs = children.map { case (n, addr) =>
          val nb = n.getBytes("UTF-8")
          val bb = ByteBuffer.allocate(3 + nb.length + 8)
            .order(ByteOrder.LITTLE_ENDIAN)
          bb.put(1.toByte)       // version
          bb.put(0.toByte)       // flags: hard link, 1-byte name length
          bb.put(nb.length.toByte)
          bb.put(nb)
          bb.putLong(addr)
          (0x0006, bb.array())
        }
        return objectHeader(linkMsgs ++
          node.attrs.map { case (n, a) => (0x000C, attrBody(n, a)) })
      }
      // local heap: names at offsets (offset 0 reserved)
      pad8()
      val heapDataAddr = pos + 32
      var off = 8L
      val nameOffsets = children.sortBy(_._1).map { case (n, a) =>
        val o = off; off += n.getBytes("UTF-8").length + 1
        (n, a, o)
      }
      val heapSize = (off + 7) & ~7
      raw("HEAP".getBytes); u8(0); u8(0); u8(0); u8(0)
      u64(heapSize); u64(0L); u64(heapDataAddr)
      u64(0L) // offset 0: the empty name slot
      nameOffsets.foreach { case (n, _, _) =>
        raw(n.getBytes("UTF-8")); u8(0) }
      while (pos < heapDataAddr + heapSize) u8(0)
      val heapAddr = heapDataAddr - 32

      pad8()
      val snod = pos
      raw("SNOD".getBytes); u8(1); u8(0)
      u16(nameOffsets.size)
      nameOffsets.foreach { case (_, addr, nameOff) =>
        u64(nameOff); u64(addr); u32(0L); u32(0L)
        (0 until 16).foreach(_ => u8(0))
      }

      pad8()
      val btree = pos
      raw("TREE".getBytes); u8(0); u8(0) // type 0 (group), level 0
      u16(1)
      u64(-1L); u64(-1L)
      u64(0L)    // key 0
      u64(snod)
      u64(0L)    // key 1
      val st = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      st.putLong(btree).putLong(heapAddr)
      objectHeader(Seq((0x0011, st.array())) ++
        node.attrs.map { case (n, a) => (0x000C, attrBody(n, a)) })
    }

    def finish(path: String, rootAddr: Long): Unit = {
      val sig = Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      sig.zipWithIndex.foreach { case (b, i) => buf(i) = b }
      if (v2) {
        buf(8) = 3                   // superblock version 3
        buf(9) = 8; buf(10) = 8      // offsets / lengths sizes
        buf(11) = 0                  // flags
        patch64(12, 0L)              // base address
        patch64(20, -1L)             // superblock extension (undefined)
        patch64(28, buf.length.toLong) // end of file
        patch64(36, rootAddr)        // root group object header
        // bytes 44-47: checksum, unverified by the reader
        writeAll(path, buf.toArray)
        return
      }
      // versions already 0; offsets/lengths sizes and B-tree K values
      buf(13) = 8; buf(14) = 8
      buf(16) = 4; buf(18) = 16 // leaf K, internal K
      patch64(24, 0L)               // base address
      patch64(32, -1L)              // free-space address (undefined)
      patch64(40, buf.length.toLong) // end of file
      patch64(48, -1L)              // driver info (undefined)
      patch64(56 + 8, rootAddr)     // root STE: object header address
      writeAll(path, buf.toArray)
    }

    /** Whole-buffer write through the path's Hadoop FileSystem — the
      * export lands on the same storage the engine's parquet stores use
      * (local, HDFS, any registered scheme), not only the driver disk.
      */
    private def writeAll(path: String, bytes: Array[Byte]): Unit = {
      val (fs, p) = Bundle.fsPath(path)
      val out = fs.create(p, true)
      try out.write(bytes) finally out.close()
    }
  }
}
