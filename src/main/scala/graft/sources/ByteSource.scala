package graft.sources

import java.nio.{ByteBuffer, ByteOrder, MappedByteBuffer}
import java.nio.channels.FileChannel
import java.nio.file.{Path, StandardOpenOption}

/** Random-access little-endian byte view with LONG offsets — the
  * accessor layer under the binary-archive readers ([[Hdf5]]). Two
  * implementations: an in-heap array (the distributed file-per-task
  * ingest path, bounded at 2 GiB by the JVM array limit) and a
  * memory-mapped window chain over a file, which lifts the container
  * size past 2 GiB (scalar reads resolve inside one window — windows
  * overlap by 8 bytes more than the largest scalar — and bulk reads go
  * through positioned channel reads, so no read ever straddles
  * anything). Individual DECODED datasets still land in JVM arrays and
  * stay 2 GiB-bounded; only the container bound lifts.
  */
private[graft] trait ByteSource {
  def size: Long
  def u8(p: Long): Int
  def u16(p: Long): Int
  def u32(p: Long): Long
  def u64(p: Long): Long
  def bytesAt(p: Long, n: Int): Array[Byte]
}

/** Whole archive in one heap array (≤ 2 GiB by construction). */
private[graft] final class HeapByteSource(bytes: Array[Byte])
    extends ByteSource {
  private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
  def size: Long = bytes.length.toLong
  def u8(p: Long): Int = buf.get(p.toInt) & 0xff
  def u16(p: Long): Int = buf.getShort(p.toInt) & 0xffff
  def u32(p: Long): Long = buf.getInt(p.toInt) & 0xffffffffL
  def u64(p: Long): Long = buf.getLong(p.toInt)
  def bytesAt(p: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    System.arraycopy(bytes, p.toInt, a, 0, n)
    a
  }
}

/** Memory-mapped window chain: 1 GiB windows with a 64-byte overlap so
  * every ≤ 8-byte scalar at any offset resolves inside one window; bulk
  * `bytesAt` uses positioned channel reads (correct at any offset and
  * length, no window logic). Windows map lazily — a sparse walk of a
  * huge archive touches only the regions it reads. Thread-confined like
  * the readers above it (one reader per task).
  */
private[graft] final class MappedByteSource(path: Path)
    extends ByteSource with AutoCloseable {
  private val ch = FileChannel.open(path, StandardOpenOption.READ)
  val size: Long = ch.size()
  private val WindowBits = 30
  private val Overlap = 64L
  private val windows =
    new Array[MappedByteBuffer](((size >> WindowBits) + 1).toInt)

  private def win(p: Long): (MappedByteBuffer, Int) = {
    val i = (p >> WindowBits).toInt
    var w = windows(i)
    if (w == null) {
      val off = i.toLong << WindowBits
      val len = math.min(size - off, (1L << WindowBits) + Overlap)
      w = ch.map(FileChannel.MapMode.READ_ONLY, off, len)
      w.order(ByteOrder.LITTLE_ENDIAN)
      windows(i) = w
    }
    (w, (p - (i.toLong << WindowBits)).toInt)
  }

  def u8(p: Long): Int = { val (w, o) = win(p); w.get(o) & 0xff }
  def u16(p: Long): Int = { val (w, o) = win(p); w.getShort(o) & 0xffff }
  def u32(p: Long): Long = { val (w, o) = win(p); w.getInt(o) & 0xffffffffL }
  def u64(p: Long): Long = { val (w, o) = win(p); w.getLong(o) }

  def bytesAt(p: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    val bb = ByteBuffer.wrap(a)
    var pos = p
    while (bb.hasRemaining) {
      val k = ch.read(bb, pos)
      if (k < 0) throw new java.io.EOFException(
        s"$path: read past end at offset $pos (wanted $n bytes from $p)")
      pos += k
    }
    a
  }

  def close(): Unit = ch.close()
}
