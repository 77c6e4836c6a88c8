package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Codecs, Multimodal}

/** Multimodal plumbing: schema, metadata, per-partition feature extraction
  * (stub decoder), frame sampling, and the REAL pure-JVM codecs
  * (Netpbm raster parse, RIFF/WAVE chunk walk).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "payload-one".getBytes("UTF-8")),
    (2L, "a much longer payload with more bytes in it".getBytes("UTF-8")))
    .toDF("media_id", "payload")

  test("withMeta attaches kind and byte length") {
    val m = Multimodal.withMeta(media, "image").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("kind"), r.getAs[Long]("byte_len"))).toMap
    assert(m(1L) == ("image", 11L))
    assert(m(2L)._2 == "a much longer payload with more bytes in it".getBytes("UTF-8").length.toLong)
  }

  test("withMeta header dims agree with decodeMedia on real PPM/WAV bytes") {
    val ppm = Codecs.encodeNetpbm(5, 4, 3, Array.tabulate(60)(j => (j * 7) % 256))
    val wav = Codecs.encodeWav(8000, 2, Array.tabulate(16)(j => j * 100 - 800))
    val real = Seq((1L, ppm), (2L, wav)).toDF("media_id", "payload")
    val meta = Multimodal.withMeta(real, "media").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    val dec = Multimodal.decodeMedia(spark, real).collect()
      .map(d => d.media_id -> (d.width, d.height)).toMap
    assert(meta(1L) == ((5, 4)) && meta(1L) == dec(1L))
    assert(meta(2L) == ((0, 0)) && meta(2L) == dec(2L))
    // unknown containers keep the documented length-derived stub shape
    val unk = Multimodal.withMeta(media, "image").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("width")).toMap
    assert(unk(1L) == 11 % 64 + 1)
  }

  test("extractFeatures is deterministic with fixed width") {
    val withMeta = Multimodal.withMeta(media, "image")
    val f1 = Multimodal.extractFeatures(spark, withMeta, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, withMeta, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1(1L).size == 8 && f1(2L).size == 8)
    assert(f1(1L) != f1(2L))
  }

  test("sampleFrames keeps every stride-th fixed-size chunk") {
    val out = Multimodal.sampleFrames(media.filter($"media_id" === 2L),
      frameBytes = 10, stride = 2)
    val idx = out.select("frame_idx").as[Int].collect().sorted
    assert(idx.toSeq == Seq(0, 2)) // 43 bytes → 4 frames → keep 0, 2
    val frames = out.select("frame").as[Array[Byte]].collect()
    assert(frames.forall(_.length == 10))
    // the fan-out must not carry the source payload: exploded rows hold
    // ONLY their own frame slice (schema contract — a 1 GB video sampled
    // at 1000 frames would otherwise materialize ~1 TB of rows)
    assert(!out.columns.contains("payload"),
      "sampleFrames leaked the full payload through the explode")
  }

  test("sampleFrames on a multi-MB payload: frames only, bytes correct") {
    // 8 MB payload, 64 KB frames, every 4th → 32 frames of 64 KB each;
    // the exploded intermediate is ~2 MB of frame bytes, not 32 x 8 MB
    val big = Array.tabulate[Byte](8 * 1024 * 1024)(i => (i * 31 % 251).toByte)
    val out = Multimodal.sampleFrames(
      Seq((7L, big)).toDF("media_id", "payload"),
      frameBytes = 64 * 1024, stride = 4)
    val got = out.select("frame_idx", "frame").collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == (0 until 128 by 4).toSet)
    assert(got.values.forall(_.length == 64 * 1024))
    // spot-check slices against the source bytes
    Seq(0, 4, 124).foreach { idx =>
      val expect = big.slice(idx * 64 * 1024, (idx + 1) * 64 * 1024)
      assert(java.util.Arrays.equals(got(idx), expect), s"frame $idx bytes")
    }
  }

  test("resizeNetpbm: nearest-neighbor sampling, channels preserved, " +
       "identity resize is lossless, bad payloads become error rows") {
    // 4x2 RGB source with distinct per-pixel values
    val src = Array.tabulate(4 * 2 * 3)(identity)
    val ppm = Codecs.encodeNetpbm(4, 2, 3, src)
    val rows = Multimodal.resizeNetpbm(spark,
      Seq((1L, ppm), (2L, "not an image".getBytes("UTF-8")))
        .toDF("media_id", "payload"), outW = 2, outH = 1).collect()
      .map(r => r.media_id -> r).toMap
    val r1 = rows(1L)
    assert((r1.container, r1.width, r1.height, r1.channels) == (("ppm", 2, 1, 3)))
    val out = Codecs.decodeNetpbm(r1.payload)
    // target (x, y) samples source (x*4/2, y*2/1) = pixels (0,0) and (2,0)
    assert(out.pixels.toSeq == (src.slice(0, 3) ++ src.slice(6, 9)).toSeq)
    assert(r1.n_values == 6 && r1.v_sum == out.pixels.map(_.toLong).sum)
    assert(rows(2L).container == "unknown")

    // identity resize reproduces the raster exactly
    val same = Multimodal.resizeNetpbm(spark,
      Seq((3L, ppm)).toDF("media_id", "payload"), outW = 4, outH = 2)
      .collect().head
    assert(Codecs.decodeNetpbm(same.payload).pixels.toSeq == src.toSeq)
  }

  // ----------------------------------------------------------- codecs ---

  test("Netpbm PPM/PGM roundtrip recovers dims and raster exactly") {
    val px = Array.tabulate(5 * 4 * 3)(j => (j * 7) % 256)
    val img = Codecs.decodeNetpbm(Codecs.encodeNetpbm(5, 4, 3, px))
    assert((img.width, img.height, img.channels, img.maxVal) == (5, 4, 3, 255))
    assert(img.pixels.toSeq == px.toSeq)
    val gray = Array.tabulate(7 * 2)(j => (j * 31) % 256)
    val g = Codecs.decodeNetpbm(Codecs.encodeNetpbm(7, 2, 1, gray))
    assert((g.width, g.height, g.channels) == (7, 2, 1))
    assert(g.pixels.toSeq == gray.toSeq)
  }

  test("Netpbm header parse handles comments, multi-digit dims, and a " +
       "whitespace-valued first raster byte") {
    // 0x0a == '\n': the raster's first byte is whitespace-valued — only the
    // single-separator rule decodes this correctly.
    val raster = Array[Int](0x0a, 0x20, 0x00, 0xff)
    val header = "P5 # comment\n# another comment\n 22\t1\n# last\n255\n"
    val payload = header.getBytes("US-ASCII") ++
      Array.fill(22)(1.toByte) // raster: width 22, height 1
    val full = "P5\n# c\n4 1\n255\n".getBytes("US-ASCII") ++
      raster.map(_.toByte)
    val img = Codecs.decodeNetpbm(full)
    assert((img.width, img.height) == (4, 1))
    assert(img.pixels.toSeq == raster.toSeq)
    val wide = Codecs.decodeNetpbm(payload)
    assert((wide.width, wide.height) == (22, 1))
  }

  test("Netpbm decode rejects truncated rasters") {
    val ok = Codecs.encodeNetpbm(4, 4, 1, Array.fill(16)(9))
    intercept[IllegalArgumentException] {
      Codecs.decodeNetpbm(ok.dropRight(1))
    }
  }

  test("WAV roundtrip recovers rate, channels, and signed samples exactly") {
    val samples = Array(-32768, -1, 0, 1, 32767, 12345, -12345)
    val au = Codecs.decodeWav(Codecs.encodeWav(44100, 1, samples))
    assert((au.sampleRate, au.nChannels) == (44100, 1))
    assert(au.samples.toSeq == samples.toSeq)
  }

  test("WAV chunk walk skips unknown chunks (incl. odd-size padding)") {
    // Splice a 3-byte junk chunk (padded to 4) between fmt and data.
    val base = Codecs.encodeWav(8000, 2, Array(5, -5, 7, -7))
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0) // size 3, body+pad
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val au = Codecs.decodeWav(spliced)
    assert((au.sampleRate, au.nChannels) == (8000, 2))
    assert(au.samples.toSeq == Seq(5, -5, 7, -7))
  }

  test("WAV decode rejects a negative chunk size instead of looping") {
    val bad = Codecs.encodeWav(8000, 1, Array(1, 2, 3))
    bad(4 + 12 + 4) = 0xff.toByte // fmt chunk size low byte
    bad(4 + 12 + 5) = 0xff.toByte
    bad(4 + 12 + 6) = 0xff.toByte
    bad(4 + 12 + 7) = 0xff.toByte // size = -1: must error, not hang
    intercept[IllegalArgumentException] { Codecs.decodeWav(bad) }
  }

  test("decodeMedia dispatches on magic and keeps the stub for unknowns") {
    val rows = Seq(
      1L -> Codecs.encodeNetpbm(3, 2, 3, Array.tabulate(18)(_ % 256)),
      2L -> Codecs.encodeNetpbm(2, 2, 1, Array(10, 20, 30, 40)),
      3L -> Codecs.encodeWav(16000, 1, Array(100, -100, 0)),
      4L -> "not a known container".getBytes("UTF-8"),
      5L -> Codecs.encodeNetpbm(4, 4, 1, Array.fill(16)(7)).dropRight(3))
    val df = rows.toDF("media_id", "payload")
    val out = Multimodal.decodeMedia(spark, df).collect()
      .map(d => d.media_id -> d).toMap
    assert(out(1L).container == "ppm" &&
      (out(1L).width, out(1L).height, out(1L).channels) == (3, 2, 3) &&
      out(1L).n_values == 18 && out(1L).v_sum == (0 until 18).sum)
    assert(out(2L).container == "pgm" && out(2L).v_sum == 100 &&
      out(2L).v_min == 10 && out(2L).v_max == 40)
    assert(out(3L).container == "wav" && out(3L).sample_rate == 16000 &&
      out(3L).v_sum == 0 && out(3L).v_min == -100 && out(3L).v_max == 100)
    assert(out(4L).container == "unknown")
    // matching magic + malformed body degrades to an error row instead of
    // failing the whole job
    assert(out(5L).container == "error" && out(5L).n_values > 0)
  }

  test("aHash: brightness-shift invariant, wraparound-free exact dups at hamming 0") {
    import spark.implicits._
    def img(id: Long, base: Int, w: Int = 12, h: Int = 10): (Long, Array[Byte]) = {
      // smooth mid-range gradient, no mod-256 wraparound -> a constant
      // shift must leave the hash IDENTICAL
      val px = Array.tabulate(w * h)(j => base + (j % 97))
      (id, graft.multimodal.Codecs.encodeNetpbm(w, h, 1, px))
    }
    val media = Seq(
      img(1L, 40), img(2L, 45), // shifted copy of 1
      img(3L, 40),              // exact copy of 1
      (4L, graft.multimodal.Codecs.encodeWav(8000, 1, Array(1, 2, 3))), // no hash
      (5L, Array[Byte](1, 2, 3)) // unknown container -> no hash
    ).toDF("media_id", "payload")
    val hashes = graft.multimodal.Multimodal.aHash(spark, media).collect()
      .map(h => h.media_id -> h.ahash).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L), "only raster payloads hash")
    assert(hashes(1L).length == 64 && hashes(1L).forall(c => c == '0' || c == '1'))
    assert(hashes(1L) == hashes(3L), "identical images must hash equal")
    assert(hashes(1L) == hashes(2L), "constant shift must be hash-invariant")

    val pairs = graft.multimodal.Multimodal.perceptualDupPairs(
      graft.multimodal.Multimodal.aHash(spark, media).toDF(),
      maxHamming = 6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(pairs == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("JDK imageio codecs: PNG/BMP round-trip pixel-exact, JPEG decodes " +
       "deterministically with bounded loss, magics sniff, header-only " +
       "dims are real") {
    val w = 6; val h = 4
    val px = Array.tabulate(w * h * 3)(j => (j * 37 + 11) % 256)
    val png = Codecs.encodePng(w, h, 3, px)
    assert(Codecs.sniff(png) == "png")
    assert(Codecs.sniffDims(png).contains((w, h, 3, 0)),
      "header-only dims must come from the real PNG header")
    val back = Codecs.decodeImageIO(png)
    assert(back.width == w && back.height == h && back.channels == 3)
    assert(back.pixels.toSeq == px.toSeq, "PNG round trip must be lossless")

    // gray source: every value replicated across RGB
    val gpx = Array.tabulate(w * h)(j => (j * 7) % 256)
    val gback = Codecs.decodeImageIO(Codecs.encodePng(w, h, 1, gpx))
    assert((0 until w * h).forall { j =>
      gback.pixels(3 * j) == gpx(j) && gback.pixels(3 * j + 1) == gpx(j) &&
        gback.pixels(3 * j + 2) == gpx(j)
    }, "gray PNG must decode value-replicated")

    // BMP through the same JDK writer/reader: lossless as well
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, (px(o) << 16) | (px(o + 1) << 8) | px(o + 2))
    }
    def encode(fmt: String) = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val bmp = encode("bmp")
    assert(Codecs.sniff(bmp) == "bmp")
    assert(Codecs.decodeImageIO(bmp).pixels.toSeq == px.toSeq,
      "BMP round trip must be lossless")

    // JPEG: lossy but deterministic — two decodes agree exactly; on a
    // SMOOTH raster (JPEG's design case; the noise fixture above is its
    // worst case) pixels stay within a tight band of the source
    val smooth = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val spx = Array.tabulate(w * h * 3) { o =>
      val p = o / 3; (((p % w) * 16 + (p / w) * 8 + 64) min 255)
    }
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      smooth.setRGB(x, y, (spx(o) << 16) | (spx(o + 1) << 8) | spx(o + 2))
    }
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(smooth, "jpg", jbos)
    val jpg = jbos.toByteArray
    assert(Codecs.sniff(jpg) == "jpeg")
    val j1 = Codecs.decodeImageIO(jpg)
    val j2 = Codecs.decodeImageIO(jpg)
    assert(j1.pixels.toSeq == j2.pixels.toSeq,
      "JPEG decode must be deterministic for this JDK")
    assert(j1.width == w && j1.height == h)
    val meanErr = spx.indices.map(i => math.abs(j1.pixels(i) - spx(i))).sum /
      spx.length.toDouble
    assert(meanErr < 12.0, s"JPEG decode wildly off: mean |err| $meanErr")

    // decodeMedia dispatches the new containers end-to-end
    import spark.implicits._
    val media = Seq((1L, png), (2L, jpg), (3L, bmp))
      .toDF("media_id", "payload")
    val rows = Multimodal.decodeMedia(spark, media).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows(1L).container == "png" && rows(3L).container == "bmp")
    assert(rows(1L).v_sum == px.map(_.toLong).sum)
    assert(rows(3L).v_sum == px.map(_.toLong).sum)
    assert(rows(2L).container == "jpeg" &&
      rows(2L).n_values == (w * h * 3).toLong)

    // the shared raster dispatch carries resize and perceptual hashing
    // over the imageio containers too
    val resized = Multimodal.resizeNetpbm(spark,
      Seq((1L, png)).toDF("media_id", "payload"), outW = 3, outH = 2)
      .collect().head
    assert(resized.container == "png" && resized.width == 3 &&
      resized.height == 2 && resized.channels == 3)
    val expect = (for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3)
      yield px(((y * h / 2) * w + (x * w / 3)) * 3 + c)).toSeq
    val rback = Codecs.decodeImageIO(resized.payload)
    assert(rback.pixels.toSeq == expect,
      "PNG resize must nearest-neighbor-sample exactly and re-encode " +
        "losslessly")
    val hashed = Multimodal.aHash(spark,
      Seq((1L, png)).toDF("media_id", "payload")).collect()
    assert(hashed.length == 1 && hashed.head.ahash.length == 64,
      "aHash must cover imageio rasters")
  }

  test("multi-page TIFF: frame round trip is lossless; decodeFrameStats " +
       "samples by stride, treats single-frame rasters as frame 0, and " +
       "routes bad payloads to error rows") {
    val w = 4; val h = 3
    val frames = (0 until 5).map(f =>
      Array.tabulate(w * h * 3)(j => (f * 31 + j * 13) % 256))
    val tiff = Codecs.encodeTiff(w, h, frames)
    assert(Codecs.sniff(tiff) == "tiff")
    val back = Codecs.decodeFrames(tiff)
    assert(back.length == 5, "all pages must decode")
    assert(back.zip(frames).forall { case (img, px) =>
      img.width == w && img.height == h && img.pixels.toSeq == px.toSeq
    }, "TIFF page round trip must be lossless")

    import spark.implicits._
    val ppm = Codecs.encodeNetpbm(2, 2, 1, Array(1, 2, 3, 4))
    val media = Seq((1L, tiff), (2L, ppm),
      (3L, ("II*" + "\u0000" + "garbage").getBytes("US-ASCII")),
      (4L, "no magic at all".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
    val rows = Multimodal.decodeFrameStats(spark, media, stride = 2)
      .collect().map(r => (r.media_id, r.frame_idx) -> r).toMap
    // stride 2 over 5 frames keeps 0, 2, 4
    assert(rows.keySet.filter(_._1 == 1L) ==
      Set((1L, 0), (1L, 2), (1L, 4)), s"sampled frames: ${rows.keySet}")
    assert(rows((1L, 2)).v_sum ==
      frames(2).map(_.toLong).sum, "frame-2 stats must be exact")
    // a single-frame raster is frame 0 (gray netpbm: value replicated? no
    // — netpbm path keeps its own 1-channel raster)
    assert(rows((2L, 0)).n_values == 4L && rows((2L, 0)).v_sum == 10L)
    // tiff magic + garbage body → explicit error row, not an abort
    assert(rows((3L, -1)).container == "error")
    // unknown container emits nothing
    assert(!rows.keySet.exists(_._1 == 4L))
  }

  test("audio features: Goertzel bands localize a pure tone, integer " +
       "energy/ZCR are exact, non-WAV payloads emit nothing") {
    import spark.implicits._
    val rate = 8000; val n = 1024
    // tone EXACTLY at band 3's center (250 + 500·3 = 1750 Hz, an exact
    // DFT bin for n = 1024): the probe at band 3 resonates, every other
    // band center is an orthogonal bin and reads ~0
    val tone = Array.tabulate(n)(k =>
      (12000 * math.sin(2 * math.Pi * 1750 * k / rate)).toInt)
    val square = Array.tabulate(64)(k => if (k % 2 == 0) 1000 else -1000)
    val media = Seq(
      (1L, Codecs.encodeWav(rate, 1, tone)),
      (2L, Codecs.encodeWav(rate, 1, square)),
      (3L, "not audio".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
    val rows = Multimodal.audioFeatures(spark, media, nBands = 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(!rows.contains(3L), "non-WAV must emit nothing")

    val t = rows(1L)
    assert(t.n_samples == n.toLong)
    assert(t.sum_sq == tone.map(v => v.toLong * v).sum)
    assert(t.peak_band == 3, s"1750 Hz tone peaked in band ${t.peak_band}")
    // on-center resonance vs orthogonal-bin probes: orders of magnitude
    assert(t.band_energies(3) > 1e6 * t.band_energies(7),
      s"tone energy must concentrate: ${t.band_energies.toSeq}")

    val q = rows(2L)
    assert(q.zero_crossings == 63L,
      "alternating-sign square wave crosses zero at every step")

    // determinism (float path included)
    val again = Multimodal.audioFeatures(spark, media, nBands = 8)
      .collect().map(f => f.media_id -> f.band_energies.toSeq).toMap
    assert(again(1L) == rows(1L).band_energies.toSeq)
  }
}
