package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{Bundle, Hdf5Writer, ImageSource, LogReader}

/** S1–S7/K1/K6/T2 — image decode, log readers, parquet bundle + manifest
  * invalidation.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("EDF encode → decode round-trips, including gzip") {
    val w = 8; val h = 4
    val data = Array.tabulate(w * h)(i => i * 1.5)
    val bytes = ImageSource.encodeEdf(w, h, data)
    val (dw, dh, out) = ImageSource.decodeEdf(bytes, gzipped = false)
    assert((dw, dh) == (w, h))
    assert(out.toSeq == data.toSeq)

    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(bytes); g.close(); bos.toByteArray
    }
    val (_, _, out2) = ImageSource.decodeEdf(gz, gzipped = true)
    assert(out2.toSeq == data.toSeq)
  }

  test("graft-edf registered source: frame-per-task parity with the " +
       "binaryFile path, header-only projection skips the payload, " +
       "image_id filters prune files before any byte is read") {
    import graft.sources.EdfSource
    val dir = Files.createTempDirectory("edfsrc").toFile
    val frames = (0 until 5).map { k =>
      val data = Array.tabulate(12)(i => (i * 3 + k).toDouble) // 4x3
      val raw = ImageSource.encodeEdf(4, 3, data)
      val name = if (k % 2 == 0) s"img_$k.edf" else {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(raw); g.close()
        Files.write(Paths.get(dir.getPath, s"img_$k.edf.gz"), bos.toByteArray)
        s"img_$k.edf.gz"
      }
      if (k % 2 == 0) Files.write(Paths.get(dir.getPath, name), raw)
      name -> data
    }.toMap

    // full read == the binaryFile+flatMap on-ramp, row for row
    val viaSource = spark.read.format("graft-edf").load(dir.getPath)
      .collect()
      .map(r => r.getAs[String]("image_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[scala.collection.Seq[Double]]("data").toSeq)))
      .toMap
    val viaBinary = ImageSource.readFrames(
        spark.read.format("binaryFile").load(dir.getPath))
      .collect()
      .map(f => f.image_id -> ((f.width, f.height, f.data.toSeq))).toMap
    assert(viaSource == viaBinary && viaSource.keySet == frames.keySet)
    assert(EdfSource.lastScan.get() == ((5, 5, true)))

    // header-only projection: the scan reports NO payload decode and
    // the dims are right (both plain and gzipped frames)
    val dims = spark.read.format("graft-edf").load(dir.getPath)
      .select("image_id", "width", "height").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(dims.values.toSet == Set((4, 3)) && dims.keySet == frames.keySet)
    assert(EdfSource.lastScan.get() == ((5, 5, false)),
      "a dims-only projection must not decode the pixel payload")

    // file pruning: equality / IN / prefix on image_id narrow the list
    val one = spark.read.format("graft-edf").load(dir.getPath)
      .filter(col("image_id") === "img_1.edf.gz").select("image_id", "data")
      .collect()
    assert(one.map(_.getString(0)).toSeq == Seq("img_1.edf.gz"))
    assert(one(0).getAs[scala.collection.Seq[Double]]("data").toSeq == frames("img_1.edf.gz").toSeq)
    assert(EdfSource.lastScan.get() == ((1, 5, true)))
    spark.read.format("graft-edf").load(dir.getPath)
      .filter(col("image_id").isin("img_0.edf", "img_2.edf"))
      .select("width").collect()
    assert(EdfSource.lastScan.get() == ((2, 5, false)))
    spark.read.format("graft-edf").load(dir.getPath)
      .filter(col("image_id").startsWith("img_4")).count()
    assert(EdfSource.lastScan.get()._1 == 1)

    // E1 parity: the fused kernel over this source's frames equals the
    // binaryFile-fused result exactly
    import spark.implicits._
    val g = graft.functions.ScatteringFunctions.Poni(
      dist = 0.1, poni1 = 0.004, poni2 = 0.004,
      pixel1 = 1e-3, pixel2 = 1e-3, wavelengthA = 1.0)
    val grid = graft.operators.Azav.QGrid(0.0, 0.4, 5)
    val srcFrames = spark.read.format("graft-edf").load(dir.getPath)
      .as[(String, Int, Int, Array[Double])]
      .map { case (id, w, h, d) => ImageSource.Frame(id, w, h, d) }
    val a = graft.operators.Azav.integrateFrames(srcFrames, g, grid)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = graft.operators.Azav.integrateBinary(
        spark.read.format("binaryFile").load(dir.getPath), g, grid)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a == b, "graft-edf frames must integrate identically")
  }

  test("graft-edf at many-file scale: maxFramesPerTask bin-packs the " +
       "task count with row parity, limit-N bounds the scan") {
    import graft.sources.EdfSource
    val dir = Files.createTempDirectory("edfmany").toFile
    val n = 120
    (0 until n).foreach { k =>
      val raw = ImageSource.encodeEdf(2, 2,
        Array.tabulate(4)(i => (i + k).toDouble))
      Files.write(Paths.get(dir.getPath, f"f$k%04d.edf"), raw)
    }
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("image_id", "data").collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("data").toSeq).toMap

    // frame-grain default: one task per file
    val frameGrain = spark.read.format("graft-edf").load(dir.getPath)
    assert(frameGrain.rdd.getNumPartitions == n)
    val want = snap(frameGrain)
    assert(want.size == n)

    // bin-packed: ceil(120/16) = 8 tasks, identical rows
    val packed = spark.read.format("graft-edf")
      .option("maxFramesPerTask", "16").load(dir.getPath)
    assert(packed.rdd.getNumPartitions == 8,
      s"expected 8 bin-packed tasks, got ${packed.rdd.getNumPartitions}")
    assert(snap(packed) == want, "bin-packing changed the rows")

    // limit-N: first N frames in name order, scan never touches the rest
    val lim = spark.read.format("graft-edf")
      .option("limit", "10").load(dir.getPath)
    val got = lim.select("image_id").collect().map(_.getString(0)).sorted
    assert(got.toSeq == (0 until 10).map(k => f"f$k%04d.edf"))
    assert(EdfSource.lastScan.get()._1 == 10,
      "limit must bound the file list before any read")
  }

  test("graft-edf honors a path-shaped glob (sub/*.edf) via globStatus " +
       "instead of silently matching nothing") {
    val dir = Files.createTempDirectory("edfsub").toFile
    val sub = new java.io.File(dir, "run01"); sub.mkdirs()
    val other = new java.io.File(dir, "run02"); other.mkdirs()
    (0 until 3).foreach { k =>
      val raw = ImageSource.encodeEdf(2, 2,
        Array.tabulate(4)(i => (i + k).toDouble))
      Files.write(Paths.get(sub.getPath, s"a$k.edf"), raw)
      Files.write(Paths.get(other.getPath, s"b$k.edf"), raw)
    }
    val got = spark.read.format("graft-edf")
      .option("pathGlobFilter", "run01/*.edf")
      .load(dir.getPath)
      .select("image_id").collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a0.edf", "a1.edf", "a2.edf"),
      s"path-shaped glob must expand through globStatus, got ${got.toSeq}")
  }

  test("readEdfFolder explodes frames into the pixel table") {
    val dir = Files.createTempDirectory("edf").toFile
    val data = Array.tabulate(6)(_.toDouble) // 3x2 image
    Files.write(Paths.get(dir.getPath, "img_a.edf"),
      ImageSource.encodeEdf(3, 2, data))
    val px = ImageSource.readEdfFolder(spark, dir.getPath)
    assert(px.count() == 6)
    val r = px.filter(col("y") === 1 && col("x") === 2).collect()(0)
    assert(r.getAs[Double]("intensity") == 5.0)
    assert(r.getAs[String]("image_id") == "img_a.edf")
  }

  test("readLogFile: header from last comment, skip_first/skip_last") {
    val dir = Files.createTempDirectory("log")
    val f = dir.resolve("run.log")
    Files.writeString(f,
      """# some preamble
        |# file delay currentmA
        |f1 100ps 90.0
        |f2 200ps 91.0
        |f3 off 20.0
        |f4 1ns 92.0
        |""".stripMargin)
    val df = LogReader.readLogFile(spark, f.toString)
    assert(df.columns.toSeq == Seq("file", "delay", "currentmA"))
    assert(df.count() == 4)
    val sliced = LogReader.readLogFile(spark, f.toString, skipFirst = 1, skipLast = 1)
    assert(sliced.select("file").as[String].collect().toSet == Set("f2", "f3"))
  }

  test("readId9Log converts delays and applies the ring-current filter") {
    val dir = Files.createTempDirectory("log9")
    val f = dir.resolve("run.log")
    Files.writeString(f,
      """# file delay currentmA
        |f1 100ps 90.0
        |f2 off 95.0
        |f3 1ns 10.0
        |""".stripMargin)
    val df = LogReader.readId9Log(spark, f.toString, srcurMin = 30.0)
    val rows = df.select("file", "delay").as[(String, Double)].collect().toMap
    assert(rows.keySet == Set("f1", "f2")) // f3 fails the current cut
    assert(approx(rows("f1"), 1e-10))
    assert(approx(rows("f2"), -10.0))
  }

  test("readDiagnostic picks columns 3/4, drops unparseable delays") {
    val dir = Files.createTempDirectory("diag")
    val f = dir.resolve("diagnostics.log")
    Files.writeString(f,
      """# header
        |x y /path/to/img1.edf 1.5e-9 z
        |x y /path/to/img2.edf nan z
        |x y /path/to/img3.edf 2.5e-9 z
        |""".stripMargin)
    val df = LogReader.readDiagnostic(spark, f.toString)
    val rows = df.as[(String, Double)].collect().toMap
    assert(rows.keySet == Set("img1.edf", "img3.edf"))
    assert(approx(rows("img1.edf"), 1.5e-9))
  }

  test("chi reader scales the intensity column") {
    val dir = Files.createTempDirectory("chi")
    val f = dir.resolve("c.chi")
    Files.writeString(f, "# q i\n0.1 10.0\n0.2 20.0\n")
    val rows = LogReader.readChi(spark, f.toString, scale = 0.5)
      .as[(Double, Double)].collect().toMap
    assert(approx(rows(0.1), 5.0) && approx(rows(0.2), 10.0))
  }

  test("motor dump drops repeated header rows, parses user/dial") {
    val dir = Files.createTempDirectory("mot")
    val f = dir.resolve("motors.dump")
    Files.writeString(f,
      """# name user dial
        |mot1 1.5 1.6
        |name user dial
        |mot2 2.5 2.6
        |""".stripMargin)
    val rows = LogReader.readMotorDump(spark, f.toString)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows == Map("mot1" -> ((1.5, 1.6)), "mot2" -> ((2.5, 2.6))))
  }

  test("J2 reconcileLog drops rows for deleted images and counts them") {
    val log = Seq(("f1", 1.0), ("f2", 2.0), ("f3", 3.0)).toDF("file", "delay")
    val images = Seq("f1", "f3").toDF("file")
    val (kept, dropped) = LogReader.reconcileLog(log, images)
    assert(kept.select("file").as[String].collect().toSet == Set("f1", "f3"))
    assert(dropped == 1)
  }

  test("J6 applyDarks subtracts rate x integration time per diode") {
    val log = Seq((10.0, 2.0), (20.0, 4.0)).toDF("pd1ic", "timeic")
    val out = LogReader.applyDarks(log, Map("pd1ic" -> 0.5))
      .select("pd1ic").as[Double].collect().sorted
    assert(out.toSeq == Seq(9.0, 18.0))
  }

  test("T4 withRetry retries then succeeds / gives up") {
    var n = 0
    val v = LogReader.withRetry(attempts = 3, sleepMs = 1) {
      n += 1; if (n < 3) sys.error("not yet"); 42
    }
    assert(v == 42 && n == 3)
    intercept[RuntimeException] {
      LogReader.withRetry(attempts = 2, sleepMs = 1)(sys.error("always"))
    }
  }

  test("bundle save/load round-trip and T2 manifest invalidation") {
    val dir = Files.createTempDirectory("bundle").toString
    val df = Seq((1, 2.0), (3, 4.0)).toDF("k", "v")
    Bundle.save(dir, Map("data" -> df), Map("nQ" -> "1500", "mask" -> "x>10"))
    val loaded = Bundle.load(spark, dir)
    assert(loaded.keySet == Set("data"))
    assert(loaded("data").count() == 2)
    assert(Bundle.isValid(dir, Map("nQ" -> "1500", "mask" -> "x>10")))
    val diff = Bundle.invalidationDiff(dir, Map("nQ" -> "600", "mask" -> "x>10"))
    assert(diff.get == Seq(("nQ", Some("1500"), Some("600"))))
    assert(!Bundle.isValid(dir, Map("nQ" -> "600", "mask" -> "x>10")))
  }

  test("manifest round-trips adjacent escapes and control chars") {
    val dir = Files.createTempDirectory("bundle-esc").toString
    // `C:\name` escapes to `C:\\name` — a sequential-replace unescape
    // would decode it as backslash+newline; \u0001 exercises the \uXXXX arm
    val nasty = Map(
      "winpath" -> """C:\name""",
      "quoted" -> """say "hi" \ bye""",
      "ctl" -> "a\u0001b\nc",
      "trailing" -> """ends with \""")
    Bundle.writeManifest(dir, nasty)
    assert(Bundle.readManifest(dir).get == nasty)
    assert(Bundle.isValid(dir, nasty))
  }

  test("CorpusIO: JSONL roundtrip, corrupt-line routing, bounded shards") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val docs = (1L to 250L).map(i => (i, s"text $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    graft.sources.CorpusIO.writeJsonl(docs, s"$dir/out", maxRecordsPerFile = 50)
    // shard size bound honoured
    val shards = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(shards.nonEmpty)
    assert(shards.forall(f =>
      scala.io.Source.fromFile(f).getLines().size <= 50))

    // plant a malformed line as its own shard (editing an existing shard
    // in place would invalidate its Hadoop .crc sidecar)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/out/extra.json"), "{not json at all\n")

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = graft.sources.CorpusIO.readJsonl(spark, s"$dir/out", schema)
    val (clean, corrupt) = graft.sources.CorpusIO.partitionCorrupt(back)
    // collect (not count): aggregate-only queries over a PERMISSIVE read
    // prune to the corrupt column alone and trip Spark's scan guard --
    // the CorpusIO scaladoc documents this Spark-standard caveat
    val cleanRows = clean.collect()
    assert(cleanRows.length == 250, "every valid document survives the roundtrip")
    val corruptRows = corrupt.collect()
    assert(corruptRows.length == 1, "the malformed line routes, not aborts")
    assert(corruptRows.head.getAs[String]("raw").startsWith("{not json"))
    assert(cleanRows.map(_.getAs[Long]("doc_id")).toSet == (1L to 250L).toSet)
  }

  // ------------------------------------------------------------- HDF5 ingest

  test("HDF5 writer -> reader round trip: contiguous f64/i64/strings, " +
       "2-D, chunked+shuffle+deflate, attributes, nested groups") {
    import graft.sources.Hdf5
    val dir = Files.createTempDirectory("h5rt").toString
    val f64 = Array.tabulate(17)(i => i * 1.25 - 3.0)
    val i64 = Array.tabulate(9)(i => (i * 1000003L - 42L))
    val strs = Array("alpha", "b", "gamma-ray")
    val mat = Array.tabulate(6 * 5)(i => math.sin(i * 0.7) * 100)
    // chunk 4x3 over 10x7: interior, edge, and corner chunks all clip
    val big = Array.tabulate(10 * 7)(i => i * 0.5 - 11.0)
    Hdf5Writer.write(s"$dir/rt.h5", Hdf5Writer.Node(
      datasets = Seq(
        "vec" -> Hdf5Writer.Doubles(Seq(17), f64),
        "ints" -> Hdf5Writer.Longs(Seq(9), i64),
        "names" -> Hdf5Writer.Strings(10, strs),
        "mat" -> Hdf5Writer.Doubles(Seq(6, 5), mat),
        "big" -> Hdf5Writer.Doubles(Seq(10, 7), big,
          chunked = Some(Seq(4, 3)))),
      attrs = Seq("npt" -> 5L, "scale" -> 2.5, "mask" -> "auto"),
      groups = Seq("log" -> Hdf5Writer.Node(
        datasets = Seq("srcur" -> Hdf5Writer.Doubles(Seq(3),
          Array(199.5, 199.1, 198.8))),
        attrs = Seq("unit" -> "mA")))))
    val f = Hdf5.read(s"$dir/rt.h5")
    assert(f.dataset("/vec").numeric.toSeq == f64.toSeq)
    assert(f.dataset("/ints").numeric.toSeq == i64.map(_.toDouble).toSeq)
    assert(f.dataset("/names").strings.toSeq == strs.toSeq)
    assert(f.dataset("/mat").dims == Seq(6L, 5L))
    assert(f.dataset("/mat").numeric.toSeq == mat.toSeq)
    assert(f.dataset("/big").dims == Seq(10L, 7L))
    assert(f.dataset("/big").numeric.toSeq == big.toSeq,
      "chunked+shuffle+deflate must reassemble exactly (edge clipping)")
    assert(f.dataset("/log/srcur").numeric.toSeq == Seq(199.5, 199.1, 198.8))
    val attrs = f.attrs.map(a => (a.path, a.name) ->
      a.string.getOrElse(a.numeric.head)).toMap
    assert(attrs(("/", "npt")) == 5.0)
    assert(attrs(("/", "scale")) == 2.5)
    assert(attrs(("/", "mask")) == "auto")
    assert(attrs(("/log", "unit")) == "mA")
  }

  test("HDF5 v2 structural shape (superblock v3, OHDR headers, compact " +
       "link groups — 'libver latest') round-trips through the same " +
       "reader paths, chunked pipeline and nested groups included") {
    import graft.sources.Hdf5
    val dir = Files.createTempDirectory("h5v2").toString
    val vec = Array.tabulate(11)(i => i * 0.75 - 2.0)
    val mat = Array.tabulate(9 * 4)(i => math.cos(i * 0.3) * 7)
    Hdf5Writer.write(s"$dir/v2.h5", Hdf5Writer.Node(
      datasets = Seq(
        "vec" -> Hdf5Writer.Doubles(Seq(11), vec),
        "mat" -> Hdf5Writer.Doubles(Seq(9, 4), mat,
          chunked = Some(Seq(4, 3)))),
      attrs = Seq("origin" -> "v2-fixture", "npt" -> 11L),
      groups = Seq("log" -> Hdf5Writer.Node(
        datasets = Seq("t" -> Hdf5Writer.Longs(Seq(3),
          Array(7L, 8L, 9L)))))), v2 = true)
    val f = Hdf5.read(s"$dir/v2.h5")
    assert(f.dataset("vec").numeric.toSeq == vec.toSeq)
    assert(f.dataset("mat").dims == Seq(9L, 4L))
    assert(f.dataset("mat").numeric.toSeq == mat.toSeq,
      "v2-header chunked dataset must reassemble exactly")
    assert(f.dataset("log/t").numeric.toSeq == Seq(7.0, 8.0, 9.0))
    val attrs = f.attrs.map(a => a.name ->
      a.string.getOrElse(a.numeric.head)).toMap
    assert(attrs("origin") == "v2-fixture" && attrs("npt") == 11.0)
    // and Bundle ingest is shape-agnostic across the two header styles
    val (tables, params) = Bundle.fromHdf5(spark, s"$dir/v2.h5")
    assert(tables.keySet == Set("vec", "mat", "log/t"))
    assert(params("origin") == "v2-fixture" && params("npt") == "11")
  }

  test("NPZ ingest: np.savez-layout archives round-trip — C and Fortran " +
       "order, both endiannesses, ints/floats/strings, deflated and " +
       "stored members — and the azav pivot equals the HDF5 twin's") {
    import graft.sources.Npz
    val dir = Files.createTempDirectory("npz").toString

    // hand-built .npy members against numpy.lib.format (NEP 1)
    def npy(descr: String, fortran: Boolean, shape: Seq[Int],
            payload: Array[Byte]): Array[Byte] = {
      val shapeTxt = if (shape.size == 1) s"(${shape.head},)"
        else shape.mkString("(", ", ", ")")
      var header = s"{'descr': '$descr', 'fortran_order': " +
        s"${if (fortran) "True" else "False"}, 'shape': $shapeTxt, }"
      // total header (incl. 10-byte prefix) pads to a multiple of 64
      // with spaces, newline-terminated
      val pad = 64 - ((10 + header.length + 1) % 64)
      header = header + (" " * (if (pad == 64) 0 else pad)) + "\n"
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0).map(_.toByte))
      out.write(header.length & 0xff); out.write(header.length >> 8)
      out.write(header.getBytes("ISO-8859-1"))
      out.write(payload)
      out.toByteArray
    }
    def le(d: Array[Double]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(d.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      d.foreach(bb.putDouble); bb.array()
    }
    def be(d: Array[Double]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(d.length * 8)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      d.foreach(bb.putDouble); bb.array()
    }
    val mat = Array.tabulate(3 * 4)(i => i * 1.5 - 2.0) // row-major truth
    // Fortran buffer of the same logical matrix: element (r,c) at c*3+r
    val matF = new Array[Double](12)
    for (r <- 0 until 3; c <- 0 until 4) matF(c * 3 + r) = mat(r * 4 + c)
    val ints = Array(7L, -3L, 1000003L)
    val intsB = { val bb = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ints.foreach(bb.putLong); bb.array() }
    val strs = Array("ab", "xyz", "")
    val strsB = { val b = new Array[Byte](12)
      strs.zipWithIndex.foreach { case (s, i) =>
        System.arraycopy(s.getBytes, 0, b, i * 4, s.length) }; b }

    val zipPath = s"$dir/bundle.npz"
    val zo = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    def put(name: String, bytes: Array[Byte], store: Boolean): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      if (store) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(bytes.length)
        val crc = new java.util.zip.CRC32(); crc.update(bytes)
        e.setCrc(crc.getValue)
      }
      zo.putNextEntry(e); zo.write(bytes); zo.closeEntry()
    }
    put("mat.npy", npy("<f8", fortran = false, Seq(3, 4), le(mat)),
      store = false)
    put("matF.npy", npy("<f8", fortran = true, Seq(3, 4), le(matF)),
      store = true)
    put("matBE.npy", npy(">f8", fortran = false, Seq(3, 4), be(mat)),
      store = false)
    put("ints.npy", npy("<i8", fortran = false, Seq(3), intsB),
      store = true)
    put("names.npy", npy("|S4", fortran = false, Seq(3), strsB),
      store = false)
    zo.close()

    val arrays = Npz.read(zipPath).map(a => a.name -> a).toMap
    assert(arrays("mat").dims == Seq(3L, 4L))
    assert(arrays("mat").numeric.toSeq == mat.toSeq)
    assert(arrays("matF").numeric.toSeq == mat.toSeq,
      "Fortran-order member must transpose to the row-major truth")
    assert(arrays("matBE").numeric.toSeq == mat.toSeq,
      "big-endian member must decode identically")
    assert(arrays("ints").numeric.toSeq == ints.map(_.toDouble).toSeq)
    assert(arrays("names").strings.toSeq == strs.toSeq)

    // Bundle mapping equals the HDF5 twin's on identical data
    val tables = Bundle.fromNpz(spark, zipPath)
    Hdf5Writer.write(s"$dir/twin.h5", Hdf5Writer.Node(datasets = Seq(
      "mat" -> Hdf5Writer.Doubles(Seq(3, 4), mat))))
    val (h5Tables, _) = Bundle.fromHdf5(spark, s"$dir/twin.h5")
    assert(tables("mat").collect().map(_.toSeq).toSet ==
      h5Tables("mat").collect().map(_.toSeq).toSet,
      "npz and HDF5 ingest must produce the same long-form frame")

    // azav pivot twin: same curves from either container
    val delays = Array(0.0, 1e-9, 2e-9)
    val zo2 = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/azav.npz"))
    val putter = zo2
    def put2(name: String, bytes: Array[Byte]): Unit = {
      putter.putNextEntry(new java.util.zip.ZipEntry(name))
      putter.write(bytes); putter.closeEntry()
    }
    put2("data.npy", npy("<f8", fortran = false, Seq(3, 4), le(mat)))
    put2("delays.npy", npy("<f8", fortran = false, Seq(3), le(delays)))
    zo2.close()
    Hdf5Writer.write(s"$dir/azav.h5", Hdf5Writer.Node(datasets = Seq(
      "data" -> Hdf5Writer.Doubles(Seq(3, 4), mat),
      "delays" -> Hdf5Writer.Doubles(Seq(3), delays))))
    val a = Bundle.azavFromNpz(spark, s"$dir/azav.npz")
      .collect().map(_.toSeq).toSet
    val b = Bundle.azavFromHdf5(spark, s"$dir/azav.h5")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty, "azav pivot must be container-agnostic")
  }

  test("Bundle.fromHdf5: a DataStorage-layout azav bundle becomes frames " +
       "EQUAL to the Parquet-bundle twin, attrs become manifest params") {
    val dir = Files.createTempDirectory("h5bundle").toString
    val nImg = 6; val nQ = 5
    val data = Array.tabulate(nImg * nQ)(i => 10.0 + (i % nQ) + (i / nQ) * 0.1)
    val err = Array.tabulate(nImg * nQ)(i => 0.01 + i * 1e-4)
    val qAxis = Array.tabulate(nQ)(i => 0.5 + i * 0.25)
    val delays = Array(-10.0, 1e-9, 1e-9, 2e-9, 2e-9, 1e-9)
    Hdf5Writer.write(s"$dir/azav.h5", Hdf5Writer.Node(
      datasets = Seq(
        "data" -> Hdf5Writer.Doubles(Seq(nImg, nQ), data),
        "err" -> Hdf5Writer.Doubles(Seq(nImg, nQ), err),
        "q" -> Hdf5Writer.Doubles(Seq(nQ), qAxis),
        "delays" -> Hdf5Writer.Doubles(Seq(nImg), delays)),
      attrs = Seq("npt" -> nQ.toLong, "mask" -> "auto")))
    val (tables, params) = Bundle.fromHdf5(spark, s"$dir/azav.h5")
    assert(params == Map("npt" -> "5", "mask" -> "auto"))
    assert(tables.keySet == Set("data", "err", "q", "delays"))
    // the Parquet twin: the SAME long-form frames through save -> load
    Bundle.save(s"$dir/pq", tables, params)
    val twin = Bundle.load(spark, s"$dir/pq")
    assert(Bundle.readManifest(s"$dir/pq").contains(params))
    for (k <- tables.keySet) {
      val a = tables(k).collect().map(_.toSeq).toSet
      val b = twin(k).collect().map(_.toSeq).toSet
      assert(a == b, s"$k: HDF5 ingest != Parquet twin")
    }
    // spot-check the long-form mapping itself
    val d = tables("data").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(d((0L, 0L)) == 10.0 && d((5L, 4L)) == data(29))
  }

  test("azavFromHdf5 feeds the E2 reduction end-to-end, identical to the " +
       "same curves built directly in Spark") {
    import graft.operators.Reduction
    val dir = Files.createTempDirectory("h5e2").toString
    val nImg = 12; val nQ = 8
    // reference images at the minimum delay; two laser-on delays, reps
    val delays = Array.tabulate(nImg)(r =>
      if (r % 3 == 0) 0.0 else if (r % 3 == 1) 1e-9 else 2e-9)
    val data = Array.tabulate(nImg * nQ) { i =>
      val r = i / nQ; val c = i % nQ
      5.0 + c * 0.5 + delays(r) * 1e9 * 0.2 + (r % 4) * 0.01
    }
    Hdf5Writer.write(s"$dir/run42.h5", Hdf5Writer.Node(
      datasets = Seq(
        "data" -> Hdf5Writer.Doubles(Seq(nImg, nQ), data,
          chunked = Some(Seq(5, 3))),
        "delays" -> Hdf5Writer.Doubles(Seq(nImg), delays))))
    val curves = Bundle.azavFromHdf5(spark, s"$dir/run42.h5")
    assert(curves.columns.toSeq ==
      Seq("image_idx", "delay", "q_bin", "i", "err"))
    val direct = (for (r <- 0 until nImg; c <- 0 until nQ) yield
      (r.toLong, delays(r), c.toLong, data(r * nQ + c), 0.0))
      .toDF("image_idx", "delay", "q_bin", "i", "err")
    val fromH5 = Reduction.timeResolvedSignal(curves)
      .orderBy("delay", "q_bin").collect().map(_.toSeq).toSeq
    val fromDirect = Reduction.timeResolvedSignal(direct)
      .orderBy("delay", "q_bin").collect().map(_.toSeq).toSeq
    assert(fromH5 == fromDirect && fromH5.nonEmpty,
      "E2 over the HDF5 ingest must equal E2 over the direct curves")
  }

  test("HDF5 vlen strings (global heap / GCOL): dataset and attribute " +
       "round-trip in both header shapes — the h5py default for str, " +
       "the saved trx log table's own layout") {
    import graft.sources.Hdf5
    val dir = Files.createTempDirectory("h5vlen").toString
    // varied lengths incl. empty and multi-byte UTF-8
    val files = Array("run42_0001.edf", "", "x", "čas-μs.edf",
      "a" * 37, "run42_0002.edf")
    for (v2 <- Seq(false, true)) {
      val p = s"$dir/vlen_${v2}.h5"
      Hdf5Writer.write(p, Hdf5Writer.Node(
        datasets = Seq(
          "delays" -> Hdf5Writer.Doubles(Seq(3), Array(0.0, 1e-9, 2e-9))),
        attrs = Seq("origin" -> Hdf5Writer.VStr("trx-azav"), "npt" -> 3L),
        groups = Seq("log" -> Hdf5Writer.Node(
          datasets = Seq("file" -> Hdf5Writer.VStrings(files)),
          attrs = Seq("note" -> Hdf5Writer.VStr("saved by h5py"))))),
        v2 = v2)
      val f = Hdf5.read(p)
      assert(f.dataset("log/file").strings.toSeq == files.toSeq,
        s"v2=$v2: vlen dataset must round-trip exactly")
      val attrs = f.attrs.map(a => (a.path, a.name) -> a.string).toMap
      assert(attrs(("/", "origin")).contains("trx-azav"))
      assert(attrs(("/log", "note")).contains("saved by h5py"))
      // and the Bundle on-ramp ingests it as a string table
      val (tables, params) = Bundle.fromHdf5(spark, p)
      assert(params("origin") == "trx-azav")
      assert(params("log@note") == "saved by h5py")
      val got = tables("log/file").orderBy("idx").collect()
        .map(_.getString(1)).toSeq
      assert(got == files.toSeq, s"v2=$v2: ingested string table")
    }
  }

  test("OHDR v2 with tracked object times (flag 0x20, four 4-byte " +
       "fields — libhdf5's default) parses correctly") {
    import graft.sources.Hdf5
    val dir = Files.createTempDirectory("h5times").toString
    val vec = Array.tabulate(7)(i => i * 1.5)
    Hdf5Writer.write(s"$dir/t.h5", Hdf5Writer.Node(
      datasets = Seq("vec" -> Hdf5Writer.Doubles(Seq(7), vec)),
      attrs = Seq("k" -> 9L)), v2 = true, v2Times = true)
    val f = Hdf5.read(s"$dir/t.h5")
    assert(f.dataset("vec").numeric.toSeq == vec.toSeq,
      "16-byte time fields must not shift the message stream")
    assert(f.attrs.exists(a => a.name == "k" && a.numeric.head == 9.0))
  }

  test("HDF5 diamond hard links: the same dataset under two paths " +
       "ingests ONCE, the second path becomes an alias param") {
    import graft.sources.Hdf5
    val dir = Files.createTempDirectory("h5link").toString
    val vec = Array(1.0, 2.0, 3.0)
    Hdf5Writer.write(s"$dir/d.h5", Hdf5Writer.Node(
      datasets = Seq("data" -> Hdf5Writer.Doubles(Seq(3), vec)),
      groups = Seq("view" -> Hdf5Writer.Node(
        datasets = Seq("data" -> Hdf5Writer.Alias("/data"))))))
    val f = Hdf5.read(s"$dir/d.h5")
    assert(f.datasets.size == 1 && f.dataset("data").numeric.toSeq == vec.toSeq)
    assert(f.aliases == Map("/view/data" -> "/data"))
    // the ALIAS path must keep resolving — callers that know the object
    // by its other diamond path (pre-dedup behavior) still find it
    assert(f.dataset("view/data").numeric.toSeq == vec.toSeq)
    assert(f.dataset("/view/data").numeric.toSeq == vec.toSeq)
    val (tables, params) = Bundle.fromHdf5(spark, s"$dir/d.h5")
    assert(tables.keySet == Set("data"))
    assert(params("alias:view/data") == "data")
    // and the azav pivot accepts either path as its dataKey
    Hdf5Writer.write(s"$dir/az.h5", Hdf5Writer.Node(
      datasets = Seq(
        "data" -> Hdf5Writer.Doubles(Seq(2, 2), Array(1.0, 2.0, 3.0, 4.0)),
        "delays" -> Hdf5Writer.Doubles(Seq(2), Array(0.0, 1e-9))),
      groups = Seq("view" -> Hdf5Writer.Node(
        datasets = Seq("data" -> Hdf5Writer.Alias("/data"))))))
    val viaAlias = Bundle.azavFromHdf5(spark, s"$dir/az.h5",
      dataKey = "view/data").collect().map(_.toSeq).toSet
    val direct = Bundle.azavFromHdf5(spark, s"$dir/az.h5")
      .collect().map(_.toSeq).toSet
    assert(viaAlias == direct && direct.nonEmpty)
  }

  test("HDF5 writer: group attrs land ON the group (trx-side readers " +
       "open f['grp'].attrs), vlen GCOL chunks past 65535 strings, and " +
       "export guards fail loudly (duplicate tuples, npz collisions)") {
    import graft.sources.{Hdf5, Npz}
    val dir = Files.createTempDirectory("h5guards").toString
    // grp@attr placement: the attribute must live at path /log named
    // 'note', not mangled on the parent
    Bundle.toHdf5(s"$dir/attrs.h5",
      Map("log/file" -> Seq((0L, "a.edf")).toDF("idx", "value")),
      Map("log@note" -> "two-way", "top" -> "root-level"))
    val f = Hdf5.read(s"$dir/attrs.h5")
    assert(f.attrs.exists(a => a.path == "/log" && a.name == "note" &&
      a.string.contains("two-way")),
      s"log@note must be attr 'note' ON /log; got ${f.attrs}")
    assert(f.attrs.exists(a => a.path == "/" && a.name == "top"))
    // >65535 vlen strings: the heap-object index is 16-bit, so the
    // writer must chunk GCOL collections — and every string round-trips
    val many = Array.tabulate(70000)(i => s"f$i")
    Hdf5Writer.write(s"$dir/many.h5", Hdf5Writer.Node(
      datasets = Seq("names" -> Hdf5Writer.VStrings(many))))
    val got = Hdf5.read(s"$dir/many.h5").dataset("names").strings
    assert(got.length == 70000 && got(0) == "f0" &&
      got(65535) == "f65535" && got(69999) == "f69999")
    assert(got.toSeq == many.toSeq)
    // duplicate index tuples must fail loudly (they'd mask a hole)
    // a duplicate whose row count MATCHES the grid (the dup masks the
    // missing idx 1) — exactly the hole the BitSet check closes
    val dup = Seq((0L, 1.0), (0L, 2.0), (2L, 3.0)).toDF("idx", "value")
    val e1 = intercept[IllegalArgumentException](
      Bundle.toHdf5(s"$dir/dup.h5", Map("d" -> dup)))
    assert(e1.getMessage.contains("duplicate index tuple"))
    val dupCurves = Seq(
      (0L, 0.0, 0L, 1.0, 0.0), (0L, 0.0, 0L, 2.0, 0.0),
      (1L, 1e-9, 0L, 3.0, 0.0), (1L, 1e-9, 1L, 4.0, 0.0))
      .toDF("image_idx", "delay", "q_bin", "i", "err")
    val e2 = intercept[IllegalArgumentException](
      Bundle.azavToHdf5(s"$dir/dupaz.h5", dupCurves))
    assert(e2.getMessage.contains("duplicate (image_idx, q_bin)"))
    // npz member-name collision named up front, not a truncated archive
    val t = Seq((0L, 1.0)).toDF("idx", "value")
    val e3 = intercept[IllegalArgumentException](
      Bundle.toNpz(s"$dir/c.npz", Map("a/b" -> t, "a_b" -> t)))
    assert(e3.getMessage.contains("collision") &&
      e3.getMessage.contains("a_b"))
  }

  test(">2 GiB containers: windowed accessors exact across the 1 GiB " +
       "window boundary, HDF5 read parity after sparse extension, npy " +
       "streams; per-dataset/no-random-access bounds stay loud") {
    import graft.sources.{Hdf5, Hdf5Writer, MappedByteSource, Npz}
    val dir = Files.createTempDirectory("big").toString

    // ---- accessor layer: reads at/across the 1 GiB window line equal
    // a little-endian reference over the written pattern (sparse file)
    val binPath = java.nio.file.Paths.get(s"$dir/win.bin")
    val W = 1L << 30
    val pat = Array.tabulate(32)(i => ((i * 37 + 11) & 0xff).toByte)
    locally {
      val raf = new java.io.RandomAccessFile(binPath.toFile, "rw")
      raf.setLength(3L << 30)
      raf.seek(W - 16); raf.write(pat)
      raf.seek((5L << 29) - 7); raf.write(pat) // a 2.5 GiB region too
      raf.close()
    }
    val src = new MappedByteSource(binPath)
    try {
      val ref = java.nio.ByteBuffer.wrap(pat)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(src.size == (3L << 30))
      assert(src.u64(W - 16) == ref.getLong(0))
      assert(src.u64(W - 4) == ref.getLong(12)) // spans the window line
      assert(src.u32(W - 2) == (ref.getInt(14) & 0xffffffffL))
      assert(src.u16(W - 1) == (ref.getShort(15) & 0xffff))
      assert(src.u8(W + 3) == (pat(19) & 0xff))
      assert(src.bytesAt(W - 16, 32).sameElements(pat))
      assert(src.u8((5L << 29) - 7) == (pat(0) & 0xff))
      assert(src.u64((5L << 29) + 1) == ref.getLong(8))
    } finally src.close()

    // ---- HDF5: a real archive sparse-extended past 2 GiB reads
    // IDENTICALLY through the mapped path (the former hard refusal)
    val h5 = s"$dir/big.h5"
    Hdf5Writer.write(h5, Hdf5Writer.Node(datasets = Seq(
      "data" -> Hdf5Writer.Doubles(Seq(3, 4), (1 to 12).map(_.toDouble).toArray),
      "tag" -> Hdf5Writer.Strings(4, Array("abc", "de")))))
    def snap(f: graft.sources.Hdf5.File) =
      f.datasets.map(d => (d.path, d.dims, d.numeric.toSeq, d.strings.toSeq))
    val before = snap(Hdf5.read(h5))
    locally {
      val raf = new java.io.RandomAccessFile(h5, "rw")
      raf.setLength(3L << 30); raf.close()
    }
    assert(snap(Hdf5.read(h5)) == before,
      "mapped read of the >2 GiB container must equal the small-file read")

    // ---- npy: a >2 GiB file takes the STREAMED numeric path
    val vals = Array.tabulate(1000)(i => i * 0.5 - 3.0)
    locally {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      val header = {
        var h = "{'descr': '<f8', 'fortran_order': False, 'shape': (1000,), }"
        val pad = 64 - ((10 + h.length + 1) % 64)
        h = h + (" " * (if (pad == 64) 0 else pad)) + "\n"
        h
      }
      val raf = new java.io.RandomAccessFile(s"$dir/big.npy", "rw")
      raf.write(Array(0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0).map(_.toByte))
      raf.write(header.length & 0xff); raf.write(header.length >> 8)
      raf.write(header.getBytes("ISO-8859-1"))
      raf.write(bb.array())
      raf.setLength(3L << 30) // sparse: triggers the streamed path
      raf.close()
    }
    val arr = Npz.readNpy(s"$dir/big.npy")
    assert(arr.dims == Seq(1000L) && arr.numeric.toSeq == vals.toSeq,
      "streamed npy decode drifted from the written values")

    // a LEGAL maximal v1 header (65535 bytes, mostly padding — numpy
    // pads long shape/descr dicts) must read on the streamed path: a
    // fixed 64 KiB head slice cut it short with an opaque out-of-bounds
    // parse error; the reader now preads exactly 10 + headerLen bytes
    locally {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      val body = "{'descr': '<f8', 'fortran_order': False, 'shape': (1000,), }"
      val hLen = 65535
      val header = body + (" " * (hLen - body.length - 1)) + "\n"
      val raf = new java.io.RandomAccessFile(s"$dir/bigH.npy", "rw")
      raf.write(Array(0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0).map(_.toByte))
      raf.write(hLen & 0xff); raf.write(hLen >> 8)
      raf.write(header.getBytes("ISO-8859-1"))
      raf.write(bb.array())
      raf.setLength(3L << 30)
      raf.close()
    }
    val arrH = Npz.readNpy(s"$dir/bigH.npy")
    assert(arrH.dims == Seq(1000L) && arrH.numeric.toSeq == vals.toSeq,
      "a maximal-length v1 header must stream-read")

    // ---- what stays loudly bounded: Fortran order needs whole-buffer
    // access; a single HDF5 dataset must still fit a JVM array
    locally {
      val raf = new java.io.RandomAccessFile(s"$dir/bigF.npy", "rw")
      val header = {
        var h = "{'descr': '<f8', 'fortran_order': True, 'shape': (16, 16), }"
        val pad = 64 - ((10 + h.length + 1) % 64)
        h + (" " * (if (pad == 64) 0 else pad)) + "\n"
      }
      raf.write(Array(0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0).map(_.toByte))
      raf.write(header.length & 0xff); raf.write(header.length >> 8)
      raf.write(header.getBytes("ISO-8859-1"))
      raf.setLength(3L << 30)
      raf.close()
    }
    val eF = intercept[IllegalArgumentException](
      Npz.readNpy(s"$dir/bigF.npy"))
    assert(eF.getMessage.contains("Fortran-order"), eF.getMessage)
  }

  test("Bundle.toHdf5 |> fromHdf5 round-trips tables AND params equal " +
       "to the Parquet twin — two-way trx interop") {
    val dir = Files.createTempDirectory("h5export").toString
    val nImg = 4; val nQ = 3
    val data = Array.tabulate(nImg * nQ)(i => 1.5 + i * 0.25)
    val delays = Array(0.0, 1e-9, 2e-9, 1e-9)
    val files = Array("a.edf", "b.edf", "c.edf", "d.edf")
    val dataDf = (for (r <- 0 until nImg; c <- 0 until nQ) yield
      (r.toLong, c.toLong, data(r * nQ + c))).toDF("row", "col", "value")
    val delaysDf = delays.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("idx", "value")
    val filesDf = files.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("idx", "value")
    val tables = Map("data" -> dataDf, "delays" -> delaysDf,
      "log/file" -> filesDf)
    val params = Map("npt" -> "3", "scale" -> "2.5", "mask" -> "auto",
      "log@note" -> "two-way", "data@unit" -> "a.u.")
    Bundle.toHdf5(s"$dir/out.h5", tables, params)
    val (rt, rtParams) = Bundle.fromHdf5(spark, s"$dir/out.h5")
    assert(rtParams == params, "params must round-trip exactly")
    assert(rt.keySet == tables.keySet)
    for (k <- tables.keySet) {
      assert(rt(k).collect().map(_.toSeq).toSet ==
        tables(k).collect().map(_.toSeq).toSet,
        s"$k: HDF5 export round-trip != source table")
    }
    // rank-1 numeric attrs render ALL elements, comma-joined
    Hdf5Writer.write(s"$dir/vecattr.h5", Hdf5Writer.Node(
      datasets = Seq("d" -> Hdf5Writer.Doubles(Seq(2), Array(1.0, 2.0))),
      attrs = Seq("center" -> Array(960.0, 960.5))))
    val (_, p2) = Bundle.fromHdf5(spark, s"$dir/vecattr.h5")
    assert(p2("center") == "960,960.5",
      "multi-element numeric attr must render every element")
  }

  test("Bundle.toHdf5 chunks large exports (shuffle+deflate) and they " +
       "re-read exactly") {
    val dir = Files.createTempDirectory("h5chunk").toString
    val n = 300; val m = 250 // 75k elements > the 64k chunk threshold
    val df = (for (r <- 0 until n; c <- 0 until m) yield
      (r.toLong, c.toLong, (r * m + c) * 0.5)).toDF("row", "col", "value")
    Bundle.toHdf5(s"$dir/big.h5", Map("data" -> df))
    val f = graft.sources.Hdf5.read(s"$dir/big.h5")
    val d = f.dataset("data")
    assert(d.dims == Seq(n.toLong, m.toLong))
    assert(d.numeric.length == n * m)
    assert((0 until n * m).forall(i => d.numeric(i) == i * 0.5))
  }

  test("Bundle.toNpz |> fromNpz round-trips numeric and string tables") {
    val dir = Files.createTempDirectory("npzexport").toString
    val vec = Array(3.5, -1.0, 0.25)
    val names = Array("aa", "b", "cde")
    val tables = Map(
      "vec" -> vec.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toSeq.toDF("idx", "value"),
      "names" -> names.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toSeq.toDF("idx", "value"))
    Bundle.toNpz(s"$dir/out.npz", tables)
    val rt = Bundle.fromNpz(spark, s"$dir/out.npz")
    assert(rt("vec").orderBy("idx").collect().map(_.getDouble(1)).toSeq ==
      vec.toSeq)
    assert(rt("names").orderBy("idx").collect().map(_.getString(1)).toSeq ==
      names.toSeq)
  }

  test("azavFromHdf5Dir / azavFromNpzDir: a DIRECTORY of bundles decodes " +
       "file-per-task and equals the union of single-file ingests") {
    val dir = Files.createTempDirectory("h5dir").toString
    val nQ = 4
    def mk(run: Int): (Array[Double], Array[Double]) = {
      val nImg = 3 + run
      val delays = Array.tabulate(nImg)(r => r * 1e-9 + run * 1e-6)
      val data = Array.tabulate(nImg * nQ)(i => run * 100.0 + i * 0.5)
      (delays, data)
    }
    for (run <- 0 until 3) {
      val (delays, data) = mk(run)
      Hdf5Writer.write(s"$dir/run$run.h5", Hdf5Writer.Node(datasets = Seq(
        "data" -> Hdf5Writer.Doubles(Seq(delays.length, nQ), data),
        "delays" -> Hdf5Writer.Doubles(Seq(delays.length), delays))))
      val zo = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(s"$dir/run$run.npz"))
      def member(name: String, dims: Seq[Int], a: Array[Double]): Unit = {
        val shape = if (dims.size == 1) s"(${dims.head},)"
          else dims.mkString("(", ", ", ")")
        var h = s"{'descr': '<f8', 'fortran_order': False, " +
          s"'shape': $shape, }"
        val pad = 64 - ((10 + h.length + 1) % 64)
        h = h + " " * (if (pad == 64) 0 else pad) + "\n"
        zo.putNextEntry(new java.util.zip.ZipEntry(name))
        zo.write(Array(0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0).map(_.toByte))
        zo.write(h.length & 0xff); zo.write(h.length >> 8)
        zo.write(h.getBytes("ISO-8859-1"))
        val bb = java.nio.ByteBuffer.allocate(a.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        a.foreach(bb.putDouble)
        zo.write(bb.array()); zo.closeEntry()
      }
      member("data.npy", Seq(delays.length, nQ), data)
      member("delays.npy", Seq(delays.length), delays)
      zo.close()
    }
    // distributed dir ingest == union of per-file single ingests
    val single = (0 until 3).flatMap { run =>
      Bundle.azavFromHdf5(spark, s"$dir/run$run.h5").collect()
        .map(r => (s"run$run", r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
    }.toSet
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        val f = r.getString(0)
        (f.substring(f.lastIndexOf('/') + 1).takeWhile(_ != '.'),
          r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))
      }.toSet
    val h5 = Bundle.azavFromHdf5Dir(spark, s"$dir/*.h5")
    assert(h5.columns.toSeq ==
      Seq("file", "image_idx", "delay", "q_bin", "i", "err"))
    assert(normalize(h5) == single,
      "dir ingest must equal the union of single-file ingests")
    val npz = Bundle.azavFromNpzDir(spark, s"$dir/*.npz")
    assert(normalize(npz) == single, "npz dir twin must agree")
    // a corrupt file fails NAMING the file
    Files.write(Paths.get(s"$dir/bad.h5"), Array[Byte](1, 2, 3))
    val err = intercept[Exception](
      Bundle.azavFromHdf5Dir(spark, s"$dir/*.h5").collect())
    assert(err.getMessage != null)
  }

  test("azavToHdf5 exports the exact trx azav array layout " +
       "(data/err/q/delays) and azavFromHdf5 re-opens it identically") {
    val dir = Files.createTempDirectory("azavexport").toString
    val nImg = 5; val nQ = 4
    val qAxis = Array.tabulate(nQ)(i => 0.3 + i * 0.2)
    val delays = Array(0.0, 1e-9, 1e-9, 2e-9, 0.0)
    val curves = (for (r <- 0 until nImg; c <- 0 until nQ) yield
      (r.toLong, delays(r), c.toLong, 10.0 + r + c * 0.1,
        0.01 * (r + 1))).toDF("image_idx", "delay", "q_bin", "i", "err")
    Bundle.azavToHdf5(s"$dir/azav.h5", curves, qAxis = Some(qAxis),
      params = Map("npt" -> nQ.toString))
    // the container carries the azav.py dataset layout
    val f = graft.sources.Hdf5.read(s"$dir/azav.h5")
    assert(f.dataset("data").dims == Seq(nImg.toLong, nQ.toLong))
    assert(f.dataset("err").dims == Seq(nImg.toLong, nQ.toLong))
    assert(f.dataset("q").numeric.toSeq == qAxis.toSeq)
    assert(f.dataset("delays").numeric.toSeq == delays.toSeq)
    // and the engine re-opens its own export losslessly
    val rt = Bundle.azavFromHdf5(spark, s"$dir/azav.h5")
    assert(rt.collect().map(_.toSeq).toSet ==
      curves.collect().map(_.toSeq).toSet)
  }
}
