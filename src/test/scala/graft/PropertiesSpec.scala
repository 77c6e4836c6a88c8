package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.{TextFunctions, TimeFunctions}
import graft.operators.Masks
import graft.sources.Hdf5Writer

/** Property-based checks (SURVEY §5.4): mask-composition laws, parse/format
  * round-trips, normalization invariants — run through Spark on batched
  * inputs so the properties exercise the real expressions.
  */
@SlowSuite
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  test("strToTime ∘ timeToStr round-trips within format precision") {
    val gen = for {
      mant <- Gen.choose(1.0, 999.0)
      exp <- Gen.choose(-14, 0)
      sign <- Gen.oneOf(1.0, -1.0)
    } yield sign * mant * math.pow(10.0, exp)
    val values = (1 to 200).flatMap(i => gen.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))
    val rows = values.toDF("v")
      .select($"v", TimeFunctions.strToTime(TimeFunctions.timeToStr($"v")).as("rt"))
      .collect()
    rows.foreach { r =>
      val (v, rt) = (r.getDouble(0), r.getDouble(1))
      // the format keeps 2 decimals of the engineering mantissa → relative
      // error bounded by 0.5% of the leading unit
      assert(math.abs(v - rt) <= math.abs(v) * 5e-3 + 1e-18, s"$v -> $rt")
    }
  }

  test("salted two-phase top-k equals naive ranking on random vectors") {
    // bruteForceTopK's selection is the shared saltedTopK used by every
    // ANN ranking; the property pins its EXACTNESS (phase 1 is lossless,
    // phase 2 reranks identically) against a driver-side sort, across
    // random corpora, query counts, and k — including k larger than the
    // corpus and heavy cosine ties (many identical vectors).
    val rnd = new scala.util.Random(7)
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      graft.functions.VectorFunctions.cosineDriver(a, b)
    for (trial <- 1 to 4) {
      val dim = 4
      val n = 20 + rnd.nextInt(60)
      val base = Array.fill(6)(Seq.fill(dim)(rnd.nextDouble() - 0.5))
      // half the corpus duplicates a base vector exactly → tied cosines
      val corpus = (0L until n.toLong).map { i =>
        if (i % 2 == 0) (i, base(rnd.nextInt(base.length)))
        else (i, Seq.fill(dim)(rnd.nextDouble() - 0.5))
      }
      val k = Seq(1, 3, n + 5)(trial % 3)
      val queries = corpus.take(3).map { case (id, v) => (id, v) }
      val got = graft.operators.Similarity.bruteForceTopK(
          corpus.toDF("vec_id", "embedding"),
          queries.toDF("query_id", "embedding"), k = k).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
          r.getAs[Long]("vec_id")).toMap
      val want = queries.flatMap { case (qid, qv) =>
        corpus.map { case (id, v) => (cos(qv, v), id) }
          .sortBy { case (c, id) => (-c, id) }
          .take(k).zipWithIndex
          .map { case ((_, id), r) => (qid, r + 1) -> id }
      }.toMap
      assert(got == want, s"trial $trial (n=$n, k=$k)")
    }
  }

  test("mask composition: subtract always wins over earlier adds") {
    val grid = (for (y <- 0 until 16; x <- 0 until 16) yield (x, y)).toDF("x", "y")
    val regions = Seq(
      Masks.rectangle($"x", $"y", 1, 1, 10, 10),
      Masks.circle($"x", $"y", 8, 8, 4),
      Masks.halfPlane("x>12", $"x", $"y"))
    for (r1 <- regions; r2 <- regions) {
      val m = Masks.compose(Seq(Masks.Component(r1, add = true),
        Masks.Component(r2, add = false)))
      // nothing in r2 may remain masked
      assert(grid.filter(m && r2).count() == 0)
    }
  }

  test("mask union is commutative and bounded by its parts") {
    val grid = (for (y <- 0 until 16; x <- 0 until 16) yield (x, y)).toDF("x", "y")
    val a = Masks.circle($"x", $"y", 4, 4, 3)
    val b = Masks.rectangle($"x", $"y", 8, 8, 14, 14)
    val ab = grid.filter(Masks.union(Seq(a, b))).count()
    val ba = grid.filter(Masks.union(Seq(b, a))).count()
    assert(ab == ba)
    assert(ab >= grid.filter(a).count() && ab >= grid.filter(b).count())
    assert(ab <= grid.filter(a).count() + grid.filter(b).count())
  }

  test("normalizeAuto invariant: per-image mean of i_norm is exactly 1") {
    val rnd = new scala.util.Random(11)
    val rows = for (img <- 0 until 20; q <- 0 until 8)
      yield (s"img$img", q, rnd.nextInt(100) + 1.0, 1.0)
    val curves = rows.toDF("image_id", "q_bin", "i", "err")
    graft.operators.Azav.normalizeAuto(curves)
      .groupBy("image_id").agg(avg($"i_norm").as("m"))
      .collect().foreach(r => assert(approx(r.getAs[Double]("m"), 1.0, 1e-12)))
  }

  test("snapToGrid is idempotent and lands on the grid") {
    val grid = Seq(-3.0, 0.0, 1.5, 7.0, 42.0)
    val gen = Gen.choose(-50.0, 100.0)
    val values = (1 to 300).flatMap(i => gen.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))
    val snapped = values.toDF("v")
      .select(graft.functions.NumericFunctions.snapToGrid($"v", grid).as("s"))
      .select($"s", graft.functions.NumericFunctions.snapToGrid($"s", grid).as("ss"))
      .collect()
    snapped.foreach { r =>
      assert(grid.contains(r.getDouble(0)))
      assert(r.getDouble(0) == r.getDouble(1)) // idempotent
    }
  }

  test("codec roundtrips hold for arbitrary rasters and sample streams") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val ch = if (rnd.nextBoolean()) 3 else 1
      val px = Array.fill(w * h * ch)(rnd.nextInt(256))
      val img = graft.multimodal.Codecs.decodeNetpbm(
        graft.multimodal.Codecs.encodeNetpbm(w, h, ch, px))
      assert((img.width, img.height, img.channels) == (w, h, ch))
      assert(img.pixels.toSeq == px.toSeq)
    }
    (1 to 25).foreach { _ =>
      val n = rnd.nextInt(200)
      val nCh = 1 + rnd.nextInt(2)
      val rate = 1 + rnd.nextInt(96000)
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val au = graft.multimodal.Codecs.decodeWav(
        graft.multimodal.Codecs.encodeWav(rate, nCh, samples))
      assert((au.sampleRate, au.nChannels) == (rate, nCh))
      assert(au.samples.toSeq == samples.toSeq)
    }
  }

  test("HDF5 round trip holds for arbitrary shapes, chunk grids, and " +
       "value ranges (writer and reader are independent spec " +
       "implementations)") {
    val rnd = new scala.util.Random(14)
    val dir = java.nio.file.Files.createTempDirectory("h5prop").toString
    (1 to 20).foreach { i =>
      val rank = 1 + rnd.nextInt(3)
      val dims = Seq.fill(rank)(1 + rnd.nextInt(12))
      val n = dims.product
      // mixed magnitudes, negatives, exact integers, subnormal-adjacent
      val data = Array.fill(n)(rnd.nextInt(5) match {
        case 0 => rnd.nextDouble() * 1e9 - 5e8
        case 1 => rnd.nextInt(1000).toDouble
        case 2 => -rnd.nextDouble() * 1e-6
        case 3 => rnd.nextGaussian()
        case _ => 0.0
      })
      val chunked =
        if (rank >= 2 && rnd.nextBoolean())
          Some(dims.map(d => 1 + rnd.nextInt(d))) // edge chunks clip
        else None
      val p = s"$dir/p$i.h5"
      // both structural shapes: v0/symbol-table and v3/OHDR/compact-link
      Hdf5Writer.write(p, Hdf5Writer.Node(datasets = Seq(
        "d" -> Hdf5Writer.Doubles(dims, data, chunked))),
        v2 = rnd.nextBoolean())
      val got = graft.sources.Hdf5.read(p).dataset("d")
      assert(got.dims == dims.map(_.toLong),
        s"iter $i: dims ${got.dims} != $dims (chunks $chunked)")
      assert(got.numeric.toSeq == data.toSeq,
        s"iter $i: payload mismatch at dims $dims chunks $chunked")
    }
  }

  test("Bundle.toHdf5 |> fromHdf5 round-trips arbitrary table shapes: " +
       "rank 1/2/3 numeric grids, string tables, mixed params") {
    import graft.sources.Bundle
    val rnd = new scala.util.Random(17)
    val dir = java.nio.file.Files.createTempDirectory("h5exprop").toString
    for (i <- 0 until 10) {
      val rank = 1 + rnd.nextInt(3)
      val dims = Seq.fill(rank)(1 + rnd.nextInt(8))
      val n = dims.product
      val data = Array.fill(n)(rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1e6 - 5e5
        case 1 => rnd.nextInt(100).toDouble
        case 2 => -rnd.nextGaussian()
        case _ => 0.0
      })
      val numDf = rank match {
        case 1 => data.zipWithIndex.toSeq
          .map { case (v, k) => (k.toLong, v) }.toDF("idx", "value")
        case 2 => data.zipWithIndex.toSeq.map { case (v, k) =>
          ((k / dims(1)).toLong, (k % dims(1)).toLong, v)
        }.toDF("row", "col", "value")
        case _ => data.zipWithIndex.toSeq.map { case (v, k) =>
          ((k / (dims(1) * dims(2))).toLong,
            (k / dims(2) % dims(1)).toLong, (k % dims(2)).toLong, v)
        }.toDF("i0", "i1", "i2", "value")
      }
      val strs = Array.fill(1 + rnd.nextInt(6))(
        rnd.alphanumeric.take(rnd.nextInt(12)).mkString)
      val strDf = strs.zipWithIndex.toSeq
        .map { case (v, k) => (k.toLong, v) }.toDF("idx", "value")
      val tables = Map("num" -> numDf, "grp/names" -> strDf)
      val params = Map("k" -> rnd.nextInt(1000).toString,
        "x" -> rnd.nextGaussian().toString,
        "s" -> rnd.alphanumeric.take(8).mkString,
        "grp@note" -> "p")
      val p = s"$dir/rt$i.h5"
      Bundle.toHdf5(p, tables, params)
      val (rt, rtParams) = Bundle.fromHdf5(spark, p)
      assert(rtParams == params, s"iter $i: params diverged")
      assert(rt.keySet == tables.keySet)
      for (k <- tables.keySet)
        assert(rt(k).collect().map(_.toSeq).toSet ==
          tables(k).collect().map(_.toSeq).toSet,
          s"iter $i: table $k diverged (dims $dims)")
    }
  }

  test("shingle identity: permuted docs share no order-sensitive shingles") {
    val df = Seq(("a b c d e", "e d c b a")).toDF("x", "y")
    val r = df.select(
      TextFunctions.shingleHashes($"x", 3).as("sx"),
      TextFunctions.shingleHashes($"y", 3).as("sy")).collect()(0)
    assert(r.getSeq[Long](0).intersect(r.getSeq[Long](1)).isEmpty)
    // and identical docs share all of them
    val same = df.select(TextFunctions.shingleHashes($"x", 3).as("a"),
      TextFunctions.shingleHashes($"x", 3).as("b")).collect()(0)
    assert(same.getSeq[Long](0) == same.getSeq[Long](1))
  }

  test("BPE invariants on random corpora: lossless pieces, consistent " +
       "counts, merges only shrink") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcde"
    def word(): String =
      (0 until (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 20) {
      val dict = (0 until 30).map(_ => word() -> (1L + rnd.nextInt(9)))
      val merges = graft.functions.Bpe.train(dict, nMerges = 1 + rnd.nextInt(30))
      val kernel = new graft.functions.BpeKernel(merges)
      val words = (0 until 50).map(_ => word())
      words.foreach { w =>
        val pieces = kernel.encodeWord(w)
        // lossless: pieces concatenate back to the word
        assert(pieces.mkString == w, s"trial $trial: $w -> ${pieces.toSeq}")
        // merging can only shrink, never below 1 piece
        assert(pieces.length >= 1 && pieces.length <= w.length)
        // every piece is either a single char or a concatenation built
        // from the learned merges (closure check: decomposable by ranks)
        pieces.foreach(p => assert(p.length == 1 || merges.exists {
          case (a, b) => a + b == p || p.contains(a + b)
        }, s"piece $p not derivable from merges"))
      }
      // the Column expression agrees with the kernel on a whole document
      val doc = words.mkString(" ")
      val viaExpr = Seq(doc).toDF("text")
        .select(graft.functions.Bpe.bpeTokenCount($"text", merges))
        .collect()(0).getLong(0)
      val viaKernel = words.map(kernel.encodeWord(_).length.toLong).sum
      assert(viaExpr == viaKernel, s"trial $trial: expr $viaExpr != kernel $viaKernel")
    }
  }

  test("KMV state equals the naive k-smallest-distinct model on random " +
       "inputs across partitionings (reduce/merge laws hold)") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val k = Seq(2, 3, 8, 33)(trial % 4)
      val nVals = 1 + rnd.nextInt(300)
      // heavy duplication on purpose: duplicates must be absorbed
      val vals = (1 to nVals).map(_ => "v" + rnd.nextInt(80))
      val df = vals.map(v => ("g", v)).toDF("g", "v")
        .repartition(1 + rnd.nextInt(7))
      val got = graft.operators.Sketches.kmvState(df, "v", k, Seq("g"))
        .orderBy("rank").collect()
        .map(r => (r.getInt(1), r.getLong(2))).toSeq
      val naive = vals.distinct
        .map(v => {
          // the exact engine hash: first 15 md5 hex chars as a long
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(v.getBytes("UTF-8"))
          java.lang.Long.parseLong(
            md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
        })
        .sorted.take(k).zipWithIndex.map { case (h, i) => (i + 1, h) }
      assert(got == naive,
        s"trial $trial (k=$k, n=$nVals): state diverged from the model")
    }
  }

  test("interval-overlap rewrite equals the brute-force pair set on " +
       "random inputs (inverted and empty intervals included) at " +
       "arbitrary widths") {
    import graft.plans.RangeJoinRewriteRule
    val rnd = new scala.util.Random(23)
    (1 to 4).foreach { trial =>
      val nL = 30 + rnd.nextInt(60)
      val nR = 30 + rnd.nextInt(60)
      def mkIv(n: Int, idBase: Long) = (1 to n).map { i =>
        val s = rnd.nextInt(2000).toLong
        // ~15% degenerate: empty or inverted
        val e = if (rnd.nextInt(100) < 15) s - rnd.nextInt(50)
                else s + 1 + rnd.nextInt(300)
        (idBase + i, s, e)
      }
      val lRows = mkIv(nL, 0L)
      val rRows = mkIv(nR, 10000L)
      val expected = (for {
        (li, ls, le) <- lRows
        (ri, rs, re) <- rRows
        if ls < re && rs < le   // the raw predicate, nothing else
      } yield (li, ri)).toSet
      val l = lRows.toDF("lid", "ls", "le")
      val r = rRows.toDF("rid", "rs", "re")
      def decl = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
      val width = Seq(7L, 64L, 333L, 5000L)(trial % 4)
      spark.conf.set(RangeJoinRewriteRule.WidthConf, width.toString)
      try {
        val got = decl.select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(got.toSet == expected,
          s"trial $trial (w=$width): pair set diverged from brute force")
        assert(got.length == expected.size,
          s"trial $trial (w=$width): duplicate pairs emitted")
      } finally spark.conf.unset(RangeJoinRewriteRule.WidthConf)
    }
  }

  test("persisted SCD2 store equals the in-memory scd2 chain over random " +
       "multi-version refresh sequences (with replayed prefixes)") {
    import graft.operators.Snapshot
    val rnd = new scala.util.Random(31)
    (1 to 3).foreach { trial =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"scd2-prop$trial").toString + "/st"
      val nVersions = 3 + rnd.nextInt(3)
      // random snapshots over a small key space: adds, deletes, revisions
      val snaps = (1 to nVersions).map { v =>
        (1 to 12).flatMap { k =>
          if (rnd.nextBoolean()) Some((k.toLong, s"v${rnd.nextInt(3)}_$k"))
          else None
        }
      }
      var mem = Snapshot.scd2Init(
        snaps.head.toDF("id", "text"), "id", Seq("text"), 1L)
        .localCheckpoint(true)
      Snapshot.ensureHistory(snaps.head.toDF("id", "text"), dir, "id",
        Seq("text"), 1L)
      snaps.tail.zipWithIndex.foreach { case (snap, i) =>
        val v = i + 2L
        mem = Snapshot.scd2Apply(mem, snap.toDF("id", "text"), "id",
          Seq("text"), v).localCheckpoint(true)
        Snapshot.ensureHistory(snap.toDF("id", "text"), dir, "id",
          Seq("text"), v)
        // occasionally replay an already-applied prefix — must be a no-op
        if (rnd.nextBoolean())
          Snapshot.ensureHistory(
            sys.error("prefix replay must not evaluate"), dir, "id",
            Seq("text"), 1L + rnd.nextInt(v.toInt))
      }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "text", "row_hash", "valid_from", "valid_to")
          .collect()
          .map(x => (x.getLong(0), x.getString(1), x.getString(2),
            x.getLong(3), Option(x.get(4)).map(_.asInstanceOf[Long])))
          .sortBy(t => (t._1, t._4)).toSeq
      assert(rows(Snapshot.loadHistory(spark, dir)) == rows(mem),
        s"trial $trial: stored history diverged from the in-memory chain " +
          s"after $nVersions versions")
    }
  }

  test("as-of joins equal the brute-force model on random inputs: " +
       "backward/forward/nearest, ties, tolerance, multi-key") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(11)
    (1 to 6).foreach { trial =>
      val nL = 5 + rnd.nextInt(60)
      val nR = rnd.nextInt(40)
      val tol = if (trial % 2 == 0) Some(5L + rnd.nextInt(30)) else None
      // small ts range on purpose: forces same-instant collisions
      val left = (1 to nL).map(i =>
        (i.toLong, "k" + rnd.nextInt(3), rnd.nextInt(100).toLong))
      // right unique per (key, ts) by construction (the operator contract)
      val right = (1 to nR).map(_ =>
          ("k" + rnd.nextInt(3), rnd.nextInt(100).toLong))
        .distinct.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, 1000L + i) }
      val lDf = left.toDF("pid", "k", "ts")
      val rDf = right.toDF("k", "ts", "payload")

      def model(pid: Long): Map[String, Option[(Long, Long)]] = {
        val (_, k, ts) = left.find(_._1 == pid).get
        val cand = right.filter(_._1 == k)
        def ok(gap: Long) = tol.forall(gap <= _)
        val b = cand.filter(_._2 <= ts).sortBy(-_._2).headOption
          .filter(c => ok(ts - c._2)).map(c => (c._3, c._2))
        val f = cand.filter(_._2 >= ts).sortBy(_._2).headOption
          .filter(c => ok(c._2 - ts)).map(c => (c._3, c._2))
        val n = (b, f) match {
          case (Some(bb), Some(ff)) =>
            if (ts - bb._2 <= ff._2 - ts) Some(bb) else Some(ff)
          case (x, y) => x.orElse(y)
        }
        Map("b" -> b, "f" -> f, "n" -> n)
      }
      def run(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getAs[Long]("pid") ->
          (Option(r.getAs[Any]("payload")).map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("asof_ts")).map(_.asInstanceOf[Long])))
          .toMap
      val gotB = run(RangeJoin.asofBackward(lDf, rDf, "ts", Seq("k"),
        Seq("payload"), tol))
      val gotF = run(RangeJoin.asofForward(lDf, rDf, "ts", Seq("k"),
        Seq("payload"), tol))
      val gotN = run(RangeJoin.asofNearest(lDf, rDf, "ts", Seq("k"),
        Seq("payload"), tol))
      left.foreach { case (pid, _, _) =>
        val m = model(pid)
        def pair(o: Option[(Long, Long)]) = (o.map(_._1), o.map(_._2))
        assert(gotB(pid) == pair(m("b")),
          s"trial $trial backward pid=$pid: ${gotB(pid)} != ${m("b")}")
        assert(gotF(pid) == pair(m("f")),
          s"trial $trial forward pid=$pid: ${gotF(pid)} != ${m("f")}")
        assert(gotN(pid) == pair(m("n")),
          s"trial $trial nearest pid=$pid: ${gotN(pid)} != ${m("n")}")
      }
    }
  }

  test("multi-resolution pointInInterval equals brute force on random " +
       "heavy-tailed length distributions, across widths and caps") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(1013)
    (1 to 4).foreach { trial =>
      val nPts = 150 + rnd.nextInt(150)
      val nIvs = 80 + rnd.nextInt(80)
      val keys = Seq("a", "b", "c")
      val pts = (1 to nPts).map { i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(200000).toLong) }
      val ivs = (1 to nIvs).map { i =>
        val s = rnd.nextInt(200000).toLong
        // heavy tail: ~10% of intervals are 100-10000x the typical length
        val len =
          if (rnd.nextInt(10) == 0) 10000L + rnd.nextInt(2000000)
          else rnd.nextInt(200).toLong
        // some empty/inverted
        val e = if (rnd.nextInt(12) == 0) s - rnd.nextInt(100) else s + len
        (1000L + i, keys(rnd.nextInt(3)), s, e)
      }
      val expected = (for {
        (pid, pk, ts) <- pts
        (iid, ik, lo, hi) <- ivs
        if pk == ik && ts >= lo && ts < hi
      } yield (iid, pid)).toSet
      val pDf = pts.toDF("pid", "k", "ts")
      val iDf = ivs.toDF("iid", "k", "lo", "hi")
      val width = Seq(3L, 50L, 999L)(trial % 3)
      val cap = Seq(4, 64)(trial % 2)
      val got = RangeJoin.pointInInterval(pDf, iDf, "ts", "lo", "hi",
          Seq("k"), bucketWidth = width, maxBucketsPerInterval = cap)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == expected,
        s"trial $trial (w=$width cap=$cap): diverged from brute force")
      assert(got.length == expected.size,
        s"trial $trial (w=$width cap=$cap): duplicate pairs")
      // explosion bound holds under the adversarial tail
      val exploded = RangeJoin.explodedIntervals(iDf, "lo", "hi",
        width, cap.toLong).count()
      assert(exploded <= nIvs.toLong * (cap + 2),
        s"trial $trial: $exploded exploded rows exceed the cap bound")
    }
  }

  test("graft-zorder pruning is row-identical to the full scan on random " +
       "boxes over NaN-bearing data — including a NaN-equality probe " +
       "(Spark's NaN = NaN is true; skipping must never lose those rows)") {
    import graft.operators.Layout
    val rnd = new scala.util.Random(733)
    val pts = (1 to 4096).map { i =>
      // ~2% NaN in each clustered column
      def v = if (rnd.nextInt(50) == 0) Double.NaN else rnd.nextDouble()
      (i.toLong, v, v * 0 + rnd.nextDouble() * (if (rnd.nextInt(50) == 0)
        Double.NaN else 1.0))
    }.toDF("id", "x", "y")
    val dir = java.nio.file.Files
      .createTempDirectory("zprop").toString + "/t"
    pts.write.format("graft-zorder")
      .option("zcols", "x,y").option("bits", "8")
      .option("nFiles", "16").option("tieCol", "id")
      .mode("overwrite").save(dir)
    def src = spark.read.format("graft-zorder").load(dir)
    val full = spark.read.parquet(dir)
    (1 to 5).foreach { trial =>
      val (lo, w) = (rnd.nextDouble() * 0.8, 0.05 + rnd.nextDouble() * 0.3)
      val pred = col("x").between(lo, lo + w) &&
        col("y") >= lit(rnd.nextDouble() * 0.5)
      val got = src.filter(pred).select("id").collect()
        .map(_.getLong(0)).toSet
      val want = full.filter(pred).select("id").collect()
        .map(_.getLong(0)).toSet
      assert(got == want, s"trial $trial: pruning changed the box result")
    }
    // NaN equality selects the NaN rows; a NaN literal must derive no
    // bound (it would poison the intersect test) so nothing is skipped
    val nanPred = col("x") === lit(Double.NaN)
    val gotNaN = src.filter(nanPred).select("id").collect()
      .map(_.getLong(0)).toSet
    val wantNaN = full.filter(nanPred).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(gotNaN == wantNaN && wantNaN.nonEmpty,
      s"NaN-equality rows lost by skipping: got ${gotNaN.size}, " +
        s"want ${wantNaN.size}")
  }

  test("PageRank/HITS invariants on random directed graphs: rank mass " +
       "is conserved, teleport floors hold, norms are exactly L1") {
    import graft.operators.Clusters
    val rnd = new scala.util.Random(421)
    (1 to 3).foreach { trial =>
      val n = 40 + rnd.nextInt(30)
      val edges = (1 to 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.toDF("src", "dst")
      val pr = Clusters.pageRank(edges, iterations = 3)
        .collect().map(_.getDouble(1))
      assert(math.abs(pr.sum - 1.0) < 1e-6,
        s"trial $trial: rank mass leaked: ${pr.sum}")
      val verts = pr.length
      assert(pr.forall(_ >= 0.15 / verts - 1e-9),
        s"trial $trial: a rank fell below the teleport floor")
      val ha = Clusters.hits(edges, iterations = 2).collect()
        .map(r => (r.getDouble(1), r.getDouble(2)))
      assert(math.abs(ha.map(_._1).sum - 1.0) < 1e-6 &&
        math.abs(ha.map(_._2).sum - 1.0) < 1e-6,
        s"trial $trial: HITS L1 norms drifted")
      assert(ha.forall(p => p._1 >= 0 && p._2 >= 0))
    }
  }

  test("hilbert curves: unit-step bijections at arbitrary bit widths " +
       "and dimensionalities, inverse round-trips, and the Skilling " +
       "n-D walk specializes to the classic xy2d walk at n = 2") {
    import graft.functions.HilbertExpressions._
    for (bits <- Seq(2, 3, 4)) {
      val n = 1 << bits
      val d2 = (for (x <- 0L until n; y <- 0L until n)
        yield (x, y) -> xy2d(bits, x, y)).toMap
      assert(d2.values.toSet == (0L until n.toLong * n).toSet,
        s"xy2d not a bijection at bits=$bits")
      val byD = d2.map(_.swap)
      (1 until n * n).foreach { d =>
        val (a, b) = (byD((d - 1).toLong), byD(d.toLong))
        assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
          s"xy2d jumped at bits=$bits d=$d")
      }
    }
    for (dims <- Seq(2, 3, 4); bits <- Seq(2, 3)) {
      val n = 1 << bits
      val total = math.pow(n, dims).toLong
      val cells = Seq.fill(dims)(0L until n.toLong)
        .foldLeft(Seq(Seq.empty[Long]))((acc, r) =>
          acc.flatMap(p => r.map(p :+ _)))
      val m = cells.map(c => c -> axesToIndex(bits, c.toArray)).toMap
      assert(m.values.toSet == (0L until total).toSet,
        s"skilling not a bijection at dims=$dims bits=$bits")
      val byD = m.map(_.swap)
      (1L until total).foreach { d =>
        val (a, b) = (byD(d - 1), byD(d))
        val step = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(step == 1, s"skilling jumped at dims=$dims bits=$bits d=$d")
      }
      // inverse round-trip
      (0L until total).foreach { d =>
        assert(m(indexToAxes(bits, dims, d).toSeq) == d)
      }
    }
    // the Skilling transpose walk SPECIALIZES to the classic xy2d walk
    // at n = 2 — the two implementations must agree cell for cell, so a
    // 2-D store reads identically no matter which code path indexed it
    for (bits <- Seq(2, 3, 4); x <- 0L until (1L << bits);
         y <- 0L until (1L << bits))
      assert(xy2d(bits, x, y) == axesToIndex(bits, Array(x, y)),
        s"2-D walks diverge at bits=$bits ($x,$y)")
  }

  test("bloom skipping: zero false negatives for random ids, params, " +
       "and STRING keys") {
    import graft.operators.Layout
    val rnd = new scala.util.Random(1717)
    for ((m, k) <- Seq((1024, 1), (16384, 5), (4096, 8))) {
      val ids = (1 to 600).map(_ => rnd.nextLong() % 100000L).distinct
      val assigned = ids.zipWithIndex
        .map { case (id, i) => (id, (i % 7).toLong) }
        .toDF("id", "file_id")
      val bloom = Layout.fileBloom(assigned, "id", mBits = m, k = k)
      val truth = assigned.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val kept = Layout.bloomProbe(bloom, assigned.select("id"), "id",
          mBits = m, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      ids.foreach { id =>
        assert(kept(id).contains(truth(id)),
          s"FALSE NEGATIVE at m=$m k=$k for id $id")
      }
    }
    // string keys hash on their own rendering
    val names = (1 to 200).map(i => s"doc_${i}_x").toDF("name")
      .withColumn("file_id", pmod(length(col("name")), lit(5)).cast("long"))
    val bloom = Layout.fileBloom(names, "name")
    val kept = Layout.bloomProbe(bloom, names.select("name"), "name")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = names.collect().map(r => r.getString(0) -> r.getLong(1))
    truth.foreach { case (nm, f) =>
      assert(kept(nm).contains(f), s"string FALSE NEGATIVE for $nm")
    }
  }

  test("exact-substring pair spans equal a brute-force maximal-match " +
       "reference on random small-alphabet corpora, includeSelf and not") {
    // tiny alphabet + short docs force dense repeats at every alignment;
    // the brute force enumerates every non-left-extendable match run of
    // length >= minLen directly from the token arrays
    def brute(docs: Map[Long, Vector[String]], minLen: Int,
              includeSelf: Boolean): Set[(Long, Long, Int, Int, Int)] = {
      val out = scala.collection.mutable.Set.empty[(Long, Long, Int, Int, Int)]
      for ((ia, ta) <- docs; (ib, tb) <- docs
           if ia < ib || (includeSelf && ia == ib)) {
        for (pa <- ta.indices; pb <- tb.indices
             if ia < ib || pb > pa) {
          val leftExt = pa > 0 && pb > 0 && ta(pa - 1) == tb(pb - 1) &&
            (ia < ib || pb - 1 > pa - 1)
          if (!leftExt) {
            var l = 0
            while (pa + l < ta.length && pb + l < tb.length &&
                   ta(pa + l) == tb(pb + l)) l += 1
            if (l >= minLen) out += ((ia, ib, pa, pb, l))
          }
        }
      }
      out.toSet
    }
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 10) {
      val minLen = 3 + rnd.nextInt(2)
      val alpha = Vector("aa", "bb", "cc", "dd")
      val docs = (1L to (3 + rnd.nextInt(3)).toLong).map { id =>
        id -> Vector.fill(rnd.nextInt(22))(alpha(rnd.nextInt(alpha.size)))
      }.toMap
      val df = docs.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      for (includeSelf <- Seq(false, true)) {
        val got = graft.operators.Dedup.exactSubstringPairSpans(df,
            minLen = minLen, includeSelf = includeSelf).collect()
          .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
            r.getAs[Int]("p_a"), r.getAs[Int]("p_b"), r.getAs[Int]("len")))
          .toSet
        val want = brute(docs, minLen, includeSelf)
        assert(got == want,
          s"trial $trial includeSelf=$includeSelf minLen=$minLen: " +
            s"spark ${got.toSeq.sorted} != brute ${want.toSeq.sorted} " +
            s"on ${docs.map { case (k, v) => k -> v.mkString(" ") }}")
      }
    }
  }

  test("contaminationSpans equals a brute-force reference on random " +
       "corpora — hot-anchor cap, eval coordinates, and region merge — " +
       "and the streamed report matches batch under random deliveries") {
    def grams(t: Vector[String], n: Int): Seq[(Vector[String], Int)] =
      if (t.length < n) Nil else (0 to t.length - n).map(p => t.slice(p, p + n) -> p)
    def brute(train: Map[Long, Vector[String]], eval: Map[Long, Vector[String]],
              minLen: Int, maxOcc: Int): Set[(Long, Int, Int, Long)] = {
      val evalGramSet = eval.values.flatMap(grams(_, minLen).map(_._1)).toSet
      val tCount = train.toSeq.flatMap { case (_, t) => grams(t, minLen).map(_._1) }
        .filter(evalGramSet).groupBy(identity).view.mapValues(_.size).toMap
      val anchors = for {
        (tid, tt) <- train.toSeq; (g, pt) <- grams(tt, minLen)
        if evalGramSet(g) && tCount(g) <= maxOcc
        (eid, et) <- eval.toSeq; (ge, pe) <- grams(et, minLen) if ge == g
      } yield (tid, eid, pe - pt, pe)
      val sides = anchors.groupBy(a => (a._1, a._2, a._3)).toSeq.flatMap {
        case ((tid, eid, _), as) =>
          val ps = as.map(_._4).distinct.sorted
          // consecutive runs of matched anchor positions
          val runs = ps.foldLeft(List.empty[(Int, Int)]) {
            case ((s0, e0) :: rest, p) if p == e0 + 1 => (s0, p) :: rest
            case (acc, p) => (p, p) :: acc
          }
          runs.map { case (s0, e0) => (eid, s0, e0 + minLen - 1, tid) }
      }.distinct
      // mergeDocSpans twin: overlapping-or-adjacent intervals fuse
      sides.groupBy(_._1).toSeq.flatMap { case (eid, iv) =>
        val sorted = iv.sortBy(x => (x._2, x._3, x._4))
        val regions = scala.collection.mutable.ListBuffer
          .empty[scala.collection.mutable.ListBuffer[(Long, Int, Int, Long)]]
        var pm = Int.MinValue
        sorted.foreach { case t @ (_, st, en, _) =>
          if (regions.isEmpty || st > pm + 1)
            regions += scala.collection.mutable.ListBuffer(t)
          else regions.last += t
          pm = math.max(pm, en)
        }
        regions.map { r =>
          (eid, r.map(_._2).min, r.map(_._3).max, r.map(_._4).distinct.size.toLong)
        }
      }.toSet
    }

    val rnd = new scala.util.Random(31)
    val alpha = Vector("pa", "qb", "rc", "sd")
    for (trial <- 0 until 8) {
      val minLen = 3
      val maxOcc = Seq(1, 2, 3, 100)(rnd.nextInt(4))
      def mk(n: Int, maxLen: Int) = (1L to n.toLong).map(id =>
        id -> Vector.fill(rnd.nextInt(maxLen))(alpha(rnd.nextInt(alpha.size)))).toMap
      val train = mk(3 + rnd.nextInt(2), 18)
      val eval = mk(2 + rnd.nextInt(2), 14)
      def df(m: Map[Long, Vector[String]]) =
        m.toSeq.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
      val want = brute(train, eval, minLen, maxOcc)
      val got = graft.operators.Dedup.contaminationSpans(df(train), df(eval),
          minLen = minLen, maxOcc = maxOcc).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
          r.getAs[Int]("span_end"), r.getAs[Long]("n_partners"))).toSet
      assert(got == want,
        s"trial $trial maxOcc=$maxOcc: spark ${got.toSeq.sorted} != " +
          s"brute ${want.toSeq.sorted}\ntrain=$train\neval=$eval")

      // streamed twin under a random 2-way delivery split: the global
      // report-time cap must land on the same spans
      if (trial % 2 == 0) {
        import graft.streaming.StreamingContamination
        val stateDir = java.nio.file.Files
          .createTempDirectory(s"contam-prop-$trial").toString
        val p = StreamingContamination.Params(minLen = minLen, maxOcc = maxOcc)
        StreamingContamination.prepareEval(spark, df(eval), stateDir, p)
        val (b0, b1) = train.partition { case (id, _) => rnd.nextBoolean() }
        Seq(b0, b1).zipWithIndex.foreach { case (b, k) =>
          if (b.nonEmpty)
            StreamingContamination.processBatch(spark, df(b), stateDir, p,
              batchKey = Some(k.toLong)) }
        val streamed = StreamingContamination.report(spark, stateDir, p)
          .collect().map(r => (r.getAs[Long]("doc_id"),
            r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
            r.getAs[Long]("n_partners"))).toSet
        assert(streamed == want,
          s"trial $trial: streamed ${streamed.toSeq.sorted} != " +
            s"brute ${want.toSeq.sorted}")
        graft.sources.Bundle.deleteRecursively(stateDir)
      }
    }
  }
}
