package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Deduplication: exact, MinHash+LSH, SimHash, exact n-gram Jaccard,
  * embedding near-dup — each on constructed corpora with known duplicates.
  */
@SlowSuite
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private lazy val docs = Seq(
    (1L, base),
    (2L, base + " "),                       // exact dup after normalization
    (3L, base.replace("lazy", "sleepy")),   // near dup
    (4L, "completely different text about spark query engines and shuffles"),
    (5L, "THE  QUICK brown fox jumps over the lazy dog again and again")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps smallest id") {
    val groups = Dedup.exactGroups(docs).collect()
    assert(groups.length == 3)
    val dupGroup = groups.find(_.getAs[Long]("n_dups") == 3).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
    val survivors = Dedup.exact(docs).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L))
  }

  test("minhash LSH finds the near-duplicate pair, skips unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, nHashes = 32, nBands = 16,
      threshold = 0.3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashSignatures row-path agrees with the array-expression path") {
    val fromRows = Dedup.minhashSignatures(docs, nHashes = 8)
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Long](1).toList).toMap
    val fromArray = docs.select(col("doc_id"),
      graft.functions.VectorFunctions.minhashSignature(
        graft.functions.TextFunctions.shingleHashes(col("text"), 3), 8).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toList).toMap
    fromRows.foreach { case (id, sig) => assert(fromArray(id) == sig, s"doc $id") }
  }

  test("simhash pairs near-identical docs within hamming budget") {
    val pairs = Dedup.simhashPairs(docs, nBands = 32, maxHamming = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("banded simhash blocking is lossless: finds ALL pairs brute force finds") {
    // 40 docs with planted near-dups; verify banded candidates == brute force
    val corpus = (0 until 40).map { i =>
      val words = (0 until 12).map(w => s"w${(i * 7 + w * 3) % 25}")
      (i.toLong, words.mkString(" "))
    }
    for (verifiable <- Seq(false, true)) {
      val df = corpus.toDF("doc_id", "text")
      val maxH = 6
      val blocked = Dedup.simhashPairs(df, nBands = 8, maxHamming = maxH,
          verifiable = verifiable)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      val sh = Dedup.simhashValues(df, verifiable = verifiable)
      val brute = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
        .crossJoin(sh.select(col("id").as("id_b"), col("sh").as("sh_b")))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.VectorFunctions
          .hamming64(col("sh_a"), col("sh_b")) <= maxH)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(blocked == brute,
        s"verifiable=$verifiable: banded ${blocked.size} vs brute ${brute.size}")
    }
  }

  test("verifiable minhash finds the same planted near-dups as the xx path") {
    for (verifiable <- Seq(false, true)) {
      val pairs = Dedup.minhashLshPairs(docs, nHashes = 32, nBands = 16,
        threshold = 0.3, verifiable = verifiable).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
        s"verifiable=$verifiable")
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"verifiable=$verifiable")
    }
  }

  test("ngram Jaccard: exact values, prefix filtering is lossless") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    // docs 1,2,5 have identical token streams → identical shingle sets
    assert(approx(pairs((1L, 2L)), 1.0))
    assert(approx(pairs((1L, 5L)), 1.0))
    assert(approx(pairs((2L, 5L)), 1.0))
    // doc 3 differs in one word → 3 of 10 shingles changed:
    // |A∩B| = 7, |A∪B| = 13
    assert(approx(pairs((1L, 3L)), 7.0 / 13.0))
    assert(!pairs.contains((1L, 4L)))
  }

  test("ngramRepetition scores a repetitive doc high and a diverse doc zero") {
    val corpus = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // one distinct trigram
      (2L, "eight totally different words appear in here now"),
      (3L, "ab cd")                                    // < 3 tokens: no trigram
    ).toDF("doc_id", "text")
    val got = Dedup.ngramRepetition(corpus).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((6L, 1L, 1.0 - 1.0 / 6.0)))
    assert(got(2L)._3 == 0.0 && got(2L)._1 == 6L)
    assert(!got.contains(3L))
    // verifiable hash family produces identical counts
    val ver = Dedup.ngramRepetition(corpus, verifiable = true).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ver == got.view.mapValues(v => (v._1, v._2)).toMap)
  }

  test("benchmarkContamination flags docs sharing n-grams with the eval set") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "a completely unrelated sentence lives here"),
      (3L, "something about the quick brown fox too")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "watch the quick brown fox run")).toDF("doc_id", "text")
    val got = Dedup.benchmarkContamination(train, bench).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // "the quick brown" and "quick brown fox" overlap docs 1 and 3
    assert(got(1L) == ((2L, true)) && got(3L) == ((2L, true)))
    assert(got(2L) == ((0L, false)))
  }

  test("embedding near-dup finds a planted duplicate vector") {
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.5, 0.2)),
      (2L, Seq(1.0, 0.001, 0.5, 0.2)), // near-identical
      (3L, Seq(-1.0, 0.3, -0.5, 0.9))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, dim = 4, nBits = 4, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dupSpanStats merges overlapping shared-trigram spans") {
    val docs = Seq(
      (1L, "a b c d e f g h"),  // shares "a b c" (p0), "b c d" (p1) with doc 2
      (2L, "a b c d x y z w"),  // → merged span [0,3] = 4 covered positions
      (3L, "p q r s t u v")     // nothing shared
    ).toDF("doc_id", "text")
    for (verifiable <- Seq(false, true)) {
      val m = Dedup.dupSpanStats(docs, verifiable = verifiable).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(m(1L).getAs[Long]("covered") == 4, s"verifiable=$verifiable")
      assert(m(1L).getAs[Int]("n_tok") == 8)
      assert(approx(m(1L).getAs[Double]("dup_span_frac"), 0.5))
      assert(m(2L).getAs[Long]("covered") == 4)
      assert(m(3L).getAs[Long]("covered") == 0)
      assert(approx(m(3L).getAs[Double]("dup_span_frac"), 0.0))
    }
  }

  test("bloomFlag flags build members and their exact duplicates") {
    val build = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val query = Seq(
      (10L, "alpha beta gamma"),      // dup of build doc 1
      (11L, "unrelated totally new"), // absent (FP odds ~1e-13 at 10 set bits)
      (12L, "DELTA  epsilon zeta")    // dup after normalization
    ).toDF("doc_id", "text")
    val m = Dedup.bloomFlag(build, query).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(m(10L).getAs[Boolean]("flagged") && m(10L).getAs[Boolean]("in_build"))
    assert(m(12L).getAs[Boolean]("flagged") && m(12L).getAs[Boolean]("in_build"))
    assert(!m(11L).getAs[Boolean]("flagged") && !m(11L).getAs[Boolean]("in_build"))
    assert(!m(10L).getAs[Boolean]("false_pos"))
  }

  test("removeDupSpans cuts spans shared with a smaller-id document") {
    for (verifiable <- Seq(false, true)) {
      val corpus = Seq(
        (1L, "alpha beta gamma delta epsilon"),
        (2L, "zeta alpha beta gamma delta eta theta"), // shares doc1's run
        (3L, "completely different words right here"),
        (4L, "tiny doc"),                               // < n tokens: no shingles
        (5L, "...")                                     // no tokens at all
      ).toDF("doc_id", "text")
      val m = Dedup.removeDupSpans(corpus, n = 3, verifiable = verifiable)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

      // first occurrence (smallest id) keeps its text verbatim
      assert(m(1L).getAs[String]("clean_text")
        == "alpha beta gamma delta epsilon")
      assert(m(1L).getAs[Long]("n_removed") == 0L)
      // doc2: shared trigrams at p=1,2 cover tokens 1..4 of 7
      assert(m(2L).getAs[String]("clean_text") == "zeta eta theta")
      assert(m(2L).getAs[Long]("n_removed") == 4L)
      assert(m(2L).getAs[Long]("n_tok") == 7L)
      // untouched / degenerate docs survive unchanged
      assert(m(3L).getAs[Long]("n_removed") == 0L)
      assert(m(4L).getAs[String]("clean_text") == "tiny doc")
      assert(m(5L).getAs[String]("clean_text") == ""
        && m(5L).getAs[Long]("n_tok") == 0L)
    }
  }

  test("exactSubstringPairSpans: maximal matches at any alignment offset") {
    for (verifiable <- Seq(false, true)) {
      // The passage sits at offset 2 in doc1 and offset 5 in doc2 —
      // neither a multiple of minLen=4, i.e. the duplicate STRADDLES any
      // fixed shingle grid; stride-1 anchors + island extension must
      // still recover the exact maximal boundaries.
      val passage = (1 to 10).map(i => s"p$i").mkString(" ")
      val corpus = Seq(
        (1L, s"a1 a2 $passage b1 b2"),
        (2L, s"c1 c2 c3 c4 c5 $passage d1"),
        (3L, "p3 p4 p5 p6"),            // exactly minLen tokens of the passage
        (4L, "p5 p6 p7 x9")             // only 3 shared tokens: below minLen
      ).toDF("doc_id", "text")
      val ps = Dedup.exactSubstringPairSpans(corpus, minLen = 4,
          verifiable = verifiable).collect()
        .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
          (r.getAs[Int]("p_a"), r.getAs[Int]("p_b"), r.getAs[Int]("len"))))
        .toMap
      // maximal, offset-independent, extended to mismatch on both ends
      assert(ps((1L, 2L)) == ((2, 5, 10)))
      assert(ps((1L, 3L)) == ((4, 0, 4)))
      assert(ps((2L, 3L)) == ((7, 0, 4)))
      // sub-minLen overlaps produce nothing
      assert(!ps.keySet.exists(k => k._1 == 4L || k._2 == 4L))
      assert(ps.size == 3)

      // per-doc merge: doc1's two overlapping spans fuse into one maximal
      // region [2, 11] crediting both partners
      val spans = Dedup.exactSubstringSpans(corpus, minLen = 4,
          verifiable = verifiable).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
            r.getAs[Int]("span_len"), r.getAs[Long]("n_partners"))))
      assert(spans.count(_._1 == 1L) == 1)
      assert(spans.toMap.apply(1L) == ((2, 11, 10, 2L)))
      assert(spans.toMap.apply(3L) == ((0, 3, 4, 2L)))

      // removal: every larger-id side sheds the matched tokens
      val m = Dedup.removeExactSubstrings(corpus, minLen = 4,
          verifiable = verifiable).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(m(1L).getAs[Long]("n_removed") == 0L)
      assert(m(2L).getAs[String]("clean_text") == "c1 c2 c3 c4 c5 d1")
      assert(m(3L).getAs[String]("clean_text") == "")
      assert(m(4L).getAs[Long]("n_removed") == 0L)
    }
  }

  test("contaminationSpans: only cross-corpus matches count; eval " +
       "coordinates; colliding raw ids stay separate corpora") {
    val passage = (1 to 6).map(i => s"w$i").mkString(" ")
    val train = Seq(
      (1L, s"t1 t2 $passage t3"),
      (7L, s"t4 $passage t5 t6")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, s"e1 $passage e2"),              // raw id collides with train 1
      (2L, s"e3 $passage e4 s1 s2 s3 s4"),  // + an eval-eval shared tail
      (3L, s"s1 s2 s3 s4 q1 q2 q3")         // clean wrt TRAIN
    ).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(train, eval, minLen = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
          r.getAs[Long]("n_partners")))).toMap
    // eval 1 and 2: the planted passage at eval tokens [1, 6], credited
    // to BOTH train sources; eval 3 is clean — its 4-token overlap with
    // eval 2 is a within-corpus duplicate, NOT contamination
    assert(spans.keySet == Set(1L, 2L))
    assert(spans(1L) == ((1, 6, 2L)) && spans(2L) == ((1, 6, 2L)), spans)
  }

  test("exactSubstringPairSpans includeSelf: within-document repeats at " +
       "any offset, removal keeps the FIRST copy; default mode blind") {
    for (verifiable <- Seq(false, true)) {
      // passage repeated inside ONE doc at token 1 and token 13 (offset
      // 12 — straddles any fixed grid), plus an unrelated clean doc
      val passage = (1 to 10).map(i => s"r$i").mkString(" ")
      val corpus = Seq(
        (1L, s"x0 $passage y0 y1 $passage z0"),
        (2L, "clean words only nothing repeated here at all")
      ).toDF("doc_id", "text")
      // default mode: a same-document repeat is invisible
      assert(Dedup.exactSubstringPairSpans(corpus, minLen = 4,
        verifiable = verifiable).isEmpty)
      val ps = Dedup.exactSubstringPairSpans(corpus, minLen = 4,
          verifiable = verifiable, includeSelf = true).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Int]("p_a"), r.getAs[Int]("p_b"), r.getAs[Int]("len")))
      // ONE maximal self match: first copy at 1, later copy at 13 —
      // b-side pinned to the LATER occurrence
      assert(ps.toSeq == Seq((1L, 1L, 1, 13, 10)), ps.toSeq)
      val spans = Dedup.exactSubstringSpans(corpus, minLen = 4,
          verifiable = verifiable, includeSelf = true).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
          r.getAs[Int]("span_end"), r.getAs[Long]("n_partners"))).toSet
      assert(spans == Set((1L, 1, 10, 1L), (1L, 13, 22, 1L)), spans)
      // removal sheds the LATER occurrence, keeps the first
      val m = Dedup.removeExactSubstrings(corpus, minLen = 4,
          verifiable = verifiable, includeSelf = true).collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(m(1L).getAs[String]("clean_text") ==
        s"x0 $passage y0 y1 z0", m(1L).getAs[String]("clean_text"))
      assert(m(1L).getAs[Long]("n_removed") == 10L)
      assert(m(2L).getAs[Long]("n_removed") == 0L)
    }
  }

  test("exactSubstringPairSpans includeSelf: periodic repeat (period < " +
       "minLen) and overlapping copies resolve per alignment offset") {
    // 12 copies of a 2-token motif: self-matches exist at every even
    // offset d; the d=2 alignment alone covers [2, 23] maximally
    val corpus = Seq(
      (1L, (1 to 12).map(_ => "ab cd").mkString(" "))).toDF("doc_id", "text")
    val ps = Dedup.exactSubstringPairSpans(corpus, minLen = 4,
        includeSelf = true).collect()
      .map(r => (r.getAs[Int]("p_a"), r.getAs[Int]("p_b"),
        r.getAs[Int]("len")))
    // every alignment offset d = p_b - p_a is even and >= 2; the d = 2
    // island is the full 22-token overlap starting at p_a = 0
    assert(ps.contains((0, 2, 22)), ps.toSeq)
    assert(ps.forall { case (pa, pb, _) => (pb - pa) % 2 == 0 && pb > pa })
    // merged per-doc view: one region covering the whole text
    val spans = Dedup.exactSubstringSpans(corpus, minLen = 4,
        includeSelf = true).collect()
      .map(r => (r.getAs[Int]("span_start"), r.getAs[Int]("span_end")))
    assert(spans.toSeq == Seq((0, 23)), spans.toSeq)
  }

  test("removeContaminated scrubs exactly the TRAIN-side match tokens; " +
       "eval-only overlaps and clean docs are untouched") {
    val passage = (1 to 6).map(i => s"w$i").mkString(" ")
    val train = Seq(
      (1L, s"t1 t2 $passage t3"),
      (7L, s"t4 $passage t5 t6"),
      (9L, "clean words nothing shared here at all")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, s"e1 $passage e2"),              // raw id collides with train 1
      (2L, s"e3 $passage e4 s1 s2 s3 s4"),
      (3L, "s1 s2 s3 s4 q1 q2 q3")          // eval-eval overlap only
    ).toDF("doc_id", "text")
    val m = graft.operators.Dedup.removeContaminated(train, eval,
        minLen = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    assert(m(1L) == (("t1 t2 t3", 6L)), m(1L))
    assert(m(7L) == (("t4 t5 t6", 6L)), m(7L))
    assert(m(9L)._2 == 0L, "clean train doc scrubbed")
    assert(m.size == 3, "output must cover the whole TRAIN corpus")
  }

  test("exactSubstringPairSpans: island extension stops at a mismatch") {
    // Two passages in the same doc pair separated by a one-token edit:
    // two DISTINCT maximal spans (same alignment offset d), never bridged.
    val corpus = Seq(
      (1L, "s1 s2 s3 s4 s5 MID s6 s7 s8 s9 s10".toLowerCase),
      (2L, "s1 s2 s3 s4 s5 GAP s6 s7 s8 s9 s10".toLowerCase)
    ).toDF("doc_id", "text")
    val ps = Dedup.exactSubstringPairSpans(corpus, minLen = 3)
      .collect()
      .map(r => (r.getAs[Int]("p_a"), r.getAs[Int]("p_b"), r.getAs[Int]("len")))
      .toSet
    assert(ps == Set((0, 0, 5), (6, 6, 5)))
  }

  test("hot-bucket cap: degenerate bucket emits star candidates, not B²") {
    // 500 ids in one band bucket (the one-boilerplate-page-cloned-10⁷-times
    // shape LSH sub-splitting cannot break: identical content → identical
    // signatures), 10 in a small bucket
    val banded = ((0L until 500L).map(i => ("hot", i)) ++
      (1000L until 1010L).map(i => ("cold", i))).toDF("band", "id")
    val cand = Dedup.bandCandidates(banded, maxBucketSize = 16).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val hotCand = cand.filter(_._1 < 1000L)
    // star: exactly B−1 pairs, every one anchored at the bucket min
    assert(hotCand.length == 499, s"hot candidates ${hotCand.length}")
    assert(hotCand.forall(_._1 == 0L))
    assert(hotCand.map(_._2).toSet == (1L until 500L).toSet)
    // small bucket keeps the full pair join
    assert(cand.count(_._1 >= 1000L) == 10 * 9 / 2)
    // cap off reproduces the quadratic candidate set
    assert(Dedup.bandCandidates(banded, maxBucketSize = 0).count()
      == 500L * 499 / 2 + 10 * 9 / 2)
  }

  test("hot-bucket cap end-to-end: cloned corpus yields min-id star pairs") {
    val clone = "terms of service copyright all rights reserved please " +
      "enable javascript to continue"
    val corpus = ((0L until 60L).map(i => (i, clone)) ++
      Seq((100L, "a genuinely unique document about spark shuffles"),
        (101L, "a genuinely unique document about spark shuffles")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(corpus, nHashes = 32, nBands = 8,
        threshold = 0.5, maxBucketSize = 16).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("est_jaccard"))).toMap
    val clonePairs = pairs.keys.filter(_._2 < 100L).toSet
    // every clone matches the hub with estimated Jaccard 1; no clone-clone
    // pair bypasses the star
    assert(clonePairs == (1L until 60L).map(b => (0L, b)).toSet)
    assert(clonePairs.forall(p => pairs(p) == 1.0))
    // the small-bucket path still verifies ordinary near-dups alongside
    assert(pairs.contains((100L, 101L)))
    // under the cap, capped and uncapped semantics coincide
    val uncapped = Dedup.minhashLshPairs(docs, nHashes = 32, nBands = 16,
      threshold = 0.3, maxBucketSize = 0).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val capped = Dedup.minhashLshPairs(docs, nHashes = 32, nBands = 16,
      threshold = 0.3, maxBucketSize = 4096).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(capped == uncapped)
  }

  test("hot-bucket cap covers the whole pair family: simhash and " +
       "embedding stars to the min id") {
    val clone = "identical boilerplate page repeated across the crawl " +
      "with enough words to vote every simhash bit"
    val simCorpus = ((0L until 40L).map(i => (i, clone)) ++
      Seq((100L, "one unrelated document about catalyst and codegen")))
      .toDF("doc_id", "text")
    val sim = Dedup.simhashPairs(simCorpus, nBands = 8, maxHamming = 6,
        maxBucketSize = 8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(sim == (1L until 40L).map(b => (0L, b)).toSet,
      s"simhash star drifted: $sim")

    import spark.implicits._
    val v = Seq.tabulate(16)(i => math.sin(i + 1.0))
    val u = Seq.tabulate(16)(i => math.cos(i * 2 + 1.0))
    val embCorpus = ((0L until 40L).map(i => (i, v)) ++ Seq((100L, u)))
      .toDF("vec_id", "embedding")
    val emb = Dedup.embeddingNearDupPairs(embCorpus, dim = 16, nBits = 4,
        threshold = 0.99, maxBucketSize = 8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(emb == (1L until 40L).map(b => (0L, b)).toSet,
      s"embedding star drifted: $emb")
  }

  test("pairQuality discriminates: false candidates cost precision, " +
       "missed qualifying pairs cost recall, truth-as-candidates scores " +
       "1.0/1.0, orientation and duplicates normalize") {
    import graft.operators.Dedup
    // Jaccard is controlled via shared 3-gram runs:
    //  d1/d2: near-identical (J well above 0.5)
    //  d3/d4: roughly half-overlapping word runs (J ~ 0.3-0.45)
    //  d5/d6: disjoint (J = 0)
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$common iota kappa"),
      (2L, s"$common iota lambda"),
      (3L, s"$common one two three four five six seven eight nine ten"),
      (4L, s"$common red blue green yellow purple orange pink brown gray black"),
      (5L, "completely different words in this document entirely"),
      (6L, "nothing shared with anything else at all here truly")
    ).toDF("doc_id", "text")
    val truth = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth == Set((1L, 2L)),
      s"fixture must have exactly one qualifying pair, got $truth")
    // candidates: the true pair stated BACKWARD and twice (must
    // normalize to one), one borderline false pair, one disjoint false
    // pair, one self pair (dropped)
    val cands = Seq((2L, 1L), (1L, 2L), (3L, 4L), (5L, 6L), (5L, 5L))
      .toDF("id_a", "id_b")
    val r = Dedup.pairQuality(cands, docs, threshold = 0.5).collect()(0)
    assert(r.getAs[Long]("n_candidates") == 3L, s"normalize failed: $r")
    assert(r.getAs[Long]("n_true_candidates") == 1L)
    assert(r.getAs[Double]("precision") ==
      math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(r.getAs[Long]("n_qualifying") == 1L &&
      r.getAs[Long]("n_found") == 1L && r.getAs[Double]("recall") == 1.0)
    // a blocker that MISSES the qualifying pair scores recall 0
    val miss = Dedup.pairQuality(
      Seq((3L, 4L)).toDF("id_a", "id_b"), docs, threshold = 0.5)
      .collect()(0)
    assert(miss.getAs[Long]("n_found") == 0L &&
      miss.getAs[Double]("recall") == 0.0 &&
      miss.getAs[Double]("precision") == 0.0)
    // the exact pair set evaluated against itself is perfect
    val self = Dedup.pairQuality(
      Dedup.ngramJaccardPairs(docs, threshold = 0.5)
        .select("id_a", "id_b"), docs, threshold = 0.5).collect()(0)
    assert(self.getAs[Double]("precision") == 1.0 &&
      self.getAs[Double]("recall") == 1.0)
    // a candidate referencing an UNKNOWN doc counts (emitted) but is
    // never true — and cannot crash the sizes join
    val unk = Dedup.pairQuality(
      Seq((1L, 99L)).toDF("id_a", "id_b"), docs, threshold = 0.5)
      .collect()(0)
    assert(unk.getAs[Long]("n_candidates") == 1L &&
      unk.getAs[Long]("n_true_candidates") == 0L)
  }
}
