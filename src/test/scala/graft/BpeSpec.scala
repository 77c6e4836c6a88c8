package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, BpeKernel}

/** BPE training (deterministic Sennrich), greedy apply kernel, and the
  * native pieces/count expressions.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train reproduces the classic Sennrich example, deterministically") {
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(dict, nMerges = 4)
    // pair counts: es=9, st=9 (tie -> lexicographic), then est follows
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")))
    assert(Bpe.train(dict.reverse, nMerges = 4) == merges,
      "training must not depend on dict order")
  }

  test("train stops when no pair repeats") {
    val merges = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), nMerges = 10)
    assert(merges.isEmpty)
  }

  test("greedy apply merges by rank, all occurrences left-to-right") {
    val kernel = new BpeKernel(Seq(("e", "s"), ("es", "t")))
    assert(kernel.encodeWord("newest").toSeq == Seq("n", "e", "w", "est"))
    assert(kernel.encodeWord("lowest").toSeq == Seq("l", "o", "w", "est"))
    assert(kernel.encodeWord("s").toSeq == Seq("s"))
    // left-to-right non-overlap: aaaa with (a,a) -> aa, aa
    val k2 = new BpeKernel(Seq(("a", "a")))
    assert(k2.encodeWord("aaaa").toSeq == Seq("aa", "aa"))
    assert(k2.encodeWord("aaa").toSeq == Seq("aa", "a"))
  }

  test("pieces/count expressions: word-grain, case-folded, codegen'd") {
    val merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq(
      (1L, "The theme, thx!"),
      (2L, ""),
      (3L, "a_b2 c")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        Bpe.bpePieces(col("text"), merges).as("p"),
        Bpe.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getSeq[String](1), r.getAs[Long]("n"))).toMap
    // "the" -> [the]; "theme" -> [the, m, e]; "thx" -> [th, x]
    assert(out(1L)._1 == Seq("the", "the", "m", "e", "th", "x"))
    assert(out(1L)._2 == 6L)
    assert(out(2L)._1.isEmpty && out(2L)._2 == 0L)
    // underscore and digits are word chars: a_b2 is ONE word
    assert(out(3L)._1 == Seq("a", "_", "b", "2", "c"))
    assert(out(3L)._2 == 5L)
  }

  test("trainOnCorpus: deterministic sample, merges apply end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.trainOnCorpus(docs, nMerges = 50, sampleN = 64)
    val m2 = Bpe.trainOnCorpus(docs, nMerges = 50, sampleN = 64)
    assert(m1 == m2, "trained merges must be reproducible")
    assert(m1.size == 50, "corpus sample has plenty of repeated pairs")
    // counts are consistent: pieces count == count expression, and merging
    // can only shrink a word's piece count vs its character count
    val checked = docs.select(
        size(Bpe.bpePieces(col("text"), m1)).cast("long").as("np"),
        Bpe.bpeTokenCount(col("text"), m1).as("nc"),
        length(regexp_replace(lower(col("text")), "[^a-z0-9_]", ""))
          .cast("long").as("chars"))
      .agg(sum(when(col("np") === col("nc"), 0).otherwise(1)).as("mismatch"),
        sum(when(col("np") <= col("chars"), 0).otherwise(1)).as("grew"))
      .collect().head
    assert(checked.getLong(0) == 0L && checked.getLong(1) == 0L)
  }

  test("persisted merge store: save/load round-trips rank order, ensure " +
       "trains cold and serves warm WITHOUT ever constructing the corpus " +
       "lineage, parameter drift retrains") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("bpestore").toString +
      "/merges"
    // cold: trains and writes
    val (m1, trained1) = Bpe.ensure(docs, dir, nMerges = 40, sampleN = 64)
    assert(trained1, "first ensure must train")
    assert(m1 == Bpe.trainOnCorpus(docs, nMerges = 40, sampleN = 64),
      "stored merges must equal a direct training run (rank order intact)")
    assert(m1 == Bpe.load(spark, dir), "load must round-trip")
    // warm: the docs argument is by-name and must never be evaluated —
    // a throwing thunk proves no corpus lineage is even constructed
    val (m2, trained2) = Bpe.ensure(
      sys.error("warm ensure evaluated the corpus"), dir,
      nMerges = 40, sampleN = 64)
    assert(!trained2 && m2 == m1,
      "warm ensure must serve the saved ranks untouched")
    // drift: different nMerges invalidates and retrains
    val (m3, trained3) = Bpe.ensure(docs, dir, nMerges = 20, sampleN = 64)
    assert(trained3, "parameter drift must retrain")
    assert(m3 == m1.take(20),
      "a shorter merge budget is a prefix of the longer run")
    // fixed-table store: content hash invalidates on change
    val fdir = dir + "_fixed"
    val t1 = Seq(("t", "h"), ("th", "e"))
    assert(Bpe.ensureTable(t1, fdir) == t1)
    assert(Bpe.ensureTable(t1, fdir) == t1, "warm fixed table serves")
    val t2 = Seq(("i", "n"))
    assert(Bpe.ensureTable(t2, fdir) == t2,
      "changed content must rewrite the store")
  }
}
