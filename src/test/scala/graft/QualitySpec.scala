package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Document-quality operators: Gopher doc-level rules, C4 line cleaning,
  * PII scan/redaction, cross-corpus line dedup.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("gopherStats computes metrics and the composite pass flag") {
    val docs = Seq(
      (1L, Seq.fill(10)("the and of to in is a").mkString(" ")), // mean len < 3
      (2L, Seq.fill(60)("the spark engine runs fast").mkString(" ")), // passes
      (3L, "short text only") // < 50 words
    ).toDF("doc_id", "text")
    val m = Quality.gopherStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(m(2L).getAs[Int]("n_words") == 300)
    assert(approx(m(2L).getAs[Double]("mean_word_len"), 4.4, 1e-6))
    assert(approx(m(2L).getAs[Double]("alpha_frac"), 1.0))
    assert(m(2L).getAs[Long]("stop_hits") == 60L)
    assert(m(2L).getAs[Boolean]("gopher_pass"))

    assert(m(1L).getAs[Int]("n_words") == 70)
    assert(m(1L).getAs[Double]("mean_word_len") < 3.0) // 15 chars / 7 words
    assert(!m(1L).getAs[Boolean]("gopher_pass"))

    assert(!m(3L).getAs[Boolean]("gopher_pass")) // under min word count
  }

  test("piiStats counts and redacts email / IPv4 / phone spans") {
    val docs = Seq(
      (1L, "mail me at bob.smith@corp.io or 10.0.0.1 or 555-1234 ok"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val m = Quality.piiStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Int]("n_email") == 1)
    assert(m(1L).getAs[Int]("n_ip") == 1)
    assert(m(1L).getAs[Int]("n_phone") == 1)
    assert(m(1L).getAs[String]("h_redacted") ==
      md5Hex("mail me at [EMAIL] or [IP] or [PHONE] ok"))
    assert(m(2L).getAs[Int]("n_email") == 0)
    assert(m(2L).getAs[String]("h_redacted") == md5Hex("nothing sensitive here"))
  }

  test("chunkLines fixed-width chunking, empty docs drop out") {
    val docs = Seq((1L, "a b c d e"), (2L, "")).toDF("doc_id", "text")
    val lines = Quality.chunkLines(docs, lineTokens = 2).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("line_no"), r.getAs[String]("line")))
    assert(lines.toSet == Set((1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e")))
  }

  test("c4Clean keeps only clean lines and hashes them in line order") {
    val lines = Seq(
      (1L, 0, "one two three four five six."),
      (1L, 1, "contains javascript code here today."),
      (1L, 2, "no terminal punctuation here at all"),
      (1L, 3, "lorem ipsum dolor sit amet world."),
      (1L, 4, "curly { brace line with words."),
      (1L, 5, "four words only here."),
      (1L, 6, "another good line with five words.")
    ).toDF("id", "line_no", "line")
    val r = Quality.c4Clean(lines).collect().head
    assert(r.getAs[Long]("n_lines") == 7)
    assert(r.getAs[Long]("n_kept") == 2)
    assert(r.getAs[Long]("kept_tokens") == 12)
    assert(r.getAs[String]("h_clean") == md5Hex(
      "one two three four five six.\nanother good line with five words."))
  }

  test("c4CleanText (stateless expression) equals c4Clean on newline-split docs") {
    val raw = Seq(
      (1L, "one two three four five six.\n" +
        "contains javascript code here today.\n" +
        "no terminal punctuation here at all\n" +
        "lorem ipsum dolor sit amet world.\n" +
        "curly { brace line with words.\n" +
        "four words only here.\n" +
        "another good line with five words."),
      (2L, "everything here fails the keep rule"))
      .toDF("doc_id", "text")
    val got = raw.select(col("doc_id"),
      Quality.c4CleanText(col("text")).as("clean")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean")).toMap
    assert(got(1L) ==
      "one two three four five six.\nanother good line with five words.")
    assert(got(2L) == "")
    // agrees with the aggregated path's hash on the same newline split
    val lines = raw.select(col("doc_id").as("id"),
      posexplode(split(col("text"), "\n")).as(Seq("line_no", "line")))
    val h = Quality.c4Clean(lines).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("h_clean")).toMap
    got.foreach { case (id, clean) => assert(h(id) == md5Hex(clean), s"doc $id") }
  }

  test("lineDedupStats keeps the corpus-wide first occurrence only") {
    val lines = Seq(
      (1L, 0, "x y"), (1L, 1, "x y"), (1L, 2, "a b"),
      (2L, 0, "x y"), (2L, 1, "c d")
    ).toDF("id", "line_no", "line")
    val m = Quality.lineDedupStats(lines).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(m(1L).getAs[Long]("n_lines") == 3 && m(1L).getAs[Long]("n_kept") == 2)
    assert(approx(m(1L).getAs[Double]("dup_frac"), 0.333333, 1e-6))
    assert(m(2L).getAs[Long]("n_lines") == 2 && m(2L).getAs[Long]("n_kept") == 1)
    assert(approx(m(2L).getAs[Double]("dup_frac"), 0.5))
  }

  test("domainCap: salted two-phase top-K equals a plain per-domain window") {
    val docs = (1L to 200L)
      .map(i => (i, s"d${i % 5}", (i * 37 % 101).toInt))
      .toDF("doc_id", "domain", "score")
    val capped = Quality.domainCap(docs, domainCol = "domain",
      scoreCol = "score", cap = 7, nSalt = 4)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("score").desc, col("doc_id"))
    val ref = docs.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= 7)
    val cols = Seq("doc_id", "domain", "score", "domain_rank").map(col)
    assert(capped.select(cols: _*).exceptAll(ref.select(cols: _*)).isEmpty)
    assert(ref.select(cols: _*).exceptAll(capped.select(cols: _*)).isEmpty)
    assert(capped.groupBy("domain").count().collect()
      .forall(_.getAs[Long]("count") <= 7))
  }

  test("domainCap: a domain smaller than the cap keeps all its rows") {
    val docs = Seq((1L, "a", 5), (2L, "a", 3), (3L, "b", 9))
      .toDF("doc_id", "domain", "score")
    val capped = Quality.domainCap(docs, "domain", "score", cap = 10, nSalt = 4)
    assert(capped.count() == 3)
    val ranks = capped.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("domain_rank")).toMap
    assert(ranks == Map(1L -> 1, 2L -> 2, 3L -> 1))
  }

  test("lineRepetitionStats measures within-doc duplicate lines and chars") {
    val lines = Seq(
      (1L, 0, "aaaa"), (1L, 1, "bb"), (1L, 2, "aaaa"), (1L, 3, "aaaa"),
      (2L, 0, "unique one"), (2L, 1, "unique two")
    ).toDF("id", "line_no", "line")
    val m = graft.operators.Quality.lineRepetitionStats(lines).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    // doc1: 4 lines, "aaaa" x3 -> 2 repeats; chars: repeats 8 of total 14
    assert(m(1L).getAs[Long]("n_lines") == 4)
    assert(approx(m(1L).getAs[Double]("dup_line_frac"), 0.5))
    assert(approx(m(1L).getAs[Double]("dup_line_char_frac"), 8.0 / 14.0, 1e-6))
    assert(m(2L).getAs[Long]("n_lines") == 2)
    assert(approx(m(2L).getAs[Double]("dup_line_frac"), 0.0))
  }

  test("topNgramShare finds the dominant bigram share") {
    for (verifiable <- Seq(false, true)) {
      val docs = Seq(
        (1L, "spark and spark and spark runs"), // "spark and" x2 of 5 bigrams
        (2L, "all words differ here now")
      ).toDF("doc_id", "text")
      val m = graft.operators.Quality
        .topNgramShare(docs, n = 2, verifiable = verifiable).collect()
        .map(r => r.getAs[Long]("id") -> r).toMap
      assert(m(1L).getAs[Long]("top_cnt") == 2 && m(1L).getAs[Long]("n_ngrams") == 5)
      assert(approx(m(1L).getAs[Double]("top_share"), 0.4))
      assert(m(2L).getAs[Long]("top_cnt") == 1)
      assert(approx(m(2L).getAs[Double]("top_share"), 0.25))
    }
  }
}
