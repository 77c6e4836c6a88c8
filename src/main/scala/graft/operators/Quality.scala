package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document-quality filtering for LLM training corpora: Gopher-style
  * document-level heuristics, C4-style line-level cleaning, PII scanning /
  * redaction, and cross-corpus line-level deduplication (the CCNet /
  * MassiveText pass).
  *
  * Scale design: the document-level rules (Gopher, PII) are pure `Column`
  * expressions — one codegen'd projection over the corpus, no shuffle. The
  * line-level passes explode documents into line rows (fan-out = lines per
  * doc, bounded by document length) and shuffle only 8-byte/16-byte line
  * hashes plus ids; per-document reassembly groups by doc id, the same key
  * the corpus is naturally partitioned by.
  */
object Quality {

  // ---------------------------------------------------------------- Gopher

  /** Total characters inside word tokens (the numerator of mean word
    * length): length of the text with every non-token character removed.
    */
  def tokenChars(text: Column): Column =
    length(regexp_replace(lower(text), "[^a-z0-9_]", ""))

  /** Count of tokens containing at least one letter (Gopher's "80% of words
    * must contain an alphabetic character"). A maximal `[a-z0-9_]+` run
    * containing a letter matches this pattern exactly once.
    */
  def alphaTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9_]*[a-z][a-z0-9_]*"), lit(0)))

  /** Occurrences of the literal hash symbol (Gopher's symbol-to-word ratio
    * counts `#` and `...`).
    */
  def symbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "#", ""))) +
      ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3))

  /** Gopher-family document quality metrics and the composite pass flag
    * (Rae et al. 2021, appendix A document-filter heuristics, re-expressed
    * as Spark columns):
    *   - word count within [minWords, maxWords];
    *   - mean word length within [3, 10];
    *   - ≥ 80% of words contain an alphabetic character;
    *   - symbol-to-word ratio ≤ 0.1;
    *   - at least `minStopHits` stopword occurrences.
    * Returns (id, n_words, mean_word_len, alpha_frac, symbol_ratio,
    * stop_hits, gopher_pass) — one codegen'd projection, no shuffle.
    */
  def gopherStats(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id",
                  minWords: Int = 50, maxWords: Int = 100000,
                  minStopHits: Int = 2,
                  keepCols: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val nWords = TextFunctions.tokenCount(text)
    val denom = greatest(nWords, lit(1)).cast("double")
    val meanLen = tokenChars(text) / denom
    val alphaFrac = alphaTokenCount(text) / denom
    val symRatio = symbolCount(text) / denom
    val stopHits = TextFunctions.EnStopwords
      .map(w => TextFunctions.wordOccurrences(text, w)).reduce(_ + _)
    // keepCols ride along so callers that need the text (or any payload
    // column) next to the stats don't pay a self-join to re-attach it.
    // NOT fanned out (Scans.fanOutNarrowScan): the A/B measured +11-34%
    // here — the stats ride WITH the text payload, so the repartition
    // shuffles the heavy bodies themselves (guide §8: move heavy rows
    // once), unlike the dedup chains whose shuffle carries 8-byte hashes
    docs.select(
      (col(idCol) +: keepCols.map(col)) ++ Seq(
        nWords.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(alphaFrac, 6).as("alpha_frac"),
        round(symRatio, 6).as("symbol_ratio"),
        stopHits.as("stop_hits"),
        (nWords.between(minWords, maxWords) &&
          meanLen.between(3.0, 10.0) &&
          alphaFrac >= 0.8 &&
          symRatio <= 0.1 &&
          stopHits >= minStopHits).as("gopher_pass")): _*)
  }

  // ------------------------------------------------------------------- PII

  /** RE2-safe patterns (no lookaround/backrefs — portable to DuckDB). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII scan + redaction: counts of email / IPv4 / phone-shaped spans and
    * the text with each span replaced by a typed placeholder. Redaction
    * order (email → IP → phone) is part of the contract: earlier passes
    * consume their digits so later patterns cannot re-match inside them.
    * Pure `Column` projection — no shuffle, linear scan at any scale.
    */
  def piiStats(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val text = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]")
    docs.select(
      col(idCol),
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).as("n_ip"),
      size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("n_phone"),
      md5(redacted.cast("binary")).as("h_redacted"))
  }

  // ----------------------------------------------------------------- lines

  /** Chunk each document into pseudo-lines of `lineTokens` word tokens
    * (corpora with real newlines would split on those instead — the
    * synthetic tables carry none, and fixed-width chunking is itself the
    * standard segmentation for training-sequence preparation). Output one
    * row per (id, line_no, line); documents with no tokens produce no rows.
    */
  def chunkLines(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", lineTokens: Int = 12): DataFrame = {
    // Tokenize ONCE into its own projection: the lambda below references
    // the token array per line element, and an inline regexp_extract_all
    // there is re-evaluated for EVERY element — O(len²) per document (the
    // SCALE.md in-lambda re-evaluation class; this exact site was the q68
    // 30-second bench outlier at lineTokens=2). A multi-referenced alias
    // survives CollapseProject, so the scan stays one linear pass.
    val staged = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("_toks"))
    val toks = col("_toks")
    val nLines = ceil(size(toks) / lit(lineTokens.toDouble)).cast("int")
    // sequence(0, -1) counts DOWN — empty docs need the empty array.
    val lines = when(size(toks) >= 1,
      transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(toks, i * lineTokens + 1, lit(lineTokens)))))
      .otherwise(array().cast("array<string>"))
    staged.select(col("id"), posexplode(lines).as(Seq("line_no", "line")))
  }

  /** C4-style line keep rule (Raffel et al. 2020 cleaning heuristics):
    * ≥ `minLineWords` words, terminal punctuation, and no boilerplate
    * markers (javascript / lorem ipsum / curly brace).
    */
  def c4Keep(line: Column, minLineWords: Int = 5): Column =
    TextFunctions.tokenCount(line) >= minLineWords &&
      line.endsWith(".") &&
      !lower(line).contains("javascript") &&
      !lower(line).contains("lorem ipsum") &&
      !line.contains("{")

  /** [[c4Keep]] applied per DOCUMENT as one stateless expression: split on
    * real newlines, drop failing lines, rejoin in order. Equals
    * [[c4Clean]]'s kept text when the lines table is the newline split of
    * the same documents (QualitySpec pins this) — but being a pure
    * `Column`, it also runs where an aggregation cannot: inside an
    * append-mode streaming projection (`StreamingCorpus`).
    */
  def c4CleanText(text: Column, minLineWords: Int = 5): Column =
    concat_ws("\n", filter(split(text, "\n"), l => c4Keep(l, minLineWords)))

  /** C4 line-level cleaning over a (id, line_no, line) table: apply
    * [[c4Keep]], then reassemble per-document retention stats and the md5
    * of the cleaned text (kept lines joined by newline in line order).
    * One hash aggregation on the doc id; line order is restored by sorting
    * the collected (line_no, line) structs, so the result is independent of
    * shuffle arrival order.
    */
  def c4Clean(lines: DataFrame, minLineWords: Int = 5): DataFrame = {
    val keep = c4Keep(col("line"), minLineWords)
    val kept = when(keep, struct(col("line_no"), col("line")))
    lines
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(keep, TextFunctions.tokenCount(col("line")).cast("long"))),
          lit(0L)).as("kept_tokens"),
        md5(concat_ws("\n",
          transform(array_sort(collect_list(kept)), s => s.getField("line")))
          .cast("binary")).as("h_clean"))
  }

  /** Cross-corpus line-level deduplication (the CCNet / MassiveText pass):
    * hash every line, keep only the FIRST occurrence corpus-wide (ordered
    * by doc id, then line position), and report per-document retention.
    *
    * Skew-proof by construction: the corpus-wide first occurrence is a
    * `min(struct(id, line_no))` AGGREGATION on the line hash — partial
    * aggregation collapses a boilerplate line duplicated 10⁸× to one row
    * per map partition before any shuffle, where a `row_number` window on
    * the same key would sort all occurrences in a single task. The kept
    * count is then re-aggregated to doc grain from the (distinct-hash)
    * first-occurrence table, so the only join is doc-grain × doc-grain on
    * the doc id — no join ever touches the skewed hash key.
    */
  def lineDedupStats(lines: DataFrame): DataFrame = {
    val hashed = lines.withColumn("h", md5(col("line").cast("binary")))
    val keptPerDoc = hashed
      .groupBy(col("h"))
      .agg(min(struct(col("id"), col("line_no"))).as("fo"))
      .groupBy(col("fo.id").as("id"))
      .agg(count(lit(1)).as("n_kept"))
    lines
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"))
      .join(keptPerDoc, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .withColumn("dup_frac",
        round(lit(1.0) - col("n_kept") / col("n_lines").cast("double"), 6))
  }

  // ------------------------------------------ within-doc repetition rules

  /** Within-document duplicate-line metrics (Rae et al. 2021 Gopher
    * repetition rules — the WITHIN-doc counterpart of the corpus-wide
    * q60/q68 signals): per document, the fraction of lines that are
    * repeats of an earlier identical line, and the fraction of characters
    * inside those repeats. Two plain aggregations — (id, line) grain then
    * id grain; partial aggregation absorbs the repetition itself, nothing
    * windows, nothing n².
    *
    * Input grain: (id, line_no, line) as produced by [[chunkLines]].
    */
  def lineRepetitionStats(lines: DataFrame): DataFrame = {
    val perLine = lines.groupBy(col("id"), col("line"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("id"), col("cnt"), length(col("line")).as("len"))
    perLine.groupBy(col("id")).agg(
      sum(col("cnt")).as("n_lines"),
      round(sum(col("cnt") - 1) / sum(col("cnt")).cast("double"), 6)
        .as("dup_line_frac"),
      round(sum((col("cnt") - 1) * col("len")) /
        greatest(sum(col("cnt") * col("len")), lit(1L)).cast("double"), 6)
        .as("dup_line_char_frac"))
  }

  /** Most-frequent word n-gram share per document (the Gopher
    * "top n-gram character fraction" family, token-approximated): the
    * occurrence count of the document's most repeated n-gram over its
    * total n-gram count. One (id, shingle) count plus an id-grain rollup.
    */
  def topNgramShare(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", n: Int = 2,
                    verifiable: Boolean = false): DataFrame =
    Dedup.shingleRows(docs, textCol, idCol, n, verifiable)
      .groupBy(col("id"), col("s")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id")).agg(
        max(col("cnt")).as("top_cnt"),
        sum(col("cnt")).as("n_ngrams"),
        round(max(col("cnt")) / sum(col("cnt")).cast("double"), 6)
          .as("top_share"))

  // ---------------------------------------------------------- domain caps

  /** Per-domain document cap (the CCNet / FineWeb recipe step that stops a
    * single giant domain from dominating the corpus): keep at most `cap`
    * documents per domain, preferring higher `scoreCol`, ties broken by
    * ascending id — fully deterministic.
    *
    * Skew-safe top-K: a plain `row_number() over (partition by domain)`
    * would sort a mega-domain's 10⁸ documents in ONE task. Instead the
    * selection runs in two exact phases: (1) salt each row by
    * `xxhash64(id) mod nSalt` and take the local top-`cap` within each
    * (domain, salt) group — every global top-`cap` row is necessarily
    * top-`cap` within its own bucket, so phase 1 loses nothing; (2) rank
    * the ≤ cap·nSalt survivors per domain — groups now bounded by
    * cap·nSalt regardless of domain size. Returns the input rows plus
    * `domain_rank` (1-based within domain) filtered to the cap.
    */
  def domainCap(docs: DataFrame, domainCol: String, scoreCol: String,
                idCol: String = "doc_id", cap: Int = 1000,
                nSalt: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col(scoreCol).desc, col(idCol).asc)
    val salted = docs.withColumn("_salt",
      pmod(xxhash64(col(idCol)), lit(nSalt.toLong)))
    val w1 = Window.partitionBy(col(domainCol), col("_salt")).orderBy(ord: _*)
    val local = salted
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= cap)
      .drop("_salt", "_r1")
    val w2 = Window.partitionBy(col(domainCol)).orderBy(ord: _*)
    local
      .withColumn("domain_rank", row_number().over(w2))
      .filter(col("domain_rank") <= cap)
  }

  // ------------------------------------------------------ corpus report

  /** Per-(source, lang) ADDITIVE sufficient statistics of the corpus
    * profile: doc/token counts plus the DECIMAL quality sum. The grain is
    * bounded by the source×lang vocabulary, DECIMAL sums merge exactly
    * (associative), so partials from disjoint corpus slices combine into
    * the identical report — the mergeable shape the streaming report
    * relies on.
    */
  def profilePartials(docs: DataFrame, sourceCol: String = "source",
                      langCol: String = "lang",
                      textCol: String = "text"): DataFrame =
    docs
      .select(col(sourceCol).as("source"), col(langCol).as("lang"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
        round(TextFunctions.qualityScore(col(textCol)), 6).as("q"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("q").cast("decimal(28,6)")).as("sum_q"))

  /** The per-source report from (possibly merged) partials: doc/token
    * counts, mean quality, and language-mix entropy (per-term rounding +
    * DECIMAL sum — cross-engine exact).
    */
  def reportFromPartials(partials: DataFrame): DataFrame = {
    val merged = partials.groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("sum_q")).as("sum_q"))
    val perSrc = merged.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("sum_q")).cast("double") / sum(col("n_docs")), 6)
          .as("mean_quality"))
    val ent = merged
      .join(perSrc.select(col("source"), col("n_docs").as("_nd")), Seq("source"))
      .select(col("source"),
        round((col("n_docs").cast("double") / col("_nd")) *
          log(col("n_docs").cast("double") / col("_nd")), 6).as("term"))
      .groupBy(col("source"))
      .agg(round(-sum(col("term").cast("decimal(28,6)")).cast("double"), 6)
        .as("lang_entropy"))
    perSrc.join(ent, Seq("source"))
  }

  /** One-shot batch corpus report — q99's query body. */
  def corpusReport(docs: DataFrame, sourceCol: String = "source",
                   langCol: String = "lang",
                   textCol: String = "text"): DataFrame =
    reportFromPartials(profilePartials(docs, sourceCol, langCol, textCol))
}
