package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale document pipelines: token
  * counting, quality scoring, n-gram heuristic language ID, fingerprinting,
  * shingling. These extend the reference's string utilities
  * (trx/utils/string.py) with the document-corpus operators a training-data
  * pipeline needs; all pure `Column` expressions so they stay codegen'd and
  * scale linearly over a 100 TB `documents` table.
  */
object TextFunctions {

  /** Word tokens: maximal runs of word characters (ASCII letters/digits/_). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9_]+"), lit(0))

  /** Whitespace-ish token count via regexp (robust to repeated/trailing
    * separators, unlike a bare split).
    */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word proxy count: ceil(chars-sans-spaces / 4) + tokens/4,
    * the standard "~4 chars per token" heuristic used to budget LLM corpora.
    */
  def approxBpeTokenCount(text: Column): Column = {
    val chars = length(regexp_replace(text, "\\s+", ""))
    ceil(chars / lit(4.0)).cast("long")
  }

  /** Number of occurrences of literal `word` as a whole token. */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val needle = s" $word "
    // (len(s) - len(replace(s, w, ''))) / len(w) — portable occurrence count
    ((length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(needle), ""))) /
      lit(needle.length)).cast("long")
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", "")) /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword-token ratio for a given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val hits = stopwords.map(w => wordOccurrences(text, w))
      .reduce(_ + _)
    hits / greatest(tokenCount(text), lit(1L)).cast("double")
  }

  /** Default English stopword list used by the quality score. */
  val EnStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** Composite document quality score in [0, 1]:
    * mean of (length score, non-punct score, stopword-presence score).
    * Deterministic, fully arithmetic — a stand-in for classifier-based
    * quality filters, shaped like Gopher/C4-style heuristics.
    */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(length(text) / lit(500.0), lit(1.0))
    val punct     = punctRatio(text)
    val punctScore = greatest(lit(0.0), lit(1.0) - punct * 5.0)
    val stopScore = least(stopwordRatio(text, EnStopwords) * 5.0, lit(1.0))
    (lenScore + punctScore + stopScore) / 3.0
  }

  /** Language-ID stopword profiles (tiny n-gram/stopword heuristic).
    * Each language is scored by whole-word hits of its marker words; argmax
    * wins, ties broken by profile order. Works on any engine (pure counts).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "nicht", "ist"),
    "es" -> Seq("el", "la", "que", "los", "con"),
    "fr" -> Seq("le", "la", "et", "les", "dans"),
    "zh" -> Seq("de5", "shi4", "zai4", "le5", "he2")
  )

  /** Per-language hit counts as named columns. */
  def langScores(text: Column): Seq[(String, Column)] =
    LangProfiles.map { case (lang, words) =>
      lang -> words.map(w => wordOccurrences(text, w)).reduce(_ + _)
    }

  /** Heuristic language ID: argmax of profile hits; "und" when all zero.
    * First profile in `LangProfiles` wins ties (deterministic).
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Stable 128-bit content fingerprint (hex) over normalized text:
    * lowercase, collapse whitespace. Used for exact dedup at scale —
    * hash-groupBy on the fingerprint instead of the full text avoids
    * shuffling document bodies.
    */
  def fingerprint(text: Column): Column =
    md5(normalizeText(text))

  /** Normalization used by exact dedup: lowercase + whitespace collapse. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Modulus for the rolling polynomial hash — prime, small enough that
    * `acc * 31 + c` never overflows a signed 64-bit intermediate.
    */
  val RollingHashMod: Long = 1000000007L

  /** Rolling polynomial hash (base 31, mod 1e9+7) of the normalized text —
    * the reference-style "document fingerprint (rolling hash)". Implemented
    * with `aggregate` over the char codes so it is still a native Catalyst
    * expression (no UDF); modular so the value is portable to engines with
    * checked 64-bit arithmetic.
    */
  def rollingHash(text: Column): Column =
    rollingHashRaw(normalizeText(text))

  /** Rolling polynomial hash of the column AS-IS (no normalization) — the
    * SQL-portable hash family used by the oracle-verifiable dedup paths
    * (tokens/shingles are already normalized by construction).
    */
  def rollingHashRaw(text: Column): Column = {
    val codes = transform(split(text, ""), ch => ascii(ch).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => pmod(acc * 31L + c, lit(RollingHashMod)))
  }

  /** Portable 60-bit hash: the first 15 hex chars of md5, parsed as an
    * integer. md5 is a NATIVE codegen'd expression in Spark and a native
    * function in DuckDB (`('0x' || substring(md5(s), 1, 15))::BIGINT`), so
    * oracle SQL can recompute it exactly — unlike xxhash64 — while staying
    * ~100× faster than an interpreted higher-order-function char fold.
    * 15 hex chars = 60 bits: always positive, and h % 1e9+7 leaves room
    * for overflow-free universal hashing (a·h' + b < 2^62).
    */
  def md5Hash60(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")

  /** Hex chars 16-30 of the md5: a second, independent 60-bit word
    * (used by the verifiable SimHash for bits 32-63).
    */
  def md5Hash60b(text: Column): Column =
    conv(substring(md5(text), 16, 15), 16, 10).cast("long")

  /** Word n-gram shingles: array of space-joined n-word windows.
    * `shingles("a b c d", 3) = ["a b c", "b c d"]`. Core input to MinHash /
    * Jaccard dedup.
    */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  /** [[shingles]] over an already-materialized token array. Pass a column
    * ALIAS (not an inline `tokens(text)` expression) when the token array
    * is consumed more than once — an inline array re-evaluates per read
    * (the CollapseProject hazard, SCALE.md round-7).
    */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    // sequence(1, 0) would count DOWN — short texts need the empty array.
    when(count >= 1,
      transform(sequence(lit(1), count), i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** 64-bit shingle identities without materializing shingle STRINGS:
    * hash each token once, then combine n consecutive token hashes with a
    * multi-argument xxhash64 — O(1) per shingle instead of the O(n) array
    * slice + string concat of `shingles`. Same distinctness structure
    * (modulo 64-bit collisions), ~4× cheaper on shingling-bound corpora;
    * the set operators (Jaccard, MinHash) only need identity, not text.
    */
  def shingleHashes(text: Column, n: Int): Column = {
    val tokHashes = transform(tokens(text), t => xxhash64(t))
    val count = size(tokHashes) - (n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count),
        i => xxhash64((0 until n).map(k => element_at(tokHashes, i + k)): _*)))
      .otherwise(array().cast("array<bigint>"))
  }

  // --------------------------------------------------------- vocabulary

  /** Corpus-wide token vocabulary: one explode + one partially-aggregated
    * count per distinct token — the foundation pass for vocabulary
    * building, stopword discovery, and frequency-based filters. Returns
    * (token, n_occurrences, n_docs). Skew-free: hot tokens collapse in
    * map-side combine; nothing windows over the token key.
    */
  def vocabulary(docs: org.apache.spark.sql.DataFrame,
                 textCol: String = "text",
                 idCol: String = "doc_id"): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("id")).as("n_docs"))

  // --------------------------------------------------------------- URLs

  /** Canonical URL for URL-keyed dedup (the CCNet/FineWeb "same page,
    * different link" collapse): lowercase scheme+host, strip a leading
    * `www.`, drop the fragment, default ports, tracking query params
    * (`utm_*`, `fbclid`, `gclid`), an emptied `?`, and a trailing slash
    * on a non-root path. Pure regexp `Column` pipeline — codegen'd,
    * linear at any corpus size.
    */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase only scheme://host[:port] (the path/query stay case-exact)
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]*//[^/?]*)", 1)),
      regexp_replace(noFrag, "^[^/]*//[^/?]*", ""))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/:?]*):443(?=[/?]|$)", "$1"),
      "^(http://[^/:?]*):80(?=[/?]|$)", "$1")
    val noTrack = regexp_replace(noPort,
      "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    val cleanAmp = regexp_replace(
      regexp_replace(
        regexp_replace(noTrack, "&&+", "&"), // doubled & from a removed middle param
        "\\?&", "?"),                        // leading & from a removed first param
      "[?&]+$", "")                          // emptied query / trailing separators
    regexp_replace(cleanAmp, "(.)/$", "$1")
  }

  /** Multi-label public suffixes the registered-domain heuristic knows
    * about (the high-traffic subset of the PSL; the full list is data,
    * not code, and would load the same way).
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "co.nz")

  /** Registered domain (eTLD+1) of a URL or bare host: the unit CCNet
    * buckets by and FineWeb caps by. `http://a.b.example.co.uk/x` →
    * `example.co.uk`. Heuristic two-label default with a curated
    * multi-label suffix set — no network, no UDF.
    */
  def registeredDomain(url: Column): Column = {
    val host = lower(regexp_replace(
      regexp_extract(url, "^(?:[^/]*//)?([^/:?#]+)", 1), "^www\\.", ""))
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val threeLabel = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val multi = MultiLabelSuffixes
      .map(s => twoLabel === s)
      .reduce(_ || _)
    when(host.rlike("^[^.]+$"), host) // bare host, no dots
      .otherwise(when(multi && threeLabel =!= "", threeLabel)
        .otherwise(twoLabel))
  }
}
