package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-with-unit string parsing/formatting.
  *
  * Reference semantics: trx/utils/string.py:15-47 (`strToTime`, `timeToStr`),
  * trx/id9.py:62-67 (`'off'` → -10.0 sentinel), trx/utils/string.py:9-13
  * (`getDelayFromString`). Re-expressed as pure Catalyst `Column` math
  * (regexp + `when` chains) so it stays inside whole-stage codegen — no UDFs.
  */
object TimeFunctions {

  /** Delay sentinel used for laser-off shots (trx/id9.py:66). */
  val OffSentinel: Double = -10.0

  /** SI prefixes accepted by the reference parser (trx/utils/string.py:18-24). */
  val unitFactors: Seq[(String, Double)] = Seq(
    "fs" -> 1e-15,
    "ps" -> 1e-12,
    "ns" -> 1e-9,
    "us" -> 1e-6,
    "ms" -> 1e-3,
    "s"  -> 1.0
  )

  /** `"100ps" → 1e-10`, `"off" → -10.0`, unparseable → null.
    * Mirrors trx/utils/string.py:15-27 + the id9 off-sentinel wrapper.
    */
  def strToTime(c: Column): Column = {
    val trimmed = lower(trim(c))
    val num  = regexp_extract(trimmed, "^([+-]?[0-9]*\\.?[0-9]+(?:e[+-]?[0-9]+)?)", 1)
    val unit = regexp_extract(trimmed, "([a-z]+)$", 1)
    // Factor via ONE literal-map lookup: a `when(unit === u, f)` chain
    // re-evaluates the `unit` regexp (and the whole lower/trim input chain
    // under it) once per branch — Catalyst's subexpression elimination does
    // not hoist across conditional CaseWhen branches. try_element_at
    // references `unit` exactly once and is null (not an ANSI error) for an
    // unknown unit, matching the old chain's fall-through.
    val factorMap = typedLit(
      (unitFactors :+ ("" -> 1.0)).toMap)
    val factor = try_element_at(factorMap, unit)
    // ANSI-safe: an unmatched number regexp yields "" → null, not an error.
    when(trimmed === "off", lit(OffSentinel))
      .otherwise(when(num =!= "", num.cast("double")) * factor)
  }

  /** Seconds → `"+100.00ps"`-style engineering string (trx/utils/string.py:29-47).
    * Two fixed decimals (deterministic formatting; the reference uses printf
    * `%+.*f`). Zero maps to `"+0.00s"`; sign always present.
    */
  def timeToStr(c: Column): Column = {
    val a = abs(c)
    // Pick the largest unit whose factor is <= |t| (below 1 fs: fs).
    // foldLeft makes the LAST element the outermost `when`, so folding in
    // ascending factor order checks "s" first, then "ms", … — largest wins.
    val unitName = unitFactors.foldLeft(lit("fs")) { case (acc, (u, f)) =>
      when(a >= f, u).otherwise(acc)
    }
    val unitFac = unitFactors.foldLeft(lit(1e-15)) { case (acc, (u, f)) =>
      when(a >= f, f).otherwise(acc)
    }
    val mantissa = c / unitFac
    val body = concat(
      when(c >= 0, "+").otherwise(""),
      // cast through decimal(20,2) for deterministic 2-decimal rendering
      mantissa.cast("decimal(20,2)").cast("string"),
      unitName)
    when(c === 0.0, lit("+0.00s")).otherwise(body)
  }

  /** JVM-side twin of `timeToStr` for driver-side file naming (K4/K5). */
  def timeToStrScala(v: Double): String = {
    if (v == 0.0) return "+0.00s"
    val a = math.abs(v)
    val (u, f) = unitFactors.reverse.find { case (_, f) => a >= f }
      .getOrElse(("fs", 1e-15))
    f"${v / f}%+.2f$u"
  }

  /** Extract the `_<delay>` token from a filename (trx/utils/string.py:9-13):
    * last `_`-separated token that parses as a time-with-unit, e.g.
    * `run3_+100ps_0001.edf` → `"+100ps"`.
    */
  def delayTokenFromFilename(c: Column): Column =
    regexp_extract(c, "_([+-]?[0-9]*\\.?[0-9]+(?:e[+-]?[0-9]+)?[a-z]+)[_.]", 1)

  /** Filename sans directories (trx/utils/files.py:23-25).
    * `substring_index` instead of regex `split` — no pattern engine in the
    * per-file hot path, and a flat codegen expression.
    */
  def basename(c: Column): Column =
    substring_index(c, "/", -1)

  /** Strip a trailing `.gz` then the extension (trx/utils/files.py:27-29).
    * Non-regex formulation (reverse + instr + substr), ~2× faster per row
    * than the regexp_replace pair and cheaper to codegen. Matches the regex
    * semantics `\.gz$` then `\.[^./]+$`: the extension is stripped only if
    * at least one char follows the last dot and no '/' appears after it.
    */
  def removeExtension(c: Column): Column = {
    val noGz = when(c.endsWith(".gz"), c.substr(lit(1), length(c) - 3))
      .otherwise(c)
    val rev = reverse(noGz)
    val dotPos = instr(rev, ".")   // 1-based distance of the LAST dot from the end; 0 = none
    val slashPos = instr(rev, "/") // 0 = none
    val strip = dotPos > 1 && (slashPos === 0 || slashPos > dotPos)
    when(strip, noGz.substr(lit(1), length(noGz) - dotPos)).otherwise(noGz)
  }

  /** Parse-or-null float (trx/id9.py:20-25 `_conv`: parse-or-NaN; we use
    * null, which Spark aggregates skip exactly like NumPy nan-aggs).
    * Regexp-guarded so it is ANSI-mode-safe (TRY_CAST semantics).
    */
  def safeFloat(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      s.cast("double"))
  }

  /** `round(delay, 12)` canonicalization so float delays become groupable
    * keys (trx/id9.py:55, trx/cell.py:55).
    */
  def canonicalDelay(c: Column): Column = round(c, 12)
}
