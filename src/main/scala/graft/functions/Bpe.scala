package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016; the greedy
  * lowest-rank apply of GPT-2's encoder) — real token counts for corpus
  * budgeting instead of the chars/4 heuristic, and subword vocabularies
  * for frequency passes.
  *
  * Shape for 100 TB: training runs DRIVER-SIDE on a deterministic
  * hash-ordered sample (the standard practice — subword vocabularies are
  * always trained on a bounded slice), then the learned merge table rides
  * into a NATIVE Catalyst expression as a reference object and every
  * document is encoded in one linear, whole-stage-codegen'd projection.
  * No shuffle, no UDF boxing, no driver participation in the apply.
  *
  * Word segmentation matches [[TextFunctions.tokens]] (maximal
  * `[a-z0-9_]+` runs over the lowercased text) so BPE counts compose with
  * every other token-grain operator; merges never cross word boundaries
  * (no end-of-word marker, the word-internal variant).
  */
object Bpe {

  /** Deterministic BPE training over a word-frequency dict: `nMerges`
    * iterations, each merging the highest-count adjacent symbol pair, ties
    * to the lexicographically smallest pair. Stops early when no pair
    * repeats.
    */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    // aggregate duplicate words, drop empties, symbols = 1-char strings
    var words: Vector[(Vector[String], Long)] = wordCounts
      .filter(_._1.nonEmpty)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toVector
      .sortBy(_._1) // deterministic iteration order
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < nMerges) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val candidates = pairCounts.filter(_._2 >= 2)
      if (candidates.isEmpty) step = nMerges
      else {
        val best = candidates.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        step += 1
      }
    }
    merges.toSeq
  }

  private def mergePair(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Train on a deterministic sample of the corpus: the `sampleN` docs
    * with the smallest md5-derived hash of `salt||id` (doc-id tie-break) —
    * exactly reproducible, uniform w.r.t. content, bounded driver work.
    */
  def trainOnCorpus(docs: DataFrame, nMerges: Int = 200, sampleN: Int = 512,
                    textCol: String = "text", idCol: String = "doc_id",
                    salt: String = "bpe_"): Seq[(String, String)] = {
    val texts = docs
      .orderBy(TextFunctions.md5Hash60(
          concat(lit(salt), col(idCol).cast("string"))),
        col(idCol))
      .limit(sampleN)
      .select(col(textCol)).collect().map(_.getString(0))
    val counts = mutable.Map.empty[String, Long]
    texts.foreach { t =>
      BpeKernel.scanWords(t).foreach { w =>
        counts.update(w, counts.getOrElse(w, 0L) + 1L)
      }
    }
    train(counts.toSeq, nMerges)
  }

  // ----------------------------------------------- persisted merge artifact

  /** The learned merge table as a persisted store with T2 manifest — the
    * same warm-reuse discipline as [[graft.operators.LmScore]] /
    * AnnIndex/LshIndex: a subword vocabulary is a TRAINING ARTIFACT
    * (tokenization must be stable across pipeline runs, or token budgets
    * and packed sequences silently drift), so it is trained once,
    * committed to disk, and every later run loads the saved ranks
    * without touching the corpus. Layout: one `merges.parquet`
    * (rank, lhs, rhs) plus the manifest carrying the training
    * parameters; any drift (nMerges/sampleN/salt/tag) invalidates and
    * retrains.
    */
  def save(merges: Seq[(String, String)], dir: String,
           params: Map[String, String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    graft.sources.Bundle.deleteRecursively(dir)
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "lhs", "rhs")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges.parquet")
    graft.sources.Bundle.writeManifest(dir,
      params + ("kind" -> "bpe-merges") + ("n" -> merges.size.toString))
  }

  /** The saved merge table, rank-ordered. */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): Seq[(String, String)] = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no bpe-merges manifest at $dir"))
    require(m.get("kind").contains("bpe-merges"),
      s"not a bpe-merges store: $dir")
    spark.read.parquet(s"$dir/merges.parquet")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
  }

  /** Train-or-load: a valid store serves the saved ranks WITHOUT
    * evaluating `docs` (by-name — the corpus lineage is never even
    * constructed on the warm path); parameter drift deletes and
    * retrains. Returns (merges as read back from the store, whether this
    * call trained).
    */
  def ensure(docs: => DataFrame, dir: String, nMerges: Int = 200,
             sampleN: Int = 512, salt: String = "bpe_",
             textCol: String = "text", idCol: String = "doc_id",
             tag: String = ""): (Seq[(String, String)], Boolean) = {
    val spark = org.apache.spark.sql.SparkSession.active
    val params = Map("kind" -> "bpe-merges", "mode" -> "trained",
      "nMerges" -> nMerges.toString, "sampleN" -> sampleN.toString,
      "salt" -> salt, "textCol" -> textCol, "tag" -> tag)
    val saved = graft.sources.Bundle.readManifest(dir)
    if (saved.exists(m => params.forall { case (k, v) => m.get(k).contains(v) }))
      (load(spark, dir), false)
    else {
      val merges = trainOnCorpus(docs, nMerges, sampleN, textCol, idCol, salt)
      save(merges, dir, params)
      (load(spark, dir), true)
    }
  }

  /** Persist-or-load a FIXED merge table (e.g. an oracle-replayable
    * chain table): the manifest carries the table's own content hash, so
    * the queries that consume it genuinely read the ARTIFACT — a
    * corrupted or stale store changes their results and fails the
    * oracle gate.
    */
  def ensureTable(merges: Seq[(String, String)], dir: String,
                  tag: String = ""): Seq[(String, String)] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val content = java.security.MessageDigest.getInstance("MD5")
      .digest(merges.map(p => p._1 + "\u0001" + p._2)
        .mkString("\u0002").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val params = Map("kind" -> "bpe-merges", "mode" -> "fixed",
      "content" -> content, "tag" -> tag)
    val saved = graft.sources.Bundle.readManifest(dir)
    if (!saved.exists(m => params.forall { case (k, v) => m.get(k).contains(v) }))
      save(merges, dir, params)
    load(spark, dir)
  }

  /** BPE pieces of every word in the text, concatenated document-order:
    * `array<string>`. Codegen'd native expression.
    */
  def bpePieces(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_pieces", text,
      typedLit(merges.map(p => Seq(p._1, p._2))))

  /** Number of BPE pieces in the text — the real token count. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_count", text,
      typedLit(merges.map(p => Seq(p._1, p._2))))

  /** Rebuild the merge list from the foldable array<array<string>> literal
    * the Column wrappers pass (GraftExtensions factory hook).
    */
  private[graft] def mergesFromLiteral(e: Expression): Seq[(String, String)] = {
    require(e.foldable, s"BPE merges must be a literal, got $e")
    val ad = e.eval().asInstanceOf[ArrayData]
    (0 until ad.numElements()).map { i =>
      val p = ad.getArray(i)
      require(p.numElements() == 2, "each BPE merge is a [left, right] pair")
      (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }
  }

  /** `graft_bpe_pieces(text, merges)` → array<string>. */
  final case class BpePiecesExpr(child: Expression,
                                 merges: Seq[(String, String)])
      extends UnaryExpression with BpeExprBase {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_pieces"

    protected override def nullSafeEval(input: Any): Any =
      kernel.pieces(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = kernelRef(ctx)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pieces($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpePiecesExpr =
      copy(child = newChild)
  }

  /** `graft_bpe_count(text, merges)` → bigint. */
  final case class BpeCountExpr(child: Expression,
                                merges: Seq[(String, String)])
      extends UnaryExpression with BpeExprBase {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_count"

    protected override def nullSafeEval(input: Any): Any =
      kernel.count(input.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = kernelRef(ctx)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
      copy(child = newChild)
  }

  trait BpeExprBase { self: UnaryExpression =>
    def merges: Seq[(String, String)]
    @transient protected lazy val kernel: BpeKernel = new BpeKernel(merges)
    protected def kernelRef(ctx: CodegenContext): String =
      ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${child.dataType}")
  }
}

/** The per-row BPE kernel: merge ranks in a hash map, greedy lowest-rank
  * apply (GPT-2 `bpe()`), word results memoized in a bounded concurrent
  * cache (documents repeat words heavily; executor threads share the
  * reference object).
  */
final class BpeKernel(mergeList: Seq[(String, String)]) extends Serializable {
  import BpeKernel._

  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](mergeList.size * 2)
    mergeList.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + Sep + b, Integer.valueOf(i))
    }
    m
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 16

  def encodeWord(word: String): Array[String] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    var parts: Array[String] = word.map(_.toString).toArray
    var done = parts.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(parts(i) + Sep + parts(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = i
        }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val a = parts(bestIdx); val b = parts(bestIdx + 1)
        val out = new mutable.ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
            out += a + b; j += 2
          } else { out += parts(j); j += 1 }
        }
        parts = out.toArray
        if (parts.length < 2) done = true
      }
    }
    if (cache.size < CacheCap) cache.put(word, parts)
    parts
  }

  def pieces(text: UTF8String): GenericArrayData = {
    val out = mutable.ArrayBuffer.empty[Any]
    scanWords(text.toString).foreach { w =>
      encodeWord(w).foreach(p => out += UTF8String.fromString(p))
    }
    new GenericArrayData(out.toArray)
  }

  def count(text: UTF8String): Long = {
    var n = 0L
    scanWords(text.toString).foreach(w => n += encodeWord(w).length)
    n
  }
}

object BpeKernel {
  /** Merge-rank key separator — NUL can't appear inside a word (the word
    * scanner only emits [a-z0-9_]), so `a + Sep + b` is collision-free.
    * Written as the escape so the source file stays text to git/grep/diff
    * (a literal NUL byte makes the whole file binary to standard tooling).
    */
  private[functions] val Sep = "\u0000"

  /** Word scanner matching `regexp_extract_all(lower(text), '[a-z0-9_]+')`
    * for ASCII input: maximal runs of lowercased letters/digits/underscore.
    */
  def scanWords(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_')
        sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toSeq
  }
}
