package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}
import graft.multimodal.{Codecs, Multimodal}
import graft.operators.{AnnIndex, Chunking, Classifier, Clusters, Dedup, Drift, Expectations, Importance, Layout, LmScore, LshIndex, Packing, Positional, Quality, Retrieval, Sampling, Similarity, Sketches, Snapshot}
import graft.operators.Checkpoints.EagerOps
import QueryUtil._
import Tables._

/** Training-data-pipeline queries over the `documents` and `embeddings`
  * tables: text analysis, exact/near deduplication, similarity search,
  * multimodal plumbing. Queries whose kernels have no DuckDB equivalent
  * (xxhash64-based MinHash/SimHash, the stub media decoder) carry no oracle
  * and get the driver's rows-only check.
  */
object CorpusQueries {

  /** DuckDB SQL for TextFunctions.wordOccurrences(p, w) where `p` is the
    * space-padded lowercase text: non-overlapping literal count via
    * length-difference.
    */
  private def occSql(p: String, w: String): String =
    s"((len($p) - len(replace($p, ' $w ', ''))) / ${w.length + 2})::BIGINT"

  private val padded = "' ' || lower(text) || ' '"

  /** Temp-dir suffix for persisted-state queries (q97/q105/q106): the sf
    * dir plus each source table's parquet mtime. The ensure idioms pin
    * REQUEST parameters, not corpus content — keying the directory by the
    * data's timestamp makes a regenerated testdata set (same path, new
    * bytes — it happens between driver rounds) land in a fresh directory
    * instead of silently serving state trained on the old corpus.
    */
  /** The q81 kNN-graph replay as CTEs ending in `ranked` (signatures at
    * both hyperplane tables, the hot-bucket star cap at 4096, exact
    * cosine, per-id ranking) — shared by q81 and the q127 label-
    * propagation oracle, which appends LP rounds on top of the graph.
    */
  private lazy val knnGraphOracleCtes: String = {
    def sigExpr(t: Int) = (0 until 6).map { j =>
      val h = VectorFunctions.hyperplane(t * 6 + j, 64)
      s"CASE WHEN list_dot_product(v, [${h.mkString(", ")}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    |sig AS (
    |  SELECT vec_id, 0 AS t, ${sigExpr(0)} AS bucket FROM e
    |  UNION ALL
    |  SELECT vec_id, 1 AS t, ${sigExpr(1)} AS bucket FROM e),
    |bstats AS (
    |  SELECT t, bucket, count(*) AS bsz, min(vec_id) AS bmin
    |  FROM sig GROUP BY t, bucket),
    |cand AS (
    |  SELECT DISTINCT id, nb FROM (
    |    SELECT a.vec_id AS id, b.vec_id AS nb
    |    FROM sig a JOIN sig b ON a.t = b.t AND a.bucket = b.bucket
    |     AND a.vec_id <> b.vec_id
    |    JOIN bstats st ON st.t = a.t AND st.bucket = a.bucket
    |     AND st.bsz <= 4096
    |    UNION ALL
    |    SELECT s.vec_id AS id, st.bmin AS nb
    |    FROM sig s JOIN bstats st ON st.t = s.t AND st.bucket = s.bucket
    |     AND st.bsz > 4096 AND s.vec_id <> st.bmin
    |    UNION ALL
    |    SELECT st.bmin AS id, s.vec_id AS nb
    |    FROM sig s JOIN bstats st ON st.t = s.t AND st.bucket = s.bucket
    |     AND st.bsz > 4096 AND s.vec_id <> st.bmin)),
    |scored AS (
    |  SELECT c.id, c.nb,
    |    list_dot_product(ea.v, eb.v) /
    |      greatest(sqrt(list_dot_product(ea.v, ea.v))
    |               * sqrt(list_dot_product(eb.v, eb.v)), 1e-300) AS cos
    |  FROM cand c JOIN e ea ON ea.vec_id = c.id
    |              JOIN e eb ON eb.vec_id = c.nb),
    |ranked AS (
    |  SELECT id, nb, cos,
    |    row_number() OVER (PARTITION BY id ORDER BY cos DESC, nb) AS rank
    |  FROM scored)""".stripMargin
  }

  /** DuckDB bit-interleave of two quantized cells (Layout.zValue's SQL
    * twin): x on even bits, y on odd.
    */
  private def zInterleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** n-column Morton interleave, mirroring [[Layout.zValueN]]: column j
    * takes bit positions j, j+n, j+2n, ….
    */
  private def zInterleaveNSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex }
      yield s"((($c >> $i) & 1) << ${i * n + j})").mkString(" | ")
  }

  /** The data-stamped written Z-order layout + saved skipping index over
    * (doc_id, n_tok, q) — built once per testdata generation, shared by
    * q147 (explicit prunedScan) and q153 (the graft-zorder read path).
    */
  private def ensureZorderStore(s: org.apache.spark.sql.SparkSession,
                                dir: String): String = {
    val store = System.getProperty("java.io.tmpdir") +
      s"/graft_zstore_${dataStamp(dir, "documents")}"
    val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
      s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(store, "_SUCCESS"))) {
      val docs = table(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tok"),
        round(TextFunctions.qualityScore(col("text")), 6).as("q"))
      Layout.zorderWrite(base,
        Layout.zValue(
          Layout.quantize(col("n_tok").cast("double"), 0.0, 128.0, 8),
          Layout.quantize(col("q"), 0.0, 1.0, 8), 8),
        col("doc_id"), nFiles = 16, path = store)
      // the transaction-log step: footer walk once at write time,
      // every later scan prunes from the saved table
      Layout.saveStats(s, store, Seq("n_tok", "q"))
    }
    store
  }

  /** The (n_tok, q) box selection derived directly from documents — the
    * shared oracle for every read path over the written Z-order layout
    * (q147 explicit prunedScan, q153 graft-zorder source): a
    * wrongly-skipped file (lost rows) or a stale store hash-mismatches.
    */
  private def zorderBoxOracle: String =
    s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
      |            FROM documents),
      |qd AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
      |      AS n_tok,
      |    round((
      |      least(len(text) / 500.0, 1.0)
      |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
      |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
      |      + least((($stopHitsSql)
      |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
      |              1.0)
      |    ) / 3.0, 6) AS q
      |  FROM d)
      |SELECT doc_id, n_tok, q FROM qd
      |WHERE n_tok BETWEEN 30 AND 60 AND q BETWEEN 0.55 AND 0.75
      |ORDER BY doc_id""".stripMargin

  /** The fixed oracle-replayable BPE chain table, served THROUGH the
    * persisted merge store (Bpe.ensureTable, data-stamped dir): every
    * BPE query consumes the artifact as read back from disk, so a
    * store-layer bug (torn write, rank reorder, stale content) changes
    * their results and fails the oracle gate.
    */
  private def bpeMergeTable(s: org.apache.spark.sql.SparkSession,
                            dir: String): Seq[(String, String)] =
    graft.functions.Bpe.ensureTable(
      Seq(("t", "h"), ("th", "e"), ("i", "n"), ("in", "g")),
      System.getProperty("java.io.tmpdir") +
        s"/graft_bpe_${dataStamp(dir, "documents")}",
      tag = "fixed-chain-q89")

  private def dataStamp(dir: String, tables: String*): String =
    (dir.replaceAll("[^A-Za-z0-9]", "_") +: tables.map(t =>
      (graft.sources.Bundle.mtimeMillis(s"$dir/$t.parquet") / 1000).toString))
      .mkString("_")

  private def stopHitsSql: String =
    TextFunctions.EnStopwords.map(w => occSql("p", w)).mkString(" + ")

  /** The boilerplate page q84 clones onto a third of the corpus (no SQL
    * metacharacters — it is inlined into the DuckDB oracle verbatim).
    */
  private val CloneText =
    "terms of service copyright all rights reserved please enable " +
      "javascript to continue reading this page"

  /** DuckDB replay of [[Dedup.minhashLshPairs]] in verifiable mode over an
    * arbitrary (doc_id, text) corpus query: rolling-hash shingles →
    * universal-hash signature minima → band keys → candidate pairs with
    * the hot-bucket star cap (buckets over `maxBucketSize` pair members
    * with the bucket min only) → estimated-Jaccard verification.
    */
  /** The shared signature/band replay: rolling-hash shingles →
    * universal-hash minima (`sig`) → plain-text band keys (`bands`) over
    * an arbitrary (doc_id, text) corpus query.
    */
  private def minhashSigBandsCtes(corpusSql: String): String = {
    val p = VectorFunctions.MinhashPrime
    val mins = (0 until 32).map { i =>
      val (a, b) = VectorFunctions.minhashCoeffs(i)
      s"min((h * $a + $b) % $p) AS m$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until 8).map { bnd =>
      val cols = (0 until 4).map(r => s"m${bnd * 4 + r}::VARCHAR")
        .mkString(" || ',' || ")
      s"SELECT doc_id, '${bnd}_' || $cols AS bk FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""corpus AS ($corpusSql),
      |tok AS (
      |  SELECT doc_id, u.p AS p, u.h AS h FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
      |        (x, i) -> {'p': i,
      |                   'h': ('0x' || substring(md5(x), 1, 15))::BIGINT % 1000000007})) AS u
      |    FROM corpus)),
      |led AS (
      |  SELECT doc_id, h AS h1,
      |         lead(h, 1) OVER (PARTITION BY doc_id ORDER BY p) AS h2,
      |         lead(h, 2) OVER (PARTITION BY doc_id ORDER BY p) AS h3
      |  FROM tok),
      |hashed AS (
      |  SELECT DISTINCT doc_id,
      |         (((h1 * 1000003 + h2) % 1000000007) * 1000003 + h3) % 1000000007 AS h
      |  FROM led WHERE h3 IS NOT NULL),
      |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
      |bands AS ($bandSelects)""".stripMargin
  }

  private def minhashAgreeSql: String = (0 until 32)
    .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
    .mkString(" + ")

  private def minhashLshOracle(corpusSql: String, threshold: Double,
                               maxBucketSize: Int): String =
    s"""WITH ${minhashSigBandsCtes(corpusSql)},
      |bstats AS (SELECT bk, count(*) AS bsz, min(doc_id) AS bmin
      |           FROM bands GROUP BY bk),
      |pairs AS (
      |  SELECT DISTINCT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |    FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
      |    JOIN bstats st ON st.bk = a.bk AND st.bsz <= $maxBucketSize
      |    UNION ALL
      |    SELECT st.bmin AS id_a, b.doc_id AS id_b
      |    FROM bands b JOIN bstats st
      |      ON st.bk = b.bk AND st.bsz > $maxBucketSize AND st.bmin < b.doc_id)),
      |est AS (
      |  SELECT id_a, id_b, ($minhashAgreeSql) / 32.0 AS est_jaccard
      |  FROM pairs JOIN sig sa ON id_a = sa.doc_id JOIN sig sb ON id_b = sb.doc_id)
      |SELECT id_a, id_b, est_jaccard FROM est
      |WHERE est_jaccard >= $threshold ORDER BY id_a, id_b""".stripMargin

  /** q118's oracle: the serve-mode replay — index-side bands get the
    * build-time star cap (over-cap buckets keep min-id only), the query
    * side's band keys join against the capped set, distinct candidates
    * verify by estimated Jaccard. Signatures depend only on the document
    * itself, so computing them over the whole corpus and filtering by
    * the split predicates replays the engine's split-then-hash exactly.
    */
  private def minhashLshServeOracle(ixWhere: String, qWhere: String,
                                    threshold: Double,
                                    maxBucketSize: Int): String =
    s"""WITH ${minhashSigBandsCtes("SELECT doc_id, text FROM documents")},
      |ixb AS (SELECT * FROM bands WHERE $ixWhere),
      |bstats AS (SELECT bk, count(*) AS bsz, min(doc_id) AS bmin
      |           FROM ixb GROUP BY bk),
      |joinable AS (
      |  SELECT i.bk, i.doc_id FROM ixb i JOIN bstats st ON st.bk = i.bk
      |  WHERE st.bsz <= $maxBucketSize OR i.doc_id = st.bmin),
      |qb AS (SELECT * FROM bands WHERE $qWhere),
      |pairs AS (
      |  SELECT DISTINCT q.doc_id AS query_id, j.doc_id AS id
      |  FROM qb q JOIN joinable j ON j.bk = q.bk),
      |est AS (
      |  SELECT query_id, id, ($minhashAgreeSql) / 32.0 AS est_jaccard
      |  FROM pairs JOIN sig sa ON query_id = sa.doc_id
      |             JOIN sig sb ON id = sb.doc_id)
      |SELECT query_id, id, est_jaccard FROM est
      |WHERE est_jaccard >= $threshold ORDER BY query_id, id""".stripMargin

  /** q79's DuckDB replay of iters=0 IVF-ADC over `embeddings` — shared
    * with q85: serving from a persisted index must be bit-identical to
    * the live train+encode+search path.
    */
  /** Shared BM25 oracle (q86 live / q97 served-from-index): rebuilds
    * postings, df, doc length, and avgdl from the table and replays the
    * exact scoring arithmetic — per-term scores rounded to 6 dp,
    * DECIMAL-summed, ranked by the exact decimal with doc-id tie-break.
    */
  private lazy val bm25OracleSql: String =
    """WITH dl AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS dl
      |  FROM documents),
      |stats AS (
      |  SELECT count(*)::BIGINT AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
      |q(query_id, token) AS (VALUES
      |  (0, 'spark'), (0, 'shuffle'), (0, 'hash'), (0, 'join'),
      |  (1, 'customer'), (1, 'order'), (1, 'query'),
      |  (2, 'vector'), (2, 'window'), (2, 'scan')),
      |tf AS (
      |  SELECT doc_id, token, count(*)::BIGINT AS tf FROM (
      |    SELECT doc_id,
      |      unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
      |    FROM documents)
      |  WHERE token IN (SELECT token FROM q) GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    round(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5)) *
      |      (tf.tf * 2.2) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)),
      |      6) AS sc
      |  FROM q JOIN tf ON tf.token = q.token
      |         JOIN dfreq d ON d.token = q.token
      |         JOIN dl ON dl.doc_id = tf.doc_id
      |         CROSS JOIN stats st),
      |agg AS (
      |  SELECT query_id, doc_id, sum(sc::DECIMAL(28,6)) AS sdec
      |  FROM scored GROUP BY 1, 2),
      |ranked AS (
      |  SELECT query_id, doc_id, sdec,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sdec DESC, doc_id)
      |      AS rank
      |  FROM agg)
      |SELECT query_id, rank, doc_id, round(sdec::DOUBLE, 6) AS score
      |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private lazy val ivfAdcOracleSql: String = {
        def dists(mExpr: String) =
          s"""list_transform(generate_series(1, 16), k ->
          |      list_reduce(list_transform(generate_series(1, 8), i ->
          |        (e.v[$mExpr*8 + i] - cb[$mExpr+1][k][i]) * (e.v[$mExpr*8 + i] - cb[$mExpr+1][k][i])),
          |        (a, b) -> a + b))""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |samp AS (
        |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn
        |  FROM e ORDER BY vec_id LIMIT 4096),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM samp),
        |ivfc AS (
        |  SELECT (samp.rn // st.step)::BIGINT AS cell, samp.v AS cv
        |  FROM samp, st WHERE samp.rn % st.step = 0 AND samp.rn // st.step < 16),
        |cbsub AS (
        |  SELECT ms.m, (c.rn // st.step) AS k0,
        |         list_transform(generate_series(1, 8), i -> c.v[ms.m*8 + i]) AS cvec
        |  FROM samp c, st, (SELECT unnest(generate_series(0, 7)) AS m) ms
        |  WHERE c.rn % st.step = 0 AND c.rn // st.step < 16),
        |cbl AS (
        |  SELECT list(kl ORDER BY m) AS cb FROM (
        |    SELECT m, list(cvec ORDER BY k0) AS kl FROM cbsub GROUP BY m)),
        |cosc AS (
        |  SELECT e.vec_id, i.cell,
        |    round(list_dot_product(e.v, i.cv) /
        |      greatest(sqrt(list_dot_product(e.v, e.v))
        |               * sqrt(list_dot_product(i.cv, i.cv)), 1e-300), 6) AS cosr
        |  FROM e, ivfc i),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cosr DESC, cell) AS rnk
        |    FROM cosc) WHERE rnk = 1),
        |codes AS (
        |  SELECT e.vec_id AS id,
        |    list_transform(generate_series(0, 7), m ->
        |      list_position(${dists("m")}, list_min(${dists("m")})) - 1) AS codes
        |  FROM e, cbl),
        |qprobe AS (
        |  SELECT vec_id AS qid, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cosr DESC, cell) AS rnk
        |    FROM cosc WHERE vec_id < 4) WHERE rnk <= 4),
        |q AS (SELECT vec_id AS qid, v FROM e WHERE vec_id < 4),
        |cand AS (
        |  SELECT qp.qid, a.vec_id AS id
        |  FROM qprobe qp JOIN asg a ON a.cell = qp.cell),
        |scored AS (
        |  SELECT q.qid, c.id,
        |    round(list_reduce(list_transform(generate_series(0, 7), m ->
        |      list_reduce(list_transform(generate_series(1, 8), i ->
        |        (q.v[m*8 + i] - cb[m+1][c.codes[m+1]+1][i])
        |          * (q.v[m*8 + i] - cb[m+1][c.codes[m+1]+1][i])),
        |        (a, b) -> a + b)),
        |      (a, b) -> a + b), 6) AS dist
        |  FROM q JOIN cand ON cand.qid = q.qid
        |  JOIN codes c ON c.id = cand.id, cbl),
        |ranked AS (
        |  SELECT qid AS query_id, id, dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, id, dist FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
      }

  val defs: Seq[QueryDef] = Seq(

    // Text analysis: token counts, punctuation ratio, quality score.
    QueryDef("q33_text_stats",
      (s, dir) =>
        table(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tok"),
          TextFunctions.approxBpeTokenCount(col("text")).as("n_bpe"),
          r6(TextFunctions.punctRatio(col("text"))).as("punct_r"),
          r6(TextFunctions.qualityScore(col("text"))).as("quality"))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, text, $padded AS p FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tok,
        |  ceil(len(regexp_replace(text, '\\s+', '', 'g')) / 4.0)::BIGINT AS n_bpe,
        |  round(len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |        / greatest(len(text), 1)::DOUBLE, 6) AS punct_r,
        |  round((
        |    least(len(text) / 500.0, 1.0)
        |    + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |               / greatest(len(text), 1)::DOUBLE) * 5.0)
        |    + least((($stopHitsSql)
        |             / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |            1.0)
        |  ) / 3.0, 6) AS quality
        |FROM d ORDER BY doc_id""".stripMargin)),

    // Heuristic language ID (stopword-profile argmax).
    QueryDef("q34_lang_id",
      (s, dir) =>
        table(s, dir, "documents")
          .select(TextFunctions.langId(col("text")).as("lang_id"))
          .groupBy(col("lang_id")).agg(count(lit(1)).as("n"))
          .orderBy("lang_id"),
      Some {
        val scoreDefs = TextFunctions.LangProfiles.map { case (lang, words) =>
          s"(${words.map(w => occSql("p", w)).mkString(" + ")}) AS s_$lang"
        }.mkString(",\n  ")
        val langs = TextFunctions.LangProfiles.map(_._1)
        val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
        val pick = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'")
          .mkString("\n    ", "\n    ", "\n    ELSE 'und' END")
        s"""WITH d AS (SELECT $padded AS p FROM documents),
          |scores AS (SELECT
          |  $scoreDefs
          |FROM d),
          |scored AS (SELECT *, $best AS best FROM scores),
          |picked AS (SELECT CASE $pick AS lang_id FROM scored)
          |SELECT lang_id, count(*) AS n FROM picked
          |GROUP BY lang_id ORDER BY lang_id""".stripMargin
      }),

    // Exact dedup via 128-bit content fingerprint.
    QueryDef("q35_dedup_exact",
      (s, dir) =>
        Dedup.exactGroups(table(s, dir, "documents"))
          .select(col("fp"), col("keep_id"), col("n_dups"))
          .orderBy("fp"),
      Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Rolling-hash document fingerprint (base 31, mod 1e9+7).
    QueryDef("q36_rolling_hash",
      (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.rollingHash(col("text")).as("rh"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''),
        |                   x -> ascii(x)::BIGINT),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact n-gram Jaccard near-dup pairs (shingle-join blocking — never
    // the n² cross product).
    QueryDef("q37_ngram_jaccard",
      (s, dir) =>
        Dedup.ngramJaccardPairs(table(s, dir, "documents"), n = 3, threshold = 0.8)
          .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
          .orderBy("id_a", "id_b"),
      Some("""WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
        |    FROM (SELECT doc_id, t,
        |            unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |          FROM toks))),
        |sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       round(inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE, 6) AS jaccard
        |FROM pairs JOIN sized sa ON id_a = sa.doc_id
        |           JOIN sized sb ON id_b = sb.doc_id
        |WHERE inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.8
        |ORDER BY id_a, id_b""".stripMargin)),

    // Brute-force cosine similarity above threshold (exact baseline).
    QueryDef("q38_sim_threshold",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
        e.select(col("vec_id"), col("embedding").as("_cv"))
          .join(broadcast(queries))
          .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
          .filter(round(col("cos"), 6) >= 0.2 && col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id"), r4(col("cos")).as("cos"))
          .orderBy("query_id", "vec_id")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |cos AS (
        |  SELECT query_id, vec_id,
        |         list_dot_product(cv, qv) /
        |           greatest(sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)),
        |                    1e-300) AS cos
        |  FROM c, q)
        |SELECT query_id, vec_id, round(cos, 4) AS cos
        |FROM cos WHERE round(cos, 6) >= 0.2 AND query_id <> vec_id
        |ORDER BY query_id, vec_id""".stripMargin)),

    // Brute-force top-k (exact ANN baseline, W6-style ranking).
    QueryDef("q39_sim_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.bruteForceTopK(e, queries, k = 10)
          .select(col("query_id"), col("vec_id"), r4(col("cos")).as("cos"), col("rank"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |cos AS (
        |  SELECT query_id, vec_id,
        |         list_dot_product(cv, qv) /
        |           greatest(sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)),
        |                    1e-300) AS cos
        |  FROM c, q),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos DESC, vec_id) AS rank
        |  FROM cos)
        |SELECT query_id, vec_id, round(cos, 4) AS cos, rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // Coarse-then-exact top-k through a Johnson–Lindenstrauss random
    // projection (Similarity.projectedTopK): corpus and queries project
    // ONCE to 16 dims (deterministic splitmix64 planes — the reason the
    // oracle can replay the matrix as literal lists), the broadcast
    // compare ranks by PROJECTED cosine at a quarter of the brute pair
    // cost, and only the top-50 candidates re-rank by exact cosine. The
    // oracle interpolates the SAME 16×64 plane matrix the Spark side
    // multiplies by and replays both phases.
    QueryDef("q189_jl_projected_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.projectedTopK(e, queries, k = 10, dim = 64,
            outDim = 16, candidates = 50)
          .select(col("query_id"), col("vec_id"), r4(col("cos")).as("cos"),
            col("rank"))
          .orderBy("query_id", "rank")
      },
      Some {
        val outDim = 16; val dim = 64
        val scale = 1.0 / math.sqrt(outDim.toDouble)
        def projSql(vname: String): String =
          (0 until outDim).map { j =>
            val h = graft.functions.VectorFunctions
              .hyperplane(graft.functions.VectorFunctions.JlPlaneBase + j,
                dim)
            s"list_dot_product($vname, [${h.mkString(", ")}]) " +
              s"* ($scale)::DOUBLE"
          }.mkString("[", ",\n      ", "]")
        def cosSql(a: String, b: String): String =
          s"list_dot_product($a, $b) / greatest(" +
            s"sqrt(list_dot_product($a, $a)) * " +
            s"sqrt(list_dot_product($b, $b)), 1e-300)"
        s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           |           FROM embeddings WHERE vec_id < 5),
           |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
           |qp AS (SELECT query_id, qv, ${projSql("qv")} AS qpv FROM q),
           |cp AS (SELECT vec_id, cv, ${projSql("cv")} AS cpv FROM c),
           |coarse AS (
           |  SELECT query_id, vec_id, cv, qv,
           |    ${cosSql("cpv", "qpv")} AS pcos
           |  FROM cp, qp),
           |cand AS (
           |  SELECT query_id, vec_id, cv, qv,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY pcos DESC, vec_id) AS crn
           |  FROM coarse),
           |ex AS (
           |  SELECT query_id, vec_id, ${cosSql("cv", "qv")} AS cos
           |  FROM cand WHERE crn <= 50),
           |r AS (
           |  SELECT query_id, vec_id, cos,
           |    row_number() OVER (PARTITION BY query_id
           |                       ORDER BY cos DESC, vec_id) AS rank
           |  FROM ex)
           |SELECT query_id, vec_id, round(cos, 4) AS cos, rank
           |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
      }),

    // ANN quality evaluation (Similarity.recallAtK): recall@10 of the
    // single-table LSH path against exact brute-force ground truth, per
    // query — the harness that measures an ANN configuration before it
    // serves a pipeline (the engine ships six ANN variants; this is how
    // their recall/probe trade-offs are tuned on real embeddings). Both
    // report frames are (queries × k)-bounded; the oracle replays the
    // brute ranking, the hyperplane signatures, and the recall join.
    QueryDef("q177_ann_recall",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val truth = Similarity.bruteForceTopK(e, queries, k = 10)
        val approx = Similarity.lshTopK(e, queries, k = 10, dim = 64,
          nBits = 6)
        Similarity.recallAtK(approx, truth, k = 10)
          .orderBy("query_id")
      },
      Some {
        val planes = (0 until 6).map { j =>
          val h = graft.functions.VectorFunctions.hyperplane(j, 64)
          s"[${h.mkString(", ")}]::DOUBLE[]"
        }
        val sigExpr = planes.map(p =>
          s"CASE WHEN list_dot_product(v, $p) >= 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
          |truth AS (
          |  SELECT query_id, vec_id FROM (
          |    SELECT query_id, e.vec_id,
          |      row_number() OVER (PARTITION BY query_id ORDER BY
          |        list_dot_product(e.v, q.qv) /
          |          greatest(sqrt(list_dot_product(e.v, e.v)) *
          |                   sqrt(list_dot_product(q.qv, q.qv)), 1e-300)
          |        DESC, e.vec_id) AS rank
          |    FROM e, q) WHERE rank <= 10),
          |sig AS (SELECT vec_id, v, $sigExpr AS bucket FROM e),
          |qs AS (SELECT s.vec_id AS query_id, s.v AS qv, s.bucket
          |       FROM sig s WHERE s.vec_id < 20),
          |approx AS (
          |  SELECT query_id, vec_id FROM (
          |    SELECT qs.query_id, s.vec_id,
          |      row_number() OVER (PARTITION BY qs.query_id ORDER BY
          |        list_dot_product(s.v, qs.qv) /
          |          greatest(sqrt(list_dot_product(s.v, s.v)) *
          |                   sqrt(list_dot_product(qs.qv, qs.qv)), 1e-300)
          |        DESC, s.vec_id) AS rank
          |    FROM sig s JOIN qs ON s.bucket = qs.bucket) WHERE rank <= 10)
          |SELECT t.query_id, count(*)::BIGINT AS n_truth,
          |  sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
          |    AS n_hit,
          |  round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
          |    / count(*), 6) AS recall
          |FROM truth t LEFT JOIN approx a
          |  ON a.query_id = t.query_id AND a.vec_id = t.vec_id
          |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin
      }),

    // LSH-bucketed ANN: same-signature candidates, exact re-rank.
    QueryDef("q40_sim_lsh",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.lshTopK(e, queries, k = 1, dim = 64, nBits = 6)
          .groupBy(col("query_id"))
          .agg(first(col("vec_id")).as("best_vec"), r4(first(col("cos"))).as("best_cos"))
          .orderBy("query_id")
      },
      Some {
        val planes = (0 until 6).map { j =>
          val h = VectorFunctions.hyperplane(j, 64)
          s"[${h.mkString(", ")}]::DOUBLE[]"
        }
        val sigExpr = planes.map(p =>
          s"CASE WHEN list_dot_product(v, $p) >= 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |sig AS (SELECT vec_id, v, $sigExpr AS bucket FROM e),
          |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sig WHERE vec_id < 5),
          |cand AS (
          |  SELECT q.query_id, s.vec_id,
          |         list_dot_product(s.v, q.qv) /
          |           greatest(sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(q.qv, q.qv)),
          |                    1e-300) AS cos
          |  FROM sig s JOIN q ON s.bucket = q.bucket),
          |ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY query_id
          |                               ORDER BY cos DESC, vec_id) AS rank
          |  FROM cand)
          |SELECT query_id, vec_id AS best_vec, round(cos, 4) AS best_cos
          |FROM ranked WHERE rank = 1 ORDER BY query_id""".stripMargin
      }),

    // Embedding near-duplicate pairs: LSH blocking + cosine verification.
    QueryDef("q41_dedup_embedding",
      (s, dir) =>
        Dedup.embeddingNearDupPairs(table(s, dir, "embeddings"),
            dim = 64, nBits = 8, threshold = 0.3)
          .select(col("id_a"), col("id_b"), r4(col("cos")).as("cos"))
          .orderBy("id_a", "id_b"),
      Some {
        val planes = (0 until 8).map { j =>
          val h = VectorFunctions.hyperplane(j, 64)
          s"[${h.mkString(", ")}]::DOUBLE[]"
        }
        val sigExpr = planes.map(p =>
          s"CASE WHEN list_dot_product(v, $p) >= 0 THEN '1' ELSE '0' END")
          .mkString(" || ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |sig AS (SELECT vec_id, v, $sigExpr AS bucket FROM e),
          |bstats AS (SELECT bucket, count(*) AS bsz, min(vec_id) AS bmin
          |           FROM sig GROUP BY bucket),
          |pairs AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |         list_dot_product(a.v, b.v) /
          |           greatest(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)),
          |                    1e-300) AS cos
          |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          |  JOIN bstats st ON st.bucket = a.bucket AND st.bsz <= 4096
          |  UNION ALL
          |  SELECT m.vec_id AS id_a, b.vec_id AS id_b,
          |         list_dot_product(m.v, b.v) /
          |           greatest(sqrt(list_dot_product(m.v, m.v)) * sqrt(list_dot_product(b.v, b.v)),
          |                    1e-300) AS cos
          |  FROM sig b JOIN bstats st ON st.bucket = b.bucket
          |    AND st.bsz > 4096 AND st.bmin < b.vec_id
          |  JOIN sig m ON m.vec_id = st.bmin)
          |SELECT id_a, id_b, round(cos, 4) AS cos
          |FROM pairs WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin
      }),

    // MinHash+LSH near-dup candidates, in the SQL-verifiable hash family
    // (rolling-hash shingles + universal-hash permutations): the DuckDB
    // oracle recomputes signatures, band keys, estimated Jaccard, AND the
    // hot-bucket star cap from the raw documents. est_jaccard = k/32 is an
    // exact binary double in both engines — emitted unrounded.
    QueryDef("q42_dedup_minhash",
      (s, dir) =>
        Dedup.minhashLshPairs(table(s, dir, "documents"),
            nHashes = 32, nBands = 8, threshold = 0.5, verifiable = true)
          .select(col("id_a"), col("id_b"), col("est_jaccard"))
          .orderBy("id_a", "id_b"),
      Some(minhashLshOracle("SELECT doc_id, text FROM documents",
        threshold = 0.5, maxBucketSize = 4096))),

    // Blocker-quality evaluation (Dedup.pairQuality — the dedup twin of
    // q177's ANN recall harness): the q42 MinHash LSH blocker's emitted
    // pairs scored against EXACT 3-gram Jaccard at the same threshold —
    // precision of the emitted set, recall against the exact qualifying
    // pair universe (the PPJoin blocking is lossless, so the denominator
    // is exact with no all-pairs join). The one-row report is how a
    // pipeline tunes bands/rows before trusting the blocker at corpus
    // scale. The oracle replays the signature bands, the star cap, the
    // estimate threshold, the pair-restricted exact Jaccard, and both
    // ratios.
    QueryDef("q180_blocker_quality",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.pairQuality(
          Dedup.minhashLshPairs(docs, nHashes = 32, nBands = 8,
            threshold = 0.5, verifiable = true),
          docs, threshold = 0.5)
      },
      Some {
        s"""WITH ${minhashSigBandsCtes("SELECT doc_id, text FROM documents")},
          |bstats AS (SELECT bk, count(*) AS bsz, min(doc_id) AS bmin
          |           FROM bands GROUP BY bk),
          |cpairs AS (
          |  SELECT DISTINCT id_a, id_b FROM (
          |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |    FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
          |    JOIN bstats st ON st.bk = a.bk AND st.bsz <= 4096
          |    UNION ALL
          |    SELECT st.bmin AS id_a, b.doc_id AS id_b
          |    FROM bands b JOIN bstats st
          |      ON st.bk = b.bk AND st.bsz > 4096 AND st.bmin < b.doc_id)),
          |cand AS (
          |  SELECT id_a, id_b FROM cpairs
          |  JOIN sig sa ON id_a = sa.doc_id JOIN sig sb ON id_b = sb.doc_id
          |  WHERE ($minhashAgreeSql) / 32.0 >= 0.5),
          |toks AS (
          |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
          |  FROM documents),
          |sh AS (
          |  SELECT DISTINCT doc_id, s FROM (
          |    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
          |    FROM (SELECT doc_id, t,
          |            unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
          |          FROM toks))),
          |sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
          |pint AS (
          |  SELECT c.id_a, c.id_b, count(*) AS inter
          |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
          |              JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
          |  GROUP BY 1, 2),
          |cj AS (
          |  SELECT c.id_a, c.id_b,
          |    coalesce(pint.inter, 0)
          |      / (sa.n_sh + sb.n_sh - coalesce(pint.inter, 0))::DOUBLE AS j
          |  FROM cand c
          |  LEFT JOIN pint ON pint.id_a = c.id_a AND pint.id_b = c.id_b
          |  JOIN sized sa ON c.id_a = sa.doc_id
          |  JOIN sized sb ON c.id_b = sb.doc_id),
          |cstats AS (
          |  SELECT count(*)::BIGINT AS n_candidates,
          |    coalesce(sum(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END), 0)::BIGINT
          |      AS n_true_candidates
          |  FROM cj),
          |tpairs AS (
          |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |truth AS (
          |  SELECT id_a, id_b
          |  FROM tpairs JOIN sized sa ON id_a = sa.doc_id
          |              JOIN sized sb ON id_b = sb.doc_id
          |  WHERE inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.5),
          |tstats AS (
          |  SELECT count(*)::BIGINT AS n_qualifying,
          |    coalesce(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END),
          |             0)::BIGINT AS n_found
          |  FROM truth t LEFT JOIN cand c
          |    ON c.id_a = t.id_a AND c.id_b = t.id_b)
          |SELECT n_candidates, n_true_candidates,
          |  round(CASE WHEN n_candidates > 0
          |    THEN n_true_candidates::DOUBLE / n_candidates END, 6)
          |    AS precision,
          |  n_qualifying, n_found,
          |  round(CASE WHEN n_qualifying > 0
          |    THEN n_found::DOUBLE / n_qualifying END, 6) AS recall
          |FROM cstats, tstats""".stripMargin
      }),

    // The hot-bucket star cap, oracle-EXERCISED: a third of the corpus is
    // rewritten to one boilerplate page (the duplicate-heavy crawl shape),
    // so with maxBucketSize = 32 every band bucket the clones share is
    // over the cap and degrades to min-id star pairs — the engine and the
    // oracle must agree on bucket sizes, the min member, and the star
    // edges. The small-bucket path runs alongside on the remaining docs.
    QueryDef("q84_lsh_hotbucket",
      (s, dir) =>
        Dedup.minhashLshPairs(
            table(s, dir, "documents").select(col("doc_id"),
              when(col("doc_id") % 3 === 0, lit(CloneText))
                .otherwise(col("text")).as("text")),
            nHashes = 32, nBands = 8, threshold = 0.5, verifiable = true,
            maxBucketSize = 32)
          .select(col("id_a"), col("id_b"), col("est_jaccard"))
          .orderBy("id_a", "id_b"),
      Some(minhashLshOracle(
        s"SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN '$CloneText' ELSE text END AS text FROM documents",
        threshold = 0.5, maxBucketSize = 32))),

    // SimHash near-dup candidates, SQL-verifiable hash family; banded
    // blocking is lossless for hamming <= 6 < 8 bands (pigeonhole).
    QueryDef("q43_dedup_simhash",
      (s, dir) =>
        Dedup.simhashPairs(table(s, dir, "documents"),
            nBands = 8, maxHamming = 6, verifiable = true)
          .orderBy("id_a", "id_b"),
      Some {
        s"""WITH tok AS (
          |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t FROM documents),
          |h AS (
          |  SELECT doc_id,
          |         ('0x' || substring(md5(t), 1, 15))::BIGINT AS h1,
          |         ('0x' || substring(md5(t), 16, 15))::BIGINT AS h2 FROM tok),
          |votes AS (
          |  SELECT doc_id, b,
          |         sum(CASE WHEN (((CASE WHEN b < 32 THEN h1 ELSE h2 END)
          |                         >> (CASE WHEN b < 32 THEN b ELSE b - 32 END)) & 1) = 1
          |                  THEN 1 ELSE -1 END) AS vote
          |  FROM h, (SELECT unnest(generate_series(0, 63)) AS b) bits
          |  GROUP BY doc_id, b),
          |sig AS (
          |  SELECT doc_id,
          |         sum(CASE WHEN vote > 0 THEN
          |               CASE WHEN b = 63 THEN (-9223372036854775807 - 1)::BIGINT
          |                    ELSE (1::BIGINT << b) END
          |             ELSE 0 END)::BIGINT AS sh
          |  FROM votes GROUP BY doc_id),
          |bands AS (
          |  SELECT doc_id, sh, band, (sh >> (band * 8)) & 255 AS bucket
          |  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) bs),
          |bstats AS (SELECT band, bucket, count(*) AS bsz, min(doc_id) AS bmin
          |           FROM bands GROUP BY band, bucket),
          |pairs AS (
          |  SELECT DISTINCT id_a, id_b, hamming FROM (
          |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          |           bit_count(xor(a.sh, b.sh))::INT AS hamming
          |    FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
          |                              AND a.doc_id < b.doc_id
          |    JOIN bstats st ON st.band = a.band AND st.bucket = a.bucket
          |      AND st.bsz <= 4096
          |    UNION ALL
          |    SELECT st.bmin AS id_a, b.doc_id AS id_b,
          |           bit_count(xor(m.sh, b.sh))::INT AS hamming
          |    FROM bands b JOIN bstats st ON st.band = b.band AND st.bucket = b.bucket
          |      AND st.bsz > 4096 AND st.bmin < b.doc_id
          |    JOIN sig m ON m.doc_id = st.bmin))
          |SELECT id_a, id_b, hamming FROM pairs
          |WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin
      }),

    // Multimodal: binary payloads + metadata + feature extraction. The
    // stub decoder is a position-salted per-byte hash with exact integer
    // accumulation, so the oracle recomputes it from the text (pure ASCII:
    // byte i == char code i+1 in DuckDB's 1-based indexing).
    QueryDef("q44_multimodal_features",
      (s, dir) => {
        val media = table(s, dir, "documents")
          .select(col("doc_id").as("media_id"),
            col("text").cast("binary").as("payload"))
        val withMeta = Multimodal.withMeta(media, "image")
        Multimodal.extractFeatures(s, withMeta, dim = 8)
          .select(col("media_id"), col("kind"),
            r6(element_at(col("feature"), 1)).as("f0"),
            r6(element_at(col("feature"), 2)).as("f1"))
          .orderBy("media_id")
      },
      Some("""WITH kv AS (
        |  SELECT doc_id,
        |    unnest(list_transform(string_split(text, ''), (ch, i) ->
        |      {'k': (i - 1) % 8,
        |       'v': (((ascii(ch) + 1) * 2654435761 + i * 40503) % 1000000007) & 65535})) AS s
        |  FROM documents),
        |agg AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN s.k = 0 THEN s.v ELSE 0 END) AS s0,
        |    sum(CASE WHEN s.k = 1 THEN s.v ELSE 0 END) AS s1
        |  FROM kv GROUP BY doc_id)
        |SELECT d.doc_id AS media_id, 'image' AS kind,
        |  round(coalesce(a.s0, 0) / 65535.0, 6) AS f0,
        |  round(coalesce(a.s1, 0) / 65535.0, 6) AS f1
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY media_id""".stripMargin)),

    // Near-dup CLUSTER resolution: connected components (smallest-id label
    // propagation) over the exact n-gram Jaccard pairs, singletons
    // included. The oracle walks the same pair list with a recursive CTE —
    // min reachable id == propagation fixpoint.
    QueryDef("q55_dedup_clusters",
      (s, dir) => ccClusterQuery(s, dir, star = false),
      Some(ccOracleSql)),

    // Same transitive-closure semantics, ADVERSARIAL-GRAPH algorithm:
    // alternating large-star/small-star contraction (O(log n) rounds on
    // any shape) must produce byte-identical clusters to label propagation
    // — both hash-checked against the one recursive-CTE oracle.
    QueryDef("q62_star_clusters",
      (s, dir) => ccClusterQuery(s, dir, star = true),
      Some(ccOracleSql)),

    // Token-budget sequence packing: shard = floor(tokens-before / budget)
    // over doc_id order, via the distributed two-phase prefix scan. The
    // oracle's single global window is the semantic spec the distributed
    // form must equal.
    QueryDef("q56_pack_sequences",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
        Packing.packSequences(docs, budget = 2048, bucketWidth = 64)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("shard")
      },
      Some("""WITH d AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, n_tok,
        |         (coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |          // 2048) AS shard
        |  FROM d)
        |SELECT shard, count(*) AS n_docs, sum(n_tok)::BIGINT AS tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM packed GROUP BY shard ORDER BY shard""".stripMargin)),

    // Deterministic stratified sampling: per-language rates via the
    // md5-portable survival hash — the exact same subset on every run and
    // engine (the oracle re-derives membership row by row).
    QueryDef("q57_stratified_sample",
      (s, dir) => {
        val sampled = Sampling.stratifiedSample(table(s, dir, "documents"),
          strataCol = "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.8),
          defaultFraction = 0.1)
        sampled.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"),
            max(col("doc_id")).as("last_id"))
          .orderBy("lang")
      },
      Some("""WITH survive AS (
        |  SELECT lang, doc_id,
        |    ('0x' || substring(md5('graft_' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 1000000 AS h,
        |    CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |              WHEN 'zh' THEN 0.8 ELSE 0.1 END AS frac
        |  FROM documents)
        |SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id,
        |       max(doc_id) AS last_id
        |FROM survive WHERE h < floor(frac * 1000000.0)
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // REAL multimodal decode (no stub): synthesize genuine PPM/PGM/WAV
    // container bytes from SQL-mirrorable formulas, then run the production
    // decoder (header parse + raster/PCM arithmetic, Codecs.scala). The
    // oracle recomputes every statistic from the generation formulas, so a
    // header misparse, endianness slip, or off-by-one in the raster offset
    // breaks the hash — this checks the DECODER, not the generator.
    QueryDef("q58_multimodal_decode",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val payload = (id % 3) match {
                case m @ (0L | 1L) => // P6 color / P5 gray image
                  val w = (4 + id % 8).toInt; val h = (3 + id % 5).toInt
                  val ch = if (m == 0L) 3 else 1
                  val px = Array.tabulate(w * h * ch)(j =>
                    ((id * 13 + j * 5) % 256).toInt)
                  Codecs.encodeNetpbm(w, h, ch, px)
                case _ => // 16-bit PCM WAV
                  val ns = (64 + id % 64).toInt
                  val rate = (8000 + (id % 8) * 1000).toInt
                  val samples = Array.tabulate(ns)(k =>
                    ((id * 31 + k * 7) % 65536).toInt - 32768)
                  Codecs.encodeWav(rate, 1, samples)
              }
              (id, payload)
            }
          }.toDF("media_id", "payload")
        Multimodal.decodeMedia(s, media).toDF().orderBy("media_id")
      },
      Some("""WITH p AS (
        |  SELECT doc_id, doc_id % 3 AS m,
        |         4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h,
        |         64 + doc_id % 64 AS ns
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, m,
        |    CASE WHEN m <= 1 THEN (doc_id * 13 + j * 5) % 256
        |         ELSE (doc_id * 31 + j * 7) % 65536 - 32768 END AS val
        |  FROM (SELECT doc_id, m, w, h, ns,
        |          unnest(generate_series(0,
        |            (CASE WHEN m = 0 THEN w * h * 3
        |                  WHEN m = 1 THEN w * h ELSE ns END) - 1)) AS j
        |        FROM p)),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_values, sum(val)::BIGINT AS v_sum,
        |         min(val)::BIGINT AS v_min, max(val)::BIGINT AS v_max
        |  FROM v GROUP BY doc_id)
        |SELECT p.doc_id AS media_id,
        |  CASE p.m WHEN 0 THEN 'ppm' WHEN 1 THEN 'pgm' ELSE 'wav' END AS container,
        |  (CASE WHEN p.m <= 1 THEN p.w ELSE 0 END)::INT AS width,
        |  (CASE WHEN p.m <= 1 THEN p.h ELSE 0 END)::INT AS height,
        |  (CASE p.m WHEN 0 THEN 3 ELSE 1 END)::INT AS channels,
        |  (CASE WHEN p.m = 2 THEN 8000 + (p.doc_id % 8) * 1000 ELSE 0 END)::INT AS sample_rate,
        |  a.n_values, a.v_sum, a.v_min, a.v_max
        |FROM p JOIN agg a USING (doc_id)
        |ORDER BY media_id""".stripMargin)),

    // End-to-end corpus recipe: the LLM-pipeline operators composed as one
    // oracled query — deterministic stratified sample (q57) → exact dedup
    // (q35) → near-dup cluster keep-list (q55's CC over q37's Jaccard
    // pairs) → token-budget packing (q56). The individual green rows don't
    // prove the stages compose (column contracts, semi-join grains); this
    // does — the oracle chains the exact same four stages in one SQL query.
    QueryDef("q59_corpus_recipe",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val sampled = Sampling.stratifiedSample(docs, strataCol = "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.8),
          defaultFraction = 0.1)
        // the sampled+deduped base feeds shingling (×3), the CC vertex
        // set, and the final semi-join — materialize it once. Eager
        // localCheckpoint instead of persist: keepSet's CC rounds force it
        // immediately anyway, and checkpoint blocks are context-cleaned
        // when the query's plan is dropped, where an unreleased persist
        // would sit in the cache manager for the rest of the session.
        val exact = Dedup.exact(sampled).localCheckpoint(true)
        val pairs = Dedup.ngramJaccardPairs(exact, n = 3, threshold = 0.8)
        val keep = Clusters.keepSet(pairs, exact.select(col("doc_id")),
          idCol = "doc_id").select(col("keep_id").as("doc_id"))
        val kept = exact.join(keep, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tok"))
        Packing.packSequences(kept, budget = 2048, bucketWidth = 64)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("shard")
      },
      Some("""WITH RECURSIVE survive AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT *,
        |      ('0x' || substring(md5('graft_' || doc_id::VARCHAR), 1, 15))::BIGINT
        |        % 1000000 AS h,
        |      CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |                WHEN 'zh' THEN 0.8 ELSE 0.1 END AS frac
        |    FROM documents)
        |  WHERE h < floor(frac * 1000000.0)),
        |exact AS (
        |  SELECT doc_id, text FROM survive
        |  WHERE doc_id IN (
        |    SELECT min(doc_id) FROM survive
        |    GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))),
        |toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
        |  FROM exact),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
        |    FROM (SELECT doc_id, t,
        |            unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        |          FROM toks))),
        |sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b FROM inter
        |  JOIN sized sa ON id_a = sa.doc_id JOIN sized sb ON id_b = sb.doc_id
        |  WHERE inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.8),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |r(src, node) AS (
        |  SELECT doc_id, doc_id FROM exact
        |  UNION
        |  SELECT r.src, e.b FROM r JOIN edges e ON e.a = r.node),
        |clusters AS (SELECT src AS doc_id, min(node) AS cluster FROM r GROUP BY src),
        |kept AS (
        |  SELECT e.doc_id, e.text FROM exact e
        |  WHERE e.doc_id IN (SELECT min(doc_id) FROM clusters GROUP BY cluster)),
        |d AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tok
        |  FROM kept),
        |packed AS (
        |  SELECT doc_id, n_tok,
        |         (coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |          // 2048) AS shard
        |  FROM d)
        |SELECT shard, count(*) AS n_docs, sum(n_tok)::BIGINT AS tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM packed GROUP BY shard ORDER BY shard""".stripMargin)),

    // N-gram repetition score (Gopher-family quality signal): duplicated
    // trigram fraction per document. Docs with < n tokens have no trigrams
    // and drop out on both sides.
    QueryDef("q60_ngram_repetition",
      (s, dir) =>
        Dedup.ngramRepetition(table(s, dir, "documents"), n = 3,
            verifiable = true)
          .select(col("doc_id"), col("n_ngrams"), col("n_distinct"),
            r6(col("rep_ratio")).as("rep_ratio"))
          .orderBy("doc_id"),
      Some(s"""WITH $verifiableTrigramSql
        |SELECT doc_id, count(*) AS n_ngrams,
        |       count(DISTINCT s) AS n_distinct,
        |       round(1 - count(DISTINCT s) / count(*)::DOUBLE, 6) AS rep_ratio
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Benchmark-contamination detection: training docs sharing a trigram
    // with the eval set (here: every 20th document) are flagged — the
    // standard decontamination pass, as a broadcast hash-join on 8-byte
    // shingle hashes.
    QueryDef("q61_contamination",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.benchmarkContamination(docs,
            docs.filter(col("doc_id") % 20 === 0), n = 3, verifiable = true)
          .select(col("doc_id"), col("n_shared"), col("contaminated"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $verifiableTrigramSql,
        |dsh AS (SELECT DISTINCT doc_id, s FROM sh),
        |bench AS (SELECT DISTINCT s FROM dsh WHERE doc_id % 20 = 0),
        |shared AS (
        |  SELECT doc_id, count(*) AS n_shared
        |  FROM dsh JOIN bench USING (s) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(sh2.n_shared, 0)::BIGINT AS n_shared,
        |       coalesce(sh2.n_shared, 0) >= 1 AS contaminated
        |FROM documents d LEFT JOIN shared sh2 ON d.doc_id = sh2.doc_id
        |ORDER BY d.doc_id""".stripMargin)),

    // Unicode NFC normalization via the NATIVE Catalyst expression
    // (functions/Normalize.scala, registered through GraftExtensions —
    // Spark has no built-in; a UDF would break codegen). The suffix plants
    // combining sequences: a/A + ring compose (å/Å), e + acute composes
    // (é), b + acute has NO precomposed form and must stay decomposed —
    // the md5 over the normalized bytes pins the exact output.
    QueryDef("q64_nfc_normalize",
      (s, dir) => {
        val suffix = lit(" å Å b́ é é")
        val raw = concat(col("text"), suffix)
        val norm = graft.functions.Normalize.nfcNormalize(raw)
        table(s, dir, "documents").select(
          col("doc_id"),
          length(raw).as("len_raw"),
          length(norm).as("len_nfc"),
          md5(norm.cast("binary")).as("h_nfc"))
          .orderBy("doc_id")
      },
      Some("""WITH r AS (
        |  SELECT doc_id,
        |    text || ' a' || chr(778) || ' A' || chr(778) || ' b' || chr(769)
        |         || ' ' || chr(233) || ' e' || chr(769) AS raw
        |  FROM documents),
        |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM r)
        |SELECT doc_id, length(raw) AS len_raw, length(norm) AS len_nfc,
        |       md5(norm) AS h_nfc
        |FROM n ORDER BY doc_id""".stripMargin)),

    // Gopher-family document quality rules (word-count bounds, mean word
    // length, alpha-word fraction, symbol ratio, stopword containment) —
    // one codegen'd projection, no shuffle; the oracle recomputes every
    // metric and the composite pass flag.
    QueryDef("q65_gopher_quality",
      (s, dir) =>
        Quality.gopherStats(table(s, dir, "documents")).orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, text, $padded AS p FROM documents),
        |m AS (SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_words,
        |  len(regexp_replace(lower(text), '[^a-z0-9_]', '', 'g')) AS tok_chars,
        |  len(regexp_extract_all(lower(text), '[a-z0-9_]*[a-z][a-z0-9_]*')) AS alpha_toks,
        |  (len(text) - len(replace(text, '#', '')))
        |    + (len(text) - len(replace(text, '...', ''))) // 3 AS symbols,
        |  ($stopHitsSql) AS stop_hits
        | FROM d)
        |SELECT doc_id, n_words,
        |  round(tok_chars / greatest(n_words, 1)::DOUBLE, 6) AS mean_word_len,
        |  round(alpha_toks / greatest(n_words, 1)::DOUBLE, 6) AS alpha_frac,
        |  round(symbols / greatest(n_words, 1)::DOUBLE, 6) AS symbol_ratio,
        |  stop_hits,
        |  (n_words BETWEEN 50 AND 100000
        |   AND tok_chars / greatest(n_words, 1)::DOUBLE BETWEEN 3.0 AND 10.0
        |   AND alpha_toks / greatest(n_words, 1)::DOUBLE >= 0.8
        |   AND symbols / greatest(n_words, 1)::DOUBLE <= 0.1
        |   AND stop_hits >= 2) AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin)),

    // C4-style line-level cleaning. The corpus has no line structure, so
    // the query PLANTS it deterministically (q58/q64 pattern): chunk to
    // 12-token lines, add terminal punctuation to 2 of every 3 lines, and
    // inject boilerplate rows (lorem / javascript+brace / under-length)
    // keyed on doc_id. The operator must then keep exactly the clean lines;
    // the oracle rebuilds lines, injections, keep flags, and the cleaned-
    // text md5 from scratch.
    QueryDef("q66_c4_line_filter",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val punct = Quality.chunkLines(docs).select(col("id"), col("line_no"),
          when(pmod(col("line_no"), lit(3)) =!= 2, concat(col("line"), lit(".")))
            .otherwise(col("line")).as("line"))
        def inj(m: Int, lineNo: Int, text: String) =
          docs.filter(col("doc_id") % m === 0).select(col("doc_id").as("id"),
            lit(lineNo).as("line_no"), lit(text).as("line"))
        val lines = punct
          .unionByName(inj(4, -1, "lorem ipsum dolor sit amet consectetur."))
          .unionByName(inj(6, 100000, "var f = function() { javascript boilerplate }."))
          .unionByName(inj(5, 100001, "too short line."))
        Quality.c4Clean(lines).withColumnRenamed("id", "doc_id").orderBy("doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id, i AS line_no,
        |         array_to_string(t[i*12+1 : i*12+12], ' ') AS line
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(0, ceil(len(t) / 12.0)::INT - 1)) AS i
        |        FROM t WHERE len(t) >= 1)),
        |punct AS (
        |  SELECT doc_id, line_no,
        |         CASE WHEN line_no % 3 <> 2 THEN line || '.' ELSE line END AS line
        |  FROM raw),
        |inj AS (
        |  SELECT doc_id, -1 AS line_no,
        |         'lorem ipsum dolor sit amet consectetur.' AS line
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 100000, 'var f = function() { javascript boilerplate }.'
        |  FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id, 100001, 'too short line.'
        |  FROM documents WHERE doc_id % 5 = 0),
        |lines AS (SELECT * FROM punct UNION ALL SELECT * FROM inj),
        |marked AS (
        |  SELECT doc_id, line_no, line,
        |    (len(regexp_extract_all(lower(line), '[a-z0-9_]+')) >= 5
        |     AND line LIKE '%.'
        |     AND lower(line) NOT LIKE '%javascript%'
        |     AND lower(line) NOT LIKE '%lorem ipsum%'
        |     AND line NOT LIKE '%{%') AS keep
        |  FROM lines)
        |SELECT doc_id, count(*) AS n_lines,
        |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  coalesce(sum(CASE WHEN keep
        |      THEN len(regexp_extract_all(lower(line), '[a-z0-9_]+')) END), 0)::BIGINT
        |    AS kept_tokens,
        |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
        |                          ORDER BY line_no), '')) AS h_clean
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // PII detection + redaction. PII-shaped spans (email, IPv4, phone) are
    // planted deterministically from doc_id; the operator counts and
    // redacts them with RE2-portable patterns, and the oracle recomputes
    // counts and the redacted-text md5.
    QueryDef("q67_pii_scrub",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val withPii = docs.select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                lit("@example.com now"))).otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" server 10."), (col("doc_id") % 256).cast("string"),
                lit(".0.1 up"))).otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
                lit(" today"))).otherwise(lit(""))).as("text"))
        Quality.piiStats(withPii).orderBy("doc_id")
      },
      Some("""WITH p AS (SELECT doc_id,
        |  text ||
        |  CASE WHEN doc_id % 3 = 0
        |       THEN ' contact user' || doc_id::VARCHAR || '@example.com now'
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0
        |       THEN ' server 10.' || (doc_id % 256)::VARCHAR || '.0.1 up'
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0
        |       THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' today'
        |       ELSE '' END AS text
        | FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_email,
        |  len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |  len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS n_phone,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
        |      '\b\d{3}-\d{4}\b', '[PHONE]', 'g')) AS h_redacted
        |FROM p ORDER BY doc_id""".stripMargin)),

    // Cross-corpus line-level dedup (CCNet/MassiveText pass): 2-token lines
    // (small vocabulary → real cross-document duplication), keep only the
    // corpus-wide first occurrence of each distinct line, report per-doc
    // retention. The window shuffles line-hash groups, never bodies.
    QueryDef("q68_line_dedup",
      (s, dir) =>
        Quality.lineDedupStats(
          Quality.chunkLines(table(s, dir, "documents"), lineTokens = 2))
          .withColumnRenamed("id", "doc_id").orderBy("doc_id"),
      Some("""WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id, i AS line_no,
        |         array_to_string(t[i*2+1 : i*2+2], ' ') AS line
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(0, ceil(len(t) / 2.0)::INT - 1)) AS i
        |        FROM t WHERE len(t) >= 1)),
        |marked AS (
        |  SELECT doc_id,
        |    row_number() OVER (PARTITION BY md5(line)
        |                       ORDER BY doc_id, line_no) = 1 AS first
        |  FROM raw)
        |SELECT doc_id, count(*) AS n_lines,
        |  sum(CASE WHEN first THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  round(1 - sum(CASE WHEN first THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6)
        |    AS dup_frac
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bloom-filter membership dedup: the cross-shard scale path for exact
    // dedup. Filter bits are k=5 md5-derived positions mod 8192 per
    // fingerprint (engine-rebuildable), built from the doc_id<100 shard;
    // every document is then probed. in_build/false_pos are the exact-check
    // validation columns proving the probabilistic accounting.
    QueryDef("q69_bloom_dedup",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.bloomFlag(docs.filter(col("doc_id") < 100), docs)
          .withColumnRenamed("id", "doc_id").orderBy("doc_id")
      },
      Some("""WITH bf AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |build AS (SELECT * FROM bf WHERE doc_id < 100),
        |js AS (SELECT unnest(generate_series(0, 4)) AS j),
        |bits AS (
        |  SELECT DISTINCT
        |    ('0x' || substring(md5(fp || '_' || j::VARCHAR), 1, 15))::BIGINT % 8192 AS pos
        |  FROM build, js),
        |qp AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(fp || '_' || j::VARCHAR), 1, 15))::BIGINT % 8192 AS pos
        |  FROM bf, js),
        |hits AS (
        |  SELECT doc_id, sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END) AS h
        |  FROM qp LEFT JOIN bits ON qp.pos = bits.pos GROUP BY doc_id),
        |inb AS (
        |  SELECT bf.doc_id, (b.fp IS NOT NULL) AS in_build
        |  FROM bf LEFT JOIN (SELECT DISTINCT fp FROM build) b ON bf.fp = b.fp)
        |SELECT h.doc_id, h.h = 5 AS flagged, inb.in_build,
        |       (h.h = 5 AND NOT inb.in_build) AS false_pos
        |FROM hits h JOIN inb ON h.doc_id = inb.doc_id ORDER BY h.doc_id""".stripMargin)),

    // Duplicated-span fraction (Lee et al. 2022 substring-dedup signal,
    // trigram-approximated): fraction of token positions covered by
    // n-grams shared with ANOTHER document; overlapping spans merged by a
    // running-max window. Verifiable hash family so the oracle recomputes
    // identical shingle identities.
    QueryDef("q70_dup_spans",
      (s, dir) =>
        Dedup.dupSpanStats(table(s, dir, "documents"), n = 3, verifiable = true)
          .orderBy("doc_id"),
      Some(s"""WITH $verifiableTrigramPosSql,
        |shared AS (SELECT s FROM sp GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |ss AS (SELECT doc_id, p FROM sp JOIN shared USING (s)),
        |cov AS (
        |  SELECT doc_id, p,
        |         max(p + 2) OVER (PARTITION BY doc_id ORDER BY p
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |  FROM ss),
        |agg AS (
        |  SELECT doc_id,
        |    sum(greatest(0, (p + 2) - greatest(coalesce(pe, p - 3), p - 1)))::BIGINT
        |      AS covered
        |  FROM cov GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS n_tok
        |  FROM documents)
        |SELECT b.doc_id, b.n_tok, coalesce(a.covered, 0)::BIGINT AS covered,
        |  round(coalesce(a.covered, 0) / greatest(b.n_tok, 1)::DOUBLE, 6)
        |    AS dup_span_frac
        |FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // SemDeDup-style semantic dedup over embeddings: deterministic seed
    // centroids (vec_id < 32 — corpus-scaled k, not a fixed handful),
    // nearest-centroid assignment, clusters over 30 members split into
    // adaptive LSH sub-buckets (the per-cluster pair-work cap), within-
    // (cluster, sub-bucket) cosine near-dups keep-smallest-id. Per-cluster
    // rollup. The oracle recomputes the sub-bucket keys from inlined
    // hyperplane literals and the same integer bit-length formula.
    QueryDef("q71_semantic_dedup",
      (s, dir) =>
        Similarity.semanticDedup(table(s, dir, "embeddings"),
            nSeeds = 32, threshold = 0.3, maxClusterSize = 30,
            subMaxBits = 8, dim = 64)
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
            sum(when(col("is_dup"), 0L).otherwise(1L)).as("n_kept"))
          .orderBy("cluster"),
      Some {
        val sigExpr = (0 until 8).map { j =>
          val h = VectorFunctions.hyperplane(j, 64)
          s"CASE WHEN list_dot_product(t.v, [${h.mkString(", ")}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END"
        }.mkString(" || ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 32),
        |cosm AS (
        |  SELECT e.vec_id, c.cid,
        |         list_dot_product(e.v, c.cv) /
        |           greatest(sqrt(list_dot_product(e.v, e.v))
        |                    * sqrt(list_dot_product(c.cv, c.cv)), 1e-300) AS cos
        |  FROM e, c),
        |asg AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY round(cos, 6) DESC, cid) AS rn FROM cosm)
        |  WHERE rn = 1),
        |av AS (SELECT a.vec_id, a.cluster, e.v FROM asg a JOIN e ON a.vec_id = e.vec_id),
        |csz AS (SELECT cluster, count(*) AS n FROM asg GROUP BY cluster),
        |sb AS (
        |  SELECT t.vec_id, t.cluster, t.v,
        |    CASE WHEN t.qd <= 1 THEN ''
        |         ELSE substring($sigExpr, 1, least(length(bin(t.qd - 1)), 8)) END AS sub
        |  FROM (SELECT av.vec_id, av.cluster, av.v, (csz.n + 29) // 30 AS qd
        |        FROM av JOIN csz USING (cluster)) t),
        |dups AS (
        |  SELECT DISTINCT b.vec_id FROM sb a JOIN sb b
        |  ON a.cluster = b.cluster AND a.sub = b.sub AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) /
        |          greatest(sqrt(list_dot_product(a.v, a.v))
        |                   * sqrt(list_dot_product(b.v, b.v)), 1e-300), 6) >= 0.3)
        |SELECT cluster, count(*) AS n_members,
        |  sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dups,
        |  sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM asg LEFT JOIN dups d ON asg.vec_id = d.vec_id
        |GROUP BY cluster ORDER BY cluster""".stripMargin
      }),

    // Exact-substring dedup as a TRANSFORM (q70 measures duplicated spans;
    // this removes them): spans shared with a smaller-id document are cut,
    // the cleaned text is rebuilt in normalized token space and md5-hashed
    // for the compare. The oracle rebuilds tokens WITH their text (the
    // shared trigram CTE carries only hashes), recomputes the same
    // min-id-per-shingle rule, and string_aggs the survivors in order.
    QueryDef("q72_remove_dup_spans",
      (s, dir) =>
        Dedup.removeDupSpans(table(s, dir, "documents"), n = 3,
            verifiable = true)
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            md5(col("clean_text")).as("clean_md5"))
          .orderBy("doc_id"),
      Some("""WITH tokt AS (
        |  SELECT doc_id, u.p AS p, u.t AS t FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
        |        (x, i) -> {'p': i, 't': x})) AS u
        |    FROM documents)),
        |led AS (
        |  SELECT doc_id, p,
        |    ('0x' || substring(md5(t), 1, 15))::BIGINT % 1000000007 AS h1,
        |    lead(('0x' || substring(md5(t), 1, 15))::BIGINT % 1000000007, 1)
        |      OVER (PARTITION BY doc_id ORDER BY p) AS h2,
        |    lead(('0x' || substring(md5(t), 1, 15))::BIGINT % 1000000007, 2)
        |      OVER (PARTITION BY doc_id ORDER BY p) AS h3
        |  FROM tokt),
        |sp AS (
        |  SELECT doc_id, p,
        |         ((h1 * 1000003 + h2) % 1000000007 * 1000003 + h3) % 1000000007 AS s
        |  FROM led WHERE h3 IS NOT NULL),
        |fst AS (SELECT s, min(doc_id) AS min_id FROM sp GROUP BY s),
        |cov AS (
        |  SELECT DISTINCT doc_id, tp FROM (
        |    SELECT sp.doc_id, unnest(generate_series(sp.p, sp.p + 2)) AS tp
        |    FROM sp JOIN fst USING (s) WHERE sp.doc_id > fst.min_id)),
        |clean AS (
        |  SELECT t.doc_id, string_agg(t.t, ' ' ORDER BY t.p) AS clean_text,
        |         count(*) AS n_kept
        |  FROM tokt t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.tp
        |  WHERE c.tp IS NULL GROUP BY t.doc_id),
        |base AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS n_tok
        |  FROM documents)
        |SELECT b.doc_id, b.n_tok,
        |  (b.n_tok - coalesce(c.n_kept, 0))::BIGINT AS n_removed,
        |  md5(coalesce(c.clean_text, '')) AS clean_md5
        |FROM base b LEFT JOIN clean c USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin)),

    // Per-domain cap (CCNet/FineWeb recipe step) + URL canonicalization:
    // a URL is derived per document (host from `source`, mixed-case path,
    // tracking param, fragment — exercising every normalization rule),
    // then the skew-safe two-phase top-K keeps the 10 longest documents
    // per source. The oracle recomputes the cap with a plain window (same
    // result as the salted two-phase selection, by the top-K-within-
    // bucket argument in Quality.domainCap's scaladoc) and the normalized
    // URL / eTLD+1 analytically from the construction shape.
    QueryDef("q73_domain_cap",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .withColumn("url", concat(lit("https://www."), col("source"),
            lit(".example.co.uk/Page/"), col("doc_id"),
            lit("?utm_campaign=x&id="), col("doc_id"), lit("#frag")))
        Quality.domainCap(
            docs.withColumn("domain",
                TextFunctions.registeredDomain(col("url")))
              .withColumn("url_norm", TextFunctions.urlNormalize(col("url"))),
            domainCol = "source", scoreCol = "n_chars",
            cap = 10, nSalt = 8)
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("domain_rank"), col("domain"), col("url_norm"))
          .orderBy(col("source"), col("domain_rank"))
      },
      Some("""SELECT doc_id, source, n_chars, domain_rank,
        |  'example.co.uk' AS domain,
        |  'https://' || source || '.example.co.uk/Page/' || doc_id
        |    || '?id=' || doc_id AS url_norm
        |FROM (SELECT doc_id, source, n_chars,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY n_chars DESC, doc_id) AS domain_rank
        |      FROM documents)
        |WHERE domain_rank <= 10 ORDER BY source, domain_rank""".stripMargin)),

    // Gopher WITHIN-doc repetition battery: duplicate-line fraction /
    // duplicate-line character fraction over chunked lines (with a planted
    // duplicate pair on every third document) + most-frequent-bigram
    // share, and the composite pass at the paper's thresholds (0.30 /
    // 0.20 / 0.20 — Rae et al. 2021, Table A1). The oracle rebuilds the
    // same 12-token lines, plants the same duplicates, and recomputes the
    // verifiable bigram hash with a lead window.
    QueryDef("q74_doc_repetition",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        def inj(lineNo: Int) =
          docs.filter(col("doc_id") % 3 === 0).select(col("doc_id").as("id"),
            lit(lineNo).as("line_no"),
            lit("repeated boilerplate line").as("line"))
        val lines = Quality.chunkLines(docs)
          .unionByName(inj(-1)).unionByName(inj(-2))
        val lineStats = Quality.lineRepetitionStats(lines)
        val top = Quality.topNgramShare(docs, n = 2, verifiable = true)
          .withColumnRenamed("id", "doc_id")
        lineStats.withColumnRenamed("id", "doc_id")
          .join(top, Seq("doc_id"))
          .withColumn("rep_pass",
            col("dup_line_frac") <= 0.30 &&
              col("dup_line_char_frac") <= 0.20 &&
              col("top_share") <= 0.20)
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id, i AS line_no,
        |         array_to_string(t[i*12+1 : i*12+12], ' ') AS line
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(0, ceil(len(t) / 12.0)::INT - 1)) AS i
        |        FROM t WHERE len(t) >= 1)),
        |inj AS (
        |  SELECT doc_id, -1 AS line_no, 'repeated boilerplate line' AS line
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, -2, 'repeated boilerplate line'
        |  FROM documents WHERE doc_id % 3 = 0),
        |lines AS (SELECT * FROM raw UNION ALL SELECT * FROM inj),
        |perline AS (
        |  SELECT doc_id, line, count(*) AS cnt, length(line) AS len
        |  FROM lines GROUP BY doc_id, line),
        |linestats AS (
        |  SELECT doc_id, sum(cnt)::BIGINT AS n_lines,
        |    round(sum(cnt - 1)::DOUBLE / sum(cnt)::DOUBLE, 6) AS dup_line_frac,
        |    round(sum((cnt - 1) * len)::DOUBLE
        |          / greatest(sum(cnt * len), 1)::DOUBLE, 6) AS dup_line_char_frac
        |  FROM perline GROUP BY doc_id),
        |tok AS (
        |  SELECT doc_id, u.p AS p,
        |         ('0x' || substring(md5(u.t), 1, 15))::BIGINT % 1000000007 AS h
        |  FROM (SELECT doc_id,
        |          unnest(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
        |            (x, i) -> {'p': i, 't': x})) AS u
        |        FROM documents)),
        |led AS (
        |  SELECT doc_id, h AS h1,
        |         lead(h, 1) OVER (PARTITION BY doc_id ORDER BY p) AS h2
        |  FROM tok),
        |sh AS (
        |  SELECT doc_id, (h1 * 1000003 + h2) % 1000000007 AS s
        |  FROM led WHERE h2 IS NOT NULL),
        |percnt AS (SELECT doc_id, s, count(*) AS cnt FROM sh GROUP BY doc_id, s),
        |top AS (
        |  SELECT doc_id, max(cnt)::BIGINT AS top_cnt, sum(cnt)::BIGINT AS n_ngrams,
        |         round(max(cnt)::DOUBLE / sum(cnt)::DOUBLE, 6) AS top_share
        |  FROM percnt GROUP BY doc_id)
        |SELECT l.doc_id, l.n_lines, l.dup_line_frac, l.dup_line_char_frac,
        |  t.top_cnt, t.n_ngrams, t.top_share,
        |  (l.dup_line_frac <= 0.30 AND l.dup_line_char_frac <= 0.20
        |   AND t.top_share <= 0.20) AS rep_pass
        |FROM linestats l JOIN top t USING (doc_id) ORDER BY l.doc_id""".stripMargin)),

    // Mixture resampling: equal-weight language mix at half the corpus
    // budget. Per-language keep rates derive from the observed counts
    // (clamped at 1.0, no upsampling); the oracle recomputes the rates
    // with the SAME double operation order — (budget·total)·(w/wSum)/n —
    // and the same md5 survival hash, so the kept sets match exactly.
    QueryDef("q75_mixture_sample",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val mixed = Sampling.mixtureSample(docs, strataCol = "lang",
          targetWeights = Map("en" -> 1.0, "de" -> 1.0, "es" -> 1.0,
            "fr" -> 1.0, "zh" -> 1.0),
          budgetFraction = 0.5)
        mixed.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_id"),
            max(col("doc_id")).as("last_id"))
          .orderBy("lang")
      },
      Some("""WITH cnt AS (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |tot AS (SELECT sum(n)::BIGINT AS total FROM cnt),
        |rate AS (
        |  SELECT lang,
        |    least(1.0::DOUBLE,
        |      0.5::DOUBLE * total::DOUBLE * (1.0::DOUBLE / 5.0::DOUBLE)
        |        / n::DOUBLE) AS frac
        |  FROM cnt, tot),
        |survive AS (
        |  SELECT d.lang, d.doc_id,
        |    ('0x' || substring(md5('graft_' || d.doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 1000000 AS h,
        |    r.frac
        |  FROM documents d JOIN rate r USING (lang))
        |SELECT lang, count(*) AS n_kept, min(doc_id) AS first_id,
        |       max(doc_id) AS last_id
        |FROM survive WHERE h < floor(frac * 1000000.0::DOUBLE)
        |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Product-quantization ANN (Jégou et al. 2011): 64-dim float vectors
    // encode to 8 codes (m=8 sub-spaces × k=16 centroids), queries rank
    // the corpus by asymmetric distance (full-precision query vs codebook
    // reconstruction). Codebooks here use the deterministic iters=0 init
    // (every (n/16)-th sample sub-vector) so the oracle reconstructs them
    // FROM THE TABLE and replays encode + ADC with ordered list folds —
    // bit-exact against Spark's HOF folds. Trained (iters>0) codebooks and
    // their recall are covered by SimilaritySpec.
    QueryDef("q76_pq_ann",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val cbs = Similarity.trainPqCodebooks(emb, m = 8, k = 16, dim = 64,
          iters = 0, sampleN = 4096)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 4), cbs, k = 10)
          .orderBy("query_id", "rank")
      },
      Some {
        def dists(mExpr: String) =
          s"""list_transform(generate_series(1, 16), k ->
          |      list_reduce(list_transform(generate_series(1, 8), i ->
          |        (e.v[$mExpr*8 + i] - cb[$mExpr+1][k][i]) * (e.v[$mExpr*8 + i] - cb[$mExpr+1][k][i])),
          |        (a, b) -> a + b))""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |samp AS (
        |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn
        |  FROM e ORDER BY vec_id LIMIT 4096),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM samp),
        |cent AS (
        |  SELECT (samp.rn // st.step)::INT AS k0, samp.v
        |  FROM samp, st WHERE samp.rn % st.step = 0 AND samp.rn // st.step < 16),
        |cbsub AS (
        |  SELECT ms.m, c.k0,
        |         list_transform(generate_series(1, 8), i -> c.v[ms.m*8 + i]) AS cvec
        |  FROM cent c, (SELECT unnest(generate_series(0, 7)) AS m) ms),
        |cbl AS (
        |  SELECT list(kl ORDER BY m) AS cb FROM (
        |    SELECT m, list(cvec ORDER BY k0) AS kl FROM cbsub GROUP BY m)),
        |codes AS (
        |  SELECT e.vec_id AS id,
        |    list_transform(generate_series(0, 7), m ->
        |      list_position(${dists("m")}, list_min(${dists("m")})) - 1) AS codes
        |  FROM e, cbl),
        |q AS (SELECT vec_id AS qid, v FROM e WHERE vec_id < 4),
        |scored AS (
        |  SELECT q.qid, c.id,
        |    round(list_reduce(list_transform(generate_series(0, 7), m ->
        |      list_reduce(list_transform(generate_series(1, 8), i ->
        |        (q.v[m*8 + i] - cb[m+1][c.codes[m+1]+1][i])
        |          * (q.v[m*8 + i] - cb[m+1][c.codes[m+1]+1][i])),
        |        (a, b) -> a + b)),
        |      (a, b) -> a + b), 6) AS dist
        |  FROM q, codes c, cbl),
        |ranked AS (
        |  SELECT qid AS query_id, id, dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, id, dist FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
      }),

    // Perceptual image dedup over the REAL decode path: P5 rasters are
    // synthesized with a SEED (doc_id % 100) and a small brightness shift
    // (doc_id / 100), so every seed has 5 shifted near-copies; aHash is
    // shift-invariant away from mod-256 wraparound, so those pairs land at
    // small hamming. Pipeline: encode → REAL netpbm decode → 8×8 grid
    // aHash (integer-only) → banded candidate join → exact hamming. The
    // oracle recomputes the hash FROM THE GENERATION FORMULAS — a decode
    // or sampling off-by-one breaks the match (q58 discipline).
    QueryDef("q77_perceptual_dedup",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val seed = id % 100; val shift = (id / 100).toInt
              val w = (8 + seed % 8).toInt; val h = (8 + seed % 5).toInt
              val px = Array.tabulate(w * h)(j =>
                ((seed * 13 + j * 5 + shift) % 256).toInt)
              (id, Codecs.encodeNetpbm(w, h, 1, px))
            }
          }.toDF("media_id", "payload")
        val hashes = Multimodal.aHash(s, media).toDF()
        Multimodal.perceptualDupPairs(hashes, maxHamming = 6, nBands = 4)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH p AS (
        |  SELECT doc_id AS id, doc_id % 100 AS seed, doc_id // 100 AS shift
        |  FROM documents),
        |d AS (SELECT id, seed, shift, 8 + seed % 8 AS w, 8 + seed % 5 AS h FROM p),
        |g AS (
        |  SELECT id, js.j,
        |    (seed * 13 + (((js.j // 8) * h // 8) * w + ((js.j % 8) * w // 8)) * 5
        |     + shift) % 256 AS px
        |  FROM d, (SELECT unnest(generate_series(0, 63)) AS j) js),
        |s AS (SELECT id, sum(px)::BIGINT AS total FROM g GROUP BY id),
        |bits AS (
        |  SELECT g.id,
        |    string_agg(CASE WHEN g.px * 64 > s.total THEN '1' ELSE '0' END,
        |               '' ORDER BY g.j) AS ahash
        |  FROM g JOIN s USING (id) GROUP BY g.id),
        |bands AS (
        |  SELECT id, ahash, bs.b, substring(ahash, bs.b * 16 + 1, 16) AS key
        |  FROM bits, (SELECT unnest(generate_series(0, 3)) AS b) bs),
        |bstats AS (SELECT b, key, count(*) AS bsz, min(id) AS bmin
        |           FROM bands GROUP BY b, key),
        |cand AS (
        |  SELECT DISTINCT id_a, id_b, ha, hb FROM (
        |    SELECT a.id AS id_a, b2.id AS id_b, a.ahash AS ha, b2.ahash AS hb
        |    FROM bands a JOIN bands b2
        |      ON a.b = b2.b AND a.key = b2.key AND a.id < b2.id
        |    JOIN bstats st ON st.b = a.b AND st.key = a.key AND st.bsz <= 4096
        |    UNION ALL
        |    SELECT st.bmin AS id_a, b2.id AS id_b, m.ahash AS ha, b2.ahash AS hb
        |    FROM bands b2 JOIN bstats st ON st.b = b2.b AND st.key = b2.key
        |      AND st.bsz > 4096 AND st.bmin < b2.id
        |    JOIN bits m ON m.id = st.bmin)),
        |ham AS (
        |  SELECT id_a, id_b,
        |    list_sum(list_transform(generate_series(1, 64), i ->
        |      CASE WHEN substring(ha, i, 1) <> substring(hb, i, 1)
        |           THEN 1 ELSE 0 END))::BIGINT AS hamming
        |  FROM cand)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 6
        |ORDER BY id_a, id_b""".stripMargin)),

    // Corpus vocabulary: the frequency pass behind vocabulary building /
    // stopword discovery / min-count filters — one explode + one partial
    // aggregation; top-50 by count with deterministic token tie-break
    // (Catalyst plans the global top-k as TakeOrderedAndProject, no full
    // sort of the vocabulary).
    QueryDef("q78_vocabulary",
      (s, dir) =>
        TextFunctions.vocabulary(table(s, dir, "documents"))
          .orderBy(col("n_occurrences").desc, col("token"))
          .limit(50),
      Some("""SELECT token, count(*)::BIGINT AS n_occurrences,
        |       count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM (SELECT doc_id,
        |        unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY n_occurrences DESC, token LIMIT 50""".stripMargin)),

    // IVF-ADC (FAISS IndexIVFPQ): the q76 PQ scan composed with q-39-style
    // IVF cell pruning — coarse centroids AND PQ codebooks both use the
    // deterministic iters=0 init (every (n/16)-th sample [sub-]vector), so
    // the oracle rebuilds BOTH quantizers from the table and replays cell
    // assignment (round-6 cosine argmax, ties to the smallest cell),
    // 4-probe candidate pruning, ADC scoring, and the exact top-10.
    // Trained-codebook recall vs brute force is covered by SimilaritySpec.
    QueryDef("q79_ivf_adc_ann",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val cents = Similarity.sampledKMeans(emb, kCells = 16, iters = 0,
          sampleN = 4096)
        val cbs = Similarity.trainPqCodebooks(emb, m = 8, k = 16, dim = 64,
          iters = 0, sampleN = 4096)
        Similarity.ivfAdcTopK(emb, emb.filter(col("vec_id") < 4), cents, cbs,
            k = 10, nProbe = 4, queryIdCol = "vec_id")
          .orderBy("query_id", "rank")
      },
      Some(ivfAdcOracleSql)),

    // The same IVF-ADC search SERVED FROM A PERSISTED INDEX (AnnIndex:
    // train + encode once into a parquet+manifest Bundle, query the saved
    // code table). Persistence must be semantically transparent, so the
    // oracle is exactly q79's: any drift between the saved-index serve
    // path and the live path (codes written differently, cells
    // re-assigned, quantizers re-read in the wrong order) breaks the hash.
    QueryDef("q85_ann_index_persisted",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val ixDir = System.getProperty("java.io.tmpdir") +
          "/graft_annix_q85_" + dir.replaceAll("[^A-Za-z0-9]", "_")
        AnnIndex.build(emb, ixDir,
          AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 16, iters = 0,
            sampleN = 4096))
        AnnIndex.topK(s, ixDir, emb.filter(col("vec_id") < 4), k = 10,
            nProbe = 4, queryIdCol = "vec_id")
          .orderBy("query_id", "rank")
      },
      Some(ivfAdcOracleSql)),

    // The PRODUCTION SemDeDup path (semanticDedupScaled): k grows with the
    // corpus (k = clamp(n/64, 1, 4096)), centroids from the k-means
    // trainer at iters=0 — the deterministic every-step-th-sample init the
    // oracle can rebuild — then the exact q71 dedup semantics (round-6
    // cosine argmax assignment, 30-member cluster cap via adaptive LSH
    // sub-buckets, within-bucket lower-id near-dup marking). q71 oracles
    // the fixed-seed variant; this row covers the scaled path end-to-end,
    // including the one-pass sample+count that sizes k.
    QueryDef("q80_semantic_dedup_scaled",
      (s, dir) =>
        Similarity.semanticDedupScaled(table(s, dir, "embeddings"),
            targetClusterSize = 64, threshold = 0.3, maxClusterSize = 30,
            subMaxBits = 8, dim = 64, kmeansIters = 0, sampleN = 4096)
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("n_members"),
            sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
            sum(when(col("is_dup"), 0L).otherwise(1L)).as("n_kept"))
          .orderBy("cluster"),
      Some {
        val sigExpr = (0 until 8).map { j =>
          val h = VectorFunctions.hyperplane(j, 64)
          s"CASE WHEN list_dot_product(t.v, [${h.mkString(", ")}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END"
        }.mkString(" || ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |samp AS (
        |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn
        |  FROM e ORDER BY vec_id LIMIT 4096),
        |kk AS (
        |  SELECT least(greatest(1, least((SELECT count(*) FROM e) // 64, 4096)),
        |               (SELECT count(*) FROM samp)) AS k),
        |st AS (
        |  SELECT greatest((SELECT count(*) FROM samp) // kk.k, 1) AS step, kk.k AS k
        |  FROM kk),
        |c AS (
        |  SELECT (samp.rn // st.step)::BIGINT AS cid, samp.v AS cv
        |  FROM samp, st WHERE samp.rn % st.step = 0 AND samp.rn // st.step < st.k),
        |cosm AS (
        |  SELECT e.vec_id, c.cid,
        |         list_dot_product(e.v, c.cv) /
        |           greatest(sqrt(list_dot_product(e.v, e.v))
        |                    * sqrt(list_dot_product(c.cv, c.cv)), 1e-300) AS cos
        |  FROM e, c),
        |asg AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY round(cos, 6) DESC, cid) AS rn FROM cosm)
        |  WHERE rn = 1),
        |av AS (SELECT a.vec_id, a.cluster, e.v FROM asg a JOIN e ON a.vec_id = e.vec_id),
        |csz AS (SELECT cluster, count(*) AS n FROM asg GROUP BY cluster),
        |sb AS (
        |  SELECT t.vec_id, t.cluster, t.v,
        |    CASE WHEN t.qd <= 1 THEN ''
        |         ELSE substring($sigExpr, 1, least(length(bin(t.qd - 1)), 8)) END AS sub
        |  FROM (SELECT av.vec_id, av.cluster, av.v, (csz.n + 29) // 30 AS qd
        |        FROM av JOIN csz USING (cluster)) t),
        |dups AS (
        |  SELECT DISTINCT b.vec_id FROM sb a JOIN sb b
        |  ON a.cluster = b.cluster AND a.sub = b.sub AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) /
        |          greatest(sqrt(list_dot_product(a.v, a.v))
        |                   * sqrt(list_dot_product(b.v, b.v)), 1e-300), 6) >= 0.3)
        |SELECT cluster, count(*) AS n_members,
        |  sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dups,
        |  sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM asg LEFT JOIN dups d ON asg.vec_id = d.vec_id
        |GROUP BY cluster ORDER BY cluster""".stripMargin
      }),

    // Corpus-wide k-NN graph: ANN where the query set IS the corpus (the
    // SemDeDup / CC / diversity-sampling workhorse) — multi-table LSH
    // self-join, distinct pairs, exact cosine, salted per-source top-k.
    // The oracle rebuilds both hyperplane tables from inlined literals and
    // replays bucket join -> pair dedup -> cosine -> rank.
    QueryDef("q81_knn_graph",
      (s, dir) =>
        Similarity.knnGraph(table(s, dir, "embeddings"), k = 3, dim = 64,
            nBits = 6, nTables = 2)
          .select(col("id"), col("neighbor"), r4(col("cos")).as("cos"),
            col("rank"))
          .orderBy("id", "rank"),
      Some(s"""WITH $knnGraphOracleCtes
        |SELECT id, nb AS neighbor, round(cos, 4) AS cos, rank
        |FROM ranked WHERE rank <= 3 ORDER BY id, rank""".stripMargin)),

    // Nearest-neighbor image resize over the REAL decode path (the
    // fixed-size normalization step before feature extraction): P5 rasters
    // synthesized from doc_id formulas (q77's generator), resized to 6x4,
    // integer stats of the target raster. The oracle recomputes the
    // sampled source coordinates ((y*h)//4, (x*w)//6) and pixel formula
    // directly — an off-by-one in the sampling or raster indexing breaks
    // the hash (q58 discipline).
    QueryDef("q82_resize",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val seed = id % 100; val shift = (id / 100).toInt
              val w = (8 + seed % 8).toInt; val h = (8 + seed % 5).toInt
              val px = Array.tabulate(w * h)(j =>
                ((seed * 13 + j * 5 + shift) % 256).toInt)
              (id, Codecs.encodeNetpbm(w, h, 1, px))
            }
          }.toDF("media_id", "payload")
        Multimodal.resizeNetpbm(s, media, outW = 6, outH = 4).toDF()
          .select(col("media_id"), col("width"), col("height"),
            col("channels"), col("n_values"), col("v_sum"), col("v_min"),
            col("v_max"))
          .orderBy("media_id")
      },
      Some("""WITH p AS (
        |  SELECT doc_id AS id, doc_id % 100 AS seed, doc_id // 100 AS shift
        |  FROM documents),
        |d AS (SELECT id, seed, shift, 8 + seed % 8 AS w, 8 + seed % 5 AS h FROM p),
        |g AS (
        |  SELECT id,
        |    (seed * 13
        |     + (((ys.y * h) // 4) * w + ((xs.x * w) // 6)) * 5
        |     + shift) % 256 AS px
        |  FROM d, (SELECT unnest(generate_series(0, 5)) AS x) xs,
        |          (SELECT unnest(generate_series(0, 3)) AS y) ys)
        |SELECT id AS media_id, 6::INT AS width, 4::INT AS height,
        |  1::INT AS channels, count(*)::BIGINT AS n_values,
        |  sum(px)::BIGINT AS v_sum, min(px)::BIGINT AS v_min,
        |  max(px)::BIGINT AS v_max
        |FROM g GROUP BY id ORDER BY media_id""".stripMargin)),

    // Residual-mode IVF-ADC (FAISS by_residual, the production
    // configuration): codebooks train on v - assigned-centroid residuals,
    // the corpus encodes residuals, queries subtract the probed cell's
    // centroid. Both quantizers at the deterministic iters=0 init, so the
    // oracle rebuilds centroids, assigns the SAMPLE to cells, derives the
    // residual codebooks, and replays encode + per-probed-cell ADC.
    QueryDef("q83_ivf_adc_residual",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val cents = Similarity.sampledKMeans(emb, kCells = 16, iters = 0,
          sampleN = 4096)
        val cbs = Similarity.trainPqCodebooksResidual(emb, cents, m = 8,
          k = 16, dim = 64, iters = 0, sampleN = 4096)
        Similarity.ivfAdcTopK(emb, emb.filter(col("vec_id") < 4), cents, cbs,
            k = 10, nProbe = 4, queryIdCol = "vec_id", byResidual = true)
          .orderBy("query_id", "rank")
      },
      Some {
        def dists(mExpr: String, vExpr: String) =
          s"""list_transform(generate_series(1, 16), k ->
          |      list_reduce(list_transform(generate_series(1, 8), i ->
          |        ($vExpr[$mExpr*8 + i] - cb[$mExpr+1][k][i]) * ($vExpr[$mExpr*8 + i] - cb[$mExpr+1][k][i])),
          |        (a, b) -> a + b))""".stripMargin
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |samp AS (
        |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn
        |  FROM e ORDER BY vec_id LIMIT 4096),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM samp),
        |ivfc AS (
        |  SELECT (samp.rn // st.step)::BIGINT AS cell, samp.v AS cv
        |  FROM samp, st WHERE samp.rn % st.step = 0 AND samp.rn // st.step < 16),
        |sasg AS (
        |  SELECT rn, v, cell FROM (
        |    SELECT s.rn, s.v, i.cell,
        |      row_number() OVER (PARTITION BY s.rn ORDER BY
        |        round(list_dot_product(s.v, i.cv) /
        |          greatest(sqrt(list_dot_product(s.v, s.v))
        |                   * sqrt(list_dot_product(i.cv, i.cv)), 1e-300), 6) DESC,
        |        i.cell) AS rnk
        |    FROM samp s, ivfc i) WHERE rnk = 1),
        |sres AS (
        |  SELECT sa.rn,
        |    list_transform(generate_series(1, 64), i -> sa.v[i] - i2.cv[i]) AS rv
        |  FROM sasg sa JOIN ivfc i2 ON i2.cell = sa.cell),
        |cbsub AS (
        |  SELECT ms.m, (r.rn // st.step) AS k0,
        |         list_transform(generate_series(1, 8), i -> r.rv[ms.m*8 + i]) AS cvec
        |  FROM sres r, st, (SELECT unnest(generate_series(0, 7)) AS m) ms
        |  WHERE r.rn % st.step = 0 AND r.rn // st.step < 16),
        |cbl AS (
        |  SELECT list(kl ORDER BY m) AS cb FROM (
        |    SELECT m, list(cvec ORDER BY k0) AS kl FROM cbsub GROUP BY m)),
        |cosc AS (
        |  SELECT e.vec_id, i.cell,
        |    round(list_dot_product(e.v, i.cv) /
        |      greatest(sqrt(list_dot_product(e.v, e.v))
        |               * sqrt(list_dot_product(i.cv, i.cv)), 1e-300), 6) AS cosr
        |  FROM e, ivfc i),
        |asg AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cosr DESC, cell) AS rnk
        |    FROM cosc) WHERE rnk = 1),
        |eres AS (
        |  SELECT e.vec_id, a.cell,
        |    list_transform(generate_series(1, 64), i -> e.v[i] - i2.cv[i]) AS rv
        |  FROM e JOIN asg a ON a.vec_id = e.vec_id
        |         JOIN ivfc i2 ON i2.cell = a.cell),
        |codes AS (
        |  SELECT er.vec_id AS id, er.cell,
        |    list_transform(generate_series(0, 7), m ->
        |      list_position(${dists("m", "er.rv")}, list_min(${dists("m", "er.rv")})) - 1) AS codes
        |  FROM eres er, cbl),
        |qprobe AS (
        |  SELECT vec_id AS qid, cell FROM (
        |    SELECT vec_id, cell,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cosr DESC, cell) AS rnk
        |    FROM cosc WHERE vec_id < 4) WHERE rnk <= 4),
        |qres AS (
        |  SELECT qp.qid, qp.cell,
        |    list_transform(generate_series(1, 64), i -> q.v[i] - i2.cv[i]) AS qrv
        |  FROM qprobe qp JOIN e q ON q.vec_id = qp.qid
        |                 JOIN ivfc i2 ON i2.cell = qp.cell),
        |scored AS (
        |  SELECT qr.qid, c.id,
        |    round(list_reduce(list_transform(generate_series(0, 7), m ->
        |      list_reduce(list_transform(generate_series(1, 8), i ->
        |        (qr.qrv[m*8 + i] - cb[m+1][c.codes[m+1]+1][i])
        |          * (qr.qrv[m*8 + i] - cb[m+1][c.codes[m+1]+1][i])),
        |        (a, b) -> a + b)),
        |      (a, b) -> a + b), 6) AS dist
        |  FROM qres qr JOIN codes c ON c.cell = qr.cell, cbl),
        |ranked AS (
        |  SELECT qid AS query_id, id, dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, id, dist FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
      }),

    // BM25 full-text retrieval (Retrieval.bm25TopK): inverted-index term
    // scan with the Lucene idf, scored per (query, doc), salted top-10.
    // The oracle rebuilds postings/df/doc-length/avgdl from the table and
    // replays the exact scoring arithmetic — per-term scores rounded to
    // 6 dp, DECIMAL-summed, ranked by the exact decimal with doc-id
    // tie-break — so any drift in tf/df/dl accounting or the salted
    // two-phase selection breaks the hash.
    QueryDef("q86_bm25_retrieval",
      (s, dir) =>
        Retrieval.bm25TopK(s, table(s, dir, "documents"),
            Seq(0 -> "spark shuffle hash join", 1 -> "customer order query",
              2 -> "vector window scan"), k = 10)
          .orderBy("query_id", "rank"),
      Some(bm25OracleSql)),

    // CCNet perplexity filtering (LmScore): add-α unigram LM trained on
    // the corpus (top-1024 vocab, α=0.5), per-doc mean NLL, head/middle/
    // tail terciles with cutoffs from the deterministic 256-doc
    // hash-ordered sample. The oracle retrains the LM from the table,
    // rescoring every doc (per-token NLL rounded 6 dp, DECIMAL mean) and
    // replaying the sample + order-statistic thresholds, so drift in
    // vocab selection, smoothing arithmetic, the sample, or the tercile
    // boundary rule all break the hash.
    QueryDef("q87_ccnet_perplexity",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val lm = LmScore.trainUnigram(docs, vocabSize = 1024, alpha = 0.5)
        LmScore.perplexityBuckets(docs, lm, sampleN = 256)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            stableSum(col("log_ppl")).as("sum_log_ppl"),
            min(col("doc_id")).as("first_id"),
            max(col("doc_id")).as("last_id"))
          .orderBy("bucket")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
        |  FROM documents),
        |cnt AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY 1),
        |vocab AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 1024),
        |st AS (
        |  SELECT (SELECT sum(c)::BIGINT FROM cnt) AS t,
        |         (SELECT count(*)::BIGINT FROM vocab) AS v),
        |nlls AS (
        |  SELECT tk.doc_id,
        |    round(-ln((coalesce(v.c, 0) + 0.5) / (st.t + 0.5 * (st.v + 1))), 6)
        |      AS nll
        |  FROM toks tk LEFT JOIN vocab v ON v.token = tk.token, st),
        |ppl AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |    round(sum(nll::DECIMAL(28,6))::DOUBLE / count(*), 6) AS log_ppl
        |  FROM nlls GROUP BY 1),
        |samp AS (
        |  SELECT log_ppl FROM ppl
        |  ORDER BY
        |    ('0x' || substring(md5('ppl_' || doc_id::VARCHAR), 1, 15))::BIGINT,
        |    doc_id
        |  LIMIT 256),
        |sord AS (
        |  SELECT log_ppl, row_number() OVER (ORDER BY log_ppl) AS rn,
        |         count(*) OVER () AS n
        |  FROM samp),
        |thr AS (
        |  SELECT max(CASE WHEN rn = (n + 2) // 3 THEN log_ppl END) AS t1,
        |         max(CASE WHEN rn = (2*n + 2) // 3 THEN log_ppl END) AS t2
        |  FROM sord),
        |bkt AS (
        |  SELECT p.doc_id, p.log_ppl,
        |    CASE WHEN p.log_ppl <= thr.t1 THEN 'head'
        |         WHEN p.log_ppl <= thr.t2 THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM ppl p, thr)
        |SELECT bucket, count(*)::BIGINT AS n_docs,
        |  round(sum(round(log_ppl, 6)::DECIMAL(28,6))::DOUBLE, 6) AS sum_log_ppl,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM bkt GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // DSIR importance resampling (Importance.dsirSelect): hashed
    // unigram+bigram features (md5 mod 256), one-pass target/raw bucket
    // counts over the lang='en' target slice, per-doc mean log-likelihood
    // ratio, deterministic top-50. The oracle recomputes the feature
    // hashing, both models, the per-bucket log-ratios, and the per-doc
    // means from the table.
    QueryDef("q88_dsir_selection",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val top = Importance.dsirSelect(docs, col("lang") === "en", n = 50)
        docs.select(col("doc_id"), col("lang"))
          .join(broadcast(top), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("n_feat"), col("importance"))
          .orderBy(col("importance").desc, col("doc_id"))
      },
      Some("""WITH tk AS (
        |  SELECT doc_id, lang,
        |    regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, lang, unnest(l) AS f FROM tk
        |  UNION ALL
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(l) - 1),
        |      i -> l[i] || ' ' || l[i + 1])) AS f
        |  FROM tk),
        |fb AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5(f), 1, 15))::BIGINT % 256 AS b
        |  FROM feats),
        |bc AS (
        |  SELECT b, count(*)::BIGINT AS cr,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct
        |  FROM fb GROUP BY 1),
        |tot AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt FROM bc),
        |lam AS (
        |  SELECT b, round(ln((ct + 0.5) / (tt + 0.5 * 256)) -
        |                  ln((cr + 0.5) / (tr + 0.5 * 256)), 6) AS w
        |  FROM bc, tot),
        |sc AS (
        |  SELECT fb.doc_id, count(*)::BIGINT AS n_feat,
        |    round(sum(w::DECIMAL(28,6))::DOUBLE / count(*), 6) AS importance
        |  FROM fb JOIN lam USING (b) GROUP BY 1)
        |SELECT sc.doc_id, d.lang, sc.n_feat, sc.importance
        |FROM sc JOIN documents d ON d.doc_id = sc.doc_id
        |ORDER BY importance DESC, sc.doc_id LIMIT 50""".stripMargin)),

    // BPE subword token counting (Bpe.bpeTokenCount — the native codegen
    // kernel) under a FIXED two-chain merge table {t+h→th, th+e→the,
    // i+n→in, in+g→ing}. For chain merges the greedy all-occurrences
    // apply is arithmetic: pieces = word-chars − occ(th) − occ(the) −
    // occ(in) − occ(ing), each occ leftmost-non-overlapping on the raw
    // lowercased text (= SQL replace() semantics; a chained pair's head
    // can never overlap its own first merge, so the counts align exactly).
    // The oracle replays that arithmetic per document; the TRAINED-merge
    // path (trainOnCorpus) is BpeSpec-covered.
    QueryDef("q89_bpe_token_stats",
      (s, dir) => {
        val merges = bpeMergeTable(s, dir)
        table(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(graft.functions.Bpe.bpeTokenCount(col("text"), merges))
              .as("bpe_tokens"),
            sum(TextFunctions.tokenCount(col("text")).cast("long"))
              .as("word_tokens"))
          .orderBy("source")
      },
      Some("""WITH per AS (
        |  SELECT source, lower(text) AS t,
        |    len(regexp_replace(lower(text), '[^a-z0-9_]', '', 'g'))::BIGINT
        |      AS wc,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS nw
        |  FROM documents),
        |occ AS (
        |  SELECT source, nw,
        |    wc - (len(t) - len(replace(t, 'th', ''))) / 2
        |       - (len(t) - len(replace(t, 'the', ''))) / 3
        |       - (len(t) - len(replace(t, 'in', ''))) / 2
        |       - (len(t) - len(replace(t, 'ing', ''))) / 3 AS bpe
        |  FROM per)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(bpe)::BIGINT AS bpe_tokens, sum(nw)::BIGINT AS word_tokens
        |FROM occ GROUP BY source ORDER BY source""".stripMargin)),

    // Training-export composition: deterministic global shuffle (md5 hash
    // order — the reproducible "shuffle once before training" pass) →
    // DISTRIBUTED global rank (Positional, no single-task window) →
    // fixed-size shard assignment → per-shard manifest with REAL BPE
    // token accounting (q89's oracle-replayable merge table). Proves the
    // shuffle/rank/shard/count stages compose; the oracle replays the
    // whole chain in one SQL query.
    QueryDef("q90_training_export",
      (s, dir) => {
        val merges = bpeMergeTable(s, dir)
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            TextFunctions.md5Hash60(
              concat(lit("exp_"), col("doc_id").cast("string"))).as("_h"),
            graft.functions.Bpe.bpeTokenCount(col("text"), merges).as("bpe"))
        Positional.withGlobalRowNumber(docs,
            Seq(col("_h"), col("doc_id")), out = "_rn")
          .withColumn("shard", expr("(_rn - 1) div 64"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"), sum(col("bpe")).as("bpe_tokens"),
            min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
          .orderBy("shard")
      },
      Some("""WITH b AS (
        |  SELECT doc_id, lower(text) AS t,
        |    ('0x' || substring(md5('exp_' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      AS hs
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, hs,
        |    len(regexp_replace(t, '[^a-z0-9_]', '', 'g'))::BIGINT
        |     - (len(t) - len(replace(t, 'th', ''))) / 2
        |     - (len(t) - len(replace(t, 'the', ''))) / 3
        |     - (len(t) - len(replace(t, 'in', ''))) / 2
        |     - (len(t) - len(replace(t, 'ing', ''))) / 3 AS bpe
        |  FROM b),
        |r AS (
        |  SELECT doc_id, bpe,
        |    (row_number() OVER (ORDER BY hs, doc_id) - 1) // 64 AS shard
        |  FROM c)
        |SELECT shard, count(*)::BIGINT AS n_docs, sum(bpe)::BIGINT AS bpe_tokens,
        |       min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM r GROUP BY shard ORDER BY shard""".stripMargin)),

    // Token-budget packing driven by REAL BPE counts (q56's two-phase
    // distributed prefix scan × q89's oracle-replayable subword kernel):
    // sequence shards now mean actual model tokens, not whitespace words.
    QueryDef("q91_bpe_packing",
      (s, dir) => {
        val merges = bpeMergeTable(s, dir)
        val docs = table(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.Bpe.bpeTokenCount(col("text"), merges).as("n_tok"))
        Packing.packSequences(docs, budget = 2048, bucketWidth = 64)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .orderBy("shard")
      },
      Some("""WITH d AS (
        |  SELECT doc_id, lower(text) AS t FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(regexp_replace(t, '[^a-z0-9_]', '', 'g'))::BIGINT
        |     - (len(t) - len(replace(t, 'th', ''))) / 2
        |     - (len(t) - len(replace(t, 'the', ''))) / 3
        |     - (len(t) - len(replace(t, 'in', ''))) / 2
        |     - (len(t) - len(replace(t, 'ing', ''))) / 3 AS n_tok
        |  FROM d),
        |packed AS (
        |  SELECT doc_id, n_tok,
        |         (coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |          // 2048) AS shard
        |  FROM c)
        |SELECT shard, count(*) AS n_docs, sum(n_tok)::BIGINT AS tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM packed GROUP BY shard ORDER BY shard""".stripMargin)),

    // BPE subword VOCABULARY: explode the piece stream (graft_bpe_pieces)
    // and count — the frequency pass a subword vocab build runs. The
    // oracle simulates the greedy chain merges with sentinel-char
    // replaces in rank order (leftmost-non-overlap replace == the
    // merge-all pass; a junction is never rescanned on either side),
    // then unnests per-word characters and maps sentinels back to their
    // piece strings — full piece-level enumeration, not just counts.
    QueryDef("q92_bpe_vocabulary",
      (s, dir) => {
        val merges = bpeMergeTable(s, dir)
        table(s, dir, "documents")
          .select(explode(
            graft.functions.Bpe.bpePieces(col("text"), merges)).as("piece"))
          .groupBy(col("piece")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("piece"))
          .limit(20)
      },
      Some("""WITH toks AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
        |  FROM documents),
        |enc AS (
        |  SELECT replace(replace(replace(replace(w,
        |    'th', chr(1)), chr(1) || 'e', chr(2)),
        |    'in', chr(3)), chr(3) || 'g', chr(4)) AS e
        |  FROM toks),
        |pieces AS (
        |  SELECT CASE c WHEN chr(1) THEN 'th' WHEN chr(2) THEN 'the'
        |                WHEN chr(3) THEN 'in' WHEN chr(4) THEN 'ing'
        |                ELSE c END AS piece
        |  FROM (SELECT unnest(list_transform(generate_series(1, len(e)),
        |                i -> e[i])) AS c
        |        FROM enc))
        |SELECT piece, count(*)::BIGINT AS n FROM pieces
        |GROUP BY piece ORDER BY n DESC, piece LIMIT 20""".stripMargin)),

    // IVF-ADC + exact refine (FAISS IndexRefineFlat): the ADC pass
    // retrieves k·4 candidates on codes, the candidates alone re-score
    // exactly on raw vectors and re-rank to k. The oracle is q79's full
    // quantizer replay with the refine tail appended — candidates at
    // ADC rank ≤ 40, exact ascending-fold squared L2, re-rank.
    QueryDef("q93_ivf_adc_refine",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val cents = Similarity.sampledKMeans(emb, kCells = 16, iters = 0,
          sampleN = 4096)
        val cbs = Similarity.trainPqCodebooks(emb, m = 8, k = 16, dim = 64,
          iters = 0, sampleN = 4096)
        Similarity.ivfAdcRefineTopK(emb, emb.filter(col("vec_id") < 4),
            cents, cbs, k = 10, refineFactor = 4, nProbe = 4,
            queryIdCol = "vec_id")
          .orderBy("query_id", "rank")
      },
      Some(ivfAdcRefineOracleSql)),

    // Packed-sequence MATERIALIZATION (Packing.materializeSequences):
    // the rows a trainer consumes — per shard, documents concatenated in
    // id order with a separator plus the token-offset boundary list. The
    // oracle replays the BPE counts, the prefix-scan shard assignment,
    // the ordered string_agg (hash-compared), and the boundary offsets.
    QueryDef("q94_packed_sequences",
      (s, dir) => {
        val merges = bpeMergeTable(s, dir)
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            graft.functions.Bpe.bpeTokenCount(col("text"), merges).as("n_tok"))
        Packing.materializeSequences(docs, budget = 2048, bucketWidth = 64)
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            md5(col("text")).as("h_text"),
            concat_ws(",", transform(col("boundaries"),
              _.cast("string"))).as("offsets"))
          .orderBy("shard")
      },
      Some("""WITH d AS (
        |  SELECT doc_id, text, lower(text) AS t FROM documents),
        |c AS (
        |  SELECT doc_id, text,
        |    len(regexp_replace(t, '[^a-z0-9_]', '', 'g'))::BIGINT
        |     - (len(t) - len(replace(t, 'th', ''))) / 2
        |     - (len(t) - len(replace(t, 'the', ''))) / 3
        |     - (len(t) - len(replace(t, 'in', ''))) / 2
        |     - (len(t) - len(replace(t, 'ing', ''))) / 3 AS n_tok
        |  FROM d),
        |packed AS (
        |  SELECT doc_id, text, n_tok,
        |         coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |           AS before
        |  FROM c),
        |sh AS (
        |  SELECT doc_id, text, n_tok,
        |         before // 2048 AS shard, before % 2048 AS off
        |  FROM packed)
        |SELECT shard, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |       md5(string_agg(text, e'\n\n' ORDER BY doc_id)) AS h_text,
        |       string_agg(off::VARCHAR, ',' ORDER BY doc_id) AS offsets
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin)),

    // Temperature-flattened domain mixing (Sampling.temperatureSample):
    // weights ∝ observed-share^(1/T), T=2 flattens toward uniform — the
    // XLM/mT5 rebalance. The oracle recomputes counts, the pow weights,
    // the fixed-order rate arithmetic, and row-by-row survival.
    QueryDef("q95_temperature_mix",
      (s, dir) => {
        Sampling.temperatureSample(table(s, dir, "documents"),
            strataCol = "lang", temperature = 2.0, budgetFraction = 0.5)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"),
            min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
          .orderBy("lang")
      },
      Some("""WITH cnt AS (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |tot AS (SELECT sum(n)::BIGINT AS total FROM cnt),
        |w AS (
        |  SELECT lang, n, pow(n::DOUBLE / tot.total, 1.0 / 2.0) AS wgt
        |  FROM cnt, tot),
        |ws AS (SELECT sum(wgt) AS wsum FROM w),
        |rates AS (
        |  SELECT w.lang,
        |    least(1.0, 0.5 * tot.total * (w.wgt / ws.wsum) / greatest(w.n, 1))
        |      AS frac
        |  FROM w, tot, ws),
        |survive AS (
        |  SELECT d.lang, d.doc_id
        |  FROM documents d JOIN rates r ON r.lang = d.lang
        |  WHERE ('0x' || substring(md5('graft_' || d.doc_id::VARCHAR), 1, 15))::BIGINT
        |          % 1000000 < floor(r.frac * 1000000.0))
        |SELECT lang, count(*)::BIGINT AS n_sampled,
        |       min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM survive GROUP BY lang ORDER BY lang""".stripMargin)),

    // Context-window chunking (Chunking.chunkDocs): 64-token windows,
    // stride 48 — the split an embedding pipeline runs before encoding.
    // Chunk rule: ceil(max(sz-64,0)/48)+1 windows, last window reaches
    // the document end, short docs are one chunk. The oracle replays the
    // rule with list slicing and hash-compares every chunk's text.
    QueryDef("q96_doc_chunking",
      (s, dir) =>
        Chunking.chunkDocs(table(s, dir, "documents"), window = 64,
            stride = 48)
          .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
            md5(col("chunk_text")).as("h_chunk"))
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH tk AS (
        |  SELECT doc_id,
        |    regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, l, len(l)::BIGINT AS sz,
        |    CASE WHEN len(l) > 64 THEN (len(l) - 64 + 47) // 48 + 1
        |         ELSE 1 END AS nc
        |  FROM tk),
        |ch AS (
        |  SELECT doc_id, unnest(generate_series(0, nc - 1)) AS chunk_id, l
        |  FROM n),
        |sl AS (
        |  SELECT doc_id, chunk_id,
        |    l[(chunk_id * 48 + 1):(chunk_id * 48 + 64)] AS c
        |  FROM ch)
        |SELECT doc_id, chunk_id, len(c)::BIGINT AS n_tokens,
        |       md5(array_to_string(c, ' ')) AS h_chunk
        |FROM sl ORDER BY doc_id, chunk_id""".stripMargin)),

    // BM25 served from a PERSISTED inverted index (Retrieval.ensureIndex
    // + bm25ServeTopK): the q85-vs-q79 pairing applied to lexical search —
    // the oracle is exactly q86's, so any drift between the saved-index
    // serve path and the live path (postings grouped differently, stats
    // re-derived, df miscounted) breaks the hash. `ensure` reuses a valid
    // on-disk index (data-stamped dir), so repeat runs measure SERVING.
    QueryDef("q97_bm25_index_served",
      (s, dir) => {
        val ixDir = System.getProperty("java.io.tmpdir") +
          "/graft_bm25ix_q97_" + dataStamp(dir, "documents")
        Retrieval.ensureIndex(table(s, dir, "documents"), ixDir)
        Retrieval.bm25ServeTopK(s, ixDir,
            Seq(0 -> "spark shuffle hash join", 1 -> "customer order query",
              2 -> "vector window scan"), k = 10)
          .orderBy("query_id", "rank")
      },
      Some(bm25OracleSql)),

    // The MODERN pretraining recipe, composed end to end: temperature-
    // flattened domain mix (q95) → exact dedup (q35) → CCNet perplexity
    // filter keeping head+middle (q87, LM trained on the deduped slice) →
    // DSIR top-50 toward the en target (q88). The green rows for each
    // stage don't prove the column/grain contracts compose — this does:
    // the oracle chains all four stages' SQL over the same table.
    QueryDef("q98_pretraining_recipe",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val mixed = Sampling.temperatureSample(docs, strataCol = "lang",
          temperature = 2.0, budgetFraction = 0.6)
        // feeds LM training, scoring, and DSIR — pin one snapshot
        val deduped = Dedup.exact(mixed).localCheckpoint(true)
        val lm = LmScore.trainUnigram(deduped, vocabSize = 1024, alpha = 0.5)
        val kept = LmScore.perplexityBuckets(deduped, lm, sampleN = 256)
          .filter(col("bucket") =!= "tail").select("doc_id")
        val base = deduped.join(kept, Seq("doc_id"), "left_semi")
          .localCheckpoint(true)
        val top = Importance.dsirSelect(base, col("lang") === "en", n = 50)
        base.select(col("doc_id"), col("lang"))
          .join(broadcast(top), Seq("doc_id"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            stableSum(col("importance")).as("sum_importance"),
            min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
          .orderBy("lang")
      },
      Some("""WITH cnt0 AS (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
        |tot0 AS (SELECT sum(n)::BIGINT AS total FROM cnt0),
        |w0 AS (
        |  SELECT lang, n, pow(n::DOUBLE / tot0.total, 1.0 / 2.0) AS wgt
        |  FROM cnt0, tot0),
        |ws0 AS (SELECT sum(wgt) AS wsum FROM w0),
        |rates AS (
        |  SELECT w0.lang,
        |    least(1.0, 0.6 * tot0.total * (w0.wgt / ws0.wsum)
        |          / greatest(w0.n, 1)) AS frac
        |  FROM w0, tot0, ws0),
        |survive AS (
        |  SELECT d.doc_id, d.lang, d.text
        |  FROM documents d JOIN rates r ON r.lang = d.lang
        |  WHERE ('0x' || substring(md5('graft_' || d.doc_id::VARCHAR), 1, 15))::BIGINT
        |          % 1000000 < floor(r.frac * 1000000.0)),
        |exact AS (
        |  SELECT doc_id, lang, text FROM survive
        |  WHERE doc_id IN (
        |    SELECT min(doc_id) FROM survive
        |    GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
        |  FROM exact),
        |cnt AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY 1),
        |vocab AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT 1024),
        |st AS (
        |  SELECT (SELECT sum(c)::BIGINT FROM cnt) AS t,
        |         (SELECT count(*)::BIGINT FROM vocab) AS v),
        |nlls AS (
        |  SELECT tk.doc_id,
        |    round(-ln((coalesce(v.c, 0) + 0.5) / (st.t + 0.5 * (st.v + 1))), 6)
        |      AS nll
        |  FROM toks tk LEFT JOIN vocab v ON v.token = tk.token, st),
        |ppl AS (
        |  SELECT doc_id,
        |    round(sum(nll::DECIMAL(28,6))::DOUBLE / count(*), 6) AS log_ppl
        |  FROM nlls GROUP BY 1),
        |samp AS (
        |  SELECT log_ppl FROM ppl
        |  ORDER BY
        |    ('0x' || substring(md5('ppl_' || doc_id::VARCHAR), 1, 15))::BIGINT,
        |    doc_id
        |  LIMIT 256),
        |sord AS (
        |  SELECT log_ppl, row_number() OVER (ORDER BY log_ppl) AS rn,
        |         count(*) OVER () AS n
        |  FROM samp),
        |thr AS (
        |  SELECT max(CASE WHEN rn = (n + 2) // 3 THEN log_ppl END) AS t1,
        |         max(CASE WHEN rn = (2*n + 2) // 3 THEN log_ppl END) AS t2
        |  FROM sord),
        |base AS (
        |  SELECT e.doc_id, e.lang, e.text
        |  FROM exact e JOIN ppl p ON p.doc_id = e.doc_id, thr
        |  WHERE p.log_ppl <= thr.t2),
        |tk2 AS (
        |  SELECT doc_id, lang,
        |    regexp_extract_all(lower(text), '[a-z0-9_]+') AS l
        |  FROM base),
        |feats AS (
        |  SELECT doc_id, lang, unnest(l) AS f FROM tk2
        |  UNION ALL
        |  SELECT doc_id, lang,
        |    unnest(list_transform(generate_series(1, len(l) - 1),
        |      i -> l[i] || ' ' || l[i + 1])) AS f
        |  FROM tk2),
        |fb AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5(f), 1, 15))::BIGINT % 256 AS b
        |  FROM feats),
        |bc AS (
        |  SELECT b, count(*)::BIGINT AS cr,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS ct
        |  FROM fb GROUP BY 1),
        |tt AS (SELECT sum(cr)::BIGINT AS tr, sum(ct)::BIGINT AS tt FROM bc),
        |lam AS (
        |  SELECT b, round(ln((ct + 0.5) / (tt.tt + 0.5 * 256)) -
        |                  ln((cr + 0.5) / (tt.tr + 0.5 * 256)), 6) AS w
        |  FROM bc, tt),
        |sc AS (
        |  SELECT fb.doc_id,
        |    round(sum(w::DECIMAL(28,6))::DOUBLE / count(*), 6) AS importance
        |  FROM fb JOIN lam USING (b) GROUP BY 1),
        |topd AS (
        |  SELECT doc_id, importance FROM sc
        |  ORDER BY importance DESC, doc_id LIMIT 50)
        |SELECT b2.lang, count(*)::BIGINT AS n_docs,
        |  round(sum(round(t.importance, 6)::DECIMAL(28,6))::DOUBLE, 6)
        |    AS sum_importance,
        |  min(b2.doc_id) AS first_id, max(b2.doc_id) AS last_id
        |FROM topd t JOIN base b2 ON b2.doc_id = t.doc_id
        |GROUP BY b2.lang ORDER BY lang""".stripMargin)),

    // Per-source corpus REPORT: doc/token counts, mean quality, and the
    // language-mix entropy (−Σ p·ln p over the source's language shares,
    // per-term rounding + DECIMAL sum for cross-engine exactness) — the
    // profile a curation run prints before/after each pipeline stage.
    QueryDef("q99_corpus_report",
      (s, dir) =>
        Quality.corpusReport(table(s, dir, "documents")).orderBy("source"),
      Some(s"""WITH d AS (SELECT doc_id, source, lang, text, $padded AS p
        |            FROM documents),
        |qd AS (
        |  SELECT doc_id, source, lang,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS n_tok,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS q
        |  FROM d),
        |per AS (
        |  SELECT source, count(*)::BIGINT AS n_docs,
        |         sum(n_tok)::BIGINT AS n_tokens,
        |         round(sum(q::DECIMAL(28,6))::DOUBLE / count(*), 6)
        |           AS mean_quality
        |  FROM qd GROUP BY source),
        |lc AS (
        |  SELECT source, lang, count(*)::BIGINT AS nl
        |  FROM qd GROUP BY 1, 2),
        |ent AS (
        |  SELECT lc.source,
        |    round(-sum(round((lc.nl::DOUBLE / per.n_docs)
        |        * ln(lc.nl::DOUBLE / per.n_docs), 6)::DECIMAL(28,6))::DOUBLE, 6)
        |      AS lang_entropy
        |  FROM lc JOIN per ON per.source = lc.source GROUP BY 1)
        |SELECT per.source, n_docs, n_tokens, mean_quality, lang_entropy
        |FROM per JOIN ent ON ent.source = per.source
        |ORDER BY per.source""".stripMargin)),

    // Quality-aware canonical selection (Clusters.keepBest): keep each
    // near-dup cluster's HIGHEST-quality member, smallest id on ties —
    // production dedup keeps the cleanest duplicate, not the first one.
    // Oracle: q55's transitive closure + the q33 quality replay + an
    // argmax per cluster.
    QueryDef("q100_dedup_keep_best",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8)
        val labels = Clusters.components(pairs, docs.select(col("doc_id")),
          idCol = "doc_id")
        val scores = docs.select(col("doc_id").as("id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score"))
        Clusters.keepBest(labels, scores).orderBy("cluster")
      },
      Some(keepBestOracleSql)),

    // FULL-corpus distributed Lloyd (Similarity.distributedKMeans): two
    // refinement iterations at k=8 over the 64-dim embeddings, from the
    // deterministic stride init. The oracle unrolls BOTH iterations —
    // round-6 L2² argmin assignment (list_reduce fold == sqL2's ordered
    // fold), per-dim DECIMAL mean rounded to 6 — so cluster sizes and
    // centroid norms hash-match exactly, iteration by iteration.
    QueryDef("q101_distributed_kmeans",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val cents = Similarity.distributedKMeans(emb, k = 8, iters = 2,
          dim = 64)
        Similarity.kmeansSummary(emb, cents).orderBy("cell")
      },
      Some(kmeansOracleSql)),

    // HyperLogLog register table (Sketches.hllRegisters): per-source
    // distinct-token sketches at b=7 (128 registers/source). The register
    // STATE is integer-only md5 bit arithmetic — fully replayable — while
    // the float estimator stays engine-side (SketchesSpec pins its
    // accuracy against exact distinct counts). This is the corpus-profile
    // cardinality pass that replaces a corpus-wide countDistinct shuffle
    // with grain×128 mergeable rows.
    QueryDef("q102_hll_registers",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val toks = docs.select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
        Sketches.hllRegisters(toks, "tok", b = 7, groupCols = Seq("source"))
          .orderBy("source", "bucket")
      },
      Some("""WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT source, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
        |  FROM tok),
        |parts AS (
        |  SELECT source, (h % 128)::INT AS bucket, h // 128 AS w FROM h),
        |rho AS (
        |  SELECT source, bucket,
        |    CASE WHEN w = 0 THEN 54 ELSE 54 - len(bin(w)) END::INT AS rho
        |  FROM parts)
        |SELECT source, bucket, max(rho) AS max_rho
        |FROM rho GROUP BY source, bucket
        |ORDER BY source, bucket""".stripMargin)),

    // Count-min heavy hitters (Sketches.cmCounters/cmEstimate): counters
    // built over the EVEN-doc-id half's tokens (the bounded, mergeable
    // d×w sketch a shard can afford), then probed with the ODD half's
    // vocabulary — the cross-shard hot-token pass where the probing side
    // never rescans the sketched corpus. Exact counts ride along to
    // exhibit the CM overestimate-only guarantee; integer-only, so the
    // whole pipeline replays in SQL.
    QueryDef("q103_cm_heavy_hitters",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val evenToks = docs.filter(col("doc_id") % 2 === 0)
          .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        val counters = Sketches.cmCounters(evenToks, "tok", d = 4, w = 512)
        val probes = docs.filter(col("doc_id") % 2 === 1)
          .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
          .distinct()
        val exact = evenToks.groupBy(col("tok"))
          .agg(count(lit(1)).as("exact_cnt"))
        Sketches.cmEstimate(counters, probes, "tok", d = 4, w = 512)
          .join(exact, Seq("tok"), "left")
          .select(col("tok"), col("cm_est"),
            coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
          .filter(col("cm_est") >= 40)
          .orderBy("tok")
      },
      Some("""WITH etok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents WHERE doc_id % 2 = 0),
        |counters AS (
        |  SELECT j, bucket, count(*)::BIGINT AS cnt FROM (
        |    SELECT js.j,
        |      ('0x' || substring(md5('cm' || js.j::VARCHAR || '_' || tok), 1, 15))::BIGINT
        |        % 512 AS bucket
        |    FROM etok, (SELECT unnest(generate_series(0, 3)) AS j) js)
        |  GROUP BY j, bucket),
        |probes AS (
        |  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents WHERE doc_id % 2 = 1),
        |est AS (
        |  SELECT p.tok, min(coalesce(c.cnt, 0)) AS cm_est FROM (
        |    SELECT tok, js.j,
        |      ('0x' || substring(md5('cm' || js.j::VARCHAR || '_' || tok), 1, 15))::BIGINT
        |        % 512 AS bucket
        |    FROM probes, (SELECT unnest(generate_series(0, 3)) AS j) js) p
        |  LEFT JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
        |  GROUP BY p.tok),
        |exact AS (SELECT tok, count(*)::BIGINT AS exact_cnt FROM etok GROUP BY tok)
        |SELECT e.tok, e.cm_est, coalesce(x.exact_cnt, 0) AS exact_cnt
        |FROM est e LEFT JOIN exact x ON x.tok = e.tok
        |WHERE e.cm_est >= 40
        |ORDER BY e.tok""".stripMargin)),

    // Supervised quality classifier (Classifier.trainNb/scoreNb): the
    // GPT-3/Llama "looks like the curated corpus" filter as multinomial
    // NB over hashed unigrams — train on the 80% split with lang='en' as
    // the curated class, score the 20% holdout. The oracle retrains the
    // whole model (priors, Laplace counts, round-6 ln-ratio weights,
    // unseen-bucket default) and replays the DECIMAL score sums.
    QueryDef("q104_nb_quality_classifier",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val model = Classifier.trainNb(docs.filter(col("doc_id") % 5 < 4),
          positive = col("lang") === "en", nBuckets = 4096)
        Classifier.scoreNb(model, docs.filter(col("doc_id") % 5 === 4))
          .orderBy("doc_id")
      },
      Some(nbOracleSql)),

    // The SAME NB scoring SERVED from a persisted model
    // (Classifier.ensure → save/load Bundle): the q85-vs-q79 / q97-vs-q86
    // pairing applied to the classifier — persistence must be
    // semantically invisible, so the oracle is exactly q104's; any drift
    // in the parquet round-trip of the weight table or the meta scalars
    // breaks the hash. `ensure` also exercises the reuse path on repeat
    // runs: the second Verify invocation scores from the saved model
    // without retraining.
    QueryDef("q106_nb_classifier_served",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val mDir = System.getProperty("java.io.tmpdir") +
          "/graft_nbmodel_q106_" + dataStamp(dir, "documents")
        val (model, _) = Classifier.ensure(docs.filter(col("doc_id") % 5 < 4),
          mDir, positive = col("lang") === "en", nBuckets = 4096,
          labelTag = "lang=en")
        Classifier.scoreNb(model, docs.filter(col("doc_id") % 5 === 4))
          .orderBy("doc_id")
      },
      Some(nbOracleSql)),


    // Hybrid retrieval SERVED from the two persisted indexes
    // (Retrieval.hybridServeTopK): BM25 top-10 from the saved inverted
    // index + ANN top-10 from the saved IVF-ADC index, reciprocal-rank-
    // fused (Cormack et al. 2009, c=60) with component ranks riding along.
    // The oracle nests the COMPLETE q86/q97 and q79/q85 replays as CTEs
    // and fuses their rankings with the same round-6 reciprocal terms +
    // DECIMAL sum + smaller-id tie-break, so the fused ranking is cross-
    // engine exact end to end. Query 3 exists only on the ANN side — a
    // query may appear in any subset of the rankings.
    QueryDef("q105_rrf_hybrid_serve",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val emb = table(s, dir, "embeddings")
        val bmDir = System.getProperty("java.io.tmpdir") +
          "/graft_bm25ix_q105_" + dataStamp(dir, "documents")
        val annDir = System.getProperty("java.io.tmpdir") +
          "/graft_annix_q105_" + dataStamp(dir, "embeddings")
        Retrieval.ensureIndex(docs, bmDir)
        AnnIndex.ensure(emb, annDir,
          AnnIndex.Params(dim = 64, m = 8, k = 16, kCells = 16, iters = 0,
            sampleN = 4096))
        val tq = s.createDataFrame(
            Seq(0L -> "spark shuffle hash join", 1L -> "customer order query",
              2L -> "vector window scan"))
          .toDF("query_id", "query_text")
        Retrieval.hybridServeTopK(s, bmDir, annDir, tq,
            emb.filter(col("vec_id") < 4), k = 10,
            vecQueryIdCol = "vec_id")
          .orderBy("query_id", "rank")
      },
      Some(rrfHybridOracleSql)),

    // Sparse-or-dense HLL state (Sketches.hllSparseState, the HLL++
    // refinement): per-(source, lang) distinct-token cardinality state at
    // threshold 30 — the sf0.01 grain straddles the threshold, so BOTH
    // representations appear: small groups hold their exact distinct
    // hashes (kind 0), large groups the b=7 registers (kind 1). The
    // whole table — including the promotion decision — is integer md5
    // arithmetic, replayed by the oracle; the float estimator stays
    // spec-side (SketchesSpec: sparse groups are EXACT, dense in-band).
    QueryDef("q107_hll_sparse_state",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val toks = docs.select(col("source"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        Sketches.hllSparseState(toks, "tok", b = 7, threshold = 30,
            groupCols = Seq("source", "lang"))
          .orderBy("source", "lang", "kind", "k")
      },
      Some("""WITH tok AS (
        |  SELECT source, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT DISTINCT source, lang,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
        |  FROM tok),
        |cnt AS (SELECT source, lang, count(*) AS n FROM h GROUP BY 1, 2),
        |sp AS (
        |  SELECT source, lang, 0 AS kind, h AS k, NULL::INT AS v
        |  FROM h JOIN cnt USING (source, lang) WHERE n <= 30),
        |dn AS (
        |  SELECT source, lang, 1 AS kind, (h % 128)::BIGINT AS k,
        |    max(CASE WHEN h // 128 = 0 THEN 54
        |             ELSE 54 - len(bin(h // 128)) END)::INT AS v
        |  FROM h JOIN cnt USING (source, lang) WHERE n > 30
        |  GROUP BY 1, 2, 4)
        |SELECT * FROM (SELECT * FROM sp UNION ALL SELECT * FROM dn)
        |ORDER BY source, lang, kind, k""".stripMargin)),

    // Sketch-augmented corpus dashboard: q99's per-source report joined
    // with the HLL distinct-token ESTIMATE (b=7 registers through the
    // exact-integer harmonic accumulator — the oracle replays the whole
    // estimator including the linear-counting branch, term-for-term) and
    // the count-min heavy-hitter count (global d=4×w=512 sketch, probed
    // with each source's vocabulary; integer mins, threshold 500). The
    // batch twin of StreamingReport.report + distinctReport on one grain:
    // what the curation dashboard actually renders.
    QueryDef("q108_sketch_dashboard",
      (s, dir) => sketchDashboardFrame(s, dir).orderBy("source"),
      Some(sketchDashboardOracleSql)),

    // Farthest-point seeding + full-corpus Lloyd (Similarity.farthestInit
    // → distributedKMeans): the deterministic, hash-seeded k-means||-
    // style alternative to q101's stride init — corpus-representative
    // seeds with NO first-ids bias, every admission and both refinement
    // iterations replayed by the oracle (SimilaritySpec additionally pins
    // WCSS at-least-as-good-as-stride on a skewed corpus the stride init
    // cannot seed).
    QueryDef("q109_kmeans_farthest_init",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val init = Similarity.farthestInit(emb, k = 4, dim = 64)
        val cents = Similarity.distributedKMeans(emb, k = 4, iters = 2,
          dim = 64, init = Some(init))
        Similarity.kmeansSummary(emb, cents).orderBy("cell")
      },
      Some(kmeansFarthestOracleSql)),

    // Sparse-or-dense estimates end to end (Sketches.hllSparseEstimate
    // over q107's state): sparse groups answer their EXACT distinct count
    // (an integer — the sparse mode's whole point), dense groups go
    // through the same fully-replayed estimator q108 pins. Every output
    // row of the mixed-representation table hash-matches DuckDB.
    QueryDef("q110_hll_sparse_estimates",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val toks = docs.select(col("source"), col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        Sketches.hllSparseEstimate(
            Sketches.hllSparseState(toks, "tok", b = 7, threshold = 30,
              groupCols = Seq("source", "lang")),
            7, Seq("source", "lang"))
          .select(col("source"), col("lang"),
            round(col("est_distinct"), 6).as("est_distinct"))
          .orderBy("source", "lang")
      },
      Some("""WITH tok AS (
        |  SELECT source, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT DISTINCT source, lang,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
        |  FROM tok),
        |cnt AS (SELECT source, lang, count(*) AS n FROM h GROUP BY 1, 2),
        |sp AS (
        |  SELECT source, lang, round(n::DOUBLE, 6) AS est_distinct
        |  FROM cnt WHERE n <= 30),
        |hreg AS (
        |  SELECT h.source, h.lang, (h.h % 128)::INT AS bucket,
        |    max(CASE WHEN h.h // 128 = 0 THEN 54
        |             ELSE 54 - len(bin(h.h // 128)) END)::INT AS max_rho
        |  FROM h JOIN cnt USING (source, lang) WHERE cnt.n > 30
        |  GROUP BY 1, 2, 3),
        |hz AS (
        |  SELECT source, lang,
        |    sum(((1::BIGINT) << (54 - max_rho))::DECIMAL(38,0)) AS zs,
        |    count(*)::BIGINT AS nb
        |  FROM hreg GROUP BY 1, 2),
        |dn AS (
        |  SELECT source, lang,
        |    CASE WHEN e <= 2.5 * 128 AND zeros > 0
        |         THEN round(128 * ln(128.0 / zeros), 6)
        |         ELSE round(e, 6) END AS est_distinct
        |  FROM (SELECT source, lang,
        |          0.7213 / (1 + 1.079 / 128.0) * 128 * 128 * 18014398509481984.0
        |            / ((zs + (128 - nb)::DECIMAL(38,0) * 18014398509481984)::DOUBLE)
        |            AS e,
        |          128 - nb AS zeros
        |        FROM hz))
        |SELECT * FROM (SELECT * FROM sp UNION ALL SELECT * FROM dn)
        |ORDER BY source, lang""".stripMargin)),

    // Bucketed co-located join: both tables are persisted bucketed (16
    // buckets, sorted) by their join key, so the doc⋈embedding join plans
    // as a SortMergeJoin with NO ShuffleExchange under it (PlanSpec-
    // pinned) — the storage-level co-location a 100 TB pipeline uses for
    // its recurring fact-to-fact joins instead of re-shuffling 100 TB per
    // query. First run writes the bucketed copies (data-stamped
    // warehouse); later sessions re-register the existing files as an
    // external bucketed table, so steady state pays zero write cost. The
    // merge hint only forces the JOIN STRATEGY choice at this tiny sf
    // (broadcast would win below the threshold and hide the property
    // being exercised); at production scale SMJ is what the planner picks
    // anyway, and bucketing is what deletes its exchanges.
    QueryDef("q111_bucketed_colocated_join",
      (s, dir) => {
        val stamp = dataStamp(dir, "documents", "embeddings")
        val base = System.getProperty("java.io.tmpdir") +
          s"/graft_bucketed_$stamp"
        def ensureBucketed(name: String, df: org.apache.spark.sql.DataFrame,
                           key: String): String = {
          val tbl = s"graft_${name}_$stamp"
          if (!s.catalog.tableExists(tbl)) {
            val loc = s"$base/$name"
            if (graft.sources.Bundle.exists(loc))
              s.sql(s"CREATE TABLE `$tbl` (${df.schema.toDDL}) USING parquet " +
                s"CLUSTERED BY ($key) SORTED BY ($key) INTO 16 BUCKETS " +
                s"LOCATION '$loc'")
            else
              df.write.bucketBy(16, key).sortBy(key)
                .option("path", loc).saveAsTable(tbl)
          }
          tbl
        }
        val d = s.table(ensureBucketed("docs", table(s, dir, "documents"),
          "doc_id"))
        val e = s.table(ensureBucketed("emb", table(s, dir, "embeddings"),
          "vec_id"))
        d.join(e.hint("merge"), d("doc_id") === e("vec_id"))
          .select(col("lang"),
            round(sqrt(VectorFunctions.dot(
              VectorFunctions.asDouble(col("embedding")),
              VectorFunctions.asDouble(col("embedding")))), 6).as("_nrm"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("_nrm").cast("decimal(28,6)")).cast("double"), 6)
              .as("sum_norm"))
          .orderBy("lang")
      },
      Some("""SELECT d.lang, count(*) AS n,
        |  round(sum(round(sqrt(list_dot_product(e.embedding::DOUBLE[],
        |    e.embedding::DOUBLE[])), 6)::DECIMAL(28,6))::DOUBLE, 6)
        |    AS sum_norm
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin)),

    // Moments-sketch quantile state (Sketches.momentsState, the msketch
    // of Gan et al. 2018): per-source power sums over the quality score —
    // SEVEN numbers per group replace the full per-group sort a quantile
    // dashboard would otherwise shuffle for. Every power term is round-6
    // + DECIMAL-summed with the same multiplication order both engines
    // use, so the state hash-matches exactly; the Cornish-Fisher
    // estimator stays spec-side (SketchesSpec pins it against exact
    // percentiles). Completes the sketch triad: cardinality (q102),
    // frequency (q103), quantiles (q112).
    QueryDef("q112_moments_quantile_state",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // Output surface follows the house round-6-double discipline:
        // the sums are <= 6 dp and ~1e2 magnitude, double-exact, so the
        // cast loses nothing — DECIMAL stays internal (merge grain).
        Sketches.momentsState(
            docs.select(col("source"),
              round(TextFunctions.qualityScore(col("text")), 6).as("q")),
            "q", Seq("source"))
          .select(col("source"), col("n"),
            round(col("s1").cast("double"), 6).as("s1"),
            round(col("s2").cast("double"), 6).as("s2"),
            round(col("s3").cast("double"), 6).as("s3"),
            round(col("s4").cast("double"), 6).as("s4"),
            col("lo"), col("hi"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
        |            FROM documents),
        |$momentsStateOracleBody
        |SELECT source, n, round(s1::DOUBLE, 6) AS s1,
        |  round(s2::DOUBLE, 6) AS s2, round(s3::DOUBLE, 6) AS s3,
        |  round(s4::DOUBLE, 6) AS s4, lo, hi
        |FROM st ORDER BY source""".stripMargin)),

    // The Cornish-Fisher estimator itself, cross-engine (the last float
    // estimator in the engine without an oracle): per-source p50/p90
    // quality quantiles from the q112 moments state. Every arithmetic
    // step — DECIMAL→double casts, the central-moment chain, sqrt, the
    // skew guard, the z constants (embedded as round-trip double
    // literals), the clamp — is written in the SAME operation order in
    // both engines, so round-6 estimates hash-match exactly.
    QueryDef("q113_quantile_dashboard",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Sketches.momentsQuantiles(
            Sketches.momentsState(
              docs.select(col("source"),
                round(TextFunctions.qualityScore(col("text")), 6).as("q")),
              "q", Seq("source")),
            Seq(0.5, 0.9), Seq("source"))
          .select(col("source"), col("q"), round(col("est"), 6).as("est"))
          .orderBy("source", "q")
      },
      Some(momentsQuantileOracleSql)),

    // k-means|| oversampled seeding (Similarity.oversampleInit) + the
    // same full-corpus Lloyd refinement and summary tail as q109 — the
    // LARGE-k init a 100 TB IVF index trains with (rounds+1 corpus
    // passes independent of k, vs farthestInit's k−1). The oracle
    // unrolls every stage: hash-ordered seed, three rounds of top-l
    // admissions by carried min round-6 cost, the corpus weighting
    // pass, the greedy weighted k-means++ recluster and both weighted
    // Lloyd sweeps (raw-double folds replayed in the engine's exact
    // accumulation order via ordered list_reduce), then the round-6
    // Lloyd refinement via lloydIterSql.
    QueryDef("q114_kmeans_oversample_init",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val init = Similarity.oversampleInit(emb, k = 4, dim = 64,
          rounds = 3, reclusterIters = 2)
        val cents = Similarity.distributedKMeans(emb, k = 4, iters = 2,
          dim = 64, init = Some(init))
        Similarity.kmeansSummary(emb, cents).orderBy("cell")
      },
      Some(kmeansOversampleOracleSql)),

    // The moments state at the (source, lang) grain — the shape the
    // streaming quantile report now keys (matching the sparse-distinct
    // leg, so one dashboard can join all three sketch families on one
    // grain). Same round-6-double output surface as q112; the DECIMAL
    // accumulators stay internal.
    QueryDef("q115_moments_state_by_lang",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Sketches.momentsState(
            docs.select(col("source"), col("lang"),
              round(TextFunctions.qualityScore(col("text")), 6).as("q")),
            "q", Seq("source", "lang"))
          .select(col("source"), col("lang"), col("n"),
            round(col("s1").cast("double"), 6).as("s1"),
            round(col("s2").cast("double"), 6).as("s2"),
            round(col("s3").cast("double"), 6).as("s3"),
            round(col("s4").cast("double"), 6).as("s4"),
            col("lo"), col("hi"))
          .orderBy("source", "lang")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, lang, text, $padded AS p
        |            FROM documents),
        |${momentsStateOracleBodyFor("source, lang")}
        |SELECT source, lang, n, round(s1::DOUBLE, 6) AS s1,
        |  round(s2::DOUBLE, 6) AS s2, round(s3::DOUBLE, 6) AS s3,
        |  round(s4::DOUBLE, 6) AS s4, lo, hi
        |FROM st ORDER BY source, lang""".stripMargin)),

    // The unified sketch dashboard: q108's per-source report (profile +
    // HLL distinct + count-min heavy hitters) joined with the p50/p90
    // quality estimates from the moments state — one query serving all
    // three sketch families, every sketch side bounded and broadcast
    // (PlanSpec-pinned). The oracle extends q108's full replay with the
    // q113 Cornish-Fisher chain pivoted to columns.
    QueryDef("q116_sketch_dashboard_quantiles",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val piv = Sketches.momentsQuantiles(
            Sketches.momentsState(
              docs.select(col("source"),
                round(TextFunctions.qualityScore(col("text")), 6).as("q")),
              "q", Seq("source")),
            Seq(0.5, 0.9), Seq("source"))
          .groupBy(col("source"))
          .agg(
            round(max(when(col("q") === 0.5, col("est"))), 6)
              .as("p50_quality"),
            round(max(when(col("q") === 0.9, col("est"))), 6)
              .as("p90_quality"))
        sketchDashboardFrame(s, dir)
          .join(broadcast(piv), Seq("source"), "left")
          .orderBy("source")
      },
      Some(sketchDashboardQuantilesOracleSql)),

    // Quantile serving from the PERSISTED moments store (Sketches
    // .ensureMomentsState): the profile job builds the (source, lang)
    // state once as a Bundle (data-stamped dir, T2 manifest); this
    // query serves p50/p90 from the SAVED 7-number rows without
    // rescanning the corpus on a warm store. The oracle recomputes the
    // estimates from the raw corpus — persistence must be semantically
    // invisible (the q106-vs-q104 discipline for the sketch family).
    QueryDef("q117_quantile_store_served",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_momstore_${dataStamp(dir, "documents")}"
        val docs = table(s, dir, "documents")
        val (state, _) = Sketches.ensureMomentsState(
          docs.select(col("source"), col("lang"),
            round(TextFunctions.qualityScore(col("text")), 6).as("q")),
          store, "q", Seq("source", "lang"))
        Sketches.momentsQuantiles(state, Seq(0.5, 0.9),
            Seq("source", "lang"))
          .select(col("source"), col("lang"), col("q"),
            round(col("est"), 6).as("est"))
          .orderBy("source", "lang", "q")
      },
      Some(momentsQuantileOracleSqlFor("source, lang"))),

    // Near-dup lookup from the PERSISTED LSH index (LshIndex — the text
    // twin of AnnIndex): the canonical 80% of the corpus is indexed once
    // (signatures + star-capped band buckets as a Bundle, data-stamped
    // dir, T2 manifest); the held-out 20% plays the incoming crawl batch
    // and is hashed with the manifest's parameters, joined against the
    // saved buckets, and verified by estimated Jaccard. The oracle
    // recomputes both sides from raw documents, including the build-time
    // cap — persistence must be semantically invisible.
    QueryDef("q118_neardup_index_served",
      (s, dir) => {
        val ixDir = System.getProperty("java.io.tmpdir") +
          s"/graft_lshix_${dataStamp(dir, "documents")}"
        val docs = table(s, dir, "documents")
        LshIndex.ensure(docs.filter(col("doc_id") % 5 =!= 4), ixDir,
          LshIndex.Params(verifiable = true))
        LshIndex.serveNearDups(s, ixDir,
            docs.filter(col("doc_id") % 5 === 4), threshold = 0.5)
          .orderBy("query_id", "id")
      },
      Some(minhashLshServeOracle("doc_id % 5 <> 4", "doc_id % 5 = 4",
        threshold = 0.5, maxBucketSize = 4096))),

    // Deterministic weighted sampling WITHOUT replacement (A-ES): the
    // "pick the n best-weighted representatives per stratum, but
    // stochastically" selection a curation recipe uses where top-n is
    // too greedy and Bernoulli ignores weights. The oracle replays the
    // exact-53-bit uniform, the round-6 ln(u)/w key, and the per-source
    // ranking; heavier documents win systematically but not
    // deterministically by weight alone.
    QueryDef("q119_weighted_sample",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Sampling.weightedSample(
            docs.select(col("doc_id"), col("source"),
              round(TextFunctions.qualityScore(col("text")), 6).as("w")),
            n = 5, weightCol = "w", strataCol = "source")
          .select(col("source"), col("rank"), col("doc_id"), col("w"),
            col("_sk").as("skey"))
          .orderBy("source", "rank")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
        |            FROM documents),
        |qd AS (
        |  SELECT doc_id, source,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS w
        |  FROM d),
        |u AS (
        |  SELECT doc_id, source, w,
        |    ((('0x' || substring(md5('graft_' || doc_id::VARCHAR), 1, 15))::BIGINT
        |      % 9007199254740991 + 1)::DOUBLE / 9007199254740992.0) AS u
        |  FROM qd WHERE w > 0),
        |k AS (SELECT doc_id, source, w, round(ln(u) / w, 6) AS skey FROM u),
        |r AS (
        |  SELECT source, doc_id, w, skey,
        |    row_number() OVER (PARTITION BY source ORDER BY skey DESC, doc_id)
        |      AS rank
        |  FROM k)
        |SELECT source, rank, doc_id, w, skey FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin)),

    // Sketch set operations (Sketches.hllOverlapMatrix): the pairwise
    // source overlap/containment matrix dedup PLANNING needs ("how much
    // of source A already sits in source B") from ONE register build —
    // HLL registers are closed under union (max-merge), so intersection
    // is inclusion-exclusion on the round-6 estimates and no cross-source
    // document join ever runs. The oracle replays the b=7 estimator
    // (integer registers, DECIMAL(38,0) scaled harmonic accumulator, both
    // float branches) THREE times — per source, and per pair over the
    // max-merged union registers — then the same one-op arithmetic.
    QueryDef("q123_source_overlap_matrix",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val toks = docs.select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        Sketches.hllOverlapMatrix(
            Sketches.hllRegisters(toks, "tok", b = 7,
              groupCols = Seq("source")),
            b = 7, groupCol = "source")
          .withColumnRenamed("g1", "source_a")
          .withColumnRenamed("g2", "source_b")
          .orderBy("source_a", "source_b")
      },
      Some("""WITH tok AS (
        |  SELECT source,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents),
        |hreg AS (
        |  SELECT source, (h % 128)::INT AS bucket,
        |    max(CASE WHEN h // 128 = 0 THEN 54
        |             ELSE 54 - len(bin(h // 128)) END)::INT AS max_rho
        |  FROM (SELECT source,
        |          ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tok)
        |  GROUP BY 1, 2),
        |sz AS (
        |  SELECT source,
        |    sum(((1::BIGINT) << (54 - max_rho))::DECIMAL(38,0)) AS zs,
        |    count(*)::BIGINT AS nb
        |  FROM hreg GROUP BY source),
        |sest AS (
        |  SELECT source,
        |    CASE WHEN e <= 2.5 * 128 AND zeros > 0
        |         THEN round(128 * ln(128.0 / zeros), 6)
        |         ELSE round(e, 6) END AS est
        |  FROM (SELECT source,
        |          0.7213 / (1 + 1.079 / 128.0) * 128 * 128 * 18014398509481984.0
        |            / ((zs + (128 - nb)::DECIMAL(38,0) * 18014398509481984)::DOUBLE)
        |            AS e,
        |          128 - nb AS zeros
        |        FROM sz)),
        |pairs AS (
        |  SELECT a.source AS g1, b.source AS g2
        |  FROM (SELECT DISTINCT source FROM hreg) a
        |  JOIN (SELECT DISTINCT source FROM hreg) b ON a.source < b.source),
        |ureg AS (
        |  SELECT g1, g2, bucket, max(max_rho) AS max_rho FROM (
        |    SELECT p.g1, p.g2, h.bucket, h.max_rho
        |    FROM pairs p JOIN hreg h ON h.source = p.g1
        |    UNION ALL
        |    SELECT p.g1, p.g2, h.bucket, h.max_rho
        |    FROM pairs p JOIN hreg h ON h.source = p.g2)
        |  GROUP BY 1, 2, 3),
        |uz AS (
        |  SELECT g1, g2,
        |    sum(((1::BIGINT) << (54 - max_rho))::DECIMAL(38,0)) AS zs,
        |    count(*)::BIGINT AS nb
        |  FROM ureg GROUP BY 1, 2),
        |uest AS (
        |  SELECT g1, g2,
        |    CASE WHEN e <= 2.5 * 128 AND zeros > 0
        |         THEN round(128 * ln(128.0 / zeros), 6)
        |         ELSE round(e, 6) END AS est_union
        |  FROM (SELECT g1, g2,
        |          0.7213 / (1 + 1.079 / 128.0) * 128 * 128 * 18014398509481984.0
        |            / ((zs + (128 - nb)::DECIMAL(38,0) * 18014398509481984)::DOUBLE)
        |            AS e,
        |          128 - nb AS zeros
        |        FROM uz)),
        |m AS (
        |  SELECT u.g1 AS source_a, u.g2 AS source_b, a.est AS est_a,
        |    b.est AS est_b, u.est_union,
        |    round(least(greatest(a.est + b.est - u.est_union, 0.0),
        |                least(a.est, b.est)), 6) AS est_inter
        |  FROM uest u
        |  JOIN sest a ON a.source = u.g1
        |  JOIN sest b ON b.source = u.g2)
        |SELECT source_a, source_b, est_a, est_b, est_union, est_inter,
        |  round(est_inter / est_union, 6) AS jaccard_est,
        |  round(est_inter / least(est_a, est_b), 6) AS containment
        |FROM m ORDER BY source_a, source_b""".stripMargin)),

    // Corpus snapshot versioning (Snapshot.scd2Init/scd2Apply): merge a
    // refreshed snapshot (some docs revised, some deleted, some added)
    // into a type-2 history — every key's lifetime is [valid_from,
    // valid_to) version intervals, change detection by portable md5 row
    // hash, ONE full-outer key join per refresh. The oracle derives the
    // same two snapshot versions and states the merge declaratively
    // (carried / closed / opened rows from a FULL JOIN).
    QueryDef("q124_scd2_snapshot_merge",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val v1 = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("lang"), col("text"))
        val v2 = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("lang"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text")).as("text"))
        val h1 = Snapshot.scd2Init(v1, "doc_id", Seq("lang", "text"), 1L)
        Snapshot.scd2Apply(h1, v2, "doc_id", Seq("lang", "text"), 2L)
          .select(col("doc_id"), col("row_hash"), col("valid_from"),
            col("valid_to"))
          .orderBy(col("doc_id"), col("valid_from"))
      },
      Some("""WITH v1 AS (
        |  SELECT doc_id, md5(coalesce(lang, chr(0)) || chr(1) ||
        |    coalesce(text, chr(0))) AS h
        |  FROM documents WHERE doc_id % 10 <> 0),
        |v2 AS (
        |  SELECT doc_id, md5(coalesce(lang, chr(0)) || chr(1) || coalesce(
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END,
        |    chr(0))) AS h
        |  FROM documents WHERE doc_id % 7 <> 0),
        |j AS (
        |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, v1.h AS h1,
        |    v2.h AS h2
        |  FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc_id, row_hash, valid_from, valid_to FROM (
        |  SELECT doc_id, h1 AS row_hash, 1::BIGINT AS valid_from,
        |    CASE WHEN h2 IS NULL OR h2 <> h1 THEN 2::BIGINT END AS valid_to
        |  FROM j WHERE h1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, h2, 2::BIGINT, NULL::BIGINT
        |  FROM j WHERE h1 IS NULL OR h1 <> h2)
        |ORDER BY doc_id, valid_from""".stripMargin)),

    // Version-to-version corpus diff (Snapshot.diff): which keys were
    // added / removed / changed between v1 and v2, answered from the
    // HISTORY alone — two snapshotAt filters + one key join; the corpus
    // parquet is never re-scanned at diff time.
    QueryDef("q125_snapshot_diff",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val v1 = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("lang"), col("text"))
        val v2 = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("lang"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text")).as("text"))
        val hist = Snapshot.scd2Apply(
          Snapshot.scd2Init(v1, "doc_id", Seq("lang", "text"), 1L),
          v2, "doc_id", Seq("lang", "text"), 2L)
        Snapshot.diff(hist, 1L, 2L, "doc_id").orderBy("doc_id")
      },
      Some("""WITH v1 AS (
        |  SELECT doc_id, md5(coalesce(lang, chr(0)) || chr(1) ||
        |    coalesce(text, chr(0))) AS h
        |  FROM documents WHERE doc_id % 10 <> 0),
        |v2 AS (
        |  SELECT doc_id, md5(coalesce(lang, chr(0)) || chr(1) || coalesce(
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END,
        |    chr(0))) AS h
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.h IS NULL THEN 'added'
        |       WHEN v2.h IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  v1.h AS hash_from, v2.h AS hash_to
        |FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id
        |WHERE v1.h IS NULL OR v2.h IS NULL OR v1.h <> v2.h
        |ORDER BY doc_id""".stripMargin)),

    // Z-order (Morton) layout (Layout.quantize/zValue/
    // zorderFileAssignment/fileStats): cluster the corpus so that BOTH
    // the token-count and quality dimensions skip files under min/max
    // pruning — the lakehouse OPTIMIZE ZORDER pass as deterministic
    // integer bit math. The oracle replays the whole layout: the quality
    // chain, the [0,2^8) quantization, the 8-bit interleave as shift/
    // mask SQL, the global (zv, doc_id) rank, the integer-div file
    // assignment, and the per-file min/max boxes. LayoutSpec asserts the
    // pruning CLAIM itself (a box predicate touches fewer files than
    // under a single-column sort).
    QueryDef("q126_zorder_layout",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val base = docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tok"),
          round(TextFunctions.qualityScore(col("text")), 6).as("q"))
        val cells = base
          .withColumn("xq", Layout.quantize(col("n_tok").cast("double"),
            0.0, 1024.0, 8))
          .withColumn("yq", Layout.quantize(col("q"), 0.0, 1.0, 8))
        val assigned = Layout.zorderFileAssignment(cells,
          Layout.zValue(col("xq"), col("yq"), 8), col("doc_id"),
          nFiles = 16)
        Layout.fileStats(assigned, Seq("n_tok", "q")).orderBy("file_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
        |            FROM documents),
        |qd AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |      AS n_tok,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS q
        |  FROM d),
        |cells AS (
        |  SELECT doc_id, n_tok, q,
        |    least(255, greatest(0,
        |      floor((n_tok::DOUBLE - 0.0) / 1024.0 * 256)::BIGINT)) AS xq,
        |    least(255, greatest(0,
        |      floor((q - 0.0) / 1.0 * 256)::BIGINT)) AS yq
        |  FROM qd),
        |z AS (
        |  SELECT doc_id, n_tok, q, ${zInterleaveSql("xq", "yq", 8)} AS zv
        |  FROM cells),
        |r AS (
        |  SELECT n_tok, q,
        |    row_number() OVER (ORDER BY zv, doc_id) AS rn,
        |    count(*) OVER () AS total
        |  FROM z),
        |f AS (SELECT ((rn - 1) * 16) // total AS file_id, n_tok, q FROM r)
        |SELECT file_id, count(*)::BIGINT AS n,
        |  min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok,
        |  min(q) AS min_q, max(q) AS max_q
        |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin)),

    // Workload-level pruning evaluation (Layout.pruneReport) over the
    // q126 layout: for each named box of a representative query workload,
    // the files and rows a footer-box skipping reader keeps vs the
    // totals — the harness that turns a layout choice into measured
    // skipping numbers BEFORE it serves (the LayoutSpec hilbert-vs-morton
    // battery is this same measure; HERE the morton numbers are
    // oracle-gated because the Morton interleave replays in SQL). One
    // tiny aggregation per box over the 16-row stats table.
    QueryDef("q190_prune_report",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val base = docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tok"),
          round(TextFunctions.qualityScore(col("text")), 6).as("q"))
        val cells = base
          .withColumn("xq", Layout.quantize(col("n_tok").cast("double"),
            0.0, 1024.0, 8))
          .withColumn("yq", Layout.quantize(col("q"), 0.0, 1.0, 8))
        val assigned = Layout.zorderFileAssignment(cells,
          Layout.zValue(col("xq"), col("yq"), 8), col("doc_id"),
          nFiles = 16)
        Layout.pruneReport(Layout.fileStats(assigned, Seq("n_tok", "q")),
            Seq(
              "b1_center" -> Map("n_tok" -> (30.0, 60.0),
                "q" -> (0.55, 0.75)),
              "b2_ntok_band" -> Map("n_tok" -> (20.0, 40.0)),
              "b3_corner" -> Map("n_tok" -> (80.0, 99.0),
                "q" -> (0.0, 0.3))))
          .orderBy("box")
      },
      Some {
        def arm(name: String, pred: String): String =
          s"""SELECT '$name' AS box,
             |  count(*)::BIGINT AS files_kept,
             |  (SELECT count(DISTINCT file_id) FROM f)::BIGINT
             |    AS files_total,
             |  coalesce(sum(n), 0)::BIGINT AS rows_kept,
             |  (SELECT count(*) FROM f)::BIGINT AS rows_total
             |FROM fs WHERE $pred""".stripMargin
        s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
        |            FROM documents),
        |qd AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |      AS n_tok,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS q
        |  FROM d),
        |cells AS (
        |  SELECT doc_id, n_tok, q,
        |    least(255, greatest(0,
        |      floor((n_tok::DOUBLE - 0.0) / 1024.0 * 256)::BIGINT)) AS xq,
        |    least(255, greatest(0,
        |      floor((q - 0.0) / 1.0 * 256)::BIGINT)) AS yq
        |  FROM qd),
        |z AS (
        |  SELECT doc_id, n_tok, q, ${zInterleaveSql("xq", "yq", 8)} AS zv
        |  FROM cells),
        |r AS (
        |  SELECT n_tok, q,
        |    row_number() OVER (ORDER BY zv, doc_id) AS rn,
        |    count(*) OVER () AS total
        |  FROM z),
        |f AS (SELECT ((rn - 1) * 16) // total AS file_id, n_tok, q FROM r),
        |fs AS (
        |  SELECT file_id, count(*)::BIGINT AS n,
        |    min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok,
        |    min(q) AS min_q, max(q) AS max_q
        |  FROM f GROUP BY file_id)
        |${arm("b1_center",
            "max_n_tok >= 30 AND min_n_tok <= 60 AND max_q >= 0.55 AND min_q <= 0.75")}
        |UNION ALL
        |${arm("b2_ntok_band", "max_n_tok >= 20 AND min_n_tok <= 40")}
        |UNION ALL
        |${arm("b3_corner",
            "max_n_tok >= 80 AND min_n_tok <= 99 AND max_q >= 0.0 AND min_q <= 0.3")}
        |ORDER BY box""".stripMargin
      }),

    // Per-file BLOOM skipping (Layout.fileBloom/bloomProbe) over the q126
    // layout: the probe shape min/max boxes CANNOT prune — doc_id is
    // uniform across files under any curve, so every footer box contains
    // every probed id and filesTouched keeps all 16 files; the Bloom
    // index keeps ~1. Hashing is the engine's portable md5 double-hash,
    // so the oracle replays the ENTIRE chain — corpus bit positions,
    // sparse bitmap words, probe masks, per-file coverage — and the
    // report (probe, files_kept, files_total) is hash-gated end to end
    // (false positives included: both engines compute the same bits).
    QueryDef("q191_bloom_file_skipping",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        val base = docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tok"),
          round(TextFunctions.qualityScore(col("text")), 6).as("q"))
        val cells = base
          .withColumn("xq", Layout.quantize(col("n_tok").cast("double"),
            0.0, 1024.0, 8))
          .withColumn("yq", Layout.quantize(col("q"), 0.0, 1.0, 8))
        val assigned = Layout.zorderFileAssignment(cells,
          Layout.zValue(col("xq"), col("yq"), 8), col("doc_id"),
          nFiles = 16)
        val bloom = Layout.fileBloom(assigned, "doc_id")
        val probes = Seq(7L, 123L, 467L).toDF("doc_id")
        val tot = assigned.agg(
          countDistinct(col("file_id")).as("files_total"))
        Layout.bloomProbe(bloom, probes, "doc_id")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("files_kept"))
          .crossJoin(broadcast(tot))
          .select(col("doc_id"), col("files_kept"), col("files_total"))
          .orderBy("doc_id")
      },
      Some {
        def posSql(rel: String, keep: String): String =
          s"""SELECT $keep,
             |  (('0x' || substring(md5('bf_' || doc_id::VARCHAR), 1, 15))::BIGINT
             |   + i * ('0x' || substring(md5('bf_' || doc_id::VARCHAR), 16, 15))::BIGINT)
             |  % 16384 AS p
             |FROM $rel, (SELECT unnest(generate_series(0, 4)) AS i)"""
            .stripMargin
        s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
        |            FROM documents),
        |qd AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |      AS n_tok,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS q
        |  FROM d),
        |cells AS (
        |  SELECT doc_id, n_tok, q,
        |    least(255, greatest(0,
        |      floor((n_tok::DOUBLE - 0.0) / 1024.0 * 256)::BIGINT)) AS xq,
        |    least(255, greatest(0,
        |      floor((q - 0.0) / 1.0 * 256)::BIGINT)) AS yq
        |  FROM qd),
        |z AS (
        |  SELECT doc_id, ${zInterleaveSql("xq", "yq", 8)} AS zv
        |  FROM cells),
        |r AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY zv, doc_id) AS rn,
        |    count(*) OVER () AS total
        |  FROM z),
        |f AS (SELECT ((rn - 1) * 16) // total AS file_id, doc_id FROM r),
        |cpos AS (${posSql("f", "file_id")}),
        |bm AS (
        |  SELECT file_id, p // 63 AS word,
        |         bit_or(1::BIGINT << (p % 63)::INT) AS bits
        |  FROM cpos GROUP BY 1, 2),
        |pr AS (SELECT unnest([7, 123, 467]::BIGINT[]) AS doc_id),
        |ppos AS (${posSql("pr", "doc_id")}),
        |need AS (
        |  SELECT doc_id, p // 63 AS word,
        |         bit_or(1::BIGINT << (p % 63)::INT) AS mask
        |  FROM ppos GROUP BY 1, 2),
        |nw AS (SELECT doc_id, count(*) AS n_words FROM need GROUP BY 1),
        |cand AS (
        |  SELECT n.doc_id, b.file_id, count(*) AS hit
        |  FROM need n JOIN bm b ON b.word = n.word
        |  WHERE (b.bits & n.mask) = n.mask
        |  GROUP BY 1, 2)
        |SELECT c.doc_id, count(*)::BIGINT AS files_kept,
        |  (SELECT count(DISTINCT file_id) FROM f)::BIGINT AS files_total
        |FROM cand c JOIN nw ON nw.doc_id = c.doc_id AND c.hit = nw.n_words
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
      }),

    // q126 generalized to THREE clustered dimensions (Layout.zValueN):
    // token count × quality × raw length interleave into one Morton value
    // (bit j of column c lands at position 3·j + c), and the per-file
    // min/max boxes stay tight in ALL THREE columns — a box predicate on
    // any subset prunes. The oracle replays the full 3-D interleave
    // arithmetic bit by bit plus the distributed rank + file assignment
    // + box aggregation; LayoutSpec separately proves the 3-D layout
    // opens fewer files than any 2-D layout under a 3-D box.
    QueryDef("q155_zorder3d_layout",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val base = docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tok"),
          round(TextFunctions.qualityScore(col("text")), 6).as("q"),
          length(col("text")).cast("bigint").as("nchar"))
        val cells = base
          .withColumn("xq", Layout.quantize(col("n_tok").cast("double"),
            0.0, 1024.0, 8))
          .withColumn("yq", Layout.quantize(col("q"), 0.0, 1.0, 8))
          .withColumn("wq", Layout.quantize(col("nchar").cast("double"),
            0.0, 4096.0, 8))
        val assigned = Layout.zorderFileAssignment(cells,
          Layout.zValueN(Seq(col("xq"), col("yq"), col("wq")), 8),
          col("doc_id"), nFiles = 16)
        Layout.fileStats(assigned, Seq("n_tok", "q", "nchar"))
          .orderBy("file_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, text, $padded AS p
        |            FROM documents),
        |qd AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |      AS n_tok,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS q,
        |    len(text)::BIGINT AS nchar
        |  FROM d),
        |cells AS (
        |  SELECT doc_id, n_tok, q, nchar,
        |    least(255, greatest(0,
        |      floor((n_tok::DOUBLE - 0.0) / 1024.0 * 256)::BIGINT)) AS xq,
        |    least(255, greatest(0,
        |      floor((q - 0.0) / 1.0 * 256)::BIGINT)) AS yq,
        |    least(255, greatest(0,
        |      floor((nchar::DOUBLE - 0.0) / 4096.0 * 256)::BIGINT)) AS wq
        |  FROM qd),
        |z AS (
        |  SELECT doc_id, n_tok, q, nchar,
        |    ${zInterleaveNSql(Seq("xq", "yq", "wq"), 8)} AS zv
        |  FROM cells),
        |r AS (
        |  SELECT n_tok, q, nchar,
        |    row_number() OVER (ORDER BY zv, doc_id) AS rn,
        |    count(*) OVER () AS total
        |  FROM z),
        |f AS (SELECT ((rn - 1) * 16) // total AS file_id, n_tok, q, nchar
        |      FROM r)
        |SELECT file_id, count(*)::BIGINT AS n,
        |  min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok,
        |  min(q) AS min_q, max(q) AS max_q,
        |  min(nchar) AS min_nchar, max(nchar) AS max_nchar
        |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin)),

    // The q124/q125 refresh chain through the PERSISTED history store
    // (Snapshot.ensureHistory/loadHistory): v1 initializes the store, v2
    // refreshes it delta-cost (closed/version=2 appended, the live slice
    // swapped behind the manifest cursor), and the version diff is served
    // from the SAVED parquet alone — on a warm store neither ensure
    // evaluates its snapshot argument and the corpus is never re-scanned
    // (PlanSpec pins it). The oracle is q125's, verbatim: persistence
    // must be semantically invisible.
    QueryDef("q148_scd2_store_served",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_scd2_${dataStamp(dir, "documents")}"
        def docs = table(s, dir, "documents")
        Snapshot.ensureHistory(
          docs.filter(col("doc_id") % 10 =!= 0)
            .select(col("doc_id"), col("lang"), col("text")),
          store, "doc_id", Seq("lang", "text"), 1L)
        val (hist, _) = Snapshot.ensureHistory(
          docs.filter(col("doc_id") % 7 =!= 0)
            .select(col("doc_id"), col("lang"),
              when(col("doc_id") % 5 === 0,
                concat(col("text"), lit(" [rev2]")))
                .otherwise(col("text")).as("text")),
          store, "doc_id", Seq("lang", "text"), 2L)
        Snapshot.diff(hist, 1L, 2L, "doc_id").orderBy("doc_id")
      },
      Some("""WITH v1 AS (
        |  SELECT doc_id, md5(coalesce(lang, chr(0)) || chr(1) ||
        |    coalesce(text, chr(0))) AS h
        |  FROM documents WHERE doc_id % 10 <> 0),
        |v2 AS (
        |  SELECT doc_id, md5(coalesce(lang, chr(0)) || chr(1) || coalesce(
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END,
        |    chr(0))) AS h
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.h IS NULL THEN 'added'
        |       WHEN v2.h IS NULL THEN 'removed'
        |       ELSE 'changed' END AS change,
        |  v1.h AS hash_from, v2.h AS hash_to
        |FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id
        |WHERE v1.h IS NULL OR v2.h IS NULL OR v1.h <> v2.h
        |ORDER BY doc_id""".stripMargin)),

    // The q126 layout WRITTEN and SERVED (Layout.zorderWrite/prunedScan):
    // the corpus projection is materialized once as real parquet files in
    // Z-value order (range shuffle, one contiguous z-range per file —
    // write-once, data-stamped dir), and the query scans it under a 2-D
    // box predicate opening ONLY the files whose parquet FOOTER min/max
    // boxes intersect the range — the lakehouse skipping loop running on
    // parquet's own metadata. The oracle derives the same box selection
    // directly from documents, so a wrongly-skipped file (lost rows) or
    // a stale store hash-mismatches; LayoutSpec measures the files
    // actually opened.
    QueryDef("q147_zorder_pruned_scan",
      (s, dir) => {
        val store = ensureZorderStore(s, dir)
        val (scan, _, _) = Layout.prunedScan(s, store,
          Map("n_tok" -> (30.0, 60.0), "q" -> (0.55, 0.75)))
        scan.select(col("doc_id"), col("n_tok"), col("q"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle)),

    // q147's box scan through the REGISTERED READ PATH: a plain
    // `spark.read.format("graft-zorder").load(store).filter(box)` — the
    // predicates push into the source (PrunedFilteredScan), which
    // consults the saved skipping index and opens only intersecting
    // files; no explicit prunedScan call anywhere. Same oracle as q147
    // verbatim: the planner-level read path must be semantically
    // invisible. PlanSpec pins the PushedFilters in the scan node and
    // LayoutSpec measures the files the source actually kept.
    QueryDef("q153_zorder_source_read",
      (s, dir) => {
        val store = ensureZorderStore(s, dir)
        s.read.format("graft-zorder").load(store)
          .filter(col("n_tok") >= 30L && col("n_tok") <= 60L &&
            col("q") >= 0.55 && col("q") <= 0.75)
          .select(col("doc_id"), col("n_tok"), col("q"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle)),

    // The WRITE path oracle-gated: documents laid out via
    // `df.write.format("graft-zorder")` (auto-derived quantize bounds,
    // index saved at write time) and read back through the same format
    // under q147's box — the oracle is the shared box selection, so a
    // write-path bug (lost rows in the layout shuffle, a wrong index,
    // over-eager pruning) hash-mismatches. Distinct store from q147's:
    // the bounds are data-derived here, not the fixed recipe's.
    QueryDef("q158_zorder_write_path",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_zwrite_${dataStamp(dir, "documents")}"
        val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(store, "_SUCCESS"))) {
          table(s, dir, "documents").select(col("doc_id"),
              TextFunctions.tokenCount(col("text")).cast("bigint")
                .as("n_tok"),
              round(TextFunctions.qualityScore(col("text")), 6).as("q"))
            .write.format("graft-zorder")
            .option("zcols", "n_tok,q").option("bits", "8")
            .option("nFiles", "16").option("tieCol", "doc_id")
            .mode("overwrite").save(store)
        }
        s.read.format("graft-zorder").load(store)
          .filter(col("n_tok") >= 30L && col("n_tok") <= 60L &&
            col("q") >= 0.55 && col("q") <= 0.75)
          .select(col("doc_id"), col("n_tok"), col("q"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle)),

    // q158's write path on the HILBERT curve (`.option("curve",
    // "hilbert")` → Layout.hilbertValue, the codegen'd
    // graft_hilbert2 expression): consecutive Hilbert cells are
    // grid-neighbors, so equal-size file ranges carry tighter footer
    // boxes than the Morton walk's — LayoutSpec measures the pruning
    // advantage; THIS query gates correctness: the curve choice must be
    // semantically invisible under the same box read and shared oracle
    // (a wrong index value reorders rows into wrong files and loses or
    // invents box rows against the plain-SQL selection).
    QueryDef("q187_hilbert_layout_scan",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_hwrite_${dataStamp(dir, "documents")}"
        val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(store, "_SUCCESS"))) {
          table(s, dir, "documents").select(col("doc_id"),
              TextFunctions.tokenCount(col("text")).cast("bigint")
                .as("n_tok"),
              round(TextFunctions.qualityScore(col("text")), 6).as("q"))
            .write.format("graft-zorder")
            .option("zcols", "n_tok,q").option("bits", "8")
            .option("nFiles", "16").option("tieCol", "doc_id")
            .option("curve", "hilbert")
            .mode("overwrite").save(store)
        }
        s.read.format("graft-zorder").load(store)
          .filter(col("n_tok") >= 30L && col("n_tok") <= 60L &&
            col("q") >= 0.55 && col("q") <= 0.75)
          .select(col("doc_id"), col("n_tok"), col("q"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle)),

    // The 3-D HILBERT write path (Skilling transpose curve —
    // graft_hilbertn; its 2-D instance is proven equal to the xy2d walk
    // cell for cell, one curve family): documents clustered on (n_tok, q, n_chars), served through
    // the registered read path under a 3-D box. The shared-oracle
    // discipline again: the curve must be semantically invisible — the
    // oracle computes the same 3-D box selection straight from
    // documents; LayoutSpec separately pins the n-D walk's bijectivity
    // and unit-step adjacency.
    QueryDef("q195_hilbert3d_layout_scan",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_h3write_${dataStamp(dir, "documents")}"
        val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(store, "_SUCCESS"))) {
          table(s, dir, "documents").select(col("doc_id"),
              TextFunctions.tokenCount(col("text")).cast("bigint")
                .as("n_tok"),
              round(TextFunctions.qualityScore(col("text")), 6).as("q"),
              col("n_chars").cast("bigint").as("n_chars"))
            .write.format("graft-zorder")
            .option("zcols", "n_tok,q,n_chars").option("bits", "8")
            .option("nFiles", "16").option("tieCol", "doc_id")
            .option("curve", "hilbert")
            .mode("overwrite").save(store)
        }
        s.read.format("graft-zorder").load(store)
          .filter(col("n_tok") >= 20L && col("n_tok") <= 70L &&
            col("q") >= 0.4 && col("q") <= 0.9 &&
            col("n_chars") >= 100L && col("n_chars") <= 400L)
          .select(col("doc_id"), col("n_tok"), col("q"), col("n_chars"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle.replace(
        "SELECT doc_id, n_tok, q FROM qd\n" +
          "WHERE n_tok BETWEEN 30 AND 60 AND q BETWEEN 0.55 AND 0.75\n" +
          "ORDER BY doc_id",
        "SELECT qd.doc_id, qd.n_tok, qd.q, d2.n_chars::BIGINT AS n_chars " +
          "FROM qd JOIN documents d2 ON d2.doc_id = qd.doc_id " +
          "WHERE qd.n_tok BETWEEN 20 AND 70 AND qd.q BETWEEN 0.4 AND 0.9 " +
          "AND d2.n_chars BETWEEN 100 AND 400 ORDER BY qd.doc_id"))),

    // Point lookups through the maintained store's BLOOM SIDECAR
    // (Layout.saveBloom → both read paths' bloomNarrow): doc_id is
    // uniform across the z-laid files, so footer boxes keep all 16 for
    // an id probe — the committed per-file bloom narrows a pushed
    // equality/IN filter to ~1 file per member (LayoutSpec measures the
    // kept counts; files are immutable so the sidecar can never go
    // stale, only lose coverage to appends). THIS query gates
    // correctness: the narrowed read must return exactly the plain-SQL
    // selection — a wrongly-dropped file (the only bloom failure mode
    // that matters) loses rows and hash-mismatches.
    QueryDef("q194_bloom_point_lookup",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_bwrite_${dataStamp(dir, "documents")}"
        val sp = new org.apache.hadoop.fs.Path(store)
        val fs = sp.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(store, "_SUCCESS"))) {
          table(s, dir, "documents").select(col("doc_id"),
              TextFunctions.tokenCount(col("text")).cast("bigint")
                .as("n_tok"),
              round(TextFunctions.qualityScore(col("text")), 6).as("q"))
            .write.format("graft-zorder")
            .option("zcols", "n_tok,q").option("bits", "8")
            .option("nFiles", "16").option("tieCol", "doc_id")
            .mode("overwrite").save(store)
        }
        if (!fs.exists(new org.apache.hadoop.fs.Path(store,
            "_graft_stats/bloom_doc_id.txt")))
          Layout.saveBloom(s, store, "doc_id")
        s.read.format("graft-zorder").load(store)
          .filter(col("doc_id").isin(7L, 123L, 467L))
          .select(col("doc_id"), col("n_tok"), col("q"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle.replace(
        "WHERE n_tok BETWEEN 30 AND 60 AND q BETWEEN 0.55 AND 0.75",
        "WHERE doc_id IN (7, 123, 467)"))),

    // The MAINTAINED layout oracle-gated — the full lakehouse loop in
    // one query: build the layout on 3/4 of documents
    // (`df.write.format("graft-zorder")`), APPEND the remaining quarter
    // (`.mode("append")` → Layout.appendDelta: delta Z-sorted under the
    // build-time bounds, made visible by ONE atomic index-epoch commit),
    // then COMPACT (Layout.compact: full re-layout, bounds re-derived,
    // superseded files + any orphans vacuumed). The box read serves
    // through the same graft-zorder path as q153/q158 against the SAME
    // full-documents oracle — rows lost in the append commit, duplicated
    // by a leaked superseded file, or dropped by the vacuum all
    // hash-mismatch. LayoutSpec pins the crash-window semantics
    // (uncommitted delta files stay invisible; compact GCs them).
    QueryDef("q159_zorder_maintained_layout",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          s"/graft_zmaint_${dataStamp(dir, "documents")}"
        val fs = new org.apache.hadoop.fs.Path(store).getFileSystem(
          s.sparkContext.hadoopConfiguration)
        // _SUCCESS lands after the BUILD step already — gate the reuse on
        // a marker written only once the whole maintenance sequence ran,
        // so a crash mid-sequence rebuilds instead of serving a half-
        // maintained store
        val done = new org.apache.hadoop.fs.Path(store, "_MAINT_DONE")
        if (!fs.exists(done)) {
          val base = table(s, dir, "documents").select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).cast("bigint")
              .as("n_tok"),
            round(TextFunctions.qualityScore(col("text")), 6).as("q"))
          base.filter(col("doc_id") % 4 =!= 0)
            .write.format("graft-zorder")
            .option("zcols", "n_tok,q").option("bits", "8")
            .option("nFiles", "16").option("tieCol", "doc_id")
            .mode("overwrite").save(store)
          base.filter(col("doc_id") % 4 === 0)
            .write.format("graft-zorder").mode("append").save(store)
          Layout.compact(s, store)
          fs.create(done, true).close()
        }
        s.read.format("graft-zorder").load(store)
          .filter(col("n_tok") >= 30L && col("n_tok") <= 60L &&
            col("q") >= 0.55 && col("q") <= 0.75)
          .select(col("doc_id"), col("n_tok"), col("q"))
          .orderBy("doc_id")
      },
      Some(zorderBoxOracle)),

    // Label-propagation communities (Clusters.labelPropagation) over the
    // q81 kNN graph: each node adopts its neighbors' most frequent label
    // (count desc, SMALLEST label on ties — deterministic, no random
    // sweep order), two synchronous rounds. The density-aware complement
    // to q62's transitive closure: a thin bridge between two tight
    // communities does NOT merge them. The oracle replays the whole kNN
    // build (q81's CTEs verbatim) and unrolls both LP rounds as
    // count + row_number argmax SQL.
    QueryDef("q127_label_propagation",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val knn = Similarity.knnGraph(emb, k = 3, dim = 64, nBits = 6,
            nTables = 2)
          .select(col("id").as("id_a"), col("neighbor").as("id_b"))
        Clusters.labelPropagation(knn, emb.select(col("vec_id")),
            rounds = 2, idCol = "vec_id")
          .orderBy("id")
      },
      Some(s"""WITH $knnGraphOracleCtes,
        |knn AS (SELECT id, nb FROM ranked WHERE rank <= 3),
        |sym AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT id AS a, nb AS b FROM knn
        |    UNION ALL SELECT nb AS a, id AS b FROM knn)),
        |l0 AS (SELECT vec_id AS id, vec_id AS label FROM e),
        |n1 AS (
        |  SELECT s.a, l.label, count(*) AS cnt
        |  FROM sym s JOIN l0 l ON l.id = s.b GROUP BY 1, 2),
        |p1 AS (
        |  SELECT a, label,
        |    row_number() OVER (PARTITION BY a ORDER BY cnt DESC, label)
        |      AS rn
        |  FROM n1),
        |l1 AS (
        |  SELECT e.vec_id AS id, coalesce(p.label, e.vec_id) AS label
        |  FROM e LEFT JOIN (SELECT a, label FROM p1 WHERE rn = 1) p
        |    ON p.a = e.vec_id),
        |n2 AS (
        |  SELECT s.a, l.label, count(*) AS cnt
        |  FROM sym s JOIN l1 l ON l.id = s.b GROUP BY 1, 2),
        |p2 AS (
        |  SELECT a, label,
        |    row_number() OVER (PARTITION BY a ORDER BY cnt DESC, label)
        |      AS rn
        |  FROM n2),
        |l2 AS (
        |  SELECT e.vec_id AS id, coalesce(p.label, e.vec_id) AS label
        |  FROM e LEFT JOIN (SELECT a, label FROM p2 WHERE rn = 1) p
        |    ON p.a = e.vec_id)
        |SELECT id, label FROM l2 ORDER BY id""".stripMargin)),

    // Leakage-safe dataset split (Clusters.leakageSafeSplit over the q55
    // closure): train/val/test decided by the md5 of the CLUSTER label,
    // so near-duplicate documents can never straddle splits — the
    // eval-contamination guard a training pipeline needs between its
    // dedup pass and its export. The oracle replays the full transitive
    // closure (q55's recursive CTE) plus the bucket arithmetic.
    QueryDef("q130_leakage_safe_split",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8)
        val labels = Clusters.components(pairs, docs.select(col("doc_id")),
          idCol = "doc_id")
        Clusters.leakageSafeSplit(labels)
          .select(col("id").as("doc_id"), col("cluster"), col("split"))
          .orderBy("doc_id")
      },
      Some(leakageSplitOracleSql)),

    // Contamination blast radius (Clusters.bfsDepth) — multi-source BFS
    // from the benchmark/eval vectors (seeds: vec_id < 20) through the
    // UNDIRECTED q81/q127 kNN semantic graph, 3 hops: depth 1 is what a
    // pairwise eval-similarity check sees; depths 2-3 are the transitive
    // semantic neighborhoods it misses. The near-dup pair graph was the
    // first candidate but is chain-free at sf0.01 (every dup cluster is
    // a clique — depth-2/3 layers VACUOUS); the kNN graph has real
    // multi-hop structure, so every unrolled oracle layer carries rows.
    QueryDef("q196_contamination_radius",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val knn = Similarity.knnGraph(emb, k = 3, dim = 64, nBits = 6,
            nTables = 2)
          .select(col("id").as("id_a"), col("neighbor").as("id_b"))
        Clusters.bfsDepth(knn, emb.select(col("vec_id")),
            emb.filter(col("vec_id") < 20).select(col("vec_id")),
            idCol = "vec_id", maxDepth = 3)
          .orderBy("id")
      },
      Some(s"""WITH $knnGraphOracleCtes,
        |knn AS (SELECT id, nb FROM ranked WHERE rank <= 3),
        |sym AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT id AS a, nb AS b FROM knn
        |    UNION ALL SELECT nb AS a, id AS b FROM knn)),
        |d0 AS (SELECT vec_id AS id FROM e WHERE vec_id < 20),
        |n1 AS (
        |  SELECT DISTINCT s.b AS id FROM sym s JOIN d0 ON d0.id = s.a
        |  WHERE s.b NOT IN (SELECT id FROM d0)),
        |n2 AS (
        |  SELECT DISTINCT s.b AS id FROM sym s JOIN n1 ON n1.id = s.a
        |  WHERE s.b NOT IN (SELECT id FROM d0)
        |    AND s.b NOT IN (SELECT id FROM n1)),
        |n3 AS (
        |  SELECT DISTINCT s.b AS id FROM sym s JOIN n2 ON n2.id = s.a
        |  WHERE s.b NOT IN (SELECT id FROM d0)
        |    AND s.b NOT IN (SELECT id FROM n1)
        |    AND s.b NOT IN (SELECT id FROM n2)),
        |dist AS (
        |  SELECT id, 0 AS depth FROM d0
        |  UNION ALL SELECT id, 1 FROM n1
        |  UNION ALL SELECT id, 2 FROM n2
        |  UNION ALL SELECT id, 3 FROM n3)
        |SELECT e.vec_id AS id, dist.depth::INT AS depth
        |FROM e LEFT JOIN dist ON dist.id = e.vec_id
        |ORDER BY id""".stripMargin)),

    // Per-vertex triangle counts (Clusters.triangleCounts, degree-ordered
    // wedge join) over the q55/q130 near-dup pair graph: the cohesion
    // audit between blocking and closure — true duplicate clusters are
    // cliques (triangle-dense), chains of borderline matches that the
    // transitive closure would still merge are triangle-FREE, so
    // n_tri=0 on a multi-member component flags transitive drift. The
    // oracle replays the pair build (shared CTEs) and the same
    // orientation: edges directed from the lower (degree, id) endpoint,
    // wedges at the lowest-order apex, closed by an EXISTS probe.
    QueryDef("q188_triangle_counts",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8)
        Clusters.triangleCounts(pairs, docs.select(col("doc_id")),
            idCol = "doc_id")
          .orderBy("id")
      },
      Some(s"""WITH RECURSIVE ${ccClosureCtes("documents")},
        |degt AS (
        |  SELECT v, count(*) AS d FROM (
        |    SELECT id_a AS v FROM pairs UNION ALL SELECT id_b FROM pairs)
        |  GROUP BY v),
        |dirt AS (
        |  SELECT CASE WHEN (da.d, u.id_a) < (db.d, u.id_b)
        |              THEN u.id_a ELSE u.id_b END AS src,
        |         CASE WHEN (da.d, u.id_a) < (db.d, u.id_b)
        |              THEN u.id_b ELSE u.id_a END AS dst,
        |         CASE WHEN (da.d, u.id_a) < (db.d, u.id_b)
        |              THEN db.d ELSE da.d END AS dd
        |  FROM pairs u JOIN degt da ON da.v = u.id_a
        |               JOIN degt db ON db.v = u.id_b),
        |tri AS (
        |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
        |  FROM dirt e1 JOIN dirt e2 ON e1.src = e2.src
        |       AND (e1.dd, e1.dst) < (e2.dd, e2.dst)
        |  WHERE EXISTS (SELECT 1 FROM dirt e3
        |                WHERE e3.src = e1.dst AND e3.dst = e2.dst)),
        |mem AS (SELECT unnest([u, v, w]) AS id FROM tri)
        |SELECT d.doc_id AS id, coalesce(c.n_tri, 0)::BIGINT AS n_tri
        |FROM documents d
        |LEFT JOIN (SELECT id, count(*) AS n_tri FROM mem GROUP BY id) c
        |  ON c.id = d.doc_id
        |ORDER BY id""".stripMargin)),

    // Composition recipe over the round's versioning + split family:
    // reconstruct the CURRENT corpus from the SCD2 history (snapshotAt —
    // the oracle derives the same slice directly, so the history
    // round-trip must be semantically invisible), close near-dup
    // clusters over that LIVE slice, assign leakage-safe splits, and
    // report each split's training-slice profile (docs, tokens, round-6
    // mean quality). Every stage replays: the v2 derivation, the
    // closure (shared parameterized CTEs), the split buckets, and the
    // quality chain.
    QueryDef("q134_versioned_training_slice",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val v1 = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("lang"), col("text"))
        val v2 = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("lang"),
            when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text")).as("text"))
        val hist = Snapshot.scd2Apply(
          Snapshot.scd2Init(v1, "doc_id", Seq("lang", "text"), 1L),
          v2, "doc_id", Seq("lang", "text"), 2L)
        val live = Snapshot.snapshotAt(hist, 2L)
          .select(col("doc_id"), col("text"))
        val pairs = Dedup.ngramJaccardPairs(live, n = 3, threshold = 0.8)
        val labels = Clusters.components(pairs, live.select(col("doc_id")),
          idCol = "doc_id")
        val split = Clusters.leakageSafeSplit(labels)
          .select(col("id").as("doc_id"), col("split"))
        live.join(split, Seq("doc_id"))
          .select(col("split"),
            TextFunctions.tokenCount(col("text")).cast("bigint")
              .as("n_tok"),
            round(TextFunctions.qualityScore(col("text")), 6).as("q"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            round(sum(col("q").cast("decimal(28,6)")).cast("double") /
              count(lit(1)), 6).as("mean_quality"))
          .orderBy("split")
      },
      Some {
        s"""WITH RECURSIVE v2 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 7 <> 0),
        |${ccClosureCtes("v2")},
        |sp AS (
        |  SELECT id, CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |                  ELSE 'test' END AS split
        |  FROM (
        |    SELECT id,
        |      ('0x' || substring(md5('split_' || cluster::VARCHAR), 1, 15))::BIGINT
        |        % 100 AS b
        |    FROM (SELECT src AS id, min(node) AS cluster FROM r
        |          GROUP BY src))),
        |d AS (SELECT doc_id, text, $padded AS p FROM v2),
        |qd AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |      AS n_tok,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS q
        |  FROM d)
        |SELECT sp.split, count(*) AS n_docs, sum(qd.n_tok)::BIGINT AS n_tokens,
        |  round(sum(qd.q::DECIMAL(28,6))::DOUBLE / count(*), 6)
        |    AS mean_quality
        |FROM qd JOIN sp ON sp.id = qd.doc_id
        |GROUP BY sp.split ORDER BY sp.split""".stripMargin
      }),

    // Hard-negative mining (Similarity.hardNegativeTopK): each query's
    // nearest neighbors by exact cosine with the query's own near-dup
    // CLUSTER excluded before ranking — the closest docs that are not
    // (near-)copies, i.e. the negatives a contrastive embedding run
    // actually wants. Composes the q39 exact ranking with the q55
    // closure; the oracle replays both and applies the same exclusions.
    QueryDef("q136_hard_negatives",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val e = table(s, dir, "embeddings")
        val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8)
        val labels = Clusters.components(pairs, docs.select(col("doc_id")),
          idCol = "doc_id")
        val queries = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding"))
        Similarity.hardNegativeTopK(e, queries, labels, k = 10)
          .select(col("query_id"), col("vec_id"), r4(col("cos")).as("cos"),
            col("rank"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH RECURSIVE ${ccClosureCtes("documents")},
        |lab AS (SELECT src AS id, min(node) AS cluster FROM r GROUP BY src),
        |q AS (
        |  SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qv,
        |    lq.cluster AS qcl
        |  FROM embeddings e JOIN lab lq ON lq.id = e.vec_id
        |  WHERE e.vec_id < 8),
        |c AS (
        |  SELECT e.vec_id, e.embedding::DOUBLE[] AS cv, lc.cluster AS ccl
        |  FROM embeddings e JOIN lab lc ON lc.id = e.vec_id),
        |cos AS (
        |  SELECT query_id, vec_id,
        |    list_dot_product(cv, qv) /
        |      greatest(sqrt(list_dot_product(cv, cv))
        |               * sqrt(list_dot_product(qv, qv)), 1e-300) AS cos
        |  FROM c, q
        |  WHERE c.vec_id <> q.query_id AND c.ccl <> q.qcl),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos DESC, vec_id) AS rank
        |  FROM cos)
        |SELECT query_id, vec_id, round(cos, 4) AS cos, rank
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin)),

    // REAL PNG decode through the JDK's own javax.imageio readers
    // (Codecs.decodeImageIO): rasters synthesized from doc_id formulas,
    // encoded as PNG (lossless), decoded back through the real codec,
    // reduced to exact integer stats. The oracle recomputes the stats
    // straight from the pixel formulas — any drift anywhere in the
    // encode→container→decode chain breaks the hash. Gray sources (1
    // channel) decode as RGB with the value replicated ×3, which the
    // oracle states explicitly. Closes the raster half of the
    // codec-class-format gap; JPEG stays spec-tested (lossy decode is
    // deterministic per JDK but not bit-specified cross-engine).
    QueryDef("q137_png_roundtrip_decode",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = (4 + id % 8).toInt; val h = (3 + id % 5).toInt
              val ch = if (id % 2 == 0) 3 else 1
              val px = Array.tabulate(w * h * ch)(j =>
                ((id * 17 + j * 11) % 256).toInt)
              (id, Codecs.encodePng(w, h, ch, px))
            }
          }.toDF("media_id", "payload")
        // materialize before the global sort: range-partitioning SAMPLES
        // its child, which re-ran the whole encode+decode chain a second
        // time (no shuffle below the sort to replay from) — the guide's
        // materialize-before-orderBy shape; rows unchanged
        Multimodal.decodeMedia(s, media).toDF().eagerCheckpoint()
          .orderBy("media_id")
      },
      Some("""WITH p AS (
        |  SELECT doc_id, 4 + doc_id % 8 AS w, 3 + doc_id % 5 AS h,
        |    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, (doc_id * 17 + j * 11) % 256 AS val
        |  FROM (SELECT doc_id, unnest(generate_series(0, w * h * ch - 1))
        |          AS j
        |        FROM p)),
        |agg AS (
        |  SELECT doc_id, count(*) AS n0, sum(val) AS s0,
        |    min(val) AS mn, max(val) AS mx
        |  FROM v GROUP BY doc_id)
        |SELECT p.doc_id AS media_id, 'png' AS container, p.w::INT AS width,
        |  p.h::INT AS height, 3 AS channels, 0 AS sample_rate,
        |  (CASE WHEN ch = 3 THEN n0 ELSE n0 * 3 END)::BIGINT AS n_values,
        |  (CASE WHEN ch = 3 THEN s0 ELSE s0 * 3 END)::BIGINT AS v_sum,
        |  mn::BIGINT AS v_min, mx::BIGINT AS v_max
        |FROM p JOIN agg ON agg.doc_id = p.doc_id
        |ORDER BY media_id""".stripMargin)),

    // REAL multi-frame decode + frame sampling (Codecs.decodeFrames /
    // Multimodal.decodeFrameStats): per-doc multi-page TIFFs synthesized
    // from formulas (2-4 frames each), every 2nd frame kept, exact
    // integer stats per sampled frame. TIFF is lossless, so the oracle
    // recomputes every sampled frame's stats straight from the pixel
    // formulas — the "video-like container" path made real with the
    // JDK's own reader, byte-chunk sampleFrames remaining only for
    // codec-class video.
    QueryDef("q138_tiff_frame_sample",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = (3 + id % 5).toInt; val h = (2 + id % 4).toInt
              val nf = (2 + id % 3).toInt
              val frames = (0 until nf).map { f =>
                val px = new Array[Int](w * h * 3)
                var p = 0
                while (p < w * h) {
                  val v = ((id * 19 + f * 37 + p * 17) % 256).toInt
                  px(3 * p) = v
                  px(3 * p + 1) = v * 3 % 256
                  px(3 * p + 2) = v * 7 % 256
                  p += 1
                }
                px
              }
              (id, Codecs.encodeTiff(w, h, frames))
            }
          }.toDF("media_id", "payload")
        // materialized before the global sort — same double-compute shape
        // as q137 (range-partitioning sampling re-runs the codec chain)
        Multimodal.decodeFrameStats(s, media, stride = 2).toDF()
          .eagerCheckpoint()
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH p AS (
        |  SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h,
        |    2 + doc_id % 3 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS f
        |  FROM p),
        |kept AS (SELECT * FROM fr WHERE f % 2 = 0),
        |px AS (
        |  SELECT doc_id, f, w, h,
        |    (doc_id * 19 + f * 37 + pidx * 17) % 256 AS v
        |  FROM (SELECT doc_id, f, w, h,
        |          unnest(generate_series(0, w * h - 1)) AS pidx
        |        FROM kept)),
        |vals AS (
        |  SELECT doc_id, f, unnest([v, (v * 3) % 256, (v * 7) % 256]) AS val
        |  FROM px),
        |agg AS (
        |  SELECT doc_id, f, count(*) AS n0, sum(val) AS s0,
        |    min(val) AS mn, max(val) AS mx
        |  FROM vals GROUP BY 1, 2)
        |SELECT k.doc_id AS media_id, k.f::INT AS frame_idx,
        |  'tiff' AS container, k.w::INT AS width, k.h::INT AS height,
        |  a.n0::BIGINT AS n_values, a.s0::BIGINT AS v_sum,
        |  a.mn::BIGINT AS v_min, a.mx::BIGINT AS v_max
        |FROM kept k JOIN agg a ON a.doc_id = k.doc_id AND a.f = k.f
        |ORDER BY media_id, frame_idx""".stripMargin)),

    // REAL audio feature extraction (Multimodal.audioFeatures): per-doc
    // PCM16 WAVs synthesized from formulas, reduced to the INTEGER
    // signal features — exact energy Σ s² and the zero-crossing count —
    // which the oracle replays sample-by-sample (lag window over the
    // generated series). The float spectral bands (Goertzel) are
    // spec-tested against pure sinusoids instead (MultimodalSpec): float
    // DFT results are not cross-engine-hashable, integer signal stats
    // are.
    QueryDef("q139_wav_features",
      (s, dir) => {
        import s.implicits._
        val media = table(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val ns = (64 + id % 64).toInt
              val rate = (8000 + (id % 8) * 1000).toInt
              val samples = Array.tabulate(ns)(k =>
                ((id * 31 + k * 7) % 65536).toInt - 32768)
              (id, Codecs.encodeWav(rate, 1, samples))
            }
          }.toDF("media_id", "payload")
        Multimodal.audioFeatures(s, media).toDF()
          .select(col("media_id"), col("sample_rate"), col("n_samples"),
            col("sum_sq"), col("zero_crossings"))
          .orderBy("media_id")
      },
      Some("""WITH p AS (
        |  SELECT doc_id, 64 + doc_id % 64 AS ns,
        |    8000 + (doc_id % 8) * 1000 AS rate
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, k, (doc_id * 31 + k * 7) % 65536 - 32768 AS s
        |  FROM (SELECT doc_id, unnest(generate_series(0, ns - 1)) AS k
        |        FROM p)),
        |z AS (
        |  SELECT doc_id, k, s,
        |    lag(s) OVER (PARTITION BY doc_id ORDER BY k) AS prev
        |  FROM v),
        |agg AS (
        |  SELECT doc_id, count(*) AS n, sum(s * s) AS ss,
        |    count(*) FILTER (prev IS NOT NULL AND prev * s < 0) AS zc
        |  FROM z GROUP BY doc_id)
        |SELECT p.doc_id AS media_id, p.rate::INT AS sample_rate,
        |  a.n::BIGINT AS n_samples, a.ss::BIGINT AS sum_sq,
        |  a.zc::BIGINT AS zero_crossings
        |FROM p JOIN agg a ON a.doc_id = p.doc_id
        |ORDER BY media_id""".stripMargin)),

    // KMV / Theta distinct sketch state (Sketches.kmvState): per source,
    // the k = 64 SMALLEST distinct token hashes, built by a BOUNDED
    // custom Aggregator (map-side buffers capped at k longs — a true
    // partial aggregate, unlike a collect_set that would buffer whole
    // groups). All integers: the oracle replays the k-smallest selection
    // exactly.
    QueryDef("q140_kmv_state",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Sketches.kmvState(
            docs.select(col("source"),
              explode(TextFunctions.tokens(col("text"))).as("tok")),
            "tok", k = 64, groupCols = Seq("source"))
          .orderBy("source", "rank")
      },
      Some("""WITH tok AS (
        |  SELECT source,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents),
        |hs AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
        |  FROM tok),
        |sel AS (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rank
        |  FROM hs)
        |SELECT source, rank::INT AS rank, h FROM sel WHERE rank <= 64
        |ORDER BY source, rank""".stripMargin)),

    // The Theta-sketch set algebra over the q140 state
    // (Sketches.kmvOverlapMatrix): DIRECT pairwise intersection
    // estimates — common hashes below θmin are a uniform sample of
    // A ∩ B, so the error scales with the INTERSECTION, where q123's
    // HLL inclusion-exclusion error scales with the union. Everything
    // runs on the (sources × 64)-row state; the corpus is never
    // rescanned. The oracle replays the k-sets, both thresholds, the
    // below-θ counts, and the same float chain.
    QueryDef("q141_kmv_overlap",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Sketches.kmvOverlapMatrix(
            Sketches.kmvState(
              docs.select(col("source"),
                explode(TextFunctions.tokens(col("text"))).as("tok")),
              "tok", k = 64, groupCols = Seq("source")),
            k = 64, groupCol = "source")
          .withColumnRenamed("g1", "source_a")
          .withColumnRenamed("g2", "source_b")
          .orderBy("source_a", "source_b")
      },
      Some(kmvOverlapOracleSql)),

    // The SAME theta overlap dashboard SERVED from a persisted KMV store
    // (Sketches.ensureKmvState — Bundle + T2 manifest on value/k/grain):
    // persistence must be semantically invisible, so the oracle is
    // exactly q141's; repeat Verify runs serve from the saved
    // (sources x k)-row table without re-aggregating the corpus.
    QueryDef("q142_kmv_overlap_served",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val kDir = System.getProperty("java.io.tmpdir") +
          "/graft_kmv_q142_" + dataStamp(dir, "documents")
        val (state, _) = Sketches.ensureKmvState(
          docs.select(col("source"),
            explode(TextFunctions.tokens(col("text"))).as("tok")),
          kDir, "tok", k = 64, groupCols = Seq("source"))
        Sketches.kmvOverlapMatrix(state, k = 64, groupCol = "source")
          .withColumnRenamed("g1", "source_a")
          .withColumnRenamed("g2", "source_b")
          .orderBy("source_a", "source_b")
      },
      Some(kmvOverlapOracleSql)),

    // The unified dashboard SERVED FROM STORES ALONE: q116's surface
    // (profile + HLL distinct + count-min heavy hitters + moments
    // p50/p90) extended with the theta overlap leg — each source's
    // highest-Jaccard partner, with the pair's jaccard and containment
    // from the KMV k-sets — and every leg read from the ONE dashboard
    // Bundle (Sketches.ensureDashboardStore): on a warm store the corpus
    // is touched zero times and every join side is group-grain broadcast
    // (PlanSpec pins both). The oracle is q116's replay + q141's pair
    // arithmetic + the symmetrize/argmax reduction — persistence must be
    // semantically invisible across all five families at once.
    QueryDef("q149_sketch_dashboard_served",
      (s, dir) => {
        val store = System.getProperty("java.io.tmpdir") +
          "/graft_dash_" + dataStamp(dir, "documents")
        def docs = table(s, dir, "documents")
        val (t, _) = Sketches.ensureDashboardStore(docs, store)
        val est = Sketches.hllEstimateByGroup(t("hll"), 7, Seq("source"))
          .select(col("source"),
            round(col("est_distinct"), 6).as("est_distinct_tokens"))
        val piv = Sketches.momentsQuantiles(t("moments"), Seq(0.5, 0.9),
            Seq("source"))
          .groupBy(col("source"))
          .agg(
            round(max(when(col("q") === 0.5, col("est"))), 6)
              .as("p50_quality"),
            round(max(when(col("q") === 0.9, col("est"))), 6)
              .as("p90_quality"))
        val overlap = Sketches.kmvTopOverlap(t("kmv"), 64, "source")
        t("profile")
          .join(broadcast(est), Seq("source"), "left")
          .join(broadcast(t("cm_hot")), Seq("source"), "left")
          .join(broadcast(piv), Seq("source"), "left")
          .join(broadcast(overlap), Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("mean_quality"), col("lang_entropy"),
            col("est_distinct_tokens"),
            coalesce(col("n_hot_tokens"), lit(0L)).as("n_hot_tokens"),
            col("p50_quality"), col("p90_quality"),
            col("top_overlap_source"), col("top_overlap_jaccard"),
            col("top_overlap_containment"))
          .orderBy("source")
      },
      Some(dashboardServedOracleSql)),

    // Data-quality expectation suite (Expectations.metrics/uniqueness/
    // referential — the Deequ/CHECK-constraint capability): five row rules
    // in ONE conditional aggregation over documents, two exact uniqueness
    // checks, one anti-join referential check on orders→customer. NULL
    // checks FAIL (stricter than ANSI CHECK — see the operator doc). The
    // oracle replays every rule as a CASE aggregate, the uniqueness as
    // count − count(DISTINCT), and the orphan count as a LEFT-JOIN-NULL.
    QueryDef("q161_expectations_suite",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Expectations.metrics(docs, docRules)
          .unionByName(Expectations.uniquenessReport(docs, Seq("doc_id")))
          .unionByName(Expectations.uniquenessReport(docs, Seq("source", "lang")))
          .unionByName(Expectations.referentialReport(
            table(s, dir, "orders"), "o_custkey",
            table(s, dir, "customer"), "c_custkey"))
          .orderBy("rule")
      },
      Some {
        val arms = DocRuleSql.map { case (name, cond) =>
          val viol = s"sum(CASE WHEN NOT coalesce($cond, FALSE) THEN 1 ELSE 0 END)"
          s"""SELECT '$name' AS rule, $viol::BIGINT AS violations,
             |  count(*)::BIGINT AS total,
             |  round($viol::DOUBLE / count(*), 6) AS violation_frac,
             |  ($viol = 0) AS pass
             |FROM documents""".stripMargin
        }
        // NULL-faithful distinct: DISTINCT over the column tuple matches
        // Spark's countDistinct(struct(...)) (a null-fielded tuple is one
        // group); a '||'-concat proxy would drop NULL-bearing rows and
        // collide on values containing the separator.
        val uniq = Seq(
          ("unique(doc_id)",
            "(SELECT count(*) FROM (SELECT DISTINCT doc_id FROM documents))"),
          ("unique(source,lang)",
            "(SELECT count(*) FROM (SELECT DISTINCT source, lang FROM documents))")
        ).map { case (name, dist) =>
          s"""SELECT '$name' AS rule, (count(*) - $dist)::BIGINT AS violations,
             |  count(*)::BIGINT AS total,
             |  round((count(*) - $dist)::DOUBLE / count(*), 6) AS violation_frac,
             |  (count(*) = $dist) AS pass
             |FROM documents""".stripMargin
        }
        val ref =
          """SELECT 'ref(o_custkey->c_custkey)' AS rule,
            |  viol::BIGINT AS violations, tot::BIGINT AS total,
            |  round(viol::DOUBLE / tot, 6) AS violation_frac,
            |  (viol = 0) AS pass
            |FROM refc""".stripMargin
        s"""WITH refc AS (
           |  SELECT (SELECT count(*) FROM orders o
           |          LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           |          WHERE o.o_custkey IS NOT NULL
           |            AND c.c_custkey IS NULL) AS viol,
           |         (SELECT count(*) FROM orders) AS tot)
           |${(arms ++ uniq :+ ref).mkString("\nUNION ALL\n")}
           |ORDER BY rule""".stripMargin
      }),

    // The quarantine audit log (Expectations.violationRows): one
    // (doc_id, rule) row per violated rule — the tall routing table a
    // quarantine sink appends. One codegen'd projection + a rule-count-
    // bounded explode; the oracle is the per-rule UNION ALL of the same
    // predicates.
    QueryDef("q162_expectations_quarantine",
      (s, dir) =>
        Expectations.violationRows(table(s, dir, "documents"),
            Seq("doc_id"), docRules)
          .orderBy("doc_id", "rule"),
      Some {
        val arms = DocRuleSql.map { case (name, cond) =>
          s"""SELECT doc_id, '$name' AS rule FROM documents
             |WHERE NOT coalesce($cond, FALSE)""".stripMargin
        }
        s"""WITH v AS (
           |${arms.mkString("\nUNION ALL\n")})
           |SELECT doc_id, rule FROM v ORDER BY doc_id, rule""".stripMargin
      }),

    // WHICH tokens drove corpus drift (Drift.tokenShift — Monroe et al.
    // log-odds with Dirichlet prior): en docs vs es/fr docs, top-20 by
    // |z|. The corpus reduces to per-token counts in one shuffle; the
    // prior sees the full union vocab; ranking is TakeOrdered on the
    // 9-dp-rounded z with token tie-break. The oracle replays counts,
    // the exact smoothing arithmetic, and the same rounded ranking key.
    QueryDef("q165_token_shift",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        def toks(langs: Seq[String]) =
          docs.filter(col("lang").isin(langs: _*))
            .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        Drift.tokenShift(toks(Seq("en")), toks(Seq("es", "fr")), "tok",
            alpha = 0.5, minCount = 5, k = 20)
          .orderBy("rank")
      },
      Some("""WITH ta AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
        |  FROM documents WHERE lang = 'en'),
        |tb AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
        |  FROM documents WHERE lang IN ('es', 'fr')),
        |ca AS (SELECT token, count(*)::BIGINT AS c FROM ta GROUP BY 1),
        |cb AS (SELECT token, count(*)::BIGINT AS c FROM tb GROUP BY 1),
        |m AS (
        |  SELECT coalesce(ca.token, cb.token) AS token,
        |         coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b
        |  FROM ca FULL JOIN cb ON ca.token = cb.token),
        |s AS (SELECT count(*)::BIGINT AS v, sum(c_a)::BIGINT AS t_a,
        |             sum(c_b)::BIGINT AS t_b FROM m),
        |d AS (
        |  SELECT token, c_a, c_b,
        |    ln((c_a::DOUBLE + 0.5) /
        |       (t_a::DOUBLE + 0.5::DOUBLE * v - c_a::DOUBLE - 0.5)) -
        |    ln((c_b::DOUBLE + 0.5) /
        |       (t_b::DOUBLE + 0.5::DOUBLE * v - c_b::DOUBLE - 0.5)) AS delta
        |  FROM m, s WHERE c_a + c_b >= 5),
        |z AS (
        |  SELECT token, c_a, c_b, delta,
        |    delta / sqrt(1.0 / (c_a::DOUBLE + 0.5) +
        |                 1.0 / (c_b::DOUBLE + 0.5)) AS zv
        |  FROM d)
        |SELECT row_number() OVER (ORDER BY abs(round(zv, 9)) DESC, token)
        |         AS rank,
        |       token, c_a, c_b, round(delta, 6) AS delta, round(zv, 6) AS z
        |FROM z ORDER BY abs(round(zv, 9)) DESC, token LIMIT 20""".stripMargin)),

    // Categorical drift (Drift.chiSquared): is the SOURCE distribution of
    // English docs the same as the rest of the corpus? Pearson chi-squared
    // homogeneity over the 2×k contingency table — the detector for
    // discrete columns where PSI buckets / KS ordering don't apply. Each
    // side reduces to per-source counts; cells are 6-dp-rounded and
    // DECIMAL-summed (double sums are partition-order dependent). The
    // oracle replays the expected-count arithmetic cell by cell.
    QueryDef("q169_chi_squared",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Drift.chiSquared(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") =!= "en"),
          "source")
      },
      Some("""WITH RECURSIVE ca AS (
        |  SELECT source AS cat, count(*)::BIGINT AS c FROM documents
        |  WHERE lang = 'en' AND source IS NOT NULL GROUP BY 1),
        |cb AS (
        |  SELECT source AS cat, count(*)::BIGINT AS c FROM documents
        |  WHERE lang <> 'en' AND source IS NOT NULL GROUP BY 1),
        |m AS (
        |  SELECT coalesce(ca.cat, cb.cat) AS cat, coalesce(ca.c, 0) AS c_a,
        |         coalesce(cb.c, 0) AS c_b
        |  FROM ca FULL JOIN cb ON ca.cat = cb.cat),
        |t AS (SELECT sum(c_a)::BIGINT AS ta, sum(c_b)::BIGINT AS tb,
        |             count(*)::BIGINT AS k FROM m),
        |x AS (
        |  SELECT round(
        |    pow(c_a::DOUBLE - ta::DOUBLE * (c_a + c_b)::DOUBLE
        |          / (ta + tb)::DOUBLE, 2)
        |      / (ta::DOUBLE * (c_a + c_b)::DOUBLE / (ta + tb)::DOUBLE) +
        |    pow(c_b::DOUBLE - tb::DOUBLE * (c_a + c_b)::DOUBLE
        |          / (ta + tb)::DOUBLE, 2)
        |      / (tb::DOUBLE * (c_a + c_b)::DOUBLE / (ta + tb)::DOUBLE),
        |    6) AS cell
        |  FROM m, t),
        |f AS (
        |  SELECT round(sum(cell::DECIMAL(28,6))::DOUBLE, 6) AS chi2,
        |         (k - 1)::BIGINT AS dof, k::BIGINT AS n_cats,
        |         ta AS n_a, tb AS n_b
        |  FROM x, t GROUP BY k, ta, tb),
        |g AS (SELECT chi2 / 2.0 AS gx, dof / 2.0 AS ga FROM f),
        |ser(n, term, s) AS (
        |  SELECT 0, 1.0 / ga, 1.0 / ga FROM g
        |  UNION ALL
        |  SELECT n + 1, term * gx / (ga + n + 1),
        |         s + term * gx / (ga + n + 1)
        |  FROM ser, g WHERE n < 1200),
        |sv AS (SELECT s FROM ser ORDER BY n DESC LIMIT 1)
        |SELECT chi2, dof, n_cats, n_a, n_b,
        |  round(CASE WHEN n_cats >= 2
        |        THEN sqrt(chi2 / (n_a + n_b)::DOUBLE) END, 6) AS cramers_v,
        |  round(CASE WHEN n_cats < 2 THEN NULL
        |        WHEN chi2 <= 0 THEN 1.0
        |        WHEN gx > ga + 40.0 + 10.0 * sqrt(ga) THEN 0.0
        |        WHEN gx > 600.0 THEN NULL
        |        ELSE least(1.0, greatest(0.0,
        |          1.0 - exp(ga * ln(gx) - gx - lgamma(ga)) * s)) END,
        |    6) AS p_value
        |FROM f, g, sv""".stripMargin)),

    // Composition pin: the numeric profile of ONLY the rows the q161
    // expectation suite admits (Expectations.split → Stats.profile) — the
    // first report a pipeline runs on a freshly gated corpus. The oracle
    // derives the clean set directly from the rule predicates, so the
    // split → profile chain must be semantically invisible.
    QueryDef("q172_gated_profile",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val (clean, _) = Expectations.split(docs, docRules)
        graft.operators.Stats.profile(clean, Seq("n_chars"))
      },
      Some {
        val cleanCond = DocRuleSql
          .map { case (_, cond) => s"coalesce($cond, FALSE)" }
          .mkString(" AND ")
        s"""SELECT 'n_chars' AS "column", count(*)::BIGINT AS n,
           |  (count(*) - count(n_chars))::BIGINT AS n_null,
           |  count(DISTINCT n_chars)::BIGINT AS n_distinct,
           |  min(n_chars)::DOUBLE AS min_v, max(n_chars)::DOUBLE AS max_v,
           |  round(sum(CAST(round(n_chars * 1000000.0) AS BIGINT))::DOUBLE
           |        / 1e6 / count(n_chars), 6) AS mean
           |FROM documents WHERE $cleanCond""".stripMargin
      }),

    // Arbitrary-length exact-substring dedup (Lee et al. 2022, suffix-
    // array-style): maximal cross-document matches at ANY length >= 8 and
    // ANY alignment offset, per-doc merged. The corpus is augmented with
    // copies whose duplicated passage (tokens 10..45 of the source doc)
    // sits behind a variable-length junk prefix (doc_id % 8 tokens), so
    // every anchor ALIGNMENT OFFSET occurs — the straddling case the
    // fixed-grain q70/q72 span tools cannot attribute. Expected: each
    // copy's source doc reports the maximal span [10, 45] exactly,
    // junk-offset-independent. The oracle replays anchor grams (md5
    // poly-hash fold, 0-based positions), the shared-anchor sort, the
    // aligned-offset gaps-and-islands extension, and the interval merge.
    QueryDef("q198_exact_substring_spans",
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        val copies = docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat_ws(" ", concat(
              array_repeat(lit("zqx"), (col("doc_id") % 8).cast("int")),
              slice(graft.functions.TextFunctions.tokens(col("text")),
                11, 36))).as("text"))
        Dedup.exactSubstringSpans(docs.unionByName(copies),
            minLen = 8, maxOcc = 256, verifiable = true)
          .select(col("doc_id"), col("span_start").cast("long"),
            col("span_end").cast("long"), col("span_len").cast("long"),
            col("n_partners"))
          .orderBy("doc_id", "span_start")
      },
      Some(s"""WITH docs0 AS (SELECT doc_id, text FROM documents),
        |aug AS (
        |  SELECT doc_id, text FROM docs0
        |  UNION ALL
        |  SELECT doc_id + 10000,
        |    repeat('zqx ', doc_id % 8) ||
        |      array_to_string(list_slice(
        |        regexp_extract_all(lower(text), '[a-z0-9_]+'), 11, 46), ' ')
        |  FROM docs0 WHERE doc_id % 7 = 0),
        |${verifiableGramPosSql(8, "aug")},
        |${exactSubstringPairSpanSql(8, 256)},
        |sides AS (
        |  SELECT id_a AS doc_id, pa AS st, pa + len - 1 AS en,
        |         id_b AS partner FROM pspan
        |  UNION ALL
        |  SELECT id_b, pb, pb + len - 1, id_a FROM pspan),
        |iv AS (SELECT DISTINCT doc_id, st, en, partner FROM sides),
        |mx AS (SELECT *, max(en) OVER (PARTITION BY doc_id
        |         ORDER BY st, en, partner
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |       FROM iv),
        |gi AS (SELECT *, sum(CASE WHEN pm IS NULL OR st > pm + 1
        |         THEN 1 ELSE 0 END)
        |         OVER (PARTITION BY doc_id ORDER BY st, en, partner) AS g
        |       FROM mx)
        |SELECT doc_id, min(st)::BIGINT AS span_start,
        |  max(en)::BIGINT AS span_end,
        |  (max(en) - min(st) + 1)::BIGINT AS span_len,
        |  count(DISTINCT partner)::BIGINT AS n_partners
        |FROM gi GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin)),

    // The removal TRANSFORM over the same maximal matches: every larger-id
    // side of a maximal >= 12-token match sheds the matched tokens (the
    // smaller-id document keeps each passage exactly once — q72's rule,
    // but at arbitrary length instead of fixed trigram grain). The oracle
    // recomputes pair spans, expands the larger-id side to covered
    // positions, and rebuilds the surviving normalized text in order.
    QueryDef("q199_remove_exact_substrings",
      (s, dir) =>
        Dedup.removeExactSubstrings(table(s, dir, "documents"),
            minLen = 12, maxOcc = 256, verifiable = true)
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            md5(col("clean_text")).as("clean_md5"))
          .orderBy("doc_id"),
      Some(s"""WITH ${verifiableGramPosSql(12, "documents")},
        |${exactSubstringPairSpanSql(12, 256)},
        |cov AS (
        |  SELECT DISTINCT id_b AS doc_id, tp FROM (
        |    SELECT id_b, unnest(generate_series(pb, pb + len - 1)) AS tp
        |    FROM pspan)),
        |clean AS (
        |  SELECT t.doc_id, string_agg(t.t, ' ' ORDER BY t.p) AS clean_text,
        |         count(*) AS n_kept
        |  FROM tokt t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.tp
        |  WHERE c.tp IS NULL GROUP BY t.doc_id),
        |base AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |           AS n_tok
        |  FROM documents)
        |SELECT b.doc_id, b.n_tok,
        |  (b.n_tok - coalesce(c.n_kept, 0))::BIGINT AS n_removed,
        |  md5(coalesce(c.clean_text, '')) AS clean_md5
        |FROM base b LEFT JOIN clean c USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin)),

    // Cross-corpus EVAL DECONTAMINATION (the GPT-3 / Lee et al. 2022
    // contamination audit): maximal exact >= 8-token matches between the
    // train split (doc_id % 5 != 0) and the eval split (% 5 = 0), merged
    // per eval document — within-corpus duplicates are excluded BY
    // CONSTRUCTION: train anchors semi-join the eval anchor set before
    // any pairing, so train-train duplicate mass (the dominant volume at
    // corpus scale) never enters the join. The oracle replays both gram
    // pipelines, the semi-join, the train-side hot-anchor cap, the
    // per-(pair, offset) islands in eval coordinates, and the merge.
    QueryDef("q201_eval_decontamination",
      (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        Dedup.contaminationSpans(
            docs.filter(col("doc_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0),
            minLen = 8, maxOcc = 256, verifiable = true)
          .select(col("doc_id"), col("span_start").cast("long"),
            col("span_end").cast("long"), col("span_len").cast("long"),
            col("n_partners").as("n_train_sources"))
          .orderBy("doc_id", "span_start")
      },
      Some(evalDecontaminationOracleSql)),

    // The STREAMING contamination monitor under the SAME oracle: the
    // train split arrives in three chunked deliveries (batch-keyed,
    // replay-idempotent hit partitions) against the once-prepared eval
    // anchors; the cumulative report must hash-match the ONE-SHOT DuckDB
    // scan — per-doc spans complete within their delivery, so streamed ≡
    // batch over the union (the equality StreamingSpec pins, here gated
    // cross-engine).
    QueryDef("q202_streaming_decontamination",
      (s, dir) => {
        import graft.streaming.StreamingContamination
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        val p = StreamingContamination.Params(minLen = 8, maxOcc = 256,
          verifiable = true)
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft-contam-q202").toString
        StreamingContamination.prepareEval(s,
          docs.filter(col("doc_id") % 5 === 0), stateDir, p)
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        Seq(0L, 1L, 2L).foreach(k =>
          StreamingContamination.processBatch(s,
            train.filter(col("doc_id") % 3 === k), stateDir, p,
            batchKey = Some(k)))
        val out = StreamingContamination.report(s, stateDir, p)
          .select(col("doc_id"), col("span_start").cast("long"),
            col("span_end").cast("long"), col("span_len").cast("long"),
            col("n_partners").as("n_train_sources"))
          .orderBy("doc_id", "span_start")
          .localCheckpoint(true)
        graft.sources.Bundle.deleteRecursively(stateDir)
        out
      },
      Some(evalDecontaminationOracleSql)),

    // WITHIN-document arbitrary-length repeats (includeSelf): the same
    // passage pasted twice into ONE document at an arbitrary offset —
    // the Lee et al. 2022 generation-loop/boilerplate case the
    // fixed-grain q70/q74 battery only approximates. Fixture: a copy of
    // each % 9 document whose first 30 tokens appear twice, separated by
    // a doc-dependent pad so the repeat straddles any fixed grid. The
    // relaxed anchor rule (>= 2 occurrences) also keeps every cross-doc
    // match, so base-vs-copy matches ride along — the oracle replays
    // both through the same islands algebra.
    QueryDef("q203_within_doc_repeats",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val reps = docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat_ws(" ", concat(
              slice(toks, 1, 30),
              array_repeat(lit("pad"), (col("doc_id") % 5).cast("int") + 1),
              slice(toks, 1, 30))).as("text"))
        Dedup.exactSubstringSpans(docs.unionByName(reps),
            minLen = 8, maxOcc = 256, verifiable = true,
            includeSelf = true)
          .select(col("doc_id"), col("span_start").cast("long"),
            col("span_end").cast("long"), col("span_len").cast("long"),
            col("n_partners"))
          .orderBy("doc_id", "span_start")
      },
      Some(s"""WITH docs0 AS (SELECT doc_id, text FROM documents),
        |aug AS (
        |  SELECT doc_id, text FROM docs0
        |  UNION ALL
        |  SELECT doc_id + 20000,
        |    array_to_string(list_slice(
        |      regexp_extract_all(lower(text), '[a-z0-9_]+'), 1, 30), ' ')
        |      || ' ' || repeat('pad ', doc_id % 5 + 1) ||
        |    array_to_string(list_slice(
        |      regexp_extract_all(lower(text), '[a-z0-9_]+'), 1, 30), ' ')
        |  FROM docs0 WHERE doc_id % 9 = 0),
        |${verifiableGramPosSql(8, "aug")},
        |${exactSubstringPairSpanSql(8, 256, includeSelf = true)},
        |sides AS (
        |  SELECT id_a AS doc_id, pa AS st, pa + len - 1 AS en,
        |         id_b AS partner FROM pspan
        |  UNION ALL
        |  SELECT id_b, pb, pb + len - 1, id_a FROM pspan),
        |iv AS (SELECT DISTINCT doc_id, st, en, partner FROM sides),
        |mx AS (SELECT *, max(en) OVER (PARTITION BY doc_id
        |         ORDER BY st, en, partner
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |       FROM iv),
        |gi AS (SELECT *, sum(CASE WHEN pm IS NULL OR st > pm + 1
        |         THEN 1 ELSE 0 END)
        |         OVER (PARTITION BY doc_id ORDER BY st, en, partner) AS g
        |       FROM mx)
        |SELECT doc_id, min(st)::BIGINT AS span_start,
        |  max(en)::BIGINT AS span_end,
        |  (max(en) - min(st) + 1)::BIGINT AS span_len,
        |  count(DISTINCT partner)::BIGINT AS n_partners
        |FROM gi GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin)),

    // The removal TRANSFORM with includeSelf over the same augmented
    // fixture: every later within-document occurrence AND every
    // larger-id cross-document side sheds its matched tokens — each
    // passage survives exactly once corpus-wide, q199's rule extended to
    // the within-doc case. The oracle replays pair spans with the
    // relaxed anchor rule, expands the b-side (later copy) to covered
    // positions, and rebuilds the surviving normalized text in order.
    QueryDef("q204_remove_within_doc_repeats",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val reps = docs.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat_ws(" ", concat(
              slice(toks, 1, 30),
              array_repeat(lit("pad"), (col("doc_id") % 5).cast("int") + 1),
              slice(toks, 1, 30))).as("text"))
        Dedup.removeExactSubstrings(docs.unionByName(reps),
            minLen = 8, maxOcc = 256, verifiable = true,
            includeSelf = true)
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            md5(col("clean_text")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH docs0 AS (SELECT doc_id, text FROM documents),
        |aug AS (
        |  SELECT doc_id, text FROM docs0
        |  UNION ALL
        |  SELECT doc_id + 20000,
        |    array_to_string(list_slice(
        |      regexp_extract_all(lower(text), '[a-z0-9_]+'), 1, 30), ' ')
        |      || ' ' || repeat('pad ', doc_id % 5 + 1) ||
        |    array_to_string(list_slice(
        |      regexp_extract_all(lower(text), '[a-z0-9_]+'), 1, 30), ' ')
        |  FROM docs0 WHERE doc_id % 9 = 0),
        |${verifiableGramPosSql(8, "aug")},
        |${exactSubstringPairSpanSql(8, 256, includeSelf = true)},
        |cov AS (
        |  SELECT DISTINCT id_b AS doc_id, tp FROM (
        |    SELECT id_b, unnest(generate_series(pb, pb + len - 1)) AS tp
        |    FROM pspan)),
        |clean AS (
        |  SELECT t.doc_id, string_agg(t.t, ' ' ORDER BY t.p) AS clean_text,
        |         count(*) AS n_kept
        |  FROM tokt t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.tp
        |  WHERE c.tp IS NULL GROUP BY t.doc_id),
        |base AS (
        |  SELECT doc_id,
        |         len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
        |           AS n_tok
        |  FROM aug)
        |SELECT b.doc_id, b.n_tok,
        |  (b.n_tok - coalesce(c.n_kept, 0))::BIGINT AS n_removed,
        |  md5(coalesce(c.clean_text, '')) AS clean_md5
        |FROM base b LEFT JOIN clean c USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin)),

    // The decontamination ACTION over q201's scan: every maximal >= 8-token
    // train/eval match sheds its TRAIN-side tokens (eval is never edited —
    // the GPT-3 discipline removes the overlap from the training data).
    // The oracle replays the capped cross-corpus islands, resolves them to
    // train coordinates via the alignment offset, and rebuilds the
    // surviving normalized train text in order.
    QueryDef("q205_scrub_contaminated_train",
      (s, dir) => {
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        Dedup.removeContaminated(
            docs.filter(col("doc_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0),
            minLen = 8, maxOcc = 256, verifiable = true)
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            md5(col("clean_text")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(scrubOracleSql)),

    // q205's STREAMING twin: three processBatch deliveries through the
    // contamination monitor, then scrub() rebuilds the clean train text
    // against the cumulative capped match set — the report()-side global
    // cap included — so the streamed result must hash-match the one-shot
    // batch transform (the oracle is q205's SQL verbatim: same split,
    // same islands algebra, same rebuild).
    QueryDef("q206_streaming_scrub",
      (s, dir) => {
        import graft.streaming.StreamingContamination
        val docs = table(s, dir, "documents")
          .select(col("doc_id"), col("text")).localCheckpoint(true)
        val p = StreamingContamination.Params(minLen = 8, maxOcc = 256,
          verifiable = true)
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft-scrub-q206").toString
        StreamingContamination.prepareEval(s,
          docs.filter(col("doc_id") % 5 === 0), stateDir, p)
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        Seq(0L, 1L, 2L).foreach(k =>
          StreamingContamination.processBatch(s,
            train.filter(col("doc_id") % 3 === k), stateDir, p,
            batchKey = Some(k)))
        val out = StreamingContamination.scrub(s, train, stateDir, p)
          .select(col("doc_id"), col("n_tok"), col("n_removed"),
            md5(col("clean_text")).as("clean_md5"))
          .orderBy("doc_id")
          .localCheckpoint(true)
        graft.sources.Bundle.deleteRecursively(stateDir)
        out
      },
      Some(scrubOracleSql))
  )

  /** Shared by q205 (one-shot transform) and q206 (streamed deliveries +
    * scrub): the DuckDB replay of the train-side decontamination rebuild.
    */
  private def scrubOracleSql: String =
    s"""WITH tr AS (SELECT doc_id, text FROM documents
       |           WHERE doc_id % 5 <> 0),
       |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |${verifiableGramPosSql(8, "tr", "t_")},
       |${verifiableGramPosSql(8, "ev", "e_")},
       |eset AS (SELECT DISTINCT s FROM e_sp),
       |tsh AS (SELECT t_sp.* FROM t_sp JOIN eset USING (s)),
       |tcap AS (SELECT tsh.* FROM tsh JOIN (SELECT s FROM tsh GROUP BY s
       |         HAVING count(*) <= 256) c USING (s)),
       |prs AS (SELECT t.doc_id AS tid, e.doc_id AS eid, e.p AS pe,
       |               e.p - t.p AS d
       |        FROM tcap t JOIN e_sp e USING (s)),
       |isl AS (SELECT *, pe - row_number() OVER (PARTITION BY tid, eid, d
       |          ORDER BY pe) AS grp FROM prs),
       |tspan AS (SELECT tid, min(pe) - d AS t_st, max(pe) + 7 - d AS t_en
       |          FROM isl GROUP BY tid, eid, d, grp),
       |cov AS (SELECT DISTINCT doc_id, tp FROM (
       |  SELECT tid AS doc_id, unnest(generate_series(t_st, t_en)) AS tp
       |  FROM tspan)),
       |clean AS (
       |  SELECT t.doc_id, string_agg(t.t, ' ' ORDER BY t.p) AS clean_text,
       |         count(*) AS n_kept
       |  FROM t_tokt t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.tp
       |  WHERE c.tp IS NULL GROUP BY t.doc_id),
       |base AS (
       |  SELECT doc_id,
       |         len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT
       |           AS n_tok
       |  FROM tr)
       |SELECT b.doc_id, b.n_tok,
       |  (b.n_tok - coalesce(c.n_kept, 0))::BIGINT AS n_removed,
       |  md5(coalesce(c.clean_text, '')) AS clean_md5
       |FROM base b LEFT JOIN clean c USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin

  /** Shared by q201 (batch scan) and q202 (streamed deliveries): the
    * one-shot DuckDB replay of the cross-corpus contamination scan.
    */
  private def evalDecontaminationOracleSql: String =
    s"""WITH tr AS (SELECT doc_id, text FROM documents
       |           WHERE doc_id % 5 <> 0),
       |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
       |${verifiableGramPosSql(8, "tr", "t_")},
       |${verifiableGramPosSql(8, "ev", "e_")},
       |eset AS (SELECT DISTINCT s FROM e_sp),
       |tsh AS (SELECT t_sp.* FROM t_sp JOIN eset USING (s)),
       |tcap AS (SELECT tsh.* FROM tsh JOIN (SELECT s FROM tsh GROUP BY s
       |         HAVING count(*) <= 256) c USING (s)),
       |prs AS (SELECT t.doc_id AS tid, e.doc_id AS eid, e.p AS pe,
       |               e.p - t.p AS d
       |        FROM tcap t JOIN e_sp e USING (s)),
       |isl AS (SELECT *, pe - row_number() OVER (PARTITION BY tid, eid, d
       |          ORDER BY pe) AS grp FROM prs),
       |pspan AS (SELECT tid, eid, min(pe) AS st, max(pe) + 7 AS en
       |          FROM isl GROUP BY tid, eid, d, grp),
       |iv AS (SELECT DISTINCT eid AS doc_id, st, en, tid AS partner
       |       FROM pspan),
       |mx AS (SELECT *, max(en) OVER (PARTITION BY doc_id
       |         ORDER BY st, en, partner
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |       FROM iv),
       |gi AS (SELECT *, sum(CASE WHEN pm IS NULL OR st > pm + 1
       |         THEN 1 ELSE 0 END)
       |         OVER (PARTITION BY doc_id ORDER BY st, en, partner) AS g
       |       FROM mx)
       |SELECT doc_id, min(st)::BIGINT AS span_start,
       |  max(en)::BIGINT AS span_end,
       |  (max(en) - min(st) + 1)::BIGINT AS span_len,
       |  count(DISTINCT partner)::BIGINT AS n_train_sources
       |FROM gi GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin

  /** The q161/q162 document rule set — Spark rules and their DuckDB
    * predicate twins, kept adjacent so they cannot drift.
    */
  private def docRules = Seq(
    Expectations.notNull("text"),
    Expectations.inRange("n_chars", 100, 500),
    Expectations.isIn("lang", Seq("en", "de", "es", "fr")),
    Expectations.satisfies("min_words(text)",
      TextFunctions.tokenCount(col("text")) >= 20),
    Expectations.satisfies("chars_consistent",
      col("n_chars") === length(col("text"))))

  private lazy val DocRuleSql: Seq[(String, String)] = Seq(
    "not_null(text)" -> "text IS NOT NULL",
    "in_range(n_chars)" -> "n_chars >= 100 AND n_chars <= 500",
    "is_in(lang)" -> "lang IN ('en', 'de', 'es', 'fr')",
    "min_words(text)" ->
      "len(regexp_extract_all(lower(text), '[a-z0-9_]+')) >= 20",
    "chars_consistent" -> "n_chars = length(text)")

  /** q141's full replay — k-sets, thresholds, below-θ counts, the float
    * chain — shared verbatim with the served twin q142 (persistence must
    * be invisible).
    */
  private lazy val kmvOverlapOracleSql: String =
    """WITH tok AS (
        |  SELECT source,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        |  FROM documents),
        |hs AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
        |  FROM tok),
        |kst AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rank
        |    FROM hs)
        |  WHERE rank <= 64),
        |per AS (
        |  SELECT source, count(*) AS cnt, max(h) AS mx
        |  FROM kst GROUP BY source),
        |th AS (
        |  SELECT source,
        |    CASE WHEN cnt < 64 THEN 1152921504606846976 ELSE mx END
        |      AS theta,
        |    CASE WHEN cnt < 64 THEN cnt::DOUBLE
        |         ELSE 63.0 * 1152921504606846976.0 / mx::DOUBLE END AS est
        |  FROM per),
        |pr AS (
        |  SELECT a.source AS g1, b.source AS g2,
        |    least(a.theta, b.theta) AS tmin, a.est AS est_a, b.est AS est_b
        |  FROM th a JOIN th b ON a.source < b.source),
        |ca AS (
        |  SELECT p.g1, p.g2, count(*) AS ca FROM pr p
        |  JOIN kst s ON s.source = p.g1 AND s.h < p.tmin GROUP BY 1, 2),
        |cb AS (
        |  SELECT p.g1, p.g2, count(*) AS cb FROM pr p
        |  JOIN kst s ON s.source = p.g2 AND s.h < p.tmin GROUP BY 1, 2),
        |cm AS (
        |  SELECT p.g1, p.g2, count(*) AS cm FROM pr p
        |  JOIN kst x ON x.source = p.g1 AND x.h < p.tmin
        |  JOIN kst y ON y.source = p.g2 AND y.h = x.h
        |  GROUP BY 1, 2)
        |SELECT p.g1 AS source_a, p.g2 AS source_b,
        |  round(p.est_a, 6) AS est_a, round(p.est_b, 6) AS est_b,
        |  coalesce(cm.cm, 0)::BIGINT AS common_below,
        |  (coalesce(ca.ca, 0) + coalesce(cb.cb, 0)
        |    - coalesce(cm.cm, 0))::BIGINT AS union_below,
        |  round(coalesce(cm.cm, 0)::DOUBLE * 1152921504606846976.0
        |    / p.tmin::DOUBLE, 6) AS est_inter,
        |  round(CASE WHEN coalesce(ca.ca, 0) + coalesce(cb.cb, 0)
        |                   - coalesce(cm.cm, 0) > 0
        |             THEN coalesce(cm.cm, 0)::DOUBLE /
        |               (coalesce(ca.ca, 0) + coalesce(cb.cb, 0)
        |                 - coalesce(cm.cm, 0))::DOUBLE
        |             ELSE 0.0 END, 6) AS jaccard_est
        |FROM pr p
        |LEFT JOIN ca ON ca.g1 = p.g1 AND ca.g2 = p.g2
        |LEFT JOIN cb ON cb.g1 = p.g1 AND cb.g2 = p.g2
        |LEFT JOIN cm ON cm.g1 = p.g1 AND cm.g2 = p.g2
        |ORDER BY source_a, source_b""".stripMargin

  /** q130's oracle: q55's recursive-closure replay with the final
    * cluster-summary SELECT swapped for per-doc labels + the split-bucket
    * arithmetic. Tail surgery keeps the closure replay identical to q55's
    * by construction.
    */
  private lazy val leakageSplitOracleSql: String = {
    val tail = """SELECT cluster, count(*) AS n_members, max(id) AS max_id FROM (
      |  SELECT src AS id, min(node) AS cluster FROM r GROUP BY src)
      |GROUP BY cluster ORDER BY cluster""".stripMargin
    require(ccOracleSql.endsWith(tail),
      "q55 oracle tail changed; update the leakage-split surgery")
    ccOracleSql.dropRight(tail.length) +
      """SELECT id AS doc_id, cluster,
      |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT id, cluster,
      |    ('0x' || substring(md5('split_' || cluster::VARCHAR), 1, 15))::BIGINT
      |      % 100 AS b
      |  FROM (SELECT src AS id, min(node) AS cluster FROM r GROUP BY src))
      |ORDER BY doc_id""".stripMargin
  }

  /** The moments state as CTEs (expects a preceding `d` CTE with the
    * padded text and every `keys` column): quality replay `qd`, then the
    * power-sum grain `st` — shared by the q112 (per-source) and q115
    * (per-source-and-lang) state oracles and q113's estimator chain.
    */
  private def momentsStateOracleBodyFor(keys: String): String =
    s"""qd AS (
      |  SELECT $keys,
      |    round((
      |      least(len(text) / 500.0, 1.0)
      |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
      |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
      |      + least((($stopHitsSql)
      |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
      |              1.0)
      |    ) / 3.0, 6) AS x
      |  FROM d),
      |st AS (
      |  SELECT $keys, count(*)::BIGINT AS n,
      |    sum(round(x, 6)::DECIMAL(28,6)) AS s1,
      |    sum(round(x * x, 6)::DECIMAL(28,6)) AS s2,
      |    sum(round(x * x * x, 6)::DECIMAL(28,6)) AS s3,
      |    sum(round(x * x * x * x, 6)::DECIMAL(28,6)) AS s4,
      |    min(x) AS lo, max(x) AS hi
      |  FROM qd GROUP BY $keys)""".stripMargin

  private lazy val momentsStateOracleBody: String =
    momentsStateOracleBodyFor("source")

  /** q113's (and, at the two-key grain, q117's) oracle: the moments
    * state CTE plus the Cornish-Fisher chain in the exact engine
    * operation order. z(0.5) = 0 exactly (the Acklam central branch at
    * q = 0); z(0.9) and z²−1 are embedded as round-trip double literals
    * cast ::DOUBLE (DuckDB would otherwise parse them as DECIMAL and
    * change the arithmetic).
    */
  private def momentsQuantileOracleSqlFor(keys: String): String = {
    val body = momentsStateOracleBodyFor(keys)
    require(body.contains(s"GROUP BY $keys"),
      "moments oracle body changed; update the quantile chain")
    s"""WITH d AS (SELECT doc_id, source, lang, text, $padded AS p
      |            FROM documents),
      |$body,
      |${cornishFisherTailFor(keys)}""".stripMargin
  }

  /** The Cornish-Fisher estimator chain as CTEs over ANY preceding `st`
    * power-sum CTE with columns (keys…, n, s1, s2, s3, lo, hi) — shared
    * by the document-quality quantile oracles (q113/q115/q116 via
    * [[momentsQuantileOracleSqlFor]]) and the funnel-latency one (q143),
    * so every replay states the exact engine float chain once.
    */
  private[queries] def cornishFisherTailFor(keys: String): String =
    s"""m AS (
      |  SELECT $keys, s1::DOUBLE / n::DOUBLE AS mean,
      |    s2::DOUBLE / n::DOUBLE AS e2, s3::DOUBLE / n::DOUBLE AS e3,
      |    lo, hi
      |  FROM st),
      |mm AS (SELECT $keys, mean, e2 - mean * mean AS m2, e3, lo, hi FROM m),
      |sk0 AS (
      |  SELECT $keys, mean, sqrt(greatest(m2, 0.0)) AS sd,
      |    e3 - 3.0 * mean * m2 - mean * mean * mean AS m3, lo, hi
      |  FROM mm),
      |sk AS (
      |  SELECT $keys, mean, sd, lo, hi,
      |    CASE WHEN sd > 0 THEN m3 / (sd * sd * sd) ELSE 0.0 END AS skew
      |  FROM sk0),
      |qq AS (
      |  SELECT $keys, 0.5::DOUBLE AS q,
      |    round(least(greatest(mean + sd *
      |      (0.0::DOUBLE + (-1.0::DOUBLE / 6.0) * skew), lo), hi), 6) AS est
      |  FROM sk
      |  UNION ALL
      |  SELECT $keys, 0.9::DOUBLE AS q,
      |    round(least(greatest(mean + sd *
      |      (1.2815515641401563::DOUBLE +
      |       (0.6423744115500811::DOUBLE / 6.0) * skew), lo), hi), 6) AS est
      |  FROM sk)
      |SELECT $keys, q, est FROM qq ORDER BY $keys, q""".stripMargin

  private lazy val momentsQuantileOracleSql: String =
    momentsQuantileOracleSqlFor("source")

  /** q101's oracle: both Lloyd iterations unrolled — the stride init the
    * q79/q80 oracles already rebuild, then per iteration the round-6 L2²
    * argmin and the DECIMAL per-dim mean, then the summary grain.
    */
  /** One Lloyd iteration as CTEs over an `e` (vec_id, v) table: round-6
    * L2² argmin assignment against `inC`'s centroids, then the DECIMAL
    * per-dim mean — shared by the q101 (stride init) and q109 (farthest
    * init) oracles so both replay the SAME refinement formulation.
    */
  private def lloydIterSql(inC: String, suf: String): String =
    s"""d$suf AS (
      |  SELECT e.vec_id, c.cell,
      |    round(list_reduce(list_transform(generate_series(1, 64), i ->
      |      (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])), (a, b) -> a + b), 6) AS d2
      |  FROM e, $inC c),
      |a$suf AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rnk
      |    FROM d$suf) WHERE rnk = 1),
      |s$suf AS (
      |  SELECT a.cell, ds.d,
      |    round(round(sum(round(e.v[ds.d], 6)::DECIMAL(28,6))::DOUBLE, 6)
      |      / count(*), 6) AS cd
      |  FROM a$suf a JOIN e USING (vec_id),
      |       (SELECT unnest(generate_series(1, 64)) AS d) ds
      |  GROUP BY a.cell, ds.d),
      |c$suf AS (
      |  SELECT c.cell, coalesce(n.cv, c.cv) AS cv
      |  FROM $inC c LEFT JOIN (
      |    SELECT cell, list(cd ORDER BY d) AS cv FROM s$suf GROUP BY cell) n
      |  USING (cell))""".stripMargin

  private lazy val kmeansOracleSql: String = {
    def iter(inC: String, suf: String): String = lloydIterSql(inC, suf)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |samp AS (
      |  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS rn
      |  FROM e ORDER BY vec_id LIMIT 4096),
      |st AS (SELECT greatest(count(*) // 8, 1) AS step FROM samp),
      |c0 AS (
      |  SELECT (samp.rn // st.step)::INT AS cell, samp.v AS cv
      |  FROM samp, st WHERE samp.rn % st.step = 0 AND samp.rn // st.step < 8),
      |${iter("c0", "1")},
      |${iter("c1", "2")},
      |${iter("c2", "3")},
      |counts AS (
      |  -- kmeansSummary assigns against the FINAL centroids (c2): that is
      |  -- a3; s3/c3 are never referenced and DuckDB prunes them
      |  SELECT cell, count(*)::BIGINT AS n_members FROM a3 GROUP BY cell)
      |SELECT c.cell, coalesce(n.n_members, 0) AS n_members,
      |  round(sqrt(list_dot_product(c.cv, c.cv)), 4) AS cnorm
      |FROM c2 c LEFT JOIN counts n USING (cell)
      |ORDER BY c.cell""".stripMargin
  }

  /** q109's oracle: greedy farthest-point seeding fully unrolled — the
    * hash-ordered seed, three admissions by (min round-6 L2² DESC,
    * vec_id), then the Lloyd refinement via [[lloydIterSql]] and the
    * same summary tail as q101 (assignment against the FINAL centroids
    * c2 is a3; s3/c3 are never referenced and DuckDB prunes them).
    */
  private lazy val kmeansFarthestOracleSql: String = {
    def admit(inC: String, r: Int): String =
      s"""g$r AS (
        |  SELECT e.vec_id,
        |    min(round(list_reduce(list_transform(generate_series(1, 64), i ->
        |      (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])), (a, b) -> a + b), 6))
        |      AS cost
        |  FROM e, $inC c GROUP BY e.vec_id),
        |p$r AS (SELECT vec_id FROM g$r ORDER BY cost DESC, vec_id LIMIT 1),
        |i$r AS (
        |  SELECT * FROM $inC
        |  UNION ALL
        |  SELECT $r AS cell, e.v AS cv FROM e JOIN p$r USING (vec_id))"""
        .stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |seed AS (
      |  SELECT vec_id, v FROM (
      |    SELECT vec_id, v,
      |      ('0x' || substring(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
      |    FROM e) ORDER BY h, vec_id LIMIT 1),
      |i0 AS (SELECT 0 AS cell, v AS cv FROM seed),
      |${admit("i0", 1)},
      |${admit("i1", 2)},
      |${admit("i2", 3)},
      |${lloydIterSql("i3", "1")},
      |${lloydIterSql("c1", "2")},
      |${lloydIterSql("c2", "3")},
      |counts AS (
      |  SELECT cell, count(*)::BIGINT AS n_members FROM a3 GROUP BY cell)
      |SELECT c.cell, coalesce(n.n_members, 0) AS n_members,
      |  round(sqrt(list_dot_product(c.cv, c.cv)), 4) AS cnorm
      |FROM c2 c LEFT JOIN counts n USING (cell)
      |ORDER BY c.cell""".stripMargin
  }

  /** q114's oracle: the oversampled seeding fully unrolled.
    *   - seed + 3 rounds of top-3 admissions by (min round-6 L2² over
    *     the current candidate set DESC, vec_id) — candidate indices
    *     follow admission order, exactly [[graft.operators.Similarity
    *     .oversampleInit]]'s carried-min recurrence (min is associative,
    *     so min-over-all == the engine's carried fold);
    *   - the corpus weighting pass (round-6 argmin, tie → smaller idx);
    *   - the driver-side weighted recluster replayed in RAW doubles in
    *     the engine's accumulation order: greedy weighted k-means++
    *     seeding (heaviest first, then argmax w·minD with strict-> =
    *     lowest-idx ties), two weighted Lloyd sweeps whose per-dim sums
    *     fold v[d]·w in ascending candidate order (ordered list_reduce
    *     — DuckDB's left fold is the engine's += loop);
    *   - then the SAME round-6 full-corpus Lloyd refinement + summary
    *     tail as q109 (assignment against the final c2 is a3).
    */
  private lazy val kmeansOversampleOracleSql: String = {
    val sq = "list_reduce(list_transform(generate_series(1, 64), i -> " +
      "(p.cv[i] - c.cv[i]) * (p.cv[i] - c.cv[i])), (a, b) -> a + b)"
    def admitRound(prev: String, r: Int, offset: Int): String =
      s"""g$r AS MATERIALIZED (
        |  SELECT e.vec_id, e.v,
        |    min(round(list_reduce(list_transform(generate_series(1, 64), i ->
        |      (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])), (a, b) -> a + b), 6))
        |      AS cost
        |  FROM e, $prev c GROUP BY e.vec_id, e.v),
        |p$r AS (
        |  SELECT v, row_number() OVER (ORDER BY cost DESC, vec_id) AS rn
        |  FROM g$r ORDER BY cost DESC, vec_id LIMIT 3),
        |cand$r AS MATERIALIZED (
        |  SELECT * FROM $prev
        |  UNION ALL
        |  SELECT ($offset + rn - 1)::INT AS idx, v AS cv FROM p$r)"""
        .stripMargin
    def admitSeed(n: Int, prevMd: String, prevCh: Seq[String]): String = {
      val notIn = prevCh.map(c => s"SELECT idx FROM $c")
        .mkString(" UNION ALL ")
      s"""ch$n AS (
        |  SELECT idx FROM $prevMd WHERE idx NOT IN ($notIn)
        |  ORDER BY w * md DESC, idx LIMIT 1),
        |md$n AS MATERIALIZED (
        |  SELECT p.idx, p.w, p.cv, least(p.md, $sq) AS md
        |  FROM $prevMd p, (SELECT cv FROM wts JOIN ch$n USING (idx)) c)"""
        .stripMargin
    }
    def wlloydIter(prev: String, it: Int): String =
      s"""wd$it AS (
        |  SELECT p.idx, p.w, p.cv, c.cell,
        |    row_number() OVER (PARTITION BY p.idx ORDER BY $sq, c.cell)
        |      AS rnk
        |  FROM wts p, $prev c),
        |wa$it AS MATERIALIZED (SELECT idx, w, cv, cell FROM wd$it WHERE rnk = 1),
        |wsm$it AS (
        |  SELECT cell, ds.d,
        |    list_reduce(list(cv[ds.d] * w ORDER BY idx), (a, b) -> a + b)
        |      AS sm,
        |    sum(w) AS ws
        |  FROM wa$it, (SELECT unnest(generate_series(1, 64)) AS d) ds
        |  GROUP BY cell, ds.d),
        |wc$it AS MATERIALIZED (
        |  SELECT c.cell, coalesce(n.cv, c.cv) AS cv
        |  FROM $prev c LEFT JOIN (
        |    SELECT cell, list(sm / ws ORDER BY d) AS cv FROM wsm$it
        |    WHERE ws <> 0 GROUP BY cell) n
        |  USING (cell))""".stripMargin
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |seed AS (
      |  SELECT vec_id, v FROM (
      |    SELECT vec_id, v,
      |      ('0x' || substring(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
      |    FROM e) ORDER BY h, vec_id LIMIT 1),
      |cand0 AS MATERIALIZED (SELECT 0 AS idx, v AS cv FROM seed),
      |${admitRound("cand0", 1, 1)},
      |${admitRound("cand1", 2, 4)},
      |${admitRound("cand2", 3, 7)},
      |wassign AS (
      |  SELECT vec_id, idx FROM (
      |    SELECT e.vec_id, c.idx,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        round(list_reduce(list_transform(generate_series(1, 64), i ->
      |          (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])), (a, b) -> a + b), 6),
      |        c.idx) AS rnk
      |    FROM e, cand3 c) WHERE rnk = 1),
      |wts AS MATERIALIZED (
      |  SELECT c.idx, c.cv, coalesce(n.w, 0)::DOUBLE AS w
      |  FROM cand3 c LEFT JOIN
      |    (SELECT idx, count(*)::DOUBLE AS w FROM wassign GROUP BY idx) n
      |  USING (idx)),
      |ch1 AS (SELECT idx FROM wts ORDER BY w DESC, idx LIMIT 1),
      |md1 AS MATERIALIZED (
      |  SELECT p.idx, p.w, p.cv, $sq AS md
      |  FROM wts p, (SELECT cv FROM wts JOIN ch1 USING (idx)) c),
      |${admitSeed(2, "md1", Seq("ch1"))},
      |${admitSeed(3, "md2", Seq("ch1", "ch2"))},
      |${admitSeed(4, "md3", Seq("ch1", "ch2", "ch3"))},
      |wc0 AS MATERIALIZED (
      |  SELECT 0 AS cell, cv FROM wts JOIN ch1 USING (idx)
      |  UNION ALL SELECT 1, cv FROM wts JOIN ch2 USING (idx)
      |  UNION ALL SELECT 2, cv FROM wts JOIN ch3 USING (idx)
      |  UNION ALL SELECT 3, cv FROM wts JOIN ch4 USING (idx)),
      |${wlloydIter("wc0", 1)},
      |${wlloydIter("wc1", 2)},
      |${lloydIterSql("wc2", "1")},
      |${lloydIterSql("c1", "2")},
      |${lloydIterSql("c2", "3")},
      |counts AS (
      |  SELECT cell, count(*)::BIGINT AS n_members FROM a3 GROUP BY cell)
      |SELECT c.cell, coalesce(n.n_members, 0) AS n_members,
      |  round(sqrt(list_dot_product(c.cv, c.cv)), 4) AS cnorm
      |FROM c2 c LEFT JOIN counts n USING (cell)
      |ORDER BY c.cell""".stripMargin
  }

  /** q104 (live train+score) and q106 (served from the persisted
    * model) share this oracle: it retrains the whole model (priors,
    * Laplace counts, round-6 ln-ratio weights, unseen-bucket default)
    * and replays the DECIMAL score sums - persistence must be
    * semantically invisible.
    */
  private lazy val nbOracleSql: String =
    """WITH train AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y, text
      |  FROM documents WHERE doc_id % 5 < 4),
      |pri AS (SELECT sum(y)::BIGINT AS np, sum(1 - y)::BIGINT AS nn FROM train),
      |tfeat AS (
      |  SELECT doc_id, y,
      |    ('0x' || substring(md5(tok), 1, 15))::BIGINT % 4096 AS b
      |  FROM (SELECT doc_id, y,
      |          unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
      |        FROM train)),
      |cnt AS (SELECT b, sum(y)::BIGINT AS cp, sum(1 - y)::BIGINT AS cn
      |        FROM tfeat GROUP BY b),
      |tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn FROM cnt),
      |w AS (SELECT b, round(ln((cp + 1)::DOUBLE / (tp + 4096))
      |               - ln((cn + 1)::DOUBLE / (tn + 4096)), 6) AS w
      |      FROM cnt, tot),
      |w0 AS (SELECT round(ln(1.0 / (tp + 4096)) - ln(1.0 / (tn + 4096)), 6)
      |         AS w0 FROM tot),
      |hold AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4),
      |hfeat AS (
      |  SELECT doc_id,
      |    ('0x' || substring(md5(tok), 1, 15))::BIGINT % 4096 AS b
      |  FROM (SELECT doc_id,
      |          unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
      |        FROM hold)),
      |sc AS (
      |  SELECT h.doc_id,
      |    round(sum(round(coalesce(w.w, (SELECT w0 FROM w0)), 6)
      |      ::DECIMAL(28,6))::DOUBLE, 6) AS s
      |  FROM hfeat h LEFT JOIN w USING (b) GROUP BY h.doc_id),
      |prior AS (SELECT round(ln(np::DOUBLE / nn), 6) AS pr FROM pri)
      |SELECT d.doc_id,
      |  round(coalesce(sc.s, 0.0) + (SELECT pr FROM prior), 6) AS score,
      |  (round(coalesce(sc.s, 0.0) + (SELECT pr FROM prior), 6) >= 0) AS pred
      |FROM hold d LEFT JOIN sc ON sc.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q105's oracle: the COMPLETE q86/q97 BM25 replay and q79/q85 IVF-ADC
    * replay nested verbatim as CTEs (no renaming surgery — their internal
    * CTE chains stay scoped inside the nested WITH), then the exact
    * [[graft.operators.Retrieval.rrfFuse]] arithmetic: per-ranking
    * reciprocal terms rounded to 6, DECIMAL-summed, ranked per query with
    * the smaller-id tie-break, component ranks joined back.
    */
  private lazy val rrfHybridOracleSql: String = {
    val tail = "ORDER BY query_id, rank"
    require(bm25OracleSql.endsWith(tail) && ivfAdcOracleSql.endsWith(tail),
      "component oracle tails changed; update the rrf hybrid nesting")
    s"""WITH bm AS (
      |${bm25OracleSql.dropRight(tail.length)}),
      |an AS (
      |${ivfAdcOracleSql.dropRight(tail.length)}),
      |rterms AS (
      |  SELECT query_id, doc_id AS id, rank FROM bm
      |  UNION ALL
      |  SELECT query_id, id, rank FROM an),
      |fus AS (
      |  SELECT query_id, id,
      |    round(sum(round(1.0 / (60 + rank), 6)::DECIMAL(28,6))::DOUBLE, 6)
      |      AS rrf
      |  FROM rterms GROUP BY 1, 2),
      |rk AS (
      |  SELECT query_id, id, rrf,
      |    row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, id)
      |      AS rank
      |  FROM fus)
      |SELECT r.query_id, r.rank, r.id, r.rrf,
      |  bm.rank AS bm25_rank, an.rank AS ann_rank
      |FROM rk r
      |LEFT JOIN bm ON bm.query_id = r.query_id AND bm.doc_id = r.id
      |LEFT JOIN an ON an.query_id = r.query_id AND an.id = r.id
      |WHERE r.rank <= 10
      |ORDER BY r.query_id, r.rank""".stripMargin
  }

  /** q100's oracle: [[ccOracleSql]]'s transitive closure with the rollup
    * tail swapped for a per-cluster quality argmax.
    */
  private lazy val keepBestOracleSql: String = {
    val tail = """SELECT cluster, count(*) AS n_members, max(id) AS max_id FROM (
      |  SELECT src AS id, min(node) AS cluster FROM r GROUP BY src)
      |GROUP BY cluster ORDER BY cluster""".stripMargin
    require(ccOracleSql.endsWith(tail),
      "cc oracle tail changed; update the keep-best surgery")
    ccOracleSql.dropRight(tail.length) +
      s""",lbl AS (SELECT src AS id, min(node) AS cluster FROM r GROUP BY src),
        |qd AS (SELECT doc_id, text, $padded AS p FROM documents),
        |qual AS (
        |  SELECT doc_id AS id,
        |    round((
        |      least(len(text) / 500.0, 1.0)
        |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
        |      + least((($stopHitsSql)
        |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
        |              1.0)
        |    ) / 3.0, 6) AS score
        |  FROM qd),
        |best AS (
        |  SELECT cluster, id, score,
        |    row_number() OVER (PARTITION BY cluster ORDER BY score DESC, id)
        |      AS rnk,
        |    count(*) OVER (PARTITION BY cluster) AS n_members
        |  FROM lbl JOIN qual USING (id))
        |SELECT cluster, id AS keep_id, score AS best_score,
        |       n_members::BIGINT AS n_members
        |FROM best WHERE rnk = 1 ORDER BY cluster""".stripMargin
  }

  /** q108's dashboard frame (unordered) — q116 appends the moments
    * quantile columns onto the same grain, so both queries share one
    * plan shape: corpus scanned once per sketch leg, every join side
    * bounded by the source/vocab grain.
    */
  private def sketchDashboardFrame(s: org.apache.spark.sql.SparkSession,
                                   dir: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = table(s, dir, "documents")
    val toks = docs.select(col("source"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    val est = Sketches.hllEstimateByGroup(
        Sketches.hllRegisters(toks, "tok", b = 7,
          groupCols = Seq("source")), 7, Seq("source"))
      .select(col("source"),
        round(col("est_distinct"), 6).as("est_distinct_tokens"))
    val counters = Sketches.cmCounters(toks, "tok", d = 4, w = 512)
    val hot = Sketches.cmEstimate(counters,
        toks.select(col("tok")).distinct(), "tok", 4, 512)
      .filter(col("cm_est") >= 500)
    val nHot = toks.distinct().join(broadcast(hot.select(col("tok"))),
        Seq("tok"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_hot_tokens"))
    Quality.corpusReport(docs)
      .join(est, Seq("source"), "left")
      .join(nHot, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("lang_entropy"),
        col("est_distinct_tokens"),
        coalesce(col("n_hot_tokens"), lit(0L)).as("n_hot_tokens"))
  }

  /** q108's oracle: the q99 report replay joined with a FULL replay of
    * the b=7 HLL estimator — integer registers, the DECIMAL(38,0) scaled
    * harmonic accumulator, then the same left-associated float constant
    * and linear-counting branch the engine computes (each branch rounded
    * to 6, the q99 ln discipline) — and the q103 count-min probe counted
    * per source at threshold 500.
    */
  private lazy val sketchDashboardOracleSql: String =
    s"""WITH d AS (SELECT doc_id, source, lang, text, $padded AS p
      |            FROM documents),
      |qd AS (
      |  SELECT doc_id, source, lang,
      |    len(regexp_extract_all(lower(text), '[a-z0-9_]+'))::BIGINT AS n_tok,
      |    round((
      |      least(len(text) / 500.0, 1.0)
      |      + greatest(0.0, 1.0 - (len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
      |                 / greatest(len(text), 1)::DOUBLE) * 5.0)
      |      + least((($stopHitsSql)
      |               / greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)::DOUBLE) * 5.0,
      |              1.0)
      |    ) / 3.0, 6) AS q
      |  FROM d),
      |per AS (
      |  SELECT source, count(*)::BIGINT AS n_docs,
      |         sum(n_tok)::BIGINT AS n_tokens,
      |         round(sum(q::DECIMAL(28,6))::DOUBLE / count(*), 6)
      |           AS mean_quality
      |  FROM qd GROUP BY source),
      |lc AS (
      |  SELECT source, lang, count(*)::BIGINT AS nl
      |  FROM qd GROUP BY 1, 2),
      |ent AS (
      |  SELECT lc.source,
      |    round(-sum(round((lc.nl::DOUBLE / per.n_docs)
      |        * ln(lc.nl::DOUBLE / per.n_docs), 6)::DECIMAL(28,6))::DOUBLE, 6)
      |      AS lang_entropy
      |  FROM lc JOIN per ON per.source = lc.source GROUP BY 1),
      |tok AS (
      |  SELECT source,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
      |  FROM documents),
      |hreg AS (
      |  SELECT source, (h % 128)::INT AS bucket,
      |    max(CASE WHEN h // 128 = 0 THEN 54
      |             ELSE 54 - len(bin(h // 128)) END)::INT AS max_rho
      |  FROM (SELECT source,
      |          ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h FROM tok)
      |  GROUP BY 1, 2),
      |hz AS (
      |  SELECT source,
      |    sum(((1::BIGINT) << (54 - max_rho))::DECIMAL(38,0)) AS zs,
      |    count(*)::BIGINT AS nb
      |  FROM hreg GROUP BY source),
      |hest AS (
      |  SELECT source,
      |    CASE WHEN e <= 2.5 * 128 AND zeros > 0
      |         THEN round(128 * ln(128.0 / zeros), 6)
      |         ELSE round(e, 6) END AS est_distinct_tokens
      |  FROM (SELECT source,
      |          0.7213 / (1 + 1.079 / 128.0) * 128 * 128 * 18014398509481984.0
      |            / ((zs + (128 - nb)::DECIMAL(38,0) * 18014398509481984)::DOUBLE)
      |            AS e,
      |          128 - nb AS zeros
      |        FROM hz)),
      |counters AS (
      |  SELECT j, bucket, count(*)::BIGINT AS cnt FROM (
      |    SELECT js.j,
      |      ('0x' || substring(md5('cm' || js.j::VARCHAR || '_' || tok), 1, 15))::BIGINT
      |        % 512 AS bucket
      |    FROM tok, (SELECT unnest(generate_series(0, 3)) AS j) js)
      |  GROUP BY j, bucket),
      |probes AS (SELECT DISTINCT tok FROM tok),
      |cmest AS (
      |  SELECT p.tok, min(coalesce(c.cnt, 0)) AS cm_est FROM (
      |    SELECT tok, js.j,
      |      ('0x' || substring(md5('cm' || js.j::VARCHAR || '_' || tok), 1, 15))::BIGINT
      |        % 512 AS bucket
      |    FROM probes, (SELECT unnest(generate_series(0, 3)) AS j) js) p
      |  LEFT JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
      |  GROUP BY p.tok),
      |hot AS (SELECT tok FROM cmest WHERE cm_est >= 500),
      |nhot AS (
      |  SELECT st.source, count(*)::BIGINT AS n_hot_tokens
      |  FROM (SELECT DISTINCT source, tok FROM tok) st JOIN hot USING (tok)
      |  GROUP BY st.source)
      |SELECT per.source, n_docs, n_tokens, mean_quality, lang_entropy,
      |  est_distinct_tokens, coalesce(n_hot_tokens, 0) AS n_hot_tokens
      |FROM per
      |JOIN ent ON ent.source = per.source
      |JOIN hest ON hest.source = per.source
      |LEFT JOIN nhot ON nhot.source = per.source
      |ORDER BY per.source""".stripMargin

  /** q116's oracle: q108's full dashboard replay with the q113
    * Cornish-Fisher chain appended (power sums straight from the
    * dashboard's own round-6 `qd.q`, estimator arithmetic in the exact
    * engine operation order) and the two estimates pivoted to columns.
    * String surgery on the shared oracle keeps the dashboard replay
    * identical by construction.
    */
  private lazy val sketchDashboardQuantilesOracleSql: String = {
    val tail = """SELECT per.source, n_docs, n_tokens, mean_quality, lang_entropy,
      |  est_distinct_tokens, coalesce(n_hot_tokens, 0) AS n_hot_tokens
      |FROM per
      |JOIN ent ON ent.source = per.source
      |JOIN hest ON hest.source = per.source
      |LEFT JOIN nhot ON nhot.source = per.source
      |ORDER BY per.source""".stripMargin
    require(sketchDashboardOracleSql.endsWith(tail),
      "q108 oracle tail changed; update the quantile-dashboard surgery")
    sketchDashboardOracleSql.dropRight(tail.length) +
      s""",mst AS (
      |  SELECT source, count(*)::BIGINT AS n,
      |    sum(round(q, 6)::DECIMAL(28,6)) AS s1,
      |    sum(round(q * q, 6)::DECIMAL(28,6)) AS s2,
      |    sum(round(q * q * q, 6)::DECIMAL(28,6)) AS s3,
      |    min(q) AS lo, max(q) AS hi
      |  FROM qd GROUP BY source),
      |mm0 AS (
      |  SELECT source, s1::DOUBLE / n::DOUBLE AS mean,
      |    s2::DOUBLE / n::DOUBLE AS e2, s3::DOUBLE / n::DOUBLE AS e3,
      |    lo, hi
      |  FROM mst),
      |mm1 AS (SELECT source, mean, e2 - mean * mean AS m2, e3, lo, hi
      |        FROM mm0),
      |mm2 AS (
      |  SELECT source, mean, sqrt(greatest(m2, 0.0)) AS sd,
      |    e3 - 3.0 * mean * m2 - mean * mean * mean AS m3, lo, hi
      |  FROM mm1),
      |mm3 AS (
      |  SELECT source, mean, sd, lo, hi,
      |    CASE WHEN sd > 0 THEN m3 / (sd * sd * sd) ELSE 0.0 END AS skew
      |  FROM mm2),
      |mq AS (
      |  SELECT source,
      |    round(least(greatest(mean + sd *
      |      (0.0::DOUBLE + (-1.0::DOUBLE / 6.0) * skew), lo), hi), 6)
      |      AS p50_quality,
      |    round(least(greatest(mean + sd *
      |      (1.2815515641401563::DOUBLE +
      |       (0.6423744115500811::DOUBLE / 6.0) * skew), lo), hi), 6)
      |      AS p90_quality
      |  FROM mm3)
      |SELECT per.source, n_docs, n_tokens, mean_quality, lang_entropy,
      |  est_distinct_tokens, coalesce(n_hot_tokens, 0) AS n_hot_tokens,
      |  p50_quality, p90_quality
      |FROM per
      |JOIN ent ON ent.source = per.source
      |JOIN hest ON hest.source = per.source
      |LEFT JOIN nhot ON nhot.source = per.source
      |LEFT JOIN mq ON mq.source = per.source
      |ORDER BY per.source""".stripMargin
  }

  /** q149's oracle: q116's full replay with its final SELECT swapped for
    * the q141 KMV pair arithmetic (k-sets over the shared `tok` CTE,
    * thresholds, below-theta counts, the exact float chain) plus the
    * symmetrize/argmax reduction to each source's top-overlap partner.
    * String surgery keeps the five-family replay identical to q116's by
    * construction.
    */
  private lazy val dashboardServedOracleSql: String = {
    val tail = """SELECT per.source, n_docs, n_tokens, mean_quality, lang_entropy,
      |  est_distinct_tokens, coalesce(n_hot_tokens, 0) AS n_hot_tokens,
      |  p50_quality, p90_quality
      |FROM per
      |JOIN ent ON ent.source = per.source
      |JOIN hest ON hest.source = per.source
      |LEFT JOIN nhot ON nhot.source = per.source
      |LEFT JOIN mq ON mq.source = per.source
      |ORDER BY per.source""".stripMargin
    require(sketchDashboardQuantilesOracleSql.endsWith(tail),
      "q116 oracle tail changed; update the dashboard-store surgery")
    sketchDashboardQuantilesOracleSql.dropRight(tail.length) +
      """,khs AS (
      |  SELECT DISTINCT source,
      |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
      |  FROM tok),
      |kst AS (
      |  SELECT source, h FROM (
      |    SELECT source, h,
      |      row_number() OVER (PARTITION BY source ORDER BY h) AS rank
      |    FROM khs)
      |  WHERE rank <= 64),
      |kper AS (
      |  SELECT source, count(*) AS cnt, max(h) AS mx
      |  FROM kst GROUP BY source),
      |kth AS (
      |  SELECT source,
      |    CASE WHEN cnt < 64 THEN 1152921504606846976 ELSE mx END AS theta,
      |    CASE WHEN cnt < 64 THEN cnt::DOUBLE
      |         ELSE 63.0 * 1152921504606846976.0 / mx::DOUBLE END AS est
      |  FROM kper),
      |kpr AS (
      |  SELECT a.source AS g1, b.source AS g2,
      |    least(a.theta, b.theta) AS tmin, a.est AS est_a, b.est AS est_b
      |  FROM kth a JOIN kth b ON a.source < b.source),
      |kca AS (
      |  SELECT p.g1, p.g2, count(*) AS ca FROM kpr p
      |  JOIN kst s ON s.source = p.g1 AND s.h < p.tmin GROUP BY 1, 2),
      |kcb AS (
      |  SELECT p.g1, p.g2, count(*) AS cb FROM kpr p
      |  JOIN kst s ON s.source = p.g2 AND s.h < p.tmin GROUP BY 1, 2),
      |kcm AS (
      |  SELECT p.g1, p.g2, count(*) AS cm FROM kpr p
      |  JOIN kst x ON x.source = p.g1 AND x.h < p.tmin
      |  JOIN kst y ON y.source = p.g2 AND y.h = x.h
      |  GROUP BY 1, 2),
      |kmat AS (
      |  SELECT p.g1, p.g2,
      |    round(p.est_a, 6) AS est_a, round(p.est_b, 6) AS est_b,
      |    round(coalesce(kcm.cm, 0)::DOUBLE * 1152921504606846976.0
      |      / p.tmin::DOUBLE, 6) AS est_inter,
      |    round(CASE WHEN coalesce(kca.ca, 0) + coalesce(kcb.cb, 0)
      |                    - coalesce(kcm.cm, 0) > 0
      |               THEN coalesce(kcm.cm, 0)::DOUBLE /
      |                 (coalesce(kca.ca, 0) + coalesce(kcb.cb, 0)
      |                   - coalesce(kcm.cm, 0))::DOUBLE
      |               ELSE 0.0 END, 6) AS jaccard_est
      |  FROM kpr p
      |  LEFT JOIN kca ON kca.g1 = p.g1 AND kca.g2 = p.g2
      |  LEFT JOIN kcb ON kcb.g1 = p.g1 AND kcb.g2 = p.g2
      |  LEFT JOIN kcm ON kcm.g1 = p.g1 AND kcm.g2 = p.g2),
      |ksym AS (
      |  SELECT g1 AS source, g2 AS partner, jaccard_est, est_inter,
      |    est_a AS self_est, est_b AS partner_est FROM kmat
      |  UNION ALL
      |  SELECT g2, g1, jaccard_est, est_inter, est_b, est_a FROM kmat),
      |ktop AS (
      |  SELECT source, partner AS top_overlap_source,
      |    jaccard_est AS top_overlap_jaccard,
      |    round(est_inter / least(self_est, partner_est), 6)
      |      AS top_overlap_containment
      |  FROM (SELECT *, row_number() OVER (PARTITION BY source
      |          ORDER BY jaccard_est DESC, partner) AS rn
      |        FROM ksym)
      |  WHERE rn = 1)
      |SELECT per.source, n_docs, n_tokens, mean_quality, lang_entropy,
      |  est_distinct_tokens, coalesce(n_hot_tokens, 0) AS n_hot_tokens,
      |  p50_quality, p90_quality,
      |  top_overlap_source, top_overlap_jaccard, top_overlap_containment
      |FROM per
      |JOIN ent ON ent.source = per.source
      |JOIN hest ON hest.source = per.source
      |LEFT JOIN nhot ON nhot.source = per.source
      |LEFT JOIN mq ON mq.source = per.source
      |LEFT JOIN ktop ON ktop.source = per.source
      |ORDER BY per.source""".stripMargin
  }

  /** q93's oracle: q79's quantizer-replay SQL with the final top-10
    * selection swapped for the refine chain (ADC candidates at rank ≤ 40 →
    * exact squared L2 against raw vectors → re-rank to 10). String surgery
    * on the shared builder keeps the two oracles' training/encode replay
    * identical by construction.
    */
  private lazy val ivfAdcRefineOracleSql: String = {
    val tail = """SELECT query_id, rank, id, dist FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin
    require(ivfAdcOracleSql.endsWith(tail),
      "q79 oracle tail changed; update the refine surgery")
    ivfAdcOracleSql.dropRight(tail.length) +
      """,rcand AS (SELECT query_id, id FROM ranked WHERE rank <= 40),
        |rex AS (
        |  SELECT c.query_id, c.id,
        |    round(list_reduce(list_transform(generate_series(1, 64), i ->
        |      (q.v[i] - t.v[i]) * (q.v[i] - t.v[i])), (a, b) -> a + b), 6)
        |      AS dist
        |  FROM rcand c JOIN e q ON q.vec_id = c.query_id
        |               JOIN e t ON t.vec_id = c.id),
        |rranked AS (
        |  SELECT query_id, id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rank
        |  FROM rex)
        |SELECT query_id, rank, id, dist FROM rranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin
  }

  /** Cluster rollup over the Jaccard near-dup graph — q55 runs label
    * propagation, q62 star contraction; same result by construction.
    */
  private def ccClusterQuery(s: org.apache.spark.sql.SparkSession,
                             dir: String, star: Boolean): org.apache.spark.sql.DataFrame = {
    val docs = table(s, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8)
    val vertices = docs.select(col("doc_id"))
    val labels =
      if (star) Clusters.starComponents(pairs, vertices, idCol = "doc_id")
      else Clusters.components(pairs, vertices, idCol = "doc_id")
    labels.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
      .orderBy("cluster")
  }

  /** The transitive-closure oracle both CC algorithms are checked against:
    * min reachable id over the recomputed Jaccard pair list.
    */
  /** The q55 transitive-closure CTE chain (trigram shingles → Jaccard ≥
    * 0.8 pairs → recursive closure `r(src, node)`), parameterized on the
    * doc relation so composition queries (q134) can close over a DERIVED
    * corpus slice with the identical replay.
    */
  private def ccClosureCtes(docsRel: String): String =
    s"""toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
      |  FROM $docsRel),
      |sh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
      |    FROM (SELECT doc_id, t,
      |            unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
      |          FROM toks))),
      |sized AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sized sa ON id_a = sa.doc_id JOIN sized sb ON id_b = sb.doc_id
      |  WHERE inter / (sa.n_sh + sb.n_sh - inter)::DOUBLE >= 0.8),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |r(src, node) AS (
      |  SELECT doc_id, doc_id FROM $docsRel
      |  UNION
      |  SELECT r.src, e.b FROM r JOIN edges e ON e.a = r.node)""".stripMargin

  private def ccOracleSql: String =
    "WITH RECURSIVE " + ccClosureCtes("documents") + """
      |SELECT cluster, count(*) AS n_members, max(id) AS max_id FROM (
      |  SELECT src AS id, min(node) AS cluster FROM r GROUP BY src)
      |GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Shared oracle CTE: the verifiable trigram hash rows — md5-derived
    * 60-bit token hash mod 1e9+7, lead-window trigram poly-combine (the
    * exact function `Dedup.shingleRows(verifiable = true)` computes).
    */
  /** Like [[verifiableTrigramSql]] but keeping each trigram's starting
    * token position: final CTE `sp(doc_id, p, s)`.
    */
  private def verifiableTrigramPosSql: String =
    """tok AS (
      |  SELECT doc_id, u.p AS p, u.h AS h FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
      |        (x, i) -> {'p': i,
      |                   'h': ('0x' || substring(md5(x), 1, 15))::BIGINT % 1000000007})) AS u
      |    FROM documents)),
      |led AS (
      |  SELECT doc_id, p, h AS h1,
      |         lead(h, 1) OVER (PARTITION BY doc_id ORDER BY p) AS h2,
      |         lead(h, 2) OVER (PARTITION BY doc_id ORDER BY p) AS h3
      |  FROM tok),
      |sp AS (
      |  SELECT doc_id, p,
      |         ((h1 * 1000003 + h2) % 1000000007 * 1000003 + h3) % 1000000007 AS s
      |  FROM led WHERE h3 IS NOT NULL)""".stripMargin

  /** Oracle CTEs for the verifiable n-token anchor gram at every 0-based
    * position (the exact rows `Dedup.shinglePosRows(n, verifiable=true)`
    * produces): `tokt(doc_id, p, t)` with 0-based p, plus
    * `sp(doc_id, p, s)` where s is the left-fold md5/1e9+7 poly-hash of
    * the n tokens starting at p. Positions are 0-based (DuckDB's lambda
    * index is 1-based; Spark's posexplode is 0-based — q198 emits
    * ABSOLUTE positions, so the bases must agree).
    */
  private def verifiableGramPosSql(n: Int, tbl: String,
                                   pfx: String = ""): String = {
    val comb = (1 until n)
      .map(k => s"lead(h0, $k) OVER (PARTITION BY doc_id ORDER BY p)")
      .foldLeft("h0")((acc, t) => s"(($acc) * 1000003 + ($t)) % 1000000007")
    s"""${pfx}tokt AS (
       |  SELECT doc_id, u.p AS p, u.t AS t FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
       |        (x, i) -> {'p': i - 1, 't': x})) AS u
       |    FROM $tbl)),
       |${pfx}hh AS (
       |  SELECT doc_id, p,
       |         ('0x' || substring(md5(t), 1, 15))::BIGINT % 1000000007 AS h0
       |  FROM ${pfx}tokt),
       |${pfx}led AS (
       |  SELECT doc_id, p, $comb AS s,
       |         lead(h0, ${n - 1}) OVER (PARTITION BY doc_id ORDER BY p) AS hl
       |  FROM ${pfx}hh),
       |${pfx}sp AS (SELECT doc_id, p, s FROM ${pfx}led WHERE hl IS NOT NULL)""".stripMargin
  }

  /** Oracle CTEs for [[Dedup.exactSubstringPairSpans]] given `sp` anchor
    * rows: shared-anchor sort (>= 2 docs — or >= 2 OCCURRENCES with
    * `includeSelf`, which also admits same-document pairs at offset
    * d != 0 with the b-side pinned to the later occurrence), hot-gram
    * cap, aligned occurrence pairs, and per-(pair, offset)
    * gaps-and-islands maximal extension. Final CTE
    * `pspan(id_a, id_b, pa, pb, len)`.
    */
  private def exactSubstringPairSpanSql(minLen: Int, cap: Int,
                                        includeSelf: Boolean = false): String = {
    val sharedCond = if (includeSelf) "cnt >= 2" else "nd >= 2"
    val pairCond =
      if (includeSelf)
        "(a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND b.p > a.p))"
      else "a.doc_id < b.doc_id"
    s"""gs AS (SELECT s, count(*) AS cnt, count(DISTINCT doc_id) AS nd
       |       FROM sp GROUP BY s),
       |shared AS (SELECT s FROM gs WHERE $sharedCond AND cnt <= $cap),
       |ss AS (SELECT doc_id, p, s FROM sp JOIN shared USING (s)),
       |prs AS (
       |  SELECT a.doc_id AS id_a, a.p AS p_a, b.doc_id AS id_b, b.p AS p_b,
       |         a.p - b.p AS d
       |  FROM ss a JOIN ss b ON a.s = b.s AND $pairCond),
       |isl AS (
       |  SELECT *, p_a - row_number()
       |    OVER (PARTITION BY id_a, id_b, d ORDER BY p_a) AS grp
       |  FROM prs),
       |pspan AS (
       |  SELECT id_a, id_b, min(p_a) AS pa, min(p_b) AS pb,
       |         max(p_a) - min(p_a) + $minLen AS len
       |  FROM isl GROUP BY id_a, id_b, d, grp)""".stripMargin
  }

  private def verifiableTrigramSql: String =
    """tok AS (
      |  SELECT doc_id, u.p AS p, u.h AS h FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(regexp_extract_all(lower(text), '[a-z0-9_]+'),
      |        (x, i) -> {'p': i,
      |                   'h': ('0x' || substring(md5(x), 1, 15))::BIGINT % 1000000007})) AS u
      |    FROM documents)),
      |led AS (
      |  SELECT doc_id, h AS h1,
      |         lead(h, 1) OVER (PARTITION BY doc_id ORDER BY p) AS h2,
      |         lead(h, 2) OVER (PARTITION BY doc_id ORDER BY p) AS h3
      |  FROM tok),
      |sh AS (
      |  SELECT doc_id,
      |         ((h1 * 1000003 + h2) % 1000000007 * 1000003 + h3) % 1000000007 AS s
      |  FROM led WHERE h3 IS NOT NULL)""".stripMargin
}
