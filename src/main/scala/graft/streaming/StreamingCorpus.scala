package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.functions.TextFunctions
import graft.operators.Quality
import graft.sources.CorpusIO

/** The q59 corpus recipe as a CONTINUOUS pipeline — the shape a crawler
  * feed actually runs: JSONL shards dropped into a directory, each trigger
  * parses → routes malformed lines → exactly-once cross-batch dedup →
  * quality gate → sharded parquet, with all progress (source files, dedup
  * state, sink commits) in one checkpoint, so a restart resumes mid-corpus
  * without reprocessing or duplicating output.
  *
  * Stage order and why each is streamable:
  *  1. [[CorpusIO.readJsonlStream]] — schema-required file source;
  *     malformed lines survive as `_corrupt_record` rows and are filtered
  *     (not crashed on) here, exactly like the batch reader's contract.
  *  2. [[StreamingDedup.exactDedupStream]] — the ONE stateful operator:
  *     16-byte fingerprint keyed state, first occurrence wins.
  *  3. Quality gate — Gopher document rules + C4 line cleaning as a single
  *     STATELESS projection ([[Quality.gopherStats]] columns +
  *     [[Quality.c4CleanText]]); an aggregation-based quality pass would
  *     not be append-mode expressible, a projection is.
  *  4. Sharded parquet sink — `maxRecordsPerFile` bounds shard size, the
  *     file-sink commit log makes output exactly-once under restart.
  *
  * The batch twin (readJsonl → Dedup.exact → same projection) produces the
  * identical kept set on the concatenated input when ids arrive in
  * increasing order — the natural stream contract — and StreamingSpec
  * asserts it across triggers and a checkpoint restart. Near-dup CC and
  * token packing (q59's tail stages) are inherently corpus-global and stay
  * batch: the streaming recipe lands deduped, quality-gated shards that
  * those stages consume downstream.
  */
object StreamingCorpus {

  /** The quality projection shared by the stream and its batch twin:
    * Gopher stats + pass flag, C4-cleaned text + its token count.
    * Input must carry (id, text); output one row per PASSING document.
    */
  private[graft] def qualityProjection(docs: DataFrame, minWords: Int,
                                       minStopHits: Int,
                                       minLineWords: Int): DataFrame = {
    // ONE stateless projection per micro-batch: text rides through
    // gopherStats via keepCols (a stats-then-self-join to re-attach it
    // would cost a hash join every trigger)
    val cleaned = Quality.c4CleanText(col("text"), minLineWords)
    Quality.gopherStats(docs, textCol = "text", idCol = "id",
        minWords = minWords, minStopHits = minStopHits,
        keepCols = Seq("text"))
      .filter(col("gopher_pass"))
      .select(
        col("id").as("doc_id"),
        cleaned.as("text_clean"),
        TextFunctions.tokenCount(cleaned).as("n_tok_clean"),
        col("n_words"), col("mean_word_len"), col("alpha_frac"),
        col("symbol_ratio"), col("stop_hits"))
  }

  /** Start the continuous recipe: `inPath` JSONL drop dir → `outPath`
    * parquet shards, checkpoint (source progress + dedup state + sink log)
    * at `checkpointDir`. `schema` must contain `doc_id` and `text`.
    */
  def corpusRecipeStream(spark: SparkSession, inPath: String,
                         schema: StructType, outPath: String,
                         checkpointDir: String,
                         minWords: Int = 50, minStopHits: Int = 2,
                         minLineWords: Int = 5,
                         maxFilesPerTrigger: Int = 64,
                         maxRecordsPerFile: Long = 1000000): StreamingQuery = {
    val raw = CorpusIO.readJsonlStream(spark, inPath, schema,
      maxFilesPerTrigger)
    val clean = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val deduped = StreamingDedup.exactDedupStream(clean).toDF()
    qualityProjection(deduped, minWords, minStopHits, minLineWords)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .outputMode("append")
      .start()
  }

  /** The batch twin over the SAME stages (schema-required read → exact
    * dedup → quality projection) — what the stream must converge to on the
    * concatenated input. Spec hook and backfill path.
    */
  def corpusRecipeBatch(spark: SparkSession, inPath: String,
                        schema: StructType, minWords: Int = 50,
                        minStopHits: Int = 2,
                        minLineWords: Int = 5): DataFrame = {
    val (clean, _) = CorpusIO.partitionCorrupt(
      CorpusIO.readJsonl(spark, inPath, schema))
    val deduped = graft.operators.Dedup.exact(clean)
      .select(col("doc_id").as("id"), col("text"))
    qualityProjection(deduped, minWords, minStopHits, minLineWords)
  }
}
