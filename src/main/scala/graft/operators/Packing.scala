package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents, in a deterministic
  * order, to training shards of ~`budget` tokens each — the corpus-side
  * half of LLM sequence packing (which docs share a context window /
  * output shard).
  *
  * Shard of a document = floor(cumulative tokens BEFORE it / budget): the
  * streaming-chunking approximation of greedy packing (a shard may
  * overflow by at most one document's tokens; exact greedy bin-packing is
  * inherently sequential). The global prefix sum is computed as a
  * DISTRIBUTED two-phase scan, not a single-partition window:
  *   1. bucket docs by id range; per-bucket token totals (tiny) are
  *      prefix-summed on the driver;
  *   2. a per-bucket window (parallel across buckets) adds the in-bucket
  *      prefix to the bucket's broadcast base offset.
  * A naive `Window.orderBy(id)` with no partitioning collapses to ONE
  * task at 100 TB; this shape keeps n_buckets-way parallelism with one
  * driver-side array of n_buckets longs.
  */
object Packing {

  /** @param docs       input with `idCol` (dense-ish ordering key) and
    *                   `tokenCol` (per-doc token count)
    * @param budget     tokens per shard
    * @param bucketWidth id-range width per scan bucket (ids need not be
    *                   dense — skew across buckets only skews task sizes,
    *                   never correctness)
    * @return input + (shard, shard_offset) — offset = tokens before this
    *         doc within its shard
    */
  def packSequences(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                    tokenCol: String = "n_tok",
                    bucketWidth: Long = 1 << 20): DataFrame = {
    require(budget > 0)
    val bucketed = docs.withColumn("_b", floor(col(idCol) / bucketWidth))
    // phase 1: per-bucket totals → driver prefix sum (n_buckets rows)
    val totals = bucketed.groupBy(col("_b"))
      .agg(sum(col(tokenCol)).as("_t"))
      .orderBy(col("_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val spark = docs.sparkSession
    import spark.implicits._
    // base(i) = total tokens in all buckets before bucket i
    val cum = totals.map(_._2).scanLeft(0L)(_ + _)
    val baseDf = totals.map(_._1).zip(cum).toSeq.toDF("_b", "_base")
    // phase 2: in-bucket running sum (parallel across buckets) + base
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(baseDf), Seq("_b"))
      .withColumn("_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)) + col("_base"))
      .withColumn("shard", floor(col("_before") / budget).cast("long"))
      .withColumn("shard_offset", pmod(col("_before"), lit(budget)))
      .drop("_b", "_base", "_before")
  }

  /** Materialize the packed TRAINING SEQUENCES: concatenate each shard's
    * documents in id order with `sep` and carry the token-offset boundary
    * list — the rows a trainer actually consumes. Returns
    * (shard, n_docs, n_tokens, text, boundaries).
    *
    * Scale: the per-shard group is bounded by `budget` tokens (plus one
    * overhanging document), so the collect_list inside each group is
    * bounded by construction — this is the one grain where assembling
    * rows in memory is the SPEC, not a hazard. One shuffle on the shard
    * id; order inside a shard is a deterministic array_sort on (id, …).
    */
  def materializeSequences(docs: DataFrame, budget: Long,
                           idCol: String = "doc_id",
                           tokenCol: String = "n_tok",
                           textCol: String = "text",
                           sep: String = "\n\n",
                           bucketWidth: Long = 1 << 20): DataFrame =
    packSequences(docs, budget, idCol, tokenCol, bucketWidth)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"),
        array_sort(collect_list(struct(col(idCol).as("id"),
          col("shard_offset").as("off"), col(textCol).as("t")))).as("_d"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        concat_ws(sep, transform(col("_d"), _.getField("t"))).as("text"),
        transform(col("_d"), _.getField("off")).as("boundaries"))
}
