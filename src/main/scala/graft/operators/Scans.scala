package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-shape helpers shared by the token/regex-heavy operators. */
private[graft] object Scans {

  /** Guide §2.5 (input under-parallelism): a corpus that scans as fewer
    * partitions than the session has cores — one unsplittable file, a
    * single parquet row group — serializes the ENTIRE tokenize/regex/
    * explode/partial-aggregation chain above the scan into those few
    * tasks, and multi-consumer pipelines re-pay that serial segment per
    * consumer. Fan the doc-grain rows out to the session's parallelism
    * first: a tiny narrow-input shuffle, and a NO-OP whenever the scan is
    * already at least core-parallel (every at-scale layout), so a 100 TB
    * corpus is never reshuffled. Row SET is unchanged — callers'
    * aggregations are exact (hash/int/scaled-decimal) per the registry's
    * determinism contract, so partition order cannot leak into results.
    * Streaming frames pass through untouched (`.rdd` is undefined there,
    * and a per-microbatch reshuffle is the wrong trade).
    */
  def fanOutNarrowScan(docs: DataFrame): DataFrame = {
    if (docs.isStreaming) return docs
    val target = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions >= target) docs
    else docs.repartition(target)
  }
}
