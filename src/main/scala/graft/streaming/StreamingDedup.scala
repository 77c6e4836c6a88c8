package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions

/** Cross-batch streaming deduplication — the streaming twin of
  * `Dedup.exact` for a document stream that never stops (a crawler feed,
  * an ingestion queue): a document is admitted only if its content
  * fingerprint was never seen in ANY earlier micro-batch.
  *
  * State design for scale: the keyed state holds exactly one boolean per
  * DISTINCT fingerprint ever seen — 16-byte key + negligible value,
  * partitioned by fingerprint hash across executors, RocksDB state store
  * at corpus scale. No watermark: corpus dedup has no lateness horizon (a
  * duplicate a year later is still a duplicate), so state is append-only
  * by design; for bounded-retention semantics (dedup only within a time
  * horizon) use Spark's `dropDuplicatesWithinWatermark` instead — same
  * key layout, watermark-evicted state.
  */
object StreamingDedup {

  /** One admitted document per fingerprint, first-batch-wins; within the
    * first batch that carries a fingerprint, the smallest id wins
    * (determinism under batch re-execution).
    */
  case class Doc(fp: String, id: Long, text: String)

  /** Stateful exact dedup over a streaming `docs` frame. Emits the
    * surviving documents (append mode): the first occurrence of each
    * fingerprint across the whole stream history.
    */
  def exactDedupStream(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): Dataset[Doc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        TextFunctions.fingerprint(col(textCol)).as("fp"),
        col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("text"))
      .as[Doc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Doc],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.id))
          })
  }
}
