package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-window document chunking — the pass an embedding/retrieval
  * pipeline runs before encoding: split every document into overlapping
  * token windows (`window` tokens, step `stride`, overlap = window −
  * stride) so long documents fit a model's context while no boundary
  * information is lost. Chunk count per doc is
  * `ceil(max(sz − window, 0) / stride) + 1` — the standard rule: the last
  * window always reaches the end, a short doc is one chunk, chunk text is
  * the token-joined normalized form.
  *
  * Scale: one staged tokenizer projection, one `explode` of a per-row
  * integer sequence (fan-out bounded by doc length / stride), no shuffle
  * at all — chunk rows inherit the corpus partitioning.
  */
object Chunking {

  /** (doc_id, chunk_id, n_tokens, chunk_text) — deterministic, 0-based
    * chunk ids in document order.
    */
  def chunkDocs(docs: DataFrame, window: Int, stride: Int,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        size(col("_toks")).cast("long").as("_sz"))
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0L),
          when(col("_sz") > window,
            expr(s"(_sz - $window + ${stride - 1}) div $stride") + 1L)
            .otherwise(lit(1L)) - 1L)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("_toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(window)).as("_c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("_c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("_c")).as("chunk_text"))
  }
}
