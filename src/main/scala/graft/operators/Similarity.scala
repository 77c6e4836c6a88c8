package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact cosine top-k: broadcast the (small) query
  *    set against the corpus; one scan, no corpus shuffle; per-query top-k
  *    via window rank (Catalyst turns the global variant into
  *    TakeOrderedAndProject). Baseline and recall oracle.
  *  - `lshTopK` — random-hyperplane LSH bucketing: corpus and queries get
  *    `nBits` signatures; candidates = same-bucket rows (optionally within
  *    Hamming distance by probing neighbor buckets); exact cosine re-rank
  *    inside buckets. The scale path: the join shuffles only matching
  *    buckets (2^nBits partitions of the corpus), not the n×m cross
  *    product.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `queries` must be small
    * enough to broadcast (it is broadcast explicitly).
    * Output: (query_id, vec_id, cos, rank) with rank 1..k.
    * Ties broken by corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val joined = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .join(broadcast(queries.select(col(queryIdCol), col(vecCol).as("_qv"))))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos").desc, col(idCol))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates share the full `nBits` signature with the
    * query; exact cosine re-rank within candidates. Recall is tuned by
    * `nBits` (fewer bits → bigger buckets → higher recall, more compute).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nBits: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    val sig = (v: org.apache.spark.sql.Column) =>
      VectorFunctions.lshSignature(v, nBits, dim)
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"),
      sig(col(vecCol)).as("bucket"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("_qv"),
      sig(col(vecCol)).as("bucket"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos").desc, col(idCol))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }

  /** IVF-style coarse quantization: assign each corpus vector to the nearest
    * of `centroids` (a driver-provided small list), search only the probe
    * cells of each query. Centroids would come from a sampled k-means at
    * scale; any fixed centroid set works for the plan shape.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: Seq[Seq[Double]],
              k: Int, nProbe: Int = 2, idCol: String = "vec_id",
              vecCol: String = "embedding",
              queryIdCol: String = "query_id"): DataFrame = {
    def nearestCells(v: org.apache.spark.sql.Column, n: Int) = {
      val dists = centroids.zipWithIndex.map { case (cvec, i) =>
        struct(VectorFunctions.cosine(v, lit(cvec.toArray)).as("cos"),
          lit(i).as("cell"))
      }
      slice(reverse(array_sort(array(dists: _*))), 1, n)
    }
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .withColumn("cell", element_at(nearestCells(col("_cv"), 1), 1).getField("cell"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("_qv"),
      explode(nearestCells(col(vecCol), nProbe).getField("cell")).as("cell"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cos").desc, col(idCol))
    c.join(broadcast(q), Seq("cell"))
      .withColumn("cos", VectorFunctions.cosine(col("_cv"), col("_qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("cos"), col("rank"))
  }
}
