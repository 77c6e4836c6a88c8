package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Mergeable quantile sketch — a merging t-digest (Dunning & Ertl's
  * streaming variant with the uniform k0 size rule): centroids are
  * (mean, weight) pairs kept sorted by mean; adjacent centroids merge
  * while their combined weight stays under totalWeight/compression, so the
  * sketch holds ≈`compression` centroids and rank error is bounded by
  * 1/compression of the total weight.
  *
  * Why it exists: exact medians are not decomposable — the incremental T3
  * reduction ([[graft.streaming.IncrementalReduction]]) keeps ADDITIVE
  * per-group sufficient statistics, which covers the mean-mode center but
  * not `useMedian`. A t-digest IS additive (merge = concatenate +
  * recompress), so carrying one per group makes an approximate median
  * incremental while the exact full-history path stays the oracle.
  *
  * Determinism note: below `compression` points per group the digest keeps
  * every value as a singleton centroid and the interpolated quantile
  * equals the exact median; beyond that, centroid boundaries depend on
  * merge order across partitions, so results are reproducible only to the
  * documented rank-error bound — the price of a bounded-size mergeable
  * summary.
  */
object TDigestSketch {

  /** Serialized sketch: parallel centroid arrays, sorted by mean. */
  final case class Sketch(means: Seq[Double], weights: Seq[Double])

  /** Mutable build buffer; `pending` entries are merged into the sorted
    * centroid set on compression.
    */
  final case class Buf(compression: Int, means: Seq[Double], weights: Seq[Double])

  /** Sort by mean and merge neighbours under the k0 weight limit. */
  private[graft] def compress(means: Seq[Double], weights: Seq[Double],
                              compression: Int): (Seq[Double], Seq[Double]) = {
    if (means.length <= 1) return (means, weights)
    val order = means.indices.sortBy(means(_))
    val total = weights.sum
    val lim = total / compression
    val outM = Vector.newBuilder[Double]
    val outW = Vector.newBuilder[Double]
    var curM = means(order.head)
    var curW = weights(order.head)
    order.tail.foreach { i =>
      val (m, w) = (means(i), weights(i))
      if (curW + w <= lim) {
        curM = (curM * curW + m * w) / (curW + w); curW += w
      } else {
        outM += curM; outW += curW; curM = m; curW = w
      }
    }
    outM += curM; outW += curW
    (outM.result(), outW.result())
  }

  /** Interpolated quantile over sorted centroids: each centroid's mass is
    * centered at its cumulative-weight midpoint; between midpoints the
    * value is linear, clamped to the extreme centroid means at the ends.
    */
  private[graft] def quantile(means: Seq[Double], weights: Seq[Double],
                              q: Double): Double = {
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means.head
    val total = weights.sum
    val t = q * total
    var cum = 0.0
    var i = 0
    if (t <= weights.head / 2) return means.head
    while (i < n - 1) {
      val center = cum + weights(i) / 2
      val nextCenter = cum + weights(i) + weights(i + 1) / 2
      if (t >= center && t <= nextCenter) {
        val frac = if (nextCenter == center) 0.0 else (t - center) / (nextCenter - center)
        return means(i) + frac * (means(i + 1) - means(i))
      }
      cum += weights(i)
      i += 1
    }
    means.last
  }

  private def mergeBuf(b: Buf, ms: Seq[Double], ws: Seq[Double]): Buf = {
    val m2 = b.means ++ ms
    val w2 = b.weights ++ ws
    // amortize: recompress only when the working set outgrows 8× the
    // target size, so reduce stays O(1) amortized per value
    if (m2.length > 8 * b.compression) {
      val (cm, cw) = compress(m2, w2, b.compression)
      Buf(b.compression, cm, cw)
    } else Buf(b.compression, m2, w2)
  }

  /** values → sketch. NaN inputs are skipped (callers encode SQL NULL as
    * NaN — a typed Aggregator input has no null channel for primitives).
    */
  final class BuildAgg(compression: Int) extends Aggregator[Double, Buf, Sketch] {
    def zero: Buf = Buf(compression, Vector.empty, Vector.empty)
    def reduce(b: Buf, v: Double): Buf =
      if (v.isNaN) b else mergeBuf(b, Seq(v), Seq(1.0))
    def merge(b1: Buf, b2: Buf): Buf = mergeBuf(b1, b2.means, b2.weights)
    def finish(b: Buf): Sketch = {
      val (m, w) = compress(b.means, b.weights, b.compression)
      Sketch(m, w)
    }
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** stored sketches → merged sketch (the cross-batch accumulator). */
  final class MergeAgg(compression: Int) extends Aggregator[Sketch, Buf, Sketch] {
    def zero: Buf = Buf(compression, Vector.empty, Vector.empty)
    def reduce(b: Buf, s: Sketch): Buf =
      if (s == null || s.means == null) b else mergeBuf(b, s.means, s.weights)
    def merge(b1: Buf, b2: Buf): Buf = mergeBuf(b1, b2.means, b2.weights)
    def finish(b: Buf): Sketch = {
      val (m, w) = compress(b.means, b.weights, b.compression)
      Sketch(m, w)
    }
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  /** Column aggregate: t-digest of non-NaN values. */
  def tdigest(value: Column, compression: Int = 200): Column =
    org.apache.spark.sql.functions.udaf(new BuildAgg(compression)).apply(value)

  /** Column aggregate: merge of stored sketches. A product-typed
    * `Aggregator` input is flattened to one UDF argument per field, so the
    * sketch struct is passed as its two arrays.
    */
  def tdigestMerge(sketch: Column, compression: Int = 200): Column =
    org.apache.spark.sql.functions.udaf(new MergeAgg(compression))
      .apply(sketch.getField("means"), sketch.getField("weights"))

  /** Scalar: interpolated quantile from a sketch struct's arrays. */
  val tdigestQuantile = udf((means: Seq[Double], weights: Seq[Double], q: Double) =>
    quantile(means, weights, q))
}
