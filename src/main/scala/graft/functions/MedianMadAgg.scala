package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass exact median + MAD aggregate (SURVEY §2.8: "an Aggregator
  * is only warranted if we later fuse mean+std+median in one pass" — this
  * is that fusion, for A8's robust zinger statistics).
  *
  * The two-pass formulation (groupBy median → join → groupBy median of
  * absolute deviations) shuffles the data twice; this buffers each group's
  * values once and computes both statistics at finish. Exact — group sizes
  * in the curve model are bounded by n_images — and asserted equal to the
  * two-pass path in FiltersSpec.
  */
object MedianMadAgg {

  final case class MedMad(median: Double, mad: Double)

  private def medianOf(sorted: Array[Double]): Double = {
    val n = sorted.length
    if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }

  /** Doubling primitive buffer: 8 bytes per value (vs ~48+ for the boxed
    * Kryo cons list this replaces), O(1) amortized append, O(n1+n2)
    * arraycopy merge, and a product encoder (native binary array, no Kryo).
    * Memory per group is still O(group size) — exact medians require the
    * values — so the hard scale ceiling is unchanged: this path is for
    * groups bounded by n_images per (q_bin); unbounded groups belong to
    * the two-pass `zingerStats` (see Filters.scala).
    */
  final case class Buf(data: Array[Double], n: Int)

  private object Agg extends Aggregator[Double, Buf, MedMad] {
    def zero: Buf = Buf(new Array[Double](16), 0)
    def reduce(b: Buf, a: Double): Buf = {
      val d =
        if (b.n == b.data.length) java.util.Arrays.copyOf(b.data, b.data.length * 2)
        else b.data
      d(b.n) = a
      Buf(d, b.n + 1)
    }
    def merge(b1: Buf, b2: Buf): Buf = {
      val out = new Array[Double](b1.n + b2.n)
      System.arraycopy(b1.data, 0, out, 0, b1.n)
      System.arraycopy(b2.data, 0, out, b1.n, b2.n)
      Buf(out, out.length)
    }
    def finish(b: Buf): MedMad = {
      if (b.n == 0) MedMad(Double.NaN, Double.NaN)
      else {
        val v = java.util.Arrays.copyOf(b.data, b.n)
        java.util.Arrays.sort(v)
        val med = medianOf(v)
        val dev = v.map(x => math.abs(x - med))
        java.util.Arrays.sort(dev)
        MedMad(med, medianOf(dev))
      }
    }
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[MedMad] = Encoders.product[MedMad]
  }

  /** Column usage: `df.groupBy("k").agg(MedianMadAgg(col("v")))` →
    * struct(median, mad).
    */
  def apply(c: Column): Column = udaf(Agg).apply(c)
}
