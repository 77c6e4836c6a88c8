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

  private object Agg extends Aggregator[Double, List[Double], MedMad] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], a: Double): List[Double] = a :: b
    def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
    def finish(b: List[Double]): MedMad = {
      if (b.isEmpty) MedMad(Double.NaN, Double.NaN)
      else {
        val v = b.toArray
        java.util.Arrays.sort(v)
        val med = medianOf(v)
        val dev = v.map(x => math.abs(x - med))
        java.util.Arrays.sort(dev)
        MedMad(med, medianOf(dev))
      }
    }
    def bufferEncoder: Encoder[List[Double]] = Encoders.kryo[List[Double]]
    def outputEncoder: Encoder[MedMad] = Encoders.product[MedMad]
  }

  /** Column usage: `df.groupBy("k").agg(MedianMadAgg(col("v")))` →
    * struct(median, mad).
    */
  def apply(c: Column): Column = udaf(Agg).apply(c)
}
