package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers (SURVEY §2.8 G9/G10): snapping and rebinning.
  * Reference: trx/utils/numeric.py:16-53 (`approx`/`rebin` via digitize).
  */
object NumericFunctions {

  /** G9 — snap to the nearest value of an EQUISPACED grid: pure
    * arithmetic, no lookup.
    */
  def snapEquispaced(c: Column, lo: Double, step: Double): Column =
    floor((c - lo) / step + 0.5) * step + lo

  /** G9 — snap to the nearest value of an ARBITRARY sorted grid.
    * Reference digitizes against bin midpoints; grids are small
    * configuration vectors, so the chain of midpoint comparisons
    * constant-folds into a branch ladder inside codegen (a broadcast-join
    * variant only pays off for grids of thousands of points).
    */
  def snapToGrid(c: Column, grid: Seq[Double]): Column = {
    require(grid.nonEmpty && grid == grid.sorted, "grid must be sorted")
    val mids = grid.sliding(2).collect { case Seq(a, b) => (a + b) / 2 }.toSeq
    mids.zip(grid).foldRight(lit(grid.last)) { case ((mid, g), acc) =>
      when(c < mid, g).otherwise(acc)
    }
  }

  /** G9 — mean-rebin a value column onto an equispaced target axis:
    * returns (bin center, mean, count) per bin — `rebin(x, y)` of the
    * reference as one aggregation.
    */
  def rebin(df: org.apache.spark.sql.DataFrame, xCol: String, yCol: String,
            lo: Double, hi: Double, n: Int): org.apache.spark.sql.DataFrame = {
    val step = (hi - lo) / n
    df.filter(col(xCol) >= lo && col(xCol) < hi)
      .groupBy(floor((col(xCol) - lo) / step).cast("int").as("bin"))
      .agg(avg(col(yCol)).as("y_mean"), count(lit(1)).as("n"))
      .withColumn("x_center", lit(lo) + (col("bin") + 0.5) * step)
  }
}
