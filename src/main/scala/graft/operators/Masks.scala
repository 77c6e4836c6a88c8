package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pixel-predicate mask DSL — the reference's WHERE-clause language.
  *
  * Convention preserved from trx/mask.py:54-56: **True = pixel masked out**.
  * Every region is a boolean `Column` over pixel coordinates `(x, y)`, so
  * masks constant-fold, push down to Parquet row-group pruning, and combine
  * with the rest of the plan inside whole-stage codegen. The interactive GUI
  * authoring (trx/mask.py:173-238) is out of scope; vertex lists arrive from
  * config.
  */
object Masks {

  /** One mask component: a region predicate plus whether it adds to (masks)
    * or subtracts from (unmasks) the running mask — trx/mask.py:82-94.
    */
  final case class Component(region: Column, add: Boolean = true)

  /** Half-plane from the string DSL: `"x>10"`, `"y<500"`, `"x>=3"`, …
    * (regex parse at trx/mask.py:287, interpretation 289-339).
    */
  def halfPlane(expr: String, x: Column, y: Column): Column = {
    val Pattern = """^\s*([xXyY])\s*(<=|>=|<|>|==)\s*([0-9.+-eE]+)\s*$""".r
    expr match {
      case Pattern(axis, op, value) =>
        val c = if (axis.equalsIgnoreCase("x")) x else y
        val v = value.toDouble
        op match {
          case "<"  => c < v
          case ">"  => c > v
          case "<=" => c <= v
          case ">=" => c >= v
          case "==" => c === v
        }
      case _ =>
        throw new IllegalArgumentException(s"unparseable mask expression: '$expr'")
    }
  }

  /** Axis-aligned rectangle with vertex normalization (either corner order
    * accepted) — trx/mask.py:36-40. Strict inequalities as in the reference.
    */
  def rectangle(x: Column, y: Column,
                x1: Double, y1: Double, x2: Double, y2: Double): Column = {
    val (xlo, xhi) = (math.min(x1, x2), math.max(x1, x2))
    val (ylo, yhi) = (math.min(y1, y2), math.max(y1, y2))
    (x > xlo) && (x < xhi) && (y > ylo) && (y < yhi)
  }

  /** Disk of radius r around (cx, cy) — trx/mask.py:42-46. */
  def circle(x: Column, y: Column, cx: Double, cy: Double, r: Double): Column =
    pow(x - cx, 2) + pow(y - cy, 2) < r * r

  /** Point-in-polygon (ray casting), trx/mask.py:48-52 (reference delegates
    * to matplotlib `Path.contains_points`). For literal vertices the edge
    * loop unrolls into a fixed boolean/arithmetic expression — pure Catalyst,
    * codegen'd, no UDF.
    */
  def polygon(x: Column, y: Column, vertices: Seq[(Double, Double)]): Column = {
    require(vertices.size >= 3, "polygon needs >= 3 vertices")
    val edges = vertices.zip(vertices.tail :+ vertices.head)
    val crossings = edges.map { case ((xi, yi), (xj, yj)) =>
      val straddles = (lit(yi) > y) =!= (lit(yj) > y)
      // x-coordinate where the edge crosses the horizontal line at `y`
      val xCross =
        if (yj == yi) lit(Double.MaxValue) // horizontal edge never crosses
        else (y - yi) * ((xj - xi) / (yj - yi)) + xi
      when(straddles && (x < xCross), 1).otherwise(0)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** Frame of width `w` around the image border — trx/mask.py:240-260. */
  def border(x: Column, y: Column, width: Int, imgWidth: Int, imgHeight: Int): Column =
    (x < width) || (x >= imgWidth - width) || (y < width) || (y >= imgHeight - width)

  /** Cross through the image center of half-widths (wx, wy) — detector
    * panel gaps, trx/mask.py:262-285.
    */
  def centerLines(x: Column, y: Column, cx: Double, cy: Double,
                  halfWidthX: Double, halfWidthY: Double): Column =
    (abs(x - cx) < halfWidthX) || (abs(y - cy) < halfWidthY)

  /** Ordered add/subtract composition (trx/mask.py:108-136): components are
    * applied **in order**; `add` forces True, `subtract` forces False —
    * last-writer-wins, not a commutative OR. Catalyst CSE replaces the
    * reference's per-component memo cache (mask.py:112-127).
    */
  def compose(components: Seq[Component]): Column =
    components.foldLeft(lit(false)) { (acc, c) =>
      if (c.add) acc || c.region else acc && !c.region
    }

  /** Plain OR-union of mask elements — trx/mask.py:360-368. */
  def union(masks: Seq[Column]): Column =
    masks.reduceOption(_ || _).getOrElse(lit(false))

  /** Keep-predicate for a mask (True = masked out → filter on !mask). */
  def keep(mask: Column): Column = !mask

  /** M2 — mask from a materialized pixel table (trx/mask.py:306-307: load
    * a boolean image as mask): drop pixels whose (x, y) appears in
    * `maskTable`. The mask is geometry-sized (one detector frame), so the
    * anti-join broadcasts it — no shuffle of the pixel side.
    */
  def applyMaskTable(pixels: org.apache.spark.sql.DataFrame,
                     maskTable: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pixels.join(broadcast(maskTable.select("x", "y").distinct()),
      Seq("x", "y"), "left_anti")
}
