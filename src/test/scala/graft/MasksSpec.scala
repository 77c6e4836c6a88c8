package graft

import org.apache.spark.sql.functions._
import graft.operators.Masks

/** M1–M9 — pixel-predicate DSL, incl. the ordered add/subtract fold
  * (last-writer-wins, trx/mask.py:108-136).
  */
class MasksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val grid = {
    val n = 20
    (for (y <- 0 until n; x <- 0 until n) yield (x, y)).toDF("x", "y")
  }

  private def masked(mask: org.apache.spark.sql.Column): Set[(Int, Int)] =
    grid.filter(mask).select("x", "y").as[(Int, Int)].collect().toSet

  test("halfPlane parses the reference DSL strings") {
    assert(masked(Masks.halfPlane("x>17", $"x", $"y")) ==
      (for (y <- 0 until 20; x <- 18 until 20) yield (x, y)).toSet)
    assert(masked(Masks.halfPlane("y<=1", $"x", $"y")).size == 40)
    intercept[IllegalArgumentException] {
      Masks.halfPlane("z>10", $"x", $"y")
    }
  }

  test("rectangle normalizes vertex order and uses strict inequalities") {
    val a = masked(Masks.rectangle($"x", $"y", 12, 15, 3, 5))
    val b = masked(Masks.rectangle($"x", $"y", 3, 5, 12, 15))
    assert(a == b)
    assert(a.contains((4, 6)) && !a.contains((3, 6)) && !a.contains((4, 5)))
  }

  test("circle is the strict disk") {
    val c = masked(Masks.circle($"x", $"y", 10, 10, 3))
    assert(c.contains((10, 10)) && c.contains((12, 10)))
    assert(!c.contains((13, 10))) // distance 3 is not < 3
  }

  test("polygon ray casting matches a brute-force triangle") {
    val tri = Seq((2.0, 2.0), (17.0, 2.0), (2.0, 17.0))
    val got = masked(Masks.polygon($"x", $"y", tri))
    def inTri(px: Double, py: Double): Boolean = {
      // barycentric sign test on the same strict-interior convention
      val (x1, y1) = tri(0); val (x2, y2) = tri(1); val (x3, y3) = tri(2)
      def s(ax: Double, ay: Double, bx: Double, by: Double) =
        (px - bx) * (ay - by) - (ax - bx) * (py - by)
      val d1 = s(x1, y1, x2, y2); val d2 = s(x2, y2, x3, y3); val d3 = s(x3, y3, x1, y1)
      val neg = d1 < 0 || d2 < 0 || d3 < 0
      val pos = d1 > 0 || d2 > 0 || d3 > 0
      !(neg && pos)
    }
    // compare on strictly-interior points (boundary convention may differ)
    for (y <- 0 until 20; x <- 0 until 20) {
      val strict = inTri(x + 0.0, y + 0.0) &&
        inTri(x + 1e-9, y + 1e-9) && inTri(x - 1e-9, y - 1e-9)
      val strictOut = !inTri(x + 0.0, y + 0.0)
      if (strict) assert(got.contains((x, y)), s"interior ($x,$y) missing")
      if (strictOut) assert(!got.contains((x, y)), s"exterior ($x,$y) present")
    }
  }

  test("border mask is the w-wide frame") {
    val b = masked(Masks.border($"x", $"y", 2, 20, 20))
    assert(b.contains((0, 10)) && b.contains((1, 10)) && b.contains((18, 10)))
    assert(!b.contains((2, 10)) && !b.contains((17, 10)))
    assert(b.size == 20 * 20 - 16 * 16)
  }

  test("compose is ordered last-writer-wins, not OR") {
    val rect = Masks.rectangle($"x", $"y", 0, 0, 19, 19) // nearly everything
    val disk = Masks.circle($"x", $"y", 10, 10, 4)
    // add rect, then subtract disk, then re-add a smaller disk
    val m = Masks.compose(Seq(
      Masks.Component(rect, add = true),
      Masks.Component(disk, add = false),
      Masks.Component(Masks.circle($"x", $"y", 10, 10, 2), add = true)))
    val got = masked(m)
    assert(!got.contains((13, 10))) // in rect & disk → subtracted
    assert(got.contains((11, 10)))  // re-added by the smaller disk
    assert(got.contains((5, 5)))    // plain rect
    // order matters: subtract-then-add ≠ add-then-subtract
    val m2 = Masks.compose(Seq(
      Masks.Component(rect, add = true),
      Masks.Component(Masks.circle($"x", $"y", 10, 10, 2), add = true),
      Masks.Component(disk, add = false)))
    assert(!masked(m2).contains((11, 10)))
  }

  test("union is plain OR; keep is the complement") {
    val u = Masks.union(Seq(Masks.halfPlane("x>17", $"x", $"y"),
      Masks.halfPlane("y>17", $"x", $"y")))
    val got = masked(u)
    assert(got.size == 2 * 40 - 4)
    assert(masked(Masks.keep(u)).size == 400 - got.size)
  }

  test("centerLines masks the cross") {
    val c = masked(Masks.centerLines($"x", $"y", 10, 10, 1.5, 1.5))
    assert(c.contains((10, 0)) && c.contains((0, 10)) && !c.contains((0, 0)))
  }
}
