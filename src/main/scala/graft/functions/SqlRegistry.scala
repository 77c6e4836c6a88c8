package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-callable registrations of the scalar function library (SURVEY §7.1
  * module 7): `SqlRegistry.register(spark)` exposes the G-functions to
  * `spark.sql(...)` users as `graft_*`.
  *
  * These are UDF wrappers for SQL ergonomics; DataFrame pipelines should
  * keep using the Column-expression forms in TimeFunctions/
  * ScatteringFunctions/TextFunctions, which stay inside codegen.
  */
object SqlRegistry {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_str_to_time", (s: String) => {
      if (s == null) null
      else {
        val t = s.trim.toLowerCase
        if (t == "off") java.lang.Double.valueOf(TimeFunctions.OffSentinel)
        else {
          val m = "^([+-]?[0-9]*\\.?[0-9]+(?:e[+-]?[0-9]+)?)([a-z]*)$".r
            .findFirstMatchIn(t)
          m.flatMap { mm =>
            val unit = mm.group(2)
            val factor =
              if (unit.isEmpty) Some(1.0)
              else TimeFunctions.unitFactors.toMap.get(unit)
            factor.map(f => java.lang.Double.valueOf(mm.group(1).toDouble * f))
          }.orNull
        }
      }
    })
    spark.udf.register("graft_time_to_str",
      (v: Double) => TimeFunctions.timeToStrScala(v))
    spark.udf.register("graft_q_to_two_theta",
      (q: Double, lambda: Double) => 2.0 * math.asin(q * lambda / (4.0 * math.Pi)))
    spark.udf.register("graft_pixel_q",
      (x: Int, y: Int, dist: Double, poni1: Double, poni2: Double,
       pixel1: Double, pixel2: Double, lambda: Double) =>
        ScatteringFunctions.pixelQScala(x, y,
          ScatteringFunctions.Poni(dist, poni1, poni2,
            pixel1 = pixel1, pixel2 = pixel2, wavelengthA = lambda)))
    spark.udf.register("graft_transmission",
      (t: Double, lam: Double) => math.exp(-t / lam))
  }
}
