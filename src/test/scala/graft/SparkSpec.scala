package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM, Test/fork). ANSI mode stays
  * at the Spark 4 default — the library must be ANSI-safe.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // cluster-storage stand-in: a local FS under a non-file scheme that
      // java.io can never resolve (see GraftTestFs) — store/state specs
      // route their dirs through graftfs:// to prove Hadoop-FS-only access
      .config("spark.hadoop.fs.graftfs.impl", "graft.GraftTestFs")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import scala.jdk.CollectionConverters._

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol || (a.isNaN && b.isNaN)
}
