package graft

import org.apache.spark.sql.functions._
import graft.operators.Positional

/** Distributed positional rank / skip-slice — the no-global-window path. */
class PositionalSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalRowNumber equals the rank of the total sort order") {
    val df = (1L to 997L).map(i => (i * 7919 % 1009, i)) // shuffled keys
      .toDF("key", "payload").repartition(7)
    val ranked = Positional.withGlobalRowNumber(df, Seq(col("key")), "rn")
      .orderBy("rn").collect()
    val expected = (1L to 997L).map(i => i * 7919 % 1009).sorted
    assert(ranked.map(_.getAs[Long]("key")).toSeq == expected)
    assert(ranked.map(_.getAs[Long]("rn")).toSeq == (1L to 997L))
  }

  test("skipSlice drops exactly the head and tail of the ordering") {
    val df = (1L to 100L).toDF("id").repartition(5)
    val sliced = Positional.skipSlice(df, Seq(col("id")), 10, 15)
      .orderBy("id").collect().map(_.getAs[Long]("id")).toSeq
    assert(sliced == (11L to 85L))
    // degenerate cases
    assert(Positional.skipSlice(df, Seq(col("id")), 0, 0).count() == 100)
    assert(Positional.skipSlice(df, Seq(col("id")), 60, 60).count() == 0)
  }

  test("the rank plans a PARTITIONED window — never the single-task global window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the public API localCheckpoints the ranked frame (truncating its
      // executed plan), so the window contract is asserted on the
      // pre-checkpoint hook it materializes
      val planned = Positional.rankedLocal(
        spark.range(1000).toDF("id"), Seq(col("id")))
      val windows = planned.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, "expected a WindowExec in the rank plan")
      assert(windows.forall(_.partitionSpec.nonEmpty),
        "global (unpartitioned) window crept back into Positional")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
