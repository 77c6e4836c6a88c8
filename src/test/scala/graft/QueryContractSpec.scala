package graft

import graft.queries.Registry

/** Driver-contract regression: every registered query must run (fully
  * materialized — column pruning hides ANSI errors under count()) on the
  * smoke-scale data, and the oracle map must stay consistent with the
  * query map.
  */
@SlowSuite
class QueryContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} materializes at sf0.001") {
      val rows = q.fn(spark, dir).collect()
      assert(rows != null)
    }
  }
}
