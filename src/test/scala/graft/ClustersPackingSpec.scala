package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Packing}

/** Dedup cluster resolution (connected components) + token-budget
  * sequence packing.
  */
class ClustersPackingSpec extends SparkSpec {
  import spark.implicits._

  test("components: chains close transitively, singletons survive") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val vertices = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val got = Clusters.components(pairs, vertices).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("components: long chain needs several propagation rounds") {
    // a 12-node path: diameter forces multiple iterations of the loop
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (0L until 12L).toDF("id")
    val got = Clusters.components(pairs, vertices).collect()
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("keepSet counts members and keeps the smallest id") {
    val pairs = Seq((5L, 7L), (7L, 6L)).toDF("id_a", "id_b")
    val vertices = Seq(5L, 6L, 7L, 8L).toDF("id")
    val got = Clusters.keepSet(pairs, vertices).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap // keep_id -> n
    assert(got == Map(5L -> 3L, 8L -> 1L))
  }

  test("packSequences: distributed two-phase scan equals the global window") {
    val docs = (0L until 100L).map(i => (i, (i % 7 + 1).toInt)).toDF("doc_id", "n_tok")
    // tiny bucketWidth forces many buckets through the driver prefix-sum
    val packed = Packing.packSequences(docs, budget = 10, bucketWidth = 8)
      .select("doc_id", "shard", "shard_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // naive single-pass spec
    var cum = 0L
    (0L until 100L).foreach { i =>
      val t = (i % 7 + 1)
      assert(packed(i) == (cum / 10, cum % 10), s"doc $i")
      cum += t
    }
  }

  test("packSequences handles sparse / non-dense ids") {
    val docs = Seq((3L, 4), (100L, 5), (4096L, 2), (9999L, 7))
      .toDF("doc_id", "n_tok")
    val got = Packing.packSequences(docs, budget = 6, bucketWidth = 1000)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cum-before: 3→0, 100→4, 4096→9, 9999→11
    assert(got == Map(3L -> 0L, 100L -> 0L, 4096L -> 1L, 9999L -> 1L))
  }
}
