package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, metadata, per-partition feature extraction
  * (stub decoder), frame sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "payload-one".getBytes("UTF-8")),
    (2L, "a much longer payload with more bytes in it".getBytes("UTF-8")))
    .toDF("media_id", "payload")

  test("withMeta attaches kind and byte length") {
    val m = Multimodal.withMeta(media, "image").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("kind"), r.getAs[Long]("byte_len"))).toMap
    assert(m(1L) == ("image", 11L))
    assert(m(2L)._2 == "a much longer payload with more bytes in it".getBytes("UTF-8").length.toLong)
  }

  test("extractFeatures is deterministic with fixed width") {
    val withMeta = Multimodal.withMeta(media, "image")
    val f1 = Multimodal.extractFeatures(spark, withMeta, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, withMeta, dim = 8).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1(1L).size == 8 && f1(2L).size == 8)
    assert(f1(1L) != f1(2L))
  }

  test("sampleFrames keeps every stride-th fixed-size chunk") {
    val out = Multimodal.sampleFrames(media.filter($"media_id" === 2L),
      frameBytes = 10, stride = 2)
    val idx = out.select("frame_idx").as[Int].collect().sorted
    assert(idx.toSeq == Seq(0, 2)) // 43 bytes → 4 frames → keep 0, 2
    val frames = out.select("frame").as[Array[Byte]].collect()
    assert(frames.forall(_.length == 10))
  }
}
