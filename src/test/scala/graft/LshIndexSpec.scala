package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LshIndex}
import graft.sources.Bundle

/** Persisted MinHash-LSH near-dup index: serving must equal the live
  * signature math, the build-time star cap must bound every bucket, and
  * parameter drift must invalidate.
  */
class LshIndexSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val index = docs.filter(col("doc_id") % 5 =!= 4)
  private lazy val batch = docs.filter(col("doc_id") % 5 === 4)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("query_id", "id").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"),
        r.getAs[Double]("est_jaccard"))).toSeq

  test("served lookups equal the live cross-set LSH math; reuse is free; " +
       "parameter drift rebuilds") {
    val dir = Files.createTempDirectory("lshix").toString
    val p = LshIndex.Params(verifiable = true)
    assert(LshIndex.ensure(index, dir, p), "first ensure must build")

    // live twin: run the pair enumeration over the UNION and keep only
    // cross-set pairs — the served lookup must surface exactly those
    // (band keys and signatures are per-document, so indexing the two
    // sides separately cannot change them)
    val live = Dedup.minhashLshPairs(docs, threshold = 0.5,
        verifiable = true)
      .withColumn("query_id",
        when(col("id_a") % 5 === 4, col("id_a")).otherwise(col("id_b")))
      .withColumn("id",
        when(col("id_a") % 5 === 4, col("id_b")).otherwise(col("id_a")))
      .filter((col("id_a") % 5 === 4) =!= (col("id_b") % 5 === 4))
      .select(col("query_id"), col("id"), col("est_jaccard"))
    val served = LshIndex.serveNearDups(spark, dir, batch, threshold = 0.5)
    assert(rows(served) == rows(live),
      "served near-dups diverged from the live LSH enumeration")
    assert(rows(served).nonEmpty,
      "test corpus must actually contain cross-set near-dups")

    // warm reuse: same params → no rebuild, no rewrite
    val files = new java.io.File(s"$dir/bands.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(!LshIndex.ensure(
      sys.error("reuse must not evaluate the corpus"), dir, p))
    assert(new java.io.File(s"$dir/bands.parquet").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap == files)

    // drift rebuilds; manifest-less (crash mid-build) is invalid
    assert(LshIndex.ensure(index, dir, p.copy(maxBucketSize = 32)))
    assert(Bundle.readManifest(dir).get("maxBucketSize") == "32")
    Bundle.deleteRecursively(s"$dir/manifest.json")
    assert(LshIndex.ensure(index, dir, p.copy(maxBucketSize = 32)))
    intercept[IllegalArgumentException] {
      LshIndex.Params(nHashes = 32, nBands = 7)
    }
  }

  test("build-time star cap: over-cap buckets store min-id only, so a " +
       "boilerplate flood contributes one joinable row per band") {
    import spark.implicits._
    val boiler = "terms of service copyright all rights reserved please " +
      "enable javascript to continue"
    // 60 identical index docs + 2 distinct ones; cap of 8 forces the
    // boilerplate buckets over the cap
    val ix = ((0L until 60L).map(i => (i, boiler)) ++
      Seq((100L, "a completely different document about spark shuffles"),
        (101L, "another unrelated text about window aggregation")))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("lshix-cap").toString
    LshIndex.build(ix, dir, LshIndex.Params(verifiable = true,
      maxBucketSize = 8))
    val bands = spark.read.parquet(s"$dir/bands.parquet")
    val biggest = bands.groupBy("band").count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(biggest <= 8, s"a stored bucket kept $biggest members")
    // the flood collapsed to its min id — a query that matches the
    // boilerplate still finds it through the representative
    val q = Seq((500L, boiler)).toDF("doc_id", "text")
    val got = rows(LshIndex.serveNearDups(spark, dir, q, threshold = 0.5))
    assert(got == Seq((500L, 0L, 1.0)),
      s"flood lookup must match exactly the bucket representative, got $got")
  }
}
