package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus interchange IO — the JSONL / sharded-parquet surface every
  * large-scale text pipeline speaks (one JSON document per line is the de
  * facto exchange format for web-crawl and training corpora).
  *
  * Scale notes:
  *  - JSONL reads REQUIRE an explicit schema at corpus scale: schema
  *    inference is a full extra pass over 100 TB before the real job
  *    starts, and a single malformed tail can flip a column's type for
  *    the whole dataset. `readJsonl` therefore takes the schema; malformed
  *    lines land in a `_corrupt_record` column (PERMISSIVE) instead of
  *    aborting the job — the caller routes or counts them.
  *  - Writers bound FILE SIZE, not file count: `maxRecordsPerFile` keeps
  *    every output shard within a target row count regardless of
  *    partition skew (one fat partition otherwise writes one fat file
  *    that downstream readers can't split on object stores).
  */
object CorpusIO {

  /** Read newline-delimited JSON documents with a REQUIRED schema.
    * Malformed lines survive as `_corrupt_record` (added to the schema
    * here) rather than failing the scan or silently vanishing.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add("_corrupt_record", "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Streaming twin of [[readJsonl]]: a file-source stream over a JSONL
    * drop directory (the crawler/ingestion handoff pattern — producers
    * atomically move finished shards in; Spark tracks processed files in
    * the checkpoint). Same REQUIRED-schema + PERMISSIVE corrupt-record
    * contract as the batch reader. `maxFilesPerTrigger` bounds per-batch
    * work so one bulk backfill cannot produce an unbounded micro-batch.
    */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType,
                      maxFilesPerTrigger: Int = 64): DataFrame = {
    val withCorrupt =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add("_corrupt_record", "string")
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
  }

  /** Split a JSONL read into (clean rows, corrupt raw lines).
    *
    * The corrupt frame carries the first data column alongside `raw`:
    * Spark refuses any file scan whose referenced columns are ONLY the
    * internal corrupt-record column (SPARK-21610 / the
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN guard) — keeping one real column in
    * the projection satisfies the scan without caching a corpus-scale
    * read just to look at its rejects.
    *
    * Caveat (Spark-standard for PERMISSIVE reads): aggregate-only queries
    * over either branch — `clean.count()`, `corrupt.count()` — prune the
    * projection down to the corrupt column alone and hit the same guard;
    * materialize (write/cache) the parsed frame first, which is what a
    * real recipe stage does anyway.
    */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val anchor = df.columns.find(_ != "_corrupt_record")
      .getOrElse("_corrupt_record")
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"), col(anchor).as("_anchor"))
    (clean, corrupt)
  }

  /** Write documents as JSONL shards bounded to `maxRecordsPerFile` rows
    * each — downstream trainers stream shards independently, so shard
    * size (not count) is the contract.
    */
  def writeJsonl(df: DataFrame, path: String,
                 maxRecordsPerFile: Long = 100000): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .json(path)

  /** Write size-bounded parquet shards, optionally hive-partitioned by
    * low-cardinality recipe columns (lang, source) so downstream recipe
    * stages prune at the directory level.
    */
  def writeShardedParquet(df: DataFrame, path: String,
                          partitionBy: Seq[String] = Nil,
                          maxRecordsPerFile: Long = 1000000): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }
}
