package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot versioning for a mutable corpus: type-2 slowly-changing rows
  * (Kimball SCD2) — every key's history is a chain of `[valid_from,
  * valid_to)` version intervals, with `valid_to` NULL marking the live
  * row. This is how a training-data pipeline answers "what did the corpus
  * look like when run N trained" WITHOUT storing N full copies: each
  * refresh stores only the delta rows, and any historical snapshot is the
  * filter `valid_from <= v AND (valid_to IS NULL OR valid_to > v)`.
  *
  * Change detection is by `row_hash` — the portable md5 of the tracked
  * columns (`\u0001`-joined, the cross-engine-replayable discipline) — so
  * a refresh never compares wide payloads, only 32-byte hashes.
  *
  * Scale shape: [[scd2Apply]] is ONE full-outer key join between the live
  * slice and the incoming snapshot (both shuffle on the key once; bucketed
  * storage on the key makes the steady state shuffle-free, the q111
  * pattern) plus a pass-through union of already-closed history rows that
  * never joins anything. Payload columns ride the join packed in a single
  * struct, so the plan is key + hash + one column regardless of payload
  * width. The merge is replay-idempotent: re-applying the same incoming
  * snapshot at the same version is a no-op (hashes match the rows the
  * first apply opened), so an at-least-once orchestrator can't corrupt
  * history.
  *
  * Reference scope: LLM-pipeline extension (SURVEY §6) — the reference
  * engine reprocesses folders in place and keeps no history.
  */
object Snapshot {

  /** md5 change-detection hash over the tracked columns (shared with the
    * streaming twin, [[graft.streaming.StreamingSnapshot]]). NULLs are
    * encoded explicitly as `\u0000` before the `\u0001` join: `concat_ws`
    * silently DROPS null arguments, so without the sentinel distinct
    * payloads collide — `('x', NULL)` vs `(NULL, 'x')`, and NULL vs `''`
    * in a single column — and a refresh moving a value between nullable
    * columns would be silently treated as unchanged, losing a revision.
    * The DuckDB oracles mirror the same encoding (`coalesce(c, chr(0))`
    * around the NULL-propagating `||`), so null-bearing data replays
    * cross-engine too.
    */
  private[graft] def rowHash(hashCols: Seq[String]) =
    md5(concat_ws("\u0001",
      hashCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  /** Open a first-version history from a full snapshot: every row live
    * with `valid_from = version`.
    */
  def scd2Init(snapshot: DataFrame, keyCol: String, hashCols: Seq[String],
               version: Long): DataFrame =
    snapshot
      .withColumn("row_hash", rowHash(hashCols))
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("bigint"))

  /** Merge the next full snapshot into the history at `version`:
    *   - new key (or key re-appearing after a close) → open a row;
    *   - unchanged hash → live row carried untouched;
    *   - changed hash → live row closed at `version`, new row opened;
    *   - key missing from the snapshot → closed at `version` when
    *     `closeMissing` (full-snapshot semantics; pass false when
    *     `incoming` is a partial upsert batch).
    * Already-closed rows pass through without joining.
    *
    * Lineage: in production each refresh reads the PERSISTED history
    * table, so plans never chain. When chaining refreshes in memory
    * (tests, backfills), truncate lineage between applications
    * (`localCheckpoint`) — N stacked full-outer-join plans hit the
    * exponential-analysis trap documented on [[Clusters]].
    */
  def scd2Apply(history: DataFrame, incoming: DataFrame, keyCol: String,
                hashCols: Seq[String], version: Long,
                closeMissing: Boolean = true): DataFrame = {
    val meta = Seq(keyCol, "row_hash", "valid_from", "valid_to")
    val payloadCols = history.columns.filterNot(meta.contains).toSeq
    require(payloadCols.forall(incoming.columns.contains),
      s"incoming snapshot is missing history payload columns " +
        s"${payloadCols.filterNot(incoming.columns.contains).mkString(", ")}")

    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)
      .select(col(keyCol), col("row_hash").as("_o_hash"),
        col("valid_from").as("_o_from"),
        struct(payloadCols.map(col): _*).as("_o_pay"))
    val inc = incoming
      .select((col(keyCol) +: payloadCols.map(col)): _*)
      .withColumn("_i_hash", rowHash(hashCols))
      .select(col(keyCol), col("_i_hash"),
        struct(payloadCols.map(col): _*).as("_i_pay"))

    val j = open.join(inc, Seq(keyCol), "full_outer")

    def unpack(pay: String, hash: org.apache.spark.sql.Column,
               from: org.apache.spark.sql.Column,
               to: org.apache.spark.sql.Column) =
      (col(keyCol) +: payloadCols.map(c => col(s"$pay.$c").as(c))) ++
        Seq(hash.as("row_hash"), from.as("valid_from"), to.as("valid_to"))

    // live rows kept live: unchanged hash, or missing-but-kept
    val carried = j.filter(col("_o_hash").isNotNull &&
        (col("_i_hash") === col("_o_hash") ||
          (col("_i_hash").isNull && lit(!closeMissing))))
      .select(unpack("_o_pay", col("_o_hash"), col("_o_from"),
        lit(null).cast("bigint")): _*)
    // live rows closed at this version: changed, or missing under full-
    // snapshot semantics
    val closedNow = j.filter(col("_o_hash").isNotNull &&
        ((col("_i_hash").isNotNull && col("_i_hash") =!= col("_o_hash")) ||
          (col("_i_hash").isNull && lit(closeMissing))))
      .select(unpack("_o_pay", col("_o_hash"), col("_o_from"),
        lit(version)): _*)
    // incoming rows opened at this version: new key or changed hash
    val opened = j.filter(col("_i_hash").isNotNull &&
        (col("_o_hash").isNull || col("_o_hash") =!= col("_i_hash")))
      .select(unpack("_i_pay", col("_i_hash"), lit(version),
        lit(null).cast("bigint")): _*)

    closed.select(carried.columns.map(col): _*)
      .unionByName(carried).unionByName(closedNow).unionByName(opened)
  }

  // ------------------------------------------ persisted SCD2 history store

  /** The SCD2 history as a Bundle with T2 manifest — the same warm-reuse
    * discipline as the AnnIndex/LshIndex/moments/KMV stores, applied to
    * batch history maintenance. Layout is DELTA-COST, not rewrite-all:
    *   - `closed/version=N`: the rows version N closed — IMMUTABLE, each
    *     refresh appends exactly one new partition and never touches the
    *     others (a closed row can never close again);
    *   - `open_vN`: the live slice after version N — rewritten per
    *     refresh (any live row can carry or close), pointed to by the
    *     manifest so a torn rewrite is invisible: data lands under the
    *     NEW versioned dir first, the manifest (cursor + open pointer)
    *     commits the refresh, and only then is the superseded open dir
    *     deleted. A crash anywhere leaves the previous manifest pointing
    *     at intact state, and replaying the same refresh recomputes
    *     byte-identical files into the same dirs.
    * So a refresh costs ONE key join plus |live| + |closed-now| rows of
    * writing, never a history rewrite — at corpus scale the closed
    * partitions are the (bounded, append-only) bulk and the open slice
    * is the working set.
    */
  /** Version of the [[rowHash]] ENCODING (not the store layout): bumped
    * whenever the byte recipe feeding md5 changes — v2 is the NULL
    * sentinel encoding. Carried in every persisted manifest that stores
    * hashes, so a store built under an older recipe T2-invalidates and
    * rebuilds instead of silently splicing incomparable hashes into one
    * history (a pre-sentinel store refreshed post-sentinel would emit a
    * spurious "changed" revision for every NULL-bearing row).
    */
  private[graft] val HashEncodingVersion = "2"

  private def historyParams(keyCol: String, hashCols: Seq[String],
                            tag: String): Map[String, String] =
    Map("kind" -> "scd2-history", "key" -> keyCol,
      "hashCols" -> hashCols.mkString(","), "tag" -> tag,
      "hashEnc" -> HashEncodingVersion)

  /** The persisted history (open slice ∪ closed partitions), reading the
    * SAVED parquet only — [[snapshotAt]]/[[diff]] work on it unchanged
    * and a warm serve never re-scans the corpus the history summarizes.
    */
  def loadHistory(spark: org.apache.spark.sql.SparkSession,
                  dir: String): DataFrame = {
    val m = graft.sources.Bundle.readManifest(dir).getOrElse(
      throw new IllegalStateException(s"no scd2-history manifest at $dir"))
    require(m.get("kind").contains("scd2-history"),
      s"not an scd2 history store: $dir")
    val open = spark.read.parquet(s"$dir/${m("open")}")
    val cursor = m.get("version").map(_.toLong).getOrElse(Long.MaxValue)
    // probe through the dir's Hadoop FileSystem: a java.io check is
    // always false on shared storage, which would silently serve the
    // OPEN slice alone — dropping every closed revision from history
    val (cfs, closedDir) = graft.sources.Bundle.fsPath(s"$dir/closed")
    if (cfs.exists(closedDir) &&
        cfs.listStatus(closedDir).exists(_.getPath.getName.startsWith("version=")))
      // partition discovery adds the dir-derived version column (the
      // rows carry their own valid_to, so it is layout metadata) — and
      // the cursor filter is the crash guard: a refresh that died between
      // its closed write and its manifest commit leaves an ORPHAN closed
      // partition above the cursor, which must stay invisible (reading it
      // would duplicate its keys: still-open row + orphan closed row) and
      // is simply overwritten when the refresh replays
      open.unionByName(
        spark.read.parquet(s"$dir/closed")
          .filter(col("version") <= cursor).drop("version"))
    else open
  }

  /** The store's version cursor (the last applied refresh). */
  def historyVersion(dir: String): Option[Long] =
    graft.sources.Bundle.readManifest(dir)
      .filter(_.get("kind").contains("scd2-history"))
      .flatMap(_.get("version")).map(_.toLong)

  /** Initialize or refresh the persisted history, T2-invalidated and
    * replay-idempotent:
    *   - no store / key-hashCols-tag drift → re-init from `snapshot` at
    *     `version` (drift invalidates: the hashes are incomparable);
    *   - cursor >= `version` → no-op: the refresh (or a later one) was
    *     already applied, so an at-least-once orchestrator replaying any
    *     PREFIX of its refresh chain serves the stored state and
    *     `snapshot` is never evaluated — history never rewinds;
    *   - cursor < `version` → ONE [[scd2Apply]] of `snapshot` against
    *     the SAVED history, written delta-cost as described above.
    * Returns (history read from the store, whether this call wrote).
    */
  def ensureHistory(snapshot: => DataFrame, dir: String, keyCol: String,
                    hashCols: Seq[String], version: Long,
                    closeMissing: Boolean = true, tag: String = "")
      : (DataFrame, Boolean) = {
    val spark = org.apache.spark.sql.SparkSession.active
    val params = historyParams(keyCol, hashCols, tag)
    val manifest = graft.sources.Bundle.readManifest(dir)
      .filter(m => params.forall { case (k, v) => m.get(k).contains(v) })
    manifest.flatMap(_.get("version")).map(_.toLong) match {
      case Some(cur) if cur >= version =>
        (loadHistory(spark, dir), false)
      case Some(_) =>
        val next = scd2Apply(loadHistory(spark, dir), snapshot, keyCol,
          hashCols, version, closeMissing).localCheckpoint(true)
        try writeRefresh(next, dir, params, version)
        finally Checkpoints.release(next)
        (loadHistory(spark, dir), true)
      case None =>
        graft.sources.Bundle.deleteRecursively(dir)
        val init = scd2Init(snapshot, keyCol, hashCols, version)
          .localCheckpoint(true)
        try writeRefresh(init, dir, params, version)
        finally Checkpoints.release(init)
        (loadHistory(spark, dir), true)
    }
  }

  private def writeRefresh(history: DataFrame, dir: String,
                           params: Map[String, String],
                           version: Long): Unit = {
    val prevOpen = graft.sources.Bundle.readManifest(dir).flatMap(_.get("open"))
    val closedNow = history.filter(col("valid_to") === version)
    if (!closedNow.isEmpty)
      closedNow.write.mode("overwrite")
        .parquet(s"$dir/closed/version=$version")
    else
      // a refresh that closes nothing must still clear any partition a
      // torn earlier attempt left at this version — committing the
      // cursor would otherwise make that orphan visible
      graft.sources.Bundle.deleteRecursively(s"$dir/closed/version=$version")
    history.filter(col("valid_to").isNull)
      .write.mode("overwrite").parquet(s"$dir/open_v$version")
    // the manifest write COMMITS the refresh (cursor + open pointer)
    graft.sources.Bundle.writeManifest(dir, params +
      ("version" -> version.toString) + ("open" -> s"open_v$version"))
    prevOpen.filter(_ != s"open_v$version")
      .foreach(o => graft.sources.Bundle.deleteRecursively(s"$dir/$o"))
  }

  /** The corpus as of `version`: each key's row whose interval covers it. */
  def snapshotAt(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
      (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to")

  /** Key-grain diff between two versions of the history: one row per key
    * whose live payload differs — `change` ∈ added | removed | changed.
    * Runs on the history alone (two `snapshotAt` filters + one key join);
    * the corpus itself is never re-scanned.
    */
  def diff(history: DataFrame, fromVersion: Long, toVersion: Long,
           keyCol: String): DataFrame = {
    val a = snapshotAt(history, fromVersion)
      .select(col(keyCol), col("row_hash").as("_a_hash"))
    val b = snapshotAt(history, toVersion)
      .select(col(keyCol), col("row_hash").as("_b_hash"))
    a.join(b, Seq(keyCol), "full_outer")
      .filter(col("_a_hash").isNull || col("_b_hash").isNull ||
        col("_a_hash") =!= col("_b_hash"))
      .select(col(keyCol),
        when(col("_a_hash").isNull, lit("added"))
          .when(col("_b_hash").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"),
        col("_a_hash").as("hash_from"), col("_b_hash").as("hash_to"))
  }
}
