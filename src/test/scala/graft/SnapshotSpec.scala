package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** SCD2 history contracts the q124/q125 oracles can't see: the full key
  * lifecycle across THREE versions (including re-adding a deleted key),
  * replay idempotence (an at-least-once orchestrator re-applies a
  * snapshot), partial-upsert semantics (`closeMissing = false`), interval
  * consistency invariants, and `snapshotAt` time travel.
  */
class SnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def hist3 = {
    // key 1: constant; key 2: changed at v2; key 3: deleted at v2,
    // re-added at v3; key 4: added at v2; key 5: added at v3
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "text")
    val v3 = Seq((1L, "a"), (2L, "B2"), (3L, "c3"), (4L, "d"), (5L, "e"))
      .toDF("id", "text")
    val h1 = Snapshot.scd2Init(v1, "id", Seq("text"), 1L)
    val h2 = Snapshot.scd2Apply(h1, v2, "id", Seq("text"), 2L)
    Snapshot.scd2Apply(h2, v3, "id", Seq("text"), 3L)
  }

  test("three-version lifecycle: change, delete, re-add, late add all " +
       "produce the expected interval chains") {
    val rows = hist3.select("id", "text", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._3))
    assert(rows.toSeq == Seq(
      (1L, "a", 1L, None),            // never changed
      (2L, "b", 1L, Some(2L)),        // closed by the v2 revision
      (2L, "B2", 2L, None),
      (3L, "c", 1L, Some(2L)),        // deleted at v2 ...
      (3L, "c3", 3L, None),           // ... re-added (revised) at v3
      (4L, "d", 2L, None),
      (5L, "e", 3L, None)))
  }

  test("snapshotAt reconstructs each version exactly") {
    val h = hist3
    def at(v: Long) = Snapshot.snapshotAt(h, v).select("id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(at(1L) == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(at(2L) == Seq((1L, "a"), (2L, "B2"), (4L, "d")))
    assert(at(3L) ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c3"), (4L, "d"), (5L, "e")))
    // versions past the last refresh see the latest state
    assert(at(9L) == at(3L))
  }

  test("re-applying the same snapshot at the same version is a no-op " +
       "(at-least-once replay safety)") {
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val v2 = Seq((1L, "a2"), (3L, "c")).toDF("id", "text")
    val h2 = Snapshot.scd2Apply(
      Snapshot.scd2Init(v1, "id", Seq("text"), 1L), v2, "id",
      Seq("text"), 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "row_hash", "valid_from", "valid_to").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))
        .sortBy(t => (t._1, t._3)).toSeq
    assert(rows(Snapshot.scd2Apply(h2, v2, "id", Seq("text"), 2L)) ==
      rows(h2), "replaying the v2 snapshot must not change the history")
  }

  test("closeMissing = false treats the incoming batch as a partial " +
       "upsert: absent keys stay live") {
    val h1 = Snapshot.scd2Init(
      Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "id", Seq("text"), 1L)
    val batch = Seq((2L, "b2")).toDF("id", "text")
    val h2 = Snapshot.scd2Apply(h1, batch, "id", Seq("text"), 2L,
      closeMissing = false)
    val live = h2.filter(col("valid_to").isNull).select("id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(live == Seq((1L, "a"), (2L, "b2")),
      "untouched key must survive a partial upsert")
  }

  test("history invariants: one live row per present key, no overlapping " +
       "intervals, hash matches the payload") {
    val h = hist3.cache()
    try {
      val multiLive = h.filter(col("valid_to").isNull)
        .groupBy("id").count().filter(col("count") > 1).count()
      assert(multiLive == 0, "a key can have at most one live row")
      // intervals of one key never overlap: sorted by valid_from, each
      // row's valid_to (when set) <= the next row's valid_from
      val byKey = h.select("id", "valid_from", "valid_to").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
        .groupBy(_._1).values
      byKey.foreach { chain =>
        chain.sortBy(_._2).sliding(2).foreach {
          case Array((_, _, Some(to)), (_, from2, _)) =>
            assert(to <= from2, s"overlapping intervals in chain $chain")
          case Array((id, _, None), _) =>
            fail(s"non-final live row for key $id")
          case _ => ()
        }
      }
      val badHash = h.filter(col("row_hash") =!=
        md5(concat_ws("\u0001", col("text")))).count()
      assert(badHash == 0, "row_hash must equal the payload hash")
    } finally h.unpersist()
  }

  test("rowHash encodes NULLs explicitly: swapping a value between " +
       "nullable columns, and NULL vs '', are DISTINCT revisions") {
    // concat_ws silently drops NULL args; without the NUL sentinel all
    // four payloads below would collide and an SCD2 refresh would lose
    // the revision
    val df = Seq(
      (1L, Option("x"), Option.empty[String]),
      (2L, Option.empty[String], Option("x")),
      (3L, Option(""), Option.empty[String]),
      (4L, Option.empty[String], Option(""))).toDF("id", "a", "b")
    val hs = df.select(Snapshot.rowHash(Seq("a", "b")).as("h"))
      .collect().map(_.getString(0))
    assert(hs.distinct.length == 4,
      s"NULL-bearing payloads must hash distinctly, got $hs")
    // and a refresh moving the value across columns must register
    val h1 = Snapshot.scd2Init(
      Seq((1L, Option("x"), Option.empty[String])).toDF("id", "a", "b"),
      "id", Seq("a", "b"), 1L)
    val h2 = Snapshot.scd2Apply(h1,
      Seq((1L, Option.empty[String], Option("x"))).toDF("id", "a", "b"),
      "id", Seq("a", "b"), 2L)
    val chain = h2.select("id", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).sortBy(_._2).toSeq
    assert(chain == Seq((1L, 1L, Some(2L)), (1L, 2L, None)),
      s"cross-column move must close and reopen the row, got $chain")
  }

  test("persisted history store: init + delta-cost refreshes, warm serve " +
       "never evaluates the snapshot, prefix replay is a no-op, param " +
       "drift rebuilds, history == the in-memory scd2 chain") {
    val dir = java.nio.file.Files
      .createTempDirectory("scd2-store").toString + "/st"
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("id", "text")
    val v3 = Seq((1L, "a"), (2L, "B2"), (3L, "c3"), (4L, "d"), (5L, "e"))
      .toDF("id", "text")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "text", "row_hash", "valid_from", "valid_to")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
        .sortBy(t => (t._1, t._4)).toSeq

    val (h1, w1) = Snapshot.ensureHistory(v1, dir, "id", Seq("text"), 1L)
    assert(w1 && rows(h1) == rows(
      Snapshot.scd2Init(v1, "id", Seq("text"), 1L)))
    val (h2, w2) = Snapshot.ensureHistory(v2, dir, "id", Seq("text"), 2L)
    assert(w2)
    val (h3, w3) = Snapshot.ensureHistory(v3, dir, "id", Seq("text"), 3L)
    assert(w3 && rows(h3) == rows(hist3),
      "stored history diverged from the in-memory scd2 chain")
    assert(Snapshot.historyVersion(dir).contains(3L))

    // delta layout: one immutable closed partition per closing refresh,
    // exactly one live open dir
    val st = new java.io.File(dir)
    val closedDirs = new java.io.File(st, "closed").listFiles()
      .filter(_.getName.startsWith("version=")).map(_.getName).sorted
    assert(closedDirs.toSeq == Seq("version=2"),
      s"v2 closed rows only (v3 closes nothing in this fixture): " +
        closedDirs.mkString(","))
    assert(st.listFiles().count(_.getName.startsWith("open_v")) == 1 &&
      new java.io.File(st, "open_v3").isDirectory,
      "superseded open dirs must be swapped out")

    // warm serve + prefix replay: the snapshot argument is NEVER
    // evaluated (the by-name thunk would throw)
    val (warm, wW) = Snapshot.ensureHistory(
      sys.error("warm serve must not evaluate the snapshot"),
      dir, "id", Seq("text"), 3L)
    assert(!wW && rows(warm) == rows(h3))
    val (replay, wR) = Snapshot.ensureHistory(
      sys.error("prefix replay must not evaluate the snapshot"),
      dir, "id", Seq("text"), 2L)
    assert(!wR && rows(replay) == rows(h3),
      "replaying an applied prefix must serve, not rewind")

    // time travel + diff straight off the store
    val at2 = Snapshot.snapshotAt(Snapshot.loadHistory(spark, dir), 2L)
      .select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(at2 == Seq((1L, "a"), (2L, "B2"), (4L, "d")))

    // tracked-column drift invalidates (hashes are incomparable)
    val (hDrift, wDrift) = Snapshot.ensureHistory(v1, dir, "id",
      Seq("text", "id"), 1L)
    assert(wDrift, "hashCols drift must rebuild the store")
    assert(Snapshot.historyVersion(dir).contains(1L))
    assert(hDrift.count() == 3)

    // manifest-less state is invalid
    graft.sources.Bundle.deleteRecursively(s"$dir/manifest.json")
    intercept[IllegalStateException] { Snapshot.loadHistory(spark, dir) }
  }

  test("persisted history store: an orphan closed partition from a torn " +
       "refresh is invisible to reads and healed by the replay") {
    val dir = java.nio.file.Files
      .createTempDirectory("scd2-torn").toString + "/st"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val v2 = Seq((1L, "a2"), (2L, "b")).toDF("id", "text")
    Snapshot.ensureHistory(v1, dir, "id", Seq("text"), 1L)

    def rows() = Snapshot.loadHistory(spark, dir)
      .select("id", "text", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._3)).toSeq
    val before = rows()

    // simulate the crash window: a BOGUS version-2 closed delta landed
    // (closing key 2, which the real refresh keeps open), the manifest
    // commit did not — reads must not see the orphan (it would show
    // key 2 both open and closed), and the replay must OVERWRITE it
    Snapshot.scd2Init(v1, "id", Seq("text"), 1L)
      .filter(col("id") === 2L)
      .withColumn("valid_to", lit(2L))
      .write.mode("overwrite").parquet(s"$dir/closed/version=2")
    assert(rows() == before,
      "an orphan closed partition above the cursor leaked into reads")

    // the replayed refresh overwrites the orphan and commits normally
    val (h2, wrote) = Snapshot.ensureHistory(v2, dir, "id", Seq("text"), 2L)
    assert(wrote)
    val chain = h2.select("id", "text", "valid_from", "valid_to").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(chain == Seq((1L, "a", 1L, Some(2L)), (1L, "a2", 2L, None),
      (2L, "b", 1L, None)), s"torn refresh not healed cleanly: $chain")
  }

  test("diff flags exactly the added/removed/changed keys between any " +
       "two versions") {
    val d = Snapshot.diff(hist3, 1L, 3L, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "changed", 4L -> "added",
      5L -> "added"), s"unexpected diff $d")
    val d23 = Snapshot.diff(hist3, 2L, 3L, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d23 == Map(3L -> "added", 5L -> "added"))
  }
}
