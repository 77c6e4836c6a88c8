package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Packing}

/** Dedup cluster resolution (connected components) + token-budget
  * sequence packing.
  */
@SlowSuite
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

  test("components converge on a path graph in diameter rounds, read off " +
       "the same aggregation (no extra join action)") {
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (0L until 16L).toDF("id")
    val (labels, iters) = Clusters.componentsIters(pairs, vertices)
    assert(labels.collect().forall(_.getLong(1) == 0L))
    // label 0 travels one hop per round on a path: diameter-bounded
    assert(iters <= 17, s"took $iters rounds")
  }

  test("iterative closures release superseded checkpoint blocks eagerly: " +
       "a many-round run leaves only the final round persisted") {
    val sc = spark.sparkContext
    def persisted() = sc.getPersistentRDDs.keySet

    // 24-node path: ~24 propagation rounds — without eager release every
    // round's checkpoint (plus edges and rawPairs) would still be pinned
    val pairs = (0L until 23L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (0L until 24L).toDF("id")
    val before = persisted()
    val (labels, iters) = Clusters.componentsIters(pairs, vertices)
    assert(iters >= 10, s"fixture must force many rounds, got $iters")
    val leaked = (persisted() -- before).size
    assert(leaked <= 2,
      s"componentsIters left $leaked checkpoint RDDs persisted after " +
        s"$iters rounds — superseded rounds must be released eagerly")
    assert(labels.collect().forall(_.getLong(1) == 0L))

    // label propagation: fixed rounds, same discipline
    val before2 = persisted()
    val lp = Clusters.labelPropagation(pairs, vertices, rounds = 8)
    val leaked2 = (persisted() -- before2).size
    assert(leaked2 <= 2,
      s"labelPropagation left $leaked2 checkpoint RDDs persisted")
    assert(lp.count() == 24)

    // star contraction: per-round large + next both released
    val before3 = persisted()
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainV = (0L until 64L).toDF("id")
    val (sl, siters) = Clusters.starComponentsIters(chain, chainV)
    assert(siters >= 3)
    // final edges + rawPairs stay referenced by the returned lazy plan
    val leaked3 = (persisted() -- before3).size
    assert(leaked3 <= 3,
      s"starComponentsIters left $leaked3 checkpoint RDDs persisted " +
        s"after $siters rounds")
    assert(sl.collect().forall(_.getLong(1) == 0L))
  }

  test("reliable checkpoint mode (spark.graft.checkpointDir): CC and " +
       "pageRank results identical to the local mode, rounds go through " +
       "persisted files, superseded round files are deleted eagerly") {
    val pairs = (0L until 23L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (0L until 24L).toDF("id")
    val edges = (0L until 23L).map(i => (i, i + 1)).toDF("src", "dst")
    def run() = (
      Clusters.components(pairs, vertices).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      Clusters.pageRank(edges, iterations = 4).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap,
      Clusters.starComponents(pairs, vertices).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      Clusters.labelPropagation(pairs, vertices, rounds = 6).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      Clusters.hits(edges, iterations = 3).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap)
    val (ccLocal, prLocal, stLocal, lpLocal, hitsLocal) = run()
    val ckRoot = java.nio.file.Files.createTempDirectory("graft-ck")
    spark.conf.set("spark.graft.checkpointDir", ckRoot.toString)
    try {
      spark.sparkContext.setCheckpointDir(ckRoot.toString)
      val (ccRel, prRel, stRel, lpRel, hitsRel) = run()
      assert(ccRel == ccLocal, "reliable-mode components diverged")
      assert(stRel == stLocal, "reliable-mode starComponents diverged")
      assert(lpRel == lpLocal, "reliable-mode labelPropagation diverged")
      assert(hitsRel == hitsLocal, "reliable-mode HITS diverged")
      assert(prRel.keySet == prLocal.keySet)
      prLocal.foreach { case (k, v) =>
        assert(approx(prRel(k), v, 0.0), s"reliable-mode pageRank at $k") }
      // reliable rounds are FILES (executor-loss-survivable), and the
      // release hygiene deletes superseded rounds: after both loops, at
      // most the few still-referenced final frames remain on disk
      def rddDirs() = {
        val d = new java.io.File(spark.sparkContext.getCheckpointDir.get
          .stripPrefix("file:"))
        Option(d.listFiles()).map(_.count(_.getName.startsWith("rdd-")))
          .getOrElse(0)
      }
      val left = rddDirs()
      assert(left >= 1,
        "reliable mode must have produced checkpoint files (conf ignored?)")
      assert(left <= 20,
        s"$left rdd-* checkpoint dirs remain after 5 algorithms — " +
          "superseded rounds' files must be deleted by Checkpoints.release")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("star contraction resolves a 1024-node chain in O(log n) rounds") {
    // THE adversarial case for label propagation (would need 1023 rounds —
    // more than maxIters); alternating large/small-star contracts it
    // exponentially fast.
    val pairs = (1L until 1024L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val vertices = (1L to 1024L).toDF("id")
    val (labels, iters) = Clusters.starComponentsIters(pairs, vertices)
    assert(iters <= 15, s"took $iters rounds for a 1024-chain")
    val got = labels.collect()
    assert(got.length == 1024 && got.forall(_.getLong(1) == 1L))
  }

  test("star contraction matches label propagation on mixed graphs") {
    // cliques + chains + singletons, ids deliberately non-contiguous
    val pairs = (Seq((5L, 7L), (7L, 6L), (6L, 5L)) ++ // clique
      Seq((20L, 30L), (30L, 25L)) ++                  // chain
      Seq((100L, 41L))).toDF("id_a", "id_b")
    val vertices = (Seq(5L, 6L, 7L, 20L, 25L, 30L, 41L, 100L, 999L)).toDF("id")
    val lp = Clusters.components(pairs, vertices).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st = Clusters.starComponents(pairs, vertices).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp == st)
    assert(st(999L) == 999L && st(100L) == 41L && st(25L) == 20L)
    // contract parity when an edge endpoint is missing from vertices:
    // both algorithms must still label it (LP admits it via the
    // neighbour union)
    val partial = Seq(5L, 6L, 7L, 20L, 30L, 41L, 999L).toDF("id") // no 25/100
    val lp2 = Clusters.components(pairs, partial).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val st2 = Clusters.starComponents(pairs, partial).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp2 == st2)
    assert(lp2.contains(25L) && lp2.contains(100L) && lp2(100L) == 41L)
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

  test("deterministic sampling: reproducible, rate-accurate, salt-independent") {
    val docs = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = graft.operators.Sampling.deterministicSample(docs, 0.3)
      .select("doc_id").as[Long].collect().toSet
    val s2 = graft.operators.Sampling.deterministicSample(docs, 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "same salt must give the same subset")
    assert(math.abs(s1.size - 600) < 80, s"rate off: ${s1.size}/2000 at 0.3")
    val other = graft.operators.Sampling.deterministicSample(docs, 0.3, salt = "x")
      .select("doc_id").as[Long].collect().toSet
    assert(other != s1, "different salt must give an independent subset")
    // nested property: a higher-rate sample contains the lower-rate one
    // (same salt, threshold rule) — lets pipelines grow samples monotonically
    val bigger = graft.operators.Sampling.deterministicSample(docs, 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(bigger))
    // stratified: per-stratum rates honoured
    val strat = graft.operators.Sampling.stratifiedSample(docs, "lang",
      Map("en" -> 1.0), defaultFraction = 0.0)
      .select("doc_id", "lang").collect()
    assert(strat.forall(_.getString(1) == "en") && strat.length == 500)
  }

  test("mixtureSample hits target proportions within the budget, clamps small strata") {
    // 1600 "web" + 400 "code": equal-weight mix at budget 0.5 wants 500 of
    // each; code has only 400 -> rate clamps to 1.0 (keep all, no upsample)
    val docs = (0L until 2000L).map(i => (i, if (i % 5 == 4) "code" else "web"))
      .toDF("doc_id", "kind")
    val mixed = graft.operators.Sampling.mixtureSample(docs, "kind",
      Map("web" -> 1.0, "code" -> 1.0), budgetFraction = 0.5)
    val byKind = mixed.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("code") == 400, "clamped stratum must keep everything")
    assert(math.abs(byKind("web") - 500) < 70,
      s"web kept ${byKind("web")}, want ~500 (rate 500/1600)")
    // replay-stable: same call, same subset
    val again = graft.operators.Sampling.mixtureSample(docs, "kind",
      Map("web" -> 1.0, "code" -> 1.0), budgetFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)
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

  test("materializeSequences assembles shards in id order with boundaries") {
    val docs = Seq((1L, "aa bb", 2), (2L, "cc", 1), (3L, "dd ee ff", 3),
      (4L, "gg", 1)).toDF("doc_id", "text", "n_tok")
    val got = Packing.materializeSequences(docs, budget = 3, sep = " | ")
      .orderBy("shard").collect()
    // before: 0,2,3,6 → shards: d1,d2 | d3 | d4; offsets within shard
    assert(got.length == 3)
    assert(got(0).getAs[String]("text") == "aa bb | cc")
    assert(got(0).getSeq[Long](got(0).fieldIndex("boundaries")) == Seq(0L, 2L))
    assert(got(1).getAs[String]("text") == "dd ee ff")
    assert(got(2).getAs[String]("text") == "gg")
    assert(got(2).getSeq[Long](got(2).fieldIndex("boundaries")) == Seq(0L))
  }

  test("keepBest keeps the highest score, smallest id on ties") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "cluster")
    val scores = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (7L, 0.5), (8L, 0.5))
      .toDF("id", "score")
    val got = graft.operators.Clusters.keepBest(labels, scores)
      .collect().map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("keep_id"), r.getAs[Double]("best_score"),
          r.getAs[Long]("n_members"))).toMap
    assert(got(1L) == (2L, 0.9, 3L), "score wins, then smallest id")
    assert(got(7L) == (7L, 0.5, 2L))
  }

  test("keepBest works with STRING ids (argmax negates the score, not " +
       "the id)") {
    val labels = Seq(("docA", "c1"), ("docB", "c1"), ("docC", "c1"),
      ("x9", "c2"), ("x10", "c2")).toDF("id", "cluster")
    val scores = Seq(("docA", 0.2), ("docB", 0.9), ("docC", 0.9),
      ("x9", 0.5), ("x10", 0.5)).toDF("id", "score")
    val got = graft.operators.Clusters.keepBest(labels, scores)
      .collect().map(r => r.getAs[String]("cluster") ->
        (r.getAs[String]("keep_id"), r.getAs[Double]("best_score"),
          r.getAs[Long]("n_members"))).toMap
    assert(got("c1") == ("docB", 0.9, 3L),
      "highest score wins; ties break to the LEXICALLY smallest string id")
    // string ordering: "x10" < "x9" lexically — the tie-break follows the
    // id type's own ordering, documented behavior
    assert(got("c2") == ("x10", 0.5, 2L))
  }

  test("keepBest: NULL scores lose; an all-NULL cluster keeps the " +
       "smallest id with best_score NULL") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "cluster")
    val scores = Seq((1L, Some(0.1)), (2L, None), (3L, Some(0.4)),
      (7L, Option.empty[Double]), (8L, None)).toDF("id", "score")
    val got = graft.operators.Clusters.keepBest(labels, scores)
      .collect().map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("keep_id"), Option(r.get(r.fieldIndex("best_score"))),
          r.getAs[Long]("n_members"))).toMap
    assert(got(1L) == (3L, Some(0.4), 3L),
      "a NULL-scored member must not beat a real score")
    assert(got(7L) == (7L, None, 2L),
      "all-NULL cluster: smallest id survives, best_score NULL, " +
        "members still counted")
  }

  test("keepBest round-trips a zero score exactly (double negation)") {
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    val scores = Seq((1L, 0.0), (2L, 0.0)).toDF("id", "score")
    val got = graft.operators.Clusters.keepBest(labels, scores).collect()
    assert(got.length == 1 && got(0).getAs[Long]("keep_id") == 1L)
    val bs = got(0).getAs[Double]("best_score")
    assert(bs == 0.0 &&
      java.lang.Double.doubleToRawLongBits(bs) == 0L,
      "best_score must be +0.0, not -0.0")
  }

  test("temperatureSample flattens toward uniform as T grows") {
    val docs = (0L until 2000L).map(i => (i, if (i % 10 == 9) "rare" else "big"))
      .toDF("doc_id", "kind")
    def kept(t: Double): Map[String, Long] =
      graft.operators.Sampling.temperatureSample(docs, "kind",
          temperature = t, budgetFraction = 0.25)
        .groupBy("kind").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t1 = kept(1.0) // proportional: ~450 big, ~50 rare
    val t4 = kept(4.0) // flattened: rare upweighted
    assert(math.abs(t1("big") - 450) < 60 && math.abs(t1("rare") - 50) < 25,
      s"T=1 must keep observed proportions, got $t1")
    assert(t4("rare") > t1("rare") * 2,
      s"T=4 must upweight the rare stratum, got $t4 vs $t1")
    // replay-stable
    assert(kept(4.0) == t4)
  }

  test("weightedSample: without replacement per stratum, weight-biased, " +
       "deterministic, non-positive weights excluded") {
    // two strata; in "m" one heavy doc (w=50) among 200 light (w=0.1):
    // E[heavy's key] = ln(u)/50 is ~500x closer to 0 than any light key,
    // so the heavy doc must win a top-5 seat with near-certainty
    val docs = ((0L until 200L).map(i => (i, "m", 0.1)) :+
      (500L, "m", 50.0) :+ (501L, "m", 0.0) :+ (502L, "m", -1.0)) ++
      (1000L until 1050L).map(i => (i, "z", 1.0))
    val df = docs.toDF("doc_id", "stratum", "w")
    val got = graft.operators.Sampling.weightedSample(df, n = 5,
        weightCol = "w", strataCol = "stratum", idCol = "doc_id")
      .collect().map(r => (r.getAs[String]("stratum"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toSeq
    val m = got.filter(_._1 == "m").map(_._2)
    assert(m.length == 5 && m.distinct.length == 5,
      "must draw exactly n distinct ids per stratum")
    assert(m.contains(500L),
      s"the 500x-heavier doc must be selected, got $m")
    assert(!m.contains(501L) && !m.contains(502L),
      "non-positive weights must never qualify")
    assert(got.count(_._1 == "z") == 5)
    // replay-stable: same draw on a rerun
    val again = graft.operators.Sampling.weightedSample(df, n = 5,
        weightCol = "w", strataCol = "stratum", idCol = "doc_id")
      .collect().map(r => (r.getAs[String]("stratum"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toSeq
    assert(again == got, "weightedSample must be deterministic")
    // a different salt draws a different light-doc set (independence)
    val other = graft.operators.Sampling.weightedSample(df, n = 5,
        weightCol = "w", strataCol = "stratum", idCol = "doc_id",
        salt = "other")
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(other != got.map(_._2).toSet,
      "re-salting must draw an independent sample")
  }

  test("chunkDocs: window/stride rule, last chunk reaches the end") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.Chunking.chunkDocs(docs, window = 4, stride = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"))
        -> (r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_text"))).toMap
    // sz=10, W=4, S=3 → nc = ceil(6/3)+1 = 3; starts 1, 4, 7
    assert(got((1L, 0L)) == (4L, "t1 t2 t3 t4"))
    assert(got((1L, 1L)) == (4L, "t4 t5 t6 t7"))
    assert(got((1L, 2L)) == (4L, "t7 t8 t9 t10"))
    assert(got((2L, 0L)) == (2L, "a b")) // short doc: one chunk
    assert(got((3L, 0L)) == (0L, ""))    // empty doc: one empty chunk
    assert(got.size == 5)
  }

  test("label propagation: a thin bridge does NOT merge two dense " +
       "communities (where components does), isolated nodes keep their " +
       "own label, and re-running is deterministic") {
    // barbell: cliques {1..5} and {11..15}, one bridge 5–11
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val pairs = (clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L))
      .toDF("id_a", "id_b")
    val vertices = ((1L to 5L) ++ (11L to 15L) :+ 99L).toDF("id")
    def run() = Clusters.labelPropagation(pairs, vertices, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lp = run()
    assert(lp == run(), "label propagation must be deterministic")
    assert(lp(99L) == 99L, "isolated node keeps its own label")
    val left = (1L to 5L).map(lp).toSet
    val right = (11L to 15L).map(lp).toSet
    assert(left.size == 1 && right.size == 1,
      s"each clique must converge to one label: $lp")
    assert(left != right,
      "the bridge must not merge the two dense communities")
    // transitive closure DOES merge them — the operators are different
    val cc = Clusters.components(pairs, vertices).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).map(cc).toSet == (11L to 15L).map(cc).toSet)
  }

  test("leakage-safe split: split is a pure function of the cluster, " +
       "deterministic, with proportions near the requested fractions") {
    // 2000 clusters of 3 docs each — every member must land together
    val labels = (0L until 6000L).map(i => (i, i / 3)).toDF("id", "cluster")
    def run() = Clusters.leakageSafeSplit(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val a = run()
    assert(a.toSeq == run().toSeq, "split assignment must be deterministic")
    val perCluster = a.groupBy(_._2).values
    assert(perCluster.forall(_.map(_._3).toSet.size == 1),
      "a cluster straddled two splits — the leakage guard is broken")
    val frac = a.count(_._3 == "train").toDouble / a.length
    assert(math.abs(frac - 0.8) < 0.05, s"train fraction drifted: $frac")
    val vfrac = a.count(_._3 == "val").toDouble / a.length
    assert(math.abs(vfrac - 0.1) < 0.04, s"val fraction drifted: $vfrac")
  }

  test("label propagation adopts the majority label and breaks count " +
       "ties toward the smaller label") {
    // star: center 10 with neighbors 1, 2, 3 — after one round the
    // center adopts the smallest neighbor label (all counts = 1)
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L)).toDF("id_a", "id_b")
    val vertices = Seq(1L, 2L, 3L, 10L).toDF("id")
    val one = Clusters.labelPropagation(pairs, vertices, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(10L) == 1L, s"tie must break toward the smallest label: $one")
    // leaves see only the center: they adopt 10 after round 1
    assert(one(1L) == 10L && one(2L) == 10L && one(3L) == 10L)
  }

  test("triangleCounts: clique / braced square / chain / singleton, " +
       "duplicate and reversed pairs collapse") {
    // K4 on 1..4 (every vertex in C(3,2)=3 triangles), square 10-11-12-13
    // with diagonal 10-12 (diagonal endpoints in 2, others in 1), chain
    // 20-21-22 (0), isolated 99 (0); edges fed in BOTH orders plus a
    // duplicate — the canonicalization must collapse them
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val sq = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L), (10L, 12L))
    val chain = Seq((20L, 21L), (21L, 22L))
    val pairs = (k4 ++ sq ++ chain ++ Seq((2L, 1L), (1L, 2L)))
      .toDF("id_a", "id_b")
    val verts = ((1L to 4L) ++ (10L to 13L) ++ (20L to 22L) ++ Seq(99L))
      .toDF("id")
    val got = Clusters.triangleCounts(pairs, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(got(_) == 3L), s"K4 wrong: $got")
    assert(got(10L) == 2L && got(12L) == 2L &&
      got(11L) == 1L && got(13L) == 1L, s"braced square wrong: $got")
    assert(Seq(20L, 21L, 22L, 99L).forall(got(_) == 0L),
      s"chain/singleton must be triangle-free: $got")
    // global count: K4 has 4, braced square 2
    assert(got.values.sum == 3 * 6L, s"sum(n_tri) must be 3·triangles")
  }

  test("pageRank: hand-computed dangling redistribution, mass conserved") {
    // A→B only: B is dangling. n=2, r0 = (0.5, 0.5), D = 0.5.
    // r1(A) = 0.15/2 + 0.85·(0 + 0.25)          = 0.2875
    // r1(B) = 0.15/2 + 0.85·(0.5/1 + 0.25)      = 0.7125
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r1 = Clusters.pageRank(e, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1(1L) - 0.2875) < 1e-9 &&
      math.abs(r1(2L) - 0.7125) < 1e-9, s"got $r1")
    // Σr = 1 must survive more rounds (dangling mass is redistributed,
    // not dropped) — the property a plain inflow-only PageRank violates
    val r5 = Clusters.pageRank(e, iterations = 5)
      .agg(sum(col("rank"))).collect()(0).getDouble(0)
    assert(math.abs(r5 - 1.0) < 1e-8, s"mass leaked: $r5")
  }

  test("bfsDepth: multi-source layers on a path, depth caps at maxDepth, " +
       "directed mode follows edge direction, unreached is NULL") {
    // path 1-2-3-4-5 plus isolated 99; seeds {1, 5}
    val pairs = (1L to 4L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val verts = ((1L to 5L) :+ 99L).toDF("id")
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Clusters.bfsDepth(pairs, verts, seeds, maxDepth = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> -1, 4L -> 1, 5L -> 0,
      99L -> -1), s"two-source depth-1 wrong: $got")
    val deep = Clusters.bfsDepth(pairs, verts, Seq(1L).toDF("id"),
        maxDepth = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(deep == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> -1,
      99L -> -1), s"cap at maxDepth wrong: $deep")
    // directed: edges point up the path only — nothing reaches seed 5
    val dir5 = Clusters.bfsDepth(pairs, verts, Seq(5L).toDF("id"),
        maxDepth = 3, directed = true)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(dir5(5L) == 0 && (1L to 4L).forall(dir5(_) == -1),
      s"directed mode leaked against edge direction: $dir5")
  }

  test("hits: hand-computed hub/authority fixpoint steps on a small DAG, " +
       "pure hubs score 0 authority and vice versa") {
    // A→B, A→C, D→B (A, D hubs; B, C authorities)
    // auth1: raw B=2, C=1 → (2/3, 1/3); hub1: raw A=1, D=2/3 → (3/5, 2/5)
    // auth2: raw B=3/5+2/5=1, C=3/5 → (5/8, 3/8)
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val one = Clusters.hits(e, iterations = 1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(approx(one(1L)._1, 0.6, 1e-8) && approx(one(2L)._1, 0.4, 1e-8),
      s"hub step wrong: $one")
    assert(approx(one(10L)._2, 2.0 / 3, 1e-8) &&
      approx(one(11L)._2, 1.0 / 3, 1e-8), s"auth step wrong: $one")
    assert(one(10L)._1 == 0.0 && one(1L)._2 == 0.0,
      s"pure authorities must have hub 0 and vice versa: $one")
    val two = Clusters.hits(e, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(approx(two(10L), 0.625, 1e-8) && approx(two(11L), 0.375, 1e-8),
      s"round-2 authorities wrong: $two")
  }

  test("personalizedPageRank: hand-computed seed teleport with dangling " +
       "return-to-seeds, mass conserved; uniform seeds recover the " +
       "standard pageRank") {
    // A→B, all teleport on A. r1 = (0.15, 0.85);
    // r2(A) = 0.15 + 0.85·0.85 = 0.8725, r2(B) = 0.85·0.15 = 0.1275
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, 1.0)).toDF("id", "w")
    val r1 = Clusters.personalizedPageRank(e, seeds, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(approx(r1(1L), 0.15, 1e-9) && approx(r1(2L), 0.85, 1e-9),
      s"round 1 wrong: $r1")
    val r2 = Clusters.personalizedPageRank(e, seeds, iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(approx(r2(1L), 0.8725, 1e-9) && approx(r2(2L), 0.1275, 1e-9),
      s"round 2 wrong: $r2")
    assert(math.abs(r2.values.sum - 1.0) < 1e-8, "mass leaked")
    // uniform teleport over ALL vertices ≡ the standard pageRank
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val uni = (1L to 3L).map((_, 1.0)).toDF("id", "w")
    val ppr = Clusters.personalizedPageRank(g, uni, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val pr = Clusters.pageRank(g, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    (1L to 3L).foreach(i => assert(approx(ppr(i), pr(i), 1e-9),
      s"uniform PPR must equal pageRank: $ppr vs $pr"))
  }

  test("personalizedPageRank: empty or weightless teleport fails fast") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val none = Seq.empty[(Long, Double)].toDF("id", "w")
    val zeroes = Seq((1L, 0.0), (2L, -3.0), (3L, Double.NaN)).toDF("id", "w")
    for (bad <- Seq(none, zeroes)) {
      val ex = intercept[IllegalArgumentException] {
        Clusters.personalizedPageRank(e, bad, iterations = 1)
      }
      assert(ex.getMessage.contains("teleport"), ex.getMessage)
    }
  }

  test("pageRank weighted: contributions split by edge weight, parallel " +
       "weighted edges sum, unit weights equal the unweighted result") {
    // A→B w=3 (as 2+1 parallel edges), A→C w=1; B, C dangling; n=3.
    // r1(A) = 0.05 + 0.85·(2/9)           = 0.238888…
    // r1(B) = 0.05 + 0.85·(3/4·1/3 + 2/9) = 0.451388…
    // r1(C) = 0.05 + 0.85·(1/4·1/3 + 2/9) = 0.309722…
    val e = Seq((1L, 2L, 2.0), (1L, 2L, 1.0), (1L, 3L, 1.0))
      .toDF("src", "dst", "w")
    val r = Clusters.pageRank(e, iterations = 1, weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(approx(r(1L), 0.05 + 0.85 * 2.0 / 9, 1e-8) &&
      approx(r(2L), 0.05 + 0.85 * (0.25 + 2.0 / 9), 1e-8) &&
      approx(r(3L), 0.05 + 0.85 * (1.0 / 12 + 2.0 / 9), 1e-8), s"got $r")
    // unit weights ≡ unweighted on a simple graph
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val uw = Clusters.pageRank(cyc.withColumn("w", lit(1.0)),
        iterations = 3, weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val plain = Clusters.pageRank(cyc, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(uw == plain, s"unit-weight drift: $uw vs $plain")
  }

  test("pageRank: a 2-cycle is stationary at 0.5/0.5; more in-links " +
       "mean more rank; superseded round blocks are released") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Clusters.pageRank(cyc, iterations = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-9 && math.abs(r(2L) - 0.5) < 1e-9)
    // star into 9: the hub must outrank every spoke
    val star = (1L to 5L).map(i => (i, 9L)).toDF("src", "dst")
    val s9 = Clusters.pageRank(star, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert((1L to 5L).forall(i => s9(9L) > s9(i)), s"hub must win: $s9")
    // eager release: only the final ranks checkpoint survives the call
    val after = sc.getPersistentRDDs.keySet -- before
    assert(after.size <= 2, s"leaked checkpoint blocks: ${after.size}")
  }
}
