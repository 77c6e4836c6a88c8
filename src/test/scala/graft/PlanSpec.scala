package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Physical-plan regression tests — the scale contract, asserted.
  *
  * Correctness gates (oracle + specs) can't see a plan that silently
  * degrades: a join that stops broadcasting, a filter that stops reaching
  * the parquet scan, a cartesian product sneaking in behind an innocent
  * `join`. These tests pin the plan properties the 100 TB design relies
  * on, on every registry query.
  */
@SlowSuite
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // planning only — no execution. AQE off while building: the adaptive
  // wrapper defers codegen collapse to runtime, hiding the
  // WholeStageCodegen markers these assertions need; the static plan is
  // what planning guarantees anyway.
  private lazy val planned: Map[String, org.apache.spark.sql.execution.SparkPlan] = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Registry.all.map { qd =>
      qd.name -> qd.fn(spark, sfDir).queryExecution.executedPlan
    }.toMap
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private lazy val plans: Map[String, String] =
    planned.map { case (k, v) => k -> v.toString }

  test("no unbroadcast cartesian product in any registry query plan") {
    // CartesianProductExec shuffles |A|x|B| — never acceptable; the
    // intentional small cross joins (scalar x scalar, hkl lattice, query
    // fan-out) must all plan as BroadcastNestedLoopJoin
    assert(plans.size == Registry.all.size,
      s"plan coverage (${plans.size}) fell behind the registry (${Registry.all.size})")
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("quality/bloom family plans: partial agg, broadcast, no window skew (q65-q69)") {
    // q68 line dedup: the corpus-wide first occurrence must be an
    // aggregation (map-side combinable), NOT a row_number window over the
    // line-hash key — one boilerplate line duplicated 10^8 times would
    // otherwise sort inside a single task
    val q68 = plans("q68_line_dedup")
    assert(!q68.contains("Window"),
      "q68 regressed to a window over the line-hash key")
    assert("HashAggregate".r.findAllIn(q68).size >= 2,
      "q68 lost partial aggregation")
    // q65/q67 are single codegen'd projections; q66 aggregates per doc
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plans("q65_gopher_quality")).isDefined,
      "q65: gopher projection fell out of codegen")
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plans("q67_pii_scrub")).isDefined,
      "q67: pii projection fell out of codegen")
    assert("HashAggregate".r.findAllIn(plans("q66_c4_line_filter")).size >= 2,
      "q66 lost partial aggregation")
    // q69 bloom probe joins the (<= mBits)-row bit set by broadcast
    assert(plans("q69_bloom_dedup").contains("Broadcast"),
      "q69 lost its broadcast bit-set join")
  }

  test("image<->log equi-join broadcasts the small side (q13)") {
    assert(plans("q13_j1_join_broadcast").contains("BroadcastHashJoin"),
      "q13 must broadcast the log side, not sort-merge it")
  }

  test("ANN queries broadcast the query set, never shuffle the corpus for it") {
    for (q <- Seq("q38_sim_threshold", "q39_sim_topk", "q40_sim_lsh"))
      assert(plans(q).contains("Broadcast"), s"$q lost its broadcast")
  }

  test("filters and projections reach the parquet scan") {
    // the F1 filter query must show parquet-level pushdown, and its scan
    // must not read every lineitem column for a few-column output
    val plan = plans("q16_f_filters")
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      "q16 filter no longer pushed to the parquet scan")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(_.split(",").length <= 8),
      s"q16 scan reads too many columns: $readSchemas")
  }

  test("hot aggregation paths stay inside whole-stage codegen") {
    // codegen stages print as "*(n) Operator" in the simple plan string
    for (q <- Seq("q01_a3_delay_average", "q24_a1_integrate1d",
      "q42_dedup_minhash"))
      assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(plans(q)).isDefined,
        s"$q: no HashAggregate inside a codegen stage")
    // q33 is projection-only — its per-document expression work must still
    // be inside a codegen stage
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plans("q33_text_stats")).isDefined,
      "q33: projection fell out of codegen")
  }

  test("no single-task global window over table-grain data in any registry plan") {
    // An unpartitioned window moves EVERY row to one task — the q17/q19
    // class of hazard. Allowed instances: q19, whose window input is the
    // post-aggregation histogram (one row per price bin, bounded by the
    // value range, not the table); q165, whose rank window runs AFTER
    // `limit(k)` (k = 20) — GlobalLimit has already coalesced the frame
    // to one k-row partition, so the window moves nothing.
    val allowed = Set("q19_w4_smoothing", "q165_token_shift")
    val offenders = planned.collect {
      case (name, plan) if plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }.nonEmpty => name
    }.toSet
    assert(offenders.subsetOf(allowed),
      s"unpartitioned window crept into: ${(offenders -- allowed).mkString(", ")}")
  }

  test("r5 family plans: q72 keeps partial aggregation, q73 ranks in bounded groups") {
    // q72: the min-id-per-shingle rule must be a map-side-combinable
    // aggregation (boilerplate shingles collapse before the shuffle)
    assert("HashAggregate".r.findAllIn(plans("q72_remove_dup_spans")).size >= 2,
      "q72 lost partial aggregation on the shingle hash")
    // q73: both selection phases are windows over bounded groups —
    // (domain, salt) then the <= cap*nSalt survivors per domain
    val q73windows = planned("q73_domain_cap").collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(q73windows.size >= 2 && q73windows.forall(_.partitionSpec.nonEmpty),
      "q73's two-phase salted selection regressed")
    // q76: ADC ranks against a BROADCAST query set — the corpus is never
    // shuffled for the probe side
    assert(plans("q76_pq_ann").contains("Broadcast"),
      "q76 lost its broadcast query join")
    // q77: banded candidate join + integer hamming — no hash-key window,
    // no string shuffles of the 64-bit hash (packed long end to end)
    assert(!plans("q77_perceptual_dedup").contains("Window"),
      "q77 must not window over the hash key")
  }

  test("ANN ranking windows are all bounded (salted two-phase top-k)") {
    // q39/q76/q79: the per-query top-k must never sort a query's full
    // candidate set in one task. The salted two-phase selection plans as
    // (a) a phase-1 window over (query_id, salt) — partitionSpec size >= 2
    // — whose groups hold ~candidates/nSalt rows, then (b) a phase-2
    // window over query_id whose input is pre-filtered to <= k*nSalt rows
    // per query. Every window partitioned; at least one salted.
    for (q <- Seq("q39_sim_topk", "q76_pq_ann", "q79_ivf_adc_ann",
      "q81_knn_graph")) {
      val windows = planned(q).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, s"$q: expected ranking windows")
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$q: unpartitioned ranking window")
      assert(windows.exists(_.partitionSpec.size >= 2),
        s"$q: lost the salted phase-1 window — a query's whole candidate " +
          "set would sort in one task")
    }
    // q79 additionally prunes candidates to probed IVF cells before any
    // scoring: the cell equi-join must broadcast the probe side
    assert(plans("q79_ivf_adc_ann").contains("BroadcastHashJoin"),
      "q79 lost the broadcast cell join")

    // entry points without a registry query keep the same contract:
    // multi-table LSH, the kNN self-join, and residual-mode IVF-ADC must
    // all rank in salted bounded windows
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import graft.operators.Similarity
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val cents = Seq.tabulate(4)(i => Seq.tabulate(64)(d =>
        if (d % 4 == i) 1.0 else 0.0))
      val cbs = Seq.fill(8)(Seq.fill(4)(Seq.fill(8)(0.25)))
      val direct = Seq(
        "lshTopKMulti" -> Similarity.lshTopKMulti(emb, qs, k = 5, dim = 64,
          nBits = 3, nTables = 2),
        "knnGraph" -> Similarity.knnGraph(emb, k = 3, dim = 64, nBits = 3,
          nTables = 2),
        "ivfAdcTopK(residual)" -> Similarity.ivfAdcTopK(emb, qs, cents, cbs,
          k = 5, nProbe = 2, byResidual = true))
      for ((name, df) <- direct) {
        val windows = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
          s"$name: unpartitioned ranking window")
        assert(windows.exists(_.partitionSpec.size >= 2),
          s"$name: lost the salted phase-1 window")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("LSH pair family plans carry the hot-bucket size cap") {
    // the band self-join must be gated by the per-bucket size filter
    // (_bsz <= cap on the pair path, _bsz > cap on the star path) — a
    // plan without it lets one degenerate bucket go B² in a single task
    for (q <- Seq("q42_dedup_minhash", "q84_lsh_hotbucket", "q81_knn_graph"))
      assert(plans(q).contains("_bsz"),
        s"$q lost the bucket-size cap on its band self-join")
  }

  test("aggregations are partial (map-side combine before the shuffle)") {
    // two HashAggregate levels around the exchange — partial then final;
    // a single post-shuffle aggregate would shuffle raw rows
    val plan = plans("q01_a3_delay_average")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "q01 lost its partial aggregation")
  }

  test("retrieval/LM/DSIR plans: salted BM25 ranking, broadcast models " +
       "(q86-q88)") {
    // q86: the per-query candidate ranking must be the salted two-phase
    // top-k (a hot query term puts the whole corpus under one query id)
    val w86 = planned("q86_bm25_retrieval").collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(w86.nonEmpty && w86.forall(_.partitionSpec.nonEmpty),
      "q86: unpartitioned ranking window")
    assert(w86.exists(_.partitionSpec.size >= 2),
      "q86: lost the salted phase-1 window")
    // postings semi-join + df/term/stats joins all broadcast — the corpus
    // is never shuffled to meet the query terms
    assert(plans("q86_bm25_retrieval").contains("BroadcastHashJoin"),
      "q86 lost its broadcast term joins")

    // q87 bucketing must be scalar compares, not a corpus-wide window
    // (the registry plan starts at the localCheckpoint, so assert the
    // scoring operator's own plan for the broadcast vocab join)
    assert(!plans("q87_ccnet_perplexity").contains("Window"),
      "q87 must bucket by scalar thresholds, not a window")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lm = graft.operators.LmScore.trainUnigram(docs)
    val scorePlan = graft.operators.LmScore.logPerplexity(docs, lm)
      .queryExecution.executedPlan.toString
    assert(scorePlan.contains("BroadcastHashJoin"),
      "logPerplexity must broadcast the vocabulary")
    assert(!scorePlan.contains("Window"), "logPerplexity grew a window")

    // q88: weight table broadcasts; selection is TakeOrderedAndProject,
    // never a global sort or window
    assert(plans("q88_dsir_selection").contains("BroadcastHashJoin"),
      "q88 lost the broadcast weight-table join")
    assert(!plans("q88_dsir_selection").contains("Window"),
      "q88 must not window")
    assert(plans("q88_dsir_selection").contains("TakeOrderedAndProject"),
      "q88 selection must plan as TakeOrderedAndProject")
  }

  test("q105 hybrid serve: fusion windows partition by query; the plan " +
       "serves from the persisted indexes, never the corpus") {
    val windows = planned("q105_rrf_hybrid_serve").collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "q105: expected ranking/fusion windows")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "q105: unpartitioned fusion window — a query's fused candidate set " +
        "would sort in one task")
    // the component rankings keep their salted phase-1 windows
    assert(windows.exists(_.partitionSpec.size >= 2),
      "q105: component rankings lost the salted phase-1 window")
    // serve purity: both persisted indexes are scanned; the documents
    // table is NOT — no tokenizer-over-corpus, no training in the plan
    val plan = plans("q105_rrf_hybrid_serve")
    assert(plan.contains("graft_bm25ix_q105"),
      "q105 must serve BM25 from the persisted inverted index")
    assert(plan.contains("graft_annix_q105"),
      "q105 must serve ANN from the persisted IVF-ADC index")
    assert(!plan.contains("documents.parquet"),
      "q105 re-derived corpus state the persisted indexes already hold")
  }

  test("q118 near-dup index serve: the lookup joins the SAVED capped " +
       "buckets and signatures — the indexed 80% is never re-hashed") {
    val plan = plans("q118_neardup_index_served")
    assert(plan.contains("graft_lshix_"),
      "q118 must read the persisted LSH index store")
    // the only corpus scans are the query-side 20% (signature build +
    // verification); the index side arrives pre-hashed from the store.
    // The index-side predicate would have to appear to re-hash it.
    assert(!plan.contains("NOT ((doc_id % 5) = 4)") &&
      !plan.contains("(doc_id % 5) != 4"),
      "q118 re-filtered the index split — the store already holds it")
  }

  test("q120/q121 range joins: the bucket rewrite plans as an equi-join " +
       "— no nested-loop, no cartesian") {
    for (q <- Seq("q120_range_join_incidents",
        "q121_session_incident_overlap",
        // q151: DOUBLE bounds, NO width conf — the auto-width rewrite
        // must still land the equi-join shape
        "q151_range_join_double_auto",
        // q160: DATE bounds (epoch-day grain), width-free
        "q160_range_join_date",
        // q174: the interval_overlap MARKER — three-leg rewrite with NO
        // conf anywhere; q176: sub-second DOUBLE intervals under the
        // fractional static width (0.25 off the literal)
        "q174_overlap_join_marker",
        "q176_subsecond_range_join")) {
      val plan = plans(q)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$q fell back to the O(n*m) range-join strategy")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("BroadcastHashJoin"),
        s"$q must hash/merge-join on (user_id, bucket)")
    }
    // q122/q145: backward and forward as-of are ONE union + window — no
    // join operator at all, so no range probe can ever nest-loop
    // q153: the graft-zorder read path — the box predicate must reach
    // the scan (that is what lets it consult the skipping index), and
    // the scan must be the NATIVE parquet reader over the pruned files
    // (ZOrderPruneRule), not the DSv1 row bridge
    val q153 = plans("q153_zorder_source_read")
    assert(q153.contains("PushedFilters") &&
      q153.contains("GreaterThanOrEqual(n_tok,30"),
      "q153's box filter must push into the graft-zorder scan")
    assert(q153.contains("FileScan parquet") &&
      !q153.contains("RowDataSourceScan"),
      "q153's scan must upgrade to the native parquet reader")
    for (q <- Seq("q122_asof_click_attribution", "q145_asof_forward",
        // q152/q156: the DECLARATIVE as-ofs (markers + AsofJoinRewriteRule)
        // must land the same join-free union-window shape
        "q152_asof_declarative", "q156_asof_nearest_declarative")) {
      val asof = plans(q)
      assert(!asof.contains("Join"), s"$q must be the union-window as-of")
      assert(asof.contains("Window"), s"$q lost the carrying window")
    }
    // q146: nearest = BOTH arms as frames over the same sort — still no
    // join in the as-of itself (the only join is none: the pick is pure
    // column logic over the two carried arms)
    val near = plans("q146_asof_nearest")
    assert(!near.contains("Join"),
      "q146 must compute both arms from one union, never a join")
    assert(near.contains("Window"), "q146 lost the arm windows")
  }

  test("q117 quantile store serve: a warm store serves from the saved " +
       "7-number state, never the corpus") {
    val plan = plans("q117_quantile_store_served")
    assert(plan.contains("graft_momstore_"),
      "q117 must read the persisted moments store")
    assert(!plan.contains("documents.parquet"),
      "q117 re-aggregated the corpus the saved state already summarizes")
    // serve path is group-grain scalar math: the only exchange allowed
    // is the final presentation sort (rangepartitioning) — any
    // hashpartitioning would mean a re-aggregation snuck in
    assert(!plan.contains("hashpartitioning"),
      "q117's serve path re-aggregated; the saved state is already at grain")
  }

  test("q149 dashboard store serve: all five sketch families read the " +
       "ONE saved bundle — no corpus scan, joins broadcast, no nested " +
       "loops") {
    val plan = plans("q149_sketch_dashboard_served")
    assert(plan.contains("graft_dash_"),
      "q149 must read the persisted dashboard store")
    assert(!plan.contains("documents.parquet"),
      "q149 re-derived state the dashboard store already holds")
    assert(plan.contains("BroadcastHashJoin"),
      "q149's group-grain joins must broadcast")
    // the only nested loop allowed is the bounded group-grain pair
    // enumeration (g1 < g2 over the source list), which must itself be
    // broadcast — never a shuffled cartesian
    assert(!plan.contains("CartesianProduct"),
      "q149 must never plan a shuffled cartesian")
  }

  test("q148 scd2 store serve: the version diff reads the SAVED history " +
       "parquet only — the corpus is never re-scanned") {
    val plan = plans("q148_scd2_store_served")
    assert(plan.contains("graft_scd2_"),
      "q148 must read the persisted scd2 history store")
    assert(!plan.contains("documents.parquet"),
      "q148 re-derived history the store already holds")
  }

  test("sketch family plans: bounded sides broadcast, partial aggregation " +
       "before every shuffle (q102-q110)") {
    // the sparse/dense decision (q107/q110) rides a BROADCAST of the
    // group-grain count table — a shuffle join here would re-shuffle the
    // (group, hash) table by group and put a hot group on one task
    for (q <- Seq("q107_hll_sparse_state", "q110_hll_sparse_estimates")) {
      assert(plans(q).contains("BroadcastHashJoin"),
        s"$q: the group-count decision join must broadcast")
      assert(!plans(q).contains("SortMergeJoin"),
        s"$q: a sort-merge join appeared in a bounded-side plan")
    }
    // q108's dashboard joins: hot-token set (<= vocab) and per-source
    // sketch rows broadcast onto the report grain; register/counter
    // builds partial-aggregate before their shuffles
    assert(plans("q108_sketch_dashboard").contains("BroadcastHashJoin"),
      "q108: sketch columns must broadcast onto the report grain")
    for (q <- Seq("q102_hll_registers", "q103_cm_heavy_hitters",
        "q108_sketch_dashboard")) {
      assert("HashAggregate".r.findAllIn(plans(q)).size >= 2,
        s"$q lost map-side partial aggregation")
    }
    // q109: the init admissions and the summary are TakeOrdered / bounded
    // aggregations — no window at all, no cartesian beyond the broadcast
    // centroid compare
    assert(!plans("q109_kmeans_farthest_init").contains("WindowExec"),
      "q109 must not rank through a window")
    // q116 unifies all three sketch families on the report grain: every
    // sketch side (HLL estimates, hot-token counts, moments quantiles)
    // is source-grain-bounded and must broadcast — no sort-merge join
    // anywhere in the dashboard
    assert(plans("q116_sketch_dashboard_quantiles")
        .contains("BroadcastHashJoin"),
      "q116: sketch columns must broadcast onto the report grain")
    assert(!plans("q116_sketch_dashboard_quantiles")
        .contains("SortMergeJoin"),
      "q116: a sort-merge join appeared in a bounded-side dashboard plan")
  }

  test("q111 bucketed co-located join: sort-merge join with NO shuffle " +
       "under it") {
    val smj = planned("q111_bucketed_colocated_join").collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, "q111 must plan a sort-merge join")
    val shuffles = smj.flatMap(_.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    })
    assert(shuffles.isEmpty,
      "bucketed join inputs re-shuffled — storage co-location was lost")
  }

  test("r11 additions: overlap-matrix pair/estimate sides broadcast; " +
       "funnel thresholds broadcast; z-order file stats keep partial agg") {
    // q123: the pair list and the single-estimate tables are group-grain
    // — every join around the register fan-out must broadcast them, and
    // nothing should fall back to a sort-merge join
    val q123 = plans("q123_source_overlap_matrix")
    assert("BroadcastHashJoin".r.findAllIn(q123).size >= 4,
      "q123 lost the broadcast joins on its group-grain sides")
    assert(!q123.contains("SortMergeJoin"),
      "q123 planned a sort-merge join over sketch-grain data")
    // q129: the per-step thresholds are USER-grain — the plan must not
    // nested-loop, and every join/aggregation keys on user_id so the
    // exchanges co-partition (Catalyst may still pick broadcast at
    // small SF; what matters is that nothing FORCES it at scale)
    val q129 = plans("q129_conversion_funnel")
    assert(!q129.contains("BroadcastNestedLoop"),
      "q129 funnel degenerated to a nested-loop join")
    assert("HashAggregate".r.findAllIn(q129).size >= 4,
      "q129 lost partial aggregation on the step thresholds")
    // q126: the rank is materialized behind the Positional localCheckpoint
    // (the global no-unpartitioned-window test covers the rank hazard);
    // what this plan must keep is map-side partial aggregation on the
    // file-stats pass over the checkpointed assignment
    assert("HashAggregate".r.findAllIn(plans("q126_zorder_layout")).size >= 2,
      "q126 file stats lost partial aggregation")
    // q140: the KMV build must be a PARTIAL object aggregation — the
    // bounded k-long buffers combine map-side before the shuffle (the
    // whole point of the custom Aggregator over a collect_set)
    val q140 = plans("q140_kmv_state")
    assert("ObjectHashAggregate".r.findAllIn(q140).size >= 2 ||
      "SortAggregate".r.findAllIn(q140).size >= 2,
      "q140 KMV aggregation lost its partial (map-side) phase")
  }
}
