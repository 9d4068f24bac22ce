package graft

/** Fleet-wide plan hygiene: no query may silently acquire a cartesian
  * product or an unplanned broadcast-nested-loop join. The whitelisted
  * BNL sites are deliberate, structurally-bounded broadcasts; anything
  * new showing up here is a plan regression (a lost equi-key, a dropped
  * broadcast hint, a join condition that stopped being an equi-join).
  */
class PlanHygieneSpec extends SparkSpecBase {

  /** Deliberate broadcast-nested-loop joins, each with a bounded build side:
    *  - q20: scalar-subquery result (1 row) broadcast;
    *  - q30: 5-interval dimension broadcast (documented range-join shape);
    *  - q48: deliberate 5×25 dimension cross join;
    *  - sim_cosine_topk: 10 query vectors broadcast with a non-equi
    *    (qid != cid) condition;
    *  - sim_ann_ivf: the k×dim fixed-point centroid table broadcast to
    *    rank cells per query (KBs by construction);
    *  - text_tfidf: 1-row corpus-count broadcast;
    *  - q55_merge_upsert: 1-row max-key bound broadcast to the inserts;
    *  - sim_kmeans_step: the k×dim centroid table broadcast so every
    *    vector scores its k distances scan-side;
    *  - q21_approx_ndv: 1-row HLL-sketch frame broadcast onto the 1-row
    *    exact-NDV frame (the two passes are split on purpose — see the
    *    q21 comment on the HLL-buffer × Expand interaction);
    *  - events_drift_chi2: the ≤|types|-row type-margin table and the
    *    1-row grand total cross-broadcast to build the zero-filled
    *    contingency grid;
    *  - q60_skew_probe / q61_approx_pctl_bound: a 1-row total/sketch
    *    frame broadcast back onto the per-key counts / the scan;
    *  - text_mix_temperature: the 1-row corpus-total frame broadcast
    *    onto the |domains|-row weight table to derive thresholds.
    */
  private val bnlAllowed = Set(
    "q20_scalar_subquery", "q30_range_join", "q48_cross_join",
    "sim_cosine_topk", "sim_ann_ivf", "sim_ann_ivf_seeded", "sim_ann_recall",
    "sim_ann_ivf_cached", // same probe core over the reloaded index
    // append lifecycle: the frozen k×dim quantizer broadcast twice —
    // the maintenance batch's argmin assignment and the probe's cell
    // ranking (both the whitelisted sim_ann_ivf shape)
    "sim_ann_ivf_append",
    // filtered ANN: the probe's centroid broadcast twice (pre-filter +
    // post-filter strategies) plus the exact side's 10-query broadcast
    // with the non-equi qid != cid condition (cosineTopK's shape);
    // index health: the frozen quantizer broadcast for assignment and
    // the per-member distance scan, plus the 1-row total frame (q60)
    "sim_ann_filtered", "sim_ann_index_health",
    // hot-cell split: 1-row hot/max frames and 1-row seed-vector frames
    // broadcast onto the single cell's members (three bounded scans)
    "sim_ann_ivf_split",
    "sim_ann_ivf_recall", // composes annIvfSeeded + cosineTopK — same bounded broadcasts
    "sim_ann_nprobe_curve", // three annIvfRecall points — same composition
    // IVF-PQ: the k×dim centroid table and nSub×K codebook broadcast to
    // rank cells / train codes (KBs by construction); the recall twin
    // additionally broadcasts the nQueries-row query side for the exact
    // fixed-point L2 baseline (non-equi qid != cid condition)
    "sim_ann_ivfpq", "sim_ann_ivfpq_recall",
    // PQ maintenance lifecycle: the frozen k×dim quantizer broadcast for
    // the appended batch's argmin assignment and the probe's cell
    // ranking, plus the frozen nSub×K codebook broadcast for the
    // residual encodes and the ADC table (all sim_ann_ivfpq's shapes)
    "sim_ann_pq_append", "sim_ann_pq_health",
    // pq retrain: the probe tail's quantizer/codebook broadcasts (the
    // sim_ann_ivfpq shapes) twice — pre- and post-swap — plus two 1-row
    // frames: the corpus-wide flagged-share (outlier denominator) and
    // the n_retrained count pinned onto the graded probe rows
    "sim_ann_pq_retrain",
    // coarse re-center: ivfProbe's whitelisted centroid broadcast twice
    // (pre-/post-swap quantizers) plus three 1-row frames pinned onto
    // the graded rows (worst cell, mean d2 before/after)
    "sim_ann_ivf_recenter",
    // sim_ann_pq_split is NOT listed although its seed picks crossJoin
    // broadcast 1-row frames: the split assignment localCheckpoints
    // eagerly (sim_kmeans3's precedent), so the RETURNED plan starts
    // from the checkpointed cell assignment and its encodes are all
    // equi-joins on subspace/cell.
    // matryoshka recall: two cosineTopK passes (truncated + full), each
    // the whitelisted 10-query broadcast with the non-equi qid != cid
    "sim_matryoshka_recall",
    "text_tfidf",
    "q55_merge_upsert", "sim_kmeans_step", "q21_approx_ndv",
    // rfm: the 1-row corpus-max-date frame broadcast onto the
    // per-customer aggregate (q55's max-key-bound shape)
    "q71_rfm",
    // silhouette: sim_kmeans_step's shape — the k×dim centroid table
    // broadcast so every vector scores its k distances scan-side
    "sim_silhouette",
    "q67_hll_intersection", // 1-row HLL frame broadcast onto the 1-row exact side (q21's split-agg shape)
    "events_drift_chi2", "q60_skew_probe", "q61_approx_pctl_bound",
    "text_mix_temperature",
    // dsir: the 1-row smoothing-constant frame broadcast onto the
    // per-doc sums (same shape as text_tfidf's corpus count);
    // ccnet terciles: the 1-row corpus-count frame broadcast onto the
    // ranked docs for the rank→tercile arithmetic;
    // pmi: the 1-row unigram/bigram total frames broadcast for the
    // probability denominators
    "text_dsir_sample", "text_ccnet_terciles", "text_pmi_collocations",
    // hist topk: the 10-query histogram side broadcast with the
    // non-equi qid != cid condition (cosineTopK's shape)
    "multimodal_hist_topk",
    // corpus overlap: the 1-row sketch-match frame broadcast onto the
    // 1-row exact-Jaccard side (q21/q67's split-agg shape)
    "dedup_corpus_overlap",
    // ewma monitor: the 1-row (min_h, max_h) range frame broadcast onto
    // the per-type grid before the zero-fill explode;
    // holt trend: the identical range-frame broadcast (ewma's sibling);
    // cluster split: the 1-row cross-pair count broadcast onto the
    // 3-row per-split census (the construction's zero-leak assertion)
    "events_ewma_monitor", "events_holt_trend", "dedup_cluster_split",
    // shapley attribution: the ≤16-row mask table broadcast twice over
    // the 16-subset lattice (⊆-join and the S|bit lookup) — the entire
    // post-aggregate stage is arithmetic on a bounded lattice
    "events_attribution_shapley",
    // heatmap / stickiness: the 1-row corpus-total (resp. day-bounds)
    // frame broadcast onto the tiny cell/anchor grid (q60's shape);
    // lift / vocab coverage: the 1-row total frame plus the O(distinct
    // logits/counts) offset grid (and coverage's 3-row checkpoint
    // list) broadcast for the distributed global rank
    "events_heatmap", "events_stickiness", "text_classifier_lift",
    "text_vocab_coverage",
    // quality calibrate: classifier_lift's distributed-global-rank shape
    // (1-row total broadcast onto the ranked docs)
    "text_quality_calibrate",
    // t-closeness: the ≤|langs|-row global distribution broadcast onto
    // the bounded class table
    "text_t_closeness",
    // cuped: the 1-row window-bound frame onto the scan and the 1-row
    // pooled-moment frame onto the 2-row arm table (aa_test's shape);
    // did / sequential test: the same 1-row window-bound frame onto the scan
    "events_cuped", "events_did", "events_sequential_test",
    // abc pareto / share-of-parent: the 1-row total-revenue frame
    // broadcast onto the per-part prefix rows / nation grid (q60's shape)
    "q79_abc_pareto", "q82_share_of_parent", "q108_abc_xyz",
    // top paths: the 1-row trigram-total frame broadcast onto the
    // ≤|types|³ path counts (q60's shape)
    "events_top_paths",
    // neyman: two 1-row frames (weight total, leftover budget)
    // broadcast onto the 5-row allocation grid
    "events_neyman_sample",
    // repurchase curve: the 5-row horizon list broadcast onto the gaps;
    // degree dist / power users: the 1-row node/user-total frame (q60)
    // (q87_degree_dist left this list in r16: the node-total crossJoin
    // folded into a window over the ≤64-row histogram)
    "q84_repurchase_curve", "events_power_users",
    // peak load: the 1-row peak frame broadcast onto the hour curve;
    // aa test: the two 1-row arm frames joined
    "events_peak_load", "events_aa_test", "events_user_features",
    // burstiness: the 1-row corpus-size frame broadcast onto the
    // per-word aggregate; drift: the 1-row id-split frame onto the scan
    "text_burstiness", "text_stopword_candidates", "sim_embedding_drift",
    // jl projection: the 1-row packed sign-matrix frame broadcast onto
    // the corpus scan (the kmeans_step centroid-table shape)
    "sim_jl_project",
    // cluster sizes: the 1-row doc-total frame broadcast onto the size grid;
    // bfs reach: the 1-row corpus-total and reached-count frames broadcast
    // onto the ≤6-row distance census
    "dedup_cluster_sizes", "dedup_bfs_reach",
    // nn ratio: cosineTopK's 10-query broadcast; bot score: the 1-row
    // median frame broadcast onto the per-user scores
    "sim_nn_ratio", "events_bot_score",
    // token budget: two 1-row planning frames (totals, leftover)
    // broadcast onto the |sources|-row allocation (events_neyman's shape);
    // heaps law: the 1-row (lo, span) bounds frame broadcast for the
    // arithmetic bucket assignment
    "text_token_budget", "text_heaps_law",
    // coreset: farthestPointSeeds' packed-seed broadcast per selection
    // round plus the ≤nCenters-row seed table for the assignment scan
    // (sim_ann_ivf_seeded's shape); threshold curve: the 6-row tau grid
    // and 1-row corpus-total broadcast onto the bare id-pair list
    "sim_coreset_kcenter", "sim_dedup_threshold_curve",
    // changepoint: the 1-row (s_tot, n_tot) frame broadcast onto the
    // calendar-bounded daily series; aspect buckets: the 7-row ratio
    // ladder broadcast for the scan-side argmin assignment
    "events_changepoint", "multimodal_aspect_buckets",
    // graph recall: the exact baseline is cosineTopK's whitelisted
    // shape — the nQueries-row query side broadcast with the non-equi
    // qid != cid condition
    "sim_ann_graph_recall",
    // alert debounce: events_ewma_monitor's 1-row hour-range frame
    // broadcast onto the per-type grid; budget apply: the planning
    // CTEs' two 1-row frames (text_token_budget's shape) inside the
    // broadcast plan join
    "events_alert_debounce", "text_token_budget_apply",
    // bm25: the 1-row (avgdl, N) corpus frame broadcast onto the 8-row
    // term table for the idf (text_tfidf's corpus-count shape); the ndcg
    // harness adds the 1-row dcg/idcg/count frames joined at the end
    "text_bm25_topk", "text_bm25_ndcg",
    // conformal: the 1-row calibration-count and radius frames broadcast
    // onto the bounded residual grid / the test-side aggregate
    "text_conformal",
    // discount lift: the 1-row zero-discount baseline frame broadcast
    // onto the ≤11-row discount-band table (q71_rfm's 1-row-baseline shape)
    "q102_discount_lift",
    // ses backtest: events_ewma_monitor's 1-row (lo, hi) day-range frame
    // broadcast onto the per-type grid before the zero-fill explode
    // (page-hinkley shares the identical grid)
    "events_ses_backtest", "events_dispersion", "events_forecast_tourney",
    "events_page_hinkley",
    // holt-winters: the 1-row (lo, hi) day-range frame broadcast onto
    // the per-type grid before the zero-fill explode. (acf/ccf left this
    // list in r16: their centered series is staged, so the returned plan
    // starts from the checkpoint — the grid's bounded crossJoins live in
    // the staging job, the pq_split precedent. events_mwu likewise: its
    // count table stages inside PrefixSum and the tail is pure
    // aggregates.)
    "events_holt_winters",
    // ks test: the 1-row totals frame broadcast onto the cumulated
    // per-cent-value counts (events_changepoint's shape)
    "events_ks_test",
    // rrf fusion: the semantic leg is cosineTopK's whitelisted shape —
    // the 1-row exemplar query broadcast with the non-equi qid != cid
    // condition (the lexical leg and the fusion itself join equi)
    "sim_rrf_fusion",
    // binary rerank: the 10-query code/embedding table broadcast with
    // the non-equi qid != cid condition (cosineTopK's shape)
    "sim_binary_rerank",
    // gains curve: the counting-rank ntile's 1-row n frame plus the
    // 1-row (total revenue, population) frame broadcast onto the
    // 10-row decile grid (q79's total-broadcast shape)
    "q112_gains_curve",
    // croston: events_ses_backtest's 1-row (lo, hi) month-range frame
    // broadcast onto the per-part grid before the zero-fill explode
    "q114_croston",
    // bootstrap CI: the 1-row replicate-count and point-estimate frames
    // broadcast onto the ≤64-row means grid (q112's bounded-grid shape)
    "events_bootstrap_ci",
    // theil: the 1-row corpus-moments frame broadcast onto the 25-row
    // nation grid (q79's total-broadcast shape)
    "q116_theil")
  // sim_multiprobe_recall is NOT listed although its exact baseline
  // crossJoins a broadcast 200-vector prefix: the three counts resolve
  // driver-side, so the RETURNED frame is a LocalRelation with no join
  // in its plan (the staleness check would flag a dead entry).
  // sim_kmeans3 is NOT listed although each round broadcasts its
  // centroid table: the loop's eager per-round localCheckpoint truncates
  // lineage, so the final executed plan starts from the checkpointed
  // assignment and shows no join at all.

  test("every graded query has an oracle (no silent rows-only entries)") {
    // round 7 closed the last rows-only gaps; this keeps them closed — a
    // new queries() entry without a DuckDB twin fails here, not in the
    // driver's weaker rows-only lane
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${(q -- o).toSeq.sorted}; " +
      s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("every oracle CTE is MATERIALIZED after assembly (ADVICE r14: case-insensitive rewrite, no silent re-inflation)") {
    // DuckDB 1.0 inlines CTEs per reference; one unrewritten `as (select`
    // re-inflates the unrolled-replay oracles exponentially (measured
    // 46.7 s -> 0.3 s on text_bpe_learn). The assembled map must carry
    // zero pre-rewrite CTE patterns, whatever the author's casing.
    val leftovers = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      SparkEntry.unmaterializedCte(sql).map(m => s"$name: '$m'")
    }
    assert(leftovers.isEmpty,
      s"oracles with unmaterialized CTEs: ${leftovers.mkString("; ")}")
  }

  test("no cartesian products; broadcast-nested-loop only where deliberate") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sf()).queryExecution.executedPlan.toString
      val bad = Seq(
        Option.when(p.contains("CartesianProduct"))(s"$name: CartesianProduct"),
        Option.when(p.contains("BroadcastNestedLoopJoin") && !bnlAllowed(name))(
          s"$name: unexpected BroadcastNestedLoopJoin")).flatten
      bad
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("corpus-proportional carries plan no unpartitioned window (VERDICT r12 item 4)") {
    // these queries' prefix carries run over chunk-total tables that
    // GROW with the corpus (corpus/1024 rows — ~10⁸ at 100 TB); their
    // plans must never declare an all-to-one WindowExec. Bounded-grid
    // windows elsewhere (day calendars, brand tables) are exempt by
    // construction and not listed here.
    for (q <- Seq("multimodal_shard_pack", "multimodal_pad_waste",
        "events_late_arrivals", "q71_rfm", "q90_skyline")) {
      val df = SparkEntry.queries(q)(spark, sf())
      val wins = PrefixSumSpec.windows(df.queryExecution.executedPlan)
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$q plans an unpartitioned WindowExec")
    }
  }

  /** Queries whose plans carry an unpartitioned WindowExec, each with the
    * argument for WHY the frame is bounded at any corpus size (VERDICT
    * r13 item 3: boundedness must be an asserted invariant, not a
    * docstring — a genuinely corpus-proportional window added later must
    * fail the suite, not hide in the WARN noise).
    */
  private val unpartitionedWindowAllowed: Map[String, String] = Map(
    "dedup_jaccard_hist" -> "21-row jaccard-bucket grid (floor(j*20))",
    "dedup_sorted_neighborhood" -> ("distinct 6-char-prefix bucket-offset " +
      "table - orders below corpus, the documented deliberate serial step"),
    "events_bootstrap_ci" -> "<=64-row replicate-means grid",
    "events_bot_score" -> "bucketQuantiles' value-bounded quantile bucket grid",
    "events_changepoint" -> "calendar-bounded daily series",
    "events_cumulative_reach" -> "calendar day grid",
    "events_cumulative_users" -> "calendar day grid",
    "events_kaplan_meier" -> ("distinct-duration risk table, bounded by the " +
      "observation window in hours"),
    "events_neyman_sample" -> "5-row stratum allocation grid",
    "events_peak_load" -> "calendar hour grid",
    "events_power_users" -> "distinct-activity-count offset grid (Zipf head)",
    "events_slo_burn" -> "calendar hour grid",
    "events_sweepline" -> "calendar hour grid (boundary-event hours only)",
    "multimodal_phash_hist" -> "<=65-row Hamming-distance histogram",
    "q101_seasonal_index" -> "<=12-row month grid",
    "q108_abc_xyz" -> "value-bounded revenue-bucket/class grid",
    "q112_gains_curve" -> "10-row decile grid",
    "q79_abc_pareto" -> "O(hundreds)-row revenue-bucket grid (rev div 1e7)",
    "q87_degree_dist" -> "<=64-row log2-degree histogram (node total fold)",
    "q83_gini" -> "O(hundreds)-row revenue-bucket grid (x div 1e7)",
    "q97_backlog_curve" -> "calendar day grid",
    "q99_wilson_rank" -> "<=|brands| table (25 on the fixture schema)",
    "sim_rrf_fusion" -> "limit(20)/limit(10) fused candidate frames",
    "text_bm25_ndcg" -> "<=k-row ranked list (limit frame)",
    "text_bm25_topk" -> "<=k-row ranked list (limit frame)",
    "text_ccnet_terciles" -> "distinct-count offset grid (rank->tercile cut)",
    "text_classifier_lift" -> ("distinct-logit lattice - sums of +/-4-bounded " +
      "weights, O(hundreds) at any corpus size"),
    "text_conformal" -> "value-bounded calibration residual grid",
    "text_heaps_law" -> "log-spaced checkpoint bucket grid",
    "text_quality_calibrate" -> "distinct-logit lattice (classifier_lift's)",
    "text_t_closeness" -> "<=|langs| class table",
    "text_vocab_coverage" -> "distinct-count offset grid + 3-row checkpoints")

  test("unpartitioned windows only over value-bounded grids (VERDICT r13 item 3)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val wins = PrefixSumSpec.windows(
          fn(spark, sf()).queryExecution.executedPlan)
        Option.when(wins.exists(_.partitionSpec.isEmpty))(name)
    }.toSet
    val unlisted = offenders -- unpartitionedWindowAllowed.keySet
    val stale = unpartitionedWindowAllowed.keySet -- offenders
    assert(unlisted.isEmpty,
      s"queries planning an UNLISTED unpartitioned WindowExec (add with a " +
        s"boundedness argument or repartition the carry): ${unlisted.toSeq.sorted}")
    assert(stale.isEmpty,
      s"whitelist entries without an unpartitioned window (remove them): " +
        s"${stale.toSeq.sorted}")
  }

  test("whitelisted BNL sites still plan as broadcasts (whitelist not stale)") {
    val stale = bnlAllowed.filterNot { name =>
      SparkEntry.queries(name)(spark, sf())
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"whitelist entries without BNL (remove them): $stale")
  }
}
