"""Physical-plan red-flag audit — the rules a 100 TB deployment enforces
(README / SURVEY.md §4), shared by the ``tools/plan_audit.py`` CLI and the
``tests/test_plans.py`` full-registry sweep so no operator can silently
regress onto a scale-hostile plan:

  * CartesianProduct / BroadcastNestedLoopJoin outside the known bounded
    cases (pure theta joins on dims, broadcast query vectors);
  * row-at-a-time Python eval (BatchEvalPython) outside the declared
    slow-path demos;
  * window functions with no PARTITION BY (an ``Exchange SinglePartition``
    feeding a Window = every row through one task).

Every allowance is an explicit (query, reason) entry in :data:`EXPECTED` —
an audit finding is either justified there or it fails the sweep.
"""

from __future__ import annotations

import re

#: Queries allowed to carry each red-flag operator, with the reason.
EXPECTED: dict[str, dict[str, str]] = {
    "BroadcastNestedLoopJoin": {
        "join_theta": "pure non-equi theta on dims (bounded by design)",
        "join_cross": "cartesian demo on 5x5 dims",
        "simsearch_bruteforce_topk": "broadcast 1-row query vector",
        "simsearch_batch_topk": "broadcast 5-row query batch (batch-cardinality by design)",
        "simsearch_ivf_topk": "broadcast 1-row query vector",
        "simsearch_lsh_topk": "broadcast 1-row query vector",
        "neardup_embedding": "label-blocked pair join (non-equi id bound)",
        "fn_array_setops": "pair demo on 20 docs (id< theta join, bounded)",
        "neardup_levenshtein": "pair demo on 60 doc heads (id< theta join, bounded)",
        "tpch_q22": "broadcast 1-row scalar threshold (avg_bal) cross join",
        "tpch_q11_shape": "broadcast 1-row scalar threshold (region total) cross join",
        "text_unigram_logprob": "broadcast 1-row vocab-total cross join",
        "curation_dsir_importance": "broadcast 1-row raw/target-total cross joins",
        "mixture_temperature_resample": "broadcast 1-row corpus-total/weight-sum cross joins",
        "dq_drift_psi": "broadcast 1-row period-totals cross join",
        "dq_freshness_completeness": "broadcast 1-row global-freshness cross join",
        "simsearch_hamming_topk": "broadcast 1-row query vector+code",
        "simsearch_range_threshold": "broadcast 1-row query vector",
        "graph_modularity": "broadcast 1-row edge-total cross join",
        "vec_knn_graph": "capped 300-vector all-pairs demo (id<> theta join, bounded; at-scale candidates are IVF-cell-blocked)",
        "vec_cluster_silhouette": "capped 300-vector all-pairs demo (id<> theta join, bounded; at-scale silhouette runs on a sample)",
        "simsearch_matryoshka_topk": "broadcast 1-row query vector",
        "text_sparse_cosine_topk": "broadcast 1-row query-norm cross join",
        "text_bm25_topk": "broadcast 1-row corpus-stats cross join",
        "text_inverted_index": "broadcast 1-row corpus-size cross join (df-cap contract)",
        "dq_benford_digits": "broadcast 1-row digit-total cross join",
        "search_hybrid_rrf": "broadcast 1-row query vector/norm cross joins (tier inputs)",
        "search_rerank_stub": "broadcast 1-row query vector/norm cross joins (tier inputs)",
        "text_bigram_logprob": "broadcast 1-row vocab-size cross join",
        "eval_retrieval_metrics": "broadcast 5-row query batch (batch-cardinality by design)",
        "search_hard_negatives": "broadcast 5-row query batch (batch-cardinality by design)",
        "text_collocations_pmi": "broadcast 1-row token-total cross join",
        "curation_epoch_plan": "broadcast 1-row corpus-total cross join",
        "agg_share_of_total": "broadcast 1-row grand-total cross join",
        "ts_active_users_dau_wau": "broadcast day-grid band join (days-cardinality, ~30 rows)",
        "dedup_threshold_sweep": "broadcast 5-row threshold grid cross join",
        "eval_pass_at_k": "broadcast 3-row k-grid cross join (k-cardinality by design)",
        "eval_fleiss_kappa": "broadcast 1-row agreement/category-total cross join",
        "stat_jackknife_cluster": "broadcast 1-row grand-total / jackknife-mean cross joins",
        "stat_bh_fdr": "hypothesis-grid (m<=35 rows) lexicographic rank pair join + 1-row m/k-threshold/sampler-threshold cross joins",
        "stat_randomization_dow": "broadcast 1-row sampler-threshold cross join (validation-scope hash sample)",
        "stat_poisson_bootstrap_ci": "broadcast 1-row sampler-threshold cross join (validation-scope hash sample)",
        "stat_cuped_adjustment": "broadcast 1-row pre-period-cut cross join (MIN(ts)+15d boundary)",
        "stat_kendall_w": "judge x item grid cross join (m*n <= 35 rows, complete-block densification) + 1-row m/n/tie-total cross joins",
        "stat_group_sequential_obf": "broadcast 1-row pooled mu0/sigma cross join (the mSPRT shape)",
        "curation_length_buckets": "broadcast 1-row corpus-total cross join",
        "stat_msprt_sequential": "broadcast 1-row global mu0/sigma2 cross join",
        "eval_auc_bootstrap_ci": "replicate-grid (100-row) rank pair join + 1-row point/CI/sampler-threshold cross joins",
        "eval_auc_bootstrap_cell_ci": "replicate-grid (100-row) rank pair join + 1-row point/CI cross joins (cell-sufficiency form: grid algebra only after the one counting scan)",
        "eval_auc_delong_se": "value-grid (|grid|<=101 rows) cumulative pair join + 1-row totals cross join (the stat_bh_fdr no-global-window rule)",
        "eval_rbo_rankings": "depth-grid band join (k*k <= 2500 rows by construction: two top-k lists vs the 1..k depth grid)",
        "stat_krippendorff_alpha": "broadcast 1-row category-totals cross join (the fleiss_kappa shape)",
        "stat_equivalence_tost": "broadcast 1-row global-mean cross join",
        "vec_power_iteration_top_pc": "broadcast 1-row max-abs normalizer cross join per round",
        "vec_remove_top_component": "broadcast 1-row normalizer/64-row direction cross joins",
        "mixture_largest_remainder_quota": "broadcast domain-cardinality remainder-rank / 1-row total cross joins (<= |domains| rows)",
        "mine_association_pairs": "broadcast 1-row basket-total cross join",
        "text_keyness_llr": "broadcast 1-row corpus-totals cross join",
        "agg_chi_square_independence": "broadcast 1-row grand-total cross join",
        "agg_hll_intersection": "broadcast |types|-row sketch theta self-join",
        "ts_rfm_segments": "broadcast 1-row corpus-max-date cross join",
        "ts_seasonality_decompose": "broadcast 1-row grand-mean cross join",
        "mine_skyline_pareto": "dominance anti-join on local-skyline survivors (frontier-bounded, <= 32x per-group frontier)",
        "ts_max_concurrency": "broadcast day-grid band join for the cross-day carry (days-cardinality)",
        "ml_naive_bayes_model": "broadcast 1-row vocab-size cross join",
        "dq_referential_integrity": "broadcast 1-row orphan/childless count cross joins",
        "ts_anomaly_seasonal_residual": "broadcast 1-row median/MAD cross joins over the day grid",
        "dq_drift_jsd": "broadcast 1-row period-totals cross join (the dq_drift_psi plan verbatim)",
        "dq_drift_kl": "broadcast 1-row period-totals cross join (the dq_drift_psi plan verbatim)",
        "graph_hits_bipartite": "broadcast 1-row max normalizer cross join per half-round (r10: normalization is lazy on the checkpointed raw aggregate, so the final plan now SHOWS the cross joins the r9 eager-checkpoint shape hid behind LogicalRDD)",
        "vec_cluster_silhouette_sampled": "md5-sampled ~25% pool all-pairs (id<> theta join — the sample IS the bound; exact arithmetic shared with the capped demo)",
        "eval_cohens_kappa": "broadcast 1-row chance-agreement cross join",
        "ml_decision_stump": "broadcast 1-row argmax (best-split) cross join",
        "ts_lead_lag_xcorr": "broadcast 7-row lag-grid cross join",
        "ts_autocorr_acf": "broadcast 8-row lag-grid cross join",
        "text_log_odds_monroe": "broadcast 1-row corpus-totals cross join",
        "agg_cramers_v": "broadcast 1-row contingency-totals cross join",
        "eval_mcc_multiclass": "broadcast 1-row marginal-moments cross join",
        "agg_hodges_lehmann_shift": "domain-grid histogram convolution + cumulative theta self-join (<=|Vx|*|Vy| cells) + 1-row total/count cross joins",
        "stat_jonckheere_terpstra": "broadcast 7-row weekday-grid densification cross join (complete-grid requirement, the kendall_w shape)",
        "stat_mood_median": "bucket-grid exclusive-offset theta join (<=|value-domain|/256 rows) + 1-row pooled-median/total/chi2 cross joins (two-phase bucketed prefix sum)",
        "agg_lorenz_curve_bucketed": "bucket-grid exclusive-offset theta join (<=64^2 rows per event_type) — the partitioned two-phase rank that REPLACES the per-type full-population sort",
        "agg_equidepth_histogram_bucketed": "bucket-grid exclusive-offset theta join (<=64^2 rows per event_type) — the partitioned two-phase NTILE that REPLACES the registry's last row-scale per-type sort window",
        "stat_by_fdr": "hypothesis-grid (m<=35 rows) lexicographic rank pair join + 1-row m/k-threshold/sampler-threshold cross joins (the stat_bh_fdr plan verbatim)",
        "eval_auc_partial": "score-grid (|grid|<=101 rows) descending-cumulative pair join + 1-row totals cross join (the eval_auc_delong_se shape)",
        "surv_kaplan_meier": "broadcast 1-row corpus-max-date cross join (censoring boundary, the ts_rfm_segments shape)",
        "surv_nelson_aalen": "broadcast 1-row corpus-max-date cross join (censoring boundary — the surv_kaplan_meier subject frame verbatim)",
        "surv_rmst": "broadcast 1-row corpus-max-date cross join (censoring boundary — the surv_kaplan_meier subject frame verbatim)",
        "surv_logrank_test": "broadcast 1-row corpus-max-date cross join + 2-row cohort-grid densification cross join (pooled-time risk grid)",
    },
    "CartesianProduct": {},
    "BatchEvalPython": {
        "udf_python_scalar": "declared slow-path demo (bounded to 100 docs)",
        "udtf_python": "Python UDTF — Python eval is the operator itself",
    },
}


def _tree_indent(line: str) -> int:
    """Depth marker of an operator-tree line: column of its '+-'/':-'
    connector (-1 for the root operator)."""
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def window_over_single_partition(plan: str) -> bool:
    """True iff some Window operator's DIRECT INPUT is a SinglePartition
    Exchange — i.e. the window itself pulls every row into one task (a
    global, unpartitioned window over unbounded input: the real hazard).

    The walk follows the window's first-child spine through pass-through
    operators (Sort/Project/Filter) only. Scanning the WHOLE subtree is
    wrong: any bounded 1-row global aggregate (a corpus total, the df-cap
    corpus size) plans its own final-agg SinglePartition exchange deep in
    the input tree, and a window fed by a TakeOrderedAndProject (already
    one K-row partition, so Spark inserts NO exchange for it) would be
    falsely flagged for containing one. The tree rendering carries only
    operator names + ids; the partitioning argument lives in the
    per-operator detail block, so ids are joined against the details."""
    blocks = plan.split("\n\n")
    tree = blocks[0].splitlines()
    # ids of Exchange operators whose own detail block says SinglePartition
    single_ids = set()
    for block in blocks[1:]:
        m = re.match(r"\((\d+)\) Exchange", block.strip())
        if m and "SinglePartition" in block:
            single_ids.add(m.group(1))
    if not single_ids:
        return False
    # Unary operators Spark can place between a Window and its input
    # exchange without changing the partitioning: Sort/Project/Filter,
    # WindowGroupLimit (rank-limit pushdown inserts a per-partition limit
    # below the Window), and AQEShuffleRead (adaptive re-read wraps the
    # exchange it reads — the SinglePartition exchange is its child, one
    # level deeper on the same spine). Missing entries UNDER-flag: the
    # walk stops at an unknown node and a genuine global window hides
    # behind it (ADVICE r7).
    passthrough = re.compile(
        r"\b(Sort|Project|Filter|WindowGroupLimit|AQEShuffleRead)\b"
    )
    for i, line in enumerate(tree):
        if not re.search(r"\bWindow", line):
            continue
        depth = _tree_indent(line)
        # walk the first-child spine: consecutive lines one level deeper,
        # skipping pass-through operators
        j = i + 1
        while j < len(tree) and tree[j].strip():
            d = _tree_indent(tree[j])
            if d <= depth:
                break
            node = tree[j]
            if passthrough.search(node):
                depth = d
                j += 1
                continue
            m = re.search(r"\bExchange.*\((\d+)\)\s*$", node)
            if m and m.group(1) in single_ids:
                return True
            break
    return False


def audit_plan(name: str, plan: str) -> tuple[list[str], list[str]]:
    """Audit one query's formatted physical plan.

    Returns ``(expected, unexpected)`` flag descriptions: ``expected``
    are allow-listed findings (with their justification), ``unexpected``
    are violations that should fail a sweep."""
    expected: list[str] = []
    unexpected: list[str] = []
    for op, allowed in EXPECTED.items():
        if op in plan:
            if name in allowed:
                expected.append(f"{op} (expected: {allowed[name]})")
            else:
                unexpected.append(f"{op} UNEXPECTED")
    if window_over_single_partition(plan):
        unexpected.append("Window over Exchange SinglePartition UNEXPECTED")
    return expected, unexpected
