"""Round-10 metric additions: Python ground-truth references for the
exact Theil index, exact PR AUC (average precision), and the JSD drift
terms — the FIXTURES.md model (oracle pins cross-engine equality; these
pin the MATH against an independent plain-Python recompute)."""

from __future__ import annotations

import math

from avro_parquet_spark_example_spark.registry import get_query


def test_theil_matches_python_reference(spark, sf_dir):
    row = get_query("agg_theil_index").fn(spark, sf_dir).collect()[0]
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    per: dict[int, int] = {}
    for r in o:
        per[r.o_custkey] = per.get(r.o_custkey, 0) + int(
            round(r.o_totalprice * 100)
        )
    xs = list(per.values())
    n, sx = len(xs), sum(xs)
    assert (row.n, row.total_cents) == (n, sx)
    # reference mirrors the engine's 6-digit fixed-point x·ln x dsum
    xlx6 = sum(math.floor(x * math.log(x) * 1e6) for x in xs)
    theil = (xlx6 / 1e6) / sx + math.log(n) - math.log(sx)
    assert abs(row.theil_t - round(theil, 6)) < 1e-9
    # Theil T of a non-degenerate distribution: 0 < T <= ln(n)
    assert 0.0 < row.theil_t <= math.log(n)
    # cross-check against the unquantized definition (quantization noise
    # is ~1e-6/sx per row — invisible at 4 decimals)
    mu = sx / n
    t_exact = sum((x / sx) * math.log(x / mu) for x in xs)
    assert abs(row.theil_t - t_exact) < 1e-4


def test_pr_auc_matches_python_reference(spark, sf_dir):
    row = get_query("eval_pr_auc_exact").fn(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    pairs = [
        (int(round(r.l_discount * 100)), r.l_returnflag == "R") for r in li
    ]
    n_pos = sum(1 for _, p in pairs if p)
    n_neg = len(pairs) - n_pos
    assert (row.n_pos, row.n_neg) == (n_pos, n_neg)
    # step-wise AP over distinct-score thresholds, descending
    by_v: dict[int, list[int]] = {}
    for v, p in pairs:
        c = by_v.setdefault(v, [0, 0])
        c[0 if p else 1] += 1
    tp = pp = 0
    ap_sum12 = 0
    for v in sorted(by_v, reverse=True):
        cp, cn = by_v[v]
        tp += cp
        pp += cp + cn
        # r12: the engine quantizes the precision RATIO (≤1) to 12
        # digits and scales by the exact count — overflow-safe at any
        # corpus size (see eval_pr_auc_exact docstring)
        ap_sum12 += cp * math.floor(tp / pp * 1e12)
    assert row.ap_sum12 == ap_sum12
    ap = ap_sum12 / 1e12 / n_pos
    assert abs(row.avg_precision - round(ap, 6)) < 1e-9
    # AP of a weak-signal score sits between the positive base rate
    # (random ranking) and 1; ROC AUC near 0.5 implies AP near base rate
    base = n_pos / (n_pos + n_neg)
    assert base * 0.5 < row.avg_precision <= 1.0


def test_jsd_terms_match_python_and_bound(spark, sf_dir):
    rows = get_query("dq_drift_jsd").fn(spark, sf_dir).collect()
    assert sorted(r.bucket for r in rows) == list(range(10))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    ref = [0] * 10
    cur = [0] * 10
    import datetime

    split = datetime.datetime(1997, 1, 1)
    for r in o:
        b = min(int(r.o_totalprice // 50000), 9)
        ts = r.o_orderdate
        if isinstance(ts, datetime.datetime):
            is_ref = ts.replace(tzinfo=None) < split
        else:
            is_ref = ts < split.date()
        (ref if is_ref else cur)[b] += 1
    n_ref, n_cur = sum(ref), sum(cur)
    total = 0.0
    for r in rows:
        assert (ref[r.bucket], cur[r.bucket]) == (r.c_ref, r.c_cur)
        p = (r.c_ref + 1.0) / (n_ref + 10)
        q = (r.c_cur + 1.0) / (n_cur + 10)
        m = (p + q) / 2
        term = 0.5 * (p * math.log2(p / m) + q * math.log2(q / m))
        assert abs(r.jsd_term - round(term, 9)) < 1e-12
        total += r.jsd_term
    # base-2 JSD of (sub-)distributions is bounded by 1 and non-negative
    # up to smoothing mass truncation
    assert -1e-9 <= total <= 1.0


def test_personalized_pagerank_seed_properties(spark, sf_dir):
    """Seeds carry the restart mass (final rank >= 0.15 exactly — the
    damped update adds 0.15 to a seed every round), every ranked node is
    reachable (positive rank only), the frontier is a subset of the
    graph's nodes, and the run is deterministic."""
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.graph import (
        PPR_SEEDS,
        cooccurrence_edges,
    )

    rows = (
        get_query("graph_personalized_pagerank").fn(spark, sf_dir).collect()
    )
    got = {r.node: r.rank for r in rows}
    e = cooccurrence_edges(spark, sf_dir)
    nodes = sorted(
        r.n
        for r in e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .distinct()
        .collect()
    )
    seeds = nodes[:PPR_SEEDS]
    for s in seeds:
        assert got.get(s, 0) >= 0.15, (s, got.get(s))
    assert all(v > 0 for v in got.values())
    assert set(got) <= set(nodes)
    rows2 = (
        get_query("graph_personalized_pagerank").fn(spark, sf_dir).collect()
    )
    assert {r.node: r.rank for r in rows2} == got


def test_holt_winters_matches_python_reference(spark, sf_dir):
    """The fixed-point Holt-Winters recursion (level/trend/seasonal-queue,
    alpha=beta=gamma=1/4, sign-safe truncating /4) recomputed in plain
    Python from the raw daily grid must match the engine bit-for-bit."""
    from collections import defaultdict

    from avro_parquet_spark_example_spark.operators.timeseries import (
        _HOLT_S,
        _HW_M,
    )

    rows = get_query("ts_holt_winters").fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily: dict[str, dict] = defaultdict(lambda: defaultdict(int))
    for r in ev:
        daily[r.event_type][r.ts.date()] += 1

    def sdiv4(x: int) -> int:
        return x // 4 if x >= 0 else -((-x) // 4)

    want = {}
    for et, days in daily.items():
        grid = sorted(days.items())
        if len(grid) <= _HW_M:
            continue
        ys = [n * _HOLT_S for _, n in grid[:_HW_M]]
        lvl = sum(ys) // _HW_M
        trd = 0
        season = [y - lvl for y in ys]
        for day, n in grid[_HW_M:]:
            shat = season[0]
            lvl_t = sdiv4(n * _HOLT_S - shat + 3 * (lvl + trd))
            trd_t = sdiv4(lvl_t - lvl + 3 * trd)
            sea_t = sdiv4(n * _HOLT_S - lvl_t + 3 * shat)
            want[(et, day)] = (n, lvl_t, trd_t, sea_t)
            season = season[1:] + [sea_t]
            lvl, trd = lvl_t, trd_t
    assert len(rows) == len(want)
    for r in rows:
        assert want[(r.event_type, r.day)] == (
            r.n,
            r.level_micro,
            r.trend_micro,
            r.season_micro,
        ), (r.event_type, r.day)


def test_top2_pcs_orthogonal_and_consistent(spark, sf_dir):
    """PC1 equals the standalone power-iteration query bit-for-bit; the
    two emitted directions are near-orthogonal (|cos| small — the
    per-round 9dp quantization bounds the residual) and non-degenerate."""
    import math

    rows = get_query("vec_top2_pcs").fn(spark, sf_dir).collect()
    v1 = {r.pos: float(r.direction) for r in rows if r.pc == 1}
    v2 = {r.pos: float(r.direction) for r in rows if r.pc == 2}
    assert len(v1) == 64 and len(v2) == 64
    standalone = {
        r.pos: float(r.direction)
        for r in get_query("vec_power_iteration_top_pc")
        .fn(spark, sf_dir)
        .collect()
    }
    assert v1 == standalone
    dot = sum(v1[j] * v2[j] for j in v1)
    n1 = math.sqrt(sum(x * x for x in v1.values()))
    n2 = math.sqrt(sum(x * x for x in v2.values()))
    assert n2 > 1e-6  # non-degenerate second direction
    assert abs(dot / (n1 * n2)) < 1e-3, dot / (n1 * n2)
