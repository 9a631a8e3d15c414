"""Inference/eval statistics (operators/inference.py) vs independent
Python references + closed-form boundary pins (the r11/r12 test model)."""

from __future__ import annotations

import math
from collections import Counter

from avro_parquet_spark_example_spark.registry import get_query


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").collect()


# --------------------------------------------------------------------------
# pass@k
# --------------------------------------------------------------------------


def _pass_at_k_ref(n: int, c: int, k: int) -> float:
    """math.comb reference: 1 - C(n-c, k)/C(n, k)."""
    if n - c < k:
        return 1.0
    return 1.0 - math.comb(n - c, k) / math.comb(n, k)


def test_pass_at_k_matches_comb_reference(spark, sf_dir):
    per: dict[int, list[float]] = {}
    stats: Counter = Counter()
    npass: Counter = Counter()
    for r in _events(spark, sf_dir):
        stats[r.user_id] += 1
        if r.value > 50:
            npass[r.user_id] += 1
    for k in (1, 5, 10):
        per[k] = [
            round(_pass_at_k_ref(stats[u], npass[u], k), 9)
            for u in stats
            if stats[u] >= k
        ]
    rows = {
        r.k: r for r in get_query("eval_pass_at_k").fn(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 5, 10}
    for k, vals in per.items():
        assert rows[k].n_problems == len(vals)
        assert abs(rows[k].mean_pass - sum(vals) / len(vals)) < 1e-6, k


def test_pass_at_k_closed_form_boundaries():
    # all samples pass -> pass@k = 1; none pass -> 0; c=1,k=1 -> 1/n.
    assert _pass_at_k_ref(10, 10, 5) == 1.0
    assert _pass_at_k_ref(10, 0, 5) == 0.0
    assert abs(_pass_at_k_ref(10, 1, 1) - 0.1) < 1e-12
    # monotone in k: more attempts can only help.
    assert _pass_at_k_ref(20, 3, 10) >= _pass_at_k_ref(20, 3, 5)


# --------------------------------------------------------------------------
# Fleiss' kappa
# --------------------------------------------------------------------------


def _fleiss_ref(items: list[list[str]]) -> tuple[float, float, float]:
    """Textbook Fleiss 1971 on a list of per-item rating lists."""
    n = len(items[0])
    big_n = len(items)
    cats = sorted({c for it in items for c in it})
    p_i = []
    totals = Counter()
    for it in items:
        cnt = Counter(it)
        totals.update(cnt)
        p_i.append(
            (sum(v * v for v in cnt.values()) - n) / (n * (n - 1))
        )
    p_bar = sum(p_i) / big_n
    p_e = sum((totals[c] / (big_n * n)) ** 2 for c in cats)
    return p_bar, p_e, (p_bar - p_e) / (1 - p_e)


def test_fleiss_kappa_matches_python_reference(spark, sf_dir):
    by_user: dict[int, list] = {}
    for r in _events(spark, sf_dir):
        by_user.setdefault(r.user_id, []).append(r)
    items = []
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        items.append([r.event_type for r in rs[:5]])
    p_bar, p_e, kappa = _fleiss_ref(items)
    row = get_query("eval_fleiss_kappa").fn(spark, sf_dir).collect()[0]
    assert row.n_items == len(items)
    assert row.n_raters == 5
    assert abs(row.p_bar - p_bar) < 1e-6
    assert abs(row.p_e - p_e) < 1e-6
    assert abs(row.kappa - kappa) < 1e-6


def test_fleiss_closed_form_boundaries():
    # perfect agreement -> kappa = 1 regardless of category mix.
    _, _, k1 = _fleiss_ref([["a"] * 5, ["b"] * 5, ["a"] * 5])
    assert abs(k1 - 1.0) < 1e-12
    # Fleiss 1971 worked example invariant: kappa < p_bar always when
    # agreement is imperfect and chance agreement positive.
    p_bar, p_e, k2 = _fleiss_ref(
        [["a", "a", "a", "b", "b"], ["b", "b", "a", "a", "a"]]
    )
    assert 0 < p_e < 1 and k2 < p_bar


# --------------------------------------------------------------------------
# delete-one-cluster jackknife
# --------------------------------------------------------------------------


def test_jackknife_cluster_matches_python_reference(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    per: dict[int, list[float]] = {}
    for o in orders:
        per.setdefault(cust[o.o_custkey], []).append(float(o.o_totalprice))
    g = len(per)
    tot_s = sum(sum(v) for v in per.values())
    tot_n = sum(len(v) for v in per.values())
    theta = [
        (tot_s - sum(v)) / (tot_n - len(v)) for v in per.values()
    ]
    m = sum(theta) / g
    se = math.sqrt((g - 1) / g * sum((t - m) ** 2 for t in theta))
    row = get_query("stat_jackknife_cluster").fn(spark, sf_dir).collect()[0]
    assert row.n_clusters == g
    assert abs(row.theta_hat - tot_s / tot_n) < 1e-4
    assert abs(row.jackknife_se - se) < 1e-4


def test_jackknife_zero_variance_closed_form():
    # identical clusters -> every LOO estimate equals the mean -> SE 0.
    per = {0: [10.0, 10.0], 1: [10.0, 10.0], 2: [10.0, 10.0]}
    tot_s = sum(sum(v) for v in per.values())
    tot_n = sum(len(v) for v in per.values())
    theta = [(tot_s - sum(v)) / (tot_n - len(v)) for v in per.values()]
    m = sum(theta) / len(per)
    se = math.sqrt(2 / 3 * sum((t - m) ** 2 for t in theta))
    assert se == 0.0
