"""Association-mining invariants beyond the oracle hash: the reported
ratios must be algebraically consistent with the integer counts, the pair
space must be canonical (a < b, no duplicates), and lift must equal the
observed/expected ratio reconstructable from raw baskets."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.mining import MIN_PAIR_SUPPORT
from avro_parquet_spark_example_spark.registry import get_query


def _baskets(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", F.to_date("ts").alias("day"), "event_type")
        .distinct()
    )


def test_pairs_canonical_and_thresholded(spark, sf_dir):
    rows = get_query("mine_association_pairs").fn(spark, sf_dir).collect()
    assert rows, "fixture has co-occurring event types"
    seen = set()
    for r in rows:
        assert r.item_a < r.item_b, "pair must be canonical (a < b)"
        assert (r.item_a, r.item_b) not in seen, "duplicate pair"
        seen.add((r.item_a, r.item_b))
        assert r.pair_n >= MIN_PAIR_SUPPORT


def test_ratios_consistent_with_recounted_baskets(spark, sf_dir):
    """support / confidences / lift re-derive (±1e-6 for the 6dp rounding)
    from independently recounted basket sets — catching any drift between
    the broadcast count joins and the raw data."""
    rows = get_query("mine_association_pairs").fn(spark, sf_dir).collect()
    b = _baskets(spark, sf_dir).collect()
    basket_items: dict[tuple, set] = {}
    for r in b:
        basket_items.setdefault((r.user_id, r.day), set()).add(r.event_type)
    n_baskets = len(basket_items)
    item_n: dict[str, int] = {}
    for items in basket_items.values():
        for it in items:
            item_n[it] = item_n.get(it, 0) + 1
    for r in rows:
        both = sum(
            1
            for items in basket_items.values()
            if r.item_a in items and r.item_b in items
        )
        assert r.pair_n == both, (r.item_a, r.item_b)
        assert abs(r.support - both / n_baskets) < 1e-6
        assert abs(r.conf_a_to_b - both / item_n[r.item_a]) < 1e-6
        assert abs(r.conf_b_to_a - both / item_n[r.item_b]) < 1e-6
        expect = item_n[r.item_a] * item_n[r.item_b] / n_baskets
        assert abs(r.lift - both / expect) < 1e-6


def test_confidence_dominates_support(spark, sf_dir):
    """conf(A→B) ≥ support(A,B) always (item baskets ⊆ all baskets)."""
    for r in get_query("mine_association_pairs").fn(spark, sf_dir).collect():
        assert r.conf_a_to_b >= r.support - 1e-9
        assert r.conf_b_to_a >= r.support - 1e-9


def test_sequence_trigrams_recount(spark, sf_dir):
    """Top trigram counts re-derive from a pure-Python replay of each
    user's (ts, event_id)-ordered timeline, and the report is genuinely
    the top-20 (no higher-count path is missing)."""
    from avro_parquet_spark_example_spark.operators.mining import TOP_PATHS
    from avro_parquet_spark_example_spark.registry import get_query

    rows = get_query("mine_sequence_trigrams").fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for e in sorted(ev, key=lambda e: (e.user_id, e.ts, e.event_id)):
        seqs.setdefault(e.user_id, []).append(e.event_type)
    counts: dict[tuple, int] = {}
    for s in seqs.values():
        for i in range(len(s) - 2):
            t = (s[i], s[i + 1], s[i + 2])
            counts[t] = counts.get(t, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    want = ranked[: min(TOP_PATHS, len(ranked))]
    got = [((r.t1, r.t2, r.t3), r.n) for r in rows]
    assert got == want


def test_chi_square_matches_python_reference(spark, sf_dir):
    """chi2 re-derives (±1e-4) from a recounted contingency table; dof is
    (rows−1)(cols−1)."""
    from avro_parquet_spark_example_spark.registry import get_query

    row = get_query("agg_chi_square_independence").fn(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cells: dict[tuple, int] = {}
    for e in ev:
        # engine uses Spark dayofweek (1=Sunday); any consistent bucketing
        # yields the same table, so weekday() is fine for the recount
        key = (e.event_type, e.ts.weekday())
        cells[key] = cells.get(key, 0) + 1
    rt: dict[str, int] = {}
    ct: dict[int, int] = {}
    for (t, d), o in cells.items():
        rt[t] = rt.get(t, 0) + o
        ct[d] = ct.get(d, 0) + o
    n = sum(cells.values())
    chi2 = sum(
        (o - rt[t] * ct[d] / n) ** 2 / (rt[t] * ct[d] / n)
        for (t, d), o in cells.items()
    )
    assert abs(row.chi2 - chi2) < 1e-4, (row.chi2, chi2)
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)


# ---------------------------------------------------------------------------
# mine_skyline_pareto


def test_skyline_matches_bruteforce(spark, sf_dir):
    """The distributed (local-prune + global-refine) skyline equals the
    O(n^2) brute-force dominance check on the raw parts."""
    got = {
        (r.p_partkey, r.price_cents, r.size)
        for r in get_query("mine_skyline_pareto").fn(spark, sf_dir).collect()
    }
    parts = [
        (r.p_partkey, int(round(r.p_retailprice * 100)), int(r.p_size))
        for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    ]
    pairs = {(c, s) for _, c, s in parts}

    def dominated(c, s):
        return any(
            qc <= c and qs >= s and (qc < c or qs > s) for qc, qs in pairs
        )

    want = {(k, c, s) for k, c, s in parts if not dominated(c, s)}
    assert got == want


def test_skyline_members_mutually_nondominating(spark, sf_dir):
    rows = get_query("mine_skyline_pareto").fn(spark, sf_dir).collect()
    assert rows, "frontier is never empty on non-empty input"
    pts = [(r.price_cents, r.size) for r in rows]
    for c, s in pts:
        for qc, qs in pts:
            assert not (qc <= c and qs >= s and (qc < c or qs > s)), (
                "skyline members must not dominate each other",
                (c, s),
                (qc, qs),
            )


def test_skyline_hot_group_stays_frontier_bounded(spark):
    """Adversarial distribution: all points on one anti-chain (every point
    Pareto-optimal) plus dominated noise — the local prune may keep the
    whole anti-chain (correctness requires it), and the refine must still
    return exactly the anti-chain."""
    n = 300
    # true anti-chain: size rises with price, so no point dominates another
    frontier = [(i, i) for i in range(n)]
    # (i+1, i) is dominated by frontier point (i+1, i+1) (same price, bigger)
    noise = [(i + 1, i) for i in range(n - 1)]
    df = spark.createDataFrame(
        [(k, float(c) / 100, s) for k, (c, s) in enumerate(frontier + noise)],
        "p_partkey long, p_retailprice double, p_size long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/part.parquet")
        rows = get_query("mine_skyline_pareto").fn(spark, d).collect()
    got = {(r.price_cents, r.size) for r in rows}
    assert got == set(frontier)


# ---------------------------------------------------------------------------
# mine_itemset_triples


def test_triples_downward_closure_and_recount(spark, sf_dir):
    """Every emitted triple matches a Python basket recount, and each of
    its three sub-pairs is at least as frequent (Apriori downward
    closure)."""
    from avro_parquet_spark_example_spark.operators.mining import (
        MIN_TRIPLE_SUPPORT,
    )

    got = {
        (r.item_a, r.item_b, r.item_c): r.triple_n
        for r in get_query("mine_itemset_triples").fn(spark, sf_dir).collect()
    }
    b = _baskets(spark, sf_dir).collect()
    items: dict[tuple, set] = {}
    for r in b:
        items.setdefault((r.user_id, r.day), set()).add(r.event_type)
    triple_n: dict[tuple, int] = {}
    pair_n: dict[tuple, int] = {}
    from itertools import combinations

    for s in items.values():
        for t in combinations(sorted(s), 3):
            triple_n[t] = triple_n.get(t, 0) + 1
        for p in combinations(sorted(s), 2):
            pair_n[p] = pair_n.get(p, 0) + 1
    want = {
        t: n for t, n in triple_n.items() if n >= MIN_TRIPLE_SUPPORT
    }
    assert got == want
    assert got, "fixture produces frequent triples"
    for (a, b_, c), n in got.items():
        for p in ((a, b_), (a, c), (b_, c)):
            assert pair_n[p] >= n


# ---------------------------------------------------------------------------
# basket_items cap (mega-basket skew defense)


def _hot_basket_events(spark):
    """One user-day basket with 200 distinct items + two normal baskets."""
    from datetime import datetime

    rows = [
        (i, datetime(2024, 1, 1, 10, 0, i % 60), 1, f"item_{i:03d}")
        for i in range(200)
    ]
    rows += [
        (1000, datetime(2024, 1, 2, 10, 0, 0), 2, "a"),
        (1001, datetime(2024, 1, 2, 10, 0, 1), 2, "b"),
        (1002, datetime(2024, 1, 2, 10, 0, 2), 3, "a"),
        (1003, datetime(2024, 1, 2, 10, 0, 3), 3, "b"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_basket_cap_drop_excludes_only_the_hot_basket(spark):
    from avro_parquet_spark_example_spark.operators.mining import (
        basket_items,
        oversized_baskets,
    )

    ev = _hot_basket_events(spark)
    capped = basket_items(ev, max_items_per_basket=64, on_oversized="drop")
    rows = capped.collect()
    assert len(rows) == 4  # the 200-item basket is gone, both pairs remain
    assert {r.user_id for r in rows} == {2, 3}
    over = oversized_baskets(
        basket_items(ev, max_items_per_basket=None), max_items=64
    ).collect()
    assert [(o.user_id, o.n_items) for o in over] == [(1, 200)]


def test_basket_cap_error_raises_on_hot_basket(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from avro_parquet_spark_example_spark.operators.mining import basket_items

    ev = _hot_basket_events(spark)
    with pytest.raises(SparkRuntimeException, match="max_items_per_basket"):
        basket_items(ev, max_items_per_basket=64, on_oversized="error").collect()
    # and an adequate cap passes exactly (uncapped row identity)
    ok = basket_items(ev, max_items_per_basket=256, on_oversized="error")
    assert ok.count() == 204


def test_basket_cap_validates_mode(spark):
    import pytest

    from avro_parquet_spark_example_spark.operators.mining import basket_items

    with pytest.raises(ValueError, match="drop|error"):
        basket_items(
            _hot_basket_events(spark),
            max_items_per_basket=None,
            on_oversized="bogus",
        )


def test_utility_pairs_recount(spark, sf_dir):
    """Pair utilities re-derive from raw events (basket-item utility sums
    in exact cents)."""
    from avro_parquet_spark_example_spark.operators.mining import (
        MIN_PAIR_UTILITY_CENTS,
    )

    got = {
        (r.item_a, r.item_b): (r.pair_n, r.utility_cents)
        for r in get_query("mine_utility_pairs").fn(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    util: dict[tuple, int] = {}
    for e in ev:
        k = (e.user_id, e.ts.date(), e.event_type)
        util[k] = util.get(k, 0) + int(round(e.value * 100))
    baskets: dict[tuple, dict] = {}
    for (u, d, t), v in util.items():
        baskets.setdefault((u, d), {})[t] = v
    want: dict[tuple, list] = {}
    from itertools import combinations

    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            n, s = want.get((a, b), (0, 0))
            want[(a, b)] = (n + 1, s + items[a] + items[b])
    want = {
        k: v for k, v in want.items() if v[1] >= MIN_PAIR_UTILITY_CENTS
    }
    assert got == want and got
