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
