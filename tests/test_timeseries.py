"""Time-series operator invariants that go beyond the oracle hash: the
EWMA closed form must equal the sequential recursion EXACTLY (dyadic α),
transition counts must conserve events, pattern runs must be genuinely
increasing."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import get_query


def test_ewma_equals_sequential_recursion(spark, sf_dir):
    """The distributed closed form (2^n·y_n as an integer running sum) is
    EXACTLY the recursion y_i = x_i/2 + y_{i−1}/2, y_1 = x_1 — dyadic
    arithmetic means equality is ==, not approx."""
    rows = get_query("ts_ewma").fn(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for series in by_type.values():
        y = None
        for r in series:
            y = float(r.n) if y is None else r.n / 2 + y / 2
            assert r.ewma == y, (r.event_type, r.day, r.ewma, y)


def test_transition_matrix_conserves_events(spark, sf_dir):
    """Σ transition counts == total events − distinct users (each user's
    sequence of length L yields exactly L−1 transitions), and each
    prev_type's probabilities sum to 1."""
    rows = get_query("ts_transition_matrix").fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-6, (prev, total)


def test_pattern_runs_are_strictly_increasing(spark, sf_dir):
    """Every emitted run really is ≥3 days and ends above where it
    started (strict increases compound), and runs never overlap within a
    user (maximality of the gaps-and-islands numbering)."""
    rows = get_query("ts_pattern_runs").fn(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.run_len >= 3
        # runs are over consecutive OBSERVATIONS (a user may skip days),
        # so the calendar span is at least, not exactly, run_len − 1
        assert (r.run_end - r.run_start).days >= r.run_len - 1
        assert r.end_close > r.start_close, r
        by_user.setdefault(r.user_id, []).append(r)
    for runs in by_user.values():
        runs.sort(key=lambda r: r.run_start)
        for a, b in zip(runs, runs[1:]):
            assert a.run_end < b.run_start


def test_benford_counts_conserve(spark, sf_dir):
    """Digit counts partition the positive values; expectations sum to
    the same total (Benford probabilities sum to 1)."""
    rows = get_query("dq_benford_digits").fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_pos = ev.filter(F.col("value") > 0).count()
    assert sum(r.n_obs for r in rows) == n_pos
    assert abs(sum(r.expected for r in rows) - n_pos) < 0.01
    assert sorted(r.digit for r in rows) == list(range(1, 10))
