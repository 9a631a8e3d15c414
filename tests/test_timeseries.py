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


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile's two-phase rank + closed-form remainder rule must equal
    Spark's own NTILE over a true global window on every adversarial shape:
    heavy ties, skewed value ranges, n not divisible by k, and n < k."""
    from pyspark.sql import Window

    from avro_parquet_spark_example_spark.operators.timeseries import (
        global_ntile,
    )

    cases = [
        [(i, float(v)) for i, v in enumerate([5, 5, 5, 5, 1, 2, 2, 9, 9, 3, 7])],
        [(i, 42.0) for i in range(13)],  # all-equal: one bucket, pure tiebreak
        [(i, float(i**3)) for i in range(29)],  # skewed range
        [(0, 1.0), (1, 2.0), (2, 3.0)],  # n < k
    ]
    for k in (4, 5):
        for rows in cases:
            df = spark.createDataFrame(rows, "id int, v double")
            for desc in (False, True):
                got = {
                    r.id: r.tile
                    for r in global_ntile(
                        df, "v", k, "id", "tile", descending=desc
                    ).collect()
                }
                order = (F.col("v").desc() if desc else F.col("v").asc(), F.col("id"))
                want = {
                    r.id: r.t
                    for r in df.select(
                        "id", F.ntile(k).over(Window.orderBy(*order)).alias("t")
                    ).collect()
                }
                assert got == want, (k, desc, rows[:4], got, want)


def test_global_ntiles_fused_equals_sequential(spark):
    """The fused multi-metric global_ntiles (2 driver round-trips total,
    ADVICE r9) assigns the identical tiles the sequential single-metric
    calls did — per metric, per direction."""
    from avro_parquet_spark_example_spark.operators.timeseries import (
        global_ntile,
        global_ntiles,
    )

    rows = [
        (i, float(v), float((v * 7) % 13))
        for i, v in enumerate([5, 5, 1, 2, 9, 3, 7, 11, 4, 6, 8, 0, 2])
    ]
    df = spark.createDataFrame(rows, "id int, a double, b double")
    fused = global_ntiles(
        df,
        [("a", 4, "id", "qa", False), ("b", 5, "id", "qb", True)],
    )
    seq = global_ntile(df, "a", 4, "id", "qa")
    seq = global_ntile(seq, "b", 5, "id", "qb", descending=True)
    assert sorted(
        (r.id, r.qa, r.qb) for r in fused.collect()
    ) == sorted((r.id, r.qa, r.qb) for r in seq.collect())


def test_global_ntile_null_metric_raises(spark):
    """ADVICE r9: a NULL metric value must fail loudly, not be silently
    dropped by the bucket-offsets join (the oracle's single-sequence
    window would have ranked it)."""
    import pytest

    from avro_parquet_spark_example_spark.operators.timeseries import (
        global_ntile,
    )

    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0)], "id int, v double"
    )
    with pytest.raises(ValueError, match="NULL"):
        global_ntile(df, "v", 2, "id", "tile")


def test_rfm_quintile_population_balance(spark, sf_dir):
    """Each RFM dimension's quintile populations differ by at most 1 and
    sum to the customer count; quintile 1 really is the best tier."""
    rows = get_query("ts_rfm_segments").fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for dim, metric, best_is_min in (
        ("r_q", "recency_days", True),
        ("f_q", "frequency", False),
        ("m_q", "monetary", False),
    ):
        sizes: dict[int, int] = {}
        for r in rows:
            sizes[r[dim]] = sizes.get(r[dim], 0) + 1
        assert sum(sizes.values()) == n
        assert max(sizes.values()) - min(sizes.values()) <= 1, (dim, sizes)
        tier1 = [r[metric] for r in rows if r[dim] == 1]
        tier5 = [r[metric] for r in rows if r[dim] == max(sizes)]
        if best_is_min:
            assert max(tier1) <= min(tier5)
        else:
            assert min(tier1) >= max(tier5)


# ---------------------------------------------------------------------------
# ts_max_concurrency


def test_max_concurrency_matches_python_sweep(spark, sf_dir):
    """Per-day peaks equal a straight Python sessionize + sweep-line —
    validating the two-phase (within-day + carry) decomposition against
    the single-sequence definition."""
    from avro_parquet_spark_example_spark.operators.timeseries import (
        CONC_GAP_US,
    )

    got = {
        str(r.day): (r.n_boundaries, r.peak_concurrency)
        for r in get_query("ts_max_concurrency").fn(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user: dict[int, list[int]] = {}
    for e in ev:
        us = e.ts if isinstance(e.ts, int) else int(e.ts.timestamp() * 1e6)
        us = us // 1000 if isinstance(e.ts, int) else us  # raw nanos → µs
        per_user.setdefault(e.user_id, []).append(us)
    deltas: dict[int, int] = {}
    for times in per_user.values():
        times.sort()
        start = times[0]
        prev = times[0]
        for t in times[1:]:
            if t - prev > CONC_GAP_US:
                deltas[start] = deltas.get(start, 0) + 1
                deltas[prev + 1] = deltas.get(prev + 1, 0) - 1
                start = t
            prev = t
        deltas[start] = deltas.get(start, 0) + 1
        deltas[prev + 1] = deltas.get(prev + 1, 0) - 1
    active = 0
    want: dict[str, list[int]] = {}
    from datetime import datetime, timezone

    for t in sorted(deltas):
        active += deltas[t]
        day = datetime.fromtimestamp(t / 1e6, tz=timezone.utc).date()
        want.setdefault(str(day), []).append(active)
    assert got == {
        d: (len(v), max(v)) for d, v in want.items()
    }


def test_max_concurrency_conservation(spark, sf_dir):
    """Every visit opens and closes: summing all net deltas is zero, so
    the final running value is zero and peaks are non-negative."""
    rows = get_query("ts_max_concurrency").fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a close-only day can legitimately bottom out at 0 active
        assert r.peak_concurrency >= 0


# ---------------------------------------------------------------------------
# ts_holt_linear


def test_holt_linear_matches_python_recursion(spark, sf_dir):
    """Level/trend replay exactly in Python integer arithmetic (trunc-
    toward-zero /4), per event type over the sorted day grid."""
    rows = get_query("ts_holt_linear").fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily: dict[tuple, int] = {}
    for e in ev:
        daily[(e.event_type, e.ts.date())] = (
            daily.get((e.event_type, e.ts.date()), 0) + 1
        )
    grids: dict[str, list] = {}
    for (t, d), n in daily.items():
        grids.setdefault(t, []).append((d, n))

    def sdiv4(v: int) -> int:
        return v // 4 if v >= 0 else -((-v) // 4)

    want = {}
    for t, g in grids.items():
        g.sort()
        l = g[0][1] * 1_000_000
        b = 0
        want[(t, g[0][0])] = (g[0][1], l, 0)
        for d, n in g[1:]:
            nl = sdiv4(n * 1_000_000 + 3 * (l + b))
            b = sdiv4(nl - l + 3 * b)
            l = nl
            want[(t, d)] = (n, l, b)
    got = {
        (r.event_type, r.day): (r.n, r.level_micro, r.trend_micro)
        for r in rows
    }
    assert got == want
    # the recursion genuinely exercises negative-trend division
    assert any(tr < 0 for _, _, tr in want.values())
