"""Edge-case property pins for the round-11 generic library functions
(operators/aggregates.py, features.py): constructed frames where the
statistic's value is known in closed form — the boundary behavior the
fixture-bound oracle pins can't reach (perfect correlation, monopoly,
independence, perfect separability)."""

from __future__ import annotations

import math

from avro_parquet_spark_example_spark.operators.aggregates import (
    hhi_index,
    kendall_tau_b,
    mutual_information,
    spearman_rho,
)
from avro_parquet_spark_example_spark.operators.features import decision_stump


def _frame(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_rank_correlations_at_the_boundaries(spark):
    # perfectly monotone (with ties on neither axis): rho = tau = 1
    up = _frame(
        spark, [("g", i, i * 10) for i in range(1, 9)], "grp string, x int, y int"
    )
    assert spark is up.sparkSession
    r = spearman_rho(up, "x", "y", "grp").collect()[0]
    t = kendall_tau_b(up, "x", "y", "grp").collect()[0]
    assert (r.n, r.spearman_rho) == (8, 1.0)
    assert (t.n, t.kendall_tau_b) == (8, 1.0)
    # perfectly anti-monotone: -1
    down = _frame(
        spark, [("g", i, -i) for i in range(1, 9)], "grp string, x int, y int"
    )
    assert spearman_rho(down, "x", "y", "grp").collect()[0].spearman_rho == -1.0
    assert kendall_tau_b(down, "x", "y", "grp").collect()[0].kendall_tau_b == -1.0
    # heavy ties: all four quadrant cells equally filled -> 0 association
    flat_rows = [("g", x, y) for x in (0, 1) for y in (0, 1) for _ in range(5)]
    flat = _frame(spark, flat_rows, "grp string, x int, y int")
    assert abs(spearman_rho(flat, "x", "y", "grp").collect()[0].spearman_rho) < 1e-9
    assert abs(kendall_tau_b(flat, "x", "y", "grp").collect()[0].kendall_tau_b) < 1e-9


def test_hhi_at_the_boundaries(spark):
    # monopoly: one member holds everything -> HHI = 1
    mono = _frame(spark, [("m", 1, 1000)], "grp string, member int, cents long")
    row = hhi_index(mono, "grp", "cents").collect()[0]
    assert (row.n_members, row.hhi) == (1, 1.0)
    # k equal members -> HHI = 1/k (within the 1e-12 floor quantum)
    k = 8
    eq = _frame(
        spark,
        [("e", i, 500) for i in range(k)],
        "grp string, member int, cents long",
    )
    row = hhi_index(eq, "grp", "cents").collect()[0]
    assert row.n_members == k
    assert abs(row.hhi - 1 / k) < 1e-6


def test_mutual_information_at_the_boundaries(spark):
    # independent uniform 2x2 -> MI = 0
    indep_rows = [
        (1, str(x), str(y)) for x in (0, 1) for y in (0, 1) for _ in range(6)
    ]
    indep = _frame(spark, indep_rows, "seg int, x string, y string")
    assert abs(mutual_information(indep, "x", "y", "seg").collect()[0].mi_nats) < 1e-9
    # y == x (2 symbols, uniform) -> MI = H(X) = ln 2
    copy_rows = [(1, str(x), str(x)) for x in (0, 1) for _ in range(6)]
    copy = _frame(spark, copy_rows, "seg int, x string, y string")
    got = mutual_information(copy, "x", "y", "seg").collect()[0].mi_nats
    assert abs(got - round(math.log(2), 6)) < 1e-6


def test_decision_stump_perfect_separation(spark):
    # feature < 5 -> negative, >= 5 -> positive: splitting at 4 recovers
    # the full root entropy as gain and is marked best
    rows = [(float(v), v >= 5) for v in range(10) for _ in range(4)]
    vals = _frame(spark, rows, "v double, is_ref boolean")
    out = {r.threshold: r for r in decision_stump(vals).collect()}
    n, p = 40, 20
    h_root = -(0.5 * math.log(0.5) + 0.5 * math.log(0.5))
    best = [r for r in out.values() if r.is_best]
    assert len(best) == 1 and best[0].threshold == 4.0
    assert best[0].gain12 == math.floor(h_root * 1e12)
    # every non-separating candidate strictly underperforms
    assert all(
        r.gain12 < best[0].gain12 for r in out.values() if r.threshold != 4.0
    )


def test_cusum_constant_series_is_flat(spark):
    """A constant daily series has zero CUSUM excursion by definition —
    via the registered query's own fold machinery on a constructed grid
    (mu == every x, so every step clamps at 0)."""
    from pyspark.sql import functions as F

    daily = _frame(
        spark,
        [("t", f"2024-01-{d:02d}", 7) for d in range(1, 15)],
        "event_type string, day string, n long",
    ).select("event_type", F.col("day").cast("date").alias("day"), "n")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("CAST(sum(n) * 1000000 div count(*) AS BIGINT)").alias("mu6"),
    )
    grids = (
        daily.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("day", "n"))).alias("g"))
        .join(stats, "event_type")
    )
    folded = grids.withColumn(
        "out",
        F.expr(
            """
            aggregate(
                g,
                struct(CAST(0 AS BIGINT) AS cs, CAST(-1 AS BIGINT) AS best,
                       CAST(NULL AS DATE) AS bestday),
                (acc, x) -> struct(
                    GREATEST(CAST(0 AS BIGINT),
                             acc.cs + x.n * 1000000 - mu6) AS cs,
                    CASE WHEN GREATEST(CAST(0 AS BIGINT),
                                       acc.cs + x.n * 1000000 - mu6)
                              > acc.best
                         THEN GREATEST(CAST(0 AS BIGINT),
                                       acc.cs + x.n * 1000000 - mu6)
                         ELSE acc.best END AS best,
                    CASE WHEN GREATEST(CAST(0 AS BIGINT),
                                       acc.cs + x.n * 1000000 - mu6)
                              > acc.best
                         THEN x.day ELSE acc.bestday END AS bestday
                )
            )
            """
        ),
    ).collect()[0]
    assert folded["out"]["best"] == 0
    assert str(folded["out"]["bestday"]) == "2024-01-01"
