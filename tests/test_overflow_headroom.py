"""Overflow-headroom pins (SCALING.md §Round 12 audit, VERDICT r11 #2).

Every exact-arithmetic operator carries either a DECIMAL(38,0)/HUGEINT
moment accumulator (widened in r12) or a documented bound. These pins
measure the fixture's actual magnitudes with DuckDB (no Spark session —
they are arithmetic checks, not engine checks) and assert the bound
holds with a 10^4 row-scale margin, so a testdata regeneration or an
operator edit that erodes the headroom turns the suite red instead of
waiting for a cluster-scale ARITHMETIC_OVERFLOW.

Scale model per SCALING.md: corpus growth multiplies COUNTS (rows, daily
volumes, group sizes) but not per-entity VALUES (a customer's revenue, a
discount level) — each pin scales the dimension that actually grows.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
INT64_MAX = 2**63 - 1
DEC38_MAX = 10**38 - 1
SCALE = 10**4


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_kendall_pair_sums_fit_decimal38(con):
    """C/D ≤ n_group²/2 — the DECIMAL(38,0) accumulator must hold the
    10^4-scaled group (both factors are counts, so the sum scales ~10^8)."""
    [(n_max,)] = con.execute(
        "SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM lineitem "
        "GROUP BY l_returnflag)"
    ).fetchall()
    assert (n_max * SCALE) ** 2 // 2 < DEC38_MAX
    # and the bound that killed the OLD int64 form is genuinely inside
    # the 10^4 envelope — the widening was necessary, not cosmetic
    assert (n_max * SCALE) ** 2 // 2 > INT64_MAX or n_max < 10**5


def test_assortativity_moments_fit_decimal38(con):
    """Σ d_j·d_k ≤ 2m·d_max²; both m and d_max scale with the corpus."""
    [(m, d_max)] = con.execute(
        """
        WITH e AS (SELECT DISTINCT user_id AS u, event_type AS v
                   FROM events),
        d AS (SELECT node, COUNT(*) AS deg FROM (
              SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
              GROUP BY node)
        SELECT (SELECT COUNT(*) FROM e), MAX(deg) FROM d
        """
    ).fetchall()
    assert 2 * (m * SCALE) * (d_max * SCALE) ** 2 < DEC38_MAX


def test_daily_volume_squares_fit_decimal38(con):
    """xcorr/anova ΣX²: daily counts scale linearly with corpus rows;
    the day grid does not."""
    [(x_max, days)] = con.execute(
        "SELECT MAX(c), COUNT(*) FROM (SELECT COUNT(*) AS c FROM events "
        "GROUP BY event_type, CAST(ts AS DATE))"
    ).fetchall()
    assert (x_max * SCALE) ** 2 * days < DEC38_MAX


def test_confusion_marginal_squares_fit_decimal38(con):
    """kappa/MCC Σ t_k²: marginals scale with corpus rows."""
    [(n,)] = con.execute("SELECT COUNT(*) FROM embeddings").fetchall()
    # worst case: one class holds every row
    assert (n * SCALE) ** 2 < DEC38_MAX


def test_cramers_term_fits_decimal28_9(con):
    """per-cell (o−e)²/e ≤ n — 19 integer digits in DECIMAL(28,9)."""
    [(n,)] = con.execute("SELECT COUNT(*) FROM events").fetchall()
    assert n * SCALE < 10**19


def test_auc_rank_sum_fits_decimal38(con):
    """r2 ≤ 2n² + n; u_x2 ≤ n²/2 — DOUBLE output renders identically on
    both engines for any magnitude."""
    [(n,)] = con.execute("SELECT COUNT(*) FROM lineitem").fetchall()
    assert 2 * (n * SCALE) ** 2 + n * SCALE < DEC38_MAX


def test_pr_auc_ratio_quantization_is_term_bounded(con):
    """prec12 = floor(P·1e12) ≤ 1e12 by construction (P ≤ 1); the
    DECIMAL(38,0) sum holds 10^12 · n at any n the fixture implies."""
    [(n_pos,)] = con.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R'"
    ).fetchall()
    assert 10**12 * (n_pos * SCALE) < DEC38_MAX


def test_gini_rank_weighted_sum_fits_decimal38(con):
    """Σ i·cents ≤ n²·max_cents/… — customers scale with corpus, their
    individual revenue does not."""
    [(n, cents_max)] = con.execute(
        """
        SELECT COUNT(*), MAX(cents) FROM (
            SELECT o_custkey,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey)
        """
    ).fetchall()
    assert (n * SCALE) * (n * SCALE) * cents_max // 2 < DEC38_MAX


def test_theil_per_term_floor_fits_int64(con):
    """floor(cents·ln(cents)·1e6) is a PER-ENTITY term — it grows with a
    customer's revenue, not the corpus (more rows = more customers, not
    richer ones), so the scale factor here is 10² (a $60B customer on
    this fixture), not the 10⁴ row model. Note the term already exceeds
    2^53 at the FIXTURE: cross-engine determinism comes from both
    engines flooring the SAME double (one shared IEEE tree), not from
    sub-unit fixed-point precision — the binding cap is therefore
    floor's int64 RESULT type. The SUM is already DECIMAL(38,0)."""
    import math

    [(cents_max,)] = con.execute(
        """
        SELECT MAX(cents) FROM (
            SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY o_custkey)
        """
    ).fetchall()
    big = cents_max * 10**2
    assert big * math.log(big) * 1e6 < INT64_MAX


def test_hhi_group_sum_is_structurally_bounded():
    """Σ floor(share²·1e12) ≤ 1e12 for ANY group (Σ share² ≤ 1)."""
    assert 10**12 < INT64_MAX


def test_kurtosis_deviation_within_documented_bound(con):
    """|c| = |n·x − s1| must stay under BOTH the DECIMAL(10,0) cast cap
    and the sc4 38-digit cap (|c| ≤ (1e38/days)^0.25) at 10^4× — the
    documented limit of the exact fourth-moment design."""
    [(c_max, days)] = con.execute(
        """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
            FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s1
              FROM daily GROUP BY event_type)
        SELECT MAX(ABS(d.n * d.x - d.s1)), MAX(d.n) FROM (
            SELECT daily.x, s.n, s.s1 FROM daily JOIN s USING (event_type)
        ) d(x, n, s1)
        """
    ).fetchall()
    big_c = c_max * SCALE  # deviations scale with daily volume
    assert big_c < 10**10, "DECIMAL(10,0) cast cap"
    assert big_c**4 * days < DEC38_MAX, "sc4 38-digit cap"


def test_auc_bootstrap_ranksum_double_exactness_crossing(con):
    """AUC bootstrap (per-row AND cell form): the weighted rank sum
    2U = Σ wp(2·cumwn + wn) ≤ 2·WP·WN is exact DECIMAL(38,0), but the
    final division casts it to DOUBLE — exact only while 2U < 2^53.
    Pin the crossing WITH the measured replicate weight factor (the
    Poisson tails inflate per-class totals beyond the raw counts): if
    testdata's class split or the _POIS_T weight grid moves the
    crossing out of the documented ~10^8-total-rows band, this goes
    red.  The per-row form's _BOOT_MAX_ROWS validation cap must sit
    ≥10^3 inside the crossing; the cell form shares the same EMISSION
    bound (its corpus-size independence is about compute, not the
    final cast) and the largest tested SF must sit ≥10^2 inside."""
    import math

    from avro_parquet_spark_example_spark.operators.inference import (
        _BOOT_MAX_ROWS,
        _POIS_T,
    )

    [(np_, nn_)] = con.execute(
        "SELECT SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END), "
        "SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) FROM lineitem"
    ).fetchall()
    w_expr = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
    )
    # measured per-replicate weighted class totals on the fixture
    [(wp_max, wn_max)] = con.execute(
        f"""
        WITH base AS (
            SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
            FROM lineitem),
        d AS (
            SELECT g.r, b.pos,
                   CAST(('0x' || SUBSTR(MD5(CAST(b.id AS VARCHAR) || ':'
                        || CAST(g.r AS VARCHAR) || ':ab'), 1, 8))
                        AS BIGINT) AS u
            FROM base b,
                 (SELECT UNNEST(GENERATE_SERIES(1, 100)) AS r) g),
        reps AS (
            SELECT r,
                   SUM(CASE WHEN pos = 1 THEN {w_expr} ELSE 0 END) AS wp,
                   SUM(CASE WHEN pos = 0 THEN {w_expr} ELSE 0 END) AS wn
            FROM d GROUP BY r)
        SELECT MAX(wp), MAX(wn) FROM reps
        """
    ).fetchall()
    f_p, f_n = wp_max / np_, wn_max / nn_
    assert 0.9 < f_p < 1.2 and 0.9 < f_n < 1.2  # Poisson(1) tails are mild
    p = np_ / (np_ + nn_)
    q = 1.0 - p
    # 2·(p·N·f_p)·(q·N·f_n) = 2^53  ->  N_cross total rows
    n_cross = math.sqrt(2**53 / (2 * p * q * f_p * f_n))
    assert 1e8 < n_cross < 1e9, n_cross  # the documented crossing band
    # per-row validation scope: the cap (weight-inflated) is >=10^3 inside
    assert _BOOT_MAX_ROWS * max(f_p, f_n) * 1e3 < n_cross
    # cell form at the largest tested SF (sf0.1 ~ 100x this fixture):
    # >=10^2 margin before the emission bound
    assert (np_ + nn_) * 100 * 100 < n_cross


def test_delong_grid_moments_fit_decimal38(con):
    """DeLong q10 = Σ wp·t10² ≤ NP·(2·NN)² — the 10× leg caught this
    overflowing int64 when multiplied before the decimal cast (r13);
    the DECIMAL(38,0) accumulator must hold the 10^4-scaled corpus
    (all three factors are row counts)."""
    [(np_, nn_)] = con.execute(
        "SELECT SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END), "
        "SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) FROM lineitem"
    ).fetchall()
    big_q10 = (np_ * SCALE) * (2 * nn_ * SCALE) ** 2
    big_q01 = (nn_ * SCALE) * (2 * np_ * SCALE) ** 2
    assert max(big_q10, big_q01) < DEC38_MAX
    # and int64 genuinely crosses inside the envelope — the decimal
    # product was necessary, not cosmetic
    assert max(big_q10, big_q01) > INT64_MAX
