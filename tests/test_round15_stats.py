"""Round-15 statistics (Nelson–Aalen, RMST, Cramér–von Mises,
Cochran–Armitage, Hosmer–Lemeshow) vs independent Python references +
closed-form boundary pins + facade parity — the r11..r14 test model."""

from __future__ import annotations

import math

import pytest

from avro_parquet_spark_example_spark.registry import get_query


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").collect()


def _q(v) -> int:
    return int(math.floor(v * 100.0 + 0.5))


def _is_weekend(ts) -> bool:
    return ts.isoweekday() in (6, 7)


def _durations(spark, sf_dir):
    per: dict[int, list] = {}
    dmax = None
    for r in _events(spark, sf_dir):
        d = r.ts.date()
        dmax = d if dmax is None or d > dmax else dmax
        lo, hi = per.get(r.user_id, (d, d))
        per[r.user_id] = (min(lo, d), max(hi, d))
    out = []
    for uid, (d0, d1) in per.items():
        grp = "treatment" if uid % 2 == 0 else "control"
        if (dmax - d1).days >= 1:
            out.append((uid, grp, (d1 - d0).days, 1))
        else:
            out.append((uid, grp, (dmax - d0).days, 0))
    return out


# --------------------------------------------------------------------------
# Nelson–Aalen
# --------------------------------------------------------------------------


def test_nelson_aalen_matches_python_reference(spark, sf_dir):
    subj = _durations(spark, sf_dir)
    got = {
        (r.grp, r.t): r
        for r in get_query("surv_nelson_aalen").fn(spark, sf_dir).collect()
    }
    for grp in ("treatment", "control"):
        rows = [(t, ev) for _, g, t, ev in subj if g == grp]
        times = sorted({t for t, _ in rows})
        hsum = vsum = 0.0
        for t in times:
            n_risk = sum(1 for tt, _ in rows if tt >= t)
            d = sum(1 for tt, ev in rows if tt == t and ev == 1)
            if d > 0:
                hsum += round(d / n_risk, 9)
                vsum += round(d / (n_risk * n_risk), 9)
            row = got[(grp, t)]
            assert row.n_risk == n_risk and row.n_event == d
            assert abs(row.cum_hazard - round(hsum, 6)) < 1e-9
            assert abs(row.var_hazard - round(vsum, 6)) < 1e-9
        # NA invariants: H non-decreasing; H >= -ln(S_KM) pointwise
        hs = [got[(grp, t)].cum_hazard for t in times]
        assert all(a <= b + 1e-12 for a, b in zip(hs, hs[1:]))


def test_nelson_aalen_closed_form(spark):
    # 3 subjects, deaths at t=1,2,3, no censoring:
    # H(1)=1/3, H(2)=1/3+1/2, H(3)=1/3+1/2+1
    from avro_parquet_spark_example_spark.operators.survival import (
        nelson_aalen,
    )

    subj = spark.createDataFrame(
        [(1, "g", 1, 1), (2, "g", 2, 1), (3, "g", 3, 1)],
        "user_id int, grp string, t bigint, ev int",
    )
    h = {r.t: r.cum_hazard for r in nelson_aalen(subj).collect()}
    assert h[1] == pytest.approx(round(1 / 3, 6), abs=1e-9)
    assert h[2] == pytest.approx(round(round(1 / 3, 9) + 0.5, 6), abs=1e-9)
    assert h[3] == pytest.approx(
        round(round(1 / 3, 9) + 0.5 + 1.0, 6), abs=1e-9
    )


# --------------------------------------------------------------------------
# RMST
# --------------------------------------------------------------------------


def _km_curve(rows):
    """[(t, S(t))] for one cohort via the operator's rounding grid."""
    times = sorted({t for t, _ in rows})
    logsum = 0.0
    out = []
    for t in times:
        n_risk = sum(1 for tt, _ in rows if tt >= t)
        d = sum(1 for tt, ev in rows if tt == t and ev == 1)
        if d >= n_risk:
            logsum += -1e9
        elif d > 0:
            logsum += round(math.log(1.0 - d / n_risk), 9)
        out.append((t, round(math.exp(logsum), 6)))
    return out


def test_rmst_matches_python_reference(spark, sf_dir):
    subj = _durations(spark, sf_dir)
    tau = 30
    got = {
        r.grp: r for r in get_query("surv_rmst").fn(spark, sf_dir).collect()
    }
    for grp in ("treatment", "control"):
        rows = [(t, ev) for _, g, t, ev in subj if g == grp]
        curve = _km_curve(rows)
        area = min(curve[0][0], tau)  # S = 1 head segment
        for i, (t, s) in enumerate(curve):
            if t >= tau:
                continue
            nt = curve[i + 1][0] if i + 1 < len(curve) else tau
            area += round(s * (min(nt, tau) - t), 9)
        assert got[grp].tau == tau
        assert abs(got[grp].rmst - round(area, 6)) < 1e-9
        # RMST is bounded by the horizon
        assert 0.0 <= got[grp].rmst <= tau


def test_rmst_closed_forms(spark):
    from avro_parquet_spark_example_spark.operators.survival import rmst

    # all censored at t=50 >= tau: S=1 on [0, tau] -> RMST = tau
    subj = spark.createDataFrame(
        [(i, "g", 50, 0) for i in range(4)],
        "user_id int, grp string, t bigint, ev int",
    )
    assert rmst(subj, tau=30).collect()[0].rmst == 30.0
    # everyone dies at t=10 < tau: S=1 on [0,10), 0 after -> RMST = 10
    subj2 = spark.createDataFrame(
        [(i, "g", 10, 1) for i in range(4)],
        "user_id int, grp string, t bigint, ev int",
    )
    assert rmst(subj2, tau=30).collect()[0].rmst == 10.0


# --------------------------------------------------------------------------
# Cramér–von Mises
# --------------------------------------------------------------------------


def test_cvm_matches_python_reference(spark, sf_dir):
    evs = _events(spark, sf_dir)
    got = {
        r.event_type: r
        for r in get_query("stat_cvm_two_sample").fn(spark, sf_dir).collect()
    }
    types = {r.event_type for r in evs}
    for et in types:
        xs = sorted(_q(r.value) for r in evs if r.event_type == et and _is_weekend(r.ts))
        ys = sorted(_q(r.value) for r in evs if r.event_type == et and not _is_weekend(r.ts))
        n1, n2 = len(xs), len(ys)
        pooled = sorted(xs + ys)
        s = 0.0
        for z in sorted(set(pooled)):
            cz = pooled.count(z)
            f1 = sum(1 for x in xs if x <= z)
            f2 = sum(1 for y in ys if y <= z)
            diff = (f1 * n2 - f2 * n1) / (n1 * n2)
            s += round(cz * diff * diff, 9)
        t = n1 * n2 / (n1 + n2) ** 2 * s
        assert abs(got[et].cvm_t - round(t, 6)) < 1e-5
        assert got[et].rejected == (t > 0.461)


def test_cvm_identical_samples_zero(spark):
    from avro_parquet_spark_example_spark.operators.rankstats import (
        cvm_two_sample,
    )

    rows = [("a", w, v) for v in range(10) for w in (0, 1)]
    base = spark.createDataFrame(rows, "event_type string, wk int, v long")
    r = cvm_two_sample(base).collect()[0]
    assert r.cvm_t == 0.0 and r.rejected is False


def test_cvm_degenerate_empty_side(spark):
    from avro_parquet_spark_example_spark.operators.rankstats import (
        cvm_two_sample,
    )

    base = spark.createDataFrame(
        [("a", 0, v) for v in range(5)], "event_type string, wk int, v long"
    )
    r = cvm_two_sample(base).collect()[0]
    assert r.cvm_t is None and r.rejected is False


# --------------------------------------------------------------------------
# Cochran–Armitage
# --------------------------------------------------------------------------


def test_cochran_armitage_matches_python_reference(spark, sf_dir):
    evs = _events(spark, sf_dir)
    got = {
        r.event_type: r
        for r in get_query("stat_cochran_armitage")
        .fn(spark, sf_dir)
        .collect()
    }
    types = {r.event_type for r in evs}
    for et in types:
        cells: dict[int, list[int]] = {}
        for r in evs:
            if r.event_type != et:
                continue
            s = r.ts.isoweekday() % 7 + 1
            n_r = cells.setdefault(s, [0, 0])
            n_r[0] += 1
            n_r[1] += 1 if _q(r.value) >= 5000 else 0
        n = sum(v[0] for v in cells.values())
        rr = sum(v[1] for v in cells.values())
        sr = sum(s * v[1] for s, v in cells.items())
        sn = sum(s * v[0] for s, v in cells.items())
        s2n = sum(s * s * v[0] for s, v in cells.items())
        svar = s2n - sn * sn / n
        t = sr - rr * sn / n
        z = t / math.sqrt(rr / n * (1 - rr / n) * svar)
        assert got[et].n == n and got[et].r == rr
        assert abs(got[et].z - round(z, 6)) < 1e-6
        assert got[et].rejected == (abs(z) > 1.959963984540054)


def test_cochran_armitage_monotone_sign_and_degenerate(spark):
    from avro_parquet_spark_example_spark.operators.rankstats import (
        cochran_armitage,
    )

    # success rate rises with score -> z > 0 and strongly significant
    rows = []
    for s in range(1, 8):
        for i in range(40):
            rows.append(("a", s, 1 if i < s * 5 else 0))
    base = spark.createDataFrame(rows, "event_type string, s long, y int")
    r = cochran_armitage(base).collect()[0]
    assert r.z > 0 and r.rejected is True
    # all failures -> degenerate NULL/False
    base0 = spark.createDataFrame(
        [("a", s, 0) for s in range(1, 8)],
        "event_type string, s long, y int",
    )
    r0 = cochran_armitage(base0).collect()[0]
    assert r0.z is None and r0.rejected is False
    # single score level -> score variance 0 -> NULL/False
    base1 = spark.createDataFrame(
        [("a", 3, i % 2) for i in range(10)],
        "event_type string, s long, y int",
    )
    r1 = cochran_armitage(base1).collect()[0]
    assert r1.z is None and r1.rejected is False


# --------------------------------------------------------------------------
# Hosmer–Lemeshow
# --------------------------------------------------------------------------


def test_hosmer_lemeshow_matches_python_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_discount", "l_returnflag"
    ).collect()
    grp: dict[int, list[int]] = {}
    for r in li:
        v = int(round(r.l_discount * 100))
        g = grp.setdefault(v, [0, 0])
        g[0] += 1
        g[1] += 1 if r.l_returnflag == "R" else 0
    s = 0.0
    for v, (n_g, o_g) in grp.items():
        pi = (v + 1) / 12
        s += round((o_g - n_g * pi) ** 2 / (n_g * pi * (1 - pi)), 9)
    row = get_query("eval_hosmer_lemeshow").fn(spark, sf_dir).collect()[0]
    assert row.n == len(li) and row.n_groups == len(grp)
    assert abs(row.hl_chi2 - round(s, 6)) < 1e-6
    assert row.rejected == (s > 16.918977604620448)


def test_hosmer_lemeshow_perfectly_calibrated(spark):
    from avro_parquet_spark_example_spark.operators.rankstats import (
        hosmer_lemeshow,
    )

    # O_g == n_g * pi exactly for every group -> chi2 == 0
    rows = []
    for v in range(0, 11):
        n_g = 120  # divisible by 12 -> integer expected counts
        o_g = n_g * (v + 1) // 12
        rows += [(v, 1)] * o_g + [(v, 0)] * (n_g - o_g)
    base = spark.createDataFrame(rows, "v long, pos int")
    r = hosmer_lemeshow(base).collect()[0]
    assert r.hl_chi2 == 0.0 and r.rejected is False


# --------------------------------------------------------------------------
# facade parity
# --------------------------------------------------------------------------


def test_engine_round15_facade_parity(spark, sf_dir):
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.engine import Engine
    from avro_parquet_spark_example_spark.operators.survival import (
        _user_durations,
    )

    eng = Engine(spark=spark, sf_dir=sf_dir)
    subj = _user_durations(spark, sf_dir)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(eng.nelson_aalen(subj)) == rows(
        get_query("surv_nelson_aalen").fn(spark, sf_dir)
    )
    assert rows(eng.rmst(subj)) == rows(
        get_query("surv_rmst").fn(spark, sf_dir)
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wkbase = ev.select(
        "event_type",
        F.when(
            F.dayofweek(F.col("ts").cast("date")).isin(1, 7), 1
        )
        .otherwise(0)
        .alias("wk"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("v"),
    )
    assert rows(eng.cvm_two_sample(wkbase)) == rows(
        get_query("stat_cvm_two_sample").fn(spark, sf_dir)
    )
    cabase = ev.select(
        "event_type",
        F.dayofweek(F.col("ts").cast("date")).cast("bigint").alias("s"),
        F.when(
            F.floor(F.col("value") * 100.0 + 0.5).cast("bigint") >= 5000, 1
        )
        .otherwise(0)
        .alias("y"),
    )
    assert rows(eng.cochran_armitage(cabase)) == rows(
        get_query("stat_cochran_armitage").fn(spark, sf_dir)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    assert rows(eng.hosmer_lemeshow(li)) == rows(
        get_query("eval_hosmer_lemeshow").fn(spark, sf_dir)
    )
