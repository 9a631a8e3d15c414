"""Round-14 rank/ordinal statistics (operators/rankstats.py +
stat_by_fdr) vs independent Python references + closed-form boundary
pins — the r11/r12/r13 test model: each operator's exact kernel is
re-derived in plain Python over the collected fixture and compared
value-for-value, then pinned on hand-checkable inputs."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from avro_parquet_spark_example_spark.registry import get_query


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").collect()


def _q(v) -> int:
    return int(math.floor(v * 100.0 + 0.5))


def _dow(ts) -> int:
    # Spark dayofweek: 1=Sunday..7=Saturday
    return ts.isoweekday() % 7 + 1


def _is_weekend(ts) -> bool:
    return ts.isoweekday() in (6, 7)


# --------------------------------------------------------------------------
# Jonckheere–Terpstra
# --------------------------------------------------------------------------


def _jt_ref(groups: dict[int, list[int]]):
    """(jt2, mean, var) by brute force over ordered group pairs."""
    keys = sorted(groups)
    jt2 = 0
    for ai, a in enumerate(keys):
        for b in keys[ai + 1 :]:
            for x in groups[a]:
                for y in groups[b]:
                    jt2 += 2 if x < y else (1 if x == y else 0)
    ns = [len(groups[k]) for k in keys]
    n = sum(ns)
    pooled = Counter()
    for k in keys:
        pooled.update(groups[k])
    ts = list(pooled.values())
    mean = (n * n - sum(x * x for x in ns)) / 4.0
    var = (
        (
            n * (n - 1) * (2 * n + 5)
            - sum(x * (x - 1) * (2 * x + 5) for x in ns)
            - sum(t * (t - 1) * (2 * t + 5) for t in ts)
        )
        / 72.0
        + sum(x * (x - 1) * (x - 2) for x in ns)
        * sum(t * (t - 1) * (t - 2) for t in ts)
        / (36.0 * n * (n - 1) * (n - 2))
        + sum(x * (x - 1) for x in ns)
        * sum(t * (t - 1) for t in ts)
        / (8.0 * n * (n - 1))
    )
    return jt2, mean, var


def test_jonckheere_matches_python_reference(spark, sf_dir):
    groups: dict[str, dict[int, list[int]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for r in _events(spark, sf_dir):
        groups[r.event_type][_dow(r.ts)].append(_q(r.value))
    got = {
        r.event_type: r
        for r in get_query("stat_jonckheere_terpstra")
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(groups)
    for t, g in groups.items():
        jt2, mean, var = _jt_ref(g)
        row = got[t]
        assert row.jt2 == jt2
        assert abs(row.mean_jt - round(mean, 6)) < 1e-9
        assert abs(row.var_jt - round(var, 6)) < 1e-4
        z = (jt2 / 2.0 - mean) / math.sqrt(var)
        assert abs(row.z - round(z, 6)) < 1e-5
        assert row.rejected == (abs(z) > 1.959963984540054)


def test_jonckheere_closed_forms():
    # perfectly increasing groups -> JT at its maximum n1*n2 (doubled)
    jt2, mean, var = _jt_ref({1: [1, 2], 2: [3, 4], 3: [5, 6]})
    # pairs across groups: 2*2*3 group-pairs... each strictly less
    assert jt2 == 2 * (4 + 4 + 4)
    # all-equal values -> every pair ties, JT2 = #cross-pairs exactly
    jt2e, meane, _ = _jt_ref({1: [5, 5], 2: [5, 5]})
    assert jt2e == 4  # 4 cross pairs, each contributing 1 (tie)
    assert jt2e / 2.0 == meane  # ties sit exactly at the null mean


# --------------------------------------------------------------------------
# Goodman–Kruskal gamma / Somers' D / tau-b
# --------------------------------------------------------------------------


def test_gk_gamma_matches_python_reference(spark, sf_dir):
    cells: dict[str, Counter] = defaultdict(Counter)
    for r in _events(spark, sf_dir):
        cells[r.event_type][(_dow(r.ts), min(9, _q(r.value) // 1000))] += 1
    got = {
        r.event_type: r
        for r in get_query("stat_gk_gamma_tau").fn(spark, sf_dir).collect()
    }
    for t, cnt in cells.items():
        c = d = tx = ty = 0
        items = list(cnt.items())
        for (x1, y1), n1 in items:
            for (x2, y2), n2 in items:
                if x2 > x1 and y2 > y1:
                    c += n1 * n2
                elif x2 > x1 and y2 < y1:
                    d += n1 * n2
                elif x2 > x1 and y2 == y1:
                    ty += n1 * n2
                elif x2 == x1 and y2 > y1:
                    tx += n1 * n2
        row = got[t]
        assert (row.concordant, row.discordant) == (c, d)
        assert abs(row.gamma - round((c - d) / (c + d), 6)) < 1e-9
        assert abs(row.somers_dyx - round((c - d) / (c + d + ty), 6)) < 1e-9
        tb = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
        assert abs(row.tau_b - round(tb, 6)) < 1e-9


# --------------------------------------------------------------------------
# Mood's median test
# --------------------------------------------------------------------------


def test_mood_median_matches_python_reference(spark, sf_dir):
    rows = _events(spark, sf_dir)
    qs = sorted(_q(r.value) for r in rows)
    med = qs[(len(qs) + 1) // 2 - 1]  # lower median, rank (n+1) div 2
    per: dict[str, list[int]] = defaultdict(list)
    for r in rows:
        per[r.event_type].append(_q(r.value))
    n = len(qs)
    a = sum(1 for q in qs if q > med)
    chi2 = 0.0
    for t in sorted(per):
        n_i = len(per[t])
        above = sum(1 for q in per[t] if q > med)
        ea, eb = n_i * a / n, n_i * (n - a) / n
        chi2 += round(
            (above - ea) ** 2 / ea + ((n_i - above) - eb) ** 2 / eb, 9
        )
    got = {
        r.event_type: r
        for r in get_query("stat_mood_median").fn(spark, sf_dir).collect()
    }
    for t in per:
        row = got[t]
        assert row.pooled_median == med
        assert row.n_i == len(per[t])
        assert row.above == sum(1 for q in per[t] if q > med)
        assert abs(row.chi2 - round(chi2, 6)) < 1e-6
        assert row.rejected == (chi2 > 9.487729036781154)


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test
# --------------------------------------------------------------------------


def test_runs_test_matches_python_reference(spark, sf_dir):
    daily: dict[str, dict] = defaultdict(dict)
    for r in _events(spark, sf_dir):
        day = r.ts.date()
        daily[r.event_type][day] = daily[r.event_type].get(day, 0) + _q(
            r.value
        )
    got = {
        r.event_type: r
        for r in get_query("stat_runs_test").fn(spark, sf_dir).collect()
    }
    for t, dm in daily.items():
        tots = sorted(dm.values())
        med = tots[(len(tots) + 1) // 2 - 1]
        seq = [dm[d] > med for d in sorted(dm) if dm[d] != med]
        runs = sum(
            1
            for i, s in enumerate(seq)
            if i == 0 or s != seq[i - 1]
        )
        n1 = sum(seq)
        n2 = len(seq) - n1
        row = got[t]
        assert (row.runs, row.n1, row.n2) == (runs, n1, n2)
        mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var = (
            2.0
            * n1
            * n2
            * (2.0 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        z = (runs - mu) / math.sqrt(var)
        assert abs(row.z - round(z, 6)) < 1e-6
        assert row.rejected == (abs(z) > 1.959963984540054)


def test_runs_closed_forms():
    # perfectly alternating -> R = N (maximal); monotone block -> R = 2
    seq = [True, False] * 5
    runs = sum(1 for i, s in enumerate(seq) if i == 0 or s != seq[i - 1])
    assert runs == 10
    seq2 = [True] * 5 + [False] * 5
    runs2 = sum(
        1 for i, s in enumerate(seq2) if i == 0 or s != seq2[i - 1]
    )
    assert runs2 == 2


# --------------------------------------------------------------------------
# Cliff's delta
# --------------------------------------------------------------------------


def test_cliff_delta_matches_python_reference(spark, sf_dir):
    per: dict[str, tuple[list, list]] = defaultdict(lambda: ([], []))
    for r in _events(spark, sf_dir):
        per[r.event_type][0 if _is_weekend(r.ts) else 1].append(_q(r.value))
    got = {
        r.event_type: r
        for r in get_query("stat_cliff_delta").fn(spark, sf_dir).collect()
    }
    for t, (w, d) in per.items():
        cw, cd = Counter(w), Counter(d)
        gt = sum(
            nw * nd for vw, nw in cw.items() for vd, nd in cd.items()
            if vw > vd
        )
        lt = sum(
            nw * nd for vw, nw in cw.items() for vd, nd in cd.items()
            if vw < vd
        )
        delta = (gt - lt) / (len(w) * len(d))
        row = got[t]
        assert (row.n_weekend, row.n_weekday) == (len(w), len(d))
        assert abs(row.delta - round(delta, 6)) < 1e-9
        bands = (
            "negligible"
            if abs(delta) < 0.147
            else "small"
            if abs(delta) < 0.33
            else "medium"
            if abs(delta) < 0.474
            else "large"
        )
        assert row.magnitude == bands


# --------------------------------------------------------------------------
# Weighted Cohen's kappa
# --------------------------------------------------------------------------


def test_kappa_weighted_matches_python_reference(spark, sf_dir):
    obs: dict[str, Counter] = defaultdict(Counter)
    for r in _events(spark, sf_dir):
        ra = min(9, _q(r.value) // 1000)
        rb = min(9, ra + int(r.event_id) % 2)
        obs[r.event_type][(ra, rb)] += 1
    got = {
        r.event_type: r
        for r in get_query("eval_kappa_weighted").fn(spark, sf_dir).collect()
    }
    for t, cnt in obs.items():
        n = sum(cnt.values())
        ra_m = Counter()
        rb_m = Counter()
        for (a, b), o in cnt.items():
            ra_m[a] += o
            rb_m[b] += o
        lin_o = sum(abs(a - b) * o for (a, b), o in cnt.items())
        quad_o = sum((a - b) ** 2 * o for (a, b), o in cnt.items())
        lin_e = sum(
            abs(a - b) * ra_m[a] * rb_m[b] for a in ra_m for b in rb_m
        )
        quad_e = sum(
            (a - b) ** 2 * ra_m[a] * rb_m[b] for a in ra_m for b in rb_m
        )
        row = got[t]
        assert row.n == n
        assert abs(row.kappa_linear - round(1 - lin_o * n / lin_e, 6)) < 1e-9
        assert (
            abs(row.kappa_quadratic - round(1 - quad_o * n / quad_e, 6))
            < 1e-9
        )


def test_kappa_weighted_closed_forms():
    # perfect agreement -> kappa_w = 1 for any weights (O-sum = 0)
    assert 1 - 0 * 10 / 1 == 1.0
    # quadratic penalizes far disagreements more than linear
    assert (0 - 9) ** 2 / 9 > abs(0 - 9) / 9


# --------------------------------------------------------------------------
# KS two-sample
# --------------------------------------------------------------------------


def test_ks_two_sample_matches_python_reference(spark, sf_dir):
    per: dict[str, tuple[list, list]] = defaultdict(lambda: ([], []))
    for r in _events(spark, sf_dir):
        per[r.event_type][0 if _is_weekend(r.ts) else 1].append(_q(r.value))
    got = {
        r.event_type: r
        for r in get_query("stat_ks_two_sample").fn(spark, sf_dir).collect()
    }
    for t, (w, d) in per.items():
        n1, n2 = len(w), len(d)
        c1, c2 = Counter(w), Counter(d)
        grid = sorted(set(w) | set(d))
        f1 = f2 = 0
        dstar = 0
        for v in grid:
            f1 += c1.get(v, 0)
            f2 += c2.get(v, 0)
            dstar = max(dstar, abs(f1 * n2 - f2 * n1))
        row = got[t]
        ks_d = dstar / (n1 * n2)
        lam = ks_d * math.sqrt(n1 * n2 / (n1 + n2))
        assert abs(row.ks_d - round(ks_d, 6)) < 1e-9
        assert abs(row.ks_stat - round(lam, 6)) < 1e-9
        assert row.rejected == (lam > 1.3581015157406195)


def test_ks_closed_forms():
    # disjoint supports -> D = 1 exactly
    c1, c2 = Counter([1, 2]), Counter([5, 6])
    grid = sorted(set(c1) | set(c2))
    f1 = f2 = dstar = 0
    for v in grid:
        f1 += c1.get(v, 0)
        f2 += c2.get(v, 0)
        dstar = max(dstar, abs(f1 * 2 - f2 * 2))
    assert dstar / 4 == 1.0


# --------------------------------------------------------------------------
# Lorenz curve
# --------------------------------------------------------------------------


def test_lorenz_matches_python_reference(spark, sf_dir):
    per: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for r in _events(spark, sf_dir):
        per[r.event_type][r.user_id] += _q(r.value)
    got: dict[tuple, object] = {}
    for r in get_query("agg_lorenz_curve").fn(spark, sf_dir).collect():
        got[(r.event_type, r.decile)] = r
    for t, users in per.items():
        ranked = sorted(users.items(), key=lambda kv: (kv[1], kv[0]))
        n = len(ranked)
        tot = sum(s for _, s in ranked)
        cum_u = cum_s = 0
        by_dec: dict[int, list] = defaultdict(list)
        for rk, (_, s) in enumerate(ranked, start=1):
            by_dec[(rk * 10 - 1) // n + 1].append(s)
        for dec in sorted(by_dec):
            cum_u += len(by_dec[dec])
            cum_s += sum(by_dec[dec])
            row = got[(t, dec)]
            assert row.n_users == len(by_dec[dec])
            assert abs(row.cum_user_share - round(cum_u / n, 6)) < 1e-9
            assert abs(row.cum_value_share - round(cum_s / tot, 6)) < 1e-9
    # last decile closes the curve at (1, 1)
    for (t, dec), row in got.items():
        if dec == 10:
            assert row.cum_user_share == 1.0
            assert row.cum_value_share == 1.0


# --------------------------------------------------------------------------
# Benjamini–Yekutieli vs Benjamini–Hochberg ordering property
# --------------------------------------------------------------------------


def test_by_fdr_never_rejects_more_than_bh(spark, sf_dir):
    bh = {
        (r.event_type, r.dow): r
        for r in get_query("stat_bh_fdr").fn(spark, sf_dir).collect()
    }
    by = {
        (r.event_type, r.dow): r
        for r in get_query("stat_by_fdr").fn(spark, sf_dir).collect()
    }
    assert set(bh) == set(by) and len(by) == 35
    # identical p-values and ranks; BY threshold is BH's / H(m) -> BY's
    # rejection set is a SUBSET of BH's (the defining property)
    for k in bh:
        assert bh[k].p_value == by[k].p_value
        assert bh[k].p_rank == by[k].p_rank
        if by[k].rejected:
            assert bh[k].rejected
    # step-up coherence: rejections are exactly ranks 1..k
    rej = sorted(r.p_rank for r in by.values() if r.rejected)
    assert rej == list(range(1, len(rej) + 1))


# --------------------------------------------------------------------------
# Engine facade parity for the r14 family
# --------------------------------------------------------------------------


def test_engine_rankstats_facade_parity(spark, sf_dir):
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.engine import Engine
    from avro_parquet_spark_example_spark.operators.rankstats import (
        _dow_spark,
        _q100,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    eng = Engine(spark=spark, sf_dir=sf_dir)
    e = load(spark, sf_dir, "events")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    def want(name):
        return rows(get_query(name).fn(spark, sf_dir))

    base_gv = e.select(
        "event_type", _dow_spark().alias("g"), _q100().alias("v")
    )
    assert rows(eng.jonckheere_terpstra(base_gv)) == want(
        "stat_jonckheere_terpstra"
    )
    base_xy = e.select(
        "event_type",
        _dow_spark().alias("x"),
        F.least(F.lit(9), _q100() / F.lit(1000)).cast("bigint").alias("y"),
    )
    assert rows(eng.gk_gamma_tau(base_xy)) == want("stat_gk_gamma_tau")
    assert rows(
        eng.mood_median(e.select("event_type", _q100().alias("q")))
    ) == want("stat_mood_median")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_q100()).cast("bigint").alias("tq"))
    assert rows(eng.runs_test(daily)) == want("stat_runs_test")
    base_wk = e.select(
        "event_type",
        F.when(_dow_spark().isin(1, 7), 1).otherwise(0).alias("wk"),
        _q100().alias("v"),
    )
    assert rows(eng.cliff_delta(base_wk)) == want("stat_cliff_delta")
    assert rows(eng.ks_two_sample(base_wk)) == want("stat_ks_two_sample")
    dec = F.least(F.lit(9), _q100() / F.lit(1000)).cast("bigint")
    base_rr = e.select(
        "event_type",
        dec.alias("ra"),
        F.least(
            F.lit(9), dec + F.col("event_id").cast("bigint") % 2
        ).alias("rb"),
    )
    assert rows(eng.kappa_weighted(base_rr)) == want("eval_kappa_weighted")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.sum(_q100()).cast("bigint").alias("s")
    )
    assert rows(eng.lorenz_curve(per_user)) == want("agg_lorenz_curve")
    assert rows(eng.brunner_munzel(base_wk)) == want("stat_brunner_munzel")
    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    assert rows(eng.auc_partial(li)) == want("eval_auc_partial")


# --------------------------------------------------------------------------
# Partial AUC (McClish)
# --------------------------------------------------------------------------


def test_auc_partial_matches_python_reference(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    cells = Counter()
    for r in rows:
        v = int(round(r.l_discount * 100))
        cells[(v, 1 if r.l_returnflag == "R" else 0)] += 1
    grid = sorted({v for v, _ in cells}, reverse=True)
    wp_tot = sum(n for (v, p), n in cells.items() if p == 1)
    wn_tot = sum(n for (v, p), n in cells.items() if p == 0)
    beta = 0.1
    cwp = cwn = 0
    pauc = 0.0
    for v in grid:
        wp, wn = cells.get((v, 1), 0), cells.get((v, 0), 0)
        if wn > 0:
            if (cwn + wn) <= beta * wn_tot:
                pauc += round(wn * (2 * cwp + wp) / (2.0 * wp_tot * wn_tot), 9)
            elif cwn < beta * wn_tot:
                t = beta * wn_tot - cwn
                pauc += round(
                    t * (2.0 * cwp + t * wp / wn) / (2.0 * wp_tot * wn_tot),
                    9,
                )
        cwp += wp
        cwn += wn
    row = get_query("eval_auc_partial").fn(spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg) == (wp_tot, wn_tot)
    assert abs(row.pauc - round(pauc, 6)) < 1e-6
    std = 0.5 * (1 + (pauc - 0.005) / 0.095)
    assert abs(row.pauc_mcclish - round(std, 6)) < 1e-5
    # bounds: 0 <= pauc <= beta; standardized in [0, 1]
    assert 0.0 <= row.pauc <= 0.1 + 1e-9
    assert 0.0 <= row.pauc_mcclish <= 1.0 + 1e-9


def test_auc_partial_closed_forms():
    # perfect classifier: TPR=1 before any FP -> pauc = beta exactly
    # (the whole strip is full) -> mcclish = 1
    beta = 0.1
    assert 0.5 * (1 + (beta - 0.005) / 0.095) == 1.0
    # random classifier: diagonal -> pauc = beta^2/2 -> mcclish = 0.5
    assert 0.5 * (1 + (beta**2 / 2 - 0.005) / 0.095) == 0.5


# --------------------------------------------------------------------------
# Brunner–Munzel — definitional per-observation midranks (independent of
# the grid algebra the operator uses)
# --------------------------------------------------------------------------


def _midranks(values):
    """value -> midrank over the given multiset (1-based)."""
    cnt = Counter(values)
    out = {}
    below = 0
    for v in sorted(cnt):
        out[v] = below + (cnt[v] + 1) / 2.0
        below += cnt[v]
    return out


def test_brunner_munzel_matches_python_reference(spark, sf_dir):
    per: dict[str, tuple[list, list]] = defaultdict(lambda: ([], []))
    for r in _events(spark, sf_dir):
        per[r.event_type][0 if _is_weekend(r.ts) else 1].append(_q(r.value))
    got = {
        r.event_type: r
        for r in get_query("stat_brunner_munzel").fn(spark, sf_dir).collect()
    }
    for t, (x1, x2) in per.items():
        n1, n2 = len(x1), len(x2)
        pooled = _midranks(x1 + x2)
        w1 = _midranks(x1)
        w2 = _midranks(x2)
        r1 = [pooled[v] for v in x1]
        r2 = [pooled[v] for v in x2]
        rb1, rb2 = sum(r1) / n1, sum(r2) / n2
        p1 = [pooled[v] - w1[v] for v in x1]
        p2 = [pooled[v] - w2[v] for v in x2]
        m1, m2 = sum(p1) / n1, sum(p2) / n2
        s1 = sum((d - m1) ** 2 for d in p1) / (n1 - 1)
        s2 = sum((d - m2) ** 2 for d in p2) / (n2 - 1)
        w = (rb2 - rb1) * n1 * n2 / (n1 + n2) / math.sqrt(n1 * s1 + n2 * s2)
        p_hat = (rb2 - (n2 + 1) / 2.0) / n1
        row = got[t]
        assert (row.n_weekend, row.n_weekday) == (n1, n2)
        assert abs(row.p_hat - round(p_hat, 6)) < 1e-6
        assert abs(row.w_stat - round(w, 6)) < 1e-4
        assert row.rejected == (abs(w) > 1.959963984540054)


def test_brunner_munzel_closed_forms():
    # identical samples -> p_hat = 1/2, W = 0
    x = [1, 2, 3, 4, 5] * 4
    pooled = _midranks(x + x)
    n = len(x)
    rb = sum(pooled[v] for v in x) / n
    assert abs((rb - (n + 1) / 2.0) / n - 0.5) < 1e-12
    # complete separation -> p_hat = 1 (every y above every x)
    lo, hi = [1, 2, 3], [10, 11, 12]
    pooled = _midranks(lo + hi)
    rbh = sum(pooled[v] for v in hi) / 3
    assert (rbh - (3 + 1) / 2.0) / 3 == 1.0


# --------------------------------------------------------------------------
# Survival family: Kaplan–Meier + log-rank
# --------------------------------------------------------------------------


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


def test_kaplan_meier_matches_python_reference(spark, sf_dir):
    subj = _durations(spark, sf_dir)
    got = {
        (r.grp, r.t): r
        for r in get_query("surv_kaplan_meier").fn(spark, sf_dir).collect()
    }
    for grp in ("treatment", "control"):
        rows = [(t, ev) for _, g, t, ev in subj if g == grp]
        times = sorted({t for t, _ in rows})
        surv = 1.0
        logsum = 0.0
        for t in times:
            n_risk = sum(1 for tt, _ in rows if tt >= t)
            d = sum(1 for tt, ev in rows if tt == t and ev == 1)
            c = sum(1 for tt, ev in rows if tt == t and ev == 0)
            if d > 0:
                logsum += round(math.log(1.0 - d / n_risk), 9)
            surv = math.exp(logsum)
            row = got[(grp, t)]
            assert (row.n_risk, row.n_event, row.n_censor) == (n_risk, d, c)
            assert abs(row.survival - round(surv, 6)) < 1e-6
        # KM invariants: S is non-increasing, starts <= 1
        ss = [got[(grp, t)].survival for t in times]
        assert all(a >= b - 1e-9 for a, b in zip(ss, ss[1:]))
        assert ss[0] <= 1.0 + 1e-9


def test_logrank_matches_python_reference(spark, sf_dir):
    subj = _durations(spark, sf_dir)
    t1 = [(t, ev) for _, g, t, ev in subj if g == "treatment"]
    t2 = [(t, ev) for _, g, t, ev in subj if g == "control"]
    times = sorted({t for t, _ in t1 + t2})
    o1 = sum(ev for _, ev in t1)
    e1 = v = 0.0
    for t in times:
        n1 = sum(1 for tt, _ in t1 if tt >= t)
        n2 = sum(1 for tt, _ in t2 if tt >= t)
        d1 = sum(1 for tt, ev in t1 if tt == t and ev == 1)
        d2 = sum(1 for tt, ev in t2 if tt == t and ev == 1)
        d, n = d1 + d2, n1 + n2
        if d == 0 or n1 == 0 or n2 == 0:
            continue
        e1 += round(d * n1 / n, 9)
        if n >= 2:
            v += round(d * n1 * n2 * (n - d) / (n * n * (n - 1)), 9)
    row = get_query("surv_logrank_test").fn(spark, sf_dir).collect()[0]
    assert row.o1 == o1
    assert abs(row.e1 - round(e1, 6)) < 1e-6
    assert abs(row.var_o1 - round(v, 6)) < 1e-6
    if v == 0:
        # degenerate fixture (no death day with both cohorts at risk):
        # the operator emits NULL chi2 / rejected False by contract
        assert row.chi2 is None and row.rejected is False
    else:
        chi2 = (o1 - e1) ** 2 / v
        assert abs(row.chi2 - round(chi2, 6)) < 1e-5
        assert row.rejected == (chi2 > 3.841458820694124)


def test_km_closed_forms():
    # no censoring, one death per time among n: S after k deaths = 1-k/n
    # via the product form
    n = 10
    s = 1.0
    for k in range(1, 4):
        s *= 1 - 1 / (n - k + 1)
    assert abs(s - (n - 3) / n) < 1e-12
    # all censored -> S stays 1 (no death terms)
    assert math.exp(0.0) == 1.0


def test_km_full_observation_reaches_exact_zero(spark):
    # r14 ADVICE: when d == n_risk at a group's last death time (any
    # FULLY OBSERVED cohort), ln(1 - d/n) = -inf; Spark's decimal cast
    # turned it into NULL, the window SUM skipped it, and survival
    # silently stayed at its prior value (0.4 below). The -1e9 sentinel
    # guard must drive survival to an exact IEEE 0.0 instead.
    from avro_parquet_spark_example_spark.operators.survival import (
        kaplan_meier,
    )

    subj = spark.createDataFrame(
        [(i, "g", t, 1) for i, t in enumerate([1, 1, 2, 3, 3])],
        "user_id int, grp string, t bigint, ev int",
    )
    surv = {r.t: r.survival for r in kaplan_meier(subj).collect()}
    assert surv[1] == 0.6 and surv[2] == 0.4
    assert surv[3] == 0.0  # exact zero — NOT 0.4 (the pre-guard bug)

    # DuckDB twin of the oracle's km CASE on the same histogram: the
    # sentinel must underflow to the same exact 0.0 (a plain CAST of
    # LN(0) would instead raise a conversion error there).
    import duckdb

    got = duckdb.sql(
        """
        WITH risk(t, d, n_risk) AS (VALUES (1,2,5),(2,1,3),(3,2,2)),
        km AS (
            SELECT t,
                   CAST(SUM(CASE
                        WHEN d >= n_risk
                            THEN CAST(-1000000000 AS DECIMAL(28,9))
                        WHEN d = 0 THEN CAST(0 AS DECIMAL(28,9))
                        ELSE CAST(ROUND(
                            LN(1.0 - CAST(d AS DOUBLE) / n_risk), 9)
                            AS DECIMAL(28,9)) END)
                        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                              PRECEDING AND CURRENT ROW)
                   AS DECIMAL(38,9)) AS logs
            FROM risk
        )
        SELECT t, ROUND(EXP(CAST(logs AS DOUBLE)), 6) AS survival
        FROM km ORDER BY t
        """
    ).fetchall()
    assert [(t, s) for t, s in got] == [(1, 0.6), (2, 0.4), (3, 0.0)]
    for t, s in got:
        assert s == surv[t]


def test_engine_kaplan_meier_facade_parity(spark, sf_dir):
    from avro_parquet_spark_example_spark.engine import Engine
    from avro_parquet_spark_example_spark.operators.survival import (
        _user_durations,
    )

    eng = Engine(spark=spark, sf_dir=sf_dir)
    got = sorted(
        map(tuple, eng.kaplan_meier(_user_durations(spark, sf_dir)).collect())
    )
    want = sorted(
        map(
            tuple,
            get_query("surv_kaplan_meier").fn(spark, sf_dir).collect(),
        )
    )
    assert got == want
