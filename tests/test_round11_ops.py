"""Round-11 pins: the at-scale production dials turned into code
(VERDICT r10 task #3) plus the ADVICE r10 fixes with behavior changes.

- ``scaled_anchor_count`` — the √corpus IVF anchor dial (8 → 25 at 10×).
- ``silhouette_sample_hex`` — md5-prefix threshold from a target COUNT.
- ``Engine.silhouette`` — threshold-length fix (ADVICE r10 #2) and the
  new ``target_count`` form.
- ``ivf_candidates`` — the exposed candidate stage agrees with the graph
  it feeds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.engine import Engine
from avro_parquet_spark_example_spark.operators.simsearch import (
    KNN_IVF_ANCHORS,
    ivf_candidates,
    knn_graph_ivf,
    scaled_anchor_count,
    silhouette_sample_hex,
)


def test_scaled_anchor_count_dial():
    # identity at the reference corpus, sqrt growth at 10x/100x
    assert scaled_anchor_count(1000, 1000, 8) == 8
    assert scaled_anchor_count(10_000, 1000, 8) == 25  # 8*sqrt(10)=25.3
    assert scaled_anchor_count(100_000, 1000, 8) == 80
    # never below 1; shrinking corpora shrink the quantizer
    assert scaled_anchor_count(10, 1000, 8) == 1
    with pytest.raises(ValueError):
        scaled_anchor_count(0, 1000)
    with pytest.raises(ValueError):
        scaled_anchor_count(1000, 0)


def test_silhouette_sample_hex_threshold_math():
    # 25% of a pool = the classic 0x4000 / 16^4 threshold
    assert silhouette_sample_hex(1000, 250) == "4000"
    # target >= pool: no filter
    assert silhouette_sample_hex(100, 100) is None
    assert silhouette_sample_hex(100, 500) is None
    # tiny targets still yield a nonzero threshold
    assert silhouette_sample_hex(10**9, 1) == "0001"
    with pytest.raises(ValueError):
        silhouette_sample_hex(0, 10)
    with pytest.raises(ValueError):
        silhouette_sample_hex(10, 0)


def test_silhouette_sample_hex_is_deterministic_and_sized(spark, sf_dir):
    pool = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = pool.count()
    target = max(10, n // 3)
    hx = silhouette_sample_hex(n, target)
    assert hx is not None and len(hx) == 4

    def kept_ids():
        return sorted(
            r["vec_id"]
            for r in pool.filter(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4)
                < F.lit(hx)
            )
            .select("vec_id")
            .collect()
        )

    first, second = kept_ids(), kept_ids()
    # deterministic membership (the md5 trick's whole point)
    assert first == second
    # sized ~target: binomial tolerance, generous for small fixtures
    kept = len(first)
    tol = max(12, int(4 * (target**0.5)))
    assert abs(kept - target) <= tol, (kept, target, tol)


def test_engine_silhouette_threshold_length_respected(spark, sf_dir):
    """ADVICE r10 #2: a 2-digit threshold must compare a 2-digit prefix —
    the old hardcoded length-4 substring turned '40' into a degenerate
    comparison and shifted the sample."""
    eng = Engine(spark)
    pool = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 120)
        .select("vec_id", (F.col("vec_id") % 3).alias("label"), "embedding")
    )
    got = eng.silhouette(pool, sample_hex="40")
    expected_ids = {
        r["vec_id"]
        for r in pool.filter(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) < "40"
        )
        .select("vec_id")
        .collect()
    }
    assert {r["vec_id"] for r in got.collect()} == expected_ids
    with pytest.raises(ValueError):
        eng.silhouette(pool, sample_hex="XYZ")
    with pytest.raises(ValueError):
        eng.silhouette(pool, sample_hex="40", target_count=10)


def test_engine_silhouette_target_count_matches_hex_form(spark, sf_dir):
    eng = Engine(spark)
    pool = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") < 150)
        .select("vec_id", (F.col("vec_id") % 2).alias("label"), "embedding")
    )
    n = pool.count()
    target = n // 4
    hx = silhouette_sample_hex(n, target)
    via_count = eng.silhouette(pool, target_count=target).collect()
    via_hex = eng.silhouette(pool, sample_hex=hx).collect()
    assert sorted(r["vec_id"] for r in via_count) == sorted(
        r["vec_id"] for r in via_hex
    )


def test_ivf_candidates_feed_the_graph(spark, sf_dir):
    """The exposed candidate stage is exactly what knn_graph_ivf ranks:
    every graph edge is a candidate pair, and the per-src graph is the
    top-k of the candidate scores."""
    pool = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 100
    )
    cand = ivf_candidates(pool, n_anchors=4, nprobe=2)
    graph = knn_graph_ivf(pool, n_anchors=4, nprobe=2, k=3)
    cand_pairs = {
        (r["src"], r["dst"]) for r in cand.select("src", "dst").collect()
    }
    graph_rows = graph.collect()
    assert graph_rows, "graph is empty"
    assert {(r["src"], r["dst"]) for r in graph_rows} <= cand_pairs
    per_src = {}
    for r in graph_rows:
        per_src.setdefault(r["src"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_src.values())


# ---------------------------------------------------------------------------
# Round-11 registered queries: Python ground-truth pins (FIXTURES.md model —
# the oracle pins cross-engine equality; these pin the MATH against an
# independent plain-Python recompute on the sf0.001 fixture).

import math

from avro_parquet_spark_example_spark.registry import get_query


def _lineitem_cells(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    cells = {}
    for r in li:
        k = (r.l_returnflag, r.l_quantity, r.l_discount)
        cells[k] = cells.get(k, 0) + 1
    return cells


def test_spearman_matches_python_reference(spark, sf_dir):
    rows = {
        r.l_returnflag: r
        for r in get_query("agg_spearman_rank_corr").fn(spark, sf_dir).collect()
    }
    cells = _lineitem_cells(spark, sf_dir)
    grps = {g for g, _, _ in cells}
    for g in grps:
        sub = {(x, y): f for (gg, x, y), f in cells.items() if gg == g}
        n = sum(sub.values())

        def avg_rank_map(axis):
            marg = {}
            for (x, y), f in sub.items():
                v = x if axis == 0 else y
                marg[v] = marg.get(v, 0) + f
            out, cum = {}, 0
            for v in sorted(marg):
                out[v] = cum + (marg[v] + 1) / 2  # average rank
                cum += marg[v]
            return out

        rx, ry = avg_rank_map(0), avg_rank_map(1)
        sx = sum(f * rx[x] for (x, y), f in sub.items())
        sy = sum(f * ry[y] for (x, y), f in sub.items())
        sxx = sum(f * rx[x] ** 2 for (x, y), f in sub.items())
        syy = sum(f * ry[y] ** 2 for (x, y), f in sub.items())
        sxy = sum(f * rx[x] * ry[y] for (x, y), f in sub.items())
        rho = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert rows[g].n == n
        assert abs(rows[g].spearman_rho - rho) < 1e-5
        assert -1.0 <= rows[g].spearman_rho <= 1.0


def test_kendall_matches_python_reference(spark, sf_dir):
    rows = {
        r.l_returnflag: r
        for r in get_query("agg_kendall_tau_b").fn(spark, sf_dir).collect()
    }
    cells = _lineitem_cells(spark, sf_dir)
    grps = {g for g, _, _ in cells}
    for g in grps:
        sub = {(x, y): f for (gg, x, y), f in cells.items() if gg == g}
        n = sum(sub.values())
        items = list(sub.items())
        c = d = 0
        for (xa, ya), fa in items:
            for (xb, yb), fb in items:
                if xb < xa and yb < ya:
                    c += fa * fb
                elif xb < xa and yb > ya:
                    d += fa * fb
        tx, ty = {}, {}
        for (x, y), f in sub.items():
            tx[x] = tx.get(x, 0) + f
            ty[y] = ty.get(y, 0) + f
        n0 = n * (n - 1) // 2
        n1 = sum(t * (t - 1) // 2 for t in tx.values())
        n2 = sum(t * (t - 1) // 2 for t in ty.values())
        tau = (c - d) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
        assert rows[g].n == n
        assert abs(rows[g].kendall_tau_b - tau) < 1e-5
        assert -1.0 <= rows[g].kendall_tau_b <= 1.0


def test_mutual_information_matches_python_reference(spark, sf_dir):
    got = {
        r.yr: r
        for r in get_query("agg_mutual_information").fn(spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    by_yr = {}
    for r in o:
        by_yr.setdefault(r.o_orderdate.year, []).append(
            (r.o_orderpriority, r.o_orderstatus)
        )
    for yr, pairs in by_yr.items():
        n = len(pairs)
        cxy, cx, cy = {}, {}, {}
        for x, y in pairs:
            cxy[(x, y)] = cxy.get((x, y), 0) + 1
            cx[x] = cx.get(x, 0) + 1
            cy[y] = cy.get(y, 0) + 1
        mi = sum(
            (f / n) * math.log(f * n / (cx[x] * cy[y]))
            for (x, y), f in cxy.items()
        )
        assert got[yr].n == n
        assert abs(got[yr].mi_nats - mi) < 1e-5
        assert got[yr].mi_nats >= -1e-9  # MI is non-negative


def test_clustering_coefficient_matches_python_reference(spark, sf_dir):
    from avro_parquet_spark_example_spark.operators.graph import (
        TRI_MAX_USER,
        cooccurrence_edges,
    )

    edges = {
        (r.u, r.v)
        for r in cooccurrence_edges(
            spark, sf_dir, max_user=TRI_MAX_USER
        ).collect()
    }
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    got = {
        r.node: r
        for r in get_query("graph_clustering_coefficient")
        .fn(spark, sf_dir)
        .collect()
    }
    expect_nodes = {v for v, ns in adj.items() if len(ns) >= 2}
    assert set(got) == expect_nodes
    for v in expect_nodes:
        ns = sorted(adj[v])
        t = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if ns[j] in adj[ns[i]]
        )
        d = len(ns)
        assert got[v].degree == d and got[v].n_triangles == t
        assert abs(got[v].local_cc - round(2 * t / (d * (d - 1)), 6)) < 1e-9


def test_nearest_centroid_matches_python_reference(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: (
            r.label,
            [math.floor(float(v) * 10000000) for v in r.embedding],
        )
        for r in em
    }
    sums, cnts = {}, {}
    for lbl, v7 in vecs.values():
        cnts[lbl] = cnts.get(lbl, 0) + 1
        if lbl not in sums:
            sums[lbl] = [0] * len(v7)
        for i, x in enumerate(v7):
            sums[lbl][i] += x
    cents = {
        lbl: [math.floor(s / cnts[lbl]) for s in sv]
        for lbl, sv in sums.items()
    }
    conf = {}
    for lbl, v7 in vecs.values():
        best = min(
            (sum((a - b) ** 2 for a, b in zip(v7, c)), cl)
            for cl, c in cents.items()
        )[1]
        conf[(lbl, best)] = conf.get((lbl, best), 0) + 1
    got = {
        (r.true_label, r.pred_label): r.n
        for r in get_query("vec_nearest_centroid_assign")
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == conf
    # the fixture's labels are noisy, not separated — but the classifier
    # must still beat random assignment by a wide margin (10 labels →
    # random diagonal ~10%; the fixture measures ~37%)
    diag = sum(n for (t, p), n in conf.items() if t == p)
    n_labels = len({t for t, _ in conf} | {p for _, p in conf})
    assert diag > 2 * sum(conf.values()) // n_labels


def test_quality_pick_matches_python_reference(spark, sf_dir):
    comp = {
        r.doc_id: r.component
        for r in get_query("dedup_cluster_cc").fn(spark, sf_dir).collect()
    }
    chars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 150")
        .collect()
    }
    clusters = {}
    for doc, c in comp.items():
        clusters.setdefault(c, []).append(doc)
    want = {}
    for c, docs in clusters.items():
        best = min(docs, key=lambda d: (-chars[d], d))
        want[c] = (best, chars[best], len(docs))
    got = {
        r.component: (r.kept_doc_id, r.kept_chars, r.n_members)
        for r in get_query("dedup_cluster_quality_pick")
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == want
    # the pick is a strict improvement policy: every kept doc has the max
    # length within its cluster
    for c, (kept, kc, _) in got.items():
        assert kc == max(chars[d] for d in clusters[c])


def test_cusum_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.n))
    got = {
        r.event_type: r
        for r in get_query("ts_cusum_drift").fn(spark, sf_dir).collect()
    }
    for et, pts in series.items():
        pts.sort()
        total = sum(n for _, n in pts)
        mu6 = total * 1_000_000 // len(pts)
        s, best, bestday = 0, -1, None
        for day, n in pts:
            s = max(0, s + n * 1_000_000 - mu6)
            if s > best:
                best, bestday = s, day
        assert got[et].n_days == len(pts)
        assert abs(got[et].cusum_max - round(best / 1e6, 6)) < 1e-9
        assert got[et].peak_day == bestday


def test_assortativity_matches_python_reference(spark, sf_dir):
    from avro_parquet_spark_example_spark.operators.graph import (
        cooccurrence_edges,
    )

    edges = [(r.u, r.v) for r in cooccurrence_edges(spark, sf_dir).collect()]
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    js, ks = [], []
    for u, v in edges:
        js += [deg[u], deg[v]]
        ks += [deg[v], deg[u]]
    m = len(js)
    sj, sk = sum(js), sum(ks)
    sjk = sum(a * b for a, b in zip(js, ks))
    sjj = sum(a * a for a in js)
    skk = sum(b * b for b in ks)
    r = (m * sjk - sj * sk) / (
        math.sqrt(m * sjj - sj * sj) * math.sqrt(m * skk - sk * sk)
    )
    row = get_query("graph_degree_assortativity").fn(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert abs(row.assortativity - r) < 1e-5
    assert -1.0 <= row.assortativity <= 1.0


def test_cohens_kappa_matches_python_reference(spark, sf_dir):
    conf = {
        (r.true_label, r.pred_label): r.n
        for r in get_query("vec_nearest_centroid_assign")
        .fn(spark, sf_dir)
        .collect()
    }
    n = sum(conf.values())
    diag = sum(v for (t, p), v in conf.items() if t == p)
    rows, cols = {}, {}
    for (t, p), v in conf.items():
        rows[t] = rows.get(t, 0) + v
        cols[p] = cols.get(p, 0) + v
    rc = sum(rows[l] * cols.get(l, 0) for l in rows)
    kappa = (n * diag - rc) / (n * n - rc)
    got = get_query("eval_cohens_kappa").fn(spark, sf_dir).collect()[0]
    assert (got.n, got.diag) == (n, diag)
    assert abs(got.kappa - round(kappa, 6)) < 1e-9
    assert abs(got.observed_agreement - round(diag / n, 6)) < 1e-9
    # kappa strictly below raw agreement (chance is nonzero)
    assert got.kappa < got.observed_agreement


def test_kcenter_matches_python_reference(spark, sf_dir):
    from avro_parquet_spark_example_spark.operators.clustering import (
        KCENTER_K,
    )

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: [math.floor(float(v) * 10000000) for v in r.embedding]
        for r in em
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    first = min(vecs)
    chosen = [(1, first, 0)]
    dist = {vid: d2(v, vecs[first]) for vid, v in vecs.items()}
    for i in range(2, KCENTER_K + 1):
        nxt = min(vecs, key=lambda vid: (-dist[vid], vid))
        chosen.append((i, nxt, dist[nxt]))
        for vid, v in vecs.items():
            dist[vid] = min(dist[vid], d2(v, vecs[nxt]))
    got = sorted(
        (r.sel_rank, r.vec_id, r.radius7)
        for r in get_query("cluster_kcenter_greedy").fn(spark, sf_dir).collect()
    )
    assert got == chosen
    # covering radius is non-increasing across picks
    radii = [r for _, _, r in chosen[1:]]
    assert radii == sorted(radii, reverse=True)


def test_decision_stump_matches_python_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per = {}
    for r in li:
        pos, tot = per.get(r.l_discount, (0, 0))
        per[r.l_discount] = (pos + (r.l_returnflag == "R"), tot + 1)
    p = sum(a for a, _ in per.values())
    n = sum(b for _, b in per.values())

    def h(pp, nn):
        if pp == 0 or pp == nn:
            return 0.0
        q, r_ = pp / nn, (nn - pp) / nn
        return -(q * math.log(q) + r_ * math.log(r_))

    want = {}
    pl = nl = 0
    for v in sorted(per):
        pl += per[v][0]
        nl += per[v][1]
        if nl == n:
            continue
        gain = h(p, n) - (nl / n) * h(pl, nl) - ((n - nl) / n) * h(
            p - pl, n - nl
        )
        want[v] = (nl, pl, math.floor(gain * 1e12))
    got = {
        r.threshold: (r.n_left, r.pos_left, r.gain12)
        for r in get_query("ml_decision_stump").fn(spark, sf_dir).collect()
    }
    assert got == want
    best_rows = [
        r
        for r in get_query("ml_decision_stump").fn(spark, sf_dir).collect()
        if r.is_best
    ]
    assert len(best_rows) == 1
    expect_best = min(want, key=lambda v: (-want[v][2], v))
    assert best_rows[0].threshold == expect_best


def test_hhi_matches_python_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    su = {
        r.s_suppkey: r.s_nationkey
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    na = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    rev = {}
    for r in li:
        key = (na[su[r.l_suppkey]], r.l_suppkey)
        rev[key] = rev.get(key, 0) + int(round(r.l_extendedprice * 100))
    per_nation = {}
    for (nation, _), c in rev.items():
        per_nation.setdefault(nation, []).append(c)
    got = {
        r.nation: r
        for r in get_query("agg_hhi_concentration").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per_nation)
    for nation, cs in per_nation.items():
        total = sum(cs)
        hhi12 = sum(math.floor((c / total) * (c / total) * 1e12) for c in cs)
        assert got[nation].n_suppliers == len(cs)
        assert got[nation].hhi12 == hhi12
        # HHI bounds: 1/n (perfect competition) .. 1 (monopoly)
        assert 1 / len(cs) - 1e-6 <= got[nation].hhi <= 1.0


def test_simpsons_matches_python_reference(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    seg = {}
    for r in o:
        high = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        hit = r.o_orderstatus == "F"
        for s in (r.o_orderdate.year, 0):
            c = seg.setdefault(s, [0, 0, 0, 0])
            if high:
                c[0] += 1
                c[1] += hit
            else:
                c[2] += 1
                c[3] += hit
    got = {
        r.segment: r
        for r in get_query("dq_simpsons_reversal").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(seg)
    for s, (nh, fh, nl, fl) in seg.items():
        r = got[s]
        assert (r.n_high, r.f_high, r.n_low, r.f_low) == (nh, fh, nl, fl)
        assert r.rate_high12 == fh * 10**12 // nh
        assert r.rate_low12 == fl * 10**12 // nl
        assert r.high_wins == (fh * 10**12 // nh > fl * 10**12 // nl)


def test_rolling_median_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.n))
    got = {
        (r.event_type, r.day): r.med7
        for r in get_query("ts_rolling_median_trend").fn(spark, sf_dir).collect()
    }
    count = 0
    for et, pts in series.items():
        pts.sort()
        ns = [n for _, n in pts]
        for i, (day, _) in enumerate(pts):
            win = sorted(ns[max(0, i - 3) : i + 4])
            s = len(win)
            med = (
                float(win[s // 2])
                if s % 2 == 1
                else (win[s // 2 - 1] + win[s // 2]) / 2
            )
            assert got[(et, day)] == round(med, 1), (et, day)
            count += 1
    assert count == len(got)


def test_lead_lag_xcorr_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    a = {r.day: r.n for r in daily if r.event_type == "click"}
    b = {r.day: r.n for r in daily if r.event_type == "purchase"}
    import datetime

    got = {
        r.lag: r for r in get_query("ts_lead_lag_xcorr").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(range(-3, 4))
    for lag in range(-3, 4):
        pairs = [
            (a[d], b[d + datetime.timedelta(days=lag)])
            for d in a
            if d + datetime.timedelta(days=lag) in b
        ]
        n = len(pairs)
        sa = sum(x for x, _ in pairs)
        sb = sum(y for _, y in pairs)
        saa = sum(x * x for x, _ in pairs)
        sbb = sum(y * y for _, y in pairs)
        sab = sum(x * y for x, y in pairs)
        r = (n * sab - sa * sb) / (
            math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        )
        assert got[lag].n_days == n
        assert abs(got[lag].xcorr - r) < 1e-5


def test_monroe_log_odds_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = {}
    for d in docs:
        is_a = d.lang == "en"
        for w in d.text.strip().lower().split(" "):
            c = counts.setdefault(w, [0, 0])
            c[0 if is_a else 1] += 1
    kept = {w: c for w, c in counts.items() if c[0] + c[1] >= 5}
    na = sum(c[0] for c in kept.values())
    nb = sum(c[1] for c in kept.values())
    v = len(kept)
    aw, a0 = 0.01, 0.01 * v
    got = {
        r.w: r for r in get_query("text_log_odds_monroe").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(kept)
    for w, (ya, yb) in kept.items():
        delta = math.log((ya + aw) / (na + a0 - ya - aw)) - math.log(
            (yb + aw) / (nb + a0 - yb - aw)
        )
        z = delta / math.sqrt(1 / (ya + aw) + 1 / (yb + aw))
        assert (got[w].ya, got[w].yb) == (ya, yb)
        assert abs(got[w].z - z) < 1e-5
    # sign sanity: a word used only in English scores positive
    only_en = [w for w, (ya, yb) in kept.items() if yb == 0 and ya >= 5]
    assert all(got[w].z > 0 for w in only_en)


def test_percent_rank_cume_matches_python_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r.l_quantity)
    want = {}
    for g, vals in groups.items():
        vals.sort()
        n = len(vals)
        from bisect import bisect_left, bisect_right

        for q in set(vals):
            rank = bisect_left(vals, q) + 1
            peers_le = bisect_right(vals, q)
            want[(g, q)] = (
                round((rank - 1) / (n - 1), 9),
                round(peers_le / n, 9),
            )
    rows = get_query("window_percent_rank_cume").fn(spark, sf_dir).collect()
    assert len(rows) == len(li)
    for r in rows:
        pr, cd = want[(r.l_returnflag, r.l_quantity)]
        assert (r.pr, r.cd) == (pr, cd)


def test_cramers_v_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    cells = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            "event_type", F.dayofweek(F.col("ts").cast("date")).alias("dow")
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .collect()
    )
    rt, ct, n = {}, {}, 0
    for r in cells:
        rt[r.event_type] = rt.get(r.event_type, 0) + r.o
        ct[r.dow] = ct.get(r.dow, 0) + r.o
        n += r.o
    chi2 = 0.0
    for r in cells:
        e = rt[r.event_type] * ct[r.dow] / n
        chi2 += round((r.o - e) ** 2 / e, 9)
    v = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    got = get_query("agg_cramers_v").fn(spark, sf_dir).collect()[0]
    assert got.n == n
    assert abs(got.chi2 - round(chi2, 6)) < 1e-6
    assert abs(got.cramers_v - v) < 1e-5
    assert 0.0 <= got.cramers_v <= 1.0


def test_mcc_matches_python_reference(spark, sf_dir):
    conf = {
        (r.true_label, r.pred_label): r.n
        for r in get_query("vec_nearest_centroid_assign")
        .fn(spark, sf_dir)
        .collect()
    }
    s = sum(conf.values())
    corr = sum(v for (t, p), v in conf.items() if t == p)
    tk, pk = {}, {}
    for (t, p), v in conf.items():
        tk[t] = tk.get(t, 0) + v
        pk[p] = pk.get(p, 0) + v
    labels = set(tk) | set(pk)
    sum_pt = sum(tk.get(l, 0) * pk.get(l, 0) for l in labels)
    sum_tt = sum(t * t for t in tk.values())
    sum_pp = sum(p * p for p in pk.values())
    mcc = (corr * s - sum_pt) / (
        math.sqrt(s * s - sum_pp) * math.sqrt(s * s - sum_tt)
    )
    got = get_query("eval_mcc_multiclass").fn(spark, sf_dir).collect()[0]
    assert (got.n, got.corr) == (s, corr)
    assert abs(got.mcc - mcc) < 1e-5
    assert -1.0 <= got.mcc <= 1.0


def test_anova_weekday_matches_python_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.dayofweek(F.col("ts").cast("date")).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    groups = {}
    for r in daily:
        groups.setdefault(r.event_type, {}).setdefault(r.dow, []).append(r.n)
    got = {
        r.event_type: r
        for r in get_query("ts_anova_weekday").fn(spark, sf_dir).collect()
    }
    for et, by_dow in groups.items():
        xs = [x for g in by_dow.values() for x in g]
        nt, k = len(xs), len(by_dow)
        grand = sum(xs) / nt
        ssb = sum(
            len(g) * (sum(g) / len(g) - grand) ** 2 for g in by_dow.values()
        )
        ssw = sum(
            (x - sum(g) / len(g)) ** 2 for g in by_dow.values() for x in g
        )
        f = (ssb / (k - 1)) / (ssw / (nt - k))
        assert got[et].k == k and got[et].n_days == nt
        assert abs(got[et].f_stat - f) < 1e-4
        assert got[et].f_stat >= 0


def test_ttr_hapax_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = {}
    for d in docs:
        for w in d.text.strip().lower().split(" "):
            key = (d.lang, w)
            counts[key] = counts.get(key, 0) + 1
    per_lang = {}
    for (lang, _), c in counts.items():
        s = per_lang.setdefault(lang, [0, 0, 0])  # tokens, types, hapax
        s[0] += c
        s[1] += 1
        s[2] += c == 1
    got = {
        r.lang: r for r in get_query("text_ttr_hapax").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(per_lang)
    for lang, (tok, typ, hap) in per_lang.items():
        r = got[lang]
        assert (r.n_tokens, r.n_types, r.n_hapax) == (tok, typ, hap)
        assert r.ttr == round(typ / tok, 6)
        assert r.hapax_share == round(hap / typ, 6)
