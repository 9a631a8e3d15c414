"""Round-12 operators vs independent Python references + closed-form
boundary pins (the r11 test model: every new oracle-checked operator gets
a from-scratch reimplementation on the same fixture AND at least one
input where the statistic has a known closed form)."""

from __future__ import annotations

import math

from avro_parquet_spark_example_spark.registry import get_query


def _quantities(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    by_flag: dict[str, list[int]] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(int(r.l_quantity))
    for xs in by_flag.values():
        xs.sort()
    return by_flag


def _type1(xs: list[int], q: int) -> int:
    """Smallest value whose running count reaches ceil(q·n/100)."""
    n = len(xs)
    return xs[(q * n + 99) // 100 - 1]


def test_quantile_bands_match_python_reference(spark, sf_dir):
    by_flag = _quantities(spark, sf_dir)
    rows = {
        r.l_returnflag: r
        for r in get_query("agg_quantile_bands_exact")
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(by_flag)
    for flag, xs in by_flag.items():
        r = rows[flag]
        assert r.n == len(xs)
        for q in (25, 50, 75, 90):
            assert r[f"p{q}"] == _type1(xs, q), (flag, q)


def test_trimmed_winsorized_match_python_reference(spark, sf_dir):
    by_flag = _quantities(spark, sf_dir)
    rows = {
        r.l_returnflag: r
        for r in get_query("agg_trimmed_winsorized_mean")
        .fn(spark, sf_dir)
        .collect()
    }
    for flag, xs in by_flag.items():
        n = len(xs)
        k = n // 20
        mid = xs[k : n - k]
        tm = sum(mid) / (n - 2 * k)
        wm = (sum(mid) + k * xs[k] + k * xs[n - k - 1]) / n
        r = rows[flag]
        assert (r.n, r.n_trim) == (n, k)
        assert abs(r.trimmed_mean - round(tm, 6)) < 1e-9
        assert abs(r.winsorized_mean - round(wm, 6)) < 1e-9


def _median_type1(xs: list[int]) -> int:
    return xs[(len(xs) + 1) // 2 - 1]


def test_mad_and_outliers_match_python_reference(spark, sf_dir):
    by_flag = _quantities(spark, sf_dir)
    mads = {
        r.l_returnflag: r
        for r in get_query("agg_mad_robust").fn(spark, sf_dir).collect()
    }
    outs = {
        r.l_returnflag: r
        for r in get_query("dq_outlier_mad_flags").fn(spark, sf_dir).collect()
    }
    for flag, xs in by_flag.items():
        med = _median_type1(xs)
        devs = sorted(abs(x - med) for x in xs)
        mad = _median_type1(devs)
        r = mads[flag]
        assert (r.n, r.median, r.mad) == (len(xs), med, mad)
        n_out = sum(1 for x in xs if abs(x - med) > 3 * mad)
        o = outs[flag]
        assert (o.n, o.n_outlier) == (len(xs), n_out)
        assert abs(o.outlier_share - round(n_out / len(xs), 6)) < 1e-9


def test_hodges_lehmann_matches_python_reference(spark, sf_dir):
    from collections import Counter

    by_flag = _quantities(spark, sf_dir)
    xs, ys = by_flag["R"], by_flag["A"]
    cx, cy = Counter(xs), Counter(ys)
    diff = Counter()
    for vx, fx in cx.items():
        for vy, fy in cy.items():
            diff[vx - vy] += fx * fy
    total = sum(diff.values())
    cum = 0
    hl = None
    for d in sorted(diff):
        cum += diff[d]
        if 2 * cum >= total:
            hl = d
            break
    row = get_query("agg_hodges_lehmann_shift").fn(spark, sf_dir).collect()[0]
    assert (row.n_x, row.n_y, row.hl_shift) == (len(xs), len(ys), hl)


def test_acf_matches_python_reference_and_lag0_pins_at_one(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, dict] = {}
    for r in daily:
        series.setdefault(r.event_type, {})[r.day] = r.n
    got = {
        (r.event_type, r.lag): r
        for r in get_query("ts_autocorr_acf").fn(spark, sf_dir).collect()
    }
    import datetime

    for et, s in series.items():
        for lag in range(8):
            pairs = [
                (x, s[d + datetime.timedelta(days=lag)])
                for d, x in s.items()
                if d + datetime.timedelta(days=lag) in s
            ]
            n = len(pairs)
            key = (et, lag)
            if n < 2:
                continue
            sa = sum(a for a, _ in pairs)
            sb = sum(b for _, b in pairs)
            saa = sum(a * a for a, _ in pairs)
            sbb = sum(b * b for _, b in pairs)
            sab = sum(a * b for a, b in pairs)
            den = math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
            r = (n * sab - sa * sb) / den if den else float("nan")
            row = got[key]
            assert row.n_days == n
            if den:
                assert abs(row.acf - round(r, 6)) < 1e-5, key
            if lag == 0:
                # closed form: lag-0 autocorrelation of any
                # non-constant series is exactly 1
                assert abs(row.acf - 1.0) < 1e-9


def test_dim_variance_matches_python_reference(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    dims = len(emb[0].embedding)
    sums = [0] * dims
    sqs = [0] * dims
    for r in emb:
        for i, v in enumerate(r.embedding):
            v7 = math.floor(float(v) * 10000000)
            sums[i] += v7
            sqs[i] += v7 * v7
    n = len(emb)
    var = [
        ((n * sqs[i] - sums[i] * sums[i]) / (n * n)) / 1e14
        for i in range(dims)
    ]
    order = sorted(range(dims), key=lambda i: (-var[i], i))[:8]
    rows = get_query("vec_dim_variance_topk").fn(spark, sf_dir).collect()
    assert [r.pos for r in rows] == [i + 1 for i in order]
    for r in rows:
        assert r.n == n
        assert abs(r.variance - round(var[r.pos - 1], 9)) < 1e-12


def test_round12_closed_form_boundaries(spark):
    """Degenerate-input pins: MAD of a constant column is 0, a group's
    HL shift against itself is 0, trimming nothing reproduces the plain
    mean, and every quantile of a constant column is that constant."""
    from avro_parquet_spark_example_spark.engine import Engine

    eng = Engine(spark=spark)
    const = spark.createDataFrame(
        [("g", 7)] * 10, "grp string, v long"
    )
    r = eng.mad(const, group="grp", value="v").collect()[0]
    assert (r.median, r.mad) == (7, 0)
    q = eng.quantile_bands(const, group="grp", value="v").collect()[0]
    assert (q.p25, q.p50, q.p75, q.p90) == (7, 7, 7, 7)

    mixed = spark.createDataFrame(
        [("g", v) for v in (1, 2, 2, 3, 9)], "grp string, v long"
    )
    t = eng.trimmed_mean(
        mixed, group="grp", value="v", trim_denom=100
    ).collect()[0]
    # k = 5 div 100 = 0: nothing trimmed → both estimates equal the mean
    assert t.n_trim == 0
    assert abs(t.trimmed_mean - 3.4) < 1e-9
    assert abs(t.winsorized_mean - 3.4) < 1e-9

    hl = eng.hl_shift(
        mixed.select("v"), mixed.select("v"), value="v"
    ).collect()[0]
    assert hl.hl_shift == 0


def test_engine_round12_robust_facade_parity(spark, sf_dir):
    """Facade methods reproduce the registered instances (single-source
    rule) for the round-12 robust-statistics family."""
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.engine import Engine
    from avro_parquet_spark_example_spark.sources.catalog import load

    eng = Engine(spark=spark, sf_dir=sf_dir)
    li = load(spark, sf_dir, "lineitem")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    def want(key):
        return rows(get_query(key).fn(spark, sf_dir))

    assert rows(
        eng.quantile_bands(li, group="l_returnflag", value="l_quantity")
    ) == want("agg_quantile_bands_exact")
    assert rows(
        eng.trimmed_mean(li, group="l_returnflag", value="l_quantity")
    ) == want("agg_trimmed_winsorized_mean")
    assert rows(
        eng.mad(li, group="l_returnflag", value="l_quantity")
    ) == want("agg_mad_robust")
    assert rows(
        eng.outlier_flags(li, group="l_returnflag", value="l_quantity")
    ) == want("dq_outlier_mad_flags")
    assert rows(
        eng.hl_shift(
            li.filter(F.col("l_returnflag") == "R").select("l_quantity"),
            li.filter(F.col("l_returnflag") == "A").select("l_quantity"),
            value="l_quantity",
        )
    ) == want("agg_hodges_lehmann_shift")

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    assert rows(
        eng.autocorr(daily, key="event_type", order="day", value="n")
    ) == want("ts_autocorr_acf")

    emb = load(spark, sf_dir, "embeddings")
    got = (
        eng.dim_variance(emb)
        .orderBy(F.col("variance").desc(), "pos")
        .limit(8)
    )
    assert rows(got) == want("vec_dim_variance_topk")


def test_doclen_quantiles_match_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_lang: dict[str, list[int]] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(int(r.n_chars))
    for xs in by_lang.values():
        xs.sort()
    rows = {
        r.lang: r
        for r in get_query("text_doclen_quantiles").fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(by_lang)
    for lang, xs in by_lang.items():
        r = rows[lang]
        assert r.n == len(xs)
        for q in (25, 50, 75, 90):
            assert r[f"p{q}"] == _type1(xs, q), (lang, q)


def test_cluster_size_histogram_matches_python_reference(spark, sf_dir):
    from collections import Counter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    keys = [r.text.strip().lower() for r in docs]
    keys += [r.text.strip().lower() for r in docs if r.doc_id < 50]
    sizes = Counter(Counter(keys).values())
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in get_query("dedup_cluster_size_histogram")
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == {
        sz: (cnt, sz * cnt) for sz, cnt in sizes.items()
    }
    # conservation law: Σ n_docs == corpus + injected copies
    assert sum(nd for _, nd in got.values()) == len(keys)


def test_fano_matches_python_reference_and_poisson_line(spark, sf_dir):
    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.n)
    rows = {
        r.event_type: r
        for r in get_query("ts_burstiness_fano").fn(spark, sf_dir).collect()
    }
    for et, xs in series.items():
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        mean = s1 / n
        fano = (n * s2 - s1 * s1) / (n * s1)
        r = rows[et]
        assert r.n_days == n
        assert abs(r.mean_daily - round(mean, 6)) < 1e-9
        assert abs(r.fano - round(fano, 6)) < 1e-9
        assert r.fano >= 0.0

    # closed form: a constant series is maximally regular — Fano 0
    from avro_parquet_spark_example_spark.engine import Engine

    const = spark.createDataFrame(
        [("g", i, 5) for i in range(10)], "k string, day long, n long"
    )
    f0 = Engine(spark=spark).fano(const, key="k", value="n").collect()[0]
    assert f0.fano == 0.0


def test_column_profile_matches_python_reference(spark, sf_dir):
    import datetime
    from decimal import Decimal

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    rows = {
        r.col_name: r
        for r in get_query("dq_column_profile").fn(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    n = len(orders)
    keys = [r.o_orderkey for r in orders]
    r = rows["o_orderkey"]
    assert (r.n, r.n_null, r.n_distinct) == (n, 0, len(set(keys)))
    assert (r.min_s, r.max_s) == (str(min(keys)), str(max(keys)))
    prices = [
        Decimal(str(round(r.o_totalprice, 2))) for r in orders
    ]
    r = rows["o_totalprice"]
    assert r.n_distinct == len(set(prices))
    dates = [
        r.o_orderdate.date()
        if isinstance(r.o_orderdate, datetime.datetime)
        else r.o_orderdate
        for r in orders
    ]
    r = rows["o_orderdate"]
    assert (r.min_s, r.max_s) == (str(min(dates)), str(max(dates)))


def test_engine_round12_batch2_facade_parity(spark, sf_dir):
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.engine import Engine
    from avro_parquet_spark_example_spark.operators.dedup import (
        with_injected_duplicates,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    eng = Engine(spark=spark, sf_dir=sf_dir)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    def want(key):
        return rows(get_query(key).fn(spark, sf_dir))

    docs = with_injected_duplicates(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    assert rows(eng.cluster_size_histogram(docs)) == want(
        "dedup_cluster_size_histogram"
    )

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    assert rows(eng.fano(daily, key="event_type", value="n")) == want(
        "ts_burstiness_fano"
    )

    o = load(spark, sf_dir, "orders")
    rendered = {
        "o_totalprice": F.col("o_totalprice").cast("decimal(12,2)"),
        "o_orderdate": F.col("o_orderdate").cast("date"),
    }
    got = eng.column_profile(
        o,
        (
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
        rendered=rendered,
    )
    assert rows(got) == want("dq_column_profile")


def test_kcenter_leaves_no_cached_blocks(spark, sf_dir):
    """ADVICE r11 #2 regression: kcenter_greedy persisted its final
    running-min frame and never released it — in a long single-JVM
    session each call leaked a corpus-sized DISK_ONLY block. After the
    fix, repeated calls must leave the storage layer exactly as they
    found it."""
    from avro_parquet_spark_example_spark.operators.clustering import (
        kcenter_greedy,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    # Leak detection is by RDD ID, not by global count: other operators'
    # eager localCheckpoints (r15) leave persisted RDDs that the async
    # ContextCleaner releases at unpredictable times, so the total count
    # drifts DOWN mid-test (observed 119 -> 115) even though kcenter
    # leaks nothing. A NEW id surviving a call is exactly the ADVICE
    # r11 #2 regression; ids vanishing are other frames being cleaned.
    def cached_ids() -> set:
        return set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )

    before = cached_ids()
    pool = load(spark, sf_dir, "embeddings").limit(200)
    for _ in range(3):
        assert kcenter_greedy(pool, k=4).count() == 4
        leaked = cached_ids() - before
        assert not leaked, (
            f"kcenter_greedy left persisted blocks behind: {leaked}"
        )


def test_ece_brier_match_python_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    pairs = [
        (int(round(r.l_discount * 100)), 1 if r.l_returnflag == "R" else 0)
        for r in li
    ]
    n = len(pairs)
    bins: dict[int, list[int]] = {}
    for pct, y in pairs:
        c = bins.setdefault(pct, [0, 0])
        c[0] += 1
        c[1] += y
    ece = sum(
        abs(10 * pos - pct * cnt) for pct, (cnt, pos) in bins.items()
    ) / (10 * n)
    row = get_query("eval_ece_calibration").fn(spark, sf_dir).collect()[0]
    assert (row.n_bins, row.n) == (len(bins), n)
    assert abs(row.ece - round(ece, 6)) < 1e-9

    brier = sum((pct - 10 * y) ** 2 for pct, y in pairs) / (100 * n)
    rb = get_query("eval_brier_score").fn(spark, sf_dir).collect()[0]
    assert rb.n == n
    assert abs(rb.brier - round(brier, 6)) < 1e-9

    # closed forms: a perfect 0/1 predictor has ECE = 0 and Brier = 0;
    # a constant p=0.5 predictor on balanced labels has Brier = 0.25
    from avro_parquet_spark_example_spark.engine import Engine

    eng = Engine(spark=spark)
    perfect = spark.createDataFrame(
        [(10, 1)] * 5 + [(0, 0)] * 5, "pct long, y long"
    )
    assert eng.calibration_error(
        perfect, pred="pct", outcome="y", prob_denom=10
    ).collect()[0].ece == 0.0
    assert eng.brier(
        perfect, pred="pct", outcome="y", prob_denom=10
    ).collect()[0].brier == 0.0
    half = spark.createDataFrame(
        [(5, 1)] * 5 + [(5, 0)] * 5, "pct long, y long"
    )
    assert abs(
        eng.brier(half, pred="pct", outcome="y", prob_denom=10)
        .collect()[0]
        .brier
        - 0.25
    ) < 1e-9


def test_kl_drift_matches_python_reference(spark, sf_dir):
    import datetime
    import math as m

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    split = datetime.datetime(1997, 1, 1)
    ref = [0] * 10
    cur = [0] * 10
    for r in orders:
        b = min(int(r.o_totalprice // 50000), 9)
        od = r.o_orderdate
        if isinstance(od, datetime.date) and not isinstance(
            od, datetime.datetime
        ):
            od = datetime.datetime(od.year, od.month, od.day)
        (ref if od < split else cur)[b] += 1
    n_ref, n_cur = sum(ref), sum(cur)
    rows = {
        r.bucket: r
        for r in get_query("dq_drift_kl").fn(spark, sf_dir).collect()
    }
    total = 0.0
    for b in range(10):
        p_cur = (cur[b] + 1.0) / (n_cur + 10)
        p_ref = (ref[b] + 1.0) / (n_ref + 10)
        term = p_cur * m.log(p_cur / p_ref)
        r = rows[b]
        assert (r.c_ref, r.c_cur) == (ref[b], cur[b])
        assert abs(r.kl_term - round(term, 9)) < 1e-9
        total += term
    # smoothed KL of two non-identical samples is non-negative up to
    # smoothing wiggle; identical distributions would pin at ~0
    assert total > -1e-6


def test_theil_sen_matches_python_reference(spark, sf_dir):
    import math as m

    from pyspark.sql import functions as F

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.n))
    rows = {
        r.event_type: r
        for r in get_query("ts_theil_sen_slope").fn(spark, sf_dir).collect()
    }
    for et, pts in series.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dd = (pts[j][0] - pts[i][0]).days
                slopes.append(m.floor((pts[j][1] - pts[i][1]) * 1e6 / dd))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]
        r = rows[et]
        assert r.n_pairs == len(slopes)
        assert abs(r.sen_slope - round(med / 1e6, 6)) < 1e-9

    # closed form: a perfectly linear series has Theil-Sen slope exactly
    # its increment, regardless of an injected single outlier's pull on
    # the MEAN-based estimators
    from avro_parquet_spark_example_spark.engine import Engine

    import datetime

    base = datetime.date(2024, 1, 1)
    lin = [
        ("g", base + datetime.timedelta(days=i), 100 + 3 * i)
        for i in range(10)
    ]
    df = spark.createDataFrame(lin, "k string, day date, n long")
    r = (
        Engine(spark=spark)
        .theil_sen(df, key="k", order="day", value="n")
        .collect()[0]
    )
    assert r.sen_slope == 3.0


def test_engine_round12_batch3_facade_parity(spark, sf_dir):
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.engine import Engine
    from avro_parquet_spark_example_spark.sources.catalog import load

    eng = Engine(spark=spark, sf_dir=sf_dir)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    def want(key):
        return rows(get_query(key).fn(spark, sf_dir))

    b = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("pct"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    assert rows(
        eng.calibration_error(b, pred="pct", outcome="y", prob_denom=10)
    ) == want("eval_ece_calibration")
    assert rows(
        eng.brier(b, pred="pct", outcome="y", prob_denom=10)
    ) == want("eval_brier_score")

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    assert rows(
        eng.theil_sen(daily, key="event_type", order="day", value="n")
    ) == want("ts_theil_sen_slope")
