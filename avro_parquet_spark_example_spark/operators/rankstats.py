"""Rank / ordinal statistics (round 14): the nonparametric test-and-
effect-size family over bounded value grids — Jonckheere–Terpstra,
Goodman–Kruskal gamma (+ Somers' D, tau-b), Mood's median test, the
Wald–Wolfowitz runs test, Cliff's delta, weighted Cohen's kappa, the
exact two-sample Kolmogorov–Smirnov distance, and the Lorenz curve.

Shared design (the DeLong/g_test discipline): every statistic reduces
to exact-integer counting over a bounded (group × value) grid — one
map-side-combined corpus aggregate, then grid algebra with windows and
pair joins that are grid-sized by construction — so both engines carry
exact integers (DECIMAL(38,0) before any product that can cross int64;
the eval_auc_delong_se overflow lesson) into ONE fixed-order IEEE
expression at the end. Chi-square / z / KS critical values are shared
precomputed literals; no runtime special functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load

#: Shared critical-value literals (both engines compare UNROUNDED doubles
#: against these).
_Z95_2S = "1.959963984540054"  # z_{0.975}
_CHI2_95_DF4 = "9.487729036781154"
#: KS two-sided alpha=0.05 asymptotic coefficient sqrt(-ln(0.025)/2).
_KS_C05 = "1.3581015157406195"

#: Spark/DuckDB weekday twins (Spark dayofweek: 1=Sun..7=Sat; DuckDB
#: DAYOFWEEK: 0=Sun..6=Sat, shifted +1 in oracles — the stat_g_test rule).
_DOW_DUCK = "DAYOFWEEK(CAST(ts AS DATE)) + 1"

#: Cliff's delta magnitude bands (Romano et al. 2006 thresholds).
_CLIFF_BANDS = (0.147, 0.33, 0.474)


def _dow_spark():
    return F.dayofweek(F.col("ts").cast("date"))


def _q100():
    """events.value quantized to exact integer cents (iusum rule)."""
    return F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")


# --------------------------------------------------------------------------
# Jonckheere–Terpstra ordered-alternative test
# --------------------------------------------------------------------------


@register(
    "stat_jonckheere_terpstra",
    oracle=f"""
    WITH cells AS (
        SELECT event_type, {_DOW_DUCK} AS g,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ),
    vals AS (SELECT DISTINCT event_type, v FROM cells),
    dows AS (SELECT UNNEST(GENERATE_SERIES(1, 7)) AS g),
    grid AS (
        SELECT x.event_type, d.g, x.v, COALESCE(c.c, 0) AS c
        FROM vals x CROSS JOIN dows d
        LEFT JOIN cells c
          ON c.event_type = x.event_type AND c.g = d.g AND c.v = x.v
    ),
    cum AS (
        SELECT event_type, g, v, c,
               CAST(COALESCE(SUM(c) OVER (
                   PARTITION BY event_type, g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cumv
        FROM grid
    ),
    pre AS (
        SELECT event_type, g, v, c,
               CAST(COALESCE(SUM(cumv) OVER w, 0) AS BIGINT) AS lessg,
               CAST(COALESCE(SUM(c) OVER w, 0) AS BIGINT) AS eqg
        FROM cum
        WINDOW w AS (PARTITION BY event_type, v ORDER BY g
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    jt AS (
        SELECT event_type,
               CAST(SUM(c * (2 * lessg + eqg)) AS BIGINT) AS jt2
        FROM pre GROUP BY 1
    ),
    gs AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
                   AS sn2,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c-1) * (2*c+5))
                   AS DECIMAL(38,0)) AS sn_a,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c-1) * (c-2))
                   AS DECIMAL(38,0)) AS sn_b,
               CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c-1))
                   AS DECIMAL(38,0)) AS sn_c
        FROM (SELECT event_type, g, CAST(SUM(c) AS BIGINT) AS c
              FROM cells GROUP BY 1, 2)
        GROUP BY 1
    ),
    ts AS (
        SELECT event_type,
               CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t-1) * (2*t+5))
                   AS DECIMAL(38,0)) AS st_a,
               CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t-1) * (t-2))
                   AS DECIMAL(38,0)) AS st_b,
               CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t-1))
                   AS DECIMAL(38,0)) AS st_c
        FROM (SELECT event_type, v, CAST(SUM(c) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT j.event_type, g.n, j.jt2,
           ROUND((CAST(g.n AS DOUBLE) * g.n - CAST(g.sn2 AS DOUBLE)) / 4.0,
                 6) AS mean_jt,
           CASE WHEN g.n < 3 THEN NULL ELSE ROUND(
             (CAST(g.n AS DECIMAL(38,0)) * (g.n-1) * (2*g.n+5)
              - g.sn_a - t.st_a) / 72.0
             + CAST(g.sn_b AS DOUBLE) * CAST(t.st_b AS DOUBLE)
               / (36.0 * g.n * (g.n-1) * (g.n-2))
             + CAST(g.sn_c AS DOUBLE) * CAST(t.st_c AS DOUBLE) / (8.0 * g.n * (g.n-1)),
             6) END AS var_jt,
           CASE WHEN g.n < 3 OR (
               (CAST(g.n AS DECIMAL(38,0)) * (g.n-1) * (2*g.n+5)
                - g.sn_a - t.st_a) / 72.0
               + CAST(g.sn_b AS DOUBLE) * CAST(t.st_b AS DOUBLE)
                 / (36.0 * g.n * (g.n-1) * (g.n-2))
               + CAST(g.sn_c AS DOUBLE) * CAST(t.st_c AS DOUBLE)
                 / (8.0 * g.n * (g.n-1))) = 0
           THEN NULL ELSE ROUND(
             (CAST(j.jt2 AS DOUBLE) / 2.0
              - (CAST(g.n AS DOUBLE) * g.n - CAST(g.sn2 AS DOUBLE)) / 4.0)
             / SQRT(
               (CAST(g.n AS DECIMAL(38,0)) * (g.n-1) * (2*g.n+5)
                - g.sn_a - t.st_a) / 72.0
               + CAST(g.sn_b AS DOUBLE) * CAST(t.st_b AS DOUBLE)
                 / (36.0 * g.n * (g.n-1) * (g.n-2))
               + CAST(g.sn_c AS DOUBLE) * CAST(t.st_c AS DOUBLE) / (8.0 * g.n * (g.n-1))),
             6) END AS z,
           CASE WHEN g.n < 3 OR (
               (CAST(g.n AS DECIMAL(38,0)) * (g.n-1) * (2*g.n+5)
                - g.sn_a - t.st_a) / 72.0
               + CAST(g.sn_b AS DOUBLE) * CAST(t.st_b AS DOUBLE)
                 / (36.0 * g.n * (g.n-1) * (g.n-2))
               + CAST(g.sn_c AS DOUBLE) * CAST(t.st_c AS DOUBLE)
                 / (8.0 * g.n * (g.n-1))) = 0
           THEN FALSE ELSE
           ABS((CAST(j.jt2 AS DOUBLE) / 2.0
              - (CAST(g.n AS DOUBLE) * g.n - CAST(g.sn2 AS DOUBLE)) / 4.0)
             / SQRT(
               (CAST(g.n AS DECIMAL(38,0)) * (g.n-1) * (2*g.n+5)
                - g.sn_a - t.st_a) / 72.0
               + CAST(g.sn_b AS DOUBLE) * CAST(t.st_b AS DOUBLE)
                 / (36.0 * g.n * (g.n-1) * (g.n-2))
               + CAST(g.sn_c AS DOUBLE) * CAST(t.st_c AS DOUBLE) / (8.0 * g.n * (g.n-1))))
             > {_Z95_2S} END AS rejected
    FROM jt j JOIN gs g USING (event_type) JOIN ts t USING (event_type)
    """,
)
def stat_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — JONCKHEERE–TERPSTRA ordered-alternative test (Jonckheere
    1954, Terpstra 1952) per event type: is value stochastically
    INCREASING across the ordered weekday groups Sun..Sat? The test
    every ordered-dose / ordered-cohort analysis wants where
    Kruskal–Wallis only answers "some group differs": JT = Σ_{{i<j}}
    U_ij sums Mann–Whitney counts over ordered group pairs, so it has
    power exactly against monotone trends.

    Exactness: JT is carried DOUBLED (2·#less + #equal per pair — the
    kendall_w midrank trick) as exact integers off two nested
    cumulative windows on the densified (weekday × value) grid — NO
    group-pair join: cum_<v per (group, value), then a second prefix
    over groups at fixed value gives Σ_{{i<j}} in one pass. The
    tie-corrected null variance (Hollander & Wolfe form, three terms
    over group sizes n_i and pooled tie sizes t_v) uses DECIMAL(38,0)
    sums (n³·t³ crosses int64 at ~20k rows — the DeLong lesson), but
    the CROSS products sn_b·st_b / sn_c·st_c are formed in DOUBLE
    (each factor cast first, both engines): the decimal product is
    ~n⁶ per stratum and would overflow precision 38 at ~2.1M rows per
    event_type — NULL var/z on Spark, an overflow error on DuckDB;
    z is ONE fixed-order IEEE expression, rejection on the unrounded
    |z| vs the shared z₀.₉₇₅ literal.

    Scale: one (type, dow, value) counting aggregate; the grid is
    (values × 7) per type and every window partitions it. At 100 TB
    the corpus scan dominates; the grid algebra is value-domain-sized."""
    base = load(spark, sf_dir, "events").select(
        "event_type", _dow_spark().alias("g"), _q100().alias("v")
    )
    return jonckheere_terpstra(base)


def jonckheere_terpstra(base: DataFrame, n_groups: int = 7) -> DataFrame:
    """Frame-level core of :func:`stat_jonckheere_terpstra` (the library
    form the Engine facade exposes): ``base`` has columns (event_type
    stratum key, g ordered group 1..n_groups, v integer value) — one
    row per observation."""
    cells = (
        base.groupBy("event_type", "g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # feeds grid + group sizes + ties
    )
    vals = cells.select("event_type", "v").distinct()
    dows = cells.sparkSession.range(1, n_groups + 1).select(
        F.col("id").cast("int").alias("g")
    )
    grid = (
        vals.crossJoin(F.broadcast(dows))
        .join(cells, ["event_type", "g", "v"], "left")
        .select(
            "event_type", "g", "v", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    wv = (
        Window.partitionBy("event_type", "g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.withColumn(
        "cumv", F.coalesce(F.sum("c").over(wv), F.lit(0)).cast("bigint")
    )
    wg = (
        Window.partitionBy("event_type", "v")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = cum.select(
        "event_type",
        "c",
        F.coalesce(F.sum("cumv").over(wg), F.lit(0))
        .cast("bigint")
        .alias("lessg"),
        F.coalesce(F.sum("c").over(wg), F.lit(0))
        .cast("bigint")
        .alias("eqg"),
    )
    jt = pre.groupBy("event_type").agg(
        F.sum(F.col("c") * (2 * F.col("lessg") + F.col("eqg")))
        .cast("bigint")
        .alias("jt2")
    )
    gsize = cells.groupBy("event_type", "g").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    cd = F.col("c").cast("decimal(38,0)")
    gs = gsize.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(cd * F.col("c")).cast("decimal(38,0)").alias("sn2"),
        F.sum(cd * (F.col("c") - 1) * (2 * F.col("c") + 5))
        .cast("decimal(38,0)")
        .alias("sn_a"),
        F.sum(cd * (F.col("c") - 1) * (F.col("c") - 2))
        .cast("decimal(38,0)")
        .alias("sn_b"),
        F.sum(cd * (F.col("c") - 1)).cast("decimal(38,0)").alias("sn_c"),
    )
    tsize = cells.groupBy("event_type", "v").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    td = F.col("t").cast("decimal(38,0)")
    ts = tsize.groupBy("event_type").agg(
        F.sum(td * (F.col("t") - 1) * (2 * F.col("t") + 5))
        .cast("decimal(38,0)")
        .alias("st_a"),
        F.sum(td * (F.col("t") - 1) * (F.col("t") - 2))
        .cast("decimal(38,0)")
        .alias("st_b"),
        F.sum(td * (F.col("t") - 1)).cast("decimal(38,0)").alias("st_c"),
    )
    j = jt.join(gs, "event_type").join(ts, "event_type")
    n = F.col("n")
    mean_jt = (n.cast("double") * n - F.col("sn2").cast("double")) / 4.0
    var_jt = (
        (
            n.cast("decimal(38,0)") * (n - 1) * (2 * n + 5)
            - F.col("sn_a")
            - F.col("st_a")
        ).cast("double")
        / 72.0
        # each factor is cast to double BEFORE the product: sn_b*st_b is
        # ~n^6 per stratum and overflows DECIMAL(38,0) at ~2.1M rows per
        # event_type (right at the x100 scale-up edge — Spark would emit
        # NULL var/z, DuckDB an overflow error); precision loss is
        # irrelevant since the term is divided by 36*n(n-1)(n-2) in
        # double anyway. Oracle carries the identical shape.
        + F.col("sn_b").cast("double") * F.col("st_b").cast("double")
        / (36.0 * n * (n - 1) * (n - 2))
        + F.col("sn_c").cast("double") * F.col("st_c").cast("double")
        / (8.0 * n * (n - 1))
    )
    z = (F.col("jt2").cast("double") / 2.0 - mean_jt) / F.sqrt(var_jt)
    # degenerate-margin guard (r15 self-review): n < 3 divides by zero
    # inside the variance itself; a fully-tied single-group stratum has
    # var_jt exactly 0 (all three terms cancel — derived in the review
    # note) so z would divide by zero. ANSI Spark throws where DuckDB
    # returns NULL; NULL var/z, FALSE rejected on both engines.
    null_d = F.lit(None).cast("double")
    n_small = F.col("n") < 3
    return j.select(
        "event_type",
        "n",
        "jt2",
        F.round(mean_jt, 6).alias("mean_jt"),
        F.when(n_small, null_d)
        .otherwise(F.round(var_jt, 6))
        .alias("var_jt"),
        F.when(n_small, null_d)
        .when(var_jt == 0, null_d)
        .otherwise(F.round(z, 6))
        .alias("z"),
        F.when(n_small, F.lit(False))
        .when(var_jt == 0, F.lit(False))
        .otherwise(F.abs(z) > F.expr(_Z95_2S))
        .alias("rejected"),
    )


# --------------------------------------------------------------------------
# Goodman–Kruskal gamma / Somers' D / Kendall tau-b over an ordinal grid
# --------------------------------------------------------------------------


@register(
    "stat_gk_gamma_tau",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               DAYOFWEEK(CAST(ts AS DATE)) + 1 AS x,
               LEAST(9, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) // 1000)
                   AS y,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
                             THEN CAST(a.n AS DECIMAL(19,0)) * b.n
                             ELSE 0 END) AS DECIMAL(38,0)) AS c,
               CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
                             THEN CAST(a.n AS DECIMAL(19,0)) * b.n
                             ELSE 0 END) AS DECIMAL(38,0)) AS d,
               CAST(SUM(CASE WHEN b.x > a.x AND b.y = a.y
                             THEN CAST(a.n AS DECIMAL(19,0)) * b.n
                             ELSE 0 END) AS DECIMAL(38,0)) AS ty,
               CAST(SUM(CASE WHEN b.x = a.x AND b.y > a.y
                             THEN CAST(a.n AS DECIMAL(19,0)) * b.n
                             ELSE 0 END) AS DECIMAL(38,0)) AS tx
        FROM cells a JOIN cells b ON b.event_type = a.event_type
        GROUP BY 1
    )
    SELECT event_type, c AS concordant, d AS discordant,
           CASE WHEN c + d = 0 THEN NULL
                ELSE ROUND(CAST(c - d AS DOUBLE)
                           / CAST(c + d AS DOUBLE), 6) END AS gamma,
           CASE WHEN c + d + ty = 0 THEN NULL
                ELSE ROUND(CAST(c - d AS DOUBLE)
                           / CAST(c + d + ty AS DOUBLE), 6)
                END AS somers_dyx,
           CASE WHEN c + d + tx = 0 OR c + d + ty = 0 THEN NULL
                ELSE ROUND(CAST(c - d AS DOUBLE)
                           / SQRT(CAST(c + d + tx AS DOUBLE)
                                  * CAST(c + d + ty AS DOUBLE)), 6)
                END AS tau_b
    FROM pairs
    """,
)
def stat_gk_gamma_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — GOODMAN–KRUSKAL gamma (1954), SOMERS' D (1962), and KENDALL
    tau-b over the ordinal (weekday × value-decile) contingency per
    event type — the three standard ordinal-association coefficients,
    differing only in tie handling: gamma ignores ties, Somers'
    D_(Y|X) penalizes Y-ties (the coefficient behind the AUC identity
    D = 2·AUC − 1), tau-b penalizes both symmetrically.

    Exactness: concordant/discordant/tied pair counts come from ONE
    grid pair self-join on the ≤(7×10)-cell contingency — exact
    DECIMAL(38,0) products of cell counts (pair counts are ~n² per
    stratum and cross int64 at ~3e9 rows/event_type; r15 self-review,
    the JT/DeLong class) — then each coefficient is one fixed-order
    IEEE expression rounded 6, NULL-guarded on its zero-pair
    denominator (single-x/single-y strata: ANSI Spark would throw where
    DuckDB returns NULL).

    Scale: one counting aggregate to ≤70 cells/type; the pair join is
    70² rows by construction. The corpus scan dominates at any SF."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        _dow_spark().alias("x"),
        F.least(F.lit(9), _q100() / F.lit(1000)).cast("bigint").alias("y"),
    )
    return gk_gamma_tau(base)


def gk_gamma_tau(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_gk_gamma_tau` (the library form
    the Engine facade exposes): ``base`` has columns (event_type
    stratum key, x ordinal, y ordinal) — one row per observation; the
    (x × y) contingency must be bounded (it becomes both pair-join
    sides)."""
    cells = (
        base.groupBy("event_type", "x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)  # grid-sized; both join sides
    )
    a = cells.select(
        "event_type",
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.col("n").alias("na"),
    )
    b = cells.select(
        F.col("event_type").alias("etb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("n").alias("nb"),
    )
    # r15 self-review: pair counts are ~n² per stratum and cross int64 at
    # ~3.04e9 rows/event_type — the JT/DeLong overflow class. Each factor
    # is DECIMAL(19,0) so the product is exact DECIMAL(38,0) on both
    # engines; the accumulators (and the output c/d columns) carry
    # DECIMAL(38,0) end to end.
    prod = F.col("na").cast("decimal(19,0)") * F.col("nb").cast(
        "decimal(19,0)"
    )
    pairs = (
        a.join(b, F.col("etb") == F.col("event_type"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")),
                    prod,
                ).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("c"),
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")),
                    prod,
                ).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("d"),
            F.sum(
                F.when(
                    (F.col("xb") > F.col("xa"))
                    & (F.col("yb") == F.col("ya")),
                    prod,
                ).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("ty"),
            F.sum(
                F.when(
                    (F.col("xb") == F.col("xa"))
                    & (F.col("yb") > F.col("ya")),
                    prod,
                ).otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("tx"),
        )
    )
    cmd = F.col("c") - F.col("d")
    cpd = F.col("c") + F.col("d")
    # degenerate-margin guards (r15 self-review): a single-x or single-y
    # stratum has zero comparable pairs — the terminal division would
    # THROW on Spark (ANSI divide-by-zero) while DuckDB returns NULL.
    # Guard each coefficient on its own denominator; NULL on both engines.
    null_d = F.lit(None).cast("double")
    return pairs.select(
        "event_type",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.when(cpd == 0, null_d)
        .otherwise(F.round(cmd.cast("double") / cpd.cast("double"), 6))
        .alias("gamma"),
        F.when(cpd + F.col("ty") == 0, null_d)
        .otherwise(
            F.round(
                cmd.cast("double") / (cpd + F.col("ty")).cast("double"), 6
            )
        )
        .alias("somers_dyx"),
        F.when(
            (cpd + F.col("tx") == 0) | (cpd + F.col("ty") == 0), null_d
        )
        .otherwise(
            F.round(
                cmd.cast("double")
                / F.sqrt(
                    (cpd + F.col("tx")).cast("double")
                    * (cpd + F.col("ty")).cast("double")
                ),
                6,
            )
        )
        .alias("tau_b"),
    )


# --------------------------------------------------------------------------
# Mood's median test (k-group, pooled-median 2×k chi-square)
# --------------------------------------------------------------------------


@register(
    "stat_mood_median",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS q
        FROM events
    ),
    vc AS (
        SELECT q, q // 256 AS bk, CAST(COUNT(*) AS BIGINT) AS cq
        FROM base GROUP BY q
    ),
    btot AS (
        SELECT bk, CAST(SUM(cq) AS BIGINT) AS bt FROM vc GROUP BY bk
    ),
    boff AS (
        SELECT a.bk,
               CAST(COALESCE(SUM(CASE WHEN b.bk < a.bk THEN b.bt END), 0)
                    AS BIGINT) AS off
        FROM btot a LEFT JOIN btot b ON b.bk < a.bk GROUP BY a.bk
    ),
    ntot AS (SELECT CAST(SUM(bt) AS BIGINT) AS n FROM btot),
    vcum AS (
        SELECT v.q,
               o.off + CAST(SUM(v.cq) OVER (PARTITION BY v.bk ORDER BY v.q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cc,
               t.n
        FROM vc v JOIN boff o USING (bk), ntot t
    ),
    med AS (
        SELECT MIN(CASE WHEN cc >= (n + 1) // 2 THEN q END) AS med
        FROM vcum
    ),
    cnts AS (
        SELECT b.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(CASE WHEN b.q > m.med THEN 1 ELSE 0 END)
                    AS BIGINT) AS above
        FROM base b, med m GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(above) AS BIGINT) AS a
        FROM cnts
    ),
    terms AS (
        SELECT CAST(SUM(CASE WHEN t.a = 0 OR t.a = t.n THEN NULL
               ELSE CAST(ROUND(
                 (above - CAST(n_i AS DOUBLE) * t.a / t.n)
                 * (above - CAST(n_i AS DOUBLE) * t.a / t.n)
                 / (CAST(n_i AS DOUBLE) * t.a / t.n)
               + ((n_i - above) - CAST(n_i AS DOUBLE) * (t.n - t.a) / t.n)
                 * ((n_i - above) - CAST(n_i AS DOUBLE) * (t.n - t.a) / t.n)
                 / (CAST(n_i AS DOUBLE) * (t.n - t.a) / t.n), 9)
               AS DECIMAL(28,9)) END) AS DECIMAL(38,9)) AS s
        FROM cnts, tot t
    )
    SELECT c.event_type, c.n_i, c.above, c.n_i - c.above AS at_or_below,
           (SELECT med FROM med) AS pooled_median,
           ROUND(CAST(t.s AS DOUBLE), 6) AS chi2,
           COALESCE(CAST(t.s AS DOUBLE) > {_CHI2_95_DF4}, FALSE)
               AS rejected
    FROM cnts c, terms t
    """,
)
def stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — MOOD's median test (Mood 1950): do the k = 5 event types
    share a common median value? Counts above/at-or-below the POOLED
    exact median per type and tests the 2×k table with chi-square at
    df = k−1 = 4 — the median-robust complement of Kruskal–Wallis
    (which tests mean ranks; Mood's only looks at the median split, so
    it survives arbitrary tail behavior).

    Exactness: the pooled median is exact order-statistic selection on
    the value grid (lower median, (n+1) div 2) via the TWO-PHASE
    BUCKETED prefix sum — per-256-bucket partial totals, exclusive
    bucket offsets off a bucket-grid pair join, within-bucket running
    sums PARTITIONED BY BUCKET — so no unpartitioned window exists at
    any value-domain size (the audit rule); counts are exact integers;
    each type's chi-square term is a fixed-order IEEE expression
    rounded to the 9-grid and DECIMAL-summed (the g_test
    order-independence rule); rejection compares the unrounded total
    against the shared χ²₀.₉₅,df4 literal. Degenerate margin a = 0 or
    a = n (pooled median at an extreme) → NULL chi2 / FALSE rejected on
    both engines (r15 self-review: the unguarded expected-count
    division THROWS on ANSI Spark where DuckDB returns NULL).

    Scale: one value-grid aggregate + one counting aggregate. The
    2-row-per-type table is driver-size by construction."""
    base = load(spark, sf_dir, "events").select(
        "event_type", _q100().alias("q")
    )
    return mood_median(base)


def mood_median(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_mood_median` (the library form
    the Engine facade exposes): ``base`` has columns (event_type group
    key, q integer value) — one row per observation."""
    vc = (
        base.groupBy("q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cq"))
        .withColumn("bk", (F.col("q") / 256).cast("bigint"))
        .localCheckpoint(eager=True)  # value-grid; feeds offsets + cum
    )
    btot = vc.groupBy("bk").agg(F.sum("cq").cast("bigint").alias("bt"))
    bb = btot.select(F.col("bk").alias("bkb"), F.col("bt").alias("btb"))
    boff = (
        btot.join(bb, F.col("bkb") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(
            F.coalesce(F.sum("btb"), F.lit(0)).cast("bigint").alias("off")
        )
    )
    ntot = btot.agg(F.sum("bt").cast("bigint").alias("n"))
    wbk = (
        Window.partitionBy("bk")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vcum = (
        vc.join(boff, "bk")
        .select(
            "q",
            (
                F.col("off") + F.sum("cq").over(wbk).cast("bigint")
            ).alias("cc"),
        )
        .crossJoin(F.broadcast(ntot))
    )
    med = vcum.agg(
        F.min(
            F.when(
                F.col("cc") >= F.expr("(n + 1) div 2"), F.col("q")
            )
        ).alias("med")
    )
    cnts = (
        base.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum(F.when(F.col("q") > F.col("med"), 1).otherwise(0))
            .cast("bigint")
            .alias("above"),
        )
        .localCheckpoint(eager=True)  # 5 rows; consumed twice
    )
    tot = cnts.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("above").cast("bigint").alias("a"),
    )
    ea = F.col("n_i").cast("double") * F.col("a") / F.col("n")
    eb = (
        F.col("n_i").cast("double")
        * (F.col("n") - F.col("a"))
        / F.col("n")
    )
    # degenerate-margin guard (r15 self-review): a == 0 or a == n (the
    # pooled median sits at an extreme — e.g. >50% of mass on one value
    # with nothing above it) zeroes a whole expected margin; the χ² is
    # undefined and the unguarded division THROWS on ANSI Spark while
    # DuckDB returns NULL. Emit NULL term → NULL chi2 / FALSE rejected
    # identically on both engines.
    degenerate = (F.col("a") == 0) | (F.col("a") == F.col("n"))
    term = F.when(
        degenerate, F.lit(None).cast("decimal(28,9)")
    ).otherwise(
        F.round(
            (F.col("above") - ea) * (F.col("above") - ea) / ea
            + ((F.col("n_i") - F.col("above")) - eb)
            * ((F.col("n_i") - F.col("above")) - eb)
            / eb,
            9,
        ).cast("decimal(28,9)")
    )
    chi2 = (
        cnts.crossJoin(F.broadcast(tot))
        .agg(F.sum(term).cast("decimal(38,9)").alias("s"))
    )
    return (
        cnts.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(chi2))
        .select(
            "event_type",
            "n_i",
            "above",
            (F.col("n_i") - F.col("above")).alias("at_or_below"),
            F.col("med").alias("pooled_median"),
            F.round(F.col("s").cast("double"), 6).alias("chi2"),
            F.coalesce(
                F.col("s").cast("double") > F.expr(_CHI2_95_DF4),
                F.lit(False),
            ).alias("rejected"),
        )
    )


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test on the daily series
# --------------------------------------------------------------------------


@register(
    "stat_runs_test",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS tq
        FROM events GROUP BY 1, 2
    ),
    dcum AS (
        SELECT event_type, tq,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY tq
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cc,
               CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type)
               AS BIGINT) AS nd
        FROM daily GROUP BY event_type, tq
    ),
    med AS (
        SELECT event_type,
               MIN(CASE WHEN cc >= (nd + 1) // 2 THEN tq END) AS med
        FROM dcum GROUP BY 1
    ),
    signs AS (
        SELECT d.event_type, d.day, (d.tq > m.med) AS hi
        FROM daily d JOIN med m USING (event_type)
        WHERE d.tq <> m.med
    ),
    flips AS (
        SELECT event_type, hi,
               CASE WHEN LAG(hi) OVER (PARTITION BY event_type
                                       ORDER BY day) IS DISTINCT FROM hi
                    THEN 1 ELSE 0 END AS brk
        FROM signs
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(brk) AS BIGINT) AS runs,
               CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS n2
        FROM flips GROUP BY 1
    )
    SELECT event_type, runs, n1, n2,
           ROUND(2.0 * n1 * n2 / (n1 + n2) + 1.0, 6) AS mean_runs,
           CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 <= 2 THEN NULL
                ELSE ROUND((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))), 6) END AS z,
           CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 <= 2 THEN FALSE
                ELSE ABS((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
               / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                      / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                         * (n1 + n2 - 1)))) > {_Z95_2S} END AS rejected
    FROM agg
    """,
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — WALD–WOLFOWITZ runs test (1940) per event type: is the
    daily-total series RANDOM around its median, or does it cluster
    (trend/regime) or alternate (overdispersion)? Days equal to the
    exact median are excluded (the standard convention); R counts
    maximal same-sign runs over the day order; z compares R to the
    exact null mean 2n₁n₂/(n₁+n₂)+1 and variance.

    Exactness: the per-type daily-total median is exact order-statistic
    selection; the run count is a lag-flag sum over the bounded day
    grid; z is one fixed-order IEEE expression, rejection on the
    unrounded |z| against the shared z₀.₉₇₅ literal (the first flip
    flag is 1 by IS DISTINCT FROM NULL on both engines, so R counts
    runs directly, not transitions).

    Scale: one (type, day) aggregate; everything after is day-grid
    windows."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(_q100()).cast("bigint").alias("tq"))
    )
    return runs_test(daily)


def runs_test(daily: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_runs_test` (the library form the
    Engine facade exposes): ``daily`` has columns (event_type series
    key, day orderable, tq integer value) — one row per series point."""
    daily = daily.localCheckpoint(eager=True)  # day-grid; consumed twice
    dcum = (
        daily.groupBy("event_type", "tq")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cq"))
        .select(
            "event_type",
            "tq",
            F.sum("cq")
            .over(
                Window.partitionBy("event_type")
                .orderBy("tq")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("bigint")
            .alias("cc"),
            F.sum("cq")
            .over(Window.partitionBy("event_type"))
            .cast("bigint")
            .alias("nd"),
        )
    )
    med = dcum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cc") >= F.expr("(nd + 1) div 2"), F.col("tq"))
        ).alias("med")
    )
    signs = (
        daily.join(med, "event_type")
        .filter(F.col("tq") != F.col("med"))
        .select("event_type", "day", (F.col("tq") > F.col("med")).alias("hi"))
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    flips = signs.select(
        "event_type",
        "hi",
        F.when(
            ~F.lag("hi").over(wd).eqNullSafe(F.col("hi")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = flips.groupBy("event_type").agg(
        F.sum("brk").cast("bigint").alias("runs"),
        F.sum(F.when(F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("hi"), 0).otherwise(1))
        .cast("bigint")
        .alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    z = (F.col("runs") - mu) / F.sqrt(var)
    # degenerate-margin guard (r15 self-review): one-sided series after
    # median exclusion (n1 or n2 = 0) or n1 = n2 = 1 have null variance
    # 0 — the z division THROWS on ANSI Spark, NULL on DuckDB. NULL z /
    # FALSE rejected on both engines.
    degenerate = (n1 == 0) | (n2 == 0) | ((n1 + n2) <= 2)
    return agg.select(
        "event_type",
        "runs",
        "n1",
        "n2",
        F.round(mu, 6).alias("mean_runs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(z) > F.expr(_Z95_2S))
        .alias("rejected"),
    )


# --------------------------------------------------------------------------
# Cliff's delta (weekend vs weekday dominance effect size)
# --------------------------------------------------------------------------


@register(
    "stat_cliff_delta",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CASE WHEN DAYOFWEEK(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS wk,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    cells AS (
        SELECT event_type, v,
               CAST(SUM(wk) AS BIGINT) AS cw,
               CAST(SUM(1 - wk) AS BIGINT) AS cd
        FROM base GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v, cw, cd,
               CAST(COALESCE(SUM(cd) OVER w, 0) AS BIGINT) AS dless,
               CAST(SUM(cd) OVER (PARTITION BY event_type) AS BIGINT) AS nd,
               CAST(SUM(cw) OVER (PARTITION BY event_type) AS BIGINT) AS nw
        FROM cells
        WINDOW w AS (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    s AS (
        SELECT event_type,
               CAST(MIN(nw) AS BIGINT) AS nw, CAST(MIN(nd) AS BIGINT) AS nd,
               CAST(SUM(CAST(cw AS DECIMAL(19,0))
                        * CAST(dless AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS gt,
               CAST(SUM(CAST(cw AS DECIMAL(19,0))
                        * CAST(nd - dless - cd AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS lt
        FROM cum GROUP BY 1
    )
    SELECT event_type, nw AS n_weekend, nd AS n_weekday,
           CASE WHEN nw = 0 OR nd = 0 THEN NULL
                ELSE ROUND(CAST(gt - lt AS DOUBLE)
                           / (CAST(nw AS DOUBLE) * nd), 6) END AS delta,
           CASE WHEN nw = 0 OR nd = 0 THEN NULL
                WHEN ABS(CAST(gt - lt AS DOUBLE) / (CAST(nw AS DOUBLE) * nd))
                     < {_CLIFF_BANDS[0]} THEN 'negligible'
                WHEN ABS(CAST(gt - lt AS DOUBLE) / (CAST(nw AS DOUBLE) * nd))
                     < {_CLIFF_BANDS[1]} THEN 'small'
                WHEN ABS(CAST(gt - lt AS DOUBLE) / (CAST(nw AS DOUBLE) * nd))
                     < {_CLIFF_BANDS[2]} THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM s
    """,
)
def stat_cliff_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — CLIFF's delta (Cliff 1993) per event type: the ordinal
    effect size P(weekend value > weekday value) − P(< ) — what a
    Mann–Whitney p-value does NOT tell you (with 20k rows everything
    is "significant"; delta says whether the difference is LARGE).
    Magnitude bands at the Romano et al. (2006) thresholds
    |δ| < {_CLIFF_BANDS[0]}/{_CLIFF_BANDS[1]}/{_CLIFF_BANDS[2]}.

    Exactness: dominance counts gt/lt are exact DECIMAL(38,0) grid sums
    off the strict-cumulative window (the DeLong placement machinery
    with ties contributing to neither side; ~n²/4 per stratum crosses
    int64 at ~6e9 rows/type — r15 self-review); δ is one IEEE division
    rounded 6; the band CASE tests the unrounded |δ| against shared
    literals. Empty-side strata (nw or nd = 0) → NULL δ and NULL
    magnitude on both engines (pre-guard: ANSI-Spark throw vs DuckDB
    NULL, and the band CASE fell through NULL to 'large').

    Scale: one (type, value) counting aggregate; grid windows after."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(_dow_spark().isin(1, 7), 1).otherwise(0).alias("wk"),
        _q100().alias("v"),
    )
    return cliff_delta(base)


def cliff_delta(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_cliff_delta` (the library form
    the Engine facade exposes): ``base`` has columns (event_type
    stratum key, wk 0/1 sample flag, v integer value)."""
    cells = base.groupBy("event_type", "v").agg(
        F.sum("wk").cast("bigint").alias("cw"),
        F.sum(1 - F.col("wk")).cast("bigint").alias("cd"),
    )
    wless = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "cw",
        "cd",
        F.coalesce(F.sum("cd").over(wless), F.lit(0))
        .cast("bigint")
        .alias("dless"),
        F.sum("cd").over(wall).cast("bigint").alias("nd"),
        F.sum("cw").over(wall).cast("bigint").alias("nw"),
    )
    # r15 self-review: dominance counts are ~n²/4 per stratum — the int64
    # overflow class (crosses at ~6e9 rows/event_type); DECIMAL factors
    # and accumulators on both engines.
    cwd = F.col("cw").cast("decimal(19,0)")
    s = cum.groupBy("event_type").agg(
        F.min("nw").alias("nw"),
        F.min("nd").alias("nd"),
        F.sum(cwd * F.col("dless").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("gt"),
        F.sum(
            cwd
            * (F.col("nd") - F.col("dless") - F.col("cd")).cast(
                "decimal(19,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("lt"),
    )
    delta = (F.col("gt") - F.col("lt")).cast("double") / (
        F.col("nw").cast("double") * F.col("nd")
    )
    # degenerate-margin guard (r15 self-review): an empty side (nw or nd
    # = 0) has no dominance pairs — the division THROWS on ANSI Spark
    # (NULL on DuckDB), and the unguarded band CASE would then fall
    # through every NULL comparison to 'large'. NULL delta AND NULL
    # magnitude on both engines.
    degenerate = (F.col("nw") == 0) | (F.col("nd") == 0)
    return s.select(
        "event_type",
        F.col("nw").alias("n_weekend"),
        F.col("nd").alias("n_weekday"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(delta, 6))
        .alias("delta"),
        F.when(degenerate, F.lit(None).cast("string"))
        .when(F.abs(delta) < _CLIFF_BANDS[0], "negligible")
        .when(F.abs(delta) < _CLIFF_BANDS[1], "small")
        .when(F.abs(delta) < _CLIFF_BANDS[2], "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# --------------------------------------------------------------------------
# Weighted Cohen's kappa (linear + quadratic) on an ordinal grid
# --------------------------------------------------------------------------


@register(
    "eval_kappa_weighted",
    oracle="""
    WITH base AS (
        SELECT event_type,
               LEAST(9, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) // 1000)
                   AS ra,
               LEAST(9, LEAST(9, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                                 // 1000)
                        + CAST(event_id AS BIGINT) % 2) AS rb
        FROM events
    ),
    obs AS (
        SELECT event_type, ra, rb, CAST(COUNT(*) AS BIGINT) AS o
        FROM base GROUP BY 1, 2, 3
    ),
    n AS (
        SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
        FROM obs GROUP BY 1
    ),
    ma AS (
        SELECT event_type, ra, CAST(SUM(o) AS BIGINT) AS r
        FROM obs GROUP BY 1, 2
    ),
    mb AS (
        SELECT event_type, rb, CAST(SUM(o) AS BIGINT) AS c
        FROM obs GROUP BY 1, 2
    ),
    onum AS (
        SELECT event_type,
               CAST(SUM(CAST(ABS(ra - rb) AS DECIMAL(38,0)) * o)
                    AS DECIMAL(38,0)) AS lin_o,
               CAST(SUM(CAST((ra - rb) * (ra - rb) AS DECIMAL(38,0)) * o)
                    AS DECIMAL(38,0)) AS quad_o
        FROM obs GROUP BY 1
    ),
    eden AS (
        SELECT a.event_type,
               CAST(SUM(CAST(ABS(a.ra - b.rb) AS DECIMAL(38,0))
                        * a.r * b.c) AS DECIMAL(38,0)) AS lin_e,
               CAST(SUM(CAST((a.ra - b.rb) * (a.ra - b.rb)
                             AS DECIMAL(38,0)) * a.r * b.c)
                    AS DECIMAL(38,0)) AS quad_e
        FROM ma a JOIN mb b ON b.event_type = a.event_type
        GROUP BY 1
    )
    SELECT n.event_type, n.n,
           CASE WHEN e.lin_e = 0 THEN NULL
                ELSE ROUND(1.0 - CAST(o.lin_o AS DOUBLE) * n.n
                       / CAST(e.lin_e AS DOUBLE), 6) END AS kappa_linear,
           CASE WHEN e.quad_e = 0 THEN NULL
                ELSE ROUND(1.0 - CAST(o.quad_o AS DOUBLE) * n.n
                       / CAST(e.quad_e AS DOUBLE), 6) END AS kappa_quadratic
    FROM n JOIN onum o USING (event_type) JOIN eden e USING (event_type)
    """,
)
def eval_kappa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV — WEIGHTED Cohen's kappa (Cohen 1968) per event type, linear
    AND quadratic weights, over a 10-level ordinal rating pair (rater A
    = value decile; rater B = the same decile nudged up one level on
    odd event_ids — a controlled near-agreement fixture). The ordinal
    agreement coefficient annotation teams use when plain kappa's
    all-disagreements-equal assumption is wrong (quadratic-weighted
    kappa is equivalent to an ICC and is THE standard for ordinal
    label quality).

    Exactness: with integer distance weights d_ij = |i−j| (linear) and
    (i−j)² (quadratic), κ_w = 1 − N·Σd_ij·O_ij / Σd_ij·R_i·C_j clears
    every denominator — numerator and denominator are exact
    DECIMAL(38,0) integers (marginal products R_i·C_j reach N²·81) and
    the terminal division is ONE IEEE op rounded 6.

    Scale: one counting aggregate to ≤100 cells/type; the marginal
    cross join is 10×10 grid algebra."""
    dec = F.least(F.lit(9), _q100() / F.lit(1000)).cast("bigint")
    base = load(spark, sf_dir, "events").select(
        "event_type",
        dec.alias("ra"),
        F.least(
            F.lit(9), dec + F.col("event_id").cast("bigint") % 2
        ).alias("rb"),
    )
    return kappa_weighted(base)


def kappa_weighted(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`eval_kappa_weighted` (the library
    form the Engine facade exposes): ``base`` has columns (event_type
    stratum key, ra ordinal rating, rb ordinal rating) — one row per
    rated item; the rating grid must be bounded (marginal cross
    join)."""
    obs = (
        base.groupBy("event_type", "ra", "rb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint(eager=True)  # ≤100 cells/type; consumed 4x
    )
    n = obs.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n")
    )
    ma = obs.groupBy("event_type", "ra").agg(
        F.sum("o").cast("bigint").alias("r")
    )
    mb = obs.groupBy(
        F.col("event_type").alias("etb"), "rb"
    ).agg(F.sum("o").cast("bigint").alias("c"))
    lin_d = F.abs(F.col("ra") - F.col("rb")).cast("decimal(38,0)")
    quad_d = (
        (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
    ).cast("decimal(38,0)")
    onum = obs.groupBy("event_type").agg(
        F.sum(lin_d * F.col("o")).cast("decimal(38,0)").alias("lin_o"),
        F.sum(quad_d * F.col("o")).cast("decimal(38,0)").alias("quad_o"),
    )
    eden = (
        ma.join(mb, F.col("etb") == F.col("event_type"))
        .groupBy("event_type")
        .agg(
            F.sum(lin_d * F.col("r") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("lin_e"),
            F.sum(quad_d * F.col("r") * F.col("c"))
            .cast("decimal(38,0)")
            .alias("quad_e"),
        )
    )
    # degenerate-margin guard (r15 self-review): both raters constant at
    # the same level ⇒ Σd·R·C = 0 — chance disagreement undefined, and
    # the unguarded division THROWS on ANSI Spark (NULL on DuckDB).
    null_d = F.lit(None).cast("double")
    return (
        n.join(onum, "event_type")
        .join(eden, "event_type")
        .select(
            "event_type",
            "n",
            F.when(F.col("lin_e") == 0, null_d)
            .otherwise(
                F.round(
                    1.0
                    - F.col("lin_o").cast("double")
                    * F.col("n")
                    / F.col("lin_e").cast("double"),
                    6,
                )
            )
            .alias("kappa_linear"),
            F.when(F.col("quad_e") == 0, null_d)
            .otherwise(
                F.round(
                    1.0
                    - F.col("quad_o").cast("double")
                    * F.col("n")
                    / F.col("quad_e").cast("double"),
                    6,
                )
            )
            .alias("kappa_quadratic"),
        )
    )


# --------------------------------------------------------------------------
# Exact two-sample Kolmogorov–Smirnov distance
# --------------------------------------------------------------------------


@register(
    "stat_ks_two_sample",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CASE WHEN DAYOFWEEK(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS wk,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    cells AS (
        SELECT event_type, v,
               CAST(SUM(wk) AS BIGINT) AS c1,
               CAST(SUM(1 - wk) AS BIGINT) AS c2
        FROM base GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v,
               CAST(SUM(c1) OVER w AS BIGINT) AS f1,
               CAST(SUM(c2) OVER w AS BIGINT) AS f2,
               CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
               CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
        FROM cells
        WINDOW w AS (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type,
               CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2,
               CAST(MAX(ABS(CAST(f1 AS DECIMAL(19,0))
                            * CAST(n2 AS DECIMAL(19,0))
                            - CAST(f2 AS DECIMAL(19,0))
                              * CAST(n1 AS DECIMAL(19,0))))
                    AS DECIMAL(38,0)) AS dstar
        FROM cum GROUP BY event_type
    )
    SELECT event_type, n1 AS n_weekend, n2 AS n_weekday,
           CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                ELSE ROUND(CAST(dstar AS DOUBLE)
                           / (CAST(n1 AS DOUBLE) * n2), 6) END AS ks_d,
           CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                ELSE ROUND(CAST(dstar AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
                 * SQRT(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6)
                END AS ks_stat,
           CASE WHEN n1 = 0 OR n2 = 0 THEN FALSE
                ELSE (CAST(dstar AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
            * SQRT(CAST(n1 AS DOUBLE) * n2 / (n1 + n2))) > {_KS_C05}
               END AS rejected
    FROM s
    """,
)
def stat_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — EXACT two-sample Kolmogorov–Smirnov distance per event
    type (weekend vs weekday value distributions): D = sup_v |F̂₁(v) −
    F̂₂(v)| computed EXACTLY as the integer max of |F₁*·n₂ − F₂*·n₁|
    over the shared value grid (cross-multiplied counts — no float CDF
    subtraction anywhere), then λ = D·√(n₁n₂/(n₁+n₂)) against the
    α = 0.05 asymptotic critical value √(−ln(α/2)/2) as a shared
    literal. The distribution-shape test the mean-based t/TOST pair
    cannot replace — KS sees variance/shape drift at equal means (the
    data-drift monitor every training pipeline runs).

    Exactness: the sup is over grid values only (both ECDFs are step
    functions jumping at data points, so the max over the grid IS the
    sup); all counts integer, cross-products DECIMAL(38,0) (f·n is ~n²
    per stratum — int64 crossing at ~3e9 rows/type, r15 self-review);
    two divisions + one sqrt at the end, NULL/FALSE-guarded for an
    empty side (ANSI-Spark throw vs DuckDB NULL otherwise).

    Scale: one (type, value) counting aggregate; grid windows after."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(_dow_spark().isin(1, 7), 1).otherwise(0).alias("wk"),
        _q100().alias("v"),
    )
    return ks_two_sample(base)


def ks_two_sample(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_ks_two_sample` (the library form
    the Engine facade exposes): ``base`` has columns (event_type
    stratum key, wk 0/1 sample flag, v integer value)."""
    cells = base.groupBy("event_type", "v").agg(
        F.sum("wk").cast("bigint").alias("c1"),
        F.sum(1 - F.col("wk")).cast("bigint").alias("c2"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        F.sum("c1").over(wcum).cast("bigint").alias("f1"),
        F.sum("c2").over(wcum).cast("bigint").alias("f2"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c2").over(wall).cast("bigint").alias("n2"),
    )
    # r15 self-review: the cross-multiplied CDF terms f1·n2 are ~n² per
    # stratum — int64 crossing at ~3e9 rows/type; DECIMAL factors and
    # max on both engines (dstar is internal; outputs unchanged).
    s = cum.groupBy("event_type").agg(
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
        F.max(
            F.abs(
                F.col("f1").cast("decimal(19,0)")
                * F.col("n2").cast("decimal(19,0)")
                - F.col("f2").cast("decimal(19,0)")
                * F.col("n1").cast("decimal(19,0)")
            )
        )
        .cast("decimal(38,0)")
        .alias("dstar"),
    )
    d = F.col("dstar").cast("double") / (
        F.col("n1").cast("double") * F.col("n2")
    )
    lam = d * F.sqrt(
        F.col("n1").cast("double")
        * F.col("n2")
        / (F.col("n1") + F.col("n2"))
    )
    # degenerate-margin guard: an empty side has no ECDF to compare —
    # NULL D/λ, FALSE rejected on both engines (ANSI-throw class)
    degenerate = (F.col("n1") == 0) | (F.col("n2") == 0)
    null_d = F.lit(None).cast("double")
    return s.select(
        "event_type",
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        F.when(degenerate, null_d).otherwise(F.round(d, 6)).alias("ks_d"),
        F.when(degenerate, null_d)
        .otherwise(F.round(lam, 6))
        .alias("ks_stat"),
        F.when(degenerate, F.lit(False))
        .otherwise(lam > F.expr(_KS_C05))
        .alias("rejected"),
    )


# --------------------------------------------------------------------------
# Lorenz curve (per-user value concentration, decile points)
# --------------------------------------------------------------------------


@register(
    "agg_lorenz_curve",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, s,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY s, user_id) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n,
               CAST(SUM(s) OVER (PARTITION BY event_type)
                    AS DECIMAL(38,0)) AS tot
        FROM per_user
    ),
    dec AS (
        SELECT event_type,
               CAST((rk * 10 - 1) // n + 1 AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(s) AS DECIMAL(38,0)) AS ds,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN(tot) AS DECIMAL(38,0)) AS tot
        FROM ranked GROUP BY 1, 2
    )
    SELECT event_type, decile, n_users,
           ROUND(CAST(SUM(CAST(n_users AS DECIMAL(38,0))) OVER w AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS cum_user_share,
           CASE WHEN tot = 0 THEN NULL
                ELSE ROUND(CAST(SUM(ds) OVER w AS DOUBLE)
                           / CAST(tot AS DOUBLE), 6) END
               AS cum_value_share
    FROM dec
    WINDOW w AS (PARTITION BY event_type ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AG — LORENZ curve (Lorenz 1905) per event type: users ranked by
    their value total ascending, split into 10 equal-population
    deciles; each row is one curve point (cumulative user share →
    cumulative value share). The curve BEHIND agg_gini_concentration
    (Gini = 1 − 2·area under this curve): the whole distributional
    picture — "the top decile of users holds X% of spend" — instead of
    the single coefficient.

    Exactness: per-user sums are exact integers; decile assignment is
    the exact integer formula (rk·10−1) div n + 1 (rank ties broken by
    user_id — deterministic); cumulative sums are DECIMAL(38,0); the
    two shares are single IEEE divisions rounded 6.

    Scale: one per-user aggregate (map-side combined), one per-type
    window over users, then 10-row grid algebra per type."""
    per_user = load(spark, sf_dir, "events").groupBy(
        "event_type", "user_id"
    ).agg(F.sum(_q100()).cast("bigint").alias("s"))
    return lorenz_curve(per_user)


def lorenz_curve(per_user: DataFrame) -> DataFrame:
    """Frame-level core of :func:`agg_lorenz_curve` (the library form
    the Engine facade exposes): ``per_user`` has columns (event_type
    group key, user_id ranking tiebreak, s integer value total) — one
    row per unit."""
    wrk = Window.partitionBy("event_type").orderBy("s", "user_id")
    wall = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type",
        "s",
        F.row_number().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("s").over(wall).cast("decimal(38,0)").alias("tot"),
    )
    dec = ranked.groupBy(
        "event_type",
        ((F.col("rk") * 10 - 1) / F.col("n") + 1)
        .cast("bigint")
        .alias("decile"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("s").cast("decimal(38,0)").alias("ds"),
        F.min("n").alias("n"),
        F.min("tot").alias("tot"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dec.select(
        "event_type",
        "decile",
        "n_users",
        F.round(
            F.sum(F.col("n_users").cast("decimal(38,0)"))
            .over(wcum)
            .cast("double")
            / F.col("n").cast("double"),
            6,
        ).alias("cum_user_share"),
        # all-zero totals (tot = 0) leave value shares undefined — an
        # ANSI-Spark divide-by-zero throw vs DuckDB NULL (r15 review)
        F.when(F.col("tot") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("ds").over(wcum).cast("double")
                / F.col("tot").cast("double"),
                6,
            )
        )
        .alias("cum_value_share"),
    )


@register(
    "agg_lorenz_curve_bucketed",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, s,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY s, user_id) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n,
               CAST(SUM(s) OVER (PARTITION BY event_type)
                    AS DECIMAL(38,0)) AS tot
        FROM per_user
    ),
    dec AS (
        SELECT event_type,
               CAST((rk * 10 - 1) // n + 1 AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(s) AS DECIMAL(38,0)) AS ds,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN(tot) AS DECIMAL(38,0)) AS tot
        FROM ranked GROUP BY 1, 2
    )
    SELECT event_type, decile, n_users,
           ROUND(CAST(SUM(CAST(n_users AS DECIMAL(38,0))) OVER w AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS cum_user_share,
           CASE WHEN tot = 0 THEN NULL
                ELSE ROUND(CAST(SUM(ds) OVER w AS DOUBLE)
                           / CAST(tot AS DOUBLE), 6) END
               AS cum_value_share
    FROM dec
    WINDOW w AS (PARTITION BY event_type ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def agg_lorenz_curve_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AG — :func:`agg_lorenz_curve` with the per-type user rank computed
    by a PARTITIONED TWO-PHASE BUCKETED prefix sum instead of a
    per-event-type row_number window (VERDICT r14 task #4): event_type
    has 3–5 values, so the window form sorts each type's ENTIRE user
    population in one task — fine at sf0.1 (10× leg 1.7×), billions of
    rows in one sorter at 100 TB. Same oracle, bit-identical output
    (pinned in tests/test_round15_ops.py); the window form stays
    registered as the semantics reference."""
    per_user = load(spark, sf_dir, "events").groupBy(
        "event_type", "user_id"
    ).agg(F.sum(_q100()).cast("bigint").alias("s"))
    return lorenz_curve_bucketed(per_user)


def lorenz_curve_bucketed(
    per_user: DataFrame, n_buckets: int = 64
) -> DataFrame:
    """Frame-level core of :func:`agg_lorenz_curve_bucketed` — the
    low-cardinality-partition rank pattern, pure-DataFrame (no driver
    collect, unlike ``global_ntiles``' offset round-trip, because the
    offsets here are per-GROUP and must stay distributed):

    1. one per-type aggregate → exact (min, max, n, tot) per event_type
       (broadcast — |types| rows);
    2. range-bucket each user on a uniform [min, max] grid per type —
       value-disjoint and monotone in s, so bucket order + within-bucket
       (s, user_id) order == the window form's total order;
    3. exclusive bucket offsets per type via a bucket-grid theta join
       (≤ n_buckets² rows PER TYPE — grid-sized, never corpus-sized);
    4. rank = offset + per-(type, bucket) row_number — the only window
       partitions by (event_type, bk), so no task ever sorts more than
       one bucket of one type (~n/(types·n_buckets) rows).

    Skew note: a single s value held by most users lands one bucket
    (same caveat as ``stat_mood_median``'s 256-wide value buckets); the
    decile CURVE of such a distribution is degenerate anyway."""
    stats = per_user.groupBy("event_type").agg(
        F.min("s").alias("__mn"),
        F.max("s").alias("__mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("s").cast("decimal(38,0)").alias("tot"),
    ).localCheckpoint(eager=True)
    span = (F.col("__mx") - F.col("__mn")).cast("double")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("s") - F.col("__mn")).cast("double")
                / span
                * n_buckets
            ).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    pu = per_user.join(F.broadcast(stats), "event_type").withColumn(
        "bk", bucket
    )
    # bounded grid (types x n_buckets) consumed by bb and boff; the
    # stats grid above likewise feeds the bucket expression and ranked —
    # materializing both cuts the re-planned corpus passes 6 -> 3 (r15).
    btot = pu.groupBy("event_type", "bk").agg(
        F.count(F.lit(1)).cast("bigint").alias("bt")
    ).localCheckpoint(eager=True)
    bb = btot.select(
        F.col("event_type").alias("__et"),
        F.col("bk").alias("__bkb"),
        F.col("bt").alias("__btb"),
    )
    # explicit broadcast hints (r15): the checkpointed grids lose their
    # size estimates, so AQE would otherwise plan SMJs — and shuffle the
    # corpus side of the ranked join — for kilobyte-scale build sides.
    boff = (
        btot.join(
            F.broadcast(bb),
            (F.col("__et") == F.col("event_type"))
            & (F.col("__bkb") < F.col("bk")),
            "left",
        )
        .groupBy("event_type", "bk")
        .agg(
            F.coalesce(F.sum("__btb"), F.lit(0))
            .cast("bigint")
            .alias("__off")
        )
    )
    wbk = Window.partitionBy("event_type", "bk").orderBy("s", "user_id")
    ranked = pu.join(F.broadcast(boff), ["event_type", "bk"]).select(
        "event_type",
        "s",
        "n",
        "tot",
        (F.col("__off") + F.row_number().over(wbk)).alias("rk"),
    )
    dec = ranked.groupBy(
        "event_type",
        ((F.col("rk") * 10 - 1) / F.col("n") + 1)
        .cast("bigint")
        .alias("decile"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("s").cast("decimal(38,0)").alias("ds"),
        F.min("n").alias("n"),
        F.min("tot").alias("tot"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dec.select(
        "event_type",
        "decile",
        "n_users",
        F.round(
            F.sum(F.col("n_users").cast("decimal(38,0)"))
            .over(wcum)
            .cast("double")
            / F.col("n").cast("double"),
            6,
        ).alias("cum_user_share"),
        # all-zero totals (tot = 0) leave value shares undefined — an
        # ANSI-Spark divide-by-zero throw vs DuckDB NULL (r15 review)
        F.when(F.col("tot") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("ds").over(wcum).cast("double")
                / F.col("tot").cast("double"),
                6,
            )
        )
        .alias("cum_value_share"),
    )


# --------------------------------------------------------------------------
# Partial AUC (McClish 1989) over a bounded FPR range
# --------------------------------------------------------------------------

#: FPR upper bound for the partial area, as an exact rational (num, den):
#: beta = 1/10. The low-FPR operating region is the one that matters for
#: screening / high-precision retrieval.
_PAUC_B = (1, 10)


@register(
    "eval_auc_partial",
    oracle=f"""
    WITH base AS (
        SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem
    ),
    grid AS (
        SELECT v, CAST(SUM(pos) AS BIGINT) AS wp,
               CAST(SUM(1 - pos) AS BIGINT) AS wn
        FROM base GROUP BY 1
    ),
    cum AS (
        SELECT x.v, x.wp, x.wn,
               CAST(COALESCE(SUM(y.wp), 0) AS BIGINT) AS cwp,
               CAST(COALESCE(SUM(y.wn), 0) AS BIGINT) AS cwn
        FROM grid x LEFT JOIN grid y ON y.v > x.v
        GROUP BY 1, 2, 3
    ),
    tots AS (
        SELECT CAST(SUM(wp) AS BIGINT) AS np,
               CAST(SUM(wn) AS BIGINT) AS nn
        FROM grid
    ),
    terms AS (
        SELECT CAST(SUM(
          CASE
            WHEN t.np = 0 OR t.nn = 0 THEN CAST(0 AS DECIMAL(28,9))
            WHEN c.wn = 0 THEN CAST(0 AS DECIMAL(28,9))
            WHEN {_PAUC_B[1]} * (c.cwn + c.wn) <= {_PAUC_B[0]} * t.nn THEN
              CAST(ROUND(CAST(c.wn AS DOUBLE) * (2 * c.cwp + c.wp)
                         / (2.0 * t.np * t.nn), 9) AS DECIMAL(28,9))
            WHEN {_PAUC_B[1]} * c.cwn < {_PAUC_B[0]} * t.nn THEN
              CAST(ROUND(
                (CAST(t.nn AS DOUBLE) * {_PAUC_B[0]} / {_PAUC_B[1]} - c.cwn)
                * (2.0 * c.cwp
                   + (CAST(t.nn AS DOUBLE) * {_PAUC_B[0]} / {_PAUC_B[1]}
                      - c.cwn) * c.wp / c.wn)
                / (2.0 * t.np * t.nn), 9) AS DECIMAL(28,9))
            ELSE CAST(0 AS DECIMAL(28,9))
          END) AS DECIMAL(38,9)) AS s
        FROM cum c, tots t
    )
    SELECT t.np AS n_pos, t.nn AS n_neg,
           CASE WHEN t.np = 0 OR t.nn = 0 THEN NULL
                ELSE ROUND(CAST(s AS DOUBLE), 6) END AS pauc,
           CASE WHEN t.np = 0 OR t.nn = 0 THEN NULL
                ELSE ROUND(0.5 * (1.0 + (CAST(s AS DOUBLE) - 0.005)
                                  / 0.095), 6) END AS pauc_mcclish
    FROM terms, tots t
    """,
)
def eval_auc_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV — PARTIAL AUC over FPR ∈ [0, {_PAUC_B[0]}/{_PAUC_B[1]}]
    (McClish 1989): the area under the ROC restricted to the low-FPR
    operating region — the metric that actually ranks screening /
    high-precision models, where full AUC rewards performance at FPR
    levels no deployment tolerates. Same scored fixture as
    eval_auc_delong_se (lineitem discount grid vs returnflag).
    ``pauc_mcclish`` is the standardized form ½(1 + (pAUC − β²/2)/(β −
    β²/2)) ∈ [0.5, 1] for a better-than-chance curve.

    Exactness: the ROC is the exact tie-slanted step curve off the
    descending-score grid cums; each whole trapezoid is
    wn·(2·cwp+wp)/(2·WP·WN) with integer numerators; the one boundary
    cell crossing FPR = β is clipped by exact linear interpolation
    (the crossing test is pure integer: β_den·cwn < β_num·WN). Every
    cell term rounds to the 9-grid and DECIMAL-sums (the g_test
    order-independence rule); β and the McClish normalizers are shared
    literals.

    Scale: ONE corpus scan to the bounded score grid (the DeLong
    shape); everything after is grid algebra."""
    base = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    return auc_partial(base)


def auc_partial(scored: DataFrame) -> DataFrame:
    """Frame-level core of :func:`eval_auc_partial` (the library form
    the Engine facade exposes): ``scored`` has integer column ``v``
    (bounded score grid, HIGHER = more positive) and 0/1 column
    ``pos``."""
    grid = scored.groupBy("v").agg(
        F.sum("pos").cast("bigint").alias("wp"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("wn"),
    )
    grid = grid.localCheckpoint(eager=True)  # grid-sized; consumed 2x
    y = grid.select(
        F.col("v").alias("yv"),
        F.col("wp").alias("ywp"),
        F.col("wn").alias("ywn"),
    )
    cum = (
        grid.join(y, F.col("yv") > F.col("v"), "left")
        .groupBy("v", "wp", "wn")
        .agg(
            F.coalesce(F.sum("ywp"), F.lit(0)).cast("bigint").alias("cwp"),
            F.coalesce(F.sum("ywn"), F.lit(0)).cast("bigint").alias("cwn"),
        )
    )
    tots = grid.agg(
        F.sum("wp").cast("bigint").alias("np"),
        F.sum("wn").cast("bigint").alias("nn"),
    )
    j = cum.crossJoin(F.broadcast(tots))
    bn, bd = _PAUC_B
    np_, nn_ = F.col("np"), F.col("nn")
    t_clip = nn_.cast("double") * bn / bd - F.col("cwn")
    full_term = F.round(
        F.col("wn").cast("double")
        * (2 * F.col("cwp") + F.col("wp"))
        / (2.0 * np_ * nn_),
        9,
    ).cast("decimal(28,9)")
    clip_term = F.round(
        t_clip
        * (2.0 * F.col("cwp") + t_clip * F.col("wp") / F.col("wn"))
        / (2.0 * np_ * nn_),
        9,
    ).cast("decimal(28,9)")
    zero = F.lit(0).cast("decimal(28,9)")
    # leading one-class guard (r15 self-review): np = 0 with negatives
    # present reaches full_term's division by 2·np·nn — an ANSI-Spark
    # throw (NULL on DuckDB)
    term = (
        F.when((np_ == 0) | (nn_ == 0), zero)
        .when(F.col("wn") == 0, zero)
        .when(bd * (F.col("cwn") + F.col("wn")) <= bn * nn_, full_term)
        .when(bd * F.col("cwn") < bn * nn_, clip_term)
        .otherwise(zero)
    )
    s = j.groupBy("np", "nn").agg(
        F.sum(term).cast("decimal(38,9)").alias("s")
    )
    beta = bn / bd
    one_class = (F.col("np") == 0) | (F.col("nn") == 0)
    null_d = F.lit(None).cast("double")
    return s.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.when(one_class, null_d)
        .otherwise(F.round(F.col("s").cast("double"), 6))
        .alias("pauc"),
        F.when(one_class, null_d)
        .otherwise(
            F.round(
                0.5
                * (
                    1.0
                    + (F.col("s").cast("double") - beta * beta / 2)
                    / (beta - beta * beta / 2)
                ),
                6,
            )
        )
        .alias("pauc_mcclish"),
    )


# --------------------------------------------------------------------------
# Brunner–Munzel test (nonparametric Behrens–Fisher)
# --------------------------------------------------------------------------


@register(
    "stat_brunner_munzel",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CASE WHEN DAYOFWEEK(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS wk,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    cells AS (
        SELECT event_type, v,
               CAST(SUM(wk) AS BIGINT) AS c1,
               CAST(SUM(1 - wk) AS BIGINT) AS c2
        FROM base GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v, c1, c2,
               CAST(COALESCE(SUM(c1 + c2) OVER w, 0) AS BIGINT) AS cl,
               CAST(COALESCE(SUM(c1) OVER w, 0) AS BIGINT) AS cl1,
               CAST(COALESCE(SUM(c2) OVER w, 0) AS BIGINT) AS cl2,
               CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
               CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
        FROM cells
        WINDOW w AS (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    moms AS (
        SELECT event_type, CAST(MIN(n1) AS BIGINT) AS n1,
               CAST(MIN(n2) AS BIGINT) AS n2,
               CAST(SUM(CAST(c1 AS DECIMAL(38,0))
                        * (2*cl + c1 + c2 + 1)) AS DECIMAL(38,0)) AS sr1,
               CAST(SUM(CAST(c2 AS DECIMAL(38,0))
                        * (2*cl + c1 + c2 + 1)) AS DECIMAL(38,0)) AS sr2,
               CAST(SUM(CAST(c1 AS DECIMAL(38,0))
                        * (2*cl + c1 + c2 - 2*cl1 - c1)) AS DECIMAL(38,0))
                   AS sd1,
               CAST(SUM(CAST(c1 AS DECIMAL(38,0))
                        * (2*cl + c1 + c2 - 2*cl1 - c1)
                        * (2*cl + c1 + c2 - 2*cl1 - c1)) AS DECIMAL(38,0))
                   AS sq1,
               CAST(SUM(CAST(c2 AS DECIMAL(38,0))
                        * (2*cl + c1 + c2 - 2*cl2 - c2)) AS DECIMAL(38,0))
                   AS sd2,
               CAST(SUM(CAST(c2 AS DECIMAL(38,0))
                        * (2*cl + c1 + c2 - 2*cl2 - c2)
                        * (2*cl + c1 + c2 - 2*cl2 - c2)) AS DECIMAL(38,0))
                   AS sq2
        FROM cum GROUP BY event_type
    )
    SELECT event_type, n1 AS n_weekend, n2 AS n_weekday,
           CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                ELSE ROUND((CAST(sr2 AS DOUBLE) / (2.0 * n2)
                            - (n2 + 1) / 2.0) / n1, 6) END AS p_hat,
           CASE WHEN n1 < 2 OR n2 < 2 OR
                (n1 * ((CAST(sq1 AS DOUBLE)
                        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)
                          / n1) / (4.0 * (n1 - 1)))
                 + n2 * ((CAST(sq2 AS DOUBLE)
                          - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE)
                            / n2) / (4.0 * (n2 - 1)))) = 0 THEN NULL
           ELSE ROUND((CAST(sr2 AS DOUBLE) / (2.0 * n2)
                  - CAST(sr1 AS DOUBLE) / (2.0 * n1))
                 * n1 * n2 / (n1 + n2)
                 / SQRT(n1 * ((CAST(sq1 AS DOUBLE)
                               - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)
                                 / n1) / (4.0 * (n1 - 1)))
                        + n2 * ((CAST(sq2 AS DOUBLE)
                                 - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE)
                                   / n2) / (4.0 * (n2 - 1)))), 6)
           END AS w_stat,
           CASE WHEN n1 < 2 OR n2 < 2 OR
                (n1 * ((CAST(sq1 AS DOUBLE)
                        - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)
                          / n1) / (4.0 * (n1 - 1)))
                 + n2 * ((CAST(sq2 AS DOUBLE)
                          - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE)
                            / n2) / (4.0 * (n2 - 1)))) = 0 THEN FALSE
           ELSE ABS((CAST(sr2 AS DOUBLE) / (2.0 * n2)
                - CAST(sr1 AS DOUBLE) / (2.0 * n1))
               * n1 * n2 / (n1 + n2)
               / SQRT(n1 * ((CAST(sq1 AS DOUBLE)
                             - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)
                               / n1) / (4.0 * (n1 - 1)))
                      + n2 * ((CAST(sq2 AS DOUBLE)
                               - CAST(sd2 AS DOUBLE) * CAST(sd2 AS DOUBLE)
                                 / n2) / (4.0 * (n2 - 1)))))
               > {_Z95_2S} END AS rejected
    FROM moms
    """,
)
def stat_brunner_munzel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — BRUNNER–MUNZEL test (Brunner & Munzel 2000) per event type,
    weekend vs weekday values: the nonparametric BEHRENS–FISHER test —
    H0: P(X<Y)+½P(X=Y) = ½ WITHOUT Mann–Whitney's equal-variance
    (exchangeability) assumption, which real A/B traffic routinely
    violates. Emits p̂ (the common-language effect / relative treatment
    effect) and the studentized W statistic.

    Exactness: every observation in a value cell shares its POOLED
    midrank (doubled: 2·cl + cv + 1) and its WITHIN-SAMPLE midrank, so
    the rank means R̄ᵢ and the placement variances Sᵢ² (variance of
    pooled − within midrank, the BM kernel) reduce to exact
    DECIMAL(38,0) grid moments — sums of cell-count × doubled-rank
    products (the DeLong/Kendall-W discipline); W is one fixed-order
    IEEE expression. Large-sample convention: the rejection compares
    |W| to z₀.₉₅ rather than the t(df̂) quantile — at the fixture's
    n ≥ 2000/group the difference is < 10⁻³ (documented; the
    Satterthwaite-df small-sample form needs a t quantile, a special
    function neither engine carries as a shared literal).

    Scale: one (type, value) counting aggregate; grid windows after."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(_dow_spark().isin(1, 7), 1).otherwise(0).alias("wk"),
        _q100().alias("v"),
    )
    return brunner_munzel(base)


def brunner_munzel(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_brunner_munzel` (the library
    form the Engine facade exposes): ``base`` has columns (event_type
    stratum key, wk 0/1 sample flag, v integer value)."""
    cells = base.groupBy("event_type", "v").agg(
        F.sum("wk").cast("bigint").alias("c1"),
        F.sum(1 - F.col("wk")).cast("bigint").alias("c2"),
    )
    wless = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        "c1",
        "c2",
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wless), F.lit(0))
        .cast("bigint")
        .alias("cl"),
        F.coalesce(F.sum("c1").over(wless), F.lit(0))
        .cast("bigint")
        .alias("cl1"),
        F.coalesce(F.sum("c2").over(wless), F.lit(0))
        .cast("bigint")
        .alias("cl2"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c2").over(wall).cast("bigint").alias("n2"),
    )
    # doubled pooled midrank of cell v: 2r = 2*cl + cv + 1; doubled
    # within-sample midrank: 2r_i = 2*cl_i + c_iv + 1; the BM placement
    # is their difference (the +1 cancels)
    cv = F.col("c1") + F.col("c2")
    pr2 = 2 * F.col("cl") + cv + 1
    d1 = (2 * F.col("cl") + cv - 2 * F.col("cl1") - F.col("c1")).cast(
        "decimal(38,0)"
    )
    d2 = (2 * F.col("cl") + cv - 2 * F.col("cl2") - F.col("c2")).cast(
        "decimal(38,0)"
    )
    c1d = F.col("c1").cast("decimal(38,0)")
    c2d = F.col("c2").cast("decimal(38,0)")
    moms = cum.groupBy("event_type").agg(
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
        F.sum(c1d * pr2).cast("decimal(38,0)").alias("sr1"),
        F.sum(c2d * pr2).cast("decimal(38,0)").alias("sr2"),
        F.sum(c1d * d1).cast("decimal(38,0)").alias("sd1"),
        F.sum(c1d * d1 * d1).cast("decimal(38,0)").alias("sq1"),
        F.sum(c2d * d2).cast("decimal(38,0)").alias("sd2"),
        F.sum(c2d * d2 * d2).cast("decimal(38,0)").alias("sq2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    rbar1 = F.col("sr1").cast("double") / (2.0 * n1)
    rbar2 = F.col("sr2").cast("double") / (2.0 * n2)
    s1 = (
        F.col("sq1").cast("double")
        - F.col("sd1").cast("double") * F.col("sd1").cast("double") / n1
    ) / (4.0 * (n1 - 1))
    s2 = (
        F.col("sq2").cast("double")
        - F.col("sd2").cast("double") * F.col("sd2").cast("double") / n2
    ) / (4.0 * (n2 - 1))
    w = (rbar2 - rbar1) * n1 * n2 / (n1 + n2) / F.sqrt(n1 * s1 + n2 * s2)
    # degenerate-margin guards (r15 self-review): n1 = 0 divides p̂ by
    # zero; n_i < 2 divides the placement variance by (n_i − 1); two
    # constant samples make the pooled variance term exactly 0 under W.
    # ANSI Spark throws on each where DuckDB returns NULL — NULL
    # p̂/W, FALSE rejected on both engines.
    null_d = F.lit(None).cast("double")
    small = (n1 < 2) | (n2 < 2)
    return moms.select(
        "event_type",
        n1.alias("n_weekend"),
        n2.alias("n_weekday"),
        F.when((n1 == 0) | (n2 == 0), null_d)
        .otherwise(F.round((rbar2 - (n2 + 1) / 2.0) / n1, 6))
        .alias("p_hat"),
        F.when(small, null_d)
        .when(n1 * s1 + n2 * s2 == 0, null_d)
        .otherwise(F.round(w, 6))
        .alias("w_stat"),
        F.when(small, F.lit(False))
        .when(n1 * s1 + n2 * s2 == 0, F.lit(False))
        .otherwise(F.abs(w) > F.expr(_Z95_2S))
        .alias("rejected"),
    )


# --------------------------------------------------------------------------
# Cramér–von Mises two-sample criterion (round 15)
# --------------------------------------------------------------------------

#: Asymptotic α=0.05 critical value of the limiting ω² (Cramér–von Mises)
#: distribution (Anderson & Darling 1952, Table; the two-sample T
#: statistic converges to the same limit — Anderson 1962).
_CVM_C05 = "0.461"


@register(
    "stat_cvm_two_sample",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CASE WHEN DAYOFWEEK(CAST(ts AS DATE)) IN (0, 6)
                    THEN 1 ELSE 0 END AS wk,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    cells AS (
        SELECT event_type, v,
               CAST(SUM(wk) AS BIGINT) AS c1,
               CAST(SUM(1 - wk) AS BIGINT) AS c2
        FROM base GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v, c1 + c2 AS cz,
               CAST(SUM(c1) OVER w AS BIGINT) AS f1,
               CAST(SUM(c2) OVER w AS BIGINT) AS f2,
               CAST(SUM(c1) OVER (PARTITION BY event_type) AS BIGINT) AS n1,
               CAST(SUM(c2) OVER (PARTITION BY event_type) AS BIGINT) AS n2
        FROM cells
        WINDOW w AS (PARTITION BY event_type ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
        SELECT event_type,
               CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN n1 = 0 OR n2 = 0
                             THEN CAST(0 AS DECIMAL(28,9))
                        ELSE CAST(ROUND(CAST(cz AS DOUBLE)
                          * ((CAST(f1 AS DOUBLE) * n2
                              - CAST(f2 AS DOUBLE) * n1)
                             / (CAST(n1 AS DOUBLE) * n2))
                          * ((CAST(f1 AS DOUBLE) * n2
                              - CAST(f2 AS DOUBLE) * n1)
                             / (CAST(n1 AS DOUBLE) * n2)), 9)
                          AS DECIMAL(28,9)) END) AS DECIMAL(38,9)) AS s
        FROM cum GROUP BY event_type
    )
    SELECT event_type, n1 AS n_weekend, n2 AS n_weekday,
           CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
                ELSE ROUND(CAST(n1 AS DOUBLE) * n2
                           / ((n1 + n2) * CAST(n1 + n2 AS DOUBLE))
                           * CAST(s AS DOUBLE), 6) END AS cvm_t,
           CASE WHEN n1 = 0 OR n2 = 0 THEN FALSE
                ELSE (CAST(n1 AS DOUBLE) * n2
                      / ((n1 + n2) * CAST(n1 + n2 AS DOUBLE))
                      * CAST(s AS DOUBLE)) > {_CVM_C05} END AS rejected
    FROM s
    """,
)
def stat_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — CRAMÉR–VON MISES two-sample criterion (Anderson 1962) per
    event type, weekend vs weekday values: T = n₁n₂/(n₁+n₂)² ·
    Σ_z c_z·(F̂₁(z) − F̂₂(z))² over the pooled sample points — the
    INTEGRATED-squared ECDF distance that complements stat_ks_two_sample's
    sup: KS is driven by the single worst gap, CvM accumulates shape
    drift across the whole distribution (more power against diffuse
    alternatives — the usual drift-monitor pairing). Rejection against
    the asymptotic ω² α=0.05 critical value as a shared literal.

    Exactness: ECDF differences are cross-multiplied exact counts; each
    pooled point's term is ONE fixed-order IEEE expression (identical
    text both engines) rounded to the 9-grid and DECIMAL-summed (the
    g_test discipline); empty-side strata → NULL/FALSE on both engines
    (the r15 ANSI guard rule).

    Scale: the stat_ks_two_sample plan verbatim — one (type, value)
    counting aggregate, grid windows after."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        F.when(_dow_spark().isin(1, 7), 1).otherwise(0).alias("wk"),
        _q100().alias("v"),
    )
    return cvm_two_sample(base)


def cvm_two_sample(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_cvm_two_sample` (the library form
    the Engine facade exposes): ``base`` has columns (event_type
    stratum key, wk 0/1 sample flag, v integer value)."""
    cells = base.groupBy("event_type", "v").agg(
        F.sum("wk").cast("bigint").alias("c1"),
        F.sum(1 - F.col("wk")).cast("bigint").alias("c2"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = cells.select(
        "event_type",
        (F.col("c1") + F.col("c2")).alias("cz"),
        F.sum("c1").over(wcum).cast("bigint").alias("f1"),
        F.sum("c2").over(wcum).cast("bigint").alias("f2"),
        F.sum("c1").over(wall).cast("bigint").alias("n1"),
        F.sum("c2").over(wall).cast("bigint").alias("n2"),
    )
    diff = (
        F.col("f1").cast("double") * F.col("n2")
        - F.col("f2").cast("double") * F.col("n1")
    ) / (F.col("n1").cast("double") * F.col("n2"))
    term = F.when(
        (F.col("n1") == 0) | (F.col("n2") == 0),
        F.lit(0).cast("decimal(28,9)"),
    ).otherwise(
        F.round(F.col("cz").cast("double") * diff * diff, 9).cast(
            "decimal(28,9)"
        )
    )
    s = cum.groupBy("event_type").agg(
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
        F.sum(term).cast("decimal(38,9)").alias("s"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    t = (
        n1.cast("double")
        * n2
        / ((n1 + n2) * (n1 + n2).cast("double"))
        * F.col("s").cast("double")
    )
    degenerate = (n1 == 0) | (n2 == 0)
    return s.select(
        "event_type",
        n1.alias("n_weekend"),
        n2.alias("n_weekday"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(t, 6))
        .alias("cvm_t"),
        F.when(degenerate, F.lit(False))
        .otherwise(t > F.expr(_CVM_C05))
        .alias("rejected"),
    )


# --------------------------------------------------------------------------
# Cochran–Armitage trend test (round 15)
# --------------------------------------------------------------------------

#: Success threshold for the trend fixture: value ≥ 50.00 (integer cents)
#: — a fixed shared literal, the "high-value event" indicator.
_CA_THRESH = 5000


@register(
    "stat_cochran_armitage",
    oracle=f"""
    WITH g AS (
        SELECT event_type, {_DOW_DUCK} AS s,
               CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(CASE WHEN CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                                  >= {_CA_THRESH} THEN 1 ELSE 0 END)
                    AS BIGINT) AS r_i
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(r_i) AS BIGINT) AS r,
               CAST(SUM(s * r_i) AS BIGINT) AS sr,
               CAST(SUM(s * n_i) AS BIGINT) AS sn,
               CAST(SUM(s * s * n_i) AS BIGINT) AS s2n,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g GROUP BY 1
    )
    SELECT event_type, n, r, k AS n_groups,
           CASE WHEN r = 0 OR r = n OR
                     (CAST(s2n AS DOUBLE)
                      - CAST(sn AS DOUBLE) * sn / n) = 0 THEN NULL
                ELSE ROUND((CAST(sr AS DOUBLE) - CAST(r AS DOUBLE) * sn / n)
                  / SQRT(CAST(r AS DOUBLE) / n * (1.0 - CAST(r AS DOUBLE) / n)
                         * (CAST(s2n AS DOUBLE)
                            - CAST(sn AS DOUBLE) * sn / n)), 6)
                END AS z,
           CASE WHEN r = 0 OR r = n OR
                     (CAST(s2n AS DOUBLE)
                      - CAST(sn AS DOUBLE) * sn / n) = 0 THEN FALSE
                ELSE ABS((CAST(sr AS DOUBLE) - CAST(r AS DOUBLE) * sn / n)
                  / SQRT(CAST(r AS DOUBLE) / n * (1.0 - CAST(r AS DOUBLE) / n)
                         * (CAST(s2n AS DOUBLE)
                            - CAST(sn AS DOUBLE) * sn / n)))
                  > {_Z95_2S} END AS rejected
    FROM m
    """,
)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — COCHRAN–ARMITAGE trend test (Cochran 1954, Armitage 1955)
    per event type: does the proportion of HIGH-VALUE events (value ≥
    {_CA_THRESH} cents, a shared literal) trend MONOTONICALLY across
    the ordered weekday groups Sun..Sat (scores s = 1..7)? The binary-
    outcome counterpart of Jonckheere–Terpstra: a 2×k chi-square only
    answers "some weekday differs"; CA is the one-df test with power
    exactly against a linear-in-score trend in proportions.

    Kernel: T = Σsᵢrᵢ − p̄·Σsᵢnᵢ; Var(T) = p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N)
    under H0 (hypergeometric conditioning on R); Z = T/√Var vs z₀.₉₇₅.

    Exactness: one (type, weekday) counting aggregate → exact BIGINT
    moment sums (s ≤ 7, so every sum is ≤ 49N — no int64 hazard); Z is
    ONE fixed-order IEEE expression; degenerate margins (r = 0, r = N,
    or a single represented weekday making the score variance 0) →
    NULL z / FALSE rejected on both engines (the r15 ANSI guard rule).

    Scale: the corpus scan dominates; everything after is a ≤7-row
    grid per type."""
    base = load(spark, sf_dir, "events").select(
        "event_type",
        _dow_spark().cast("bigint").alias("s"),
        F.when(_q100() >= _CA_THRESH, 1).otherwise(0).alias("y"),
    )
    return cochran_armitage(base)


def cochran_armitage(base: DataFrame) -> DataFrame:
    """Frame-level core of :func:`stat_cochran_armitage` (the library
    form the Engine facade exposes): ``base`` has columns (event_type
    stratum key, s integer group score, y 0/1 outcome) — one row per
    trial; the score domain must be bounded (grid algebra)."""
    g = base.groupBy("event_type", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("y").cast("bigint").alias("r_i"),
    )
    m = g.groupBy("event_type").agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("s") * F.col("r_i")).cast("bigint").alias("sr"),
        F.sum(F.col("s") * F.col("n_i")).cast("bigint").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i"))
        .cast("bigint")
        .alias("s2n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    n, r = F.col("n"), F.col("r")
    svar = (
        F.col("s2n").cast("double")
        - F.col("sn").cast("double") * F.col("sn") / n
    )
    t_stat = F.col("sr").cast("double") - r.cast("double") * F.col("sn") / n
    z = t_stat / F.sqrt(
        r.cast("double") / n * (1.0 - r.cast("double") / n) * svar
    )
    degenerate = (r == 0) | (r == n) | (svar == 0)
    return m.select(
        "event_type",
        "n",
        "r",
        F.col("k").alias("n_groups"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(z) > F.expr(_Z95_2S))
        .alias("rejected"),
    )


# --------------------------------------------------------------------------
# Hosmer–Lemeshow calibration test (round 15)
# --------------------------------------------------------------------------

#: χ²₀.₉₅ at df = g − 2 = 9 for the 11-level score grid (shared literal,
#: the stat_mood_median convention).
_CHI2_95_DF9 = "16.918977604620448"

#: Predicted probability for score level v ∈ 0..10: (v + 1)/12 — the
#: add-one-smoothed score mapping, strictly inside (0, 1) so every
#: group's binomial variance n·π(1−π) is positive by construction.
_HL_SMOOTH = (1, 12)


@register(
    "eval_hosmer_lemeshow",
    oracle=f"""
    WITH base AS (
        SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
        FROM lineitem
    ),
    grp AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(pos) AS BIGINT) AS o_g
        FROM base GROUP BY 1
    ),
    terms AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(
                 (o_g - n_g * (CAST(v + {_HL_SMOOTH[0]} AS DOUBLE)
                               / {_HL_SMOOTH[1]}))
                 * (o_g - n_g * (CAST(v + {_HL_SMOOTH[0]} AS DOUBLE)
                                 / {_HL_SMOOTH[1]}))
                 / (n_g * (CAST(v + {_HL_SMOOTH[0]} AS DOUBLE)
                           / {_HL_SMOOTH[1]})
                    * (1.0 - CAST(v + {_HL_SMOOTH[0]} AS DOUBLE)
                             / {_HL_SMOOTH[1]})), 9)
               AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS s
        FROM grp
    )
    SELECT n, n_groups,
           ROUND(CAST(s AS DOUBLE), 6) AS hl_chi2,
           (CAST(s AS DOUBLE) > {_CHI2_95_DF9}) AS rejected
    FROM terms
    """,
)
def eval_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV — HOSMER–LEMESHOW goodness-of-calibration test (Hosmer &
    Lemeshow 1980) on the lineitem discount→return fixture (the
    eval_calibration_bins / eval_ece fixture, now as a TEST): group by
    the 11-level score v = round(100·discount), predicted probability
    π_g = (v+1)/{_HL_SMOOTH[1]} (add-one-smoothed score mapping — a
    shared literal map strictly inside (0,1), so every group's binomial
    variance is positive BY CONSTRUCTION and no degenerate-margin guard
    is needed), Ĉ = Σ_g (O_g − n_g·π_g)²/(n_g·π_g(1−π_g)) vs χ² at
    df = g − 2 = 9. ECE/reliability bins DESCRIBE miscalibration; HL
    is the decision rule reviewers ask for.

    Exactness: (n_g, O_g) are exact integers off one counting
    aggregate; each group's term is ONE fixed-order IEEE expression
    rounded to the 9-grid and DECIMAL-summed; rejection compares the
    unrounded total to the shared χ²₀.₉₅,df9 literal.

    Scale: one corpus scan to an 11-row grid."""
    base = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("pos"),
    )
    return hosmer_lemeshow(base)


def hosmer_lemeshow(scored: DataFrame) -> DataFrame:
    """Frame-level core of :func:`eval_hosmer_lemeshow` (the library
    form the Engine facade exposes): ``scored`` has integer score
    column ``v`` (bounded grid; π = (v+1)/{_HL_SMOOTH[1]} must stay in
    (0,1)) and 0/1 column ``pos``."""
    grp = scored.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("pos").cast("bigint").alias("o_g"),
    )
    pi = (F.col("v") + _HL_SMOOTH[0]).cast("double") / _HL_SMOOTH[1]
    dev = F.col("o_g") - F.col("n_g") * pi
    term = F.round(
        dev * dev / (F.col("n_g") * pi * (1.0 - pi)), 9
    ).cast("decimal(28,9)")
    terms = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum(term).cast("decimal(38,9)").alias("s"),
    )
    return terms.select(
        "n",
        "n_groups",
        F.round(F.col("s").cast("double"), 6).alias("hl_chi2"),
        (F.col("s").cast("double") > F.expr(_CHI2_95_DF9)).alias(
            "rejected"
        ),
    )
