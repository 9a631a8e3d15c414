"""Evaluation & inference statistics — resampling, agreement, and
model-eval metrics the SURVEY.md §2 "training-data pipeline" scope needs
beyond the point statistics the aggregate family already ships.

Everything here follows the repo's exactness discipline (SURVEY.md §5):
integer/decimal algebra carried exactly to the last step, ONE IEEE
division/sqrt at the end (identical on both engines), per-item doubles
rounded to a fixed grid and summed as DECIMAL so the total is
order-independent. Unrolled literal expression chains (pass@k products,
bootstrap thresholds) are generated from shared Python constants so the
Spark column tree and the DuckDB oracle parse the same tokens.

Scale notes are per-operator; the common shape is: one map-side-combined
aggregate to per-group sufficient statistics, then grid-sized algebra
(k values, replicate ids, clusters — never row-cardinality) on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import Column
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load

# --------------------------------------------------------------------------
# pass@k (Chen et al. 2021, "Evaluating LLMs Trained on Code", eq. 1)
# --------------------------------------------------------------------------

#: k values reported by eval_pass_at_k. Every per-problem estimator below is
#: an UNROLLED left-to-right product of k exact-int divisions — written out
#: literally (not folded through an aggregate) so the multiplication order
#: is the source text order on BOTH engines and the double result is
#: bit-identical; n ≤ a few hundred keeps every intermediate integer tiny.
_PASS_KS = (1, 5, 10)


def _pass_product_sql(k: int) -> str:
    """1 - prod_{i<k} (n-c-i)/(n-i), the unbiased pass@k estimator, as a
    literal expression string valid in both Spark SQL and DuckDB."""
    prod = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
        for i in range(k)
    )
    return f"CASE WHEN n - c < {k} THEN 1.0 ELSE 1.0 - ({prod}) END"


def _pass_case_sql() -> str:
    arms = " ".join(
        f"WHEN k = {k} THEN ({_pass_product_sql(k)})" for k in _PASS_KS
    )
    return f"CASE {arms} END"


@register(
    "eval_pass_at_k",
    oracle=f"""
    WITH per AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    est AS (
        SELECT k.k, user_id,
               CAST(ROUND({_pass_case_sql()}, 9) AS DECIMAL(18,9)) AS p
        FROM per, (SELECT UNNEST([{", ".join(map(str, _PASS_KS))}]) AS k) k
        WHERE n >= k.k
    )
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_problems,
           ROUND(CAST(SUM(p) AS DOUBLE) / COUNT(*), 6) AS mean_pass
    FROM est GROUP BY k ORDER BY k
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV — pass@k, the standard code/LLM eval estimator (Chen et al.
    2021 eq. 1): per problem with n samples of which c pass, the
    unbiased estimator 1 − C(n−c,k)/C(n,k), averaged over problems.
    Fixture: problem = user_id, a "sample passes" = event value > 50
    (every user has n ≥ 45 samples at all SFs, so all three k report
    the full problem set).

    Exactness: the combinatorial ratio is computed as the UNROLLED
    product ∏_{{i<k}} (n−c−i)/(n−i) — k exact-integer subtractions, k
    correctly-rounded IEEE divisions, and a left-to-right double product
    whose order is fixed by the expression text, identical on both
    engines (never lgamma, never a product aggregate, both of which are
    engine-order-dependent); n−c<k short-circuits to exactly 1. The
    per-problem estimate rounds to the 9-digit grid and folds through a
    DECIMAL(18,9) sum (dsum rule) so the corpus mean is
    order-independent; one final division, rounded to 6.

    Scale: one map-side-combined groupBy(user) to (n, c) sufficient
    stats, then a ×|ks|=3 broadcast expansion of the per-problem frame
    and a 3-group fold — no shuffle beyond the first aggregate, no
    per-sample state. At 100 TB the (n, c) aggregate is the whole cost."""
    per = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
            .cast("bigint")
            .alias("c"),
        )
    )
    ks = F.broadcast(
        spark.createDataFrame([(k,) for k in _PASS_KS], "k int")
    )
    est = (
        per.crossJoin(ks)
        .filter(F.col("n") >= F.col("k"))
        .select(
            "k",
            F.round(F.expr(_pass_case_sql()), 9)
            .cast("decimal(18,9)")
            .alias("p"),
        )
    )
    return (
        est.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_problems"),
            F.round(
                F.sum("p").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_pass"),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# Fleiss' kappa (Fleiss 1971) — inter-annotator agreement
# --------------------------------------------------------------------------

#: Ratings per item used by eval_fleiss_kappa (every user has ≥ 45 events
#: at all SFs, so the first-n window never under-fills an item).
_FLEISS_N = 5


@register(
    "eval_fleiss_kappa",
    oracle=f"""
    WITH firstn AS (
        SELECT user_id, event_type
        FROM (
            SELECT user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= {_FLEISS_N}
    ),
    nij AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS nij
        FROM firstn GROUP BY 1, 2
    ),
    agree AS (
        SELECT CAST(SUM(nij * nij) AS DECIMAL(38,0))
                 - CAST(COUNT(DISTINCT user_id) AS DECIMAL(38,0))
                     * {_FLEISS_N} AS a,
               CAST(COUNT(DISTINCT user_id) AS DECIMAL(38,0)) AS n_items
        FROM nij
    ),
    cat AS (
        SELECT CAST(SUM(cj * cj) AS DECIMAL(38,0)) AS s
        FROM (SELECT CAST(SUM(nij) AS DECIMAL(19,0)) AS cj
              FROM nij GROUP BY event_type)
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           {_FLEISS_N} AS n_raters,
           ROUND(CAST(a AS DOUBLE)
                 / CAST(n_items * {_FLEISS_N * (_FLEISS_N - 1)}
                        AS DOUBLE), 6) AS p_bar,
           ROUND(CAST(s AS DOUBLE)
                 / CAST(n_items * n_items * {_FLEISS_N * _FLEISS_N}
                        AS DOUBLE), 6) AS p_e,
           ROUND(CAST(a * n_items * {_FLEISS_N * _FLEISS_N}
                      - {_FLEISS_N * (_FLEISS_N - 1)} * s
                      AS DOUBLE)
                 / CAST({_FLEISS_N * (_FLEISS_N - 1)}
                        * (n_items * n_items * {_FLEISS_N * _FLEISS_N} - s)
                        AS DOUBLE), 6) AS kappa
    FROM agree, cat
    """,
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EV — Fleiss' kappa (Fleiss 1971): chance-corrected agreement of a
    fixed panel of n raters assigning categorical labels to N items —
    the annotation-QA statistic every human-labeled training set is
    gated on (Cohen's kappa, already shipped, only handles 2 raters).
    Fixture: item = user_id, the item's n=5 "ratings" = the event_type
    of the user's first 5 events by (ts, event_id).

    Exactness: kappa = (P̄−P̄e)/(1−P̄e) is carried as ONE exact integer
    fraction. With A = Σ_i(Σ_j n_ij² − n) (total within-item agreement
    numerator) and S = Σ_j c_j² (squared category totals), the identity
        kappa = (A·N·n² − n(n−1)·S) / (n(n−1)·(N²n² − S))
    clears every denominator, so numerator and denominator are exact
    DECIMAL(38,0) integers on both engines and the single terminal
    division is one correctly-rounded IEEE op (overflow headroom: terms
    are O(N²·n⁴·counts) ≈ 10^17 at sf100 — decimal 38 holds to ~10^37).
    P̄ and P̄e are emitted the same way as audit columns.

    Scale: the first-n window partitions per user (bounded ~100 rows);
    everything after is (user × category)-sized counts folding to one
    row. At 100 TB this is the classic two-aggregate agreement pass."""
    n = _FLEISS_N
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nij = (
        e.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= n)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
    )
    agree = nij.agg(
        (
            F.sum(F.col("nij") * F.col("nij")).cast("decimal(38,0)")
            - F.countDistinct("user_id").cast("decimal(38,0)") * F.lit(n)
        ).alias("a"),
        F.countDistinct("user_id").cast("decimal(38,0)").alias("n_items"),
    )
    cat = (
        nij.groupBy("event_type")
        .agg(F.sum("nij").cast("decimal(19,0)").alias("cj"))
        .agg(F.sum(F.col("cj") * F.col("cj")).cast("decimal(38,0)").alias("s"))
    )
    nn1, n2 = n * (n - 1), n * n
    joined = agree.crossJoin(F.broadcast(cat))
    a, ni, s = F.col("a"), F.col("n_items"), F.col("s")
    return joined.select(
        ni.cast("bigint").alias("n_items"),
        F.lit(n).alias("n_raters"),
        F.round(a.cast("double") / (ni * nn1).cast("double"), 6).alias(
            "p_bar"
        ),
        F.round(s.cast("double") / (ni * ni * n2).cast("double"), 6).alias(
            "p_e"
        ),
        F.round(
            (a * ni * n2 - F.lit(nn1) * s).cast("double")
            / (F.lit(nn1) * (ni * ni * n2 - s)).cast("double"),
            6,
        ).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Delete-one-cluster jackknife (Efron 1982; cluster-robust SE)
# --------------------------------------------------------------------------


@register(
    "stat_jackknife_cluster",
    oracle="""
    WITH per AS (
        SELECT c.c_nationkey AS g,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 10000.0 + 0.5)
                             AS BIGINT)) AS DECIMAL(38,0)) AS su,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(su) AS DECIMAL(38,0)) AS ts,
               CAST(SUM(cnt) AS BIGINT) AS tn,
               CAST(COUNT(*) AS BIGINT) AS gcnt
        FROM per
    ),
    loo AS (
        SELECT ROUND(CAST((t.ts - p.su) AS DOUBLE) / 10000.0
                     / (t.tn - p.cnt), 9) AS theta_i, t.gcnt
        FROM per p, tot t
    ),
    jbar AS (
        SELECT ROUND(CAST(SUM(CAST(theta_i AS DECIMAL(18,9))) AS DOUBLE)
                     / MIN(gcnt), 9) AS m, MIN(gcnt) AS gcnt
        FROM loo
    )
    SELECT t.gcnt AS n_clusters,
           ROUND(CAST(t.ts AS DOUBLE) / 10000.0 / t.tn, 6) AS theta_hat,
           ROUND(SQRT(
               CAST(SUM(CAST(ROUND((l.theta_i - j.m)
                                   * (l.theta_i - j.m), 12)
                             AS DECIMAL(28,12))) AS DOUBLE)
               * (t.gcnt - 1) / t.gcnt), 6) AS jackknife_se
    FROM loo l, jbar j, tot t
    GROUP BY t.gcnt, t.ts, t.tn
    """,
)
def stat_jackknife_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — delete-one-CLUSTER jackknife standard error (Efron 1982) of
    a ratio estimator: the mean order price with customers clustered by
    nation — the cluster-robust uncertainty every A/B readout over
    correlated units needs (iid SEs are anti-conservative when rows
    within a nation co-move). θ̂ = ΣS/ΣN; θ_(g) drops cluster g from
    both sums; SE² = (G−1)/G · Σ(θ_(g) − θ̄_J)².

    Exactness: per-cluster price sums quantize through the iusum rule
    (floor(x·10⁴+0.5), exact DECIMAL(38,0) totals), so every θ_(g) is
    two exact integers through one IEEE divide, rounded to the 9-grid;
    the jackknife mean and the squared deviations fold through DECIMAL
    accumulators (12-grid for the squares), making every sum
    order-independent; sqrt and the final ×(G−1)/G happen once.

    Scale: one shuffle to 25 clusters (broadcast dim join feeds it),
    then G-sized algebra — leave-one-out via (total − cluster) needs no
    second pass over rows. The 100 TB cost is the single groupBy."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    per = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("g"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 10000.0 + 0.5).cast(
                    "decimal(38,0)"
                )
            )
            .cast("decimal(38,0)")
            .alias("su"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
    )
    tot = per.agg(
        F.sum("su").cast("decimal(38,0)").alias("ts"),
        F.sum("cnt").cast("bigint").alias("tn"),
        F.count(F.lit(1)).cast("bigint").alias("gcnt"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("ts") - F.col("su")).cast("double")
            / 10000.0
            / (F.col("tn") - F.col("cnt")),
            9,
        ).alias("theta_i"),
        "gcnt",
        "ts",
        "tn",
    )
    jbar = loo.agg(
        F.round(
            F.sum(F.col("theta_i").cast("decimal(18,9)")).cast("double")
            / F.min("gcnt"),
            9,
        ).alias("m")
    )
    dev = loo.crossJoin(F.broadcast(jbar))
    return dev.groupBy("gcnt", "ts", "tn").agg(
        F.round(
            F.sqrt(
                F.sum(
                    F.round(
                        (F.col("theta_i") - F.col("m"))
                        * (F.col("theta_i") - F.col("m")),
                        12,
                    ).cast("decimal(28,12)")
                ).cast("double")
                * (F.col("gcnt") - 1)
                / F.col("gcnt")
            ),
            6,
        ).alias("jackknife_se")
    ).select(
        F.col("gcnt").alias("n_clusters"),
        F.round(F.col("ts").cast("double") / 10000.0 / F.col("tn"), 6).alias(
            "theta_hat"
        ),
        "jackknife_se",
    )
