"""Group E — window functions, global sort, top-k, set operations
(SURVEY.md §2-E).

Windows shuffle once on their partition key and sort within partitions —
at 100 TB the cost driver is the exchange, so every query here partitions by
a real key (never a global window without PARTITION BY, which would funnel
all data to one task). Every orderBy carries a deterministic tiebreaker
(SURVEY.md §5) so results hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


@register(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — top-3 orders per customer by row_number (tiebreak o_orderkey)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK()         OVER w AS rk,
           DENSE_RANK()   OVER w AS drk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — rank / dense_rank / ntile / percent_rank over one window spec."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           value - LAG(value)  OVER w AS delta_prev,
           LEAD(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 — per-user event deltas via lag/lead over event time."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
             AS neighborhood_sum
    FROM orders
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — running total (unbounded→current) and sliding 3-row frame;
    decimal accumulator keeps the running double sums engine-identical."""
    o = load(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(30,4)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(price_dec)
        .over(w.rowsBetween(-1, 1))
        .cast("double")
        .alias("neighborhood_sum"),
    )


@register(
    "sort_global",
    oracle="""
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
    FROM customer
    WHERE c_acctbal < 1000
    ORDER BY seg NULLS LAST, c_acctbal DESC, c_custkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 — global multi-key sort with NULLS LAST (range-partitioned
    exchange; Spark samples ranges so no single-task bottleneck)."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    return (
        c.filter(F.col("c_acctbal") < 1000)
        .select("c_custkey", seg, "c_acctbal")
        .orderBy(
            F.asc_nulls_last("seg"), F.desc("c_acctbal"), F.asc("c_custkey")
        )
    )


@register(
    "topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 — ORDER BY … LIMIT k: Spark plans TakeOrderedAndProject (per-
    partition heaps + driver merge of k) — no global sort at any scale."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "repartition_sort_within",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity >= 40
    """,
)
def repartition_sort_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 — DISTRIBUTE BY + SORT BY: hash-repartition on a key and sort
    within each partition (no global order). This is the layout-control
    primitive for preparing co-located, locally-ordered data — the write-
    side half of bucketing, and the shape merge-friendly consumers want.
    Values are unchanged, so the order-insensitive oracle checks equality
    while the plan carries the exchange + in-partition sort."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .repartition(8, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


@register("sample_scan")  # sampling is engine-specific → rows-only check
def sample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10 — seeded Bernoulli sample (~10%): per-row coin flips during the
    scan, no shuffle, reproducible for a fixed seed. Sample membership is
    engine-specific (Spark's XORShift vs DuckDB's RNG) so the driver check
    is rows-only; tests bound the sampled fraction."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "set_union_all",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7a — UNION ALL of two filtered subsets (no shuffle, plan concat)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.filter(F.col("l_quantity") < 5).unionByName(
        li.filter(F.col("l_quantity") > 45)
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7b — UNION (distinct): union + hash aggregate on all columns."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nk")
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8a — INTERSECT (distinct semantics → left-semi under the hood)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 3000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8b — EXCEPT (distinct semantics → left-anti under the hood)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 3000)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return c.subtract(s)


#: Per-language keep probabilities for ``sample_stratified`` — the single
#: source of truth the fraction-bound test imports.
STRATIFIED_FRACTIONS = {"en": 0.2, "es": 0.5, "zh": 0.5, "de": 0.8, "fr": 0.8}


@register("sample_stratified")  # sampling is engine-specific → rows-only check
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10b — seeded stratified sample over documents: a different keep
    probability per language stratum (the training-data mixing knob —
    e.g. downsample the dominant language, keep the rest). ``sampleBy``
    is per-row coin flips keyed by the stratum column during the scan:
    no shuffle, no stratum-size driver lookup, reproducible for a fixed
    seed. Membership is engine-specific so the driver check is
    rows-only; tests bound each stratum's realized fraction."""
    d = load(spark, sf_dir, "documents")
    return d.sampleBy("lang", STRATIFIED_FRACTIONS, seed=42).select(
        "doc_id", "lang", "source"
    )


@register(
    "sample_train_test_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id,
               CASE
                 WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b'
                   THEN 'train'
                 WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd')
                   THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM assigned GROUP BY split
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (12:2:2 over the md5
    hex space of the primary key) — the reproducible assignment every
    training pipeline needs: stable under reruns, re-partitioning, and
    incremental ingestion (a document's split NEVER changes when other rows
    arrive, unlike fraction sampling). md5 renders identical hex in Spark
    and DuckDB, so assignment is verified cross-engine. Pure per-row hash:
    no shuffle for the assignment itself; the summary here is one
    map-side-combined aggregate."""
    d = load(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(first_hex.between("0", "b"), "train")
        .when(first_hex.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


#: Weighted-sampling draw modulus (prime) and its exact powers, used by the
#: Efraimidis–Spirakis key below. N² and N³ are spelled as literals so both
#: engines parse the same exact integer constants.
_WS_N = 1_000_003
_WS_N2 = _WS_N * _WS_N
_WS_N3 = _WS_N * _WS_N * _WS_N

#: The exact-integer ES key: u^(1/w) ordering is preserved under the
#: monotone map x → x⁴ (u ∈ (0,1]), so comparing u^(4/w) — an exact integer
#: once multiplied through by the common denominator N⁴ — selects the same
#: sample as the float formula with zero rounding ambiguity:
#:   w=4 → u·N³,  w=2 → u²·N²,  w=1 → u⁴.
#: Every multiplicand is cast to DECIMAL(19,0): DuckDB executes ≤18-digit
#: decimal products in int64 (overflowing at u²·N²), while 19-digit
#: operands force int128 with result DECIMAL(38,0) — and Spark caps the
#: same product at DECIMAL(38,0) — so both engines carry the full exact
#: integer (≤ N⁴ ≈ 10²⁴).
_WS_U2 = "CAST(CAST(u AS DECIMAL(10,0)) * CAST(u AS DECIMAL(10,0)) AS DECIMAL(19,0))"
_WS_KEY_SQL = f"""
    CASE
      WHEN w = 4 THEN CAST(u AS DECIMAL(19,0)) * CAST({_WS_N3} AS DECIMAL(19,0))
      WHEN w = 2 THEN {_WS_U2} * CAST({_WS_N2} AS DECIMAL(19,0))
      ELSE {_WS_U2} * {_WS_U2}
    END
"""


@register(
    "sample_weighted_exact",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'en' THEN 4
                    WHEN lang = 'es' THEN 2 ELSE 1 END AS w,
               ((doc_id * 1103515245 + 12345) % {_WS_N}) + 1 AS u
        FROM documents
    )
    SELECT doc_id, lang, w, u
    FROM ranked
    ORDER BY {_WS_KEY_SQL} DESC, doc_id
    LIMIT 100
    """,
)
def sample_weighted_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    each row draws a uniform u and competes with key u^(1/w); the k largest
    keys are a weighted sample without replacement — the standard one-pass
    distributed algorithm (its reservoir form is Spark's own
    ``sampleByKey`` machinery). Language weights 4/2/1 oversample en/es.

    Two determinism choices make this oracle-checkable bit-for-bit:
    the uniform draw is a seeded integer LCG on the primary key (pure
    int64 arithmetic — in production you'd swap in ``xxhash64``, which
    DuckDB lacks), and the key comparison u^(1/w) is raised to the 4th
    power and multiplied through by N⁴, turning every key into an EXACT
    integer (w=4 → u·N³, w=2 → u²·N², w=1 → u⁴ — DECIMAL(28,0) worst
    case). No float pow, no ulp-dependent tie, no rounding convention.

    Scale shape: the key is a map-only expression; ``ORDER BY key LIMIT k``
    compiles to TakeOrderedAndProject — per-partition top-k heaps merged on
    the driver, NO global sort shuffle, identical plan at 100 TB."""
    d = load(spark, sf_dir, "documents")
    w = (
        F.when(F.col("lang") == "en", 4)
        .when(F.col("lang") == "es", 2)
        .otherwise(1)
    )
    u = (F.col("doc_id") * 1103515245 + 12345) % _WS_N + 1
    keyed = d.select(
        "doc_id", "lang", w.alias("w"), u.cast("bigint").alias("u")
    )
    return keyed.orderBy(
        F.expr(_WS_KEY_SQL).desc(), F.col("doc_id")
    ).limit(100)


@register(
    "window_value_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS biggest,
           LAST_VALUE(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS smallest,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           ROUND(CUME_DIST() OVER w, 6) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2b — value window functions: first_value / last_value / nth_value /
    cume_dist per customer by order size. last_value needs the explicit
    unbounded-following frame on BOTH engines (the default frame stops at
    CURRENT ROW, where last_value degenerates to the current row); the
    ordering carries the PK tiebreak like every window in the engine."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("biggest"),
        F.last("o_totalprice").over(w_full).alias("smallest"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
           CAST(SUM(CAST(value AS DECIMAL(30,4)))
                OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_1h_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             AS trailing_1h_n
    FROM events
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4b — TIME-based window frames (RANGE BETWEEN over event-time
    seconds, not ROWS): each event's trailing-1-hour sum and count per user
    — the sliding-metric shape (rate limits, rolling spend) that row-count
    frames can't express because event density varies. RANGE frames include
    all peers at the same order value, so ties are deterministic without a
    tiebreaker. Order key is epoch seconds floored identically in both
    engines; the sum rides the DECIMAL(30,4) accumulator so frame-partial
    sums are engine-identical. Same scale shape as every window here: one
    hash partition by user, per-partition sort — at 100 TB user_id
    cardinality gives full parallelism and AQE handles hot users."""
    e = load(spark, sf_dir, "events")
    sec = F.floor(F.col("ts").cast("double")).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", sec.alias("sec"), F.col("value").cast("decimal(30,4)").alias("v")
    ).select(
        "event_id",
        "user_id",
        "sec",
        F.sum("v").over(w).cast("double").alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_n"),
    )


@register(
    "window_distinct_rolling",
    oracle="""
    SELECT event_id, user_id,
           COUNT(DISTINCT event_type)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS n_types_7,
           COUNT(*)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS n_events_7
    FROM events
    """,
)
def window_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4b — rolling DISTINCT count over a row frame: how many distinct
    event types each user touched in their trailing 7 events — the
    behavioral-diversity feature every sequence model and fraud rule
    wants, and a window shape engines disagree on: DuckDB evaluates
    ``COUNT(DISTINCT) OVER`` natively, while Spark forbids distinct
    aggregates in windows — so the Spark side computes the SAME value as
    ``size(array_distinct(collect_list))`` over the identical frame. The
    oracle pins the two formulations equal. Total order (ts, event_id)
    makes the frame deterministic under timestamp ties.

    Scale: one shuffle by user; frame state is ≤7 strings per row. A
    set-valued sliding aggregate this small beats materializing pairwise
    self-joins by orders of magnitude at 100 TB."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("bigint")
        .alias("n_types_7"),
        F.count(F.lit(1)).over(w).alias("n_events_7"),
    )


@register(
    "sample_fixed_k_per_group",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5(CAST(doc_id AS VARCHAR) || ':ksample7'),
                            doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def sample_fixed_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E10c — deterministic fixed-k sample PER GROUP (20 docs per
    language): unlike fraction sampling (sample_stratified), the output
    size is exact — what eval-set construction and human-review queues
    need. Ranking by a seeded md5 of the key gives a uniform,
    rerun-stable order (same trick as sample_train_test_split), and the
    doc_id tiebreak makes the cut deterministic even under hash
    collisions. Exactly the reservoir-sampling contract, without
    reservoir state: one window per group, top-k rows kept.

    Scale: one shuffle by group; Spark's WindowGroupLimit pushes the
    rn ≤ k filter into the sort, so each partition keeps k rows, not the
    group."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ksample7")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id", "n_chars")
    )


@register(
    "set_bag_semantics",
    oracle="""
    WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0),
         b AS (SELECT c_nationkey AS k FROM customer
               WHERE c_mktsegment = 'BUILDING')
    SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
        SELECT k FROM a INTERSECT ALL SELECT k FROM b
    ) GROUP BY k
    UNION ALL
    SELECT 'except_all', k, COUNT(*) FROM (
        SELECT k FROM a EXCEPT ALL SELECT k FROM b
    ) GROUP BY k
    """,
)
def set_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8b — BAG (multiset) set operations: INTERSECT ALL keeps
    min(m, n) copies of a value present m and n times, EXCEPT ALL keeps
    m − n — semantics the DISTINCT forms (set_intersect/set_except)
    silently collapse, and the difference matters whenever rows carry
    multiplicity meaning (inventory reconciliation, event diffing).
    Summarized as per-key multiplicities so the hash pins the COUNTS the
    bag semantics produce, not just membership.

    Spark plans both as aggregate-then-join (counts per key, no row
    explosion) — the same shape it uses at any scale."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select(F.col("c_nationkey").alias("k"))
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("k")
    )
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return ia.unionByName(ea)


#: Systematic sampling stride: keep every K-th row of the sorted sequence.
SYSTEMATIC_K = 10


@register(
    "sample_systematic_every_k",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, n_chars, rn
    FROM r WHERE rn % {SYSTEMATIC_K} = 1
    """,
)
def sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S — systematic (every-K-th) sampling over a SORTED sequence: order
    docs by (n_chars, doc_id), keep ranks 1, K+1, 2K+1, … — the sampling
    design that guarantees even coverage of the size distribution (a
    uniform hash sample can cluster; the systematic stride cannot), the
    standard way to draw eval/holdout slices that look like the corpus.
    Deterministic by construction — no RNG, so unlike ``sample_scan``'s
    engine-specific sampler this IS oracle-hash-checkable.

    The global sort-rank is the usual hazard; the engine reuses
    :func:`~...timeseries.global_ntile`'s range-bucketed two-phase rank
    (rank_col mode) — no single-task sort at any scale."""
    from avro_parquet_spark_example_spark.operators.timeseries import (
        global_ntile,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_ntile(
        docs, "n_chars", 1, "doc_id", "__t", rank_col="rn"
    ).drop("__t")
    return ranked.filter(
        F.pmod(F.col("rn"), F.lit(SYSTEMATIC_K)) == 1
    ).select("doc_id", "n_chars", "rn")


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT l_returnflag, l_quantity,
           ROUND(PERCENT_RANK() OVER w, 9) AS pr,
           ROUND(CUME_DIST() OVER w, 9) AS cd
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2' — relative-standing window functions: PERCENT_RANK ((rank−1)/
    (n−1)) and CUME_DIST (peers ≤ current / n) of each lineitem's
    quantity within its return-flag class — the "what percentile is this
    row" primitives that complete the ranking family (rank/dense_rank/
    ntile are ordinal; these two are the normalized forms analysts feed
    into thresholds). Tie groups share both values by definition, so the
    row-level output is deterministic without a tiebreak column; both
    quotients are exact ratios of small integers rounded identically on
    the two engines.

    Scale shape (VERDICT r11 task #1 — the naive form was the registry's
    one scale-killer): a full-table ``Window.partitionBy(l_returnflag)``
    puts ~1/3 of the table in ONE task's sort. Both statistics are
    functions of the TIE GROUP only, so they come from the joint
    frequency matrix instead (the ``agg_spearman_rank_corr`` precedent):
    one map-side-combined (flag, qty) count, a window over the
    DOMAIN-sized matrix (≤ |flags|·|qtys| rows at any corpus size —
    min-rank = cf − f + 1 from a running sum), and one broadcast join
    decorating the full table. No full-table sort or window anywhere;
    the row-level stage is embarrassingly parallel. (The
    ``percent_rank_cume`` library form the Engine facade exposes.)"""
    li = load(spark, sf_dir, "lineitem")
    return percent_rank_cume(
        li, partition_by="l_returnflag", order_by="l_quantity"
    )


def percent_rank_cume(
    df: DataFrame, partition_by: str, order_by: str
) -> DataFrame:
    """(partition_by, order_by, pr, cd) — exact PERCENT_RANK and
    CUME_DIST of ``order_by`` within each ``partition_by`` class WITHOUT
    a full-table window — the library form the Engine facade exposes;
    ``window_percent_rank_cume`` is its registered oracle-checked
    instance (facade-parity single-source rule).

    Requires a bounded-domain order column (quantize continuous ones
    first — the engine-wide rank-statistics convention): the only window
    runs over the (partition, value) frequency matrix, which is
    domain-sized regardless of corpus size. With rank = cf − f + 1
    (cf = running count through this tie group, f = group size, n =
    partition total): pr = (rank−1)/(n−1) = (cf−f)/(n−1), cd = cf/n —
    exact integer ratios through one double division each, rounded to
    9dp identically on both engines."""
    d = df.select(
        F.col(partition_by).alias("p"), F.col(order_by).alias("v")
    )
    jm = d.groupBy("p", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    wc = (
        Window.partitionBy("p")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("p").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # both sums ride ONE sort of the domain-sized matrix (same partition
    # + order spec) — deriving n this way avoids a third table scan
    ranked = (
        jm.withColumn("cf", F.sum("f").over(wc).cast("bigint"))
        .withColumn("n", F.sum("f").over(wp).cast("bigint"))
        .select(
            "p",
            "v",
            F.when(F.col("n") == 1, F.lit(0.0))
            .otherwise(
                F.round(
                    (F.col("cf") - F.col("f")).cast("double")
                    / (F.col("n") - 1),
                    9,
                )
            )
            .alias("pr"),
            F.round(F.col("cf").cast("double") / F.col("n"), 9).alias("cd"),
        )
    )
    return df.select(partition_by, order_by).join(
        F.broadcast(ranked),
        (F.col(partition_by) == F.col("p"))
        & (F.col(order_by) == F.col("v")),
    ).select(partition_by, order_by, "pr", "cd")
