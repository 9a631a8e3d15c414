"""Frequent-itemset / association-rule mining over event baskets.

Reference parity: the reconstructed reference (SURVEY.md §0) has no pattern
miner; this module extends the engine's analytics surface the same way the
entity-resolution and curation families do — with DataFrame-native,
oracle-checked operators a production event pipeline actually runs. The
operator here is the classic market-basket analysis (Agrawal & Srikant's
Apriori at itemset size 2, the size that covers the overwhelming share of
real-world rule mining): which pairs of event types co-occur in the same
basket more often than chance, with support / confidence / lift.

Basket definition: one basket per (user_id, calendar day) — "what a user
did that day". The item domain is ``event_type`` (small, bounded), so the
per-basket itemset is bounded by the type cardinality, NEVER by event
volume: a basket with 10,000 click events still contributes ONE
``(basket, click)`` row after the distinct. That bound is what makes the
pair self-join linear at 100 TB:

  * ``distinct(basket, item)`` — one shuffle, map-side combined, output
    ≤ |baskets| × |types| rows;
  * pair generation is an EQUI-join on the basket key (never a cross
    join); per-basket pair fan-out ≤ C(|types|, 2), a compile-time-ish
    constant (here C(5,2) = 10);
  * per-item basket counts and the grand basket total are broadcast back
    (|types| rows + 1 scalar) — the same 1-row-cross-join shape every
    corpus-total operator in this engine uses.

With an UNBOUNDED item domain (e.g. products), the same plan holds but the
per-basket fan-out needs the engine's standard skew defense — and it is
IMPLEMENTED here: :func:`basket_items` caps items per basket with the
``drop`` | ``error`` modes of ``lsh_band_pairs`` / ``blocked_match_pairs``
plus the :func:`oversized_baskets` observer; the registered queries run
``error`` mode (exact-or-fail: bit-identical to uncapped semantics or a
loud failure — never a silent oracle divergence), and a synthetic
mega-basket pytest pins both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.capping import (
    capped_group,
    oversized_groups,
)
from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load

#: Minimum co-occurrence count for a pair to be reported. Keeps the output
#: support-thresholded like every real rule miner (and the fixture's counts
#: far above it, so the threshold never flakes a hash).
MIN_PAIR_SUPPORT = 5



#: Per-basket item cap for unbounded item domains (the skew defense the
#: module docstring promises). The fixture's domain is structurally
#: bounded (|event types| = 5), so the registered queries run the
#: exact-or-fail ``error`` mode with a far-above-fixture cap — the same
#: contract ``dedup_minhash_verified`` uses: output is bit-identical to
#: uncapped semantics, and a future fixture (or real corpus) with a
#: mega-basket fails LOUDLY instead of silently diverging from the
#: uncapped oracle.
MINING_MAX_BASKET_ITEMS = 64


def oversized_baskets(
    baskets: DataFrame, max_items: int = MINING_MAX_BASKET_ITEMS
) -> DataFrame:
    """(user_id, day, n_items) for baskets the cap would drop — the
    monitoring half of drop-with-log (``lsh_oversized_buckets`` twin).
    Delegates to the shared :func:`~avro_parquet_spark_example_spark.
    operators.capping.oversized_groups`."""
    return oversized_groups(
        baskets, ["user_id", "day"], max_items
    ).withColumnRenamed("group_size", "n_items")


def basket_items(
    ev: DataFrame,
    max_items_per_basket: int | None = MINING_MAX_BASKET_ITEMS,
    on_oversized: str = "error",
) -> DataFrame:
    """Distinct (user_id, day, event_type) basket memberships with the
    engine's standard per-key skew cap: pair/triple generation is
    quadratic/cubic in basket size, so a mega-basket (one user-day with
    thousands of distinct items on an unbounded domain) is the same
    hazard class as an LSH mega-bucket and takes the same dial —
    basket sizes are counted on the SAME (user, day) key the pair join
    shuffles on, and ``on_oversized`` picks ``drop`` (exclude + observe
    via :func:`oversized_baskets`) or ``error`` (assert_true riding the
    size aggregate: exact-or-fail, for hash-checked callers). ``None``
    disables the cap. Cap machinery: the shared
    :func:`~avro_parquet_spark_example_spark.operators.capping.
    capped_group` — ``split`` is deliberately NOT allowed here (a
    sub-partitioned basket silently loses pairs across sub-baskets with
    no multi-pass union to recover them, unlike LSH bands / ER passes)."""
    baskets = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    capped, _ = capped_group(
        baskets,
        ["user_id", "day"],
        max_items_per_basket,
        on_oversized,
        cap_name="max_items_per_basket",
        label="basket",
        allowed_modes=("drop", "error"),
    )
    return capped


@register(
    "mine_association_pairs",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    nb AS (
        SELECT CAST(COUNT(DISTINCT (user_id, day)) AS BIGINT) AS n_baskets
        FROM baskets
    ),
    item_n AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM baskets GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               CAST(COUNT(*) AS BIGINT) AS pair_n
        FROM baskets a
        JOIN baskets b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.item_a, p.item_b, p.pair_n,
           ROUND(p.pair_n * 1.0 / nb.n_baskets, 6) AS support,
           ROUND(p.pair_n * 1.0 / na.n, 6) AS conf_a_to_b,
           ROUND(p.pair_n * 1.0 / nbv.n, 6) AS conf_b_to_a,
           ROUND(p.pair_n * 1.0 * nb.n_baskets / (na.n * nbv.n), 6) AS lift
    FROM pairs p
    JOIN item_n na ON na.event_type = p.item_a
    JOIN item_n nbv ON nbv.event_type = p.item_b
    CROSS JOIN nb
    WHERE p.pair_n >= {MIN_PAIR_SUPPORT}
    """,
)
def mine_association_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — association-rule mining at itemset size 2 over (user, day)
    baskets of event types: co-occurrence count, support (share of all
    baskets containing both items), both directed confidences, and lift
    (observed co-occurrence vs independence). lift > 1 = the pair
    co-occurs MORE than independent rates predict — the "users who did X
    that day also did Y" signal behind funnels, recommendations, and
    anomaly rules (error co-occurring with purchase).

    All counts are integers; the ratios divide those integers the same
    way on both engines and round at 6dp, so the driver hash is safe.

    Scale shape (module docstring has the full argument): distinct →
    basket-key equi-join with a C(|types|, 2) per-basket fan-out bound →
    map-side-combined pair aggregate; item counts (|types| rows) and the
    basket total (1 row) are broadcast."""
    baskets = basket_items(
        load(spark, sf_dir, "events")
    ).localCheckpoint(eager=True)  # consumed 3x: total, item_n, pairs
    n_baskets = F.broadcast(
        baskets.select("user_id", "day")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    item_n = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.select(
        "user_id", "day", F.col("event_type").alias("item_a")
    )
    b = baskets.select(
        "user_id", "day", F.col("event_type").alias("item_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= MIN_PAIR_SUPPORT)
    )
    na = F.broadcast(
        item_n.select(F.col("event_type").alias("item_a"), F.col("n").alias("na"))
    )
    nb = F.broadcast(
        item_n.select(F.col("event_type").alias("item_b"), F.col("n").alias("nb"))
    )
    return (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .crossJoin(n_baskets)
        .select(
            "item_a",
            "item_b",
            "pair_n",
            F.round(F.col("pair_n") * 1.0 / F.col("n_baskets"), 6).alias(
                "support"
            ),
            F.round(F.col("pair_n") * 1.0 / F.col("na"), 6).alias(
                "conf_a_to_b"
            ),
            F.round(F.col("pair_n") * 1.0 / F.col("nb"), 6).alias(
                "conf_b_to_a"
            ),
            F.round(
                F.col("pair_n") * 1.0 * F.col("n_baskets")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


#: Number of top paths reported by the sequential miner.
TOP_PATHS = 20


@register(
    "mine_sequence_trigrams",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tri AS (
        SELECT event_type AS t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE t3 IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT t1, t2, t3, n
    FROM tri
    ORDER BY n DESC, t1, t2, t3
    LIMIT {TOP_PATHS}
    """,
)
def mine_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 — sequential pattern mining at length 3: the most frequent
    consecutive event-type paths across user timelines ("view → click →
    purchase"), the order-2 extension of ``ts_transition_matrix``'s
    order-1 Markov counts. This is the funnel-discovery primitive:
    instead of checking a HYPOTHESIZED funnel (``ts_funnel_conversion``),
    it surfaces which paths actually dominate.

    Determinism: counts are integers and the top-20 carries a full
    lexicographic tiebreak; the per-user ordering is total (ts, then
    event_id) so window LEADs agree across engines.

    Scale: one shuffle by user_id for the ordered window (per-user
    sequences, never a global sort), then a map-side-combined trigram
    aggregate whose key space is ≤ |types|³; top-20 is
    TakeOrderedAndProject (no global sort of the aggregate either)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t1", "t2", "t3")
        .limit(TOP_PATHS)
    )


# ---------------------------------------------------------------------------
# M3 — Pareto-frontier (skyline) mining


@register(
    "mine_skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT p_partkey,
               CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
               CAST(p_size AS BIGINT) AS size
        FROM part
    ),
    pairs AS (SELECT DISTINCT price_cents, size FROM pts),
    sky AS (
        SELECT price_cents, size FROM pairs p
        WHERE NOT EXISTS (
            SELECT 1 FROM pairs q
            WHERE q.price_cents <= p.price_cents AND q.size >= p.size
              AND (q.price_cents < p.price_cents OR q.size > p.size)
        )
    )
    SELECT t.p_partkey, t.price_cents, t.size
    FROM pts t
    JOIN sky s ON s.price_cents = t.price_cents AND s.size = t.size
    """,
)
def mine_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 — skyline / Pareto-frontier query over parts: every part for
    which no other part is both cheaper-or-equal AND larger-or-equal
    (with one strict) — the classic multi-objective "best trade-offs"
    operator (Börzsönyi et al.'s SKYLINE OF, ICDE 2001), minimizing
    ``p_retailprice`` while maximizing ``p_size``. Prices are compared
    in exact integer cents.

    Naïvely skyline is a quadratic NOT-EXISTS self-join (the oracle runs
    exactly that — correct at oracle scale, wrong at 100 TB). The engine
    uses the distributive structure instead:

      1. ``distinct (price, size)`` pairs — one map-side-combined
         shuffle; all dominance logic runs on pairs, never on rows.
      2. LOCAL prune: pairs are salted into 32 hash groups; within a
         group, sorted by (price asc, size desc), a pair survives iff
         its size exceeds the running max size of all predecessors
         (any predecessor with size >= mine dominates me: it is either
         strictly cheaper, or equal-priced with strictly larger size —
         equal-on-both is impossible among distinct pairs). One
         PARTITIONED window, never a global sort; eliminates all but
         O(frontier) pairs per group on any data distribution.
      3. GLOBAL refine: the union of local survivors (≤ 32 × per-group
         frontier, a few hundred rows worst-case here) runs the exact
         dominance anti-join against its own broadcast copy.
      4. Surviving (price, size) pairs equi-join back to parts so tied
         parts all appear.

    At 100 TB only step 1 touches the corpus; the frontier refine is
    constant-sized. Output: every Pareto-optimal part (key, cents, size).
    """
    pts = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias(
            "price_cents"
        ),
        F.col("p_size").cast("bigint").alias("size"),
    )
    pairs = pts.select("price_cents", "size").distinct()
    w = (
        Window.partitionBy(F.pmod(F.hash("price_cents", "size"), F.lit(32)))
        .orderBy(F.col("price_cents").asc(), F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_sky = (
        pairs.withColumn("prev_max", F.max("size").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("prev_max") < F.col("size")))
        .select("price_cents", "size")
    )
    s, d = local_sky.alias("s"), local_sky.alias("d")
    dominated = (
        (F.col("d.price_cents") <= F.col("s.price_cents"))
        & (F.col("d.size") >= F.col("s.size"))
        & (
            (F.col("d.price_cents") < F.col("s.price_cents"))
            | (F.col("d.size") > F.col("s.size"))
        )
    )
    sky = s.join(F.broadcast(d), dominated, "left_anti")
    return pts.join(
        F.broadcast(sky), ["price_cents", "size"]
    ).select("p_partkey", "price_cents", "size")


# ---------------------------------------------------------------------------
# M4 — Apriori size-3 itemsets with candidate pruning

#: Minimum basket support for a triple (and for the pairs that may
#: extend to one — the Apriori downward-closure prune).
MIN_TRIPLE_SUPPORT = 5


@register(
    "mine_itemset_triples",
    oracle=f"""
    WITH baskets AS MATERIALIZED (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    )
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           c.event_type AS item_c,
           CAST(COUNT(*) AS BIGINT) AS triple_n
    FROM baskets a
    JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                  AND a.event_type < b.event_type
    JOIN baskets c ON a.user_id = c.user_id AND a.day = c.day
                  AND b.event_type < c.event_type
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= {MIN_TRIPLE_SUPPORT}
    """,
)
def mine_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — frequent 3-itemsets with the actual Apriori prune (Agrawal &
    Srikant VLDB'94 downward closure): a triple can only be frequent if
    all three of its pairs are, so candidate triples are built by
    JOINING THE FREQUENT-PAIR LIST WITH ITSELF on a shared first item
    (the classic candidate-generation step) and each basket only
    extends pairs that survived the pair pass. The oracle runs the
    naive 3-way basket self-join — correct, and exactly the plan whose
    per-basket fan-out (C(|items|,2) → C(|items|,3)) the prune exists
    to cut at scale.

    Engine shape: pair counts (one equi-join, the ``mine_association_
    pairs`` plan), frequent pairs broadcast (≤ |types|² rows), candidate
    triples from the pair list (driver-free join), then ONE pass
    joining baskets to candidates via the (a, b) pair and checking c —
    three map-side-combined aggregates, no triple self-join of the
    corpus ever materializes.

    Downward closure is also pinned by a pytest: every emitted triple's
    three sub-pairs appear in ``mine_association_pairs``-style counts
    at ≥ the triple's support."""
    baskets = basket_items(load(spark, sf_dir, "events")).localCheckpoint(
        eager=True
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("pa"),
            F.col("b.event_type").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_TRIPLE_SUPPORT)
        .select("pa", "pb")
    )
    # Apriori candidate generation: join frequent pairs sharing the first
    # item; (x,y)+(x,z) with y<z → candidate (x,y,z); the third sub-pair
    # (y,z) must itself be frequent (full downward closure).
    p1, p2, p3 = pairs.alias("p1"), pairs.alias("p2"), pairs.alias("p3")
    cands = (
        p1.join(
            p2,
            (F.col("p1.pa") == F.col("p2.pa"))
            & (F.col("p1.pb") < F.col("p2.pb")),
        )
        .join(
            p3,
            (F.col("p3.pa") == F.col("p1.pb"))
            & (F.col("p3.pb") == F.col("p2.pb")),
            "left_semi",
        )
        .select(
            F.col("p1.pa").alias("ca"),
            F.col("p1.pb").alias("cb"),
            F.col("p2.pb").alias("cc"),
        )
    )
    # one basket pass: attach candidate (a,b,c) via the (a,b) items, then
    # require the basket to also hold c
    ba, bb, bc = baskets.alias("ba"), baskets.alias("bb"), baskets.alias("bc")
    return (
        ba.join(
            bb,
            (F.col("ba.user_id") == F.col("bb.user_id"))
            & (F.col("ba.day") == F.col("bb.day")),
        )
        .join(
            F.broadcast(cands),
            (F.col("ba.event_type") == F.col("ca"))
            & (F.col("bb.event_type") == F.col("cb")),
        )
        .join(
            bc,
            (F.col("bc.user_id") == F.col("ba.user_id"))
            & (F.col("bc.day") == F.col("ba.day"))
            & (F.col("bc.event_type") == F.col("cc")),
            "left_semi",
        )
        .groupBy(
            F.col("ca").alias("item_a"),
            F.col("cb").alias("item_b"),
            F.col("cc").alias("item_c"),
        )
        .agg(F.count(F.lit(1)).alias("triple_n"))
        .filter(F.col("triple_n") >= MIN_TRIPLE_SUPPORT)
    )


# ---------------------------------------------------------------------------
# M5 — high-utility pair mining

#: Minimum total pair utility (integer cents) for a pair to be reported.
MIN_PAIR_UTILITY_CENTS = 1000


@register(
    "mine_utility_pairs",
    oracle=f"""
    WITH bi AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS util
        FROM events GROUP BY 1, 2, 3
    )
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           CAST(COUNT(*) AS BIGINT) AS pair_n,
           CAST(SUM(a.util + b.util) AS BIGINT) AS utility_cents
    FROM bi a JOIN bi b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
    GROUP BY 1, 2
    HAVING SUM(a.util + b.util) >= {MIN_PAIR_UTILITY_CENTS}
    """,
)
def mine_utility_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 — high-utility itemset mining at size 2 (Yao et al.'s HUI
    framing): rank co-occurring pairs not by how OFTEN they co-occur
    (support — ``mine_association_pairs``) but by how much VALUE the
    two items carry in the baskets where they co-occur — Σ over
    co-baskets of (u_a + u_b), the standard transaction-utility measure
    that surfaces low-frequency/high-value pairs support-based mining
    throws away. Utilities are exact integer cents (event values
    quantized, summed per basket-item first, so a basket with 10,000
    click events still contributes ONE utility row per item — the same
    per-basket bound as the association miner; the utility rows are
    routed through the SAME per-basket cap as ``basket_items`` in
    exact-or-fail ``error`` mode, closing the exemption ADVICE r9
    flagged: on an unbounded item domain a mega-basket raises instead of
    quadratically fanning out unguarded).

    One (basket, item) utility aggregate, one basket-key equi-join,
    one map-side-combined pair aggregate. All-integer output."""
    ev = load(spark, sf_dir, "events")
    bi = ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("util")
    )
    bi, _ = capped_group(
        bi,
        ["user_id", "day"],
        MINING_MAX_BASKET_ITEMS,
        "error",
        cap_name="max_items_per_basket",
        label="utility basket",
        allowed_modes=("drop", "error"),
    )
    bi = bi.localCheckpoint(eager=True)
    a, b = bi.alias("a"), bi.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("pair_n"),
            F.sum(F.col("a.util") + F.col("b.util")).alias(
                "utility_cents"
            ),
        )
        .filter(F.col("utility_cents") >= MIN_PAIR_UTILITY_CENTS)
    )
