"""Entity resolution / record linkage — blocking, pairwise match, transitive
clustering, survivorship (SURVEY.md §2 H-family extension: the
training-data-pipeline operator that reconciles the same real-world entity
appearing under typo'd / reformatted keys across sources).

The classic three-stage shape (Fellegi–Sunter framing, Febrl-style
corruption benchmark):

1. **Blocking** — cheap deterministic keys bound the candidate space; the
   self-join runs per block, never all-pairs (the LSH-bucket precedent in
   operators/dedup.py, with a hand-designed key instead of hashed bands).
2. **Pairwise match** — exact edit-distance verification on candidates
   only (``levenshtein`` is built-in on BOTH engines, so the match score
   is an exact integer and the whole stage hash-checks cross-engine).
3. **Clustering + survivorship** — matched pairs are transitively closed
   into entity clusters (records A—B and B—C merge even when A—C exceeds
   the pairwise threshold), then each cluster elects a golden record.

The driver fixture is entity-duplicate-free, so the checked queries inject
deterministic corrupted variants on BOTH engines (the
``with_injected_duplicates`` precedent, operators/dedup.py:63): for each
customer key < 80, three classic typo classes over the word part of
``c_name`` — substitution ('m'→'n' at position 6), deletion (position 4),
adjacent transposition (positions 2/3). Corruptions hit the PREFIX only,
which is what makes the blocking key honest: ``right(name, 6)`` is
position-independent, so any single prefix edit leaves it intact — the
textbook "block on the field the corruption model doesn't touch" rule
(production rotates several keys across passes; the single-key form keeps
the oracle exact, and multi-pass rotation is already demonstrated by
``dedup_sorted_neighborhood``).

Scale shape: blocking is one projection + a per-block self-join whose
block sizes are data-bounded (here ≤ 4: one source + three variants; a
skewed block is the same hazard class as an LSH mega-bucket and takes the
same cap — ``max_block_size`` below, mirroring ``lsh_band_pairs``),
Levenshtein runs only on candidate pairs, and clustering uses the shared
``connected_components`` (bounded per-round state). The pipeline runs
over the FULL customer table — only the injected groups produce matches,
so the output is fixture-determined (400 match edges across 80 injected
groups; 320 clustered records) while the blocking/verify stages still
scan corpus-sized input at every SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load

#: Injected-variant id offsets (one per corruption class) and the source
#: universe bound. Sources are c_custkey < ER_N_SOURCES (exists at every
#: SF); variants get source_key + offset, far outside any real key range.
ER_N_SOURCES = 80
ER_OFF_SUB = 800_000
ER_OFF_DEL = 900_000
ER_OFF_SWP = 1_000_000

#: Pairwise match threshold: max Levenshtein distance. 2 admits every
#: (source, variant) pair plus the (sub, del) and (del, swp) variant
#: pairs, while the (sub, swp) pair sits at distance 3 — matched only
#: TRANSITIVELY through the source, which is exactly what stage 3 is for.
ER_MAX_LEV = 2

#: Block-size skew dial (the ``LSH_MAX_BUCKET`` twin, operators/dedup.py):
#: the per-block self-join is quadratic in block size, so blocks above the
#: cap are excluded BEFORE the join. Fixture blocks are ≤ 4 (one source +
#: three variants — ``right(name, 6)`` is unique per custkey below 10^6),
#: so 64 is pure headroom; the cap exists for real corpora where a hot
#: suffix (shared surname, empty string, truncated field) would otherwise
#: go quadratic with no defense.
ER_MAX_BLOCK = 64

#: The corrupted-variant UNION, shared verbatim by all three oracles.
_ER_RECS_SQL = f"""
    recs AS (
        SELECT c_custkey AS id, c_name AS name FROM customer
        UNION ALL
        SELECT c_custkey + {ER_OFF_SUB},
               SUBSTR(c_name, 1, 5) || 'n' || SUBSTR(c_name, 7)
        FROM customer WHERE c_custkey < {ER_N_SOURCES}
        UNION ALL
        SELECT c_custkey + {ER_OFF_DEL},
               SUBSTR(c_name, 1, 3) || SUBSTR(c_name, 5)
        FROM customer WHERE c_custkey < {ER_N_SOURCES}
        UNION ALL
        SELECT c_custkey + {ER_OFF_SWP},
               SUBSTR(c_name, 1, 1) || SUBSTR(c_name, 3, 1)
                 || SUBSTR(c_name, 2, 1) || SUBSTR(c_name, 4)
        FROM customer WHERE c_custkey < {ER_N_SOURCES}
    ),
    keyed AS (SELECT id, name, RIGHT(name, 6) AS bkey FROM recs),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               LEVENSHTEIN(a.name, b.name) AS lev
        FROM keyed a JOIN keyed b ON b.bkey = a.bkey AND a.id < b.id
        WHERE LEVENSHTEIN(a.name, b.name) <= {ER_MAX_LEV}
    )"""


def er_records(cust: DataFrame) -> DataFrame:
    """(id, name): full customer table plus the three injected corrupted
    variants per source key < ER_N_SOURCES — the Spark twin of
    ``_ER_RECS_SQL``."""
    base = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    src = base.filter(F.col("id") < ER_N_SOURCES)
    sub = src.select(
        (F.col("id") + ER_OFF_SUB).alias("id"),
        F.concat(
            F.substring("name", 1, 5), F.lit("n"), F.substring("name", 7, 100)
        ).alias("name"),
    )
    dele = src.select(
        (F.col("id") + ER_OFF_DEL).alias("id"),
        F.concat(F.substring("name", 1, 3), F.substring("name", 5, 100)).alias(
            "name"
        ),
    )
    swp = src.select(
        (F.col("id") + ER_OFF_SWP).alias("id"),
        F.concat(
            F.substring("name", 1, 1),
            F.substring("name", 3, 1),
            F.substring("name", 2, 1),
            F.substring("name", 4, 100),
        ).alias("name"),
    )
    return base.unionByName(sub).unionByName(dele).unionByName(swp)


def er_oversized_blocks(
    recs: DataFrame,
    block_tail: int = 6,
    max_block_size: int = ER_MAX_BLOCK,
) -> DataFrame:
    """(bkey, block_size) for blocks the cap would drop — the monitoring
    half of drop-with-log (the ``lsh_oversized_buckets`` twin,
    operators/dedup.py): production runs this alongside
    ``blocked_match_pairs`` and alerts/samples the dropped blocks."""
    return (
        recs.select(F.expr(f"right(name, {block_tail})").alias("bkey"))
        .groupBy("bkey")
        .agg(F.count(F.lit(1)).alias("block_size"))
        .filter(F.col("block_size") > max_block_size)
    )


def blocked_match_pairs(
    recs: DataFrame,
    max_lev: int = ER_MAX_LEV,
    block_tail: int = 6,
    max_block_size: int | None = ER_MAX_BLOCK,
    on_oversized: str = "drop",
) -> DataFrame:
    """(id_a, id_b, lev) — stage 1+2: block on the edit-surviving suffix
    key, self-join per block, verify candidates with exact Levenshtein.
    The join shuffles (id, name, bkey) rows hashed on bkey; Levenshtein
    cost is paid per CANDIDATE, bounded by sum-of-block-size² — the
    all-pairs quadratic never materializes.

    ``max_block_size`` is the skew dial: block sizes are counted with one
    map-side-combined aggregate on the SAME key the self-join shuffles on,
    and blocks above the cap — or below 2, which cannot form a pair — are
    excluded BEFORE the join, so no executor ever materializes a quadratic
    hot-block expansion. ``None`` disables the cap. ``on_oversized`` picks
    what a >cap block does (the ``lsh_band_pairs`` contract verbatim):

    * ``"drop"`` (production default) — drop-with-log; dropped blocks are
      observable via ``er_oversized_blocks``. Output is cap-DEPENDENT.
    * ``"error"`` — exact-or-fail: ``assert_true`` on the shared block-size
      aggregate raises at execution time if ANY block exceeds the cap, so
      a succeeding run is bit-identical to the uncapped semantics. This is
      what the oracle-hash-checked ``er_*`` queries use — their DuckDB
      oracles are uncapped, so a future corpus with an organic hot block
      fails loudly instead of silently diverging from the oracle.
    """
    if on_oversized not in ("drop", "error"):
        raise ValueError(f"on_oversized must be drop|error, got {on_oversized!r}")
    keyed = recs.select(
        "id", "name", F.expr(f"right(name, {block_tail})").alias("bkey")
    )
    if max_block_size is not None:
        sized = (
            keyed.groupBy("bkey")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") >= 2)
        )
        if on_oversized == "error":
            # assert_true returns NULL when the predicate holds and raises
            # at execution time when it does not; filtering on isNull keeps
            # every row while forcing the check into the plan.
            admitted = sized.filter(
                F.assert_true(
                    F.col("__bsz") <= F.lit(max_block_size),
                    F.concat(
                        F.lit("ER block exceeds max_block_size="),
                        F.lit(str(max_block_size)),
                        F.lit(": bkey="),
                        F.col("bkey"),
                        F.lit(" size="),
                        F.col("__bsz").cast("string"),
                    ),
                ).isNull()
            ).select("bkey")
        else:
            admitted = sized.filter(F.col("__bsz") <= max_block_size).select(
                "bkey"
            )
        keyed = keyed.join(admitted, "bkey")
    a = keyed.alias("a")
    b = keyed.alias("b")
    lev = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("b.bkey") == F.col("a.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            lev.alias("lev"),
        )
        .filter(F.col("lev") <= max_lev)
    )


@register(
    "er_blocked_match",
    oracle=f"""
    WITH {_ER_RECS_SQL}
    SELECT id_a, id_b, lev FROM pairs
    """,
)
def er_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12a — blocking + pairwise match. Every (source, variant) pair
    surfaces (lev 1 for substitution/deletion, 2 for transposition), plus
    the (sub, del) and (del, swp) variant pairs at lev 2 — five edges per
    injected group; the (sub, swp) pair sits at lev 3 and is matched only
    transitively (er_match_clusters). Zero edges elsewhere: uncorrupted
    names are pairwise-unique and share a block only with their own
    group's variants. Integer Levenshtein on both engines ⇒ hash-exact.
    ``on_oversized="error"``: the oracle is uncapped, so the block cap
    must be exact-or-fail (the ``dedup_minhash_verified`` precedent)."""
    return blocked_match_pairs(
        er_records(load(spark, sf_dir, "customer")), on_oversized="error"
    )


@register(
    "er_match_clusters",
    oracle=f"""
    WITH RECURSIVE {_ER_RECS_SQL},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
    )
    SELECT node AS id, MIN(r) AS cluster_id, (MIN(r) = node) AS is_golden
    FROM reach GROUP BY node
    """,
)
def er_match_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12b — transitive entity clustering: matched pairs close under
    connectivity (min-reachable-id label, the shared
    ``connected_components``), so the (sub, swp) variant pair — pairwise
    distance 3, never a direct edge — still lands in the same 4-record
    entity cluster. ``is_golden`` marks
    the cluster representative (min id = the uncorrupted source, because
    variant offsets exceed every real key). Oracle: recursive-CTE
    transitive closure (the dedup_minhash_verified precedent)."""
    from avro_parquet_spark_example_spark.operators.dedup import (
        connected_components,
    )

    pairs = blocked_match_pairs(
        er_records(load(spark, sf_dir, "customer")), on_oversized="error"
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return connected_components(pairs).select(
        "id",
        "cluster_id",
        (F.col("cluster_id") == F.col("id")).alias("is_golden"),
    )


@register(
    "er_golden_record",
    oracle=f"""
    WITH RECURSIVE {_ER_RECS_SQL},
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
    ),
    clusters AS (
        SELECT node AS id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT c.cluster_id,
           MAX(CASE WHEN c.id = c.cluster_id THEN r.name END) AS golden_name,
           COUNT(*) AS n_members,
           COUNT(DISTINCT r.name) AS n_name_variants
    FROM clusters c JOIN recs r ON r.id = c.id
    GROUP BY c.cluster_id
    """,
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12c — survivorship: each entity cluster elects its golden record
    (the cluster representative's name) and reports member/variant
    counts — the MDM "merge" step that follows linkage. One broadcast
    join from the (small, duplicate-rate-bounded) cluster map back to the
    record table, then a map-side-combined per-cluster rollup."""
    from avro_parquet_spark_example_spark.operators.dedup import (
        connected_components,
    )

    recs = er_records(load(spark, sf_dir, "customer")).localCheckpoint(
        eager=True
    )  # feeds the match pipeline AND the survivorship join-back
    pairs = blocked_match_pairs(recs, on_oversized="error").select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    clusters = connected_components(pairs)
    return (
        F.broadcast(clusters)
        .join(recs, "id")
        .groupBy("cluster_id")
        .agg(
            F.max(
                F.when(F.col("id") == F.col("cluster_id"), F.col("name"))
            ).alias("golden_name"),
            F.count(F.lit(1)).alias("n_members"),
            F.count_distinct("name").alias("n_name_variants"),
        )
    )
