"""Training-corpus curation operators, part 2 — the export-side half of the
pipeline (SURVEY.md §2 H6/H7 extensions).

Round 1 covered the *filtering* half (quality gates, PII, dedup); this
module adds the *assembly* half a 100 TB training-data pipeline needs once
the corpus is clean: chunking long documents into model-window pieces,
packing short ones into fixed token budgets, deterministic seeded global
shuffle + sharding for the final export, domain/language mixture
downsampling, and resolving near-dup candidate PAIRS into connected
components so exactly one canonical doc per cluster survives.

Every operator here is deterministic and SQL-expressible, so each carries a
DuckDB oracle — including the connected-components op, whose oracle is a
recursive CTE computing the transitive closure that the Spark side reaches
by iterative min-label propagation.

Scale notes are per-operator; the common theme is that nothing here needs a
global single-partition stage: chunking/packing/mixture are per-key window
or map-only plans, the shuffle-shard op partitions BY the shard key it
derives, and CC propagates labels via key-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from avro_parquet_spark_example_spark.operators.dedup import (
    connected_components,
    neardup_jaccard,
)
from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load

#: Chunking geometry: model-window-sized pieces with overlap so no span of
#: CHUNK - STRIDE chars is ever split across a boundary without context.
CHUNK = 200
STRIDE = 150

#: Sequence-packing token budget (a stand-in for the model context length).
PACK_BUDGET = 512

#: Seed baked into the deterministic shuffle key.
SHUFFLE_SEED = 42


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = CHUNK,
    stride: int = STRIDE,
) -> DataFrame:
    """(id, chunk_id, chunk, chunk_len) sliding-window pieces of
    ``text_col`` — map-only explode+substring, reused by the
    ``text_chunk_overlap`` query and ``Engine.chunk``."""
    n = F.length(text_col)
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - chunk) / F.lit(float(stride)))
    )
    return (
        df.select(id_col, text_col, n_chunks.cast("bigint").alias("n_chunks"))
        .select(
            id_col,
            text_col,
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            "chunk_id",
            F.expr(
                f"substring({text_col}, CAST(1 + chunk_id * {stride} AS INT), {chunk})"
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("bigint"))
    )


def shard_for_export(
    df: DataFrame, id_col: str = "doc_id", seed: int = SHUFFLE_SEED
) -> DataFrame:
    """Append the deterministic ``shuffle_key`` (md5 of id:seed) and its
    16-way hex ``shard`` — the seeded-global-shuffle export keying, reused
    by ``shuffle_seeded_shards`` and ``Engine.shuffle_export``."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
    return df.withColumn("shuffle_key", key).withColumn(
        "shard", F.substring("shuffle_key", 1, 1)
    )


@register(
    "text_chunk_overlap",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text,
               CASE WHEN LEN(text) <= {CHUNK} THEN 1
                    ELSE 1 + CAST(CEIL((LEN(text) - {CHUNK}) / {STRIDE}.0) AS BIGINT)
               END AS n_chunks
        FROM documents
    )
    SELECT d.doc_id,
           r.range AS chunk_id,
           SUBSTR(d.text, 1 + CAST(r.range AS INT) * {STRIDE}, {CHUNK}) AS chunk,
           CAST(LEN(SUBSTR(d.text, 1 + CAST(r.range AS INT) * {STRIDE}, {CHUNK}))
                AS BIGINT) AS chunk_len
    FROM d, RANGE(0, 64) r
    WHERE r.range < d.n_chunks
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6h — sliding-window document chunking (CHUNK=200 chars, STRIDE=150,
    so consecutive chunks overlap by 50): the standard long-document →
    model-window split. Implemented as ``explode(sequence(0, n_chunks-1))``
    + ``substring`` — all JVM builtins, whole-stage codegen, and a map-only
    plan: zero shuffles, so at 100 TB it scales with scan bandwidth alone
    and chunk counts per task stay bounded by the row's own length.
    ``sequence`` end is ``n_chunks-1 >= 0`` by construction (Spark's
    sequence counts DOWN for end < start — guarded here by the CASE).
    The oracle cross-joins a bounded RANGE table and filters to the same
    per-row chunk count."""
    return chunk_documents(load(spark, sf_dir, "documents"))


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    placed AS (
        SELECT lang, n_tok,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM toks
    )
    SELECT lang,
           CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM placed
    GROUP BY lang, CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT)
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6i — sequence packing by concatenation: within each language stream,
    documents are laid end-to-end in doc_id order and each doc is assigned
    to the PACK_BUDGET-token bin its start offset falls in (the
    concatenate-then-cut packing used to fill model context windows without
    padding waste). One running-sum window per lang partition (map-side
    running state, no extra shuffle beyond the partitionBy) feeds one
    map-side-combined aggregation. At 100 TB the lang partition is too
    coarse for full parallelism — production subpartitions by
    (lang, shard = hash(doc_id) % K) and packs per shard, the identical
    plan shape; the window itself never needs a global order."""
    d = load(spark, sf_dir, "documents")

    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn("cum", F.sum("n_tok").over(w))
    bin_ = F.floor((F.col("cum") - F.col("n_tok")) / F.lit(float(PACK_BUDGET)))
    return (
        placed.select("lang", bin_.cast("bigint").alias("bin"), "n_tok")
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


@register(
    "shuffle_seeded_shards",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               MD5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}') AS shuffle_key
        FROM documents
    )
    SELECT doc_id,
           SUBSTR(shuffle_key, 1, 1) AS shard,
           shuffle_key,
           ROW_NUMBER() OVER (PARTITION BY SUBSTR(shuffle_key, 1, 1)
                              ORDER BY shuffle_key, doc_id) AS rank_in_shard
    FROM keyed
    """,
)
def shuffle_seeded_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6j — deterministic seeded global shuffle + sharding, the final
    export step of a training pipeline: key every doc with
    ``md5(doc_id:seed)``, shard on the key's first hex digit (16 shards
    here; production widens the prefix), and order within each shard by the
    key. Re-running with the same seed reproduces the exact byte order —
    the property that makes training runs resumable and ablations
    comparable. Deliberately NO global row_number: ordering is
    (shard, rank_in_shard), so the only shuffle is the hash partition by
    shard and every shard sorts independently — at 100 TB this is
    ``repartition(shard).sortWithinPartitions(key)`` feeding the writer,
    with no single-partition stage anywhere."""
    keyed = shard_for_export(
        load(spark, sf_dir, "documents").select("doc_id")
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        "shuffle_key",
        F.row_number().over(w).cast("bigint").alias("rank_in_shard"),
    )


@register(
    "mixture_downsample",
    oracle=f"""
    WITH keyed AS (
        SELECT lang,
               SUBSTR(MD5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}'), 1, 1)
                 < CASE lang WHEN 'en' THEN '8' WHEN 'de' THEN '4'
                             WHEN 'fr' THEN '4' ELSE '2' END AS kept
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN kept THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS keep_ratio
    FROM keyed
    GROUP BY lang
    """,
)
def mixture_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6k — deterministic data-mixture downsampling: each language gets a
    target keep-fraction (en 8/16, de 4/16, fr 4/16, rest 2/16) applied by
    comparing the doc's seeded md5 hex prefix against a per-lang cutoff
    digit. Hash-threshold sampling instead of per-group row_number: the
    keep/drop decision is a pure map on each row — no window, no shuffle,
    no skew sensitivity when one domain holds 90% of the corpus — yet the
    selected SET is exactly reproducible from (seed, cutoffs), which
    row_number-based sampling only achieves after a per-group sort. The
    aggregate here audits realized ratios against targets; the production
    path keeps the filtered rows and writes them."""
    d = load(spark, sf_dir, "documents")
    digit = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}"))), 1, 1
    )
    cutoff = (
        F.when(F.col("lang") == "en", "8")
        .when(F.col("lang") == "de", "4")
        .when(F.col("lang") == "fr", "4")
        .otherwise("2")
    )
    keyed = d.select("lang", (digit < cutoff).alias("kept"))
    return keyed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("kept"), 1).otherwise(0)) * 1.0 / F.count(F.lit(1)), 6
        ).alias("keep_ratio"),
    )


#: Shared recursive-CTE prefix for the connected-component oracles:
#: Jaccard candidate pairs over doc_id < 150, symmetrized edges, and the
#: transitive closure ``reach``; consumers append their own final select
#: (dedup_cluster_cc labels components, dedup_cluster_quality_pick keeps
#: one best doc per component).
_CC_CTES = """
    WITH RECURSIVE toks AS (
        SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS tok
        FROM documents WHERE doc_id < 150
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a, b FROM common
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.55
    ),
    edges AS (
        SELECT a AS u, b AS v FROM pairs
        UNION ALL
        SELECT b AS u, a AS v FROM pairs
    ),
    nodes AS (SELECT doc_id AS node FROM documents WHERE doc_id < 150),
    reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
    )
"""


@register(
    "dedup_cluster_cc",
    oracle=_CC_CTES
    + """
    SELECT node AS doc_id,
           MIN(r) AS component,
           (MIN(r) = node) AS is_canonical
    FROM reach GROUP BY node
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2f — near-dup cluster resolution: the Jaccard candidate PAIRS from
    ``neardup_jaccard`` become an undirected graph and each doc is labeled
    with its connected component's minimum doc_id, so dedup can keep
    exactly one canonical doc per cluster (pairwise output alone can't —
    a~b, b~c must collapse to one survivor, not two). Spark side: the
    shared ``connected_components`` min-label propagation (the same loop
    dedup_minhash_lsh resolves its clusters with) — each round every node
    takes
    ``min(own label, neighbors' labels)`` via one key-partitioned
    join + aggregate, with ``localCheckpoint`` truncating the growing
    lineage per round; rounds needed = graph diameter. At 100 TB-scale
    graphs the same loop runs with the large-star/small-star optimization
    (Kiveris et al., "Connected Components in MapReduce") to collapse
    long paths in O(log n) rounds — identical join shape per round. The
    oracle computes the same fixpoint as a recursive-CTE transitive
    closure."""
    pairs = neardup_jaccard(spark, sf_dir).select("a", "b")
    labeled = connected_components(pairs, max_iter=25)
    nodes = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select(F.col("doc_id"))
    )
    return nodes.join(
        labeled, nodes["doc_id"] == labeled["id"], "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("component"),
        (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias("is_canonical"),
    )


#: Per-domain document budget for the frequency-cap operator.
DOMAIN_CAP = 15


@register(
    "curation_domain_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {DOMAIN_CAP}
    """,
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6m — per-domain frequency cap (C4/RefinedWeb-style): keep at most
    DOMAIN_CAP documents per source domain so no single crawl host
    dominates the mixture, preferring the longest documents and breaking
    ties by doc_id so the kept SET is deterministic. One window over the
    domain key: the shuffle partitions by ``source``, each partition sorts
    locally — no global sort, no second pass. At 100 TB a hot domain is
    exactly the skew case: the rank-then-filter shape lets AQE split the
    oversized partition, and because only rn <= CAP rows survive the
    filter, the downstream stage sees bounded per-domain output no matter
    how large the input domain was."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .select("doc_id", "source", "rn")
    )


@register(
    "curation_quality_percentile",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LEN(x) >= 4))
                 * 1.0 / LEN(STRING_SPLIT(text, ' ')) AS score
        FROM documents WHERE text IS NOT NULL
    ),
    ranked AS (
        SELECT doc_id, lang, score,
               PERCENT_RANK() OVER (PARTITION BY lang
                                    ORDER BY score, doc_id) AS pct
        FROM scored
    )
    SELECT doc_id, lang, ROUND(score, 6) AS score, ROUND(pct, 6) AS pct
    FROM ranked WHERE pct >= 0.3
    """,
)
def curation_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6n — percentile-calibrated quality filter: drop the worst 30% of
    documents PER LANGUAGE by quality score (here: long-word ratio, an
    exact int/int division both engines compute bit-identically). Absolute
    quality thresholds are miscalibrated across languages — a cutoff tuned
    on English drops most of a morphologically-rich language — so
    production pipelines rank within language and cut at a percentile,
    which is exactly one window per language partition. Deterministic:
    PERCENT_RANK over (score, doc_id) has no ties, so the kept set is a
    function of the data. At 100 TB: one shuffle keyed by lang; skewed
    (dominant-language) partitions are the AQE-split case, or pre-split by
    (lang, salt) and take per-salt percentiles as an approximation."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "lang",
        (
            F.size(F.filter(toks, lambda t: F.length(t) >= 4))
            * 1.0
            / F.size(toks)
        ).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    return (
        scored.withColumn("pct", F.percent_rank().over(w))
        .filter(F.col("pct") >= 0.3)
        .select(
            "doc_id",
            "lang",
            F.round("score", 6).alias("score"),
            F.round("pct", 6).alias("pct"),
        )
    )


@register(
    "curation_token_budget_select",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> LEN(x) >= 4))
                 * 1.0 / LEN(STRING_SPLIT(text, ' ')) AS score
        FROM documents WHERE text IS NOT NULL
    ),
    ranked AS (
        SELECT doc_id, n_tokens, score,
               CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id) AS BIGINT)
                 AS cum_tokens
        FROM scored
    )
    SELECT doc_id, n_tokens, ROUND(score, 6) AS score, cum_tokens
    FROM ranked
    WHERE cum_tokens <= (SELECT CAST(SUM(n_tokens) * 0.5 AS BIGINT) FROM scored)
    """,
)
def curation_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6o — token-budget corpus selection: take documents in descending
    quality order until a global token budget (here 50% of corpus tokens)
    is spent — the final assembly step of every pretraining run. The naive
    form is a GLOBAL running sum (an unpartitioned window = one executor
    holds the corpus), so this implements the classic distributed prefix
    sum instead:

      1. range-bucket rows by score on a FIXED uniform grid — scores are
         ratios in [0, 1], so ``bucket = least(floor((1 - score) * 32),
         31)`` is fully deterministic (no sketch, no driver round-trip),
         value-disjoint (every bucket covers one half-open score range,
         so bucket asc + score desc == global score desc), and
         tie-preserving (equal scores share a bucket);
      2. per-bucket token sums → collect the ≤32 partials → exclusive
         prefix offsets, rejoined as a broadcast;
      3. running sum WITHIN each bucket (partitioned window) + its
         bucket's offset = the exact global cumulative sum.

    An earlier revision derived bucket boundaries from
    ``approxQuantile(…, 0.001)``; the GK sketch's merge order varies with
    task scheduling, which the round-4 driver run surfaced as a one-off
    hash divergence. The fixed grid removes the nondeterminism wholesale
    (uniform buckets may be skewed vs quantile buckets, but AQE splits a
    hot score range at scale, and correctness never depended on balance).

    At 100 TB every stage is bounded: the driver sees O(buckets) scalars,
    each bucket windows independently, and AQE splits a hot score range.
    Output hash-matches DuckDB's single-sequence SUM OVER (ORDER BY)."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split("text", " ")
    scored = (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            (
                F.size(F.filter(toks, lambda t: F.length(t) >= 4))
                * 1.0
                / F.size(toks)
            ).alias("score"),
        )
        .localCheckpoint(eager=True)  # consumed 3x: budget, sums, window
    )
    budget = scored.agg(
        (F.sum("n_tokens") * 0.5).cast("bigint").alias("b")
    ).collect()[0].b

    n_buckets = 32
    # bucket 0 = highest scores (descending order); score ∈ [0, 1] exactly
    # (integer-count ratio), so the grid covers the domain with no driver
    # computation and no run-to-run variance.
    bucket = F.least(
        F.floor((F.lit(1.0) - F.col("score")) * n_buckets).cast("int"),
        F.lit(n_buckets - 1),
    )
    bucketed = scored.withColumn("bucket", bucket)

    sums = {
        r.bucket: r.s
        for r in bucketed.groupBy("bucket").agg(F.sum("n_tokens").alias("s")).collect()
    }
    acc = 0
    offset_rows = []
    for k in sorted(sums):  # bucket 0 first (highest scores)
        offset_rows.append((k, acc))
        acc += sums[k]
    offsets_df = F.broadcast(
        scored.sparkSession.createDataFrame(offset_rows, "bucket int, offset long")
    )

    w = Window.partitionBy("bucket").orderBy(F.col("score").desc(), "doc_id")
    return (
        bucketed.join(offsets_df, "bucket")
        .withColumn(
            "cum_tokens", F.sum("n_tokens").over(w) + F.col("offset")
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(
            "doc_id",
            "n_tokens",
            F.round("score", 6).alias("score"),
            "cum_tokens",
        )
    )


def dsir_selected(
    df,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
):
    """DSIR importance selection: score every doc by the average per-token
    log-ratio of the add-1-smoothed target unigram distribution (rows where
    ``is_target``) against the raw corpus, return the docs whose average
    favors the target as (id, *keep_cols, n_tok, avg_log_ratio). Per-token
    ratios round to 9 decimals and sum as DECIMAL(18,9) so the score is
    order-independent. Shared by the oracle-checked
    ``curation_dsir_importance`` and ``Engine.select_dsir``."""
    keep_cols = keep_cols or []
    toks = df.select(
        id_col,
        *keep_cols,
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("w"),
        is_target.alias("__tgt"),
    )
    # Both vocab tables fold into ONE tokenize pass (r15): the target
    # count is a conditional sum of the same aggregate (a token absent
    # from the target gets ct = 0, exactly the old left-join coalesce;
    # Σct over all tokens = Σ over target tokens, the extra terms are 0),
    # and the vocab-sized result is checkpointed — the lazy two-vocab
    # form re-planned the corpus tokenize+explode five times.
    vocab = (
        toks.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("ct"),
        )
        .localCheckpoint(eager=True)
    )
    tots = vocab.agg(
        F.sum("cr").alias("r"),
        F.count(F.lit(1)).alias("v"),
        # t must be NULL (not 0) when NO token is a target token: the
        # pre-r15 two-vocab form — and the DuckDB oracle — aggregate an
        # EMPTY target vocab there, so every lr/score is NULL and nothing
        # is selected; a plain SUM()=0 would instead produce finite scores
        # and select docs with no target corpus at all (ADVICE r15).
        # With any target rows present the two forms are identical.
        F.when(F.sum("ct") > 0, F.sum("ct")).alias("t"),
    )
    lr = (
        F.round(
            F.log((F.col("ct") + 1.0) / (F.col("t") + F.col("v")))
            - F.log(F.col("cr") * 1.0 / F.col("r")),
            9,
        )
        .cast("decimal(18,9)")
        .alias("lr")
    )
    ratios = vocab.crossJoin(F.broadcast(tots)).select("w", lr)
    scored = toks.join(F.broadcast(ratios), "w").select(id_col, *keep_cols, "lr")
    return (
        scored.groupBy(id_col, *keep_cols)
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            (F.sum("lr").cast("double") / F.count(F.lit(1))).alias("__avg"),
        )
        .filter(F.col("__avg") > 0)
        .select(
            id_col, *keep_cols, "n_tok", F.round("__avg", 6).alias("avg_log_ratio")
        )
    )


@register(
    "curation_dsir_importance",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS w
        FROM documents
    ),
    raw_vocab AS (SELECT w, COUNT(*) AS cr FROM toks GROUP BY w),
    raw_tot AS (SELECT SUM(cr) AS r, COUNT(*) AS v FROM raw_vocab),
    tgt_vocab AS (
        SELECT w, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY w
    ),
    tgt_tot AS (SELECT SUM(ct) AS t FROM tgt_vocab),
    ratios AS (
        SELECT rv.w,
               CAST(ROUND(LN((COALESCE(tv.ct, 0) + 1.0) / (tt.t + rt.v))
                          - LN(rv.cr * 1.0 / rt.r), 9) AS DECIMAL(18, 9)) AS lr
        FROM raw_vocab rv
        LEFT JOIN tgt_vocab tv ON tv.w = rv.w
        CROSS JOIN raw_tot rt CROSS JOIN tgt_tot tt
    ),
    scored AS (
        SELECT toks.doc_id, toks.lang, ratios.lr
        FROM toks JOIN ratios ON ratios.w = toks.w
    )
    SELECT doc_id, lang,
           COUNT(*) AS n_tok,
           ROUND(CAST(SUM(lr) AS DOUBLE) / COUNT(*), 6) AS avg_log_ratio
    FROM scored
    GROUP BY doc_id, lang
    HAVING CAST(SUM(lr) AS DOUBLE) / COUNT(*) > 0
    """,
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — DSIR-shaped importance reweighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): score
    every raw document by its unigram importance ratio against a target
    domain (here lang='en' plays the target; in production it is the
    curated high-quality corpus), select the docs whose average per-token
    log-ratio favors the target. DSIR hashes n-grams into buckets before
    estimating the two distributions; with the fixture's small vocabulary
    the unhashed unigram estimator is the same plan shape (hashing would
    only shrink the vocab table further). Target probabilities are
    add-1-smoothed over the raw vocabulary so unseen-in-target tokens get
    finite mass; raw probabilities need no smoothing (every scored token
    comes from the raw corpus).

    Scale shape: two map-side-combined vocab aggregations (vocabulary
    cardinality, not corpus), one broadcast of the per-token log-ratio
    table back onto the exploded token stream, one doc-key shuffle for the
    roll-up — identical to text_unigram_logprob's 100 TB shape. Per-token
    log-ratios round to 9 decimals and sum as DECIMAL(18,9) (the dsum
    rule), so the score — and the >0 selection — is order-independent and
    hash-identical cross-engine."""
    d = load(spark, sf_dir, "documents")
    return dsir_selected(
        d, is_target=F.col("lang") == "en", id_col="doc_id", keep_cols=["lang"]
    )


def temperature_selection(
    df,
    domain_col: str,
    id_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.6,
):
    """Append ``__selected`` (and the domain size ``n``) to ``df``: the
    deterministic temperature-resampling decision — per-domain rate from
    p^alpha renormalization times the budget, per-row md5-uniform draw
    against the rate as a 4-hex threshold (stable under reruns and
    incremental ingestion). alpha=0.5 == sqrt flattening. Shared by the
    oracle-checked ``mixture_temperature_resample`` and
    ``Engine.resample_temperature``."""
    # NULL domains can neither receive a rate (join would drop them) nor
    # belong in the budget total — exclude them from the rate table and
    # left-join below so null-domain rows pass through UNSELECTED rather
    # than vanishing.
    # |domains| rows, consumed by tot/weights (and transitively
    # wsum/rates) — the lazy form re-planned the corpus scan 5× in one
    # plan (r15, the consumed-3x localCheckpoint precedent)
    counts = (
        df.filter(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(F.sum("n").alias("total"))
    p = F.col("n") * 1.0 / F.col("total")
    # sqrt is IEEE-correctly-rounded (pow(x, 0.5) need not be) — use it for
    # the default alpha so the weight doubles match the SQRT-based oracle
    # bit-for-bit
    w = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(alpha))
    weights = counts.crossJoin(F.broadcast(tot)).select(
        domain_col, "n", "total", w.alias("w")
    )
    wsum = weights.agg(F.sum("w").alias("sw"))
    rates = weights.crossJoin(F.broadcast(wsum)).select(
        domain_col,
        "n",
        F.least(
            F.floor(
                (
                    F.lit(budget_frac)
                    * F.col("total")
                    * (F.col("w") / F.col("sw"))
                    / F.col("n")
                )
                * 65536
            ).cast("bigint"),
            F.lit(65535),
        ).alias("thr"),
    )
    thr_hex = F.lpad(F.lower(F.conv(F.col("thr").cast("string"), 10, 16)), 4, "0")
    u_hex = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return df.join(F.broadcast(rates), domain_col, "left").withColumn(
        "__selected", F.coalesce(u_hex < thr_hex, F.lit(False))
    )


@register(
    "mixture_temperature_resample",
    oracle="""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n) AS total FROM counts),
    weights AS (
        SELECT c.lang, c.n,
               SQRT(c.n * 1.0 / t.total) AS w
        FROM counts c CROSS JOIN tot t
    ),
    wsum AS (SELECT SUM(w) AS sw FROM weights),
    rates AS (
        SELECT w.lang, w.n,
               LEAST(CAST(FLOOR(
                   (0.6 * t.total * (w.w / s.sw) / w.n) * 65536
               ) AS BIGINT), 65535) AS thr
        FROM weights w CROSS JOIN wsum s CROSS JOIN tot t
    )
    SELECT d.lang,
           MIN(r.n) AS n_docs,
           CAST(SUM(CASE WHEN SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                         < printf('%04x', r.thr)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           MIN(CASE WHEN SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                         < printf('%04x', r.thr)
                    THEN d.doc_id END) AS first_selected
    FROM documents d JOIN rates r ON r.lang = d.lang
    GROUP BY d.lang
    """,
)
def mixture_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — temperature-scaled domain mixture (the multilingual-LM
    standard, T5/mT5: sample domain s with probability ∝ p_s^α, α = 0.5,
    flattening skewed domains so low-resource ones aren't drowned). The
    budget is 60% of the corpus; each doc's keep/drop decision is the
    deterministic md5-uniform trick from sample_train_test_split — substr
    of the key hash compared against the domain's rate rendered as a
    4-hex-digit threshold (floor(rate·65536), capped at 0xffff — a
    deliberate 1/65536 under-sample at rate 1.0, identical on both
    engines) — so assignment is stable under reruns and incremental
    ingestion, and verifies cross-engine.

    Scale shape: the rate table is domain-cardinality (broadcast); the
    per-doc decision is a pure map (no shuffle); the summary is one
    group-agg. At 100 TB the same plan selects an α-balanced corpus in a
    single scan."""
    d = load(spark, sf_dir, "documents")
    sel = temperature_selection(d, domain_col="lang", id_col="doc_id")
    return (
        sel.groupBy("lang")
        .agg(
            F.min("n").alias("n_docs"),
            F.sum(F.col("__selected").cast("int")).alias("n_selected"),
            F.min(F.when(F.col("__selected"), F.col("doc_id"))).alias(
                "first_selected"
            ),
        )
    )


@register(
    "export_global_rownum",
    oracle="""
    SELECT doc_id,
           doc_id % 32 AS shard,
           ROW_NUMBER() OVER (ORDER BY doc_id % 32, doc_id) - 1 AS global_id
    FROM documents
    """,
)
def export_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-export — contiguous global example ids WITHOUT a global sort or a
    SinglePartition window (both audited against): the standard two-phase
    distributed numbering. Phase 1 assigns each row a deterministic shard
    (doc_id % 32) and a within-shard rank (one key-partitioned window);
    phase 2 broadcasts the 32 shard sizes as exclusive prefix offsets and
    adds them. Ids are contiguous 0..N−1 in (shard, doc_id) order —
    equivalent to the oracle's single-sequence ROW_NUMBER but every stage
    is key-partitioned, so it scales to any corpus (the offsets table is
    shard-cardinality, bytes). The same pattern numbers 100 TB of training
    examples for epoch bookkeeping."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 32).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    ranked = d.withColumn("rn", F.row_number().over(w))
    # exclusive prefix over the 32 shard counts — O(shards) driver scalars,
    # same pattern as curation_token_budget_select (never a global window)
    counts = dict(
        (r["shard"], r["n"])
        for r in d.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    acc, offset_rows = 0, []
    for shard in sorted(counts):
        offset_rows.append((shard, acc))
        acc += counts[shard]
    offsets = F.broadcast(
        spark.createDataFrame(offset_rows, "shard long, offset long")
    )
    return (
        ranked.join(offsets, "shard")
        .select(
            "doc_id",
            "shard",
            (F.col("offset") + F.col("rn") - 1).alias("global_id"),
        )
    )


@register(
    "curation_winsorize",
    oracle="""
    WITH bounds AS (
        SELECT lang,
               CAST(PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY n_chars)
                    AS DOUBLE) AS p5,
               CAST(PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY n_chars)
                    AS DOUBLE) AS p95
        FROM documents GROUP BY lang
    ),
    clipped AS (
        SELECT d.lang,
               LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), b.p5), b.p95) AS v,
               CAST(d.n_chars AS DOUBLE) < b.p5 AS low,
               CAST(d.n_chars AS DOUBLE) > b.p95 AS high
        FROM documents d JOIN bounds b ON b.lang = d.lang
    )
    SELECT c.lang, b.p5, b.p95,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN c.low THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN c.high THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           ROUND(CAST(SUM(CAST(c.v AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean
    FROM clipped c JOIN bounds b ON b.lang = c.lang
    GROUP BY c.lang, b.p5, b.p95
    """,
)
def curation_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — per-group winsorization: clip each language's document
    lengths to its [p5, p95] band and report the clipped distribution —
    the robust-stats step before any mean-based mixture accounting (one
    pathological 100 MB doc would otherwise dominate a language's token
    budget). ``percentile_disc`` picks ACTUAL values (no interpolation
    arithmetic), so the bounds — and every clip decision — are
    bit-identical cross-engine; the winsorized mean uses the exact-decimal
    sum rule.

    Scale shape: exact discrete percentiles sort within each lang
    partition (one shuffle); the clip pass re-joins the lang-cardinality
    bounds table broadcast. At extreme group sizes swap percentile_disc
    for percentile_approx (fixed-state sketch) with the same report
    schema."""
    d = load(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("nc")
    )
    bounds = d.groupBy("lang").agg(
        F.expr("CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY nc) AS DOUBLE)").alias("p5"),
        F.expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY nc) AS DOUBLE)").alias("p95"),
    )
    clipped = d.join(F.broadcast(bounds), "lang").select(
        "lang",
        "p5",
        "p95",
        F.least(F.greatest(F.col("nc"), F.col("p5")), F.col("p95")).alias("v"),
        (F.col("nc") < F.col("p5")).alias("low"),
        (F.col("nc") > F.col("p95")).alias("high"),
    )
    return clipped.groupBy("lang", "p5", "p95").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("low").cast("int")).alias("n_clipped_low"),
        F.sum(F.col("high").cast("int")).alias("n_clipped_high"),
        F.round(
            F.sum(F.col("v").cast("decimal(30,4)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
    )


@register(
    "curation_url_dedup",
    oracle="""
    WITH urls AS (
        -- deterministic synthetic URLs with tracking noise: the same page
        -- appears under WWW./mixed-case hosts, trailing slashes, and utm
        -- params (doc_id % 4 variants)
        SELECT doc_id,
               CONCAT(
                   CASE WHEN doc_id % 4 = 1 THEN 'https://WWW.'
                        ELSE 'https://' END,
                   UPPER(SUBSTR(source, 1, 1)), SUBSTR(source, 2),
                   '.example.com/docs/', CAST(doc_id % 100 AS VARCHAR),
                   CASE WHEN doc_id % 4 = 2 THEN '/' ELSE '' END,
                   CASE WHEN doc_id % 4 = 3
                        THEN CONCAT('?utm_source=', lang) ELSE '' END
               ) AS url
        FROM documents WHERE source IS NOT NULL
    ),
    canon AS (
        SELECT doc_id,
               CONCAT(
                   REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(url,
                       'https://([^/?]+)', 1)), '^www\\.', ''),
                   RTRIM(REGEXP_EXTRACT(url, 'https://[^/?]+([^?]*)', 1), '/')
               ) AS canonical
        FROM urls
    )
    SELECT canonical,
           COUNT(*) AS n_variants,
           MIN(doc_id) AS canonical_doc
    FROM canon
    GROUP BY canonical
    HAVING COUNT(*) >= 2
    """,
)
def curation_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — URL canonicalization dedup, the FIRST stage of every
    web-corpus pipeline (cheaper than any content hash: the same page
    under www./case/trailing-slash/utm variants collapses before a byte
    of text is read). URLs are built deterministically with injected
    tracking noise (doc_id-derived variants so groups exist at any SF),
    then canonicalized — lowercase host, strip the www. prefix, drop the
    query string, trim the trailing slash — and grouped; groups of >= 2
    are the URL-level duplicates, keyed to their min-id canonical doc.

    Scale shape: canonicalization is a per-row regex map (JVM codegen);
    the only shuffle carries the canonical-key strings — at 100 TB this
    pass touches URLs, never documents, which is exactly why it runs
    first."""
    d = load(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    mod = F.col("doc_id") % 4
    url = F.concat(
        F.when(mod == 1, "https://WWW.").otherwise("https://"),
        F.upper(F.substring("source", 1, 1)),
        F.expr("substr(source, 2)"),
        F.lit(".example.com/docs/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(mod == 2, "/").otherwise(""),
        F.when(mod == 3, F.concat(F.lit("?utm_source="), F.col("lang"))).otherwise(""),
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"https://([^/?]+)", 1)), r"^www\.", ""
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"https://[^/?]+([^?]*)", 1), r"/+$", ""
    )
    return (
        d.select("doc_id", F.concat(host, path).alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_variants") >= 2)
    )




#: Gopher rule constants (Rae et al. 2021 §A1.1, adapted): word-count
#: bounds, mean-word-length bounds [3,10] (cross-multiplied), ≥80% alphabetic
#: words, ≥1 stopword from the fixed probe set.
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 10000
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and")


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """Per-document Gopher quality signals + per-rule flags + combined
    ``keep`` — shared by the oracle-checked ``curation_gopher_rules`` and
    ``Engine.quality_gate``. Map-only; every bound integer-exact
    (cross-multiplied, no float ratios). Rows with NULL text must be
    filtered by the caller (they have no signal to score)."""
    ids = id_cols if id_cols is not None else ["doc_id"]
    stop = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    m = df.select(
        *ids,
        F.size(words).alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("sum_word_len"),
        F.size(F.filter(words, lambda x: x.rlike("^[a-z]+$"))).alias(
            "n_alpha_words"
        ),
        F.size(F.array_intersect(F.array_distinct(words), stop)).alias(
            "n_stopwords"
        ),
    )
    ok_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_ml = (3 * F.col("n_words") <= F.col("sum_word_len")) & (
        F.col("sum_word_len") <= 10 * F.col("n_words")
    )
    ok_af = 5 * F.col("n_alpha_words") >= 4 * F.col("n_words")
    ok_sw = F.col("n_stopwords") >= 1
    return m.select(
        *ids,
        "n_words",
        "sum_word_len",
        "n_alpha_words",
        "n_stopwords",
        ok_wc.alias("ok_word_count"),
        ok_ml.alias("ok_mean_len"),
        ok_af.alias("ok_alpha_frac"),
        ok_sw.alias("ok_stopwords"),
        (ok_wc & ok_ml & ok_af & ok_sw).alias("keep"),
    )


def blocklist_flags(
    df,
    terms,
    text_col: str = "text",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document blocklist hit counts, matched terms, and the 5%-density
    ``blocked`` verdict — shared by ``curation_blocklist_filter`` and
    ``Engine.blocklist_filter``. The term list rides in the plan as a
    literal array (broadcast by construction)."""
    ids = id_cols if id_cols is not None else ["doc_id"]
    blocked = F.array(*[F.lit(t) for t in terms])
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    m = df.select(
        *ids,
        F.size(words).alias("n_words"),
        F.size(
            F.filter(words, lambda x: F.array_contains(blocked, x))
        ).alias("n_blocked"),
        F.array_join(
            F.array_sort(F.array_intersect(F.array_distinct(words), blocked)),
            ",",
        ).alias("blocked_terms"),
    )
    return m.select(
        *ids,
        "n_words",
        "n_blocked",
        "blocked_terms",
        (20 * F.col("n_blocked") > F.col("n_words")).alias("blocked"),
    )


@register(
    "curation_gopher_rules",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS words
        FROM documents
        WHERE text IS NOT NULL
    ),
    m AS (
        SELECT doc_id,
               len(words) AS n_words,
               CAST(list_sum(list_transform(words, x -> strlen(x))) AS BIGINT)
                   AS sum_word_len,
               len(list_filter(words, x -> regexp_matches(x, '^[a-z]+$')))
                   AS n_alpha_words,
               len(list_intersect(list_distinct(words),
                                  ['the', 'a', 'of', 'to', 'and']))
                   AS n_stopwords
        FROM w
    )
    SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_stopwords,
           (n_words BETWEEN 5 AND 10000)          AS ok_word_count,
           (3 * n_words <= sum_word_len
            AND sum_word_len <= 10 * n_words)     AS ok_mean_len,
           (5 * n_alpha_words >= 4 * n_words)     AS ok_alpha_frac,
           (n_stopwords >= 1)                     AS ok_stopwords,
           ((n_words BETWEEN 5 AND 10000)
            AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
            AND 5 * n_alpha_words >= 4 * n_words
            AND n_stopwords >= 1)                 AS keep
    FROM m
    """,
)
def curation_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — Gopher-style document quality rules (Rae et al. 2021
    §A1.1): word-count bounds, mean-word-length bounds, minimum fraction of
    alphabetic words, and required stopword presence. The four signals and
    the combined keep flag are emitted per document so downstream stages
    can audit WHICH rule rejected a doc, not just that one did.

    Every rule is integer-exact by construction: the mean-word-length and
    alpha-fraction bounds are cross-multiplied (``3·n ≤ Σlen ≤ 10·n``,
    ``5·n_alpha ≥ 4·n``) instead of computed as float ratios, so the Spark
    and DuckDB sides agree bit-for-bit with no rounding convention.

    Scale shape: a single map-only pass — tokenize once, fold lengths and
    filters with codegen'd higher-order functions, zero shuffles, zero
    Python. At 100 TB this is the cheapest possible quality gate: one scan,
    arbitrarily parallel."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return gopher_quality_flags(d, id_cols=["doc_id"])


@register(
    "curation_blocklist_filter",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\\s+') AS words
        FROM documents
        WHERE text IS NOT NULL
    ),
    m AS (
        SELECT doc_id, lang,
               len(words) AS n_words,
               len(list_filter(words, x -> x IN ('spark', 'vector', 'customer')))
                   AS n_blocked,
               list_sort(list_intersect(list_distinct(words),
                                        ['spark', 'vector', 'customer']))
                   AS hit_terms
        FROM w
    )
    SELECT doc_id, lang, n_words, n_blocked,
           -- DuckDB's array_to_string yields NULL on an empty list where
           -- Spark's array_join yields '' — coalesce to match.
           COALESCE(array_to_string(hit_terms, ','), '') AS blocked_terms,
           (20 * n_blocked > n_words) AS blocked
    FROM m
    """,
)
def curation_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — term-blocklist filtering (the LDNOOBW / C4 badwords
    shape): a small broadcast-able blocklist, per-doc occurrence counting,
    and a density rule (block when >5% of words are blocklisted — the
    cross-multiplied form ``20·n_blocked > n_words``, integer-exact). The
    matched terms are emitted sorted and joined so a reviewer sees WHY a
    doc was blocked; the fixture's blocklist reuses corpus words
    ('spark', 'vector', 'customer') so every branch is exercised.

    Scale shape: the blocklist is a literal array in the plan (broadcast by
    construction — in production a few thousand terms still fit in a
    codegen'd literal or a broadcast join); the scan is map-only with
    zero shuffles. Real blocklist filtering at 100 TB runs exactly this
    plan."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return blocklist_flags(
        d, ("spark", "vector", "customer"), id_cols=["doc_id", "lang"]
    )


@register(
    "curation_pipeline_e2e",
    oracle="""
    WITH base AS (
        SELECT doc_id, text, lang FROM documents WHERE text IS NOT NULL
    ),
    inj AS (
        SELECT * FROM base
        UNION ALL
        SELECT doc_id + 100000, text, lang FROM base WHERE doc_id < 50
    ),
    w AS (
        SELECT doc_id, lang, lower(trim(text)) AS norm,
               string_split_regex(lower(trim(text)), '\\s+') AS words
        FROM inj
    ),
    m AS (
        SELECT doc_id, lang, norm,
               len(words) AS n_words,
               CAST(list_sum(list_transform(words, x -> strlen(x))) AS BIGINT)
                   AS sum_word_len,
               len(list_filter(words, x -> regexp_matches(x, '^[a-z]+$')))
                   AS n_alpha,
               len(list_intersect(list_distinct(words),
                                  ['the', 'a', 'of', 'to', 'and'])) AS n_stop,
               len(list_filter(words,
                               x -> x IN ('spark', 'vector', 'customer')))
                   AS n_blocked
        FROM w
    ),
    flags AS (
        SELECT doc_id, lang, norm,
               (n_words BETWEEN 5 AND 10000
                AND 3 * n_words <= sum_word_len
                AND sum_word_len <= 10 * n_words
                AND 5 * n_alpha >= 4 * n_words
                AND n_stop >= 1) AS keep,
               (20 * n_blocked > n_words) AS blocked
        FROM m
    ),
    final AS (
        SELECT lang FROM (
            SELECT lang, ROW_NUMBER() OVER (PARTITION BY norm
                                            ORDER BY doc_id) AS rn
            FROM flags WHERE keep AND NOT blocked
        ) WHERE rn = 1
    )
    SELECT s.lang, s.n_input, s.n_quality, s.n_clean, f.n_final
    FROM (
        SELECT lang, COUNT(*) AS n_input,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality,
               CAST(SUM(CASE WHEN keep AND NOT blocked THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clean
        FROM flags GROUP BY lang
    ) s
    JOIN (SELECT lang, COUNT(*) AS n_final FROM final GROUP BY lang) f
      ON f.lang = s.lang
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — the COMPOSED cleaning pipeline as one oracle-checked
    query: inject exact duplicates (the fixture corpus is dup-free) →
    Gopher quality gate → blocklist filter → exact dedup → per-language
    funnel counts (input / after-quality / after-blocklist / final). This
    is the integration check that the individually-verified stages
    actually compose — each stage is the SAME shared implementation the
    standalone queries use (gopher_quality_flags, blocklist_flags,
    keep_first_per_text), so a semantic drift in any one of them breaks
    this funnel against the oracle's four independently-recomputed stage
    counts.

    Scale: quality + blocklist are map-only and fuse into the scan; dedup
    shuffles 32-byte sha keys; the funnel summary is one lang-cardinality
    aggregate. The composed plan is exactly the sum of its stages — no
    materialization barriers between them."""
    from avro_parquet_spark_example_spark.operators.dedup import (
        keep_first_per_text,
        with_injected_duplicates,
    )

    base = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text", "lang")
    )
    inj = with_injected_duplicates(base)
    q = gopher_quality_flags(inj, id_cols=["doc_id"]).select("doc_id", "keep")
    b = blocklist_flags(
        inj, ("spark", "vector", "customer"), id_cols=["doc_id"]
    ).select("doc_id", "blocked")
    flags = inj.join(q, "doc_id").join(b, "doc_id")
    stage = flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_quality"),
        F.sum(
            F.when(F.col("keep") & ~F.col("blocked"), 1).otherwise(0)
        ).alias("n_clean"),
    )
    final = (
        keep_first_per_text(flags.filter(F.col("keep") & ~F.col("blocked")))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_final"))
    )
    return stage.join(final, "lang")


@register(
    "curation_epoch_plan",
    oracle="""
    WITH tok AS (
        SELECT lang,
               CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL
        GROUP BY lang
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
               COUNT(*) AS n_langs
        FROM tok
    )
    SELECT t.lang, t.n_tokens,
           CAST(GREATEST(1, LEAST(4, (2 * x.total)
                    // (x.n_langs * t.n_tokens))) AS BIGINT) AS epochs,
           CAST(GREATEST(1, LEAST(4, (2 * x.total)
                    // (x.n_langs * t.n_tokens))) * t.n_tokens AS BIGINT)
               AS planned_tokens
    FROM tok t CROSS JOIN tot x
    """,
)
def curation_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-curation — epoch allocation under a token budget (the
    data-constrained-scaling planning step, Muennighoff et al. 2023:
    repeating data beyond ~4 epochs stops helping, so a budget is spent
    as bounded per-domain repeats): each language's fair budget slice is
    budget/n_langs (budget = 2× the corpus), and its epoch count is
    ``max(1, min(4, slice // tokens))`` — integer division on exact token
    counts, floored at one epoch (a repeat plan never drops a domain),
    so the plan is engine-identical with no float in sight. Low-resource
    languages hit the 4-epoch cap (their slice dwarfs their data);
    high-resource ones get 1-2 epochs — exactly the qualitative shape
    multilingual training plans have.

    One token-count aggregation (map-side combining over per-doc token
    counts) + a broadcast of the 1-row total; the plan itself is
    lang-cardinality rows."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.groupBy("lang").agg(
        F.sum(
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("n_tokens")
    )
    tot = tok.agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_langs")
    )
    # every domain trains at least once (dropping a language entirely is
    # never the intent of a repeat plan), at most 4 epochs (the repeat
    # ceiling past which returns decay)
    epochs = F.greatest(
        F.lit(1).cast("bigint"),
        F.least(F.lit(4).cast("bigint"), F.expr("(2 * total) div (n_langs * n_tokens)")),
    )
    return tok.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        epochs.alias("epochs"),
        (epochs * F.col("n_tokens")).alias("planned_tokens"),
    )


#: Largest-remainder (Hamilton) apportionment budget: total documents to
#: select across domains. Integer-exact by construction at any SF.
QUOTA_BUDGET = 1000


@register(
    "mixture_largest_remainder_quota",
    oracle=f"""
    WITH g AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g),
    q AS (
        SELECT lang, n,
               (n * {QUOTA_BUDGET}) // tot AS fl,
               (n * {QUOTA_BUDGET}) % tot AS rem
        FROM g CROSS JOIN t
    ),
    f AS (SELECT CAST(SUM(fl) AS BIGINT) AS fsum FROM q),
    r AS (
        SELECT a.lang, a.n, a.fl,
               (SELECT COUNT(*) FROM q b
                WHERE b.rem > a.rem OR (b.rem = a.rem AND b.lang < a.lang))
                 AS ahead
        FROM q a
    )
    SELECT lang, n AS n_docs,
           fl + CASE WHEN ahead < {QUOTA_BUDGET} - fsum THEN 1 ELSE 0 END
             AS quota
    FROM r CROSS JOIN f
    """,
)
def mixture_largest_remainder_quota(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H6q — exact largest-remainder (Hamilton) quota apportionment: a
    total selection budget of QUOTA_BUDGET documents is split across
    domains proportionally with INTEGER arithmetic — floor(n*K/N) per
    domain, then the K - Σfloor leftover seats go to the largest
    remainders (domain-name tiebreak) — so Σquota == K exactly, no
    domain is over-allocated by more than 1, and the allocation is fully
    deterministic (hash-exact; float shares would round to K±1). This is
    the allocation step a data-mixture builder runs before per-domain
    sampling (``mixture_downsample`` applies rates; this op decides exact
    counts under a hard budget).

    Scale shape: one corpus aggregate (map-side combined), then every
    further stage — grand total, floor sum, remainder ranking via a theta
    self-join — runs on the DOMAIN-cardinality aggregate (|domains| rows,
    broadcast; the remainder rank is count-of-better rows, not a global
    window, which would single-partition the frame)."""
    return largest_remainder_quota(
        load(spark, sf_dir, "documents"), "lang", QUOTA_BUDGET
    )


def largest_remainder_quota(
    docs: DataFrame, domain_col: str, budget: int
) -> DataFrame:
    """(lang, n_docs, quota) — the reusable Hamilton apportionment behind
    ``mixture_largest_remainder_quota`` (also exercised against a
    pure-Python reference on adversarial distributions in
    tests/test_curation.py, so the registered query and the tested
    pipeline can never drift apart).

    NULL domains (ADVICE r9): the remainder-rank tiebreak orders NULL
    LAST explicitly — a bare ``b_lang < a.lang`` yields NULL when either
    side is NULL, making two remainder-tied rows each see the other as
    not-ahead and BOTH take the +1 seat, silently breaking the
    Σquota == budget invariant. The count uses ``b_rem`` (never NULL on
    a matched row) so a NULL-domain row that IS ahead still counts. The
    registered oracle keeps the plain comparison because documents.lang
    is non-null by fixture contract; this library form is the one a
    caller can hand a nullable column."""
    g = docs.groupBy(F.col(domain_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = g.agg(F.sum("n").alias("tot"))
    q = (
        g.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n",
            F.expr(f"(n * {budget}) div tot").alias("fl"),
            F.expr(f"(n * {budget}) % tot").alias("rem"),
        )
        .localCheckpoint(eager=True)  # tiny; feeds rank join + floor sum
    )
    f_tot = q.agg(F.sum("fl").alias("fsum"))
    a = q.alias("a")
    b = q.select(
        F.col("lang").alias("b_lang"), F.col("rem").alias("b_rem")
    ).alias("b")
    tie_ahead = (F.col("b_lang") < F.col("a.lang")) | (
        F.col("b_lang").isNotNull() & F.col("a.lang").isNull()
    )
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("b_rem") > F.col("a.rem"))
            | ((F.col("b_rem") == F.col("a.rem")) & tie_ahead),
            "left",
        )
        .groupBy("a.lang", "a.n", "a.fl")
        .agg(F.count("b_rem").alias("ahead"))
    )
    return ranked.crossJoin(F.broadcast(f_tot)).select(
        F.col("lang"),
        F.col("n").alias("n_docs"),
        (
            F.col("fl")
            + F.when(
                F.col("ahead") < F.lit(budget) - F.col("fsum"), 1
            ).otherwise(0)
        ).alias("quota"),
    )


@register(
    "dedup_cluster_quality_pick",
    oracle=_CC_CTES
    + """
    , comp AS (
        SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
    ),
    q AS (
        SELECT c.component, c.doc_id, d.n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY c.component
                   ORDER BY d.n_chars DESC, c.doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY c.component) AS nm
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT component, doc_id AS kept_doc_id,
           CAST(n_chars AS BIGINT) AS kept_chars,
           CAST(nm AS BIGINT) AS n_members
    FROM q WHERE rn = 1
    """,
)
def dedup_cluster_quality_pick(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """H2f' — quality-aware canonical pick: within each near-dup cluster
    (the ``dedup_cluster_cc`` components) keep the HIGHEST-QUALITY member
    (longest document, doc_id tiebreak) instead of the arbitrary
    min-id canonical — the policy production dedup actually ships,
    because the survivor of a near-dup cluster should be its best
    representative, not whichever crawled first. One row per cluster:
    (component, kept_doc_id, kept_chars, n_members). Composes the CC
    fixpoint with a per-cluster top-1 window; singleton docs survive as
    their own component.

    Scale shape: everything up to components is ``dedup_cluster_cc``'s
    plan (bucketed candidate pairs + O(diameter) min-label rounds); the
    pick adds one doc-keyed join against the documents table and a
    window partitioned by component — cluster-sized partitions, the same
    bound the CC loop already guarantees."""
    comp = dedup_cluster_cc(spark, sf_dir).select("doc_id", "component")
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "n_chars")
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    joined = comp.join(d, "doc_id").select(
        "component",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("component"))
        .cast("bigint")
        .alias("nm"),
    )
    return joined.filter(F.col("rn") == 1).select(
        "component",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_chars").cast("bigint").alias("kept_chars"),
        F.col("nm").alias("n_members"),
    )


# --------------------------------------------------------------------------
# Length-bucket batching report (padding-waste accounting)
# --------------------------------------------------------------------------

#: Power-of-two sequence-length bucket caps. Shared literals: the CASE
#: chain is generated from this tuple for BOTH engines — no float log2
#: (whose boundary behavior at exact powers of two is engine-dependent).
_LEN_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)


def _bucket_case_sql(tok: str) -> str:
    arms = " ".join(
        f"WHEN {tok} <= {c} THEN {c}" for c in _LEN_BUCKETS[:-1]
    )
    return f"CASE {arms} ELSE {_LEN_BUCKETS[-1]} END"


@register(
    "curation_length_buckets",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, CAST(n_chars // 4 AS BIGINT) AS tokens,
               {_bucket_case_sql("n_chars // 4")} AS cap
        FROM documents
    ),
    gtot AS (
        SELECT CAST(MAX(tokens) AS BIGINT) AS gmax,
               CAST(COUNT(*) AS BIGINT) AS gdocs,
               CAST(SUM(tokens) AS DECIMAL(38,0)) AS gtok
        FROM toks
    )
    SELECT t.cap,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(t.tokens) AS DECIMAL(38,0)) AS BIGINT)
               AS total_tokens,
           CAST(CAST(COUNT(*) AS DECIMAL(38,0)) * t.cap AS BIGINT)
               AS padded_tokens,
           ROUND(CAST(CAST(COUNT(*) AS DECIMAL(38,0)) * t.cap
                      - SUM(t.tokens) AS DOUBLE)
                 / CAST(CAST(COUNT(*) AS DECIMAL(38,0)) * t.cap
                        AS DOUBLE), 6) AS waste_pct,
           ROUND(CAST(g.gdocs * g.gmax - g.gtok AS DOUBLE)
                 / CAST(g.gdocs * g.gmax AS DOUBLE), 6)
               AS naive_waste_pct
    FROM toks t, gtot g
    GROUP BY t.cap, g.gdocs, g.gmax, g.gtok
    """,
)
def curation_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CU — length-bucketed batching report: assign each document to a
    power-of-two token-length bucket (pad-to-bucket-cap batching, the
    standard training-loader strategy) and account the padding waste
    per bucket vs the naive pad-everything-to-global-max baseline —
    the token-economics audit a 100 TB pretraining pipeline runs
    before committing a packing strategy (the complementary strategy,
    first-fit packing, is ``pack_sequences``; this operator quantifies
    what bucketing alone recovers). Tokens = n_chars div 4 (the
    engine's standing chars-per-token proxy).

    Exactness: buckets come from a literal CASE chain generated from
    shared power-of-two constants — no float log2, whose rounding at
    exact powers of two is engine-dependent; every count/sum/padded
    total is an exact integer (DECIMAL(38,0) at any corpus size); the
    two waste ratios are one IEEE division each, rounded to 6.

    Scale: one map-side-combined aggregate over buckets (≤ 8 groups) +
    one global max/sum/count — two scans, no shuffle beyond the
    8-group fold, no windows."""
    d = load(spark, sf_dir, "documents").select(
        F.expr("CAST(n_chars div 4 AS BIGINT)").alias("tokens")
    )
    toks = d.withColumn(
        "cap", F.expr(_bucket_case_sql("tokens")).cast("bigint")
    )
    glob = toks.agg(
        F.max("tokens").cast("bigint").alias("gmax"),
        F.count(F.lit(1)).cast("bigint").alias("gdocs"),
        F.sum("tokens").cast("decimal(38,0)").alias("gtok"),
    )
    per = toks.groupBy("cap").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("decimal(38,0)").alias("total_tokens"),
    )
    padded = F.col("n_docs").cast("decimal(38,0)") * F.col("cap")
    return per.crossJoin(F.broadcast(glob)).select(
        "cap",
        "n_docs",
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        padded.cast("bigint").alias("padded_tokens"),
        F.round(
            (padded - F.col("total_tokens")).cast("double")
            / padded.cast("double"),
            6,
        ).alias("waste_pct"),
        F.round(
            (F.col("gdocs") * F.col("gmax") - F.col("gtok")).cast("double")
            / (F.col("gdocs") * F.col("gmax")).cast("double"),
            6,
        ).alias("naive_waste_pct"),
    )
