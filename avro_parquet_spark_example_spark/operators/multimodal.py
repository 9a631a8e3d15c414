"""Group H (multimodal) — typed multimodal records over Spark columns
(SURVEY.md §2 H5 + the multimodal-columns mandate).

Design: a multimodal record is a plain Spark row whose media payloads are
``binary`` columns with typed metadata besides them — the Avro-record idea
(named record with typed fields, SURVEY.md §1.1) extended to media. The
modality-specific work (image decode, resize, frame sampling) runs as
Arrow-batched ``mapInPandas`` so bytes never cross row-at-a-time.

The actual codecs (PIL/ffmpeg/librosa) are NOT installed in this
environment, so the decode kernel is a clearly-marked deterministic stub —
the Spark-side contract (schema, binary handling, Arrow batch shape,
partition behavior) is real and oracle-checked end-to-end, because the stub
derives metadata from byte length, which the oracle reproduces in SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


@register(
    "multimodal_join",
    oracle="""
    SELECT m.doc_id,
           m.rec.lang AS lang,
           m.rec.n_chars AS n_chars,
           LEN(m.rec.embedding) AS dim,
           ROUND(CAST(m.rec.embedding[1] AS DOUBLE), 6) AS e0
    FROM (
        SELECT d.doc_id,
               STRUCT_PACK(text := d.text, lang := d.lang,
                           n_chars := d.n_chars, embedding := e.embedding) AS rec
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ) m
    WHERE m.rec.lang IN ('en', 'de')
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5 — build multimodal records (text ⋈ embedding → one struct column),
    then filter/project THROUGH the nested fields. Catalyst prunes nested
    struct fields, so unused payloads aren't materialized."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("text"), F.col("lang"), F.col("n_chars"), F.col("embedding")
        ).alias("rec"),
    )
    return joined.filter(F.col("rec.lang").isin("en", "de")).select(
        "doc_id",
        F.col("rec.lang").alias("lang"),
        F.col("rec.n_chars").alias("n_chars"),
        F.size("rec.embedding").alias("dim"),
        F.round(F.element_at("rec.embedding", 1).cast("double"), 6).alias("e0"),
    )


# ---------------------------------------------------------------------------
# Binary-column pipeline: synthesize payloads → mapInPandas decode kernel

DECODE_SCHEMA = "doc_id long, n_bytes int, width int, height int, format string"


def fake_decode_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB image decoder (no codec libraries in this environment).

    Real deployments replace the body with PIL/turbojpeg over ``payload``
    bytes; everything around it — Arrow batching, binary transfer, output
    schema — is the production shape. The stub derives dimensions from the
    payload deterministically so the whole pipeline stays oracle-checkable.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": (n_bytes % 640) + 1,
                "height": (n_bytes % 480) + 1,
                "format": "fake/raw",
            }
        )


@register(
    "multimodal_decode_binary",
    oracle="""
    SELECT doc_id,
           CAST(STRLEN(text) AS INT) AS n_bytes,
           CAST(STRLEN(text) % 640 + 1 AS INT) AS width,
           CAST(STRLEN(text) % 480 + 1 AS INT) AS height,
           'fake/raw' AS format
    FROM documents
    WHERE doc_id < 200
    """,
)
def multimodal_decode_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hx — binary media pipeline: build a ``binary`` payload column, ship it
    through Arrow to a ``mapInPandas`` decode kernel, get typed metadata
    back. The oracle reproduces the stub's arithmetic from the text length
    (payload == utf8(text), all-ASCII vocab ⇒ strlen == octet length)."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    return d.mapInPandas(fake_decode_image, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, scale_pct int"


def fake_resize_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize kernel (see :func:`fake_decode_image`): a real deployment
    does the pixel work here (PIL.thumbnail / cv2.resize on ``payload``);
    the stub scales the fake dimensions to fit a 256×256 box, preserving
    the Spark-side contract (Arrow batches in, typed metadata out)."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        w = (n_bytes % 640) + 1
        h = (n_bytes % 480) + 1
        scale = (256 * 100 // w.combine(h, max)).clip(upper=100)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_w": w * scale // 100,
                "out_h": h * scale // 100,
                "scale_pct": scale,
            }
        )


@register(
    "multimodal_resize_binary",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(STRLEN(text) % 640 + 1 AS INT) AS w,
               CAST(STRLEN(text) % 480 + 1 AS INT) AS h
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(w * LEAST(25600 // GREATEST(w, h), 100) // 100 AS INT) AS out_w,
           CAST(h * LEAST(25600 // GREATEST(w, h), 100) // 100 AS INT) AS out_h,
           CAST(LEAST(25600 // GREATEST(w, h), 100) AS INT) AS scale_pct
    FROM dims
    """,
)
def multimodal_resize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hx — resize/feature-extract stage of the media pipeline: binary
    payloads → Arrow → pandas kernel → scaled dimensions. Chains after
    :func:`multimodal_decode_binary` in a real pipeline; here driven
    standalone so the oracle can replay the stub arithmetic."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    )
    return d.mapInPandas(fake_resize_image, schema=RESIZE_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT d.doc_id, g.i AS frame_no,
           CAST(STRLEN(d.text) AS INT) // 10 * CAST(g.i AS INT) AS frame_offset
    FROM (SELECT doc_id, text FROM documents WHERE doc_id < 100) d,
         GENERATE_SERIES(0, 4) g(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hx — frame-sampling shape for video payloads: explode each record
    into k frame rows with computed offsets (the stub arithmetic stands in
    for keyframe byte offsets). Generator expression — no shuffle, output
    is k× input partition-local."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.posexplode(F.array_repeat(F.length("text").cast("int"), 5)).alias(
            "frame_no", "n_bytes"
        ),
    ).select(
        "doc_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        (F.floor(F.col("n_bytes") / 10) * F.col("frame_no")).cast("int").alias("frame_offset"),
    )


@register(
    "multimodal_phash_dedup",
    oracle="""
    WITH base AS (
        SELECT doc_id, MD5(text) AS h
        FROM documents WHERE text IS NOT NULL
    ),
    docs AS (
        SELECT doc_id, SUBSTR(h, 1, 16) AS ph FROM base
        UNION ALL
        SELECT doc_id + 100000, SUBSTR(h, 1, 16) FROM base WHERE doc_id < 50
    ),
    bands AS (
        SELECT doc_id, ph, g.i AS band,
               SUBSTR(ph, (g.i - 1) * 4 + 1, 4) AS key
        FROM docs, GENERATE_SERIES(1, 4) g(i)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
               a.ph AS pi, b.ph AS pj
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    ham AS (
        SELECT cand.i, cand.j,
               CAST(SUM(BIT_COUNT(XOR(
                   STRPOS('0123456789abcdef', SUBSTR(pi, g.p, 1)) - 1,
                   STRPOS('0123456789abcdef', SUBSTR(pj, g.p, 1)) - 1)))
                    AS BIGINT) AS hamming
        FROM cand, GENERATE_SERIES(1, 16) g(p)
        GROUP BY cand.i, cand.j
    )
    SELECT i, j, hamming FROM ham WHERE hamming <= 3
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hx-dedup — perceptual-hash image dedup, the full pipeline shape:
    binary payload → 64-bit pHash → 4×16-bit band index → bucketed
    candidate join → bit-Hamming verify (≤3) — how image corpora are
    deduped at scale (banding makes it sub-quadratic; Hamming tolerance
    catches re-encodes and resizes a byte-hash misses). The pHash kernel
    is the repo's STUB convention (first 64 bits of md5 over the payload
    — a real deployment swaps a DCT pHash into the same slot; a crypto
    hash has no visual locality, so only exact payloads land within the
    tolerance here, which the injected exact duplicates make non-vacuous
    and the oracle verifies end-to-end including the Hamming math: XOR +
    popcount per nibble on both engines).

    Scale: identical profile to dedup_simhash — band join on 16-bit
    keys bounds candidates; the verify touches pairs, not the corpus."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(
        "doc_id", F.md5(F.encode("text", "utf-8")).alias("h")
    )
    docs = base.select(
        "doc_id", F.substring("h", 1, 16).alias("ph")
    ).unionByName(
        base.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.substring("h", 1, 16).alias("ph"),
        )
    )
    bands = docs.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("ph", (i - 1) * 4 + 1, 4).alias("key"),
                )
                for i in range(1, 5)
            ])
        ).alias("bk"),
    ).select("doc_id", "ph", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.col("a.ph").alias("pi"),
            F.col("b.ph").alias("pj"),
        )
        .distinct()
    )
    hexes = "0123456789abcdef"
    hamming = sum(
        F.bit_count(
            F.expr(
                f"(instr('{hexes}', substr(pi, {i}, 1)) - 1) "
                f"^ (instr('{hexes}', substr(pj, {i}, 1)) - 1)"
            )
        )
        for i in range(1, 17)
    )
    return cand.select(
        "i", "j", hamming.cast("bigint").alias("hamming")
    ).filter(F.col("hamming") <= 3)


@register(
    "multimodal_pair_build",
    oracle="""
    SELECT COALESCE(d.doc_id, e.vec_id) AS pair_id,
           d.lang,
           e.label,
           (d.doc_id IS NOT NULL) AS has_text,
           (e.vec_id IS NOT NULL) AS has_embedding,
           CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
                THEN 'paired'
                WHEN d.doc_id IS NOT NULL THEN 'text_only'
                ELSE 'embedding_only' END AS pair_status,
           d.n_chars
    FROM documents d
    FULL OUTER JOIN embeddings e ON e.vec_id = d.doc_id
    """,
)
def multimodal_pair_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hx-pairing — multimodal pair construction (the LAION/caption-pair
    shape): align the text modality with the embedding modality by id
    via FULL OUTER join, so BOTH failure modes stay visible — text
    without an embedding (encoder backlog) and embeddings without text
    (deleted source) — instead of being silently inner-joined away.
    Each row carries modality-presence flags and a pair status the
    downstream filter keys on; a training export takes 'paired', the
    backfill queue takes the rest. This id-aligned outer join IS the
    dataset-assembly step for contrastive multimodal training.

    Scale: one key-partitioned outer join; the modality flags are free.
    Skew lives on missing-modality ids only if id spaces diverge wildly
    — at which point you bucket by id range (the layout both tables
    already share)."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    j = d.join(e, d["doc_id"] == e["vec_id"], "full")
    has_t = F.col("doc_id").isNotNull()
    has_e = F.col("vec_id").isNotNull()
    return j.select(
        F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("pair_id"),
        "lang",
        "label",
        has_t.alias("has_text"),
        has_e.alias("has_embedding"),
        F.when(has_t & has_e, "paired")
        .when(has_t, "text_only")
        .otherwise("embedding_only")
        .alias("pair_status"),
        "n_chars",
    )
