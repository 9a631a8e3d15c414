"""Group H (UDF surface) — the four Python extension points
(SURVEY.md §2 H8–H11): scalar UDF, Arrow-vectorized pandas UDF, grouped
pandas aggregation, and a Python UDTF.

These are the engine's escape hatches, the modern analogue of the
reference's JVM record-mapping functions. Rules of engagement at scale
(enforced by example here): pandas/Arrow variants over row-at-a-time
whenever Python is genuinely needed; row UDFs exist for API completeness
and are documented as the slow path. Every query still has a pure-SQL
oracle, proving the UDF output matches what built-ins would compute.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


@register(
    "udf_python_scalar",
    oracle="""
    SELECT doc_id,
           LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), t -> STRLEN(t) > 0)) AS n_tokens,
           LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), t -> STRLEN(t) > 0)[1] AS first_token
    FROM documents WHERE doc_id < 100
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 — row-at-a-time Python UDF (tokenizer). THE SLOW PATH: one
    serialize/deserialize per row; kept off hot paths, shown here bounded to
    100 docs. Prefer built-ins (see text_analysis) or pandas UDFs below."""

    @F.udf(returnType=ArrayType(StringType()))
    def tokenize(text: str) -> list[str]:
        return [t for t in text.lower().split(" ") if t]

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
    )


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT vec_id,
           ROUND(CAST(embedding[1] AS DOUBLE)
                 / SQRT((SELECT SUM(CAST(embedding[g.i] AS DOUBLE) * CAST(embedding[g.i] AS DOUBLE))
                         FROM GENERATE_SERIES(1, 64) g(i))), 5) AS e0_renorm
    FROM embeddings
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 — Arrow-vectorized pandas UDF: L2-renormalize embeddings in numpy
    (one Arrow batch per ~10k rows, not per row). Oracle recomputes the same
    arithmetic in SQL; both fold float32→double in index order."""

    @F.pandas_udf("double")
    def renorm_first(emb: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in emb])
        norms = np.sqrt((mat * mat).sum(axis=1))
        return pd.Series(mat[:, 0] / norms)

    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.round(renorm_first("embedding"), 5).alias("e0_renorm")
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
    SELECT lang,
           ROUND(MEDIAN(n_chars), 4) AS median_chars
    FROM documents
    GROUP BY lang
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 — grouped-aggregate pandas UDF: per-language median (linear-
    interpolation median == DuckDB MEDIAN for integer input). Partial
    aggregation doesn't apply to exact medians — each group's values
    assemble on one executor, which is why approx percentiles (D3/D5
    sketches) are the 100 TB default and exact medians are an explicit
    opt-in. (Spark can't mix pandas UDAFs with built-in aggregates in one
    ``agg`` — hence the single-aggregate result shape.)"""

    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(median_udaf("n_chars"), 4).alias("median_chars")
    )


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT doc_id,
           ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                 / STDDEV_POP(n_chars) OVER (PARTITION BY lang), 4) AS z_chars
    FROM documents
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10b — ``applyInPandas``: whole-group custom transform (per-language
    z-score of document length). The group shuffles to one worker as Arrow
    batches — right for bounded groups (languages), wrong for unbounded keys."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sigma = pdf["n_chars"].std(ddof=0)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "z_chars": ((pdf["n_chars"] - mu) / sigma).round(4)}
        )

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(zscore, schema="doc_id long, z_chars double")


@register(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           UNNEST([w[i] || ' ' || w[i + 1] FOR i IN RANGE(1, LEN(w))]) AS bigram
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w
          FROM documents WHERE doc_id < 30)
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H11 — Python UDTF (Spark ≥3.5): expand each document into bigram
    rows via a lateral join — the table-function shape for custom
    expanders (chunkers, shinglers, frame samplers)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class BigramExpander:
        def eval(self, doc_id: int, text: str):
            words = text.split(" ")
            for i in range(len(words) - 1):
                yield doc_id, f"{words[i]} {words[i + 1]}"

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("bigram_expander", BigramExpander)
    return spark.sql(
        "SELECT t.doc_id, t.bigram "
        "FROM udtf_docs_in, LATERAL bigram_expander(doc_id, text) t"
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT event_id,
           value * 2 AS doubled,
           CAST(event_id % 16 AS BIGINT) AS bucket
    FROM events
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9b — ``mapInArrow``: the zero-copy batch UDF tier below Pandas UDFs.
    The function receives raw ``pyarrow.RecordBatch``es — no pandas
    conversion, no index materialization — and uses ``pyarrow.compute``
    kernels (vectorized C++) on the columns. For plain arithmetic the
    built-in functions still win (stay in codegen, see oracle), but when a
    Python library speaks Arrow natively (tokenizers, model runtimes,
    image codecs — the multimodal operators' real decode path), this is the
    cheapest Python boundary Spark offers: one Arrow IPC transfer per
    batch, both directions. Double ops are IEEE-identical across engines,
    so the oracle pins values exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load(spark, sf_dir, "events").select("event_id", "value")

    def double_and_bucket(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            eid = batch.column("event_id")
            yield pa.RecordBatch.from_arrays(
                [
                    eid,
                    pc.multiply(batch.column("value"), pa.scalar(2.0)),
                    pc.cast(
                        pc.bit_wise_and(eid, pa.scalar(15, pa.int64())), pa.int64()
                    ),
                ],
                names=["event_id", "doubled", "bucket"],
            )

    return e.mapInArrow(
        double_and_bucket, "event_id bigint, doubled double, bucket bigint"
    )


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           STRLEN(TRIM(text)) - STRLEN(REPLACE(TRIM(text), ' ', '')) + 1
               AS n_spaces_words,
           UPPER(SUBSTR(TRIM(text), 1, 1)) || SUBSTR(TRIM(text), 2, 10)
               AS title_head
    FROM documents WHERE doc_id < 200
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8b — Arrow-OPTIMIZED scalar Python UDF (``useArrow=True``, Spark
    4): same per-row Python semantics as udf_python_scalar but batched
    over Arrow instead of pickled row-by-row — the drop-in upgrade when a
    row UDF can't be rewritten as a pandas UDF (non-vectorizable logic,
    per-row early returns) yet the 10-100× serialization tax is
    unacceptable. Still Python in the plan (ArrowEvalPython), still off
    the hot path and bounded here; the plan-audit distinction is visible:
    this query does NOT appear in the BatchEvalPython allow-list because
    it doesn't produce that node."""

    @F.udf(returnType="n_spaces_words int, title_head string", useArrow=True)
    def head_features(text: str):
        t = text.strip()
        return (t.count(" ") + 1, (t[:1].upper() + t[1:11]))

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    feats = head_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_spaces_words"].alias("n_spaces_words"),
        feats["title_head"].alias("title_head"),
    )
