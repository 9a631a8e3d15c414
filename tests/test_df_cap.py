"""The inverted-index df-cap (VERDICT-r6 #2): stop-word posting lists are
the quadratic hazard of every term-keyed retrieval join. The cap must
(a) leave results IDENTICAL at the production default on the organic
fixtures (max observed df fraction 0.84 < TEXT_MAX_DF_FRAC=0.9 — the
oracle-checked queries are unaffected), and (b) bound the candidate mass
on a stop-word-heavy corpus where the uncapped join goes quadratic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.dedup import containment_pairs
from avro_parquet_spark_example_spark.operators.text_analysis import (
    TEXT_MAX_DF_FRAC,
    bm25_topk,
    df_capped_terms,
    inverted_index,
    sparse_cosine_topk,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture(scope="module")
def stop_corpus(spark):
    """300 docs, 10 stop tokens present in EVERY doc (df=1.0 > cap) plus
    2 unique tokens each; docs 0-2 additionally share the selective token
    'needle'. Every doc pair shares the stop tokens, so any uncapped
    per-token pair join is quadratic (C(300,2) ≈ 45k pairs)."""
    stop = " ".join(f"stop{j}" for j in range(10))
    rows = [
        (i, f"{stop} uniq{i}a uniq{i}b" + (" needle" if i < 3 else ""))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_identity_at_default_on_fixture(spark, sf_dir):
    """Capped(default) == uncapped(None) on the organic corpus for all
    four consumers — guards the default against silently tightening
    (the LSH-cap identity-test precedent)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert _rows(inverted_index(d)) == _rows(inverted_index(d, max_df_frac=None))
    assert _rows(sparse_cosine_topk(d, 0, k=10)) == _rows(
        sparse_cosine_topk(d, 0, k=10, max_df_frac=None)
    )
    assert _rows(bm25_topk(d, 0, k=20)) == _rows(
        bm25_topk(d, 0, k=20, max_df_frac=None)
    )
    base = d.filter(F.col("doc_id") < 25).select("doc_id", "text")
    assert _rows(
        containment_pairs(base, max_df_frac=TEXT_MAX_DF_FRAC)
    ) == _rows(containment_pairs(base, max_df_frac=None))


def test_df_capped_terms_drops_stop_words(spark, stop_corpus):
    toks = stop_corpus.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    )
    kept = {r.term for r in df_capped_terms(toks, TEXT_MAX_DF_FRAC).collect()}
    assert not any(t.startswith("stop") for t in kept)
    assert "needle" in kept and "uniq0a" in kept


def test_containment_cap_bounds_quadratic_candidates(spark, stop_corpus):
    """threshold=0.0 returns the raw candidate-pair mass: uncapped is the
    full quadratic C(300,2); capped keeps only pairs sharing a below-cap
    token (the 3 needle docs -> 3 pairs)."""
    uncapped = containment_pairs(stop_corpus, threshold=0.0).count()
    assert uncapped == 300 * 299 // 2
    capped = containment_pairs(
        stop_corpus, threshold=0.0, max_df_frac=TEXT_MAX_DF_FRAC
    )
    got = _rows(capped.select("id_a", "id_b"))
    assert got == [(0, 1), (0, 2), (1, 2)]
    # admitted pairs are verified EXACTLY over the full token sets
    # (stop tokens included): 11 shared / 13 distinct-size docs
    full = {(r.id_a, r.id_b): (r.n_shared, r.containment) for r in capped.collect()}
    assert all(v == (11, round(11 / 13, 6)) for v in full.values())


def test_containment_true_pair_survives_cap(spark, sf_dir):
    """The injected truncated-copy pairs of the registered query share
    below-cap tokens, so the capped candidate generation still surfaces
    every one of them with containment 1.0."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.filter(F.col("doc_id") < 25).select("doc_id", "text")
    toks_arr = F.split("text", " ")
    half = F.ceil(F.size(toks_arr) / 2.0).cast("int")
    truncated = base.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(F.slice(toks_arr, F.lit(1), half), " ").alias("text"),
    )
    universe = base.unionByName(truncated)
    got = {
        (r.id_a, r.id_b)
        for r in containment_pairs(universe, max_df_frac=TEXT_MAX_DF_FRAC)
        .filter(F.col("containment") == 1.0)
        .collect()
    }
    assert {(i, i + 200000) for i in range(25)} <= got


def test_retrieval_cap_excludes_stopword_only_matches(spark, stop_corpus):
    """Query doc 0 shares ONLY stop tokens with docs 3..299 and the
    selective 'needle' with docs 1-2: the capped retrieval admits exactly
    docs 1-2, and their scores are EXACT (identical to the uncapped run's
    scores for the same docs) because admitted candidates are scored over
    ALL their terms."""
    capped = sparse_cosine_topk(stop_corpus, 0, k=10)
    uncapped = sparse_cosine_topk(stop_corpus, 0, k=300, max_df_frac=None)
    cap_rows = {r.doc_id: (r.dot, r.cosine) for r in capped.collect()}
    assert set(cap_rows) == {1, 2}
    unc_rows = {r.doc_id: (r.dot, r.cosine) for r in uncapped.collect()}
    for doc, scored in cap_rows.items():
        assert scored == unc_rows[doc]
    # uncapped scores every stop-word sharer: the mass the cap removes
    assert len(unc_rows) == 299

    b_capped = {r.doc_id: r.score for r in bm25_topk(stop_corpus, 0, k=10).collect()}
    assert set(b_capped) == {1, 2}
    b_unc = {
        r.doc_id: r.score
        for r in bm25_topk(stop_corpus, 0, k=300, max_df_frac=None).collect()
    }
    for doc, s in b_capped.items():
        assert s == b_unc[doc]


def test_inverted_index_cap_is_part_of_the_contract(spark, stop_corpus):
    idx = {r.tok: r.df for r in inverted_index(stop_corpus).collect()}
    assert not any(t.startswith("stop") for t in idx)
    assert idx["needle"] == 3 and idx["uniq7a"] == 1
