"""Property tests for the export-side curation operators
(operators/curation.py): chunking reassembly, packing bin bounds, shuffle
determinism/coverage, mixture ratio targets, and CC fixpoint validity."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators import curation
from avro_parquet_spark_example_spark.registry import get_query
from avro_parquet_spark_example_spark.sources.catalog import load


def _run(name, spark, sf_dir):
    return get_query(name).fn(spark, sf_dir)


def test_chunks_reassemble_to_original(spark, sf_dir):
    # Dropping each chunk's overlap tail and concatenating in chunk_id order
    # must reproduce the original text exactly — no chars lost or duplicated.
    chunks = _run("text_chunk_overlap", spark, sf_dir)
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.expr(f"substring(chunk, 1, {curation.STRIDE})"),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "piece"))).piece
            ).alias("rebuilt")
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # The final chunk keeps its full tail (it is shorter than CHUNK), so the
    # reassembly above can only differ if a middle chunk was misplaced;
    # compare via startswith + length accounting.
    joined = docs.join(rebuilt, "doc_id").select(
        "doc_id",
        (F.col("text") == F.col("rebuilt"))
        | F.col("text").startswith(F.col("rebuilt")).alias("prefix_ok"),
        (F.length("text") - F.length("rebuilt")).alias("tail_missing"),
    )
    bad = joined.filter(
        ~F.col("text").startswith(F.col("rebuilt"))
        | (F.length("rebuilt") > F.length("text"))
    ).count()
    assert bad == 0
    # Tail shortfall is bounded by CHUNK - STRIDE (the last chunk's overlap
    # has already been emitted by the previous chunk's stride window).
    max_missing = (
        docs.join(rebuilt, "doc_id")
        .agg(F.max(F.length("text") - F.length("rebuilt")))
        .collect()[0][0]
    )
    assert max_missing <= curation.CHUNK - curation.STRIDE


def test_chunk_geometry(spark, sf_dir):
    chunks = _run("text_chunk_overlap", spark, sf_dir)
    # Every chunk ≤ CHUNK chars; every non-final chunk exactly CHUNK chars.
    assert chunks.filter(F.col("chunk_len") > curation.CHUNK).count() == 0
    w_max = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last"))
    nonfinal = chunks.join(w_max, "doc_id").filter(F.col("chunk_id") < F.col("last"))
    assert nonfinal.filter(F.col("chunk_len") != curation.CHUNK).count() == 0


def test_pack_bins_cover_all_docs_and_respect_start_budget(spark, sf_dir):
    packed = _run("pack_sequences", spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    # Every doc lands in exactly one bin: totals match the corpus.
    total_docs = docs.count()
    assert packed.agg(F.sum("n_docs")).collect()[0][0] == total_docs
    tok_total = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("t")
    ).collect()[0][0]
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == tok_total
    # Bins are dense per lang: ids 0..max with no gaps (concatenation packing
    # never skips a bin).
    per_lang = packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bins"), F.max("bin").alias("max_bin")
    )
    assert per_lang.filter(F.col("n_bins") != F.col("max_bin") + 1).count() == 0


def test_shuffle_shards_deterministic_and_complete(spark, sf_dir):
    a = _run("shuffle_seeded_shards", spark, sf_dir)
    b = _run("shuffle_seeded_shards", spark, sf_dir)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    docs = load(spark, sf_dir, "documents")
    assert a.count() == docs.count()
    assert a.select("doc_id").distinct().count() == docs.count()
    # Shards are hex digits; rank_in_shard is 1..shard_size per shard.
    per_shard = a.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank_in_shard").alias("lo"),
        F.max("rank_in_shard").alias("hi"),
    )
    assert per_shard.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0


def test_mixture_ratios_near_targets(spark):
    # At sf0.01 (500 docs) realized hash-threshold ratios should sit near the
    # configured per-lang targets (binomial noise bounds the gap); the fixture
    # sf_dir is sf0.001 where per-lang counts are too small to test ratios.
    rows = {
        r["lang"]: r
        for r in _run("mixture_downsample", spark, "/root/testdata/sf0.01").collect()
    }
    targets = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.125, "zh": 0.125}
    for lang, tgt in targets.items():
        got = rows[lang]["keep_ratio"]
        assert abs(got - tgt) < 0.2, (lang, got, tgt)


def test_cc_labels_are_a_valid_fixpoint(spark, sf_dir):
    labels = _run("dedup_cluster_cc", spark, sf_dir)
    pairs = get_query("neardup_jaccard").fn(spark, sf_dir).select("a", "b")
    la = labels.select(F.col("doc_id").alias("a"), F.col("component").alias("ca"))
    lb = labels.select(F.col("doc_id").alias("b"), F.col("component").alias("cb"))
    # Fixpoint: every edge joins two nodes with the SAME component label.
    mismatched = pairs.join(la, "a").join(lb, "b").filter(F.col("ca") != F.col("cb"))
    assert mismatched.count() == 0
    # Canonical member: each component's label equals its minimum doc_id and
    # that doc is flagged is_canonical.
    mins = labels.groupBy("component").agg(F.min("doc_id").alias("min_id"))
    assert mins.filter(F.col("component") != F.col("min_id")).count() == 0
    canon = labels.filter(F.col("is_canonical"))
    assert canon.count() == labels.select("component").distinct().count()


def test_approx_percentile_tracks_exact(spark):
    # Sketch vs exact twin at sf0.01: relative error bounded by the sketch
    # accuracy parameter (1/10000), far below 0.1% on 20k-row groups.
    exact = {
        r["l_returnflag"]: r
        for r in _run("agg_percentiles", spark, "/root/testdata/sf0.01").collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in _run("agg_approx_percentile", spark, "/root/testdata/sf0.01").collect()
    }
    assert exact.keys() == approx.keys()
    for flag in exact:
        for col in ("p25", "p50", "p75", "p95"):
            e, a = exact[flag][col], approx[flag][col]
            assert abs(a - e) / e < 1e-3, (flag, col, e, a)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
            min_size=0,
            max_size=900,
        ),
        min_size=1,
        max_size=8,
    ),
    chunk=st.integers(min_value=2, max_value=120),
    overlap=st.integers(min_value=1, max_value=60),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_chunk_documents_property(texts, chunk, overlap):
    # Arbitrary text + geometry: chunks cover the text exactly (stride
    # pieces + final tail reassemble to the original), every chunk fits the
    # window, and ids are dense from 0.
    from avro_parquet_spark_example_spark.operators.curation import chunk_documents
    from avro_parquet_spark_example_spark.session import get_session

    stride = max(1, chunk - min(overlap, chunk - 1))
    spark = get_session(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = chunk_documents(df, chunk=chunk, stride=stride)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk"]) for r in out.collect())
    )
    by_doc = {}
    for doc_id, chunk_id, piece in rows:
        by_doc.setdefault(doc_id, []).append((chunk_id, piece))
    assert set(by_doc) == set(range(len(texts)))
    for doc_id, pieces in by_doc.items():
        ids = [cid for cid, _ in pieces]
        assert ids == list(range(len(pieces)))  # dense from 0
        assert all(len(p) <= chunk for _, p in pieces)
        rebuilt = "".join(p[:stride] for _, p in pieces[:-1]) + pieces[-1][1]
        assert rebuilt == texts[doc_id]


def test_token_budget_prefix_sum_matches_naive_window(spark):
    """The distributed two-phase prefix sum (range buckets + per-bucket
    windows + broadcast offsets) must equal the naive single-partition
    global running sum on adversarial inputs: heavy score ties (ties at
    bucket boundaries share a bucket), discrete values that collapse
    quantile boundaries, and single-row corpora."""
    from pyspark.sql import Window

    cases = [
        # (doc_id, n_tokens, score) triples
        [(i, 10 + i % 3, float(i % 4) / 4) for i in range(200)],  # heavy ties
        [(i, 5, 0.5) for i in range(50)],  # ALL scores identical
        [(0, 7, 0.9)],  # single row
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score double")
        total = df.agg(F.sum("n_tokens")).collect()[0][0]
        budget = int(total * 0.5)

        naive = {
            r.doc_id: r.cum
            for r in df.withColumn(
                "cum",
                F.sum("n_tokens").over(
                    Window.orderBy(F.col("score").desc(), "doc_id")
                ),
            )
            .filter(F.col("cum") <= budget)
            .collect()
        }

        bounds = sorted(set(df.approxQuantile("score", [i / 8 for i in range(1, 8)], 0.001)))
        bounds_arr = F.array(*[F.lit(float(b)) for b in bounds])
        bucket = F.size(F.filter(bounds_arr, lambda b: b >= F.col("score")))
        bucketed = df.withColumn("bucket", bucket)
        sums = {
            r.bucket: r.s
            for r in bucketed.groupBy("bucket").agg(F.sum("n_tokens").alias("s")).collect()
        }
        acc, offset_rows = 0, []
        for k in sorted(sums):
            offset_rows.append((k, acc))
            acc += sums[k]
        offsets = F.broadcast(
            spark.createDataFrame(offset_rows, "bucket int, offset long")
        )
        w = Window.partitionBy("bucket").orderBy(F.col("score").desc(), "doc_id")
        dist = {
            r.doc_id: r.cum
            for r in bucketed.join(offsets, "bucket")
            .withColumn("cum", F.sum("n_tokens").over(w) + F.col("offset"))
            .filter(F.col("cum") <= budget)
            .collect()
        }
        assert dist == naive, f"case with {len(rows)} rows diverged"


def test_largest_remainder_quota_invariants(spark, sf_dir):
    """Hamilton apportionment invariants: quotas sum EXACTLY to the
    budget, every domain gets floor or floor+1 of its proportional share
    (no domain over- or under-allocated by more than 1), and monotone in
    domain size up to the +1 seat."""
    from avro_parquet_spark_example_spark.operators.curation import (
        QUOTA_BUDGET,
    )
    from avro_parquet_spark_example_spark.registry import get_query

    rows = (
        get_query("mixture_largest_remainder_quota")
        .fn(spark, sf_dir)
        .collect()
    )
    total = sum(r.n_docs for r in rows)
    assert sum(r.quota for r in rows) == QUOTA_BUDGET
    for r in rows:
        fl = r.n_docs * QUOTA_BUDGET // total
        assert r.quota in (fl, fl + 1), (r.lang, r.quota, fl)


def test_largest_remainder_quota_matches_reference(spark):
    """The Spark apportionment agrees with a pure-Python largest-remainder
    reference on adversarial domain distributions: heavy skew, exact
    divisibility (no leftover seats), remainder ties (name tiebreak), and
    a domain smaller than one seat's worth."""
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.curation import (
        QUOTA_BUDGET,
    )

    def reference(counts: dict[str, int]) -> dict[str, int]:
        total = sum(counts.values())
        floors = {d: n * QUOTA_BUDGET // total for d, n in counts.items()}
        rems = {d: n * QUOTA_BUDGET % total for d, n in counts.items()}
        leftover = QUOTA_BUDGET - sum(floors.values())
        order = sorted(counts, key=lambda d: (-rems[d], d))
        return {
            d: floors[d] + (1 if i < leftover else 0)
            for i, d in enumerate(order)
        }

    cases = [
        {"en": 9000, "de": 500, "fr": 499, "zh": 1},     # heavy skew
        {"a": 250, "b": 250, "c": 250, "d": 250},        # exact division
        {"a": 333, "b": 333, "c": 334},                  # remainder ties
        {"big": 999999, "tiny": 1},                      # sub-seat domain
    ]
    from avro_parquet_spark_example_spark.operators.curation import (
        largest_remainder_quota,
    )

    for counts in cases:
        rows = [(d, i) for d, n in counts.items() for i in range(n)]
        docs = spark.createDataFrame(rows, ["lang", "x"])
        got = {
            r.lang: r.quota
            for r in largest_remainder_quota(
                docs, "lang", QUOTA_BUDGET
            ).collect()
        }
        assert got == reference(counts), (counts, got)


def test_largest_remainder_quota_null_domain(spark):
    """ADVICE r9: a NULL domain that ties on remainder must not let BOTH
    tied rows take the +1 seat (a bare `b_lang < a.lang` goes NULL and
    breaks Σquota == budget). NULL sorts LAST in the tiebreak — the
    named domain wins the seat — and the budget invariant holds exactly.
    333/333/334 over budget 1000 gives remainders 0 twice with floors
    summing to budget; use 3 domains where one is NULL and remainders
    tie: counts 1/1/2 with budget 3 → rem(a)=rem(NULL), one seat."""
    from avro_parquet_spark_example_spark.operators.curation import (
        largest_remainder_quota,
    )

    rows = [("a", 0)] + [(None, 0)] + [("b", 0), ("b", 1)]
    docs = spark.createDataFrame(rows, ["lang", "x"])
    got = {
        r.lang: r.quota
        for r in largest_remainder_quota(docs, "lang", 3).collect()
    }
    # total=4, budget=3: floors a=0, NULL=0, b=1; rems a=3, NULL=3, b=2;
    # one leftover seat after floors (3-1=2 seats): a and NULL tie at
    # rem 3 -> both ahead of b; 2 seats go to a (name beats NULL) and
    # NULL. Σ == 3 exactly.
    assert sum(got.values()) == 3, got
    assert got["a"] == 1 and got[None] == 1 and got["b"] == 1


def test_largest_remainder_quota_null_tie_single_seat(spark):
    """One leftover seat, NULL vs named tied on remainder: exactly ONE
    gets it (the named domain — NULL last), never both."""
    from avro_parquet_spark_example_spark.operators.curation import (
        largest_remainder_quota,
    )

    # counts a=1, NULL=1 over budget 1: floors 0/0, rems 1/1, 1 seat.
    docs = spark.createDataFrame([("a", 0), (None, 0)], ["lang", "x"])
    got = {
        r.lang: r.quota
        for r in largest_remainder_quota(docs, "lang", 1).collect()
    }
    assert sum(got.values()) == 1, got
    assert got["a"] == 1 and got[None] == 0
