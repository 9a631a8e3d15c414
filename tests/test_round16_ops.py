"""Round-16 optimization pins (OPTIMIZATION_r16.md): streaming state
sizing / no-data-batch elision, size-gated entity checkpoints, the
bounded-frame leak rule, and the driver-side BPE replay."""

from __future__ import annotations

import pytest

from avro_parquet_spark_example_spark.registry import get_query


def test_stream_dedup_elides_no_data_batch(spark, sf_dir):
    """Append dropDuplicates emits rows WITH the data batch, so the r16
    elision must leave exactly the data batch(es) — and the output stays
    the full dedup (oracle-checked elsewhere; row count pinned here)."""
    from avro_parquet_spark_example_spark.streaming import stateful

    out = get_query("stream_watermark_dedup").fn(spark, sf_dir)
    n = out.count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert stateful.LAST_STREAM_PROGRESS, "progress not captured"
    data_batches = [
        p for p in stateful.LAST_STREAM_PROGRESS if p.get("numInputRows")
    ]
    assert len(stateful.LAST_STREAM_PROGRESS) == len(data_batches), (
        "no-data batch ran despite final_no_data_batch=False"
    )


def test_stream_session_keeps_no_data_batch(spark, sf_dir):
    """Append session windows emit ON watermark advance: the trailing
    no-data batch must STAY (eliding it would withhold every session
    closed by the final watermark — a correctness bug, not a tuning)."""
    from avro_parquet_spark_example_spark.streaming import stateful

    get_query("stream_session_windowed").fn(spark, sf_dir).count()
    progress = stateful.LAST_STREAM_PROGRESS
    assert any(p.get("numInputRows") == 0 for p in progress), (
        "trailing watermark-advance batch missing on an append session "
        "window"
    )


def test_er_records_gated_matches_full_form(spark, sf_dir):
    """The size-gated records frame (bounded variants checkpointed,
    corpus base lazy) must be row-identical to the plain union — the
    r16 checkpoint-hygiene change is a materialization choice, never a
    semantic one."""
    from avro_parquet_spark_example_spark.operators.entity import (
        er_records,
        er_records_gated,
        er_records_mf,
        er_records_mf_gated,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    cust = load(spark, sf_dir, "customer")
    assert sorted(map(tuple, er_records(cust).collect())) == sorted(
        map(tuple, er_records_gated(cust).collect())
    )
    assert sorted(map(tuple, er_records_mf(cust).collect())) == sorted(
        map(tuple, er_records_mf_gated(cust).collect())
    )


def test_checkpoint_heavy_queries_leave_no_oversized_blocks(spark, sf_dir):
    """Bounded-frame rule, registry-sampled (the kcenter leak test's
    id-based discipline extended per VERDICT r15): after running the
    checkpoint-heaviest operators, every persisted block still resident
    must be SMALL — eager localCheckpoints may linger until the async
    ContextCleaner runs, but under the bounded-frame rule none of them
    may be corpus-scale."""
    import gc
    import time

    heavy = [
        "er_blocked_match",
        "er_multipass_match",
        "dedup_minhash_verified",
        "cluster_kmeans_exact",
        "agg_kendall_tau_b",
        "eval_cohens_kappa",
        "curation_dsir_importance",
    ]
    for name in heavy:
        get_query(name).fn(spark, sf_dir).count()
    gc.collect()
    spark.catalog.clearCache()
    time.sleep(1.0)
    cap = 32 * 1024 * 1024
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    big = [
        (i.id(), i.name(), i.memSize() + i.diskSize())
        for i in infos
        if i.memSize() + i.diskSize() > cap
    ]
    assert not big, f"corpus-scale persisted blocks survived: {big}"


def test_bpe_driver_replay_identical_to_distributed_rounds(spark, sf_dir):
    """The r16 driver-side BPE merge loop must reproduce the distributed
    per-round form bit-for-bit: same pair counts (exact integers), same
    (count desc, pair) argmax, same left-to-right non-overlapping string
    REPLACE — asserted by replaying ONE distributed round in Spark and
    comparing its top pair against the driver loop's first merge."""
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.text_analysis import (
        BPE_MAX_DOC,
    )
    from avro_parquet_spark_example_spark.sources.catalog import load

    got = get_query("text_bpe_train").fn(spark, sf_dir).collect()
    assert [r.step for r in got] == list(range(1, len(got) + 1))
    first = next(r for r in got if r.step == 1)
    top = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BPE_MAX_DOC)
        .select(
            F.split(
                F.trim(
                    F.concat(
                        F.lit(" "),
                        F.array_join(
                            F.split(
                                F.replace(
                                    F.lower(F.trim(F.col("text"))),
                                    F.lit(" "),
                                    F.lit("_"),
                                ),
                                "",
                            ),
                            " ",
                        ),
                        F.lit(" "),
                    )
                ),
                " ",
            ).alias("ws")
        )
        .select(
            F.explode(
                F.expr(
                    "filter(transform(ws, (x, i) -> IF(i < size(ws) - 1, "
                    "struct(x AS pa, ws[i + 1] AS pb), NULL)), "
                    "v -> v IS NOT NULL)"
                )
            ).alias("p")
        )
        .groupBy("p.pa", "p.pb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pa", "pb")
        .limit(1)
        .collect()[0]
    )
    assert (first.left_sym, first.right_sym, first.cnt) == (
        top.pa,
        top.pb,
        top.cnt,
    )
