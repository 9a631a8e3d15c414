"""Round-15 operators: the partitioned two-phase bucketed Lorenz rank
(bit-identical to the window form), the scaled LSH density dial, and the
r15 self-review degenerate-margin pins."""

from __future__ import annotations

import math

import pytest

from avro_parquet_spark_example_spark.registry import get_query


# --------------------------------------------------------------------------
# agg_lorenz_curve_bucketed ≡ agg_lorenz_curve
# --------------------------------------------------------------------------


def test_lorenz_bucketed_identical_to_window_form(spark, sf_dir):
    window_rows = sorted(
        map(tuple, get_query("agg_lorenz_curve").fn(spark, sf_dir).collect())
    )
    bucketed_rows = sorted(
        map(
            tuple,
            get_query("agg_lorenz_curve_bucketed").fn(spark, sf_dir).collect(),
        )
    )
    assert bucketed_rows == window_rows


def test_lorenz_bucketed_plan_has_no_per_type_sort(spark, sf_dir):
    # the window form's scale hazard is a row_number() partitioned by the
    # 3-5-value event_type — the bucketed form's only rank window must
    # partition by (event_type, bk)
    plan = get_query("agg_lorenz_curve_bucketed").fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "bk" in spec, f"rank window not bucket-partitioned: {spec}"


def test_lorenz_bucketed_library_form_on_skewed_frame(spark):
    # all users share one s value -> every user lands in bucket 0 (span
    # 0); ranks must still be the exact (s, user_id) sequence and the
    # curve the uniform diagonal
    from avro_parquet_spark_example_spark.operators.rankstats import (
        lorenz_curve,
        lorenz_curve_bucketed,
    )

    rows = [("a", uid, 7) for uid in range(40)]
    pu = spark.createDataFrame(rows, "event_type string, user_id int, s long")
    got = sorted(map(tuple, lorenz_curve_bucketed(pu).collect()))
    want = sorted(map(tuple, lorenz_curve(pu).collect()))
    assert got == want
    # uniform s: cum_value_share == cum_user_share at every decile
    for _et, _dec, _nu, cus, cvs in got:
        assert cvs == pytest.approx(cus, abs=1e-9)


def test_lorenz_bucketed_library_form_mixed_groups(spark):
    from avro_parquet_spark_example_spark.operators.rankstats import (
        lorenz_curve,
        lorenz_curve_bucketed,
    )

    rows = [("a", uid, (uid * 37) % 101 + 1) for uid in range(73)] + [
        ("b", uid, (uid * uid) % 53 + 5) for uid in range(29)
    ]
    pu = spark.createDataFrame(rows, "event_type string, user_id int, s long")
    assert sorted(map(tuple, lorenz_curve_bucketed(pu).collect())) == sorted(
        map(tuple, lorenz_curve(pu).collect())
    )


def test_engine_lorenz_bucketed_facade_parity(spark, sf_dir):
    from avro_parquet_spark_example_spark.engine import Engine
    from pyspark.sql import functions as F

    eng = Engine(spark=spark, sf_dir=sf_dir)
    per_user = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("s")
        )
    )
    got = sorted(map(tuple, eng.lorenz_curve_bucketed(per_user).collect()))
    want = sorted(
        map(
            tuple,
            get_query("agg_lorenz_curve_bucketed").fn(spark, sf_dir).collect(),
        )
    )
    assert got == want


# --------------------------------------------------------------------------
# scaled_lsh_bits — the LSH density dial (x100 ANN program finding)
# --------------------------------------------------------------------------


def test_scaled_lsh_bits_dial():
    from avro_parquet_spark_example_spark.operators.simsearch import (
        K_BITS,
        scaled_lsh_bits,
    )

    assert scaled_lsh_bits(2000, 2000) == K_BITS
    assert scaled_lsh_bits(1000, 2000) == K_BITS  # never below reference
    # x100 corpus: K grows by log2(100) ~ 6.64 -> +7
    assert scaled_lsh_bits(200_000, 2000) == K_BITS + 7
    # constant occupancy invariant: n / 2^K within a factor 2 of reference
    for n in (2000, 20_000, 200_000, 2_000_000):
        k = scaled_lsh_bits(n, 2000)
        occ = n / 2**k
        ref_occ = 2000 / 2**K_BITS
        assert ref_occ / 2 <= occ <= ref_occ * 2
    with pytest.raises(ValueError):
        scaled_lsh_bits(0, 2000)


def test_lsh_table_keys_scaled_k_roundtrip(spark):
    # the parameterized key builder must produce L keys whose low k bits
    # vary and whose table tag rides the high bits, for non-default k
    from pyspark.sql import functions as F

    from avro_parquet_spark_example_spark.operators.simsearch import (
        L_TABLES,
        hyperplanes,
        lsh_table_keys,
        multiprobe_keys,
    )

    k = 8
    planes = hyperplanes(n_planes=L_TABLES * k)
    df = spark.createDataFrame(
        [(i, [math.sin(i * 64 + d) for d in range(64)]) for i in range(20)],
        "vec_id int, embedding array<float>",
    )
    keys = df.select(
        F.explode(lsh_table_keys(F.col("embedding"), planes, k=k)).alias("key")
    )
    rows = [r["key"] for r in keys.collect()]
    assert len(rows) == 20 * L_TABLES
    tables = {r >> 32 for r in rows}
    assert tables == set(range(L_TABLES))
    assert all(0 <= (r & 0xFFFFFFFF) < 2**k for r in rows)
    # multiprobe at k flips: k+1 distinct probes per table
    probes = df.limit(1).select(
        F.explode(
            multiprobe_keys(
                lsh_table_keys(F.col("embedding"), planes, k=k), k_bits=k
            )
        ).alias("p")
    )
    assert probes.distinct().count() == L_TABLES * (k + 1)
