"""10× scale-up stress for the round-9 event/order operators
(SCALING.md §Round-9 measured scale-up).

Synthesizes key-shifted ×10 copies of sf0.1 `events` (10× users, same
per-user timeline density) and `orders` (10× customers), links the other
tables, then times each round-9 operator warm at 1× vs 10× to verify the
linear-scaling claims made in the docstrings.

Usage: python tools/events_scaleup_r9.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SCALEUP_BASE", "/root/testdata/sf0.1")
SCRATCH = "/tmp/avro_parquet_spark_example_spark_scaleup_r9"
FACTOR = 10

OPS = [
    "mine_association_pairs",     # basket distinct + pair equi-join
    "mine_sequence_trigrams",     # per-user window + trigram agg
    "ts_rfm_segments",            # 3x two-phase global NTILE
    "ts_seasonality_decompose",   # day agg + broadcast profile
    "dq_drift_ks",                # distributed CDF prefix sums
    "dq_drift_mannwhitney",       # same CDF frame, midrank sums
    "dq_drift_welch_ttest",       # single moment aggregate
    "agg_chi_square_independence",  # contingency cells + marginals
    "agg_hll_intersection",       # per-type sketches + pair algebra
    "text_keyness_llr",           # token agg + 1-row totals (docs 1x: control)
]


def synthesize(spark) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"x{FACTOR}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_ev = ev.count()
    od = spark.read.parquet(f"{BASE}/orders.parquet")
    n_cust = od.agg(F.max("o_custkey")).collect()[0][0] + 1
    n_od = od.agg(F.max("o_orderkey")).collect()[0][0] + 1

    big_ev = None
    big_od = None
    for i in range(FACTOR):
        e = ev.withColumn("user_id", F.col("user_id") + F.lit(i * n_users)) \
              .withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
        o = od.withColumn("o_custkey", F.col("o_custkey") + F.lit(i * n_cust)) \
              .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * n_od))
        big_ev = e if big_ev is None else big_ev.unionByName(e)
        big_od = o if big_od is None else big_od.unionByName(o)
    big_ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    big_od.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "documents", "embeddings"):
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)
    open(marker, "w").close()
    return out


def time_op(fn, spark, sf_dir: str) -> tuple[float, int]:
    fn(spark, sf_dir).collect()  # warm
    t0 = time.time()
    rows = fn(spark, sf_dir).collect()
    return time.time() - t0, len(rows)


def main() -> None:
    from avro_parquet_spark_example_spark.registry import get_query
    from avro_parquet_spark_example_spark.session import get_session

    spark = get_session(
        app_name="events-scaleup-r9", master="local[32]",
        shuffle_partitions=32,
    )
    big = synthesize(spark)
    print(f"# {FACTOR}x events/orders stress ({BASE} -> {big})")
    for name in OPS:
        fn = get_query(name).fn
        t1, r1 = time_op(fn, spark, BASE)
        t10, r10 = time_op(fn, spark, big)
        print(
            f"{name}: 1x {t1:.2f}s ({r1} rows) | {FACTOR}x {t10:.2f}s "
            f"({r10} rows) | ratio {t10 / max(t1, 1e-9):.1f}x"
        )


if __name__ == "__main__":
    main()
