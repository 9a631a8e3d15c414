"""Full driver-round replica in one process: plain (unconfigured) session →
``entry`` smoke → every ``queries()`` entry vs its DuckDB oracle at sf0.01.

This is the closest local approximation of the per-round verify run —
stricter than ``check_oracle.py`` in one respect: the session is built the
way the driver builds it (no engine configs), so it also proves the
runtime-configuration path.

Usage: python tools/run_driver_sim.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import canon_rows  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    t0 = time.time()
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    smoke = entrymod.entry(spark).collect()
    assert len(smoke) > 0, "entry() returned no rows"
    print(f"t1 smoke: {len(smoke)} rows")

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    sf_dir = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )

    fails: list[str] = []
    for name, fn in sorted(queries.items()):
        try:
            df = fn(spark, sf_dir)
            scols, srows = df.columns, [tuple(r) for r in df.collect()]
            if name in oracles:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                ok = (
                    len(srows) == len(drows)
                    and sorted(scols) == sorted(c.lower() for c in map(str, dcols))
                    and canon_rows(scols, srows) == canon_rows(dcols, drows)
                )
                if not ok:
                    fails.append(name)
        except Exception as exc:
            fails.append(f"{name}: {type(exc).__name__}")
    print(
        f"t2: {len(queries)} queries ({len(oracles)} oracle-checked), "
        f"fails: {fails or 'none'}, wall: {time.time() - t0:.0f}s"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
