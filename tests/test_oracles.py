"""Oracle render-type lint — the invariant that killed rounds 4 and 5.

The driver's value hash is RENDER-SENSITIVE: it fetches DuckDB results in a
way where an int128 (HUGEINT) column renders differently from Spark's int64
(BIGINT) even when every value is equal (round-5 postmortem: exactly the 4
driver hash-fails — and no others — had HUGEINT output columns; DuckDB
widens SUM(integer) and integer division to HUGEINT). The local comparator
fetches via fetchall() where both arrive as Python int, so it is
structurally blind to the divergence. This module closes the blind spot at
the type level: every registered oracle is BOUND (caught ts_hour_profile's
binder error class too) and its result types are asserted to contain

  * no HUGEINT/UHUGEINT anywhere — fix is CAST(... AS BIGINT) in the oracle;
  * DECIMAL only on columns where the Spark twin emits the identical
    DecimalType (explicit allow-list, kept in lockstep with the queries).

Runs on DuckDB only (no Spark session) so it is fast enough to gate every
commit; `LIMIT 0`-style binding is not enough because DuckDB resolves some
widths only at relation build, so we build the full relation lazily (types
are available without executing)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR

# (query, column) pairs where a DECIMAL output is INTENTIONAL and the Spark
# side emits the exact same DecimalType(precision, scale) — verified by the
# oracle gate's value comparison. Anything not listed here fails the lint.
DECIMAL_ALLOWED = {
    ("vec_power_iteration_top_pc", "direction"),  # both sides decimal(12,9)
    # both sides decimal(12,9): Spark emits the identical DecimalType via
    # operators/simsearch.py (vec_top2_pcs quantizes each direction component
    # the same way as vec_power_iteration_top_pc); gate PASS at sf0.01+sf0.1.
    ("vec_top2_pcs", "direction"),
    # both sides decimal(38,0) BY DESIGN (r15 self-review): pair counts
    # are ~n² per stratum and cross int64 at ~3e9 rows/event_type, so
    # Spark emits the identical DecimalType (operators/rankstats.py
    # gk_gamma_tau); gate PASS hash-verified at sf0.01 + sf0.1.
    ("stat_gk_gamma_tau", "concordant"),
    ("stat_gk_gamma_tau", "discordant"),
}


def _oracle_relations():
    import __spark_entry__ as e
    from avro_parquet_spark_example_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con, e.oracle_sql()


def test_every_oracle_binds_and_renders_driver_safe():
    con, oracles = _oracle_relations()
    assert oracles, "registry exposes no oracles"
    binder_errors = []
    hugeint_cols = []
    decimal_cols = []
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            cols_types = list(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as exc:  # binder/parser error = broken oracle
            binder_errors.append((name, str(exc).splitlines()[0]))
            continue
        for col, typ in cols_types:
            if "HUGEINT" in typ:
                hugeint_cols.append((name, col, typ))
            elif "DECIMAL" in typ and (name, col) not in DECIMAL_ALLOWED:
                decimal_cols.append((name, col, typ))
    assert not binder_errors, f"oracles fail to bind: {binder_errors}"
    assert not hugeint_cols, (
        "HUGEINT output columns diverge from Spark BIGINT under the "
        f"driver's render-sensitive hash — CAST(... AS BIGINT): {hugeint_cols}"
    )
    assert not decimal_cols, (
        "unallowed DECIMAL output columns (driver render risk) — cast to "
        f"DOUBLE/BIGINT or allow-list with a Spark-side match: {decimal_cols}"
    )


def test_lint_would_catch_a_reintroduced_hugeint():
    """Negative control: the exact expression class that escaped rounds 4-5
    (SUM over an integer column) must trip the lint's type probe."""
    con, _ = _oracle_relations()
    rel = con.sql("SELECT SUM(n_chars) AS s FROM documents")
    assert any("HUGEINT" in str(t) for t in rel.types), (
        "DuckDB stopped widening SUM(int) to HUGEINT — revisit the lint "
        "and the CAST guidance"
    )
