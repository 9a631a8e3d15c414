"""Shared per-key group-size cap — THE skew defense every candidate
generator in this engine uses.

Why this exists: every quadratic candidate generator here (LSH band
buckets, ER blocks, market baskets, bipartite part memberships, posting
lists) is an equi-self-join on a group key, and its per-task cost is
C(group_size, 2). A single hot key — one boilerplate page, one mega
customer block, one part shipped by thousands of suppliers — goes
quadratic on ONE executor at 100 TB while every other task finishes in
seconds. The defense is identical everywhere: count rows per key with one
map-side-combined aggregate ON THE SAME KEY the join shuffles on (the
exchange is shared, not doubled), then apply the mode dial:

* ``"drop"`` — drop-with-log: oversized groups are excluded BEFORE the
  join and observable via :func:`oversized_groups`. Output is
  cap-DEPENDENT; the production default where hot keys are noise.
* ``"error"`` — exact-or-fail: an ``assert_true`` rides the size
  aggregate and raises AT EXECUTION TIME if any group exceeds the cap,
  so whenever the query succeeds its output is bit-identical to the
  uncapped semantics. This is the contract every oracle-hash-checked
  registered query uses (the ``dedup_minhash_verified`` precedent): a
  future fixture or real corpus with an organic mega-group fails LOUDLY
  instead of silently diverging from the uncapped oracle.
* ``"split"`` — recall-bounded availability: an oversized group is
  sub-partitioned into ``ceil(size / cap)`` sub-groups by a secondary
  hash SALTED on caller-chosen columns, and the downstream equi-join
  pairs only within a sub-group — per-task expansion stays ~cap² no
  matter how hot the key. Salting on the group key makes independent
  passes (LSH bands, multi-pass blocking) sub-partition independently,
  so their union recovers recall 1-(1-1/n_sub)^passes. NOT for
  hash-checked callers: output depends on the sub-partitioning hash.

History (why ONE function): this cap was re-implemented per-family three
times — ``lsh_band_pairs`` (round 4), ``_cap_blocks`` in entity.py
(round 8), ``basket_items`` in mining.py (round 9) — and FORGOTTEN once
(``graph_bipartite_projection`` round 9 documented the cap without
implementing it; VERDICT r9 finding #1). Factoring the
count→validate→drop|error|split logic here makes the
documented-but-absent class structurally impossible.

CHECKLIST for any new operator whose plan contains a per-key self-join
or per-key explode (pair/triple generation, co-occurrence, projection):

1. route the keyed input through :func:`capped_group` — never write the
   size-count/filter inline;
2. expose ``max_*`` and ``on_oversized`` in the operator's signature,
   defaulting the registered (oracle-hash-checked) query to ``"error"``
   with a cap chosen above every organic fixture group;
3. register/point an observer at :func:`oversized_groups` for the
   drop-with-log half;
4. add a synthetic mega-group pytest: drop excludes, error raises,
   split bounds, ≤cap groups unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The full mode contract. Callers may restrict (e.g. mining allows only
#: drop|error because basket semantics make split recall-meaningless).
CAP_MODES = ("drop", "error", "split")


def validate_mode(
    on_oversized: str, allowed: Sequence[str] = CAP_MODES
) -> None:
    """Validate the mode string — ALWAYS, even when the cap itself is
    disabled (``max_group_size=None``), so a typo'd mode is a loud
    ValueError rather than a latent no-op (ADVICE r8 contract)."""
    if on_oversized not in allowed:
        raise ValueError(
            f"on_oversized must be {'|'.join(allowed)}, got {on_oversized!r}"
        )


def group_sizes(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One map-side-combined count per group key → (key_cols..., __gsz).
    This aggregate shuffles on the SAME key as the downstream join, so
    AQE/Catalyst reuse the exchange — the cap costs no extra shuffle."""
    return df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__gsz"))


def admitted_keys(
    sized: DataFrame,
    key_cols: Sequence[str],
    cap: int | Column,
    on_oversized: str,
    cap_name: str,
    label: str,
) -> DataFrame:
    """Admitted-key frame from a pre-sized (key_cols..., __gsz[, cap
    cols]) frame: ``drop`` filters, ``error`` raises at execution time
    via ``assert_true`` riding the aggregate (filtering on ``isNull``
    keeps every admitted row while forcing the check into the plan — a
    selected-then-dropped column would be pruned by Catalyst). ``cap``
    may be a Column for dynamic caps (the df-frac-of-corpus case)."""
    cap_col = cap if isinstance(cap, Column) else F.lit(cap)
    if on_oversized == "error":
        return sized.filter(
            F.assert_true(
                F.col("__gsz") <= cap_col,
                F.concat(
                    F.lit(f"{label} exceeds {cap_name}="),
                    cap_col.cast("string"),
                    F.lit(": key="),
                    F.concat_ws(
                        "/", *[F.col(k).cast("string") for k in key_cols]
                    ),
                    F.lit(" size="),
                    F.col("__gsz").cast("string"),
                ),
            ).isNull()
        ).select(*key_cols)
    return sized.filter(F.col("__gsz") <= cap_col).select(*key_cols)


def capped_group(
    df: DataFrame,
    key_cols: Sequence[str],
    max_group_size: int | None,
    on_oversized: str,
    *,
    split_salt_cols: Sequence[str] | None = None,
    min_group_size: int = 1,
    cap_name: str = "max_group_size",
    label: str = "group",
    allowed_modes: Sequence[str] = CAP_MODES,
) -> tuple[DataFrame, list[str]]:
    """Apply the engine's standard per-key size cap to ``df`` and return
    ``(capped_df, effective_key_cols)`` — in ``split`` mode the key list
    grows a ``__cap_sub`` column the caller MUST include in its join
    keys (that inclusion is what bounds the per-task expansion).

    ``min_group_size`` (usually 2 for pair generators: a singleton group
    cannot form a pair) prunes small groups inside the same aggregate.
    ``split_salt_cols`` are hashed (``xxhash64``) for sub-group
    assignment; include the group key (or a per-pass component like
    band_id) so independent passes sub-partition independently.
    ``max_group_size=None`` disables the cap entirely — the exact
    uncapped semantics, with the mode still validated."""
    validate_mode(on_oversized, allowed_modes)
    key_cols = list(key_cols)
    if max_group_size is None:
        return df, key_cols
    sized = group_sizes(df, key_cols)
    if min_group_size > 1:
        sized = sized.filter(F.col("__gsz") >= min_group_size)
    if on_oversized == "split":
        if not split_salt_cols:
            raise ValueError("split mode requires split_salt_cols")
        subbed = sized.withColumn(
            "__nsub",
            F.when(
                F.col("__gsz") > max_group_size,
                F.ceil(F.col("__gsz") / F.lit(max_group_size)).cast("int"),
            ).otherwise(F.lit(1)),
        ).select(*key_cols, "__nsub")
        out = (
            df.join(subbed, key_cols)
            .withColumn(
                "__cap_sub",
                F.pmod(
                    F.xxhash64(*split_salt_cols), F.col("__nsub")
                ).cast("int"),
            )
            .drop("__nsub")
        )
        return out, key_cols + ["__cap_sub"]
    admitted = admitted_keys(
        sized, key_cols, max_group_size, on_oversized, cap_name, label
    )
    return df.join(admitted, key_cols), key_cols


def oversized_groups(
    df: DataFrame, key_cols: Sequence[str], max_group_size: int
) -> DataFrame:
    """(key_cols..., group_size) for groups the cap would drop — the
    monitoring half of drop-with-log. Every family observer
    (``lsh_oversized_buckets``, ``er_oversized_blocks``,
    ``oversized_baskets``, ``graph_oversized_parts``) delegates here."""
    return (
        group_sizes(df, key_cols)
        .filter(F.col("__gsz") > max_group_size)
        .select(*key_cols, F.col("__gsz").alias("group_size"))
    )
