"""TPC-H-shaped integration queries (SURVEY.md §2 — integration breadth).

The reference's whole query surface is "SQL over Avro/Parquet tables"
(SURVEY.md §0 step 4); Q1/Q3/Q5 shapes already anchor groups D and C. This
module widens the integration surface with the remaining classic TPC-H
query shapes, completing all 22: Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q22
run with their official predicates; queries whose official columns the
synthetic schema lacks (no ``partsupp`` table, no
``l_shipmode/l_commitdate/l_receiptdate`` columns) appear as
``tpch_q{2,4,9,11,12,16,19,20,21}_shape`` — the affected predicate or
cost columns are swapped for ones the schema has (e.g. ps_supplycost →
observed min unit price; receipt-after-commit → shipped-N-days-late), and
the distinctive PLAN SHAPE of each official query is preserved
(correlated-MIN scalar subquery, EXISTS-then-aggregate, HAVING vs global
scalar, nested-IN + correlated threshold, disjunctive OR-of-ANDs pushdown,
multi-EXISTS self-join, NOT-IN + COUNT DISTINCT). Q1/Q3/Q5 anchor groups
D and C as ``agg_scan_group`` / the bench's q3 / ``join_multiway_q5``.

Date literals are adapted to the synthetic data's 1995–2001 range
(FIXTURES.md). Every revenue SUM uses the exact-decimal ``dsum`` pattern
(operators/aggregates.py) so hash checks are order-independent; ratios and
thresholds divide *identical doubles* on both engines, which keeps the
comparison deterministic without further rounding.

Scale notes (100 TB): all fact⋈fact joins are key-partitioned shuffles that
AQE re-plans (skew split / SMJ→BHJ); every dim side is an explicit
``broadcast``; scalar-subquery thresholds are one-row broadcasts, not
driver round-trips; HAVING pushes through partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.operators.aggregates import dsum, dsum_sql
from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


def _rev():
    """Per-line revenue expression (built lazily — Column construction
    needs an active SparkContext, which doesn't exist at import time)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def rev_sql(alias: str = "") -> str:
    """SQL twin of :func:`_rev`; ``alias`` prefixes both column refs
    (e.g. ``'l.'``) so multi-table oracles share one source of truth."""
    return f"{alias}l_extendedprice * (1 - {alias}l_discount)"


REV_SQL = rev_sql()


@register(
    "tpch_q6",
    oracle=f"""
    SELECT {dsum_sql("l_extendedprice * l_discount", 8, 2)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — forecasting revenue change: pure scan-aggregate whose three
    predicates must ALL reach the Parquet reader (the canonical
    filter-pushdown benchmark; row-group stats skip most of the table when
    sorted by ship date). No shuffle beyond the final 1-row combine."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 8, round_to=2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           {dsum_sql(rev_sql('l.'), 8, 2)} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_nationkey = 5 AND n2.n_nationkey = 10)
        OR (n1.n_nationkey = 10 AND n2.n_nationkey = 5))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 — volume shipping between two nations, by year. Two fact⋈fact
    shuffle joins; supplier/customer/nation are broadcast. The nation-pair
    predicate lands after the nation joins, so Catalyst pushes each
    nationkey IN (5,10) bound onto the supplier/customer scans."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("n1_key") == 5) & (F.col("n2_key") == 10) | (
        (F.col("n1_key") == 10) & (F.col("n2_key") == 5)
    )
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), 8, round_to=2).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {dsum_sql(f"CASE WHEN n2.n_name = 'NATION_5' THEN {rev_sql('l.')} ELSE 0 END", 8, 2)}
             / {dsum_sql(rev_sql('l.'), 8, 2)} AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    GROUP BY EXTRACT(YEAR FROM o.o_orderdate)
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — national market share: a supplier nation's share of ECONOMY-part
    revenue sold into ASIA customers, per year. Seven-table join; the share
    is a ratio of two exact-decimal sums computed in ONE aggregation pass
    (conditional aggregation, no self-join), then divided as identical
    doubles on both engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_name")
    )
    nation_rev = F.when(F.col("supp_name") == "NATION_5", _rev()).otherwise(F.lit(0))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n_regionkey"))
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(nation_rev, 8, round_to=2) / dsum(_rev(), 8, round_to=2)
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql(rev_sql('l.'), 8, 2)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — returned-item reporting: top-20 customers by revenue lost to
    returns in a half-year window. Shuffle join orders⋈lineitem keyed on
    orderkey, broadcast nation; final top-k is TakeOrderedAndProject (no
    global sort materialization). Deterministic tiebreak on the PK."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), 8, round_to=2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — customer order-count distribution. The join predicate lives in
    the LEFT JOIN's ON clause (filtering orders, never dropping customers);
    COUNT over the nullable key counts matches only. Two aggregations: the
    second groups on the first's output, reusing its shuffle partitioning
    where AQE allows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14",
    oracle=f"""
    SELECT 100.0 * {dsum_sql(f"CASE WHEN p.p_type = 'PROMO' THEN {rev_sql('l.')} ELSE 0 END", 8, 2)}
                 / {dsum_sql(rev_sql('l.'), 8, 2)} AS promo_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 — promotion effect: PROMO parts' share of one month's revenue.
    Broadcast part join; the ratio's numerator and denominator come from
    one conditional-aggregation pass and divide as identical doubles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(promo_rev, 8, round_to=2)
                / dsum(_rev(), 8, round_to=2)
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql(REV_SQL, 8, 2)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — top supplier by quarterly revenue (scalar-subquery max).
    Catalyst does NOT dedupe a shared aggregate subtree, so without
    materialization the lineitem scan+shuffle+agg would run twice (once
    under max, once for the filter); ``localCheckpoint`` pins the
    supplier-cardinality aggregate (small at any scale) so both consumers
    reuse it. Equality on the exact-decimal-derived double is safe
    cross-engine. The 1-row max side is broadcast."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev(), 8, round_to=2).alias("total_revenue"))
        .localCheckpoint(eager=True)
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(revenue), revenue.supplier_no == s.s_suppkey)
        .join(F.broadcast(best), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17",
    oracle=f"""
    SELECT {dsum_sql("l.l_extendedprice", 4, 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
                      / COUNT(*)) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_threshold
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — small-quantity-order revenue: lines under 20% of their part's
    average quantity, for one brand. The correlated AVG subquery becomes a
    per-part aggregate joined back (the decorrelation Catalyst would apply
    to the SQL form); the threshold is the same exact-decimal-sum / count
    double on both engines, so the < comparison is stable."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2) * (dsum("l_quantity", 4) / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(thresholds, F.col("t_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice", 4, round_to=2) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,4))) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — large-volume customers: orders whose total quantity exceeds a
    threshold, with their customers. The IN-subquery is a semi-join against
    a HAVING aggregate (map-side partial sums make the first pass cheap);
    the outer aggregation then re-sums per order. Top-k with PK tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(big.withColumnRenamed("l_orderkey", "big_key"), F.col("big_key") == o.o_orderkey, "left_semi")
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", 4).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q22",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)
    ),
    thr AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / COUNT(*)
               AS avg_bal
        FROM pool WHERE c_acctbal > 0.0
    )
    SELECT p.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(p.c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS totacctbal
    FROM pool p, thr
    WHERE p.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY p.c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 — global sales opportunity: rich-but-inactive customers (account
    balance above the positive-balance average of selected nations, no
    recent orders — the synthetic data is dense enough that every customer
    has SOME order, so "inactive" means no order since 1999), counted per
    nation. Uncorrelated scalar threshold as a 1-row broadcast cross join;
    NOT EXISTS as a left-anti join on the orders key."""
    pool = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    thr = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", 4) / F.count(F.lit(1))).alias("avg_bal")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, o.o_custkey == pool.c_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 4).alias("totacctbal"),
        )
    )


@register(
    "tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — order-priority checking: orders in one quarter with at
    least one slow line, counted per priority. Official Q4's correlated
    EXISTS compares l_commitdate < l_receiptdate (columns the synthetic
    schema lacks); the adapted predicate "shipped >60 days after order"
    keeps the exact plan shape: correlated EXISTS decorrelated to a
    left-semi join on the order key, then aggregate. The semi-join's
    correlated non-equi condition rides the equi-join (sort-merge/shuffle
    on l_orderkey, the non-equi part evaluated post-match), so at 100 TB
    this is one key-partitioned shuffle, never a nested loop."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            # timestamp + interval (NOT date_add, which truncates to date and
            # would diverge from the oracle on non-midnight timestamps)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q19_shape",
    oracle=f"""
    SELECT {dsum_sql(rev_sql('l.'), 8, 2)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — discounted revenue, disjunctive predicates: three
    brand/size/quantity bands OR-ed together across the join (official Q19
    uses p_container and l_shipmode, absent here; bands preserved). The
    planner splits the disjunction: common conjuncts per side are extracted
    and pushed below the join (Catalyst's CNF conversion derives
    ``p_brand IN (...)`` on the part scan and a quantity range on the
    lineitem scan), so the broadcast-hash join sees pre-filtered inputs
    instead of evaluating the full OR on the cross of both tables."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(band).agg(
        dsum(_rev(), 8, round_to=2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q21_shape",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — suppliers who kept orders waiting: the ONLY supplier on a
    finished multi-supplier order whose line shipped late (official Q21's
    "late" is l_receiptdate > l_commitdate; adapted to >90 days after the
    order date). Both correlated EXISTS / NOT EXISTS self-joins on lineitem
    collapse into ONE per-order aggregate pass — count distinct suppliers
    and distinct LATE suppliers per order, then filter — replacing two
    O(lines²) semi/anti self-joins with a single key-partitioned shuffle
    that stays linear at 100 TB. Top-k with name tiebreak."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load(spark, sf_dir, "supplier")
    lines = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_order = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        # the oracle's COUNT(*) is over l1 LINES, so a supplier with several
        # late lines on one order counts once per line — carry the count
        F.sum(F.col("is_late").cast("int")).alias("n_late_lines"),
    )
    order_stats = per_order.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late_supps"),
    )
    # the waiting supplier: late itself, ≥2 suppliers on the order, and the
    # only late one
    culprit = (
        per_order.filter(F.col("supp_late"))
        .join(
            order_stats,
            (F.col("ok") == F.col("l_orderkey"))
            & (F.col("n_supps") >= 2)
            & (F.col("n_late_supps") == 1),
        )
        .select("l_suppkey", "n_late_lines")
    )
    return (
        culprit.join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "tpch_q2_shape",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           c.supplycost
    FROM cost c
    JOIN part p     ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size BETWEEN 10 AND 20
      AND p.p_type = 'STANDARD'
      AND r.r_name = 'EUROPE'
      AND c.supplycost = (
          SELECT MIN(c2.supplycost) FROM cost c2
          JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE c2.l_partkey = c.l_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — minimum-cost supplier: for each qualifying part, the
    region's cheapest supplier(s). Official Q2's ps_supplycost lives in the
    absent partsupp table; the adapted supply cost is the observed minimum
    unit price (l_extendedprice / l_quantity) each supplier charged for the
    part — same correlated-MIN-scalar-subquery shape. The correlation is
    decorrelated into a per-part window MIN over the already-partitioned
    cost aggregate (exactly what Catalyst does to the SQL form), so the
    plan is: one (partkey, suppkey) shuffle agg → one partkey-partitioned
    window → broadcast dim joins. MIN over doubles is exact (no
    accumulation), so the equality filter is deterministic cross-engine;
    the ORDER BY carries (p_partkey, s_name) which is unique per row, so
    LIMIT 100 is a total order — no tie ambiguity at the cutoff."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # suppliers in scope (region-restricted), broadcast everywhere below
    s_eu = (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
        .join(F.broadcast(s_eu), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), p.p_partkey == best.l_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_shape",
    oracle=f"""
    SELECT n.n_name AS nation,
           EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity", 8, 2)} AS sum_profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
    """,
)
def tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — product-type profit by nation and year. Official Q9's
    cost term is ps_supplycost (absent partsupp); adapted to a 60%-of-list
    cost (0.6 * p_retailprice), preserving the shape: part-name LIKE
    filter, two fact⋈fact shuffle joins + three broadcast dims, and an
    expression aggregate combining columns from three tables. The LIKE
    filter lands on the part scan, and the broadcast part join then prunes
    most of lineitem BEFORE the orders shuffle join — filter-first join
    order Catalyst picks from the size estimates."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit, 8, round_to=2).alias("sum_profit"))
    )


@register(
    "tpch_q11_shape",
    oracle=f"""
    WITH scoped AS (
        SELECT l.l_partkey, l.l_extendedprice, l.l_quantity
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT l_partkey, {dsum_sql("l_extendedprice * l_quantity", 8, 2)} AS part_value
    FROM scoped
    GROUP BY l_partkey
    HAVING {dsum_sql("l_extendedprice * l_quantity", 8, 2)} > (
        SELECT 2.0 * {dsum_sql("l_extendedprice * l_quantity", 8, 2)}
                   / COUNT(DISTINCT l_partkey)
        FROM scoped
    )
    """,
)
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — important stock: parts whose traded value within one
    region exceeds 2× the region's average part value (official Q11's
    FRACTION scales with 1/SF; the mean-relative threshold is its
    SF-independent equivalent, selecting a stable tail at any scale).
    Official Q11 sums ps_supplycost * ps_availqty over partsupp; adapted to
    l_extendedprice * l_quantity over the region's line items — same
    group-agg + HAVING-vs-global-scalar-subquery shape. The global total is
    a 1-row aggregate broadcast into a nested-loop join (allow-listed: one
    row × grouped parts is bounded by the group count), NOT a driver
    round-trip, and both the per-part and total sums use the same
    exact-decimal pattern so the > comparison divides identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select("l_partkey", "l_extendedprice", "l_quantity")
        .localCheckpoint(eager=True)  # shared by per-part agg AND the total
    )
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = scoped.groupBy("l_partkey").agg(
        dsum(value, 8, round_to=2).alias("part_value")
    )
    total = scoped.agg(
        (
            F.lit(2.0)
            * dsum(value, 8, round_to=2)
            / F.count_distinct("l_partkey")
        ).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q12_shape",
    oracle="""
    SELECT l.l_returnflag AS flag_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape — shipping-priority audit: among one year's slow lines
    (shipped >30 days after ordering — official Q12's receipt/commit
    ordering on columns the schema lacks) in two flag classes (standing in
    for l_shipmode IN ('MAIL','SHIP')), count urgent vs non-urgent orders.
    One fact⋈fact shuffle join; both date bounds and the IN filter push to
    the lineitem scan; the conditional counts are a single pass of
    CASE-sums with map-side partial aggregation."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy(F.col("l_returnflag").alias("flag_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_shape",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (5, 10, 15, 20, 25, 30)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape — parts/supplier relationship: distinct supplier counts
    per (brand, type, size), excluding blacklisted suppliers. Official Q16
    reads partsupp and excludes complaint suppliers by comment LIKE;
    adapted to the suppliers observed shipping each part (lineitem) and a
    negative-balance blacklist — same NOT-IN-subquery + COUNT(DISTINCT)
    shape. s_suppkey is non-null so the NOT IN is a plain broadcast
    left-anti join (no null-aware penalty); the distinct count is
    two-level: partial distinct within partitions, exact combine after the
    group shuffle."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), bad.s_suppkey == li.l_suppkey, "left_anti")
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_shape",
    oracle="""
    WITH yr AS (
        SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    ),
    supp_part AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS supp_qty
        FROM yr GROUP BY 1, 2
    ),
    part_total AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS part_qty
        FROM yr GROUP BY 1
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
          SELECT sp.l_suppkey
          FROM supp_part sp
          JOIN part_total pt ON pt.l_partkey = sp.l_partkey
          WHERE sp.supp_qty > 0.3 * pt.part_qty
            AND sp.l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
            )
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — suppliers dominating a part's supply: one nation's
    suppliers who shipped >30% of a red part's annual volume. Official
    Q20's ps_availqty > half the year's shipments becomes supplier-share >
    30% of the part's year total — preserving the nested-IN + correlated
    scalar-threshold shape. The correlated half-sum decorrelates into a
    per-part aggregate joined back (partkey-partitioned shuffle reused by
    both aggregation levels — partial (part,supp) rollup feeds the part
    total without a second scan); both IN subqueries become semi joins
    (part filter broadcast, supplier set small). Both sides compute the
    exact-decimal quantity sums, so the 0.3 × comparison is stable."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    yr = li.join(F.broadcast(red), red.p_partkey == li.l_partkey).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    supp_part = yr.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity", 4).alias("supp_qty")
    )
    # part totals roll up from the (part, supp) partials — same shuffle key,
    # so AQE coalesces both aggregations onto one exchange
    part_total = supp_part.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.round(F.sum("supp_qty"), 4).alias("part_qty")
    )
    dominating = (
        supp_part.join(part_total, F.col("pt_partkey") == supp_part.l_partkey)
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(dominating, dominating.l_suppkey == s.s_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
