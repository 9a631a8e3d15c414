"""Group F — scalar function surface (SURVEY.md §2-F).

All JVM-side ``pyspark.sql.functions`` built-ins — these stay inside
WholeStageCodegen (no Python worker round-trip), which is the 100 TB rule:
scalar work must be free.

Cross-engine alignment notes (SURVEY.md §5):
  * transcendentals (ln/pow/sqrt) can differ in the last ulp between
    java.lang.Math and libm → rounded to 6 digits on both sides;
  * Spark ``dayofweek`` is 1=Sunday, DuckDB ``dayofweek`` is 0=Sunday →
    oracle adds 1;
  * JSON extracts are cast to INT on both sides (DuckDB returns JSON text);
  * arrays/structs are never emitted raw — fields are projected out and
    arrays string-joined, since client renderings differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from avro_parquet_spark_example_spark.registry import register
from avro_parquet_spark_example_spark.sources.catalog import load


@register(
    "fn_string",
    oracle="""
    SELECT doc_id,
           UPPER(SUBSTR(text, 1, 10)) AS head_upper,
           LOWER(source) AS src_lower,
           lang || ':' || source AS lang_src,
           TRIM('  ' || lang || ' ') AS lang_trim,
           LENGTH(text) AS text_len,
           REGEXP_EXTRACT(source, '([0-9]+)', 1) AS src_num,
           REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled
    FROM documents
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — substr/upper/lower/concat/trim/length/regexp extract+replace."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.lower("source").alias("src_lower"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_src"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.length("text").alias("text_len"),
        F.regexp_extract("source", "([0-9]+)", 1).alias("src_num"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAYOFWEEK(o_orderdate) + 1 AS dow,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — year/month/dayofweek/date_trunc/datediff/date_add/last_day.
    Spark datediff(end, start) == DuckDB datediff('day', start, end);
    Spark dayofweek (1=Sun) == DuckDB dayofweek (0=Sun) + 1."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("yr"),
        F.month(od).alias("mo"),
        F.dayofweek(od).alias("dow"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), od.cast("date")).alias(
            "days_to_end"
        ),
        F.date_add(od.cast("date"), 30).alias("due_date"),
        F.last_day(od.cast("date")).alias("month_end"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * 0.123456, 2) AS scaled,
           ABS(l_discount - 0.05) AS abs_diff,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS ceil_q,
           CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS floor_q,
           ROUND(LN(l_extendedprice), 6) AS ln_price,
           ROUND(POW(l_quantity, 1.5), 6) AS pow_q,
           ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_disc
    FROM lineitem
    WHERE l_orderkey % 12 = 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — round/abs/ceil/floor/ln/pow/sqrt/sign.

    The ``% 12`` predicate is a deterministic 1-in-12 sample (identical on
    both engines) that bounds the checker's materialized output to ~50k rows
    at sf0.1 — the function surface under test is unchanged."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 12 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.123456, 2).alias("scaled"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7.0).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7.0).alias("floor_q"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("pow_q"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_disc"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sum,
           ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm,
           LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — higher-order array functions (size/element_at/transform/filter/
    aggregate) over the 64-d embedding column; all evaluated JVM-side."""
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_array_setops",
    oracle="""
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           LEN(LIST_DISTINCT(LIST_CAT(a.toks, b.toks))) AS union_size,
           LEN(LIST_INTERSECT(a.toks, b.toks)) AS intersect_size,
           LEN(LIST_FILTER(LIST_DISTINCT(a.toks), t -> NOT LIST_CONTAINS(b.toks, t))) AS except_size
    FROM (SELECT doc_id, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS toks
          FROM documents WHERE doc_id < 20) a
    JOIN (SELECT doc_id, LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS toks
          FROM documents WHERE doc_id < 20) b
      ON a.doc_id < b.doc_id
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4c — array set algebra (union/intersect/except sizes) over token
    sets — the per-pair primitive under Jaccard-style similarity, all
    JVM-side."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
        )
    )
    a = d.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("ta"))
    b = d.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("tb"))
    return a.join(b, F.col("a_id") < F.col("b_id")).select(
        "a_id",
        "b_id",
        F.size(F.array_union("ta", "tb")).alias("union_size"),
        F.size(F.array_intersect("ta", "tb")).alias("intersect_size"),
        F.size(F.array_except("ta", "tb")).alias("except_size"),
    )


@register(
    "fn_explode",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
    FROM documents WHERE doc_id < 50
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4b — explode(split(text)): one row per token (generator, no shuffle)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "fn_map_struct",
    oracle="""
    SELECT c_custkey,
           STRUCT_PACK(seg := c_mktsegment, bal := c_acctbal).seg AS seg_field,
           STRUCT_PACK(seg := c_mktsegment, bal := c_acctbal).bal AS bal_field,
           ARRAY_TO_STRING(MAP_KEYS(MAP {'segment': c_mktsegment, 'name': c_name}), ',') AS mkeys,
           MAP {'segment': c_mktsegment, 'name': c_name}['segment'][1] AS seg_from_map
    FROM customer
    """,
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — struct/map construction and field/key access; fields projected
    back out to scalars (client struct renderings differ)."""
    c = load(spark, sf_dir, "customer")
    st = F.struct(
        F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal")
    )
    m = F.create_map(
        F.lit("segment"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        st.getField("seg").alias("seg_field"),
        st.getField("bal").alias("bal_field"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        m.getItem("segment").alias("seg_from_map"),
    )


@register(
    "fn_map_higher_order",
    oracle="""
    SELECT doc_id,
           'chars:' || CAST(n_chars * 2 AS VARCHAR) ||
           ',words:' || CAST(LEN(STRING_SPLIT(text, ' ')) * 2 AS VARCHAR)
             AS doubled_entries,
           'chars,words' AS key_list
    FROM documents WHERE doc_id < 100
    """,
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5b — map higher-order functions: build a metrics map per row,
    transform_values over it, then render entries deterministically (sorted,
    joined) since raw map renderings differ across clients. The oracle
    computes the same entries directly."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    metrics = F.create_map(
        F.lit("chars"), F.col("n_chars"),
        F.lit("words"), F.size(F.split("text", " ")).cast("long"),
    )
    doubled = F.transform_values(metrics, lambda k, v: v * 2)
    rendered = F.array_join(
        F.sort_array(
            F.transform(
                F.map_entries(doubled),
                lambda e: F.concat(e.key, F.lit(":"), e.value.cast("string")),
            )
        ),
        ",",
    )
    return d.select(
        "doc_id",
        rendered.alias("doubled_entries"),
        F.array_join(F.sort_array(F.map_keys(metrics)), ",").alias("key_list"),
    )


@register(
    "fn_regexp_extended",
    oracle=r"""
    SELECT doc_id,
           LEN(REGEXP_EXTRACT_ALL(text, 'data[a-z]*')) AS n_data_words,
           REGEXP_EXTRACT(text, '[a-z]+ing') AS first_ing,
           CASE WHEN REGEXP_MATCHES(text, '^[a-z]') THEN 1 ELSE 0 END AS starts_lower
    FROM documents WHERE doc_id < 200
    """,
)
def fn_regexp_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1b — extended regexp surface: match counting, first-match
    extraction, anchored boolean matching."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"data[a-z]*")).alias("n_data_words"),
        F.regexp_extract("text", r"([a-z]+ing)", 1).alias("first_ing"),
        F.when(F.col("text").rlike(r"^[a-z]"), 1).otherwise(0).alias("starts_lower"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS INT) AS k_val,
           CAST(JSON_EXTRACT(props, '$.k') AS INT) % 10 AS k_mod
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — JSON field extraction from the events.props column, cast to INT
    on both sides (DuckDB's json_extract returns JSON text)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 1024 AS with_flag,
           xor(event_id, user_id) AS id_xor,
           (event_id & 1023) << 2 AS shifted_left,
           event_id >> 3 AS shifted_right,
           CAST(bit_count(event_id) AS BIGINT) AS popcount
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3b — bitwise scalar functions (AND/OR/XOR masks, shifts, popcount):
    the flag-field and hash-manipulation toolkit (shard masks, bloom bit
    probes, simhash distances all reduce to these). PySpark Column ``&``/
    ``|`` are LOGICAL operators — bit math needs ``bitwiseAND``/
    ``bitwiseOR``/``bitwiseXOR`` and the shift/bit_count functions (the
    z-order interleave bug from round 1, now a registered demonstration).
    All JVM-codegen'd scalar maps: zero shuffle at any scale."""
    e = load(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(1024)).alias("with_flag"),
        eid.bitwiseXOR(F.col("user_id")).alias("id_xor"),
        F.shiftleft(eid.bitwiseAND(F.lit(1023)), 2).alias("shifted_left"),
        F.shiftright(eid, 3).alias("shifted_right"),
        F.bit_count(eid).cast("bigint").alias("popcount"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_long,
           (CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) IS NOT NULL) AS has_k,
           CAST(JSON_EXTRACT(props, '$.missing') AS VARCHAR) AS absent
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6b — the VARIANT semi-structured type (new in Spark 4):
    ``parse_json`` ingests the props JSON once into Variant's binary
    encoding, then ``variant_get``/``try_variant_get`` extract typed paths.
    Against repeated ``get_json_object`` calls (which re-parse the JSON
    text per extraction), Variant parses once and navigates a binary tree
    per path — the columnar-JSON answer for semi-structured event payloads
    at 100 TB, and shreddable to Parquet columns by the writer. Oracle maps
    each extraction to DuckDB JSON functions; the absent path checks
    missing-key null semantics on both engines."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "long")
    return ev.select(
        "event_id",
        k.alias("k_long"),
        k.isNotNull().alias("has_k"),
        F.try_variant_get(v, "$.missing", "string").alias("absent"),
    )


@register(
    "fn_collation",
    oracle="""
    SELECT LOWER(et) AS key, MIN(et) AS representative, COUNT(*) AS n
    FROM (
        SELECT CASE WHEN event_id % 2 = 0 THEN UPPER(event_type)
                    ELSE event_type END AS et
        FROM events
    ) GROUP BY LOWER(et)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1b — string collations (new in Spark 4): grouping under the
    UNICODE_CI collation treats case variants as equal WITHOUT rewriting
    every expression through lower() — the engine-level answer for
    case-insensitive joins/groups (plus locale-aware ordering lower() can't
    give). Case variance is injected (fixture strings are uniform), the
    group key is re-exposed as lower() and the representative as the
    binary-min raw string so the output is deterministic and
    engine-portable; for ASCII data UNICODE_CI equivalence == lower()
    equivalence, which is what the DuckDB oracle recomputes."""
    ev = load(spark, sf_dir, "events")
    et = F.when(F.col("event_id") % 2 == 0, F.upper("event_type")).otherwise(
        F.col("event_type")
    )
    return (
        ev.select(et.alias("et"))
        .groupBy(F.collate("et", "UNICODE_CI").alias("et_ci"))
        .agg(F.min("et").alias("representative"), F.count(F.lit(1)).alias("n"))
        .select(
            F.lower("et_ci").cast("string").alias("key"), "representative", "n"
        )
    )


@register(
    "fn_interval",
    oracle="""
    SELECT event_id,
           ts + INTERVAL '90 minutes' AS plus_90m,
           ts - INTERVAL '1 day' AS minus_1d,
           DATE_TRUNC('hour', ts) AS hour_bucket,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_bucket
    FROM events
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2b — interval arithmetic on event time: shift timestamps by
    day-time intervals and truncate to calendar buckets — the primitives
    under every windowing/retention/SLA computation. All four expressions
    are pure per-row arithmetic (codegen'd, no shuffle); values are
    microsecond-identical across engines because the ts column is
    normalized once at the catalog."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("minus_1d"),
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        F.date_trunc("day", "ts").alias("day_bucket"),
    )


@register(
    "fn_url",
    oracle="""
    SELECT doc_id,
           source AS host,
           CONCAT('/docs/', CAST(doc_id AS VARCHAR)) AS path,
           CONCAT('lang=', lang) AS query
    FROM documents
    WHERE source IS NOT NULL AND lang IS NOT NULL
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1c — URL parsing (``parse_url``): every web-corpus pipeline keys on
    host/path/query components (domain caps, dedup by canonical URL,
    robots filtering). URLs are constructed deterministically from document
    fields and parsed BACK with parse_url, so the oracle recomputes each
    component directly — verifying the extraction semantics without
    needing a URL parser in DuckDB. JVM-side regex, no Python.

    Both sides filter ``source``/``lang`` IS NOT NULL explicitly: Spark's
    ``concat`` null-propagates while DuckDB's ``CONCAT`` skips NULLs, so
    without the shared predicate a fixture with NULL source/lang would make
    the engines silently diverge rather than fail a precondition."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit("/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    )


@register(
    "fn_try_safe",
    oracle="""
    SELECT event_id,
           event_id / NULLIF(user_id % 5, -1) AS ratio,
           TRY_CAST(event_type AS INT) AS not_a_number,
           TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_int
    FROM events
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3b — ANSI-safe ``try_*`` functions: this engine runs with ANSI mode
    ON (Spark 4 default), where division by zero and bad casts are ERRORS;
    try_divide/try_cast return NULL instead — the production idiom for
    dirty data under strict semantics. DuckDB's `/` already yields NULL on
    zero divisors and TRY_CAST matches; user_id%5 hits zero on ~20% of
    rows, so the NULL path is genuinely exercised."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(F.col("event_id"), F.col("user_id") % 5).alias("ratio"),
        F.try_to_number(F.col("event_type"), F.lit("999")).cast("int").alias(
            "not_a_number"
        ),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
    )


@register(
    "fn_content_hash",
    oracle="""
    SELECT doc_id,
           MD5(text) AS h_md5,
           SHA256(text) AS h_sha256,
           SHA256(CAST(doc_id AS VARCHAR) || ':' || text) AS h_keyed,
           SUBSTR(SHA256(text), 1, 16) AS shard_key
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def fn_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1d — cryptographic content fingerprints (md5 / sha256): the
    provenance layer of a training-data pipeline — content-addressed
    dedup ids, dataset cards ("sha256 of every shard"), leak audits
    (compare against eval-set digests), and stable shard keys derived
    from hash prefixes. Keyed variant binds the id to the text so two
    identical texts under different ids stay distinguishable. Both
    engines must render identical lowercase hex for the check to pass —
    which is the point: a fingerprint that isn't bit-portable across
    engines is useless as provenance.

    Scale: pure per-row JVM-side hashing inside WholeStageCodegen — one
    scan, no shuffle, no Python."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.sha2(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")),
            256,
        ).alias("h_keyed"),
        F.substring(F.sha2("text", 256), 1, 16).alias("shard_key"),
    )


@register(
    "fn_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           TO_BASE64(CAST(SUBSTR(text, 1, 30) AS BLOB)) AS b64,
           (CAST(FROM_BASE64(TO_BASE64(CAST(SUBSTR(text, 1, 30) AS BLOB)))
                 AS VARCHAR) = SUBSTR(text, 1, 30)) AS roundtrip_ok,
           LENGTH(TO_BASE64(CAST(SUBSTR(text, 1, 30) AS BLOB))) AS b64_len
    FROM documents WHERE text IS NOT NULL
    """,
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1e — base64 transport encoding: binary payloads cross JSON/HTTP
    boundaries as base64 (webhook bodies, Avro-in-JSON, API blobs), and
    the encode must be byte-portable — RFC 4648 with padding, no line
    wrapping — or downstream systems see different ciphertext for the
    same bytes. Encode, decode, verify the round-trip, and emit the
    encoded length (⌈n/3⌉·4 with padding — the capacity-planning
    number). Spark's base64/unbase64 and DuckDB's to/from_base64 must
    render identical strings for the hash to pass, which is the
    portability claim itself. Pure per-row JVM ops, map-only."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    head = F.substring("text", 1, 30)
    b64 = F.base64(F.encode(head, "utf-8"))
    return d.select(
        "doc_id",
        b64.alias("b64"),
        (F.decode(F.unbase64(b64), "utf-8") == head).alias("roundtrip_ok"),
        F.length(b64).alias("b64_len"),
    )


@register(
    "fn_explode_outer",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           w -> strlen(w) >= 6 AND w LIKE 'v%') AS l
        FROM documents WHERE text IS NOT NULL
    )
    SELECT b.doc_id, u.s.p AS pos, u.s.w AS word
    FROM base b
    LEFT JOIN LATERAL (
        SELECT UNNEST(list_transform(range(1, len(b.l) + 1),
                                     i -> {'p': i, 'w': b.l[i]})) AS s
    ) u ON TRUE
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4b — OUTER generator semantics (``posexplode_outer``): exploding
    an empty (or NULL) array normally DELETES the parent row — silent row
    loss that corrupts any later per-document aggregate. The outer form
    keeps the row with NULL position/value, and this query pins exactly
    that contract: documents with no long v-words (~90% of the corpus)
    survive as a single NULL-word row (the DuckDB twin spells it LEFT JOIN LATERAL UNNEST —
    the relational meaning of an outer generator). Positions are
    1-aligned on both sides.

    Map-side generator, no shuffle; at 100 TB the outer-vs-inner choice
    is a correctness decision, not a cost one — which is why it's pinned
    here."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # ~90% of docs have NO ≥6-char v-word — the outer branch is the
    # common case, not a corner (a predicate every doc satisfies would
    # make the outer semantics vacuous)
    arr = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda w: (F.length(w) >= 6) & w.startswith("v"),
    )
    return d.select(
        "doc_id", F.posexplode_outer(arr).alias("pos0", "word")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "word",
    )
