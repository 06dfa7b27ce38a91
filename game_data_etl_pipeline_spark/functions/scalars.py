"""Scalar function surfaces: string, datetime, math, array/map, JSON
(SURVEY.md §2.A op_substr_truncate/op_str_replace_prefix/op_array_size
and §2.B op_scalar_* / op_array_map_fns / op_json_fns).

Everything here is a built-in pyspark.sql.functions expression —
JVM-side, inside whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register


@register(
    "op_scalar_string",
    tags=("scalar",),
    oracle="""
        SELECT c_custkey,
               UPPER(c_name)  AS name_upper,
               LOWER(c_mktsegment) AS segment_lower,
               LENGTH(c_name) AS name_len,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CONCAT(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS segment_tag,
               TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
               REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
               REPLACE(c_mktsegment, 'AUTO', 'CAR') AS segment_replaced
        FROM customer
    """,
)
def op_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: case, length, substring, concat, trim,
    regexp_extract, replace."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias("segment_tag"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_mktsegment"), F.lit("AUTO"), F.lit("CAR")).alias("segment_replaced"),
    )


@register(
    "op_substr_truncate",
    tags=("scalar", "reference-parity"),
    oracle="""
        SELECT doc_id,
               SUBSTRING(COALESCE(text, ''), 1, 100) AS text_truncated,
               LENGTH(SUBSTRING(COALESCE(text, ''), 1, 100)) AS truncated_len
        FROM documents
    """,
)
def op_substr_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-coalesced truncation — parity with the reference's
    ``(description or '')[:500]`` (reference etl/pipeline.py:155,173),
    at width 100 over documents.text."""
    docs = load_table(spark, sf_dir, "documents")
    truncated = F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 100)
    return docs.select("doc_id", truncated.alias("text_truncated"), F.length(truncated).alias("truncated_len"))


@register(
    "op_str_replace_prefix",
    tags=("scalar", "reference-parity"),
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               REGEXP_REPLACE(o_orderpriority, '^[0-9]+-', '') AS priority_name
        FROM orders
    """,
)
def op_str_replace_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum prefix strip — parity with the reference's
    ``category.replace('EEquippableCategory::','')``
    (reference etl/pipeline.py:185), as an anchored regexp_replace."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.regexp_replace("o_orderpriority", r"^[0-9]+-", "").alias("priority_name"),
    )


@register(
    "op_scalar_datetime",
    tags=("scalar",),
    oracle="""
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS INT)  AS order_year,
               CAST(MONTH(o_orderdate) AS INT) AS order_month,
               STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str,
               CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
               CAST(EPOCH(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders
    """,
)
def op_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface: year/month extraction, date_trunc, formatting,
    datediff, epoch seconds. Timestamps leave as strings/ints so the
    comparison is engine-neutral."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )


@register(
    "op_scalar_math",
    tags=("scalar",),
    oracle="""
        SELECT p_partkey,
               ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
               ROUND(LN(p_retailprice), 6) AS price_ln,
               ROUND(POW(p_size, 2), 2) AS size_sq,
               ABS(p_size - 25) AS size_dev,
               CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
               CAST(p_size % 7 AS INT) AS size_mod
        FROM part
    """,
)
def op_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: sqrt/ln/pow/abs/ceil/floor/mod."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2)), 2).alias("size_sq"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "op_array_map_fns",
    tags=("scalar", "array"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS terms FROM documents WHERE doc_id < 100
        )
        SELECT doc_id,
               CAST(len(terms) AS INT) AS n_terms,
               list_contains(terms, 'spark') AS has_spark,
               list_sort(terms)[1] AS first_term_sorted,
               terms[1] AS first_term,
               array_to_string(list_transform(terms[1:2], t -> UPPER(t)), ',') AS head_upper,
               CAST(len(list_filter(terms, t -> LENGTH(t) > 4)) AS INT) AS n_long_terms
        FROM toks
    """,
)
def op_array_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function surface: size, contains, sort,
    index, transform/filter lambdas — all codegen'd, no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    terms = F.split(F.col("text"), " ")
    return (
        docs.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(terms).alias("n_terms"),
            F.array_contains(terms, "spark").alias("has_spark"),
            F.sort_array(terms)[0].alias("first_term_sorted"),
            terms[0].alias("first_term"),
            # array_join scalarizes the transform() output: the driver's
            # canonicalizer lexsorts pandas cells and cannot hash raw
            # array columns (registry convention: no raw collection outputs).
            F.array_join(
                F.transform(F.slice(terms, 1, 2), lambda t: F.upper(t)), ","
            ).alias("head_upper"),
            F.size(F.filter(terms, lambda t: F.length(t) > 4)).alias("n_long_terms"),
        )
    )


@register(
    "op_json_fns",
    tags=("scalar", "json"),
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INT) AS k_value,
               CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS INT) > 50
    """,
)
def op_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (get_json_object + typed cast),
    with the extracted value used in filter and projection."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_id", k.alias("k_value"), (k % 10).alias("k_mod"))
        .filter(F.col("k_value") > 50)
    )


@register(
    "op_envelope_unwrap",
    tags=("json", "reference-parity"),
    oracle="""
        SELECT event_id, event_type, CAST(json_extract(j, '$.status') AS INT) AS status,
               CAST(json_extract(j, '$.payload.k') AS INT) AS payload_k
        FROM (
            SELECT event_id, event_type,
                   '{"status": 200, "payload": ' || props || '}' AS j
            FROM events WHERE event_id < 100
        )
        WHERE CAST(json_extract(j, '$.status') AS INT) = 200
    """,
)
def op_envelope_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """API envelope unwrap — parity with the reference's
    ``{status, data}`` handling (reference etl/pipeline.py:85-93):
    from_json with an envelope schema, filter status==200, project the
    payload. Envelope synthesized from events.props for the fixture."""
    events = load_table(spark, sf_dir, "events")
    enveloped = events.filter(F.col("event_id") < 100).select(
        "event_id",
        "event_type",
        F.concat(F.lit('{"status": 200, "payload": '), F.col("props"), F.lit("}")).alias("j"),
    )
    parsed = enveloped.select(
        "event_id",
        "event_type",
        F.from_json("j", "status INT, payload STRUCT<k: INT>").alias("env"),
    )
    return parsed.filter(F.col("env.status") == 200).select(
        "event_id",
        "event_type",
        F.col("env.status").alias("status"),
        F.col("env.payload.k").alias("payload_k"),
    )


@register(
    "op_scalar_decimal",
    tags=("scalar", "decimal"),
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS exact_base,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS exact_disc
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_scalar_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money arithmetic: DECIMAL(18,2) sums, bit-identical across
    engines and partitionings — no float summation-order noise, which
    is why every oracled float aggregate elsewhere needs ROUND and
    these need none (emitted as strings so the comparison sees the
    exact digits, not pandas' float64 re-approximation). The 100 TB ledger case: doubles drift, decimals
    don't."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    base = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return lineitem.groupBy("l_returnflag").agg(
        F.sum(base).cast("string").alias("exact_base"),
        F.sum(base * disc).cast("string").alias("exact_disc"),
    )


@register(
    "op_string_distance",
    tags=("scalar",),
    oracle="""
        SELECT p_partkey,
               p_brand,
               levenshtein(p_brand, 'Brand#13') AS brand_edit_dist,
               levenshtein(LOWER(p_type), 'promo') AS type_edit_dist
        FROM part
    """,
)
def op_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (Levenshtein) scalar — fuzzy matching primitive.

    JVM-side built-in, so it stays inside whole-stage codegen. For
    fuzzy JOINS at scale, pair it with a blocking key (prefix,
    soundex-like bucket) so the theta comparison only runs within
    blocks — never as a raw cross join.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_brand",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#13")).alias("brand_edit_dist"),
        F.levenshtein(F.lower("p_type"), F.lit("promo")).alias("type_edit_dist"),
    )


@register(
    "op_variant_shred",
    tags=("json", "scalar"),
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS min_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
        FROM events
        GROUP BY event_type
    """,
)
def op_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` ingests
    props into the binary Variant encoding once, ``variant_get``
    shreds typed fields out of it — the open-format answer to schema-
    on-read JSON at scale.

    Contrast with op_json_fns (get_json_object): that re-parses the
    JSON text per extraction; Variant parses ONCE into a binary tree
    and every ``variant_get`` is a cheap offset walk, the right trade
    when a 100 TB events table is queried on many paths. Values are
    pinned to the text-JSON oracle, proving the encoding round-trips.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "op_scalar_hash",
    tags=("scalar", "hash"),
    oracle="""
        SELECT doc_id,
               md5(text) AS text_md5,
               sha256(text) AS text_sha256,
               md5(CONCAT(lang, '|', source)) AS partition_key_md5
        FROM documents
        WHERE doc_id < 2000
    """,
)
def op_scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface: md5 / sha2-256 over document text.

    Content hashes are the backbone of the dedup + deterministic-
    sampling family (llmdata/dedup.py, llmdata/corpus.py): stable
    across engines and cluster shapes, unlike xxhash64, which is
    engine-specific and therefore deliberately kept OUT of any
    cross-engine contract (it appears only inside Spark-local
    operators such as SimHash bit sampling).
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 2000).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat_ws("|", "lang", "source")).alias("partition_key_md5"),
    )


@register(
    "op_scalar_bitwise",
    tags=("scalar",),
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS key_low_byte,
               o_orderkey | 1   AS key_odd,
               xor(o_orderkey, 21845) AS key_xor,
               o_orderkey << 2  AS key_shl,
               o_orderkey >> 3  AS key_shr,
               CAST(bit_count(o_orderkey) AS INT) AS key_popcount
        FROM orders
        WHERE o_orderkey < 4000
    """,
)
def op_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: AND/OR/XOR, shifts, popcount — all codegen'd
    integer ops. These are the primitives the engine's own bit-packed
    operators build on (SimHash sign-pack, z-order interleave)."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.filter(k < 4000).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("key_low_byte"),
        k.bitwiseOR(F.lit(1)).alias("key_odd"),
        k.bitwiseXOR(F.lit(21845)).alias("key_xor"),
        F.shiftleft(k, 2).alias("key_shl"),
        F.shiftright(k, 3).alias("key_shr"),
        F.bit_count(k).cast("int").alias("key_popcount"),
    )


@register(
    "op_scalar_conditional",
    tags=("scalar",),
    oracle="""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_bucket,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS balance_band,
               IF(c_nationkey < 12, 'west', 'east') AS hemisphere,
               GREATEST(c_acctbal, 0.0) AS balance_floor0,
               LEAST(CAST(c_nationkey AS INT), 10) AS nation_cap10
        FROM customer
    """,
)
def op_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional surface: nullif/coalesce, CASE WHEN ladder,
    if-expr, greatest/least. All stay inside whole-stage codegen;
    CASE branches short-circuit so no wasted evaluation at scale."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")).alias("segment_bucket"),
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("high").alias("balance_band"),
        F.when(F.col("c_nationkey") < 12, "west").otherwise("east").alias("hemisphere"),
        F.greatest(bal, F.lit(0.0)).alias("balance_floor0"),
        F.least(F.col("c_nationkey").cast("int"), F.lit(10)).alias("nation_cap10"),
    )


@register(
    "op_scalar_url",
    tags=("scalar", "text"),
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   CONCAT('https://', source, '.example.com/', lang, '/doc/',
                          CAST(doc_id AS VARCHAR), '?chars=', CAST(n_chars AS VARCHAR)) AS url
            FROM documents WHERE doc_id < 1000
        )
        SELECT doc_id,
               regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, 'chars=([0-9]+)', 1) AS chars_param,
               regexp_extract(url, '^([a-z]+)://', 1) AS protocol
        FROM urls
    """,
)
def op_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing: host/path/query-param extraction via parse_url —
    the per-domain triage primitive of web-corpus pipelines (domain
    allowlists, per-host dedup scopes, crawl-source attribution).
    JVM-side parse_url beats regexp for real URLs (handles ports,
    userinfo, fragments); the oracle uses regexps because DuckDB has
    no parse_url, which also pins parse_url's semantics to the
    documented grammar on this fixture's synthetic URLs."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"), F.col("lang"),
        F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?chars="), F.col("n_chars").cast("string"),
    )
    return (
        docs.filter(F.col("doc_id") < 1000)
        .withColumn("url", url)
        .select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("chars")).alias("chars_param"),
            F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        )
    )


@register(
    "op_scalar_interval",
    tags=("scalar",),
    oracle="""
        SELECT o_orderkey,
               STRFTIME(CAST(date_add(o_orderdate, INTERVAL 3 MONTH) AS DATE), '%Y-%m-%d') AS due_quarter,
               STRFTIME(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_30d,
               STRFTIME(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), last_day(CAST(o_orderdate AS DATE))) AS INT) AS days_left_in_month,
               CAST(quarter(o_orderdate) AS INT) AS order_quarter,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS order_dow
        FROM orders
        WHERE o_orderkey < 4000
    """,
)
def op_scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: add_months (month-end clamped,
    e.g. Jan 31 + 1 month = Feb 29), fixed-day offsets, last_day,
    remaining-days, quarter, day-of-week. SLA/retention logic —
    "delete 90 days after month end", "due next quarter" — compiles
    to these; all codegen'd date math on the INT32 date type, no
    timezone traps because DATE is timezone-free.

    The oracle pins the subtle cross-engine seams: DuckDB's
    date_add(DATE, INTERVAL) returns TIMESTAMP (cast back), and its
    dayofweek is 0-indexed from Sunday while Spark's is 1-indexed
    (offset spelled in SQL so both engines' semantics are explicit).
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.filter(F.col("o_orderkey") < 4000).select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("due_quarter"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_30d"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.last_day(d), d).alias("days_left_in_month"),
        F.quarter(d).alias("order_quarter"),
        F.dayofweek(d).alias("order_dow"),
    )


@register(
    "op_map_fns",
    tags=("scalar", "map"),
    oracle="""
        WITH per_type AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events WHERE user_id < 40
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               CAST(COUNT(*) AS INT) AS n_types,
               array_to_string(list_sort(list(event_type)), ',') AS types_csv,
               CAST(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS purchase_count,
               CAST(MAX(n) AS BIGINT) AS max_type_count
        FROM per_type
        GROUP BY user_id
    """,
)
def op_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user event-type histogram built as a real
    map column (map_from_entries over collected structs), then
    consumed with map_keys / element_at / map_values + higher-order
    array ops. The oracle computes identical values without a map
    type (DuckDB's MAP literals aren't hash-comparable), which also
    demonstrates the map column is information-preserving. DuckDB's
    array_to_string maps [] to NULL (unlike Spark's concat_ws → ''),
    hence the COALESCEs in this family's oracles.

    Scale notes: the map stays bounded by the event-type vocabulary
    (5 keys), so per-user state is O(1) — the safe MapType pattern.
    Unbounded-key maps (e.g. per-URL counters) belong in long format,
    not a map column.
    """
    events = load_table(spark, sf_dir, "events")
    per_type = (
        events.filter(F.col("user_id") < 40)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("hist")
    )
    return mapped.select(
        "user_id",
        F.size(F.map_keys("hist")).alias("n_types"),
        F.concat_ws(",", F.sort_array(F.map_keys("hist"))).alias("types_csv"),
        F.coalesce(F.element_at("hist", "purchase"), F.lit(0).cast("bigint")).alias("purchase_count"),
        F.array_max(F.map_values("hist")).cast("bigint").alias("max_type_count"),
    )


@register(
    "op_scalar_try",
    tags=("scalar", "quality"),
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                        ELSE CONCAT('id-', CAST(doc_id AS VARCHAR)) END AS id_text,
                   CASE WHEN doc_id % 4 = 0 THEN 0 ELSE doc_id % 7 END AS denom
            FROM documents WHERE doc_id < 1000
        )
        SELECT doc_id,
               TRY_CAST(id_text AS BIGINT) AS id_parsed,
               CASE WHEN denom = 0 THEN NULL
                    ELSE ROUND(CAST(doc_id AS DOUBLE) / denom, 6) END AS safe_ratio,
               TRY_CAST(id_text AS BIGINT) IS NULL AS is_malformed
        FROM raw
    """,
)
def op_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant expression surface: try_cast turns malformed
    input into NULL instead of a task failure; try_divide absorbs
    division by zero. On a 100 TB ingest one bad cell must never
    kill a 10-hour job — parse defensively, emit an is_malformed
    flag, and quarantine flagged rows for audit (the same
    verdict-not-silent-drop policy as op_quality_filter).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    raw = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .otherwise(F.concat(F.lit("id-"), F.col("doc_id").cast("string")))
        .alias("id_text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(0)).otherwise(F.col("doc_id") % 7).alias("denom"),
    )
    parsed = F.try_to_number("id_text", F.lit("999999999999")).cast("bigint")
    return raw.select(
        "doc_id",
        parsed.alias("id_parsed"),
        F.round(F.try_divide(F.col("doc_id").cast("double"), F.col("denom")), 6).alias("safe_ratio"),
        parsed.isNull().alias("is_malformed"),
    )


@register(
    "op_array_setops",
    tags=("scalar", "array"),
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS terms
            FROM documents WHERE doc_id < 200
        ), kw AS (
            SELECT ['spark', 'table', 'join', 'quasar'] AS keywords
        )
        SELECT doc_id,
               COALESCE(array_to_string(list_sort(list_intersect(terms, keywords)), ','), '') AS hit_terms,
               CAST(len(list_distinct(list_concat(terms, keywords))) AS INT) AS union_size,
               CAST(len(list_filter(terms, t -> NOT list_contains(keywords, t))) AS INT) AS miss_size,
               CAST(len(terms) AS INT) > CAST(len(list_filter(terms, t -> NOT list_contains(keywords, t))) AS INT) AS any_hit
        FROM toks, kw
    """,
)
def op_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: intersect / union / except / membership
    between a document's distinct term set and a keyword list —
    the allowlist/blocklist primitive of corpus filtering, entirely
    JVM-side (no explode, no shuffle; one narrow pass).

    Cross-engine seams pinned here: DuckDB's list_intersect /
    list_distinct return in ARBITRARY order (Spark's keep first-array
    order), so every array output is sorted and csv-joined — which is
    also the driver-canonicalizer-safe shape (array cells are
    unhashable in a pandas lexsort; strings are not).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    kw = F.array(*[F.lit(k) for k in ("spark", "table", "join", "quasar")])
    terms = F.array_distinct(F.split(F.col("text"), " "))
    miss = F.array_except(terms, kw)
    return docs.select(
        "doc_id",
        F.concat_ws(",", F.sort_array(F.array_intersect(terms, kw))).alias("hit_terms"),
        F.size(F.array_distinct(F.array_union(terms, kw))).alias("union_size"),
        F.size(miss).alias("miss_size"),
        (F.size(terms) > F.size(miss)).alias("any_hit"),
    )


@register(
    "op_scalar_struct",
    tags=("scalar", "struct"),
    oracle="""
        SELECT o_orderkey,
               o_orderpriority AS priority,
               CAST(FLOOR(o_totalprice / 50000) AS INT) AS price_bucket,
               ROUND(o_totalprice, 2) AS price,
               (o_totalprice, o_orderkey) > (100000.0, CAST(0 AS BIGINT)) AS above_mark
        FROM orders
        WHERE o_orderkey < 3000
    """,
)
def op_scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: build a struct, extend it with withField,
    nest it, read fields back with dotted access, and compare structs
    lexicographically (field-order comparison — the typed composite
    key primitive under max_by/min_by and multi-column ordering).

    The struct round-trips through construction -> withField ->
    nesting -> field extraction with no information loss; the oracle
    computes the same scalars directly, proving the struct plumbing
    is transparent. Output stays flat (the driver canonicalizer
    hashes scalar cells), same discipline as the array ops' csv-join.
    Structs are Tungsten-columnar all the way — a nested field access
    is a pointer offset, not a deserialization, and parquet pushes
    nested-field pruning (ReadSchema shows the pruned subtree).
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    base = F.struct(
        F.col("o_orderpriority").alias("priority"), F.col("o_totalprice").alias("price")
    )
    enriched = base.withField("bucket", F.floor(F.col("o_totalprice") / 50000).cast("int"))
    nested = orders.select(
        "o_orderkey",
        F.struct(F.col("o_orderkey").alias("key"), enriched.alias("ord")).alias("n"),
        F.struct(F.col("o_totalprice"), F.col("o_orderkey")).alias("mark_key"),
    )
    return nested.select(
        "o_orderkey",
        F.col("n.ord.priority").alias("priority"),
        F.col("n.ord.bucket").alias("price_bucket"),
        F.round(F.col("n.ord.price"), 2).alias("price"),
        (
            F.col("mark_key")
            > F.struct(F.lit(100000.0).alias("o_totalprice"), F.lit(0).cast("bigint").alias("o_orderkey"))
        ).alias("above_mark"),
    )


@register(
    "op_scalar_binary",
    tags=("scalar", "binary"),
    oracle="""
        SELECT p_partkey,
               base64(CAST(p_name AS BLOB)) AS name_b64,
               hex(CAST(p_name AS BLOB)) AS name_hex,
               CAST(octet_length(CAST(p_name AS BLOB)) AS INT) AS n_bytes,
               CAST(from_base64(base64(CAST(p_name AS BLOB))) AS VARCHAR) = p_name AS roundtrip_ok
        FROM part WHERE p_partkey < 500
    """,
)
def op_scalar_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType scalar surface: string<->bytes cast, base64 and hex
    encodings, octet length, and an asserted encode->decode round
    trip. This is the boundary layer under the multimodal columns
    (llmdata/multimodal.py stores payloads as BinaryType) and under
    any wire format that ships bytes in JSON — all JVM-side codegen,
    no UDFs.

    DuckDB seam pinned by the oracle: Spark's hex() uppercases and
    DuckDB's hex() matches; base64 padding is RFC-identical in both.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    as_bytes = F.col("p_name").cast("binary")
    return part.select(
        "p_partkey",
        F.base64(as_bytes).alias("name_b64"),
        F.hex(as_bytes).alias("name_hex"),
        F.octet_length(as_bytes).alias("n_bytes"),
        (F.unbase64(F.base64(as_bytes)).cast("string") == F.col("p_name")).alias("roundtrip_ok"),
    )


@register(
    "op_scalar_regexp",
    tags=("scalar", "string"),
    oracle="""
        SELECT p_partkey,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               regexp_extract(p_name, '(\\w+)$', 1) AS last_word,
               CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
               regexp_matches(p_name, '(ring|bolt)$') AS is_fastener,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        FROM part WHERE p_partkey < 500
    """,
)
def op_scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar surface: anchored group extraction, global match
    counting, boolean rlike, global replacement — the workhorse
    functions of log parsing and corpus scrubbing (op_text_redact is
    this surface applied to PII patterns). All JVM-side codegen;
    regexp_count/regexp_extract compile the pattern once per task,
    not per row.

    Oracle seam: DuckDB regexp_replace needs the explicit 'g' flag
    to match Spark's replace-all default, and both engines agree on
    RE2-compatible character classes/anchors used here.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.regexp_count("p_name", F.lit(r"[aeiou]")).cast("int").alias("n_vowels"),
        F.col("p_name").rlike(r"(ring|bolt)$").alias("is_fastener"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
    )


@register(
    "op_scalar_format",
    tags=("scalar",),
    oracle="""
        SELECT c_custkey,
               printf('%.2f', ROUND(c_acctbal, 2)) AS bal_formatted,
               printf('%08d', c_custkey) AS key_padded,
               lpad(c_mktsegment, 12, '.') AS seg_lpad,
               rpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_rpad,
               repeat('-', 5) || c_name AS name_ruled
        FROM customer WHERE c_custkey <= 500
    """,
)
def op_scalar_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting surface: fixed-precision money rendering and
    zero-padded fixed-width keys (format_string/printf),
    lpad/rpad alignment, repeat — the report/export rendering layer.
    All JVM codegen expressions; formatting belongs at the EDGE of a
    pipeline (sink adapters), never on join keys, where it destroys
    pushdown and statistics."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_custkey") <= 500).select(
        "c_custkey",
        F.format_string("%.2f", F.round("c_acctbal", 2)).alias("bal_formatted"),
        F.format_string("%08d", "c_custkey").alias("key_padded"),
        F.lpad("c_mktsegment", 12, ".").alias("seg_lpad"),
        F.rpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nat_rpad"),
        F.concat(F.repeat(F.lit("-"), 5), F.col("c_name")).alias("name_ruled"),
    )


@register(
    "op_scalar_deterministic_id",
    tags=("scalar",),
    oracle="""
        SELECT o_orderkey,
               substr(md5('ord:' || CAST(o_orderkey AS VARCHAR)), 1, 8) || '-' ||
               substr(md5('ord:' || CAST(o_orderkey AS VARCHAR)), 9, 4) || '-' ||
               substr(md5('ord:' || CAST(o_orderkey AS VARCHAR)), 13, 4) || '-' ||
               substr(md5('ord:' || CAST(o_orderkey AS VARCHAR)), 17, 4) || '-' ||
               substr(md5('ord:' || CAST(o_orderkey AS VARCHAR)), 21, 12) AS surrogate_id
        FROM orders WHERE o_orderkey < 500
    """,
)
def op_scalar_deterministic_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-ID minting (UUIDv5-style): a namespaced
    content hash formatted 8-4-4-4-12 — the same input always mints
    the same id, across runs, retries, and cluster shapes. Spark's
    uuid() is none of those things (per-row random), which breaks
    joins between independently-produced outputs; content-addressed
    ids are the reproducible alternative for keys that must agree
    between pipeline stages produced at different times.

    Pure per-row expression (md5 + substrings), codegen'd, zero
    shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.md5(F.concat(F.lit("ord:"), F.col("o_orderkey").cast("string")))
    return orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.concat_ws(
            "-",
            F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
            F.substring(h, 17, 4), F.substring(h, 21, 12),
        ).alias("surrogate_id"),
    )
