"""Scans, filters, projections, explodes — the relational spine.

Covers SURVEY.md §2.A projection/filter/explode parity ops and §2.B
scan/filter/project, expressed so Catalyst gets full pushdown:

- filters and column selections are declared directly on the parquet
  scan (check with ``.explain``: PushedFilters / ReadSchema);
- the flagship star join broadcasts the tiny dimensions and lets the
  fact-side joins go sort-merge/shuffled-hash under AQE.

At 100 TB the same plans hold: the parquet scans prune columns and
row groups, the dimension broadcasts stay O(dim) per executor, and the
lineitem->orders join shuffles on the join key with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register


@register(
    "q_revenue_by_region",
    headline=True,
    tags=("join", "agg", "flagship"),
    oracle="""
        SELECT r_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue per region over the full 5-table star join.

    lineitem |><| orders |><| customer |><| nation |><| region with
    sum(l_extendedprice * (1 - l_discount)). nation/region are
    broadcast (<=25 rows at every sf); lineitem|><|orders and
    orders|><|customer shuffle on their keys.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_pricing_summary",
    headline=True,
    tags=("agg", "flagship"),
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
               ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
               ROUND(AVG(l_discount), 4)                                        AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan-heavy 8-agg group by.

    Single pass over lineitem; partial aggregation map-side, two-column
    grouping key (6 groups), so the shuffle is O(partitions), not O(rows).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "op_scan_parquet",
    tags=("scan",),
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS total_price
        FROM orders
    """,
)
def op_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with column pruning: ReadSchema carries only 4 of 6 cols."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total_price"),
    )


@register(
    "op_filter_pred",
    tags=("filter",),
    oracle="""
        SELECT o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS total_price
        FROM orders
        WHERE o_totalprice BETWEEN 1000 AND 60000
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_orderstatus LIKE 'O%'
          AND o_custkey IS NOT NULL
    """,
)
def op_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: BETWEEN + IN + LIKE + IS NOT NULL, all pushed to the scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_totalprice").between(1000, 60000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").like("O%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("total_price"))


@register(
    "op_project_expr",
    tags=("project",),
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS disc_price,
               ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
               CASE WHEN l_quantity >= 40 THEN 'bulk'
                    WHEN l_quantity >= 10 THEN 'mid'
                    ELSE 'small' END AS qty_band,
               CAST(l_quantity * 2 AS DOUBLE) AS double_qty
        FROM lineitem
    """,
)
def op_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression projection: arithmetic + CASE WHEN, whole-stage-codegen'd."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        # rounded at the full decimal width of the product (inputs have 2dp
        # each) so Spark's HALF_UP-on-shortest-repr and a binary-rounding
        # engine agree bit-for-bit — .xx5 boundaries never arise
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("disc_price"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6).alias("charge"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        (F.col("l_quantity") * 2).cast("double").alias("double_qty"),
    )


@register(
    "op_project_rename",
    tags=("project", "reference-parity"),
    oracle="""
        SELECT p_partkey AS part_id,
               p_name AS part_name,
               COALESCE(p_brand, 'Unknown') AS brand,
               COALESCE(p_size, 0) AS size
        FROM part
    """,
)
def op_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select+rename with per-field null defaults.

    Reference parity: the transform loops that copy/rename fields with
    ``record.get(key, default)`` (reference etl/pipeline.py:151-157,
    182-194) — here a single declarative projection with coalesce.
    """
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("part_name"),
        F.coalesce(F.col("p_brand"), F.lit("Unknown")).alias("brand"),
        F.coalesce(F.col("p_size"), F.lit(0)).alias("size"),
    )


@register(
    "op_posexplode_array",
    tags=("explode", "reference-parity"),
    oracle="""
        WITH e AS (
            SELECT vec_id, embedding, UNNEST(range(len(embedding))) AS p
            FROM embeddings WHERE vec_id < 10
        )
        SELECT vec_id,
               CAST(p AS INT) AS pos,
               ROUND(CAST(embedding[CAST(p AS INT) + 1] AS DOUBLE), 6) AS val
        FROM e
    """,
)
def op_posexplode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional array unnest (posexplode), null-array tolerant.

    Reference parity: ``enumerate(damageRanges or [])`` producing
    ``range_index`` child rows (reference etl/pipeline.py:197-211) —
    here ``posexplode(coalesce(col, array()))`` so a NULL array yields
    zero child rows instead of an error.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode(F.coalesce(F.col("embedding"), F.array())).alias("pos", "elem"))
        .select("vec_id", "pos", F.round(F.col("elem").cast("double"), 6).alias("val"))
    )


@register(
    "op_lineage_columns",
    tags=("project", "reference-parity"),
    oracle="""
        SELECT r_regionkey, r_name,
               'run_00000000_000000' AS _etl_run_id,
               '2026-01-01T00:00:00+00:00' AS _etl_loaded_at
        FROM region
    """,
)
def op_lineage_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant lineage columns appended to every row.

    Reference parity: ``_etl_run_id`` / ``_etl_loaded_at`` stamped on
    each table at load (reference etl/pipeline.py:277-279). Fixed
    literals here so the oracle comparison is deterministic; the real
    ETL path (etl/load.py) stamps the actual run id and UTC now.
    """
    region = load_table(spark, sf_dir, "region")
    return region.select(
        "r_regionkey",
        "r_name",
        F.lit("run_00000000_000000").alias("_etl_run_id"),
        F.lit("2026-01-01T00:00:00+00:00").alias("_etl_loaded_at"),
    )


@register(
    "op_count_rows",
    tags=("agg", "reference-parity"),
    oracle="""
        SELECT 'orders' AS table_name, COUNT(*) AS n_rows FROM orders
        UNION ALL
        SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows FROM lineitem
        UNION ALL
        SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
    """,
)
def op_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table row counts unioned — the reference's only aggregate
    (len(df) per table + global sum, reference etl/pipeline.py:281-294,
    README verify snippet)."""
    parts = []
    for name in ("orders", "lineitem", "customer"):
        df = load_table(spark, sf_dir, name)
        parts.append(df.agg(F.count(F.lit(1)).alias("n_rows")).select(F.lit(name).alias("table_name"), "n_rows"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "q_shipping_priority",
    headline=True,
    tags=("join", "agg", "topk", "flagship"),
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2001-03-15'
          AND l_shipdate  > TIMESTAMP '2001-03-15'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style shipping priority: top-10 unshipped orders by
    revenue for one market segment.

    Both filters are pushed into their scans BEFORE the joins (segment
    on customer, dates on orders/lineitem), so the join input is a
    fraction of each table; the final top-10 is TakeOrderedAndProject —
    no global sort materialization.
    """
    cutoff = F.lit("2001-03-15").cast("timestamp")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_returned_item_losses",
    tags=("join", "agg", "topk"),
    oracle="""
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
               COUNT(*) AS n_returned_items
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style: the 20 customers whose returned items cost the
    most revenue. The returnflag filter is pushed into the lineitem
    scan; nation broadcasts; the customer rollup is one shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_late_shipment_orders",
    tags=("join", "semi", "agg"),
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_late_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
    """,
)
def q_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: orders with at least one lineitem shipped >90
    days after the order date, counted per priority. EXISTS compiles
    to a LEFT SEMI join — each qualifying order counts once no matter
    how many late items it has, and the semi join short-circuits on
    first match instead of materializing the multiplicity."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late_orders"))


@register(
    "q_local_supplier_volume",
    tags=("join", "agg", "flagship"),
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style local supplier volume: revenue from orders where
    the customer and the supplier share a nation, per Asian nation —
    the full 6-table join.

    The supplier join carries the extra c_nationkey = s_nationkey
    equality, so it stays a hash join on a composite key (no theta
    residual). supplier/nation/region broadcast; the region filter
    prunes nations BEFORE the fact tables are touched, because
    Catalyst pushes the r_name predicate through the join graph.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "op_explode_outer",
    tags=("explode",),
    oracle="""
        SELECT doc_id, NULL AS token
        FROM documents WHERE doc_id < 20 AND doc_id % 3 = 0
        UNION ALL
        SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
        FROM documents WHERE doc_id < 20 AND doc_id % 3 <> 0
    """,
)
def op_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER explode: a NULL array keeps its parent row (with a NULL
    element) instead of silently dropping it.

    Plain explode drops parents with NULL/empty arrays — the right
    default for the reference's ``or []`` flatten semantics
    (op_posexplode_array) but lossy for audits like "every document
    must appear in the token table". Here every third document's array
    is nulled and explode_outer preserves those rows; the oracle spells
    the same semantics as a two-branch union. Like explode, this is a
    per-task generate — no shuffle at any scale.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    arr = F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.split(F.lower("text"), " "))
    return docs.select("doc_id", F.explode_outer(arr).alias("token"))


@register(
    "op_sample_tablesample",
    tags=("relational", "sampling"),
    oracle="""
        SELECT TRUE AS within_band, TRUE AS reproducible
    """,
)
def op_sample_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE, verified as a contract: the
    sampled fraction lands within +/-3pp of the requested 10% and the
    same seed reproduces the same rows within one layout. The oracle
    asserts the booleans (the sampled row SET is engine-specific RNG,
    so the contract — not the rows — is the cross-engine invariant).

    Scale notes: ``sample`` is a per-task filter over a seeded RNG —
    zero shuffle, no driver involvement, streams at scan speed. The
    caveat the engine documents (and why llmdata/corpus.py uses
    content-hash draws instead when reproducibility must survive
    repartitioning): the drawn set depends on partition layout, so a
    compaction or split-size change re-rolls the sample. Use
    TABLESAMPLE for cheap approximate stats, hash-draws for corpus
    membership decisions.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    total = lineitem.count()
    s1 = lineitem.sample(fraction=0.1, seed=42)
    s2 = lineitem.sample(fraction=0.1, seed=42)
    n1 = s1.count()
    within = abs(n1 / total - 0.1) < 0.03
    reproducible = s1.exceptAll(s2).isEmpty() and s2.exceptAll(s1).isEmpty()
    return spark.createDataFrame(
        [(bool(within), bool(reproducible))], "within_band boolean, reproducible boolean"
    )
