"""Set operations and exact deduplication (SURVEY.md §2.B).

UNION ALL is a zero-shuffle concatenation of partitions; the DISTINCT
variants (union distinct / intersect / except) each shuffle on the full
row — at 100 TB prefer key-level semi/anti joins when only a key subset
matters, which is exactly how op_intersect/op_except are phrased here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register


@register(
    "op_union",
    tags=("setop",),
    oracle="""
        SELECT o_orderkey, o_orderpriority, 'urgent' AS bucket
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, o_orderpriority, 'high' AS bucket
        FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def op_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by column name — partition concatenation, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderpriority", F.lit("urgent").alias("bucket"))
    )
    high = (
        orders.filter(F.col("o_orderpriority") == "2-HIGH")
        .select("o_orderkey", "o_orderpriority", F.lit("high").alias("bucket"))
    )
    return urgent.unionByName(high)


@register(
    "op_union_distinct",
    tags=("setop",),
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        UNION
        SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def op_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union followed by a hash distinct on the row."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.unionByName(b).distinct()


@register(
    "op_intersect",
    tags=("setop",),
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def op_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both filled and open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "op_except",
    tags=("setop",),
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def op_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with open orders and no filled ones."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.subtract(f)


@register(
    "op_except_all",
    tags=("setop",),
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def op_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag semantics — multiplicities subtract instead of
    collapsing (the variant the distinct EXCEPT can't express)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    n = lineitem.filter(F.col("l_returnflag") == "N").select("l_orderkey")
    f = lineitem.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    return n.exceptAll(f)


@register(
    "op_dedup_exact",
    tags=("dedup",),
    oracle="""
        SELECT DISTINCT o_custkey, o_orderstatus
        FROM orders
    """,
)
def op_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a key subset: the projected pair set. Projection
    first, then dropDuplicates — the shuffle carries only the key
    columns, which is what makes exact dedup feasible at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_custkey", "o_orderstatus").dropDuplicates()


@register(
    "op_unpivot",
    tags=("setop", "reshape"),
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, ROUND(l_quantity, 4) AS val
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', ROUND(l_discount, 4)
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', ROUND(l_tax, 4)
        FROM lineitem WHERE l_orderkey < 100
    """,
)
def op_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measure columns to long (metric, val) rows.

    ``DataFrame.unpivot`` expands each row to one row per value column
    inside the same task — a generate, not a shuffle, so it scales
    linearly. The oracle is the UNION-ALL expansion (DuckDB's UNPIVOT
    produces the same multiset).
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return lineitem.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="raw_val",
    ).select("l_orderkey", "l_linenumber", "metric", F.round("raw_val", 4).alias("val"))
