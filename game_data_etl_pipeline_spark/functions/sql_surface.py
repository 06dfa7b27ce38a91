"""Declarative SQL API surface: SQL-defined UDFs (scalar + table)
and parameterized queries.

Spark 4's SQL UDFs (`CREATE FUNCTION ... RETURN <expr>`, SPARK-42849-
family) are the fastest "custom function" path the engine offers: the
body is inlined into the Catalyst plan at analysis time, so unlike
Python/pandas UDFs there is NO serialization boundary, full predicate
pushdown through the function body, and whole-stage codegen across the
call site. Any reusable business rule that is expressible as SQL
should be a SQL UDF, not a Python one — these ops pin that contract.

Parameterized `spark.sql(query, args=...)` is the injection-safe
templating surface (named-parameter markers are bound by the parser,
never string-interpolated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from game_data_etl_pipeline_spark.catalog import load_table, register_views
from game_data_etl_pipeline_spark.registry import register


@register(
    "op_sql_udf",
    tags=("sql", "udf"),
    oracle="""
        WITH tiered AS (
            SELECT CASE WHEN p_retailprice < 930 THEN 'budget'
                        WHEN p_retailprice < 970 THEN 'mid'
                        ELSE 'premium' END AS tier,
                   p_retailprice * (1 - 0.04) AS net_price
            FROM part
        )
        SELECT tier, COUNT(*) AS n_parts,
               ROUND(AVG(net_price), 2) AS avg_net
        FROM tiered GROUP BY tier
    """,
)
def op_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar SQL UDFs: business rules declared once in SQL and reused
    across queries. `price_tier` and `net_of_fee` are CREATE FUNCTION
    ... RETURN expressions — Catalyst inlines the bodies at analysis
    time, so the aggregate below compiles to the exact same
    whole-stage-codegen'd plan as hand-inlined CASE/arithmetic (zero
    UDF dispatch, unlike any Python-side function).

    At 100 TB this is the difference between a function call per row
    crossing a serialization boundary and... nothing at all."""
    register_views(spark, sf_dir, ("part",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 930 THEN 'budget'
                    WHEN p < 970 THEN 'mid'
                    ELSE 'premium' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_of_fee(p DOUBLE)
        RETURNS DOUBLE
        RETURN p * (1 - 0.04)
        """
    )
    return spark.sql(
        """
        SELECT price_tier(p_retailprice) AS tier,
               COUNT(*) AS n_parts,
               ROUND(AVG(net_of_fee(p_retailprice)), 2) AS avg_net
        FROM part GROUP BY price_tier(p_retailprice)
        """
    )


@register(
    "op_sql_tvf",
    tags=("sql", "udf"),
    oracle="""
        SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_chars
        FROM documents
        WHERE lang = 'fr' AND LENGTH(text) >= 200
    """,
)
def op_sql_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table-valued UDF: a parameterized view (`RETURNS TABLE ...
    RETURN SELECT`), invoked in the FROM clause. The body is expanded
    into the logical plan like a view, so filters on the call site
    push down INTO the function body and reach the parquet scan —
    a reusable, arguments-taking scan abstraction with zero runtime
    indirection."""
    register_views(spark, sf_dir, ("documents",))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION docs_in_lang(l STRING, min_chars INT)
        RETURNS TABLE (doc_id BIGINT, n_chars INT)
        RETURN SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_chars
               FROM documents
               WHERE lang = l AND LENGTH(text) >= min_chars
        """
    )
    return spark.sql("SELECT doc_id, n_chars FROM docs_in_lang('fr', 200)")


@register(
    "op_sql_parameterized",
    tags=("sql",),
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
        GROUP BY o_orderpriority
    """,
)
def op_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: `:minp` / `:status` markers bound via
    `spark.sql(..., args={...})`, plus `{orders}` DataFrame
    interpolation — the injection-safe templating path (parameters are
    bound by the parser as literals, never string-spliced, so the
    plan is identical to the literal form: pushdown and pruning are
    unaffected)."""
    orders = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM {orders}
        WHERE o_totalprice > :minp AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"minp": 150000.0, "status": "O"},
        orders=orders,
    )


@register(
    "op_scalar_collation",
    tags=("sql", "scalar"),
    oracle="""
        WITH cased AS (
            SELECT p_brand,
                   CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_name) ELSE p_name END AS name_cased
            FROM part
        )
        SELECT p_brand,
               CAST(COUNT(DISTINCT name_cased) AS BIGINT) AS n_names,
               CAST(COUNT(DISTINCT LOWER(name_cased)) AS BIGINT) AS n_names_ci,
               MIN(LOWER(name_cased)) AS first_name_ci
        FROM cased
        GROUP BY p_brand
    """,
)
def op_scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated string semantics (Spark 4 COLLATE): case-insensitive
    DISTINCT / MIN via the UTF8_LCASE collation instead of scattering
    lower() through every expression — the collation travels WITH the
    column, so every comparison operator (group keys, joins, ORDER
    BY, =) picks up the semantics engine-side. The fixture's names
    are case-perturbed deterministically (every even partkey
    upper-cased) so the binary and collated distinct counts provably
    diverge. The oracle expresses the same semantics with explicit
    LOWER() — the pre-collation idiom this feature replaces.

    Same hash-aggregate plan either way; collation keys compare via
    ICU weights rather than bytes — no extra shuffle, no UDF."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        WITH cased AS (
            SELECT p_brand,
                   CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_name) ELSE p_name END AS name_cased
            FROM part
        )
        SELECT p_brand,
               COUNT(DISTINCT name_cased) AS n_names,
               COUNT(DISTINCT COLLATE(name_cased, 'UTF8_LCASE')) AS n_names_ci,
               CAST(MIN(COLLATE(name_cased, 'UTF8_LCASE')) AS STRING COLLATE UTF8_BINARY) AS first_name_ci
        FROM cased
        GROUP BY p_brand
        """
    ).selectExpr(
        "p_brand", "n_names", "n_names_ci", "lower(first_name_ci) AS first_name_ci"
    )
