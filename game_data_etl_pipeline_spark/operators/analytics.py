"""TPC-H-shaped analytic queries: the decision-support surface.

The reference delegates all ad-hoc analytics to SQLite over its 7 output
tables (reference README.md:130-140) — this module is the Spark-native
replacement surface, shaped after the classic TPC-H decision-support
queries the fixture tables support (no partsupp/phone/shipmode columns,
so Q9/Q12/Q16/Q21 shapes are adapted or skipped).

Beyond join/agg coverage, these pin the *subquery decorrelation*
patterns a complete engine needs:

- uncorrelated scalar subquery  -> compute once, broadcast cross-join
  (``q_top_supplier``, ``q_global_sales_opportunity``);
- correlated scalar subquery    -> decorrelate to a grouped aggregate
  joined back on the correlation key (``q_small_qty_revenue``);
- NOT EXISTS                    -> left-anti join
  (``q_global_sales_opportunity``);
- HAVING over a grouped fact    -> aggregate-then-semi-join
  (``q_large_volume_customers``).

Scale notes (100 TB): every query here is one or two shuffles over the
fact tables; dimensions broadcast. The decorrelated forms matter at
scale because a naive per-row subquery would be a nested loop over the
fact table — decorrelation turns it into one extra hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register


@register(
    "q_volume_shipping",
    headline=True,
    tags=("join", "agg", "analytics"),
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style volume shipping: revenue flowing between two
    nations, per direction per year.

    The two-nation predicate is applied on the *broadcast* nation dims
    (25 rows), so the fact-side joins only carry matching rows; the
    symmetric OR is evaluated post-join on broadcast columns — no
    fact-vs-fact theta join anywhere.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q_market_share",
    tags=("join", "agg", "analytics"),
    headline=True,
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume), 4) AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        ) all_nations
        GROUP BY o_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style market share: one supplier nation's share of
    STANDARD-part revenue inside one region, per year.

    The share is a conditional-sum / total-sum ratio computed in a
    single aggregate pass (no self-join): ``sum(CASE WHEN ...)`` is the
    canonical decorrelation of the "fraction of a group" pattern.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(part)
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q_customer_distribution",
    headline=True,
    tags=("join", "agg", "analytics"),
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer distribution: histogram of customers by
    how many orders they placed, INCLUDING zero-order customers.

    The left join keeps customers with no orders; ``count(o_orderkey)``
    (not ``count(*)``) counts them as 0 because COUNT skips nulls. Two
    aggregations, two shuffles — the second one is over the tiny
    histogram domain.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_promo_revenue",
    tags=("join", "agg", "analytics"),
    oracle="""
        SELECT strftime(DATE_TRUNC('month', l_shipdate), '%Y-%m') AS ship_month,
               ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY 1
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promo revenue share per month of one year.

    part broadcasts into the lineitem scan's partitions (no fact
    shuffle before the aggregate); the monthly rollup is one shuffle
    over <=12 groups.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))) / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


@register(
    "q_top_supplier",
    tags=("join", "agg", "subquery", "analytics"),
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: the supplier(s) with maximum
    quarterly revenue — an UNCORRELATED SCALAR SUBQUERY.

    Decorrelation: the scalar ``(SELECT MAX(...))`` is computed once as
    a 1-row DataFrame and broadcast-cross-joined onto the revenue rows;
    the filter then runs map-side. The revenue CTE is computed once and
    reused for both sides (Spark re-executes the subplan, but AQE reuses
    the shuffle output of the grouped aggregate).

    Both engines compare revenues AFTER rounding to cents, so the max
    selection can't diverge on float summation order.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_small_qty_revenue",
    tags=("join", "agg", "subquery", "analytics"),
    oracle="""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.5 * AVG(l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = part.p_partkey
          )
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity revenue — a CORRELATED SCALAR
    SUBQUERY (per-part average quantity).

    Decorrelation: the correlated ``AVG(l_quantity) WHERE l_partkey =
    p_partkey`` becomes ONE grouped aggregate over lineitem joined back
    on the correlation key — turning a per-row nested loop into a
    single extra hash aggregate + broadcast join. At 100 TB this is the
    difference between O(n) and O(n * matches).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part_avg = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q_large_volume_customers",
    tags=("join", "agg", "subquery", "analytics"),
    oracle="""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               ROUND(o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 190
        )
        GROUP BY c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), ROUND(o_totalprice, 2)
    """,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large volume customers: orders whose total
    quantity exceeds a threshold — IN (grouped HAVING subquery).

    Decorrelation: the HAVING subquery is a grouped aggregate whose
    qualifying keys LEFT-SEMI-join back into orders. The big-key list
    is tiny relative to lineitem, so the semi join broadcasts.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy(F.col("l_orderkey").alias("big_orderkey"))
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 190)
        .select("big_orderkey")
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "q_discounted_revenue",
    tags=("join", "filter", "analytics"),
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style OR-of-ANDs predicate over a part|><|lineitem join.

    The disjunction mixes columns from both sides, so it can't be fully
    pushed below the join — but Catalyst derives the single-side
    residuals (brand IN (...), quantity <= 30) and pushes THOSE into
    each scan, shrinking the join inputs; the full disjunction then
    filters the joined rows. Part broadcasts.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q_global_sales_opportunity",
    tags=("join", "anti", "subquery", "analytics"),
    oracle="""
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
        GROUP BY c_nationkey
    """,
)
def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style sales opportunity: wealthy customers who never
    ordered, per nation — UNCORRELATED SCALAR SUBQUERY + NOT EXISTS.

    The scalar average is a 1-row broadcast; NOT EXISTS is a LEFT ANTI
    join on the order keys. Both decorrelations keep the plan at one
    pass over customer + one over orders (key projection only).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_min_balance_supplier",
    tags=("join", "agg", "subquery", "analytics"),
    oracle="""
        SELECT s_suppkey, s_name, n_name, ROUND(s_acctbal, 2) AS balance
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal = (
            SELECT MIN(s2.s_acctbal) FROM supplier s2
            WHERE s2.s_nationkey = supplier.s_nationkey
        )
    """,
)
def q_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style per-group extremum: the supplier(s) holding each
    nation's minimum account balance — a CORRELATED AGGREGATE SUBQUERY
    whose correlation key is the GROUP, not the row.

    Decorrelation: one grouped MIN over supplier, joined back on the
    nation key (a self-join against an aggregate of the same table).
    Completes the subquery taxonomy next to q_top_supplier (global
    scalar) and q_small_qty_revenue (per-row correlated scalar). Ties
    all surface (= comparison, not row_number), matching the SQL.
    Doubles are compared raw, not rounded: both engines see the same
    parquet doubles and MIN picks an exact member value, so equality is
    bit-exact — rounding happens only at projection.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    min_bal = supplier.groupBy(F.col("s_nationkey").alias("min_nationkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        supplier.join(
            F.broadcast(min_bal),
            (F.col("s_nationkey") == F.col("min_nationkey")) & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name", F.round("s_acctbal", 2).alias("balance"))
    )


@register(
    "q_forecast_revenue",
    tags=("agg", "analytics"),
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style revenue-change forecast: one filtered scan, one
    global sum, zero joins. The whole query should compile to a single
    WholeStageCodegen span over a PushedFilters parquet scan — the
    purest test that predicates reach the reader."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue_delta"))


@register(
    "q_product_profit",
    tags=("join", "agg", "analytics"),
    oracle="""
        SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
        FROM (
            SELECT n_name AS nation,
                   CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) - p_retailprice * 0.01 * l_quantity AS amount
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-line profit per nation per year (adapted:
    no partsupp table, so supply cost is modeled as 1% of p_retailprice
    per unit — the join/agg SHAPE is the point, a 5-table star).

    part is filtered BEFORE the join (name predicate pushed to its
    scan) and both dimension joins broadcast; lineitem and orders meet
    in the only real shuffle."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("p_retailprice") * 0.01 * F.col(
        "l_quantity"
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@register(
    "q_important_parts",
    tags=("agg", "subquery", "analytics"),
    oracle="""
        WITH value_per_part AS (
            SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS part_value
            FROM lineitem GROUP BY l_partkey
        ),
        total AS (SELECT SUM(part_value) AS tv FROM value_per_part)
        SELECT l_partkey, ROUND(part_value, 2) AS part_value
        FROM value_per_part, total
        WHERE part_value > 0.0005 * tv
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important stock (adapted to lineitem value, no
    partsupp): parts whose traded value exceeds a FRACTION OF THE
    GLOBAL TOTAL — a HAVING against an uncorrelated scalar subquery.

    Decorrelation: aggregate once per part, re-aggregate to one global
    row, broadcast-cross-join it back (1-row broadcast, not a second
    scan of lineitem) and filter. Two shuffles total at any scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value")
    )
    total = per_part.agg(F.sum("part_value").alias("tv"))
    return (
        per_part.join(F.broadcast(total), F.lit(True))
        .filter(F.col("part_value") > 0.0005 * F.col("tv"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@register(
    "q_priority_shipping",
    tags=("join", "agg", "analytics"),
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY l_linestatus
    """,
)
def q_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style shipping-priority audit (adapted: no shipmode
    column, grouped by l_linestatus): for badly-late lines (shipped
    >90 days after ordering), count high- vs low-priority orders via
    CONDITIONAL AGGREGATION — one join, one shuffle, the CASE folds
    into the aggregate (no per-branch passes)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q_supplier_part_counts",
    tags=("join", "agg", "analytics"),
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#2'
          AND p_type NOT LIKE 'ECONOMY%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier/part relationship (adapted: the
    part-supplier relation comes from lineitem, and 'complaint'
    suppliers are modeled as negative account balance): distinct
    supplier count per qualifying (brand, type, size), with the
    excluded-supplier NOT IN decorrelated to a LEFT ANTI join against
    a broadcast exclusion list."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & ~F.col("p_type").like("ECONOMY%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    excluded = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(F.broadcast(excluded), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_promo_suppliers",
    tags=("join", "subquery", "analytics"),
    oracle="""
        SELECT s_name, n_name AS nation
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 50
        )
    """,
)
def q_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style promotion candidates: suppliers who moved more
    than 50 units of 'red' parts in 1997 — NESTED IN subqueries
    decorrelated to semi-join -> grouped HAVING -> semi-join.

    Both IN lists become broadcast joins (part filter is tiny, the
    qualifying-supplier aggregate is group-count-bounded); lineitem is
    scanned once."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red_parts = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qualifying = (
        lineitem.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
    )


@register(
    "q_late_suppliers",
    tags=("join", "window", "analytics"),
    oracle="""
        WITH f_lines AS (
            SELECT l_orderkey, l_suppkey, l_shipdate
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F'
        ),
        marked AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(l_shipdate) OVER (PARTITION BY l_orderkey) AS last_ship,
                   l_shipdate,
                   COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp
            FROM f_lines
        )
        SELECT s_name, COUNT(DISTINCT l_orderkey) AS numwait
        FROM marked JOIN supplier ON s_suppkey = l_suppkey
        WHERE n_supp > 1 AND l_shipdate = last_ship
        GROUP BY s_name
    """,
)
def q_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style 'suppliers who kept orders waiting' (adapted:
    no commit/receipt dates, so the culprit is the supplier whose line
    shipped LAST on a multi-supplier finished order).

    The classic EXISTS / NOT EXISTS pair over lineitem self-joins is
    re-expressed as two WINDOW functions over a single scan — max
    shipdate and distinct-supplier count per order — turning three
    passes over the fact table into one shuffle on l_orderkey."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    marked = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("last_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
    )
    return (
        marked.filter((F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("last_ship")))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "q_event_funnel",
    tags=("agg", "analytics", "events"),
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
               CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
               CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        FROM firsts
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> click -> purchase): per user,
    the FIRST occurrence of each stage must be in causal order.

    One conditional-MIN aggregate per user (single shuffle), then a
    1-row conditional count — the product-analytics staple expressed
    without self-joins: a 3-way self-join funnel is O(events²) per
    user, the conditional-aggregate form is O(events)."""
    events = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    firsts = events.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    full = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.sum(F.when(viewed, 1).otherwise(0)).alias("n_viewed"),
        F.sum(F.when(clicked, 1).otherwise(0)).alias("n_clicked_after_view"),
        F.sum(F.when(full, 1).otherwise(0)).alias("n_full_funnel"),
    )


@register(
    "q_sessionize_batch",
    tags=("window", "analytics", "events"),
    oracle="""
        WITH ordered AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
                   event_id
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
            FROM ordered
        ),
        sessions AS (
            SELECT user_id, event_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               CAST(MAX(session_id) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(COUNT(*) * 1.0 / MAX(session_id), 4) AS events_per_session
        FROM sessions
        GROUP BY user_id
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute-gap sessions per user via
    lag + running flag-sum (the classic two-window rewrite), reduced
    to per-user session stats.

    Same semantics as the streaming session window
    (op_stream_session) computed at rest — one shuffle on user_id
    serves both window functions AND the final aggregate, since all
    three share the partition key."""
    events = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w_order).isNull()
            | (F.col("ts") > F.lag("ts").over(w_order) + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.count(F.lit(1)) / F.max("session_id"), 4).alias("events_per_session"),
    )


@register(
    "op_window_session_native",
    tags=("window", "analytics", "events"),
    oracle="""
        WITH ordered AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
                   event_id
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM ordered
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def op_window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH: Spark's built-in
    gap-merging session grouping (the same primitive the streaming
    engine uses) applied at rest — one shuffle on user_id, sessions
    merged inside the aggregation operator with no window functions.

    Semantics pinned by the oracle: a session closes when the next
    event is >= 30 minutes after the previous one (session end =
    last event + gap, merge only while next.start < end). Contrast
    with q_sessionize_batch, which derives the same sessions via the
    lag + running-sum rewrite; at 100 TB the native form is
    preferable because it needs no total order per user beyond the
    aggregation sort and exposes the gap to the planner.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "op_plan_exchange_reuse",
    tags=("analytics", "scale"),
    oracle="""
        WITH agg AS (
            SELECT l_suppkey, ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_suppkey
        ),
        top AS (
            SELECT 'top' AS bucket, l_suppkey, total_qty FROM agg
            ORDER BY total_qty DESC, l_suppkey ASC LIMIT 3
        ),
        bottom AS (
            SELECT 'bottom' AS bucket, l_suppkey, total_qty FROM agg
            ORDER BY total_qty ASC, l_suppkey ASC LIMIT 3
        )
        SELECT * FROM top UNION ALL SELECT * FROM bottom
    """,
)
def op_plan_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-subplan reuse: top-3 and bottom-3 suppliers by shipped
    quantity branch off ONE aggregation. Spark's ReuseExchange rule
    spots the two identical shuffle subtrees and runs the scan +
    partial agg + exchange once, feeding both TakeOrderedAndProject
    branches (ReusedExchange pinned in tests/test_plans.py).

    The 100 TB point: self-referential queries (top/bottom, share-of-
    total, vs-median comparisons) are everywhere in analytics; an
    engine that re-executes the common subplan doubles the dominant
    cost. Express both branches over the SAME DataFrame object —
    semantically identical subtrees the optimizer can unify — rather
    than re-reading the table. Explicit tie-breaks keep the limit
    deterministic across engines.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_suppkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("total_qty")
    )
    top = (
        agg.orderBy(F.col("total_qty").desc(), F.col("l_suppkey").asc())
        .limit(3)
        .select(F.lit("top").alias("bucket"), "l_suppkey", "total_qty")
    )
    bottom = (
        agg.orderBy(F.col("total_qty").asc(), F.col("l_suppkey").asc())
        .limit(3)
        .select(F.lit("bottom").alias("bucket"), "l_suppkey", "total_qty")
    )
    return top.unionByName(bottom)


@register(
    "op_profile_table",
    tags=("analytics", "quality"),
    oracle="""
        SELECT 'o_custkey' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
               CAST(MAX(o_custkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
               CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
               CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
               CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
        FROM orders
    """,
)
def op_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: per-column row/null/distinct counts and
    min/max, long-form (one row per column) so the output shape is
    independent of table width.

    The admission check every ingest pipeline runs before promoting a
    drop into the lake. One scan computes all columns' profiles
    simultaneously (a single multi-aggregate, not one pass per column
    — the SQL UNION oracle spells the naive per-column form); exact
    countDistinct is the deliberate choice at audit time, with
    op_agg_approx_distinct as the O(1)-state monitoring variant.
    """
    orders = load_table(spark, sf_dir, "orders")
    profiled = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            a
            for c, t in (
                ("o_custkey", "bigint"),
                ("o_orderstatus", "string"),
                ("o_totalprice", "decimal(18,2)"),
            )
            for a in (
                F.count(c).alias(f"{c}__cnt"),
                F.countDistinct(c).alias(f"{c}__dst"),
                F.min(F.col(c).cast(t)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c).cast(t)).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    cols = ("o_custkey", "o_orderstatus", "o_totalprice")
    stacked = profiled.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col("n_rows").cast("bigint").alias("n_rows"),
                        (F.col("n_rows") - F.col(f"{c}__cnt")).cast("bigint").alias("n_nulls"),
                        F.col(f"{c}__dst").cast("bigint").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_val"),
                        F.col(f"{c}__max").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


@register(
    "op_recursive_cte",
    tags=("sql", "hierarchy"),
    oracle="""
        WITH RECURSIVE walk(node, cur, depth) AS (
            SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
            UNION ALL
            SELECT node, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
            FROM walk WHERE cur > 1
        )
        SELECT node AS c_custkey, CAST(MAX(depth) AS INT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS chain_len
        FROM walk GROUP BY node
    """,
)
def op_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk every customer up a
    synthetic binary-tree hierarchy (parent(k) = floor(k/2)) to the
    root and report depth + visited-chain length — the transitive-
    closure query shape (org charts, BOM explosion, folder trees)
    that pre-4.0 Spark required a driver loop for (op_graph_bfs is
    that manual fixpoint; this is the declarative form).

    Each iteration is one self-join of the frontier against a
    per-row expression — Catalyst plans the loop as a union of
    bounded steps (depth <= log2(max key), ~18 for a 150k-customer
    tree), and every step is an ordinary shuffle-free projection
    here since the parent is computed, not looked up. Cite:
    recursion depth is data-bounded, not config-bounded, so the 100
    TB risk is cycle bugs — the WHERE cur > 1 guard is the
    termination proof."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        WITH RECURSIVE walk(node, cur, depth) AS (
            SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
            UNION ALL
            SELECT node, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
            FROM walk WHERE cur > 1
        )
        SELECT node AS c_custkey, CAST(MAX(depth) AS INT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS chain_len
        FROM walk GROUP BY node
    """)


@register(
    "op_anomaly_mad",
    tags=("analytics", "quality"),
    oracle="""
        WITH med AS (
            SELECT event_type, MEDIAN(value) AS med_v
            FROM events GROUP BY event_type
        ),
        devs AS (
            SELECT e.event_type, e.event_id, e.value, m.med_v,
                   ABS(e.value - m.med_v) AS dev
            FROM events e JOIN med m ON e.event_type = m.event_type
        ),
        mad AS (
            SELECT event_type, MEDIAN(dev) AS mad_v
            FROM devs GROUP BY event_type
        )
        SELECT d.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN m.mad_v > 0
                              AND ABS(d.value - d.med_v) / (1.4826 * m.mad_v) > 3.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
               ROUND(ANY_VALUE(d.med_v), 4) AS median_value,
               ROUND(ANY_VALUE(m.mad_v), 4) AS mad
        FROM devs d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
    """,
)
def op_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: modified z-score
    |x - median| / (1.4826 * MAD) > 3.5 (the Iglewicz–Hoaglin rule,
    public) — median/MAD resist exactly the outliers that wreck a
    mean/stddev z-score, which is why data-quality monitors use them
    over op_agg_stats' moments.

    Two grouped exact medians (per-type, group count is small) plus
    broadcast-sized joins back; at 100 TB both medians swap to
    approx_percentile sketches with the same two-pass shape and the
    per-row score unchanged."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med_v"))
    devs = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "value", "med_v",
        F.abs(F.col("value") - F.col("med_v")).alias("dev"),
    )
    mad = devs.groupBy("event_type").agg(F.expr("percentile(dev, 0.5)").alias("mad_v"))
    scored = devs.join(F.broadcast(mad), "event_type")
    is_anom = (F.col("mad_v") > 0) & (
        F.abs(F.col("value") - F.col("med_v")) / (1.4826 * F.col("mad_v")) > 3.5
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies"),
        F.round(F.first("med_v"), 4).alias("median_value"),
        F.round(F.first("mad_v"), 4).alias("mad"),
    )


@register(
    "op_impact_prepost",
    tags=("analytics", "stats"),
    oracle="""
        WITH bounds AS (
            -- midpoint via epoch microseconds: interval/2 is
            -- componentwise in DuckDB (integer day halving loses 12h)
            SELECT make_timestamp((epoch_us(MIN(CAST(ts AS TIMESTAMP)))
                                   + epoch_us(MAX(CAST(ts AS TIMESTAMP)))) // 2) AS cut
            FROM events
        ),
        tagged AS (
            SELECT event_type, value,
                   CAST(ts AS TIMESTAMP) >= cut AS is_post
            FROM events, bounds
        ),
        sides AS (
            SELECT event_type,
                   COUNT(*) FILTER (WHERE NOT is_post) AS n_pre,
                   COUNT(*) FILTER (WHERE is_post) AS n_post,
                   AVG(value) FILTER (WHERE NOT is_post) AS m_pre,
                   AVG(value) FILTER (WHERE is_post) AS m_post,
                   var_samp(value) FILTER (WHERE NOT is_post) AS v_pre,
                   var_samp(value) FILTER (WHERE is_post) AS v_post
            FROM tagged GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_pre AS BIGINT) AS n_pre,
               CAST(n_post AS BIGINT) AS n_post,
               ROUND(m_post - m_pre, 4) AS mean_shift,
               ROUND((m_post - m_pre) / SQRT(v_pre / n_pre + v_post / n_post), 4) AS welch_t
        FROM sides
    """,
)
def op_impact_prepost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre/post intervention comparison (interrupted time series, the
    'did the change help' query): the observation window splits at its
    temporal midpoint, and each event type reports its mean-value
    shift with a Welch t statistic (unequal-variance, the honest
    default) — the screening stat before any causal claim.

    One broadcast 1-row bounds aggregate, then ONE conditional-
    aggregation pass computes both sides' n/mean/variance per type —
    never two scans, never a self-join; at 100 TB this is a single
    map-side-combined aggregate over the stream."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.timestamp_micros(
            F.floor((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2).cast("long")
        ).alias("cut")
    )
    tagged = events.join(F.broadcast(bounds)).select(
        "event_type", "value", (F.col("ts") >= F.col("cut")).alias("is_post")
    )
    pre = F.when(~F.col("is_post"), F.col("value"))
    post = F.when(F.col("is_post"), F.col("value"))
    sides = tagged.groupBy("event_type").agg(
        F.count(pre).alias("n_pre"),
        F.count(post).alias("n_post"),
        F.avg(pre).alias("m_pre"),
        F.avg(post).alias("m_post"),
        F.var_samp(pre).alias("v_pre"),
        F.var_samp(post).alias("v_post"),
    )
    shift = F.col("m_post") - F.col("m_pre")
    return sides.select(
        "event_type",
        "n_pre",
        "n_post",
        F.round(shift, 4).alias("mean_shift"),
        F.round(
            shift / F.sqrt(F.col("v_pre") / F.col("n_pre") + F.col("v_post") / F.col("n_post")), 4
        ).alias("welch_t"),
    )


@register(
    "op_pareto_concentration",
    tags=("analytics", "scale"),
    oracle="""
        WITH rev AS (
            SELECT o_custkey, SUM(o_totalprice) AS r
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT r, SUM(r) OVER (ORDER BY r DESC, o_custkey) AS cum,
                   SUM(r) OVER () AS total
            FROM rev
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(ANY_VALUE(total), 2) AS total_revenue,
               CAST(SUM(CASE WHEN cum - r < 0.8 * total THEN 1 ELSE 0 END) AS BIGINT) AS pareto_k,
               ROUND(SUM(CASE WHEN cum - r < 0.8 * total THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS pareto_share
        FROM ranked
    """,
)
def op_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration — how many top customers produce 80% of
    revenue — computed with the DISTRIBUTED PREFIX SUM pattern instead
    of the naive global cumulative window (which moves every customer
    into one partition): customers hash into 32 revenue-value bins,
    bin subtotals (32 rows) get exclusive prefix offsets in a trivial
    window, offsets broadcast back, and each customer's global
    cumulative = bin prefix + within-bin running sum over a
    PARTITIONED window. The only serial structure is 32 rows.

    The oracle is the naive single-window form — same answer, a plan
    that would not survive 100 TB. Count flips at the 0.8·T boundary
    need the float noise (~n·ε·T) to exceed one customer's revenue —
    ten orders of magnitude apart here, and the docstring carries the
    argument so the next reader doesn't re-derive it."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    bounds = rev.agg(F.min("r").alias("lo"), F.max("r").alias("hi"))
    binw = (F.col("hi") - F.col("lo")) / 32
    # bin 0 holds the HIGHEST revenues so prefix order matches rank order
    binned = rev.join(F.broadcast(bounds)).select(
        "o_custkey", "r",
        F.least(F.floor((F.col("hi") - F.col("r")) / binw).cast("int"), F.lit(31)).alias("bin"),
    )
    w_bins = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    bin_prefix = (
        binned.groupBy("bin").agg(F.sum("r").alias("bin_total"))
        .select("bin", F.coalesce(F.sum("bin_total").over(w_bins), F.lit(0.0)).alias("prefix"))
    )
    w_in_bin = (
        Window.partitionBy("bin")
        .orderBy(F.col("r").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        binned.join(F.broadcast(bin_prefix), "bin")
        .select("r", (F.col("prefix") + F.sum("r").over(w_in_bin)).alias("cum"))
    )
    total = rev.agg(F.sum("r").alias("total"), F.count(F.lit(1)).alias("n_customers"))
    return (
        cum.join(F.broadcast(total))
        .agg(
            F.first("n_customers").alias("n_customers"),
            F.round(F.first("total"), 2).alias("total_revenue"),
            F.sum(
                F.when(F.col("cum") - F.col("r") < 0.8 * F.col("total"), 1).otherwise(0)
            ).alias("pareto_k"),
            F.round(
                F.sum(
                    F.when(F.col("cum") - F.col("r") < 0.8 * F.col("total"), 1).otherwise(0)
                ) / F.first("n_customers"),
                4,
            ).alias("pareto_share"),
        )
    )


@register(
    "q_ops_dashboard",
    tags=("analytics", "behavior"),
    headline=True,
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                             - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                                   PARTITION BY user_id ORDER BY ts, event_id
                               ) > 1800000000
                             OR LAG(event_id) OVER (
                                   PARTITION BY user_id ORDER BY ts, event_id
                               ) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        sess AS (
            SELECT *, SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS session_no
            FROM seq
        ),
        per_session AS (
            SELECT user_id, session_no,
                   CAST(MIN(ts) AS DATE) AS day,
                   (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1e6 AS dur_s,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
            FROM sess GROUP BY user_id, session_no
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
               ROUND(AVG(dur_s), 2) AS avg_session_s,
               ROUND(SUM(has_click * has_purchase) * 1.0 / NULLIF(SUM(has_click), 0), 4)
                   AS click_to_purchase_rate
        FROM per_session
        GROUP BY day
    """,
)
def q_ops_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed DAILY OPS DASHBOARD — the analytics counterpart of the
    corpus pipelines: gap-sessionization (30-min inactivity), per-
    session facts (duration, click/purchase presence), then the daily
    rollup every ops review starts with: sessions, active users, mean
    session length, click→purchase conversion. One lazy DataFrame.

    Shuffle ledger: ONE shuffle on user_id feeds BOTH windows (lag
    for boundaries, running sum for session ids — same partition
    spec, Spark reuses the exchange, the op_window_islands contract),
    one hash aggregate to per-session rows keyed (user, session), one
    to O(days) dashboard rows. A session is assembled from exactly
    one user's partition — no cross-user state anywhere, so the plan
    stripes by users at any scale."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    is_new = (
        (us - F.lag(us).over(w) > 1_800_000_000)
        | F.lag("event_id").over(w).isNull()
    ).cast("int")
    sess = events.select(
        "user_id", "event_id", "event_type", "ts", is_new.alias("is_new")
    ).withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sess.groupBy("user_id", "session_no").agg(
        F.to_date(F.min("ts")).alias("day"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1e6).alias("dur_s"),
        F.max((F.col("event_type") == "click").cast("int")).alias("has_click"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("has_purchase"),
    )
    return per_session.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_active_users"),
        F.round(F.avg("dur_s"), 2).alias("avg_session_s"),
        F.round(
            F.sum(F.col("has_click") * F.col("has_purchase"))
            / F.nullif(F.sum("has_click"), F.lit(0)),
            4,
        ).alias("click_to_purchase_rate"),
    )


@register(
    "q_copurchase_lift",
    tags=("analytics", "join", "scale"),
    oracle="""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        part_n AS (
            SELECT l_partkey, COUNT(*) AS n_part FROM li GROUP BY l_partkey
        ),
        tot AS (
            SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS pair_n
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY a.l_partkey, b.l_partkey
        ),
        top AS (
            SELECT part_a, part_b, pair_n FROM pairs
            ORDER BY pair_n DESC, part_a, part_b LIMIT 20
        )
        SELECT t.part_a, t.part_b,
               CAST(t.pair_n AS BIGINT) AS pair_n,
               CAST(pa.n_part AS BIGINT) AS n_a,
               CAST(pb.n_part AS BIGINT) AS n_b,
               FLOOR(t.pair_n * tot.n_orders * 1.0 / (pa.n_part * pb.n_part) * 10000 + 0.5)
                   / 10000 AS lift
        FROM top t
        JOIN part_n pa ON pa.l_partkey = t.part_a
        JOIN part_n pb ON pb.l_partkey = t.part_b, tot
    """,
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase mining: the top-20 part pairs by
    co-occurrence across orders, scored with lift =
    P(a,b) / (P(a)·P(b)) — the "frequently bought together" query every
    commerce/telemetry warehouse runs, absent from the reference's
    SQLite surface (reference README.md:130-140 stops at per-table
    aggregates).

    Scale shape (100 TB): lineitem is reduced ONCE to per-order sorted
    part arrays — a single hash exchange on l_orderkey carrying two int
    columns — and everything else derives from that one grouped
    subtree: pairs come from a per-row combination explode over the
    sorted array (array_sort guarantees a < b; NO self-join, fanout
    bounded by C(basket, 2), basket ≤ 7 in TPC-H-shaped data), per-part
    support counts from an explode of the same arrays, and the order
    total from the same frame's count. All three branches consume the
    IDENTICAL subtree; ReuseExchange shares the orderkey SHUFFLE
    across them, but each branch still re-ran the collect_set
    aggregation ABOVE the exchange — measured r6, materializing the
    basket table once (eager localCheckpoint; persist(DISK_ONLY) or a
    staged table at cluster scale — one array row per order, far
    smaller than lineitem) beats exchange reuse 6.39 s → 2.84 s at
    sf0.1 with identical output. (The naive `li.distinct()`-per-branch
    form was worse still: FOUR lineitem scans and four distinct
    shuffles — Catalyst fuses distinct+agg differently per consumer,
    so those subtrees never unify.) A
    pathological mega-basket would need a slice cap on the array;
    TPC-H-shaped baskets make that unnecessary. Pair counts are
    map-side-combinable, the top-20 cut is orderBy+limit
    (TakeOrderedAndProject's per-partition heap), and the per-part
    support counts join back against ONLY the 20 survivors — the
    20-row side broadcasts, the |parts|-sized table streams.
    Cross-engine float discipline (registry.py): lift is one IEEE
    division of exact BIGINT products, then the sanctioned
    ``floor(x*10^4 + 0.5)`` quantization in both engines."""
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=True)
    )
    part_n = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_part"))
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    pair_structs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda a, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size(F.col("parts"))),
                lambda b: F.struct(a.alias("part_a"), b.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_n"))
    )
    top = pairs.orderBy(F.col("pair_n").desc(), "part_a", "part_b").limit(20)
    pa = part_n.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a"))
    pb = part_n.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b"))
    scored = (
        pb.join(F.broadcast(pa.join(F.broadcast(top), "part_a")), "part_b")
        .join(F.broadcast(tot))
    )
    lift_raw = (F.col("pair_n") * F.col("n_orders")) * F.lit(1.0) / (
        F.col("n_a") * F.col("n_b")
    )
    return scored.select(
        "part_a",
        "part_b",
        "pair_n",
        "n_a",
        "n_b",
        (F.floor(lift_raw * 10000 + F.lit(0.5)) / F.lit(10000)).alias("lift"),
    )
