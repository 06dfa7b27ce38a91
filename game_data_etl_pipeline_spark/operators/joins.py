"""Join operators: every join shape the engine supports (SURVEY.md §2.B).

Scale notes baked into each plan:

- equi-joins on fact tables shuffle on the join key; AQE re-plans to
  broadcast when the build side turns out small and splits skewed
  partitions (skewJoin.enabled in session.py);
- dimension joins broadcast explicitly (nation/region are <=25 rows at
  every scale factor);
- the theta/range join is a broadcast nested-loop against a tiny
  literal band table — the only safe BNLJ shape at 100 TB (never
  BNLJ two fact tables; bucketize the range key instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table, register_views
from game_data_etl_pipeline_spark.registry import register


@register(
    "op_join_inner",
    tags=("join",),
    oracle="""
        SELECT o_orderkey, c_custkey, c_name, c_mktsegment,
               ROUND(o_totalprice, 2) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'O'
    """,
)
def op_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders |><| customer; filter pushed below the join."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_custkey", "c_name", "c_mktsegment", F.round("o_totalprice", 2).alias("total_price"))
    )


@register(
    "op_join_left",
    tags=("join",),
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               ROUND(o_totalprice, 2) AS total_price
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_totalprice > 30000
    """,
)
def op_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a non-key join condition, preserving
    customers that have no qualifying order (NULL right side)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (customer.c_custkey == orders.o_custkey) & (orders.o_totalprice > 30000)
    return customer.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
    )


@register(
    "op_join_right",
    tags=("join",),
    oracle="""
        SELECT c_custkey, c_name, o_orderkey
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_orderstatus = 'F'
    """,
)
def op_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (mirror of left; Spark plans it as the same
    physical join with sides swapped)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (orders.o_custkey == customer.c_custkey) & (orders.o_orderstatus == "F")
    return orders.join(customer, cond, "right").select("c_custkey", "c_name", "o_orderkey")


@register(
    "op_join_full",
    tags=("join",),
    oracle="""
        WITH rich AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 8000),
             big  AS (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 80000)
        SELECT c_custkey, c_name, o_orderkey
        FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
    """,
)
def op_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with genuinely unmatched rows on BOTH sides
    (filtered subsets so neither side's key set covers the other)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 8000).select("c_custkey", "c_name")
    big = orders.filter(F.col("o_totalprice") > 80000).select("o_custkey", "o_orderkey")
    return rich.join(big, rich.c_custkey == big.o_custkey, "full").select("c_custkey", "c_name", "o_orderkey")


@register(
    "op_join_semi",
    tags=("join",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def op_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one urgent order.
    Semi joins never duplicate the left side, so the output stays
    O(|customer|) no matter how many orders match."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "op_join_anti",
    tags=("join",),
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def op_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "op_join_broadcast",
    tags=("join",),
    oracle="""
        SELECT n_name, r_name, COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
    """,
)
def op_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit dimension broadcast: customer |><| broadcast(nation)
    |><| broadcast(region). No shuffle of the fact side at any scale —
    the hash tables ship to executors (25 + 5 rows)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "op_join_theta",
    tags=("join",),
    oracle="""
        WITH bands(band, lo, hi) AS (
            VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e18)
        )
        SELECT band, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band
    """,
)
def op_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range) join: events banded by value against a tiny literal
    band table via broadcast nested-loop — the only BNLJ shape that
    survives scale (build side is O(1)). Fact-to-fact range joins must
    instead bucketize the range key and equi-join on the bucket."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        events.join(F.broadcast(bands), (events.value >= bands.lo) & (events.value < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "op_join_lateral",
    tags=("join", "subquery"),
    oracle="""
        SELECT c_custkey, m.max_price, m.n_orders
        FROM customer
        JOIN LATERAL (
            SELECT ROUND(MAX(o_totalprice), 2) AS max_price,
                   COUNT(*) AS n_orders
            FROM orders WHERE o_custkey = c_custkey
        ) m ON TRUE
        WHERE c_custkey < 200
    """,
)
def op_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL surface): each customer row
    feeds a dependent aggregate over their own orders.

    Catalyst DECORRELATES the lateral into a grouped aggregate joined
    on the correlation key — same rewrite q_small_qty_revenue does by
    hand, here proven at the SQL layer. A per-row re-execution of the
    subquery (the naive reading) would be a nested loop over orders;
    the planned form is one aggregate + one hash join at any scale.
    Aggregate-only lateral yields exactly one row per customer, so the
    join keeps no-order customers too (COUNT(*)=0, NULL max)."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, m.max_price, m.n_orders
        FROM customer
        JOIN LATERAL (
            SELECT ROUND(MAX(o_totalprice), 2) AS max_price,
                   COUNT(*) AS n_orders
            FROM orders WHERE o_custkey = c_custkey
        ) m
        WHERE c_custkey < 200
        """
    )


@register(
    "op_join_null_safe",
    tags=("join",),
    oracle="""
        WITH e AS (
            SELECT event_id,
                   CASE WHEN event_id % 5 = 0 THEN NULL
                        ELSE CAST(json_extract(props, '$.k') AS INT) END AS k
            FROM events WHERE event_id < 2000
        ), d AS (
            SELECT CASE WHEN g = 10 THEN NULL ELSE g END AS k,
                   CASE WHEN g = 10 THEN 'missing' ELSE CONCAT('grp_', CAST(g AS VARCHAR)) END AS k_label
            FROM (SELECT UNNEST(range(0, 11)) AS g)
        )
        SELECT d.k_label, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e JOIN d ON e.k IS NOT DISTINCT FROM d.k
        GROUP BY d.k_label
    """,
)
def op_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping, so the 'missing'
    bucket survives the join — the semantics audits need when NULL is
    a real category (unparseable props, unknown cohort).

    Scale notes: eqNullSafe stays a HASH join key (NULL hashes like
    any value), so this costs the same as a plain equi-join — but ALL
    null-keyed rows co-locate in one partition, making a null-heavy
    column the canonical skew case: op_join_salted is the companion
    fix. The dim side here broadcasts, sidestepping skew entirely.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    e = events.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None))
        .otherwise(F.get_json_object("props", "$.k").cast("int"))
        .alias("k"),
    )
    dim = spark.range(0, 11).select(
        F.when(F.col("id") == 10, F.lit(None)).otherwise(F.col("id").cast("int")).alias("k"),
        F.when(F.col("id") == 10, F.lit("missing"))
        .otherwise(F.concat(F.lit("grp_"), F.col("id").cast("string")))
        .alias("k_label"),
    )
    return (
        e.join(F.broadcast(dim), e.k.eqNullSafe(dim.k))
        .groupBy("k_label")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "op_join_null_aware_anti",
    tags=("join", "semantics"),
    oracle="""
        WITH nullable_keys AS (
            SELECT CASE WHEN o_totalprice > 350000 THEN NULL ELSE o_custkey END AS k
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT
            CAST((SELECT COUNT(*) FROM customer
                  WHERE c_custkey NOT IN (SELECT k FROM nullable_keys)) AS BIGINT) AS n_not_in,
            CAST((SELECT COUNT(*) FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM nullable_keys n WHERE n.k = c.c_custkey)) AS BIGINT) AS n_not_exists,
            CAST((SELECT COUNT(*) FROM nullable_keys WHERE k IS NULL) AS BIGINT) AS n_null_keys
    """,
)
def op_join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a NULLABLE subquery vs NOT EXISTS — the
    three-valued-logic trap that silently empties naive rewrites: one
    NULL in the subquery makes every `x NOT IN (...)` UNKNOWN, so the
    correct NOT IN count is ZERO the moment a NULL is present, while
    NOT EXISTS (two-valued) still returns the unmatched customers.
    Spark plans the former as a null-aware anti join (a broadcast
    build with NAAJ marking — a physical operator no other join op
    exercises) and the latter as a plain left-anti; emitting BOTH
    counts plus the null-key count makes the contrast
    hash-verifiable — a broken null-aware rewrite would show
    n_not_in == n_not_exists.

    At 100 TB: the null-aware build side must broadcast (Spark
    requires it); rewrite to NOT EXISTS when the key is provably
    non-null and the build side outgrows the broadcast budget."""
    from game_data_etl_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        WITH nullable_keys AS (
            SELECT CASE WHEN o_totalprice > 350000 THEN NULL ELSE o_custkey END AS k
            FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN (SELECT k FROM nullable_keys)) AS n_not_in,
            (SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nullable_keys n WHERE n.k = c.c_custkey)) AS n_not_exists,
            (SELECT COUNT(*) FROM nullable_keys WHERE k IS NULL) AS n_null_keys
        """
    )
