"""Aggregation operators (SURVEY.md §2.B): hash aggregate, distinct,
approximate, multi-level (rollup/cube/grouping sets), pivot.

All of these compile to partial (map-side) + final hash aggregation,
so the shuffle volume is O(groups x partitions), not O(rows) — the
property that makes them scale-safe. countDistinct is the exception
(it expands to a two-phase aggregate over distinct values); where an
approximation suffices at 100 TB, approx_count_distinct (HLL++) keeps
the state O(1) per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table, register_views
from game_data_etl_pipeline_spark.registry import register


@register(
    "op_agg_group",
    tags=("agg",),
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               ROUND(AVG(o_totalprice), 4) AS avg_price,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def op_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation: count/sum/avg/min/max per group."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "op_agg_distinct",
    tags=("agg",),
    oracle="""
        SELECT c_mktsegment,
               COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(*) AS n_customers
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def op_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT ...) — expands to a two-phase distinct aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "op_agg_collect_set",
    tags=("agg",),
    oracle="""
        SELECT l_linestatus,
               array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
        FROM lineitem
        GROUP BY l_linestatus
    """,
)
def op_agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set with a deterministic sort — set-valued aggregation,
    scalarized to a comma-joined string so order-insensitive value
    hashing works on the result. Safe only for low-cardinality values
    (state is O(distinct) per group)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_linestatus").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("l_returnflag"))).alias("flags")
    )


@register(
    "op_agg_approx_distinct",
    tags=("agg", "approx"),
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               COUNT(*) AS n_items,
               TRUE AS within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): O(1) state per group —
    the 100 TB substitute for exact countDistinct.

    Oracle strategy: the estimate itself is engine-specific, so the
    query emits the EXACT distinct count (hash-comparable) plus a
    ``within_tol`` boolean asserting |approx - exact| <= 10% * exact
    (2x the configured rsd); the oracle pins within_tol = TRUE. A
    drifting estimator flips the boolean and fails the value hash."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.count(F.lit(1)).alias("n_items"),
        (
            F.abs(F.approx_count_distinct("l_orderkey", rsd=0.05) - F.countDistinct("l_orderkey"))
            <= 0.10 * F.countDistinct("l_orderkey")
        ).alias("within_tol"),
    )


@register(
    "op_agg_percentile",
    tags=("agg", "approx"),
    oracle="""
        SELECT o_orderpriority,
               ROUND(MEDIAN(o_totalprice), 4) AS median_price,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def op_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (continuous interpolation, matching
    quantile_cont). At 100 TB swap percentile() for percentile_approx()
    — same call shape, bounded state."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
    )


@register(
    "op_rollup",
    tags=("agg", "multilevel"),
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def op_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (status, priority) -> (status) -> ()."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "op_cube",
    tags=("agg", "multilevel"),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def op_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "op_grouping_sets",
    tags=("agg", "multilevel"),
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def op_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "op_agg_pivot",
    tags=("agg",),
    oracle="""
        SELECT l_returnflag,
               ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_open,
               ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_filled
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus values to columns. Explicit value list so the
    plan is a single pass (no extra distinct-values job) — mandatory at
    scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_open"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_filled"),
    )


@register(
    "op_agg_stats",
    tags=("agg",),
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 2) AS price_stddev,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_covar,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(MIN(l_extendedprice), 2) AS price_min,
               ROUND(MAX(l_extendedprice), 2) AS price_max
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev / covariance / correlation.

    All are single-pass partial-aggregable (sum, sum-of-squares,
    cross-moments combine associatively), so they keep the same
    one-shuffle plan as sum/avg at any scale. Rounding is chosen per
    magnitude: stddev/covar at cents (relative float noise ~1e-12 of a
    ~1e4 value), corr at 6dp (bounded in [-1, 1]).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
    )


@register(
    "op_agg_bool",
    tags=("agg",),
    oracle="""
        SELECT o_orderpriority,
               BOOL_AND(o_totalprice > 1000)   AS all_above_1000,
               BOOL_OR(o_orderstatus = 'F')    AS any_filled,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def op_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any) + filtered count.

    bool_and/bool_or are partial-aggregable single-bit state; the
    filtered count is count(CASE WHEN) — all stay in the one-shuffle
    hash-aggregate plan.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1000"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_filled"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
    )


@register(
    "op_agg_median",
    tags=("agg",),
    oracle="""
        SELECT l_returnflag,
               ROUND(MEDIAN(l_quantity), 2) AS median_qty,
               ROUND(MEDIAN(l_extendedprice), 3) AS median_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (percentile_cont(0.5), interpolating on
    even counts in both engines). The price median rounds at 3dp —
    the midpoint of two cent-valued prices carries a third decimal
    digit, and rounding AT the .xx5 boundary is engine-divergent
    (Spark HALF_UP on decimal repr vs binary-double rounding).

    Unlike the moment aggregates, exact median is NOT partial-aggregable
    — it sorts each group's values. Use op_agg_percentile's
    approx_percentile (t-digest sketch, mergeable) when a bounded-error
    answer is acceptable at 100 TB; exact median is for final
    small-group rollups like this one.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 2).alias("median_qty"),
        F.round(F.median("l_extendedprice"), 3).alias("median_price"),
    )


@register(
    "op_agg_histogram",
    tags=("agg",),
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS bucket,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS bucket_total
        FROM orders
        GROUP BY 1
    """,
)
def op_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket index by integer division, one
    hash-aggregate pass. The fixed width (vs quantile buckets) is the
    scale choice — no global pre-pass, buckets stable as data grows,
    and the shuffle carries one row per non-empty bucket."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("bucket_total"))
    )


@register(
    "op_agg_percentile_approx",
    tags=("agg", "approx"),
    oracle="""
        SELECT o_orderpriority,
               ROUND(MEDIAN(o_totalprice), 4) AS exact_median,
               TRUE AS within_tol
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def op_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch): bounded-state,
    MERGEABLE quantiles — map-side sketches combine associatively, so
    the shuffle carries one sketch per partition, the property exact
    percentile lacks at 100 TB.

    Oracle strategy mirrors op_agg_approx_distinct: emit the exact
    median (hash-comparable) plus a within_tol boolean pinning the
    sketch to ±2% of exact; the oracle asserts TRUE."""
    orders = load_table(spark, sf_dir, "orders")
    approx = F.percentile_approx("o_totalprice", 0.5, 10000)
    exact = F.percentile("o_totalprice", 0.5)
    return orders.groupBy("o_orderpriority").agg(
        F.round(exact, 4).alias("exact_median"),
        (F.abs(approx - exact) <= 0.02 * exact).alias("within_tol"),
    )


@register(
    "op_agg_rollup_merge",
    tags=("agg", "scale"),
    oracle="""
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value,
               ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY ALL
    """,
)
def op_agg_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup re-aggregation: events are first
    aggregated to an HOURLY rollup (count / sum / min / max — all
    mergeable partials), then the hourly rows are merged into DAILY
    figures, with avg recomputed from sum/count rather than averaged.

    The oracle is the direct daily aggregate, proving the two-level
    merge is lossless. This is the continuous-aggregate pattern at
    100 TB: the hourly rollup is tiny (O(hours × types)), is the only
    thing long queries re-read, and any coarser grain derives from it
    without touching raw events — provided every stored measure is a
    mergeable partial, which this operator demonstrates.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("value").alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("c").alias("n_events"),
            F.round(F.sum("s"), 2).alias("total_value"),
            (F.round(F.sum("s"), 2) / F.sum("c")).alias("avg_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )


@register(
    "op_agg_hll_merge",
    tags=("agg", "scale"),
    oracle="""
        SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
               event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               TRUE AS within_tol
        FROM events
        GROUP BY ALL
    """,
)
def op_agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup via Datasketches HLL: hourly
    ``hll_sketch_agg(user_id)`` sketches are unioned into daily
    estimates with ``hll_union_agg`` — the one aggregate
    ``op_agg_rollup_merge`` cannot cover, because COUNT(DISTINCT) is
    not a mergeable partial but an HLL sketch is.

    At 100 TB this is the only viable shape for distinct users over
    arbitrary grains: the hourly sketch table is O(hours x types x
    sketch_size) bytes, re-aggregates to day/week/month without
    touching raw events, and the union is associative so AQE can
    combine partials anywhere. The oracle pins the exact daily
    distinct count; the query itself asserts the merged estimate
    lands within HLL's error envelope (lgConfigK=12 -> ~1.6% rse;
    5% tolerance) and returns the exact value, so the driver hash
    check stays deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily_est = (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.countDistinct("user_id").alias("exact_distinct"))
    return exact.join(daily_est, ["day", "event_type"]).select(
        "day",
        "event_type",
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_tol"),
    )


@register(
    "op_agg_topk_sketch",
    tags=("agg", "scale"),
    oracle="""
        SELECT event_type AS item,
               CAST(COUNT(*) AS BIGINT) AS est_count
        FROM events
        GROUP BY event_type
        ORDER BY est_count DESC
        LIMIT 3
    """,
)
def op_agg_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the approx_top_k sketch (Spark 4): a single
    bounded-memory aggregate tracks the most frequent items, then the
    sketch unnests to (item, est_count) rows.

    When the tracked-item budget covers the true cardinality (here: 5
    event types, default budget 10k) the sketch is exact, which is
    what lets the oracle pin values; past the budget it degrades to
    approximate counts with the same O(budget) state per partition —
    the property that makes global top-k on a 100 TB key space
    feasible without a full groupBy of every key.
    """
    events = load_table(spark, sf_dir, "events")
    sk = events.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").cast("bigint").alias("est_count"),
    )


@register(
    "op_agg_mode",
    tags=("agg",),
    oracle="""
        WITH counted AS (
            SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
            FROM orders
            GROUP BY o_orderpriority, o_orderstatus
        ), ranked AS (
            SELECT o_orderpriority, o_orderstatus, n,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY n DESC, o_orderstatus ASC
                   ) AS rn
            FROM counted
        )
        SELECT o_orderpriority,
               o_orderstatus AS modal_status,
               CAST(n AS BIGINT) AS modal_count
        FROM ranked WHERE rn = 1
    """,
)
def op_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value).

    Spark's native ``mode()`` (and DuckDB's) returns an ARBITRARY
    value under frequency ties, so it can never sit behind a
    cross-engine contract. The engine instead pins the tie-break
    explicitly: count per (group, value) — a partial-aggregable hash
    agg, shuffle O(distinct pairs) — then row_number ordered by
    (count DESC, value ASC). Same two-shuffle shape mode() itself
    needs, with reproducible output on any engine and cluster shape.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    counted = orders.groupBy("o_orderpriority", "o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("n").desc(), F.col("o_orderstatus").asc())
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            F.col("n").cast("bigint").alias("modal_count"),
        )
    )


@register(
    "op_agg_equidepth",
    tags=("agg", "scale"),
    oracle="""
        WITH c AS (
            SELECT o_totalprice,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        cuts AS (
            SELECT list_transform(
                       quantile_cont(cents, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                       x -> CAST(FLOOR(x) AS BIGINT)
                   ) AS cq
            FROM c
        )
        SELECT CAST(1 + len(list_filter(cq, x -> cents > x)) AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM c, cuts
        GROUP BY bucket
    """,
)
def op_agg_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram over o_totalprice:
    decile cut points from ONE percentile aggregate, broadcast back,
    bucket = 1 + (number of cuts strictly below the value) as a pure
    row expression — the boundary set a cost-based optimizer or a
    skew diagnoser wants (equi-WIDTH, op_agg_histogram, starves to
    empty buckets on skewed data; equi-depth never does).

    Until round 5 this op was the registry's last unbounded-input
    global window (ntile(10) over all orders single-partitions by
    construction: Spark plans ONE WindowExec task for an unpartitioned
    window — it does not range-partition it). Rewritten both-sides to
    the op_rfm_scores broadcast-cut-points recipe
    (operators/behavior.py): the only shuffles left are the scalar
    percentile reduction and the final 10-group aggregate, so the
    plan stripes at 100 TB (swap exact ``percentile`` for
    ``approx_percentile`` there; cuts shift within sketch error,
    assignment is unchanged). Boundary semantics differ from ntile
    deliberately: equal values always share a bucket (value-based
    buckets), so populations are near-equal rather than exactly
    equal — the semantics a histogram consumer actually assumes.

    Cross-engine determinism: quantiles interpolate, and Spark's and
    DuckDB's lerp formulations may differ by an ulp at interpolated
    boundaries — fatal to a strict ``value > cut`` comparison (the
    registry's power() rule, registry.py). Dodge: compare on an
    INTEGER grid. Prices are exact cents, so the op quantizes to
    ``cents = round(price*100)`` and floors the cut points; for
    integer v, ``v > c  <=>  v > floor(c)``, and floor collapses
    sub-integer ulp noise. tests/test_invariants.py pins the floored
    cut arrays bit-identical across both engines at every test sf.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    qarr = F.array(*[F.lit(k / 10.0) for k in range(1, 10)])
    cuts = orders.agg(
        F.transform(
            F.percentile("cents", qarr), lambda x: F.floor(x).cast("bigint")
        ).alias("cq")
    )
    bucket = F.size(F.filter(F.col("cq"), lambda c: F.col("cents") > c)) + 1
    return (
        orders.join(F.broadcast(cuts))
        .select("o_totalprice", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "op_agg_countmin",
    tags=("agg", "scale", "sketch"),
    oracle="""
        WITH terms AS (
            SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
        ),
        hashes AS (
            SELECT term, j,
                   CAST(CONCAT('0x', substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 8)) AS BIGINT) % 128 AS bucket
            FROM terms, UNNEST([0, 1, 2, 3]) AS u(j)
        ),
        sketch AS (
            SELECT j, bucket, COUNT(*) AS cell_n FROM hashes GROUP BY j, bucket
        ),
        exact AS (
            SELECT term, COUNT(*) AS exact_n FROM terms GROUP BY term
        ),
        heavy AS (
            SELECT term, exact_n,
                   ROW_NUMBER() OVER (ORDER BY exact_n DESC, term) AS rank
            FROM exact QUALIFY rank <= 10
        ),
        qcells AS (
            SELECT h.term, h.exact_n, h.rank, u.j,
                   CAST(CONCAT('0x', substr(md5(CAST(u.j AS VARCHAR) || ':' || h.term), 1, 8)) AS BIGINT) % 128 AS bucket
            FROM heavy h, UNNEST([0, 1, 2, 3]) AS u(j)
        )
        SELECT q.term, q.exact_n, CAST(q.rank AS INT) AS rank,
               MIN(s.cell_n) AS cm_est,
               MIN(s.cell_n) - q.exact_n AS overcount
        FROM qcells q JOIN sketch s ON s.j = q.j AND s.bucket = q.bucket
        GROUP BY q.term, q.exact_n, q.rank
    """,
)
def op_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus term stream (depth 4 x width
    128, md5-derived hash family), audited against exact counts for
    the top-10 heavy hitters: estimate = min over rows of the hashed
    cell count, and overcount = est - exact is provably >= 0.

    The sketch is the 100 TB answer to "frequencies of an unbounded
    key space in bounded memory": each partition folds its term
    stream into a d x w integer grid (map-side combinable — the grid
    is a sum of per-partition grids), and only d*w cells ever
    shuffle. The deterministic md5 hash family makes the whole
    estimate value-oracled, not just shape-checked.

    The heavy-hitter cut is orderBy+limit — TakeOrderedAndProject
    keeps a 10-row heap per partition and merges on the driver, so
    the full term vocabulary never lands in one partition; the rank
    window then runs over only the 10 survivors (same rewrite as
    op_text_ngrams)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))

    def bucket(j, term_col):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), term_col)), 1, 8), 16, 10)
            .cast("bigint") % 128
        )

    rows = F.array(*[
        F.struct(F.lit(j).alias("j"), bucket(j, F.col("term")).alias("bucket"))
        for j in range(4)
    ])
    sketch = (
        terms.select(F.explode(rows).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    w = Window.orderBy(F.col("exact_n").desc(), "term")
    heavy = (
        exact.orderBy(F.col("exact_n").desc(), "term")
        .limit(10)
        .withColumn("rank", F.row_number().over(w))
    )
    qcells = heavy.select(
        "term", "exact_n", "rank", F.explode(rows).alias("c")
    ).select("term", "exact_n", "rank", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        qcells.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term", "exact_n", "rank")
        .agg(F.min("cell_n").alias("cm_est"))
        .select(
            "term", "exact_n", F.col("rank").cast("int"),
            "cm_est", (F.col("cm_est") - F.col("exact_n")).alias("overcount"),
        )
    )


@register(
    "op_grouping_id",
    tags=("agg",),
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def op_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping_id disambiguation for multi-level
    aggregates: a rollup row where l_returnflag is NULL-because-
    aggregated carries gid bit 2, distinguishing it from a NULL data
    value — the correctness detail every ROLLUP consumer needs before
    COALESCE-labelling subtotal rows.

    Same single-pass expand-then-aggregate plan as op_rollup; the
    grouping id is a zero-cost virtual column of the expand."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid", "n", "sum_qty",
        )
    )


@register(
    "op_agg_bitmap_distinct",
    tags=("agg", "scale", "sketch"),
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_distinct_bitmap,
               COUNT(DISTINCT l_orderkey) AS n_distinct_exact
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps (Spark 3.5+
    bitmap_* functions): keys bucket into 32k-bit bitmaps
    (bitmap_bucket_number / bitmap_bit_position), each group
    aggregates OR-merged bitmap chunks, and the distinct count is the
    sum of per-bucket popcounts.

    This sits between countDistinct and HLL on the 100 TB menu:
    exact like countDistinct, but the shuffle carries fixed-size
    bitmap chunks instead of every distinct raw value, and — unlike
    countDistinct — partial results MERGE (OR is associative), so
    it composes with rollup-merge incrementality
    (op_agg_rollup_merge). Cost model: ~4 KB per occupied 32k-key
    bucket per group; wins when distinct values per group dwarf the
    occupied-bucket count. The query also emits the plain
    countDistinct so the oracle pins bitmap == exact."""
    li = load_table(spark, sf_dir, "lineitem")
    per_bucket = (
        li.select("l_returnflag", F.col("l_orderkey").alias("k"))
        .groupBy("l_returnflag", F.expr("bitmap_bucket_number(k)").alias("bk"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(k))").alias("b"))
    )
    bitmap_counts = per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.expr("bitmap_count(b)")).alias("n_distinct_bitmap")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_distinct_exact")
    )
    return bitmap_counts.join(exact, "l_returnflag")


@register(
    "op_agg_pivot_multi",
    tags=("agg",),
    oracle="""
        SELECT l_returnflag,
               ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS o_qty,
               CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS o_items,
               ROUND(COALESCE(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS f_qty,
               CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS f_items
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with MULTIPLE aggregates per pivoted value: each
    (value, aggregate) pair becomes its own output column — the
    wide-report shape single-agg pivot (op_agg_pivot) can't emit in
    one pass. Spark names pivot columns `<value>_<alias>`; they're
    re-aliased to the oracle's names.

    Still ONE scan and one partial+final hash aggregate: the pivot
    column list is declared (no distinct-discovery pre-pass, which at
    100 TB is a full extra scan), and every aggregate is map-side
    combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0)), 2).alias("qty"),
            F.count(F.lit(1)).alias("items"),
        )
        .select(
            "l_returnflag",
            F.coalesce(F.col("O_qty"), F.lit(0)).alias("o_qty"),
            F.coalesce(F.col("O_items"), F.lit(0)).alias("o_items"),
            F.coalesce(F.col("F_qty"), F.lit(0)).alias("f_qty"),
            F.coalesce(F.col("F_items"), F.lit(0)).alias("f_items"),
        )
    )


@register(
    "op_agg_corr",
    tags=("agg", "stats"),
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
               ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
               ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS price_at_zero
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def op_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, population
    covariance, and the least-squares line (slope/intercept) of price
    on quantity — the summary-statistics surface a feature-engineering
    pass runs before model training.

    All four are single-pass mergeable aggregates (sum/sum-of-products
    moments), so Spark computes them with one shuffle of O(groups)
    partial states — the same cost as a plain sum at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("price_at_zero"),
    )


@register(
    "op_agg_string_agg",
    tags=("agg", "string"),
    oracle="""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               COUNT(*) AS n_nations
        FROM nation
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def op_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg): concatenate the
    group's values in a deterministic order — the report-building and
    label-assembly primitive.

    Spark has no ordered listagg, so the idiom is collect_list ->
    array_sort -> array_join: collect order is partition-dependent, the
    sort makes the result deterministic (and hash-comparable). State is
    O(group payload) — at 100 TB keep it to dimension-sized groups or
    cap with slice()."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "op_agg_histogram2d",
    tags=("agg", "histogram"),
    oracle="""
        SELECT CAST(LEAST(GREATEST(FLOOR(l_quantity / 5), 0), 9) AS INT) AS qty_bin,
               CAST(LEAST(GREATEST(FLOOR(l_extendedprice / 10000), 0), 9) AS INT) AS price_bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY 1, 2
    """,
)
def op_agg_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D binned co-occurrence grid (quantity x price deciles of the
    value range) — the joint-distribution heatmap behind drift checks
    and feature-correlation triage, as one hash aggregate.

    Bin indices are computed in the scan projection (clamped floor
    division — portable across engines, unlike width_bucket whose edge
    semantics differ), so the shuffle carries at most 100 group states
    per partition regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")

    def bin_(col, step):
        return F.least(
            F.greatest(F.floor(col / step), F.lit(0)), F.lit(9)
        ).cast("int")

    return (
        li.groupBy(
            bin_(F.col("l_quantity"), 5).alias("qty_bin"),
            bin_(F.col("l_extendedprice"), 10000).alias("price_bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "op_agg_skew_kurtosis",
    tags=("agg", "stats"),
    oracle="""
        WITH mu AS (
            SELECT l_returnflag, AVG(l_extendedprice) AS m, var_pop(l_extendedprice) AS v
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(POW(l.l_extendedprice - mu.m, 3)) / (mu.v * SQRT(mu.v)), 5) AS pop_skewness,
               ROUND(AVG(POW(l.l_extendedprice - mu.m, 4)) / POW(mu.v, 2) - 3, 5) AS pop_excess_kurtosis
        FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
        GROUP BY l.l_returnflag, mu.m, mu.v
    """,
)
def op_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group, computed as
    EXPLICIT two-pass centered moments (group means broadcast back,
    then avg((x-mu)^k)) — the distribution-shape summary behind drift
    detection and outlier triage.

    Why not the built-ins: Spark's skewness/kurtosis are population
    estimators while DuckDB's carry Fisher's sample adjustment; the
    (1.5/n)-relative gap lands exactly at the 4th decimal at fixture
    group sizes, so the portable form is the explicit moment math.
    Cost: two scans and one broadcast of O(groups) stats — the
    centered second pass is also numerically stabler than raw power
    sums at 100 TB value ranges."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    mu = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("m"), F.var_pop("l_extendedprice").alias("v")
    )
    d = F.col("l_extendedprice") - F.col("m")
    return (
        li.join(F.broadcast(mu), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # v^1.5 as v*sqrt(v): multiply and sqrt are correctly
            # rounded in both engines; libm pow(x, 1.5) is not
            # (registry power() rule; lint: test_no_inexact_power_in_oracles)
            F.round(F.avg(F.pow(d, 3)) / (F.first("v") * F.sqrt(F.first("v"))), 5).alias("pop_skewness"),
            F.round(F.avg(F.pow(d, 4)) / F.pow(F.first("v"), 2) - 3, 5).alias("pop_excess_kurtosis"),
        )
    )


@register(
    "op_agg_weighted",
    tags=("agg", "stats"),
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price,
               ROUND(SUM(l_quantity * POW(l_extendedprice - (
                   SELECT SUM(i.l_extendedprice * i.l_quantity) / SUM(i.l_quantity)
                   FROM lineitem i WHERE i.l_returnflag = l.l_returnflag
               ), 2)) / SUM(l_quantity), 2) AS wvar_price
        FROM lineitem l
        GROUP BY l_returnflag
    """,
)
def op_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean and variance of price per group — the
    weighted-statistics surface (exposure-weighted averages, sample-
    weight-aware feature stats) Spark has no built-in for.

    Same two-pass broadcast shape as op_agg_skew_kurtosis: weighted
    means first, then the weighted second moment around them. Both
    passes are plain sum aggregates — mergeable partials, one shuffle
    of O(groups) state each."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    wm = li.groupBy("l_returnflag").agg(
        (F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity")).alias("wavg")
    )
    return (
        li.join(F.broadcast(wm), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.first("wavg"), 4).alias("wavg_price"),
            F.round(
                F.sum(F.col("l_quantity") * F.pow(F.col("l_extendedprice") - F.col("wavg"), 2))
                / F.sum("l_quantity"),
                2,
            ).alias("wvar_price"),
        )
    )


@register(
    "op_agg_time_decay",
    tags=("agg", "timeseries"),
    oracle="""
        WITH ref AS (
            SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS ref_us FROM events
        ),
        weighted AS (
            SELECT e.user_id,
                   EXP(-LN(2) * ((ref_us - epoch_us(CAST(e.ts AS TIMESTAMP))) / 86400000000.0) / 7.0) AS w,
                   e.value
            FROM events e, ref
        )
        SELECT user_id,
               ROUND(SUM(w), 4) AS decayed_count,
               ROUND(SUM(w * value), 4) AS decayed_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM weighted
        GROUP BY user_id
        HAVING COUNT(*) >= 20
    """,
)
def op_agg_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed per-user activity (half-life 7 days,
    anchored at the corpus max timestamp): the recency-weighted count /
    value sums that feed churn and engagement features — a decayed sum
    ages uniformly by a scalar multiple, so the feature never needs a
    full recompute, only `old * decay + new`.

    Shape: the reference instant is a 1-row max() aggregate broadcast
    back (scalar subquery, not a window over the full stream); the
    weight is a per-row JVM expression; then ONE partial-aggregating
    groupBy(user_id). Timestamps compare in microseconds on both
    engines (unix_micros / epoch_us) — second-truncation would shift
    weights."""
    events = load_table(spark, sf_dir, "events")
    ref = events.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    age_days = (F.col("ref_us") - F.unix_micros(F.col("ts"))) / 86400000000.0
    w = F.exp(F.lit(-0.6931471805599453) * age_days / 7.0)
    return (
        events.join(F.broadcast(ref))
        .select("user_id", w.alias("w"), "value")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("w"), 4).alias("decayed_count"),
            F.round(F.sum(F.col("w") * F.col("value")), 4).alias("decayed_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("n_events") >= 20)
    )


@register(
    "op_agg_incremental_maintain",
    tags=("agg", "scale", "cdc"),
    oracle="""
        SELECT o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def op_agg_incremental_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate-view maintenance with RETRACTION: a
    yesterday's-snapshot aggregate is brought up to date by applying a
    CDC batch's algebraic deltas (updates contribute new−old, inserts
    contribute new, counts adjust by ±1) — the base table is never
    rescanned. The oracle recomputes from the current snapshot,
    proving the delta algebra is lossless.

    The synthetic history is derived deterministically from orders:
    keys %17==0 are today's inserts (absent from the base), keys
    %13==0 among the rest were updated (base holds 0.9× the price).

    This is the step past op_agg_rollup_merge's merge-only partials:
    sums and counts form a GROUP (subtractable), so updates retract in
    O(|batch|); min/max don't — maintaining those incrementally needs
    the rollup-level recompute that op keeps cheap. At 100 TB the
    updated aggregate costs one scan of the batch plus a join of two
    O(groups) tables."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    is_new = key % 17 == 0
    is_upd = (key % 13 == 0) & ~is_new
    base = orders.filter(~is_new).withColumn(
        "price0",
        F.when(is_upd, F.col("o_totalprice") * 0.9).otherwise(F.col("o_totalprice")),
    )
    base_agg = base.groupBy("o_orderpriority").agg(
        F.sum("price0").alias("rev0"), F.count(F.lit(1)).alias("n0")
    )
    updates = orders.filter(is_upd).select(
        "o_orderpriority",
        (F.col("o_totalprice") - F.col("o_totalprice") * 0.9).alias("drev"),
        F.lit(0).alias("dn"),
    )
    inserts = orders.filter(is_new).select(
        "o_orderpriority", F.col("o_totalprice").alias("drev"), F.lit(1).alias("dn")
    )
    delta_agg = (
        updates.unionByName(inserts)
        .groupBy("o_orderpriority")
        .agg(F.sum("drev").alias("drev"), F.sum("dn").alias("dn"))
    )
    return (
        base_agg.join(delta_agg, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.round(
                F.coalesce(F.col("rev0"), F.lit(0.0)) + F.coalesce(F.col("drev"), F.lit(0.0)), 2
            ).alias("revenue"),
            (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias("n_orders"),
        )
    )


# Poisson(1) inverse-CDF thresholds P(X <= k), shared verbatim with the
# DuckDB oracle: the bootstrap weight ladder must be bit-identical.
_POIS1_CDF = (0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
              0.9963401532, 0.9994058152)


@register(
    "op_agg_bootstrap_ci",
    tags=("agg", "stats"),
    oracle="""
        WITH rep AS (
            SELECT b, o_totalprice,
                   (CAST(CONCAT('0x', substr(md5('bs1' || CAST(o_orderkey AS VARCHAR) || '_' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                       / 4294967296.0 AS u
            FROM orders, UNNEST(range(16)) AS t(b)
        ),
        weighted AS (
            SELECT b, o_totalprice,
                   CASE WHEN u < 0.3678794412 THEN 0
                        WHEN u < 0.7357588823 THEN 1
                        WHEN u < 0.9196986029 THEN 2
                        WHEN u < 0.9810118431 THEN 3
                        WHEN u < 0.9963401532 THEN 4
                        WHEN u < 0.9994058152 THEN 5
                        ELSE 6 END AS w
            FROM rep
        ),
        per_rep AS (
            SELECT b, SUM(w * o_totalprice) / SUM(w) AS m FROM weighted GROUP BY b
        ),
        boot AS (
            SELECT AVG(m) AS bm, stddev_samp(m) AS se FROM per_rep
        ),
        point AS (SELECT AVG(o_totalprice) AS pm FROM orders)
        SELECT CAST(16 AS INT) AS n_replicas,
               ROUND(pm, 2) AS point_mean,
               ROUND(bm, 2) AS boot_mean,
               ROUND(se, 2) AS boot_se,
               ROUND(bm - 1.96 * se, 2) AS ci_lo,
               ROUND(bm + 1.96 * se, 2) AS ci_hi
        FROM boot, point
    """,
)
def op_agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al.'s 'Estimating Uncertainty
    for Massive Data Streams' shape): 16 resample replicas of the mean
    order price, each row's replica multiplicity drawn Poisson(1) via
    the registry's deterministic md5-uniform + an inverse-CDF ladder —
    no sampling WITH replacement (impossible distributedly), no
    second pass, and reproducible across any partition layout, which
    is why every replica mean and the CI itself value-oracle exactly.

    Shape: one explode by the replica count (bounded fan-out, the
    single knob), one hash aggregate to O(B) replica means, one O(B)
    reduction to the interval. At 100 TB, B=16-64 replicas costs B
    map-side-combined partial aggregates — uncertainty for one extra
    shuffle of O(B × groups) rows — and the same ladder drops in for
    any other mergeable statistic."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rep = orders.select(
        "o_orderkey", "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs1"),
                        F.col("o_orderkey").cast("string"),
                        F.lit("_"),
                        F.col("b").cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    w = F.lit(6)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < _POIS1_CDF[k], k).otherwise(w)
    per_rep = (
        rep.select("b", "o_totalprice", w.alias("w"))
        .groupBy("b")
        .agg((F.sum(F.col("w") * F.col("o_totalprice")) / F.sum("w")).alias("m"))
    )
    boot = per_rep.agg(F.avg("m").alias("bm"), F.stddev_samp("m").alias("se"))
    point = orders.agg(F.avg("o_totalprice").alias("pm"))
    return (
        boot.join(F.broadcast(point))
        .select(
            F.lit(16).alias("n_replicas"),
            F.round("pm", 2).alias("point_mean"),
            F.round("bm", 2).alias("boot_mean"),
            F.round("se", 2).alias("boot_se"),
            F.round(F.col("bm") - 1.96 * F.col("se"), 2).alias("ci_lo"),
            F.round(F.col("bm") + 1.96 * F.col("se"), 2).alias("ci_hi"),
        )
    )


@register(
    "op_agg_winsorize",
    tags=("agg", "stats"),
    oracle="""
        WITH cuts AS (
            SELECT c_mktsegment AS seg,
                   quantile_cont(c_acctbal, 0.05) AS p05,
                   quantile_cont(c_acctbal, 0.95) AS p95
            FROM customer GROUP BY c_mktsegment
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(AVG(c_acctbal), 4) AS raw_mean,
               ROUND(AVG(LEAST(GREATEST(c_acctbal, p05), p95)), 4) AS winsorized_mean,
               CAST(COUNT(*) FILTER (WHERE c_acctbal < p05 OR c_acctbal > p95) AS BIGINT) AS n_clamped
        FROM customer JOIN cuts ON c_mktsegment = seg
        GROUP BY c_mktsegment
    """,
)
def op_agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clamped) mean per segment — the robust
    aggregate that tames heavy-tailed metrics without dropping rows.

    Two-pass broadcast shape (the op_agg_skew_kurtosis pattern): pass
    one reduces to O(groups) exact percentile cuts, which broadcast
    back for the clamp in pass two — two scans, two hash aggregates,
    zero extra shuffles of the fact table. At 100 TB swap the exact
    percentile for approx_percentile in pass one; the clamp pass is
    unchanged."""
    customer = load_table(spark, sf_dir, "customer")
    cuts = customer.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.percentile("c_acctbal", 0.05).alias("p05"),
        F.percentile("c_acctbal", 0.95).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("c_acctbal"), F.col("p05")), F.col("p95"))
    return (
        customer.join(F.broadcast(cuts), F.col("c_mktsegment") == F.col("seg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("raw_mean"),
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.count(
                F.when((F.col("c_acctbal") < F.col("p05")) | (F.col("c_acctbal") > F.col("p95")), 1)
            ).alias("n_clamped"),
        )
    )


@register(
    "op_agg_quantile_sketch",
    tags=("agg", "scale", "sketch"),
    oracle="""
        WITH bounds AS (
            SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
        ),
        binned AS (
            SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 64)) AS INT), 63) AS bin,
                   lo, hi
            FROM orders, bounds
        ),
        hist AS (
            SELECT bin, lo, hi, COUNT(*) AS c FROM binned GROUP BY bin, lo, hi
        ),
        cum AS (
            SELECT bin, lo, hi, c,
                   SUM(c) OVER (ORDER BY bin) AS cum_c,
                   SUM(c) OVER () AS total
            FROM hist
        ),
        est AS (
            SELECT
              MIN(CASE WHEN cum_c >= 0.5 * total THEN lo + (bin + 1) * ((hi - lo) / 64) END) AS p50_est,
              MIN(CASE WHEN cum_c >= 0.9 * total THEN lo + (bin + 1) * ((hi - lo) / 64) END) AS p90_est,
              ANY_VALUE((hi - lo) / 64) AS binw
            FROM cum
        ),
        exact AS (
            SELECT quantile_cont(o_totalprice, 0.5) AS p50_x,
                   quantile_cont(o_totalprice, 0.9) AS p90_x
            FROM orders
        )
        SELECT CAST(64 AS INT) AS n_bins,
               ROUND(binw, 4) AS bin_width,
               (ABS(p50_est - p50_x) <= binw) AS p50_within_bin,
               (ABS(p90_est - p90_x) <= binw) AS p90_within_bin
        FROM est, exact
    """,
)
def op_agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile estimation — the histogram-sketch pattern
    behind t-digest/KLL at warehouse scale: 64 equal-width bin counts
    are the partial state (mergeable by addition across any shard
    split, unlike exact percentiles), the quantile is read off the
    merged cumulative histogram as the upper edge of the straddling
    bin, and the in-query audit proves the estimate lands within one
    bin width of the exact percentile_cont — the error bound fixed-
    width histograms guarantee by construction.

    Two aggregates (bounds, bins) and an O(bins) window — at 100 TB
    the bin counts are the ONLY cross-shard state, 64 longs per
    merge; the exact-percentile audit runs on the sampled window, or
    is dropped once the sketch is trusted."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
    binw = (F.col("hi") - F.col("lo")) / 64
    hist = (
        orders.join(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / binw).cast("int"), F.lit(63)
            ).alias("bin"),
            "lo", "hi",
        )
        .groupBy("bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = hist.select(
        "bin", "lo", "hi", "c",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("total"),
    )
    edge = F.col("lo") + (F.col("bin") + 1) * binw
    est = cum.agg(
        F.min(F.when(F.col("cum_c") >= 0.5 * F.col("total"), edge)).alias("p50_est"),
        F.min(F.when(F.col("cum_c") >= 0.9 * F.col("total"), edge)).alias("p90_est"),
        F.first(binw).alias("binw"),
    )
    exact = orders.agg(
        F.percentile("o_totalprice", 0.5).alias("p50_x"),
        F.percentile("o_totalprice", 0.9).alias("p90_x"),
    )
    return (
        est.join(F.broadcast(exact))
        .select(
            F.lit(64).alias("n_bins"),
            F.round("binw", 4).alias("bin_width"),
            (F.abs(F.col("p50_est") - F.col("p50_x")) <= F.col("binw")).alias("p50_within_bin"),
            (F.abs(F.col("p90_est") - F.col("p90_x")) <= F.col("binw")).alias("p90_within_bin"),
        )
    )


@register(
    "op_agg_hll_transparent",
    tags=("agg", "scale", "sketch"),
    oracle="""
        WITH hashed AS (
            SELECT DISTINCT CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
            FROM orders
        ),
        slotted AS (
            SELECT h % 64 AS bucket, h // 64 AS w FROM hashed
        ),
        regs AS (
            SELECT bucket,
                   MAX(CASE WHEN w = 0 THEN 27
                            ELSE 26 - CAST(FLOOR(log2(w)) AS INT) END) AS m_rank
            FROM slotted GROUP BY bucket
        ),
        spine AS (
            SELECT UNNEST(range(64)) AS bucket
        ),
        full_regs AS (
            SELECT s.bucket, COALESCE(r.m_rank, 0) AS m_rank
            FROM spine s LEFT JOIN regs r ON s.bucket = r.bucket
        ),
        est AS (
            SELECT 0.709 * 64 * 64 / SUM(POWER(2.0, -m_rank)) AS e_raw,
                   SUM(CASE WHEN m_rank = 0 THEN 1 ELSE 0 END) AS v_zero
            FROM full_regs
        ),
        corrected AS (
            SELECT CASE WHEN e_raw <= 2.5 * 64 AND v_zero > 0
                        THEN 64 * LN(64.0 / v_zero) ELSE e_raw END AS e
            FROM est
        ),
        exact AS (
            SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders
        )
        SELECT CAST(n_exact AS BIGINT) AS n_exact,
               ROUND(e, 4) AS hll_estimate,
               ROUND(ABS(e - n_exact) / n_exact, 4) AS rel_err,
               (ABS(e - n_exact) / n_exact <= 0.25) AS within_25pct
        FROM corrected, exact
    """,
)
def op_agg_hll_transparent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSPARENT HyperLogLog (Flajolet et al.): 64 registers over an
    md5-derived 32-bit hash — every intermediate (bucket, rank,
    register, harmonic mean, small-range correction) is identical
    arithmetic in both engines, so unlike approx_count_distinct
    (engine-private hash, tolerance-audited) the ESTIMATE ITSELF
    value-oracles exactly. The op_dedup_minhash_banded pattern applied
    to cardinality sketching.

    rank = leading-zero count of the 26-bit suffix (log2 floor — no
    loops); registers are a 64-group max aggregate (mergeable by MAX
    across any shard split — the entire point of HLL at 100 TB: 64
    bytes of state per shard, union = element-wise max); the missing-
    bucket spine is a generated 64-row dimension. Expected error
    1.04/√64 ≈ 13%; the audit pins 25%."""
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    slotted = orders.select(h.alias("h")).distinct().select(
        (F.col("h") % 64).alias("bucket"), F.floor(F.col("h") / 64).alias("w")
    )
    rank = F.when(F.col("w") == 0, 27).otherwise(
        26 - F.floor(F.log2("w")).cast("int")
    )
    regs = slotted.groupBy("bucket").agg(F.max(rank).alias("m_rank"))
    spine = spark.range(64).select(F.col("id").alias("bucket"))
    full_regs = spine.join(regs, "bucket", "left").select(
        F.coalesce(F.col("m_rank"), F.lit(0)).alias("m_rank")
    )
    est = full_regs.agg(
        (F.lit(0.709 * 64 * 64) / F.sum(F.pow(F.lit(2.0), -F.col("m_rank")))).alias("e_raw"),
        F.sum(F.when(F.col("m_rank") == 0, 1).otherwise(0)).alias("v_zero"),
    )
    e = F.when(
        (F.col("e_raw") <= 2.5 * 64) & (F.col("v_zero") > 0),
        F.lit(64.0) * F.log(F.lit(64.0) / F.col("v_zero")),
    ).otherwise(F.col("e_raw"))
    exact = orders.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return (
        est.select(e.alias("e"))
        .join(F.broadcast(exact))
        .select(
            "n_exact",
            F.round("e", 4).alias("hll_estimate"),
            F.round(F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact"), 4).alias("rel_err"),
            (F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact") <= 0.25).alias("within_25pct"),
        )
    )


@register(
    "op_agg_multi_distinct",
    tags=("agg",),
    oracle="""
        SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT user_id * 8 + CASE event_type
                       WHEN 'click' THEN 0 WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
                       WHEN 'signup' THEN 3 ELSE 4 END) AS BIGINT) AS n_user_type_pairs,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1
    """,
)
def op_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE distinct aggregates in one pass — the shape Catalyst
    compiles through the Expand operator: each input row fans out once
    per distinct clause (tagged with a grouping id), then ONE
    aggregation tree deduplicates and counts all three alongside the
    plain COUNT(*) — no per-clause self-join, no N scans of the
    stream, which is what the naive plan (join of N single-distinct
    aggregates) costs.

    The fan-out factor equals the number of distinct clauses — the
    knob to watch at 100 TB: four clauses quadruple the shuffled rows,
    at which point mergeable sketches (op_agg_hll_transparent,
    op_agg_bitmap_distinct) replace the exact tail."""
    events = load_table(spark, sf_dir, "events")
    type_code = (
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "purchase", 2)
        .when(F.col("event_type") == "signup", 3)
        .otherwise(4)
    )
    return events.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(F.col("user_id") * 8 + type_code).alias("n_user_type_pairs"),
        F.count(F.lit(1)).alias("n_events"),
    )
