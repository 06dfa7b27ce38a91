"""Window functions and top-k (SURVEY.md §2.B).

Window functions shuffle once on partitionBy keys, then sort within
partitions — no cross-partition state, so they scale with the largest
single partition. Global top-k uses orderBy().limit(k), which Spark
plans as TakeOrderedAndProject: per-partition heaps + driver merge,
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register


@register(
    "op_window_rank",
    tags=("window",),
    headline=True,
    oracle="""
        SELECT * FROM (
            SELECT o_orderpriority, o_orderkey,
                   ROUND(o_totalprice, 2) AS total_price,
                   RANK()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS price_rank,
                   DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS price_dense_rank,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE price_rank <= 5
    """,
)
def op_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number per partition; row_number carries an
    explicit unique tiebreaker (o_orderkey) so output is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    by_price_tb = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.rank().over(by_price).alias("price_rank"),
            F.dense_rank().over(by_price).alias("price_dense_rank"),
            F.row_number().over(by_price_tb).alias("rn"),
        )
        .filter(F.col("price_rank") <= 5)
    )


@register(
    "op_window_agg",
    tags=("window",),
    oracle="""
        SELECT c_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
               ROUND(LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
               ROUND(LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price,
               ROUND(AVG(o_totalprice)  OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_custkey <= 200
    """,
)
def op_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregates: running total, lag/lead, 3-row moving average.
    Order key includes o_orderkey so frames are deterministic under
    duplicate order dates."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_total"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
        )
    )


@register(
    "op_topk",
    tags=("sort",),
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def op_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy + limit -> TakeOrderedAndProject (per-partition
    heaps, no global sort). Unique tiebreaker keeps it deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "o_orderpriority")
    )


@register(
    "op_topk_per_group",
    tags=("window", "sort"),
    oracle="""
        SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS balance
        FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        ) WHERE rn <= 3
    """,
)
def op_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window — the canonical pattern;
    one shuffle on the group key, per-partition sort."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("balance"))
    )


@register(
    "op_sort",
    tags=("sort",),
    oracle="""
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS balance
        FROM customer
        ORDER BY c_acctbal DESC NULLS LAST, c_custkey
        LIMIT 50
    """,
)
def op_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort with explicit null ordering + limit."""
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey"))
        .limit(50)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("balance"))
    )


@register(
    "op_window_ntile",
    tags=("window",),
    oracle="""
        SELECT c_custkey, c_nationkey,
               ROUND(c_acctbal, 2) AS balance,
               NTILE(4)       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS bal_quartile,
               FLOOR(PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) * 1000000 + 0.5) / 1000000 AS bal_pct_rank,
               FLOOR(CUME_DIST()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) * 1000000 + 0.5) / 1000000 AS bal_cume_dist
        FROM customer
    """,
)
def op_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    ntile orders by (c_acctbal, c_custkey) — the unique tiebreaker makes
    bucket assignment deterministic (ntile splits ties by position, so an
    ambiguous order would be run-dependent). percent_rank/cume_dist
    depend only on the key VALUES, so they order by c_acctbal alone.

    The 6dp cut uses floor(x*1e6 + 0.5)/1e6, NOT round(x, 6):
    percent_rank = k/(n-1) can be an exactly-representable binary
    fraction (e.g. 41/640 = 0.0640625) whose scaled value lands
    exactly on .5, where Spark's HALF_UP and DuckDB's binary-double
    rounding disagree. floor-of-shifted is the same IEEE ops on the
    same binary input in both engines, so it cannot split (first hit
    at sf0.1, n=641 rows in a nation)."""
    customer = load_table(spark, sf_dir, "customer")
    w_unique = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_val = Window.partitionBy("c_nationkey").orderBy("c_acctbal")

    def q6(col: Column) -> Column:
        return F.floor(col * 1000000 + F.lit(0.5)) / 1000000

    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("balance"),
        F.ntile(4).over(w_unique).alias("bal_quartile"),
        q6(F.percent_rank().over(w_val)).alias("bal_pct_rank"),
        q6(F.cume_dist().over(w_val)).alias("bal_cume_dist"),
    )


@register(
    "op_window_first_last",
    tags=("window",),
    oracle="""
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               strftime(FIRST_VALUE(o_orderdate) OVER w, '%Y-%m-%d') AS first_order_date,
               strftime(LAST_VALUE(o_orderdate)  OVER w, '%Y-%m-%d') AS last_order_date,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_orderkey
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
)
def op_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-frame.

    The frame is UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING on BOTH
    engines — last_value under the default frame (..CURRENT ROW) is the
    classic silent-wrong-answer, so the frame is always spelled out.
    (o_orderdate, o_orderkey) is a unique order, so nth_value is
    deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.first("o_orderdate").over(w), "yyyy-MM-dd").alias("first_order_date"),
        F.date_format(F.last("o_orderdate").over(w), "yyyy-MM-dd").alias("last_order_date"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
    )


@register(
    "op_scd2_intervals",
    tags=("window", "warehouse"),
    oracle="""
        SELECT user_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(LEAD(CAST(ts AS TIMESTAMP)) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               ROUND(value, 4) AS val,
               (LEAD(event_id) OVER w IS NULL) AS is_current
        FROM events
        WHERE event_type = 'purchase' AND user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def op_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval build: each change event becomes a
    [valid_from, valid_to) validity row, open-ended for the latest.

    The warehouse pattern behind the reference's full-refresh sink's
    missing history (reference etl/pipeline.py:280 drops and rewrites;
    this derives history instead): one shuffle on the entity key,
    lead() closes each interval with the next change's timestamp.
    (event_id tiebreaks equal timestamps, so intervals are
    deterministic.) The is_current flag tests lead(event_id) — not the
    formatted timestamp — so it is NULL-exact.
    """
    events = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return events.select(
        "user_id",
        F.date_format("ts", fmt).alias("valid_from"),
        F.date_format(F.lead("ts").over(w), fmt).alias("valid_to"),
        F.round("value", 4).alias("val"),
        F.lead("event_id").over(w).isNull().alias("is_current"),
    )


@register(
    "op_window_range_interval",
    tags=("window", "timeseries"),
    oracle="""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               ROUND(SUM(value) OVER w, 2) AS sum_1h
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
    """,
)
def op_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, rolling 1-hour count/sum over
    EVENT TIME — the batch twin of a sliding streaming window.

    RANGE (value-based) frames, unlike ROWS frames, are defined by the
    ordering value so ties are peers and gaps shrink the frame — the
    correct semantics for irregular event streams. Ordered on epoch
    MICROseconds to match timestamp-interval arithmetic exactly. One
    shuffle on user_id; frame state is bounded by the hour span."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


@register(
    "op_scd2_asof_lookup",
    tags=("window", "warehouse"),
    oracle="""
        WITH dim AS (
            SELECT user_id, ts AS valid_from,
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
                   ROUND(value, 4) AS dim_val
            FROM events WHERE event_type = 'purchase' AND user_id < 50
        ),
        fact AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click' AND user_id < 50
        )
        SELECT f.event_id, f.user_id, d.dim_val
        FROM fact f JOIN dim d
          ON d.user_id = f.user_id
         AND d.valid_from <= f.ts
         AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def op_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against SCD2 validity intervals:
    each fact row (clicks) joins the dimension version (purchase
    state) that was current AT ITS OWN timestamp — the query every
    SCD2 warehouse exists to answer, and the one a full-refresh sink
    (reference etl/pipeline.py:280) structurally cannot.

    Interval membership [from, to) is expressed as an equi-join on
    the entity key plus residual time-band predicates — a hash join
    with per-key interval filtering, not a BNLJ, because each fact
    matches EXACTLY ONE version (intervals partition the timeline per
    key). The binned rewrite (op_join_range_binned) takes over when
    keys are so hot that per-key interval lists blow up."""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 50))
        .select(
            F.col("user_id").alias("d_uid"), F.col("ts").alias("valid_from"),
            F.lead("ts").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ).alias("valid_to"),
            F.round("value", 4).alias("dim_val"),
        )
    )
    fact = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 50)).select(
        "event_id", "user_id", F.col("ts").alias("f_ts")
    )
    return (
        fact.join(
            dim,
            (F.col("d_uid") == F.col("user_id"))
            & (F.col("valid_from") <= F.col("f_ts"))
            & (F.col("valid_to").isNull() | (F.col("f_ts") < F.col("valid_to"))),
        )
        .select("event_id", "user_id", "dim_val")
    )


@register(
    "op_window_moving_median",
    tags=("window", "timeseries"),
    oracle="""
        SELECT event_id, user_id,
               ROUND(MEDIAN(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ), 4) AS med5,
               ROUND(value - MEDIAN(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ), 4) AS residual
        FROM events
    """,
)
def op_window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median (5-row trailing frame per user): the robust
    smoother for spiky telemetry — one outlier shifts a moving mean
    by outlier/n but leaves the median untouched, which is why
    medfilt precedes anomaly scoring (op_anomaly_mad is its global
    cousin).

    Spark evaluates aggregate `percentile` over a ROWS frame — one
    shuffle on user_id, one sorted pass, O(frame) state per row. At
    100 TB the frame bound (not the partition) caps memory; for wide
    frames swap in approx_percentile with the identical call
    shape."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    med5 = F.round(F.expr("percentile(value, 0.5)").over(w), 4)
    return ev.select(
        "event_id", "user_id",
        med5.alias("med5"),
        F.round(F.col("value") - F.expr("percentile(value, 0.5)").over(w), 4).alias("residual"),
    )


@register(
    "op_window_cume_dist",
    tags=("window",),
    oracle="""
        SELECT s_suppkey, s_nationkey,
               FLOOR(cume_dist() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) * 1000000 + 0.5) / 1000000 AS bal_cume,
               FLOOR(percent_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) * 1000000 + 0.5) / 1000000 AS bal_pctrank
        FROM supplier
    """,
)
def op_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: cume_dist (fraction of the
    partition at-or-below the row) and percent_rank ((rank-1)/(n-1)) —
    the normalized-ranking surface behind percentile cutoffs and
    within-segment scoring.

    Both are tie-stable (equal sort keys get equal scores), so no
    tie-break column is needed for cross-engine determinism. One
    shuffle on the partition key, one sorted pass — rank-family cost.
    The 6dp cut is floor(x*1e6 + 0.5)/1e6, not round(x, 6): k/n and
    k/(n-1) can be exactly-representable binary fractions whose
    scaled value is exactly .5, where Spark HALF_UP and DuckDB
    binary-rounding split (see op_window_ntile)."""
    supplier = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")

    def q6(col: Column) -> Column:
        return F.floor(col * 1000000 + F.lit(0.5)) / 1000000

    return supplier.select(
        "s_suppkey",
        "s_nationkey",
        q6(F.cume_dist().over(w)).alias("bal_cume"),
        q6(F.percent_rank().over(w)).alias("bal_pctrank"),
    )


@register(
    "op_window_islands",
    tags=("window", "sessionize"),
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
            FROM events
        )
        SELECT user_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS island_len,
               MIN(event_id) AS first_event_id
        FROM seq
        GROUP BY user_id, event_type, grp
        HAVING COUNT(*) >= 3
    """,
)
def op_window_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (runs of >= 3 reported), via the classic two-row_number
    difference — rows in one run share (user, type, rn_all - rn_type).

    Streak detection without self-joins or iteration: two window passes
    over the SAME (user_id, ts) sort order — Catalyst reuses the single
    shuffle+sort for both row_numbers (same partition spec), then one
    hash aggregate. Scale cost = one shuffle of the event stream."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    return (
        seq.groupBy("user_id", "event_type", "grp")
        .agg(F.count(F.lit(1)).alias("island_len"), F.min("event_id").alias("first_event_id"))
        .filter(F.col("island_len") >= 3)
        .select("user_id", "event_type", "island_len", "first_event_id")
    )


@register(
    "op_window_rolling_corr",
    tags=("window", "stats"),
    oracle="""
        SELECT event_id, user_id,
               ROUND(corr(value, CAST(event_id AS DOUBLE)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
               ), 3) + 0.0 AS trend_corr
        FROM events
    """,
)
def op_window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling correlation over a trailing 20-row frame: corr(value,
    sequence) per user approximates the local monotone-trend strength —
    the windowed bivariate-statistics surface (rolling beta, rolling
    factor exposure are the same call with different columns).

    corr evaluates as a mergeable moment aggregate over the ROWS frame:
    one shuffle on user_id, one sorted pass, O(1) state per row beyond
    the frame. Rounded to 3dp — both engines accumulate doubles over a
    20-row frame, agreeing far beyond that precision."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    # + 0.0 normalizes IEEE negative zero: DuckDB rounds tiny negative
    # correlations to -0.0 where Spark yields 0.0, and the value hash
    # distinguishes the two
    return ev.select(
        "event_id",
        "user_id",
        (
            F.round(F.corr(F.col("value"), F.col("event_id").cast("double")).over(w), 3)
            + F.lit(0.0)
        ).alias("trend_corr"),
    )


@register(
    "op_window_rolling_distinct",
    tags=("window", "timeseries"),
    oracle="""
        WITH maxd AS (
            SELECT MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_day FROM events
        ),
        contrib AS (
            SELECT DISTINCT
                   UNNEST(generate_series(CAST(CAST(ts AS TIMESTAMP) AS DATE),
                                          CAST(CAST(ts AS TIMESTAMP) AS DATE) + 6,
                                          INTERVAL 1 DAY)) AS day,
                   user_id
            FROM events
        )
        SELECT strftime(c.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
        FROM contrib c, maxd
        WHERE CAST(c.day AS DATE) <= last_day
        GROUP BY 1
    """,
)
def op_window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (trailing WAU) —
    the windowed-distinct aggregate SQL windows cannot express
    (no COUNT(DISTINCT) OVER a frame in either engine).

    Formulation: every event CONTRIBUTES its user to the 7 days it
    keeps that user 'active' (explode of a 7-element date sequence),
    then one distinct + count per day. No range join, no per-day
    rescan of the event table: the blow-up factor is the fixed window
    length, the shuffle carries (day, user_id) pairs, and the whole
    thing is two hash aggregates. At 100 TB swap the exact distinct
    for approx_count_distinct or an HLL-partial column per (day,
    shard) to make the daily partials mergeable (op_agg_hll_merge)."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    last_day = events.agg(F.max(day).alias("last_day"))
    return (
        events.select(
            F.explode(F.sequence(day, F.date_add(day, 6))).alias("day"), "user_id"
        )
        .join(F.broadcast(last_day))
        .filter(F.col("day") <= F.col("last_day"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "op_scd2_merge_batch",
    tags=("window", "warehouse", "cdc"),
    oracle="""
        SELECT user_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               strftime(LEAD(CAST(ts AS TIMESTAMP)) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
               ROUND(value, 4) AS val,
               (LEAD(event_id) OVER w IS NULL) AS is_current
        FROM events
        WHERE event_type = 'purchase' AND user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def op_scd2_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MAINTENANCE: apply a change batch to an existing type-2
    dimension without rebuilding it — close each affected entity's
    open interval at the batch's first change, chain the batch's own
    changes into new intervals, leave closed history untouched. The
    oracle is the FULL REBUILD over all changes: hash-equality proves
    the incremental merge is lossless (the op_agg_incremental_maintain
    proof shape, applied to interval tables).

    The stream splits at the window's temporal midpoint into
    'yesterday's dimension' and 'today's batch' (epoch-µs arithmetic,
    both engines). Cost shape at 100 TB: the base's CLOSED rows are
    untouched (never read past the open-row filter in a real sink);
    the merge is one window over the batch plus an O(affected
    entities) aggregate-and-join — dimension maintenance proportional
    to the change set, not the dimension."""
    events = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 50)
    )
    cut_df = events.agg(
        F.timestamp_micros(
            F.floor((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2).cast("long")
        ).alias("cut")
    )
    tagged = events.join(F.broadcast(cut_df))
    base = tagged.filter(F.col("ts") < F.col("cut"))
    batch = tagged.filter(F.col("ts") >= F.col("cut"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base_iv = base.select(
        "user_id",
        F.col("ts").alias("vf"),
        F.lead("ts").over(w).alias("vt_raw"),
        "value",
        F.lead("event_id").over(w).alias("next_id"),
    )
    first_batch = batch.groupBy("user_id").agg(F.min("ts").alias("fb_ts"))
    closed_base = base_iv.join(F.broadcast(first_batch), "user_id", "left").select(
        "user_id",
        "vf",
        F.coalesce(F.col("vt_raw"), F.col("fb_ts")).alias("vt"),
        "value",
        (F.col("next_id").isNull() & F.col("fb_ts").isNull()).alias("is_current"),
    )
    batch_iv = batch.select(
        "user_id",
        F.col("ts").alias("vf"),
        F.lead("ts").over(w).alias("vt"),
        "value",
        F.lead("event_id").over(w).isNull().alias("is_current"),
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return closed_base.unionByName(batch_iv).select(
        "user_id",
        F.date_format("vf", fmt).alias("valid_from"),
        F.date_format("vt", fmt).alias("valid_to"),
        F.round("value", 4).alias("val"),
        "is_current",
    )
