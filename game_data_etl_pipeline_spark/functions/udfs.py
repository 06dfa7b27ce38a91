"""UDF surface (SURVEY.md §2.B op_udf_surface): the sanctioned slow
paths, each demonstrated on a computation the oracle can also express
in plain SQL so correctness is checkable.

Ordering of preference at scale:
1. built-in functions (everything else in this package);
2. pandas_udf — Arrow-batched, vectorized, ~10-100x over row UDFs;
3. applyInPandas / mapInPandas — grouped/partition-wise pandas;
4. row-at-a-time Python UDF — never in a hot path (shown only in
   tests for completeness).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from game_data_etl_pipeline_spark.catalog import load_table
from game_data_etl_pipeline_spark.registry import register


def _make_charge_udf():
    """Arrow-batched scalar pandas UDF: discounted, taxed charge.

    Built lazily: pandas_udf with a DDL return type resolves against the
    active session, which doesn't exist at module import time.
    """
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def charge_vectorized(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        return extended * (1.0 - discount) * (1.0 + tax)

    return charge_vectorized


@register(
    "op_udf_pandas_scalar",
    tags=("udf",),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
        FROM lineitem
        WHERE l_quantity >= 45
    """,
)
def op_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over lineitem; same value as the
    built-in expression (which remains the right choice in production —
    this registers the escape hatch and proves it agrees)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    charge = _make_charge_udf()
    return (
        lineitem.filter(F.col("l_quantity") >= 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charge"),
        )
    )


def _segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF body: weighted average account balance per
    segment. Raw values out — rounding happens Spark-side with F.round
    (HALF_UP, matching the oracle's ROUND); Python round() is
    half-even and money/n quotients land exactly on .xxxx5
    boundaries (the op_udf_cogroup/applyInArrow lesson)."""
    total = pdf["c_acctbal"].sum()
    n = len(pdf)
    return pd.DataFrame(
        {
            "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
            "n_customers": [n],
            "avg_balance": [total / n],
            "sum_balance": [total],
        }
    )


@register(
    "op_udf_grouped_agg",
    tags=("udf",),
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal) / COUNT(*), 4) AS avg_balance,
               ROUND(SUM(c_acctbal), 2) AS sum_balance
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def op_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via applyInPandas: one Arrow batch per group in, one
    aggregate row out. Shuffles on the group key exactly like a
    built-in aggregation; state is bounded by the largest group."""
    customer = load_table(spark, sf_dir, "customer")
    grouped = customer.groupBy("c_mktsegment").applyInPandas(
        _segment_stats,
        schema="c_mktsegment string, n_customers long, avg_balance double, sum_balance double",
    )
    return grouped.select(
        "c_mktsegment", "n_customers",
        F.round("avg_balance", 4).alias("avg_balance"),
        F.round("sum_balance", 2).alias("sum_balance"),
    )


def _partition_normalizer(batches):
    """mapInPandas body: per-batch price normalization (batch-local ops only)."""
    for pdf in batches:
        out = pdf[["p_partkey", "p_retailprice"]].copy()
        out["price_offset"] = (out["p_retailprice"] - 900.0).round(6)
        yield out


@register(
    "op_udf_map_in_pandas",
    tags=("udf",),
    oracle="""
        SELECT p_partkey,
               ROUND(p_retailprice, 2) AS p_retailprice,
               ROUND(p_retailprice - 900.0, 6) AS price_offset
        FROM part
    """,
)
def op_udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: streaming iterator of Arrow batches per partition —
    the shape for custom per-partition operators (decode, tokenize).
    Never accumulates the whole partition in memory."""
    part = load_table(spark, sf_dir, "part")
    out = part.mapInPandas(
        _partition_normalizer,
        schema="p_partkey long, p_retailprice double, price_offset double",
    )
    return out.select("p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"), "price_offset")


def _make_tokenize_udtf():
    """Python UDTF (Spark 3.5+): one input row -> many output rows.

    Built lazily for the same session-resolution reason as the pandas
    UDFs above. The UDTF is the table-valued rung of the UDF ladder:
    use it when a custom expansion has no `explode`-expressible form;
    here tokenization IS explode-expressible, which is what makes it
    oracle-checkable.
    """
    from pyspark.sql.functions import udtf

    class Tokenize:
        def eval(self, doc_id, text):
            for pos, token in enumerate((text or "").split(" ")):
                if token:
                    yield doc_id, pos, token

    return udtf(Tokenize, returnType="doc_id bigint, pos int, token string")


@register(
    "op_udtf_lateral",
    tags=("udf",),
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        SELECT doc_id, CAST(p AS INTEGER) AS pos, w[p + 1] AS token
        FROM t, UNNEST(range(len(w))) AS u(p)
        WHERE w[p + 1] <> ''
    """,
)
def op_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF applied via SQL LATERAL: each document row fans out
    to (doc_id, pos, token) rows, correlated on the outer row's
    columns — the table-function surface (completes the UDF ladder:
    scalar pandas, grouped agg, mapInPandas, UDTF).

    Scale note: a UDTF runs row-at-a-time in Python workers, so in a
    real pipeline this exact expansion should be the built-in
    posexplode(split(...)) (see op_posexplode_array); the operator
    exists to pin the API surface and its exact explode equivalence,
    not as a hot path.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", _make_tokenize_udtf())
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL tokenize_udtf(d.doc_id, d.text) t
        """
    )


def _arrow_discount_batches(batches):
    """mapInArrow body: operate on pyarrow.RecordBatch directly — no
    pandas materialization, columnar in/out."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        ext = batch.column(batch.schema.get_field_index("l_extendedprice"))
        disc = batch.column(batch.schema.get_field_index("l_discount"))
        net = pc.round(pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc)), ndigits=4)
        yield pa.RecordBatch.from_arrays(
            [batch.column(batch.schema.get_field_index("l_orderkey")),
             batch.column(batch.schema.get_field_index("l_linenumber")),
             net],
            names=["l_orderkey", "l_linenumber", "net_price"],
        )


@register(
    "op_udf_map_in_arrow",
    tags=("udf",),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
        FROM lineitem WHERE l_orderkey < 300
    """,
)
def op_udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy rung of the Python UDF ladder — the
    function receives pyarrow RecordBatches and computes with Arrow
    kernels, skipping the Arrow->pandas->Arrow conversion mapInPandas
    pays (which also perturbs types: pandas nullability coercions,
    datetime64 truncation). Use when the Python logic is itself
    columnar (Arrow compute, numpy over buffers, tokenizers with
    Arrow bindings).

    Same distribution contract as mapInPandas: per-partition batch
    iterator, output schema declared up front, no shuffle introduced.
    (This op's arithmetic would of course stay JVM-side in real code
    — it exists to pin the surface's semantics against the oracle.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    return li.mapInArrow(
        _arrow_discount_batches,
        schema="l_orderkey long, l_linenumber int, net_price double",
    )


def _cogroup_conversion(purchases: pd.DataFrame, touches: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas cogroup body: per-user conversion stats from two
    SEPARATELY-grouped inputs delivered side by side."""
    from decimal import ROUND_HALF_UP, Decimal

    uid = (purchases["user_id"].iloc[0] if len(purchases) else touches["user_id"].iloc[0])
    n_p, n_t = len(purchases), len(touches)
    # Half-UP to match DuckDB ROUND / Spark F.round; Python's round()
    # is half-to-even and diverges at exact .xxxx5 boundaries.
    ratio = (
        float((Decimal(n_t) / Decimal(n_p)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))
        if n_p
        else None
    )
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_purchases": [n_p],
            "n_touches": [n_t],
            "touch_per_purchase": [ratio],
        }
    )


@register(
    "op_udf_cogroup",
    tags=("udf",),
    oracle="""
        WITH p AS (
            SELECT user_id, COUNT(*) AS n_purchases FROM events
            WHERE event_type = 'purchase' GROUP BY user_id
        ),
        t AS (
            SELECT user_id, COUNT(*) AS n_touches FROM events
            WHERE event_type IN ('click', 'view') GROUP BY user_id
        )
        SELECT COALESCE(p.user_id, t.user_id) AS user_id,
               COALESCE(n_purchases, 0) AS n_purchases,
               COALESCE(n_touches, 0) AS n_touches,
               CASE WHEN COALESCE(n_purchases, 0) > 0
                    THEN ROUND(COALESCE(n_touches, 0) * 1.0 / n_purchases, 4) END AS touch_per_purchase
        FROM p FULL OUTER JOIN t ON p.user_id = t.user_id
    """,
)
def op_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: purchases and touches group
    INDEPENDENTLY on user_id and arrive as two aligned pandas frames
    per key — the surface for per-key logic that needs both sides
    whole (as-of merges, per-entity reconciliation, trajectory vs
    label alignment) without pre-joining them row-by-row.

    Both sides shuffle once on the cogroup key and meet
    partition-aligned; an absent side arrives as an empty frame (the
    outer-join semantics the oracle mirrors). At 100 TB the caveat is
    per-key materialization: each user's BOTH frames must fit in
    worker memory — heavy keys want the windowed/banded rewrites
    (op_attribution_last_touch) instead."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id")
    touches = ev.filter(F.col("event_type").isin("click", "view")).select("user_id", "event_id")
    return (
        purchases.groupBy("user_id")
        .cogroup(touches.groupBy("user_id"))
        .applyInPandas(
            _cogroup_conversion,
            schema="user_id long, n_purchases long, n_touches long, touch_per_purchase double",
        )
    )


def _make_priority_code_udf():
    """Arrow-optimized row UDF (Spark 4 `useArrow=True`): Arrow handles
    the JVM<->Python transfer in columnar batches, but the function
    body still runs once per row in Python — faster serialization than
    a pickled row UDF, same per-row interpreter cost. Built lazily
    (type resolution needs an active session)."""

    @F.udf(returnType="string", useArrow=True)
    def priority_code(priority: str, total: float) -> str:
        tier = "H" if total >= 200000.0 else "L"
        return f"{priority.split('-')[0]}/{tier}"

    return priority_code


@register(
    "op_udf_arrow_scalar",
    tags=("udf",),
    oracle="""
        SELECT o_orderkey,
               string_split(o_orderpriority, '-')[1] ||
               CASE WHEN o_totalprice >= 200000.0 THEN '/H' ELSE '/L' END AS priority_code
        FROM orders
        WHERE o_orderstatus = 'F'
    """,
)
def op_udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rung of the Python-execution ladder: an
    Arrow-OPTIMIZED row UDF (`@udf(useArrow=True)`) — the designated
    migration path for legacy row-at-a-time UDFs that can't be
    vectorized wholesale. Arrow batching removes the pickle
    serialization tax (the dominant cost of classic row UDFs) while
    keeping per-row Python semantics; pandas_udf stays preferred for
    anything vectorizable, and the oracle proves the built-in
    expression computes the same thing (which production should
    use)."""
    orders = load_table(spark, sf_dir, "orders")
    code = _make_priority_code_udf()
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", code("o_orderpriority", "o_totalprice").alias("priority_code"))
    )


def _segment_arrow_stats(table):
    """applyInArrow body: per-segment balance stats computed directly
    on the Arrow table with pyarrow.compute — no pandas conversion at
    all (applyInPandas pays Arrow→pandas→Arrow; this stays columnar
    end to end)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    bal = table.column("c_acctbal")
    return pa.table(
        {
            "c_mktsegment": pa.array([table.column("c_mktsegment")[0].as_py()], pa.string()),
            "n_customers": pa.array([table.num_rows], pa.int32()),
            # raw values out: rounding happens Spark-side with F.round
            # (HALF_UP, matching the oracle's ROUND) — Python round()
            # is half-even and flakes on .xxx5 boundaries
            "bal_mean": pa.array([pc.mean(bal).as_py()], pa.float64()),
            "bal_range": pa.array([pc.max(bal).as_py() - pc.min(bal).as_py()], pa.float64()),
        }
    )


@register(
    "op_udf_apply_in_arrow",
    tags=("udf",),
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS INT) AS n_customers,
               ROUND(AVG(c_acctbal), 4) AS bal_mean,
               ROUND(MAX(c_acctbal) - MIN(c_acctbal), 2) AS bal_range
        FROM customer
        GROUP BY c_mktsegment
    """,
)
def op_udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final rung of the Python execution ladder: grouped-map
    applyInArrow — the group arrives as a raw pyarrow.Table and the
    result leaves as one, skipping the pandas materialization that
    applyInPandas inserts on both sides of the batch. For numeric
    kernels that pyarrow.compute (or any Arrow-native library) can
    express, this is the cheapest possible custom grouped operator:
    one columnar copy in, one out.

    Same shuffle as any grouped map (hash partition on the key);
    state is one group per invocation. The oracle proves the Arrow
    kernel agrees with plain SQL aggregation — which, as everywhere
    on this ladder, remains the production answer when SQL can
    express the logic."""
    customer = load_table(spark, sf_dir, "customer")
    grouped = customer.select("c_mktsegment", "c_acctbal").groupBy("c_mktsegment").applyInArrow(
        _segment_arrow_stats,
        schema="c_mktsegment string, n_customers int, bal_mean double, bal_range double",
    )
    return grouped.select(
        "c_mktsegment", "n_customers",
        F.round("bal_mean", 4).alias("bal_mean"),
        F.round("bal_range", 2).alias("bal_range"),
    )


def _trimmed_mean_udaf():
    """Grouped-agg pandas UDF (Series -> scalar), the UDAF flavor that
    Spark also accepts OVER a window frame. Built lazily."""
    import numpy as np

    def _tm(v: pd.Series) -> float:
        a = np.sort(v.to_numpy(dtype="float64"))
        return float(a.mean()) if a.size <= 2 else float(a[1:-1].mean())

    _tm.__annotations__ = {"v": pd.Series, "return": float}
    return F.pandas_udf("double")(_tm)


@register(
    "op_udf_pandas_window",
    tags=("udf", "window"),
    oracle="""
        WITH framed AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   list_sort(LIST(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                   )) AS frame_vals
            FROM events
        )
        SELECT user_id, event_id,
               ROUND(CASE WHEN len(frame_vals) <= 2
                          THEN list_avg(frame_vals)
                          ELSE list_avg(frame_vals[2:len(frame_vals)-1])
                     END, 4) AS trimmed_mean_5
        FROM framed
    """,
)
def op_udf_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF evaluated OVER A WINDOW FRAME — the least-known
    corner of the UDF surface: a grouped-agg pandas_udf (Series →
    scalar) applied to each row's trailing 5-row frame, here a
    min/max-trimmed mean (the robust rolling average). Spark ships
    each frame to the Python worker as an Arrow batch; the frame is
    bounded (5 rows), so the per-row Python cost is constant and the
    shuffle is the ordinary one window shuffle on user_id.

    The oracle expresses the same frame with DuckDB's LIST() window +
    list slicing — which is also the JVM-side escape hatch
    (collect_list over the frame + array_sort + slice) when the
    kernel is expressible without Python; the op registers the API
    surface and proves both agree."""
    events = load_table(spark, sf_dir, "events")
    tm = _trimmed_mean_udaf()
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return events.select(
        "user_id", "event_id", F.round(tm(F.col("value")).over(w), 4).alias("trimmed_mean_5")
    )
