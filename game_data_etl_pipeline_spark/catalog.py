"""Fixture-table catalog.

Loads the driver-generated parquet tables (TESTDATA.md) and registers
them as temp views so operators can be written in either DataFrame or
SQL form. Reads are plain ``spark.read.parquet`` — Catalyst handles
column pruning and predicate pushdown into the scan, which is the
whole point at 100 TB: an operator never reads more than it projects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at EVERY scale factor (region is 5
# rows, nation 25 at all sf; supplier/part grow with sf but stay dim-sized
# relative to the fact tables).
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes nanosecond parquet timestamps.

    events.ts is TIMESTAMP(NANOS) in parquet, which Spark's scan rejects
    outright. We flip the legacy read path (runtime-settable, so this
    also works under a session we didn't build) to surface it as
    long-nanos, then truncate to a microsecond TimestampType — the same
    ns->µs truncation DuckDB applies when casting TIMESTAMP_NS down.
    """
    try:  # defensive: the round driver hands us ITS session, not ours
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # runtime-settable AQE knobs: harmless if already on, critical
        # if the host session was built without them
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass
    df = spark.read.parquet(table_path(sf_dir, name))
    for fld in df.schema.fields:
        if fld.name == "ts" and fld.dataType.typeName() in ("long", "bigint"):
            # ns-precision fixture era: surfaces as long under nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif fld.name == "ts" and fld.dataType.typeName() == "timestamp_ntz":
            # µs-precision fixture era: parquet without tz infers NTZ;
            # cast to LTZ (session tz is UTC, so the micros are identical)
            # so ts-consuming ops see one timestamp type across eras
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def widen_narrow_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition ONLY when the scan is narrower than the cores.

    Zero-shuffle per-row plans (the array-fold text ops) inherit the
    scan's split count as their ONLY parallelism. The local fixtures are
    one parquet file with one row group, so such a plan runs every row
    on a single core no matter how many exist — measured 3.2 s for
    op_text_bigram_logprob's fold at sf0.1 on one core vs 0.4 s widened.
    At cluster scale a 100 TB scan has orders of magnitude more splits
    than cores, the condition below is false, and NO exchange is added —
    the zero-shuffle property is preserved exactly where it matters.
    The check itself (getNumPartitions on the analyzed plan) launches
    no job.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view named after the table.

    Returns the name -> DataFrame mapping for DataFrame-style callers.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
