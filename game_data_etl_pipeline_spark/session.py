"""SparkSession construction.

One shared session per process; every knob here is a scale decision:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast selection — the knobs that keep a fixed plan
  working from sf0.001 (6k rows) to 100 TB.
- shuffle.partitions defaults to the local core count; on a real
  cluster this is overridden to ~2-3x total executor cores (AQE
  coalesces the excess).
- UTC session timezone: required for bit-exact timestamp comparison
  against external engines (the DuckDB oracle) and for any pipeline
  whose lineage columns must be reproducible across clusters.
- Arrow on: every pandas_udf / applyInPandas / toPandas crossing uses
  columnar Arrow batches instead of per-row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "game_data_etl_pipeline_spark"


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(app_name: str = DEFAULT_APP_NAME, *, extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; on a cluster the
    master is taken from the environment (spark-submit), so we only set
    master when none is configured.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet TIMESTAMP(NANOS) is otherwise an illegal type for the scan;
        # read it as long-nanos and let catalog.load_table rebuild a µs timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    active = SparkSession.getActiveSession()
    if active is None and "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
