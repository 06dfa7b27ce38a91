"""Ad-hoc SQL entry point — the query surface the reference delegates
to SQLite (reference README.md:130-140: sqlite3.connect +
pandas.read_sql over the warehouse tables).

Usage:
    python -m game_data_etl_pipeline_spark.cli "SELECT r_name, count(*) FROM region GROUP BY r_name"
    python -m game_data_etl_pipeline_spark.cli --explain "SELECT ..."
    python -m game_data_etl_pipeline_spark.cli --format json "SELECT ..."
    echo "SELECT 1 AS one" | python -m game_data_etl_pipeline_spark.cli -

Registers every fixture table (region nation customer supplier part
orders lineitem events documents embeddings) plus any warehouse tables
under --warehouse as temp views, then hands the string to
``spark.sql`` — full Spark SQL, Catalyst-optimized, nothing bespoke in
the parse path. ``--explain`` prints the formatted physical plan
instead of rows: the ".explain until it's the plan you'd want" loop as
a first-class user command.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession

from game_data_etl_pipeline_spark.catalog import register_views
from game_data_etl_pipeline_spark.session import get_spark

_ROW_CAP = 1000  # ad-hoc console output; use INSERT/CTAS-style writes for bulk


def run_query(
    sql: str,
    sf_dir: str,
    spark: SparkSession | None = None,
    warehouse: str | None = None,
) -> DataFrame:
    """Register views and run one SQL string; returns the DataFrame."""
    spark = spark or get_spark("sql-cli")
    register_views(spark, sf_dir)
    if warehouse and os.path.isdir(warehouse):
        for name in sorted(os.listdir(warehouse)):
            path = os.path.join(warehouse, name)
            if os.path.isdir(path):
                spark.read.parquet(path).createOrReplaceTempView(name)
    return spark.sql(sql)


def _emit(df: DataFrame, fmt: str, limit: int) -> None:
    if fmt == "json":
        for row in df.limit(limit).toJSON().collect():
            print(row)
    else:
        df.show(n=limit, truncate=False)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="game_data_etl_pipeline_spark.cli", description=__doc__)
    p.add_argument("sql", help="SQL string, or '-' to read from stdin")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p.add_argument("--warehouse", default=None, help="parquet warehouse dir to register as views")
    p.add_argument("--format", choices=("table", "json"), default="table")
    p.add_argument("--limit", type=int, default=_ROW_CAP)
    p.add_argument("--explain", action="store_true", help="print the physical plan, not rows")
    args = p.parse_args(argv)

    sql = sys.stdin.read() if args.sql == "-" else args.sql
    df = run_query(sql, args.sf_dir, warehouse=args.warehouse)
    if args.explain:
        df.explain("formatted")
    else:
        _emit(df, args.format, args.limit)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
