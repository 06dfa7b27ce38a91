"""The ad-hoc SQL surface (cli.py) — the reference's EP3 read path
(README.md:130-140, sqlite3 + read_sql) re-expressed as Spark SQL."""

from __future__ import annotations

import json

from game_data_etl_pipeline_spark import cli

SF = "/root/testdata/sf0.001"


def test_cli_runs_sql_over_fixture_views(spark):
    df = cli.run_query(
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
        SF,
        spark=spark,
    )
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0].n >= 1


def test_cli_joins_across_views(spark):
    df = cli.run_query(
        """
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_cust DESC LIMIT 3
        """,
        SF,
        spark=spark,
    )
    assert df.count() == 3


def test_cli_json_output(spark, capsys):
    df = cli.run_query("SELECT 1 AS one, 'x' AS tag", SF, spark=spark)
    cli._emit(df, "json", 10)
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[0]) == {"one": 1, "tag": "x"}


def test_cli_catalog_matches_registered_tables(spark):
    from game_data_etl_pipeline_spark.catalog import TABLES

    df = cli.run_query("SHOW TABLES", SF, spark=spark)
    names = {r.tableName for r in df.collect()}
    assert set(TABLES) <= names
