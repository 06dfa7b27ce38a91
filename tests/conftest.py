"""Shared test fixtures: one SparkSession per test run, fixture dirs, DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"

ORACLE_TABLES = (
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


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from game_data_etl_pipeline_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Mirror the driver's oracle setup: each parquet table as a view."""
    con = duckdb.connect()
    for t in ORACLE_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = make_duck(sf_dir)
    yield con
    con.close()


def expected_lex_index(surviving_docs):
    """From-scratch inverted-index expectation over ``surviving_docs``
    (doc_id, text): the (term, doc_id, dl, tf) posting set, the
    per-term df set, and the survivor (n_docs, tot_dl) — the one
    hand-derived rebuild yardstick shared by the compact-vs-rebuild
    property test and the lifecycle-e2e end-state test (round-12
    review: two drifting copies of this derivation)."""
    from pyspark.sql import functions as F

    from game_data_etl_pipeline_spark.llmdata.text import _terms

    want_post = {
        (r.term, r.doc_id, r.dl, r.tf)
        for r in surviving_docs.select(
            "doc_id", F.size(_terms()).alias("dl"), F.explode(_terms()).alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    }
    want_df = {
        (t, sum(1 for (term, _, _, _) in want_post if term == t))
        for t in {term for (term, _, _, _) in want_post}
    }
    want_docs = {(d, dl) for (_, d, dl, _) in want_post}
    return want_post, want_df, len(want_docs), sum(dl for _, dl in want_docs)
