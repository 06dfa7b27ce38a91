"""Fixture-drift guard: the round driver regenerates /root/testdata
between rounds and physical parquet types have drifted before
(events.ts: TIMESTAMP(NANOS) -> timestamp[us]-NTZ in round 3, which
silently broke streaming-side unit conversions). These tests fail
FAST and NAMED when the fixture shape moves again, instead of letting
value-level oracle mismatches surface it obliquely."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_fixture_columns_present(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    assert os.path.exists(path), f"fixture table missing: {path}"
    names = set(pq.ParquetFile(path).schema_arrow.names)
    missing = EXPECTED_COLUMNS[table] - names
    assert not missing, f"{table} lost columns {missing} (driver regenerated testdata?)"


def test_events_ts_precision_is_handled():
    """catalog.load_table + streaming/engine handle ns-as-long and
    µs-NTZ; any OTHER physical type for events.ts is new drift."""
    typ = pq.ParquetFile(os.path.join(SF_DIR, "events.parquet")).schema_arrow.field("ts").type
    unit = getattr(typ, "unit", None)
    assert unit in ("ns", "us"), f"unhandled events.ts type: {typ}"


def test_ts_normalizes_to_utc_ltz(spark):
    """Whatever the file holds, ts must surface as TIMESTAMP (LTZ) so
    unix_micros/window/watermark ops see one type across eras."""
    from game_data_etl_pipeline_spark.catalog import load_table

    df = load_table(spark, SF_DIR, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp", df.schema["ts"].dataType


def test_all_sf_dirs_have_same_tables():
    base = {os.path.basename(p) for p in glob.glob(f"{SF_DIR}/*.parquet")}
    for sf in ("sf0.01", "sf0.1"):
        got = {os.path.basename(p) for p in glob.glob(f"/root/testdata/{sf}/*.parquet")}
        assert got == base, f"{sf} differs: {got ^ base}"
