"""Registry entries for the ETL transform contract.

Each op_etl_* runs the real Spark transform over the deterministic raw
fixture (same code path the pipeline runs) and is oracled against the
golden rows as a literal VALUES table — so the driver's hash compare
verifies the transform semantics themselves (filters, defaults,
truncation, prefix strip, posexplode indices) rather than a fixture
round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from game_data_etl_pipeline_spark.etl import fixtures, transform
from game_data_etl_pipeline_spark.registry import register

_TRANSFORM_OF = {
    "agents": ("agents", transform.transform_agents),
    "abilities": ("agents", transform.transform_abilities),
    "weapons": ("weapons", transform.transform_weapons),
    "weapon_damage": ("weapons", transform.transform_damage_ranges),
    "maps": ("maps", transform.transform_maps),
    "gamemodes": ("gamemodes", transform.transform_gamemodes),
}


def _sql_literal(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, int):
        return f"CAST({v} AS INT)"
    escaped = str(v).replace("'", "''")
    return f"'{escaped}'"


def _values_oracle(table: str) -> str:
    cols = fixtures.COLUMNS[table]
    rows = ",\n            ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in fixtures.EXPECTED[table]
    )
    col_list = ", ".join(cols)
    return f"""
        SELECT {col_list}
        FROM (VALUES
            {rows}
        ) AS t({col_list})
    """


def _make_query(table: str):
    endpoint, fn = _TRANSFORM_OF[table]

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001 — fixture-driven
        raw = transform.records_df(spark, endpoint, fixtures.raw_json_records(endpoint))
        return fn(raw)

    q.__name__ = f"op_etl_{table}"
    q.__doc__ = f"Reference-parity transform for the {table} table over the raw fixture."
    return q


for _table in _TRANSFORM_OF:
    register(
        f"op_etl_{_table}",
        oracle=_values_oracle(_table),
        doc=f"ETL transform parity: {_table} (filters/defaults/truncation per reference etl/pipeline.py:146-235)",
        tags=("etl", "reference-parity"),
    )(_make_query(_table))
