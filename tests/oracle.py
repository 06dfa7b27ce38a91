"""Local replica of the driver's oracle-differential check.

For each registered query with an oracle: run the PySpark callable and
the DuckDB SQL over the same sf dir, then compare row count, sorted
column names, and an order-insensitive normalized value multiset —
the same three gates CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # queries round explicitly; this guards representation noise only
        return f"{round(v, 9):.9f}"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(df: pd.DataFrame) -> tuple[tuple[str, ...], list[tuple]]:
    cols = tuple(sorted(df.columns))
    rows = sorted(tuple(_norm_cell(v) for v in row) for row in df[list(cols)].itertuples(index=False, name=None))
    return cols, rows


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    # The driver's canonicalizer lexsorts pandas cells and crashes on
    # unhashable values (list/dict) — registry convention bans raw
    # array/map/struct output columns. Enforce it here so every oracled
    # query fails locally before it can fail a driver window.
    from pyspark.sql import types as T

    for f in spark_df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            problems.append(
                f"{name}: raw collection output column '{f.name}' "
                f"({f.dataType.simpleString()}) — scalarize with array_join/to_json"
            )
    if problems:
        return problems
    spark_pdf = spark_df.toPandas()
    if len(spark_pdf) != len(duck_df):
        problems.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_df)}")
    s_cols, s_rows = normalize(spark_pdf)
    d_cols, d_rows = normalize(duck_df)
    if s_cols != d_cols:
        problems.append(f"{name}: columns spark={s_cols} duck={d_cols}")
        return problems
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:3]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:3]
        problems.append(f"{name}: value mismatch; spark-only={diff_s} duck-only={diff_d}")
    return problems
