"""Central query registry.

Every operator the engine claims (SURVEY.md §2) registers here exactly
once, as a pair:

- a PySpark callable ``(spark, sf_dir) -> DataFrame`` — the engine's
  implementation, and
- an optional ANSI-SQL oracle string that DuckDB can execute over the
  same parquet tables (None for genuinely non-SQL-expressible ops,
  which get a weaker rows-only check).

``__spark_entry__.py`` is a thin shim over this module. Conventions
that make the driver's order-insensitive value-hash comparison work:

- alias EVERY computed/aggregate column identically in both forms;
- round floating aggregates in BOTH engines (summation order differs);
- cast DuckDB's HUGEINT sums / ns timestamps to BIGINT / microseconds;
- never return a raw TimestampType column — date_format it to a string
  (or cast to DATE) on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

# Modules whose import populates the registry (each calls @register at
# module scope). Extend as operator families land.
_OPERATOR_MODULES = (
    "game_data_etl_pipeline_spark.operators.relational",
    "game_data_etl_pipeline_spark.operators.joins",
    "game_data_etl_pipeline_spark.operators.aggregates",
    "game_data_etl_pipeline_spark.operators.windows",
    "game_data_etl_pipeline_spark.operators.setops",
    "game_data_etl_pipeline_spark.operators.analytics",
    "game_data_etl_pipeline_spark.operators.scale",
    "game_data_etl_pipeline_spark.functions.scalars",
    "game_data_etl_pipeline_spark.functions.udfs",
    "game_data_etl_pipeline_spark.streaming.queries",
    "game_data_etl_pipeline_spark.llmdata.text",
    "game_data_etl_pipeline_spark.llmdata.dedup",
    "game_data_etl_pipeline_spark.llmdata.similarity",
    "game_data_etl_pipeline_spark.llmdata.multimodal",
    "game_data_etl_pipeline_spark.llmdata.corpus",
    "game_data_etl_pipeline_spark.llmdata.cluster",
    "game_data_etl_pipeline_spark.etl.queries",
    "game_data_etl_pipeline_spark.sources.landing",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None = None
    doc: str = ""
    headline: bool = False  # included in bench.py's timed suite
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query implementation (and its oracle) to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), headline=headline, tags=tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Allow partial builds while operator families are landing,
            # but never swallow a typo inside an existing module.
            if e.name and not e.name.startswith("game_data_etl_pipeline_spark"):
                raise
    _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, SparkQuery]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}


def headline_specs() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in all_specs().items() if spec.headline}
