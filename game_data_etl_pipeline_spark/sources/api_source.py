"""`game_api` — the reference's REST source as a first-class Spark
Python Data Source (``spark.read.format("game_api")``).

The reference collects its API on the driver (reference
etl/pipeline.py:75-113: requests + retry + envelope check, one endpoint
at a time, everything in driver memory). SURVEY.md §4 flags the proper
Spark shape: a DataSourceV2-style source so the catalog, not the
driver loop, owns ingestion. PySpark 4's Python Data Source API makes
that implementable without JVM code:

- one ``InputPartition`` PER ENDPOINT — endpoints are fetched by
  EXECUTORS in parallel, not sequentially on the driver (the
  reference's 0.5 s politeness delay becomes per-partition, so wall
  clock is max(endpoint) not sum(endpoints));
- the envelope contract (``{status, data: [...]}``; non-200 -> empty,
  reference etl/pipeline.py:85-93, :103-105) is enforced inside the
  partition reader, so one failed endpoint degrades to zero rows
  without failing the scan — the reference's partial-failure semantics
  at partition granularity;
- reads come from a landed envelope directory (the offline landing zone
  ``etl/extract.py`` writes). A live-HTTP variant would drop in at
  ``_read_envelope`` without touching the Spark surface.

At scale the same pattern serves any partitioned REST/paged API: one
partition per page-range, executor-side fetch, schema declared up
front.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Identity projection shared by every endpoint: (endpoint, uuid, name).
_COMMON_SCHEMA = "endpoint string, uuid string, name string"

_ENDPOINTS = ("agents", "weapons", "maps", "gamemodes")


class _EndpointPartition(InputPartition):
    def __init__(self, endpoint: str, path: str):
        self.endpoint = endpoint
        self.path = path


class GameApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.landing_dir = options["landing_dir"]
        eps = options.get("endpoints", ",".join(_ENDPOINTS))
        self.endpoints = tuple(e.strip() for e in eps.split(",") if e.strip())

    def partitions(self) -> list[InputPartition]:
        return [
            _EndpointPartition(ep, os.path.join(self.landing_dir, f"{ep}.json"))
            for ep in self.endpoints
        ]

    def read(self, partition: _EndpointPartition) -> Iterator[tuple]:
        # Envelope contract, enforced executor-side: missing file or
        # non-200 status -> zero rows, never a failed task (reference
        # etl/pipeline.py:85-93, :103-105).
        try:
            with open(partition.path, encoding="utf-8") as f:
                envelope = json.load(f)
        except (OSError, json.JSONDecodeError):
            return
        if envelope.get("status") != 200:
            return
        for record in envelope.get("data") or []:
            yield (partition.endpoint, record.get("uuid"), record.get("displayName"))


class GameApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "game_api"

    def schema(self) -> str:
        return _COMMON_SCHEMA

    def reader(self, schema) -> GameApiReader:  # noqa: ARG002 — schema fixed by source
        return GameApiReader(self.options)


class GameApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming replay of the landed endpoints: one endpoint per
    micro-batch, offset = index into the endpoint list. After the last
    endpoint the offset stops advancing, which is how a finite replay
    signals drained to availableNow/processAllAvailable triggers.

    The production swap keeps this exact shape: offset = (page cursor,
    timestamp) against a live paged API, read() fetches one page, and
    recovery replays from the checkpointed offset — executor-free
    simple reader for modest rates, partition-planned DataSourceStream
    Reader when one batch needs parallel fetches."""

    def __init__(self, options: dict):
        self.landing_dir = options["landing_dir"]
        eps = options.get("endpoints", ",".join(_ENDPOINTS))
        self.endpoints = tuple(e.strip() for e in eps.split(",") if e.strip())

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, endpoint: str) -> list[tuple]:
        path = os.path.join(self.landing_dir, f"{endpoint}.json")
        try:
            with open(path, encoding="utf-8") as f:
                envelope = json.load(f)
        except (OSError, json.JSONDecodeError):
            return []
        if envelope.get("status") != 200:
            return []
        return [
            (endpoint, r.get("uuid"), r.get("displayName"))
            for r in envelope.get("data") or []
        ]

    def read(self, start: dict):
        i = start["i"]
        if i >= len(self.endpoints):
            return iter([]), start
        return iter(self._rows(self.endpoints[i])), {"i": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out: list[tuple] = []
        for i in range(start["i"], min(end["i"], len(self.endpoints))):
            out.extend(self._rows(self.endpoints[i]))
        return iter(out)


class GameApiStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "game_api_stream"

    def schema(self) -> str:
        return _COMMON_SCHEMA

    def simpleStreamReader(self, schema) -> GameApiStreamReader:  # noqa: ARG002
        return GameApiStreamReader(self.options)
