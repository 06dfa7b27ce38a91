"""Pipeline orchestration: one E->T->L cycle + the scheduling loop.

Reference parity (reference etl/pipeline.py:317-392):

- run_id = UTC wall clock 'yyyyMMdd_HHmmss' (:326);
- extract degrades per-endpoint to [] — the run proceeds and records
  Success (fidelity note 1, SURVEY.md §2.A);
- load failure writes a Failed run record and re-raises (:302-308);
- ``--once`` runs a single cycle; otherwise run-on-start then an
  in-process every-N-hours loop polling every 60 s (:370-384).
  (Implemented with plain time arithmetic — the reference's
  ``schedule`` package adds nothing Spark-relevant.)

One conscious fix (fidelity note 3): ``started_at`` is captured at run
start, not at insert time — the reference's started_at ~= completed_at
was a bug its own golden DB exhibits.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import logging
import os
import time

from pyspark.sql import SparkSession

from game_data_etl_pipeline_spark.etl.extract import Extractor
from game_data_etl_pipeline_spark.etl.load import Loader
from game_data_etl_pipeline_spark.etl.transform import TRANSFORMS, parse_envelope, transform_all

logger = logging.getLogger("game_data_etl_pipeline_spark.pipeline")

DEFAULT_CONFIG = {
    "api": {
        "base_url": "https://valorant-api.com/v1",
        "language": "en-US",
        "endpoints": ["agents", "weapons", "maps", "gamemodes"],
        "request_delay_seconds": 0.5,
        "timeout_seconds": 30,
        "offline_dir": None,
    },
    "landing": {"path": "landing"},
    "warehouse": {"path": "warehouse"},
    "schedule": {"interval_hours": 6, "run_on_start": True},
}


def load_config(path: str | None) -> dict:
    if path is None:
        return DEFAULT_CONFIG
    with open(path, encoding="utf-8") as f:
        cfg = json.load(f)
    merged = {**DEFAULT_CONFIG, **cfg}
    for k in DEFAULT_CONFIG:
        if isinstance(DEFAULT_CONFIG[k], dict):
            merged[k] = {**DEFAULT_CONFIG[k], **cfg.get(k, {})}
    return merged


class ETLPipeline:
    """Extract (driver I/O) -> land (JSON files) -> transform (Spark) -> load."""

    def __init__(self, spark: SparkSession, config: dict | None = None):
        self.spark = spark
        self.config = config or DEFAULT_CONFIG
        self.extractor = Extractor(self.config)
        self.loader = Loader(self.config)
        self.landing_dir = self.config.get("landing", {}).get("path", "landing")

    def run(self) -> dict:
        run_id = dt.datetime.now(dt.timezone.utc).strftime("%Y%m%d_%H%M%S")
        start = time.time()
        logger.info("ETL run %s starting", run_id)

        endpoints = [e for e in self.config["api"]["endpoints"] if e in TRANSFORMS]
        landed = self.extractor.land(endpoints, os.path.join(self.landing_dir, run_id))

        raw = {ep: parse_envelope(self.spark, path, ep) for ep, path in landed.items()}
        transformed = transform_all(raw)
        counts = self.loader.load_all(self.spark, transformed, run_id)

        duration = time.time() - start
        logger.info("ETL run %s complete: %s rows in %.2fs", run_id, sum(counts.values()), duration)
        return {"run_id": run_id, "counts": counts, "duration": duration}


def main() -> None:
    parser = argparse.ArgumentParser(description="game-data ETL pipeline (PySpark)")
    parser.add_argument("--config", default=None, help="JSON config path")
    parser.add_argument("--once", action="store_true", help="single run, no scheduler")
    parser.add_argument(
        "--fixture",
        action="store_true",
        help="extract from the embedded offline fixture instead of live HTTP "
        "(self-contained demo run; live extraction degrades per-endpoint to "
        "empty tables when the network is unreachable)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = load_config(args.config)
    if args.fixture:
        import tempfile

        from game_data_etl_pipeline_spark.etl import fixtures

        fixture_dir = tempfile.mkdtemp(prefix="fixture_envelopes_")
        fixtures.write_landing(fixture_dir)
        config["api"]["offline_dir"] = fixture_dir

    from game_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("game_data_etl")
    pipeline = ETLPipeline(spark, config)

    sched = config.get("schedule", {})
    if sched.get("run_on_start", True):
        pipeline.run()

    interval_h = sched.get("interval_hours", 0)
    if interval_h > 0 and not args.once:
        logger.info("scheduling a run every %s hours", interval_h)
        next_run = time.time() + interval_h * 3600
        try:
            while True:
                time.sleep(60)
                if time.time() >= next_run:
                    pipeline.run()
                    next_run = time.time() + interval_h * 3600
        except KeyboardInterrupt:
            logger.info("pipeline stopped by user")


if __name__ == "__main__":
    main()
