"""Extract phase: REST endpoints (or an offline landing dir) -> raw JSON.

Reference semantics preserved (reference etl/pipeline.py:75-113):

- up to 3 attempts per endpoint, exponential backoff 2**attempt;
- HTTP errors raise_for_status then retry; final failure -> [] for
  that endpoint (a failed source degrades, it does not fail the run);
- envelope {status, data}: status != 200 -> [] immediately (no retry);
- fixed politeness delay between endpoints.

Spark-first split: extraction is DRIVER-side I/O (a handful of REST
calls is not cluster work). The extractor lands the raw envelope JSON
as files; the transform phase reads them with spark.read + explicit
schemas, so everything downstream of the landing dir is distributed
and schema-checked. At 100 TB the landing dir is object storage and
the same read path fans out over thousands of files.
"""

from __future__ import annotations

import json
import logging
import os
import time

logger = logging.getLogger("game_data_etl_pipeline_spark.extract")

try:  # requests is only needed for live HTTP extraction
    import requests  # type: ignore
except ImportError:  # pragma: no cover
    requests = None

MAX_ATTEMPTS = 3


class Extractor:
    """Fetch raw envelopes from HTTP endpoints or a local fixture dir."""

    def __init__(self, config: dict):
        api = config.get("api", {})
        self.base_url = api.get("base_url", "")
        self.language = api.get("language", "en-US")
        self.delay = api.get("request_delay_seconds", 0.0)
        self.timeout = api.get("timeout_seconds", 30)
        # offline mode: a dir of {endpoint}.json envelope files
        self.offline_dir = api.get("offline_dir")

    def fetch_endpoint(self, endpoint: str) -> list[dict]:
        """One endpoint -> list of records; [] on any terminal failure."""
        if self.offline_dir is not None:
            return self._fetch_offline(endpoint)
        return self._fetch_http(endpoint)

    def _fetch_offline(self, endpoint: str) -> list[dict]:
        path = os.path.join(self.offline_dir, f"{endpoint}.json")
        try:
            with open(path, encoding="utf-8") as f:
                payload = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            logger.error("offline fetch failed for %s: %s", endpoint, e)
            return []
        if payload.get("status") != 200:
            logger.warning("endpoint %s returned status %s", endpoint, payload.get("status"))
            return []
        return payload.get("data", [])

    def _fetch_http(self, endpoint: str) -> list[dict]:
        if requests is None:
            logger.error("requests not installed and no offline_dir configured")
            return []
        url = f"{self.base_url}/{endpoint}"
        for attempt in range(MAX_ATTEMPTS):
            try:
                resp = requests.get(url, params={"language": self.language}, timeout=self.timeout)
                resp.raise_for_status()
                payload = resp.json()
                if payload.get("status") == 200:
                    return payload.get("data", [])
                logger.warning("endpoint %s returned status %s", endpoint, payload.get("status"))
                return []
            except requests.Timeout:
                logger.warning("timeout on %s (attempt %d)", endpoint, attempt + 1)
                time.sleep(2**attempt)
            except requests.RequestException as e:
                logger.error("request failed on %s: %s", endpoint, e)
                if attempt < MAX_ATTEMPTS - 1:
                    time.sleep(2**attempt)
                else:
                    return []
        return []

    def extract_all(self, endpoints: list[str]) -> dict[str, list[dict]]:
        """Sequential scan of all endpoints with the politeness delay."""
        raw: dict[str, list[dict]] = {}
        for endpoint in endpoints:
            raw[endpoint] = self.fetch_endpoint(endpoint)
            if self.delay:
                time.sleep(self.delay)
        return raw

    def land(self, endpoints: list[str], landing_dir: str) -> dict[str, str]:
        """Extract and persist raw envelopes as {endpoint}.json files.

        Returns endpoint -> landed file path. The landing file keeps the
        original envelope shape so the Spark-side parse (transform.py)
        exercises the same status-check semantics.
        """
        os.makedirs(landing_dir, exist_ok=True)
        out: dict[str, str] = {}
        for endpoint in endpoints:
            records = self.fetch_endpoint(endpoint)
            path = os.path.join(landing_dir, f"{endpoint}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump({"status": 200, "data": records}, f)
            out[endpoint] = path
            if self.delay:
                time.sleep(self.delay)
        return out
