"""Custom PySpark DataSource (Spark 4 Python Data Source API) for the
Open Brewery DB REST endpoint: ``spark.read.format("openbrewerydb")``.

This is the Spark-native packaging of SURVEY.md §2.1 S1/S2: instead of a
driver-side fetch loop (the reference's shape, T/extract_brewery_data.py:
68-133), each API page becomes an input PARTITION — executors fetch pages
concurrently, with the reference's retry/backoff semantics per request.

Modes (options):
- ``fixture_json`` — path to a JSON file of pages (list of lists of
  records): offline/deterministic, used by tests and any air-gapped run.
- ``pages`` + live HTTP otherwise (requests imported lazily; respects
  per_page/timeout/retry options mirroring U/constants.py).

Register once per session::

    spark.dataSource.register(BreweryDataSource)
    df = spark.read.format("openbrewerydb").option("fixture_json", p).load()
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..config import (
    API_BASE_URL,
    API_MAX_RETRIES,
    API_PER_PAGE_LIMIT,
    API_RETRY_BACKOFF_S,
    API_TIMEOUT_S,
)
from ..schemas import BREWERY_SCHEMA


class BreweryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "openbrewerydb"

    def schema(self):
        return BREWERY_SCHEMA

    def reader(self, schema) -> "BreweryReader":
        return BreweryReader(schema, self.options)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class BreweryReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_fields = schema.fieldNames()
        self.fixture_json = options.get("fixture_json")
        self.n_pages = int(options.get("pages", "0"))
        self.per_page = int(options.get("per_page", str(API_PER_PAGE_LIMIT)))
        self.base_url = options.get("base_url", API_BASE_URL)

    def partitions(self):
        if self.fixture_json:
            with open(self.fixture_json, encoding="utf-8") as f:
                n = len(json.load(f))
            return [_PagePartition(i) for i in range(1, n + 1)]
        if self.n_pages <= 0:
            raise ValueError(
                "openbrewerydb source needs option 'pages' (page count) or "
                "'fixture_json' (offline fixture path)"
            )
        return [_PagePartition(i) for i in range(1, self.n_pages + 1)]

    def read(self, partition: _PagePartition):
        if self.fixture_json:
            with open(self.fixture_json, encoding="utf-8") as f:
                rows = json.load(f)[partition.page - 1]
        else:
            rows = self._fetch_live(partition.page)
        for r in rows:
            yield tuple(r.get(k) for k in self.schema_fields)

    def _fetch_live(self, page: int) -> list[dict]:
        import time

        import requests  # lazy; never imported in fixture mode

        last_exc: Exception | None = None
        for _ in range(API_MAX_RETRIES):
            try:
                resp = requests.get(
                    self.base_url,
                    params={"page": page, "per_page": self.per_page},
                    timeout=API_TIMEOUT_S,
                )
                resp.raise_for_status()
                return resp.json()
            except Exception as exc:  # noqa: BLE001 - retry parity with reference
                last_exc = exc
                time.sleep(API_RETRY_BACKOFF_S)
        raise RuntimeError(f"page {page} failed after retries") from last_exc
