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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

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

    def simpleStreamReader(self, schema) -> "BreweryStreamReader":
        return BreweryStreamReader(schema, self.options)


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


class BreweryStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the paginated REST scan:
    ``spark.readStream.format("openbrewerydb")`` tails the endpoint one
    page per micro-batch — the continuous-ingestion upgrade of the
    reference's one-shot fetch loop.

    Offset protocol (what makes it exactly-once): the offset is simply
    ``{"page": N}`` — the number of pages fully committed. ``read``
    advances it by up to ``pages_per_batch``; a replay of a failed batch
    goes through ``readBetweenOffsets(start, end)``, which re-fetches
    EXACTLY pages (start, end] — deterministic in fixture mode and
    idempotent against an append-only API. When the fixture is
    exhausted the reader reports no new data (same offset back), which
    is what lets ``processAllAvailable``/availableNow terminate.

    At scale the page fetch happens on the DRIVER for a simple stream
    reader (per the API contract — prefetched rows ride to executors
    with the plan); one page per batch keeps that driver hop at
    per_page rows. A firehose would use the partitioned batch reader
    per window instead.
    """

    def __init__(self, schema, options):
        self.schema_fields = schema.fieldNames()
        self.fixture_json = options.get("fixture_json")
        self.per_page = int(options.get("per_page", str(API_PER_PAGE_LIMIT)))
        self.base_url = options.get("base_url", API_BASE_URL)
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))
        self._fixture_cache: list[list[dict]] | None = None

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _fixture_pages(self) -> list[list[dict]]:
        if self._fixture_cache is None:
            with open(self.fixture_json, encoding="utf-8") as f:
                self._fixture_cache = json.load(f)
        return self._fixture_cache

    def _page_rows(self, page: int) -> list[dict] | None:
        """Rows of 1-indexed ``page``; None when past the end (fixture
        exhausted — live mode treats an empty page the same way)."""
        if self.fixture_json:
            pages = self._fixture_pages()
            if page > len(pages):
                return None
            return pages[page - 1]
        rows = BreweryReader(
            _SchemaShim(self.schema_fields), 
            {"base_url": self.base_url, "per_page": str(self.per_page)},
        )._fetch_live(page)
        return rows or None

    def read(self, start: dict):
        page = int(start.get("page", 0))
        out: list[tuple] = []
        advanced = page
        for _ in range(self.pages_per_batch):
            rows = self._page_rows(advanced + 1)
            if rows is None:
                break
            advanced += 1
            out.extend(
                tuple(r.get(k) for k in self.schema_fields) for r in rows
            )
        return iter(out), {"page": advanced}

    def readBetweenOffsets(self, start: dict, end: dict):
        for page in range(int(start["page"]) + 1, int(end["page"]) + 1):
            rows = self._page_rows(page) or []
            for r in rows:
                yield tuple(r.get(k) for k in self.schema_fields)


class _SchemaShim:
    """Minimal stand-in so the stream reader can reuse BreweryReader's
    retry/backoff fetch without building a full StructType."""

    def __init__(self, names: list[str]):
        self._names = names

    def fieldNames(self) -> list[str]:
        return self._names
