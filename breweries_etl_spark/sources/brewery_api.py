"""Paginated REST API source (SURVEY.md §2.1 S1/S2).

The reference fetches pages sequentially on a single worker with a 0.5 s
inter-page sleep (ref: T/extract_brewery_data.py:89-124), retrying each
request 3× with 5 s backoff (ref: U/helpers.py:214-258).

Spark has no built-in REST source, so this module provides:

1. ``fetch_all_pages`` — driver-side sequential fetch, semantics-identical
   to the reference (stop when a page returns < per_page rows or empty;
   throttle between pages; bounded retries).
2. ``parallel_fetch_dataframe`` — the scale path: probe the page count
   once, then distribute page fetches across executors with
   ``spark.range(pages).repartition(n).mapInPandas(...)`` so N executors
   fetch concurrently (each still retry-wrapped). Politeness throttle
   becomes per-task.

Both are injectable with any ``fetcher(page, per_page) -> list[dict]`` so
tests never touch the network; ``requests`` is imported lazily and only
by the real HTTP fetcher.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..config import (
    API_BASE_URL,
    API_MAX_RETRIES,
    API_PAGE_THROTTLE_S,
    API_PER_PAGE_LIMIT,
    API_RETRY_BACKOFF_S,
    API_TIMEOUT_S,
)
from ..schemas import BREWERY_SCHEMA

Fetcher = Callable[[int, int], list[dict]]


def http_fetcher(
    base_url: str = API_BASE_URL,
    timeout_s: int = API_TIMEOUT_S,
    max_retries: int = API_MAX_RETRIES,
    backoff_s: float = API_RETRY_BACKOFF_S,
) -> Fetcher:
    """S2 — single GET with bounded retry/backoff (ref: U/helpers.py:214-258).
    Raises after exhausting retries, like the reference."""

    def fetch(page: int, per_page: int) -> list[dict]:
        import requests  # lazy: tests never import it

        last_exc: Exception | None = None
        for _attempt in range(max_retries):
            try:
                resp = requests.get(
                    base_url,
                    params={"page": page, "per_page": per_page},
                    timeout=timeout_s,
                )
                resp.raise_for_status()
                return resp.json()
            except Exception as exc:  # noqa: BLE001 - parity with ref's broad retry
                last_exc = exc
                time.sleep(backoff_s)
        raise RuntimeError(f"API request failed after {max_retries} retries") from last_exc

    return fetch


def fetch_all_pages(
    fetcher: Fetcher,
    per_page: int = API_PER_PAGE_LIMIT,
    throttle_s: float = API_PAGE_THROTTLE_S,
    max_pages: int = 10_000,
) -> list[list[dict]]:
    """S1 — sequential paginated scan with the reference's stop condition:
    a page with fewer than ``per_page`` rows (or empty) is the last
    (ref: T/extract_brewery_data.py:117-122)."""
    pages: list[list[dict]] = []
    for page_no in range(1, max_pages + 1):
        rows = fetcher(page_no, per_page)
        if rows:
            pages.append(rows)
        if not rows or len(rows) < per_page:
            break
        if throttle_s:
            time.sleep(throttle_s)
    return pages


def pages_to_dataframe(
    spark: SparkSession,
    pages: list[list[dict]],
    schema: T.StructType = BREWERY_SCHEMA,
) -> DataFrame:
    """S4 — rows→table constructor with a DECLARED schema (the reference
    lets pandas infer, ref: T/landing_to_bronze.py:70)."""
    names = set(schema.fieldNames())
    rows = [{k: v for k, v in r.items() if k in names} for page in pages for r in page]
    return spark.createDataFrame(rows, schema=schema)


def parallel_fetch_dataframe(
    spark: SparkSession,
    fetcher: Fetcher,
    n_pages: int,
    per_page: int = API_PER_PAGE_LIMIT,
    parallelism: int = 8,
    schema: T.StructType = BREWERY_SCHEMA,
) -> DataFrame:
    """Scale path for S1: distribute page fetches over executors.

    ``spark.range(1, n_pages+1)`` → repartition(parallelism) →
    ``mapInPandas`` where each task fetches its pages and yields Arrow
    batches. The fetcher closure is pickled to executors, so it must be
    self-contained (the ``http_fetcher`` above is).
    """
    import pandas as pd

    field_names = schema.fieldNames()

    def fetch_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for page_no in pdf["id"].tolist():
                rows = fetcher(int(page_no), per_page)
                out.extend({k: r.get(k) for k in field_names} for r in rows)
            yield pd.DataFrame(out, columns=field_names)

    pages = spark.range(1, n_pages + 1).repartition(parallelism)
    return pages.mapInPandas(fetch_partition, schema=schema)
