"""Landing JSON reader (SURVEY.md §2.1 S3).

The reference loads each landing file with ``json.load`` on the driver and
accumulates a list of dicts (ref: U/helpers.py:278-296,
T/landing_to_bronze.py:128-139) — a single-process bottleneck. Here the
JSON scan is distributed: every executor parses its own files, with the
schema DECLARED (no inference pass).

Landing files are JSON *arrays* (one per API page), hence multiLine=true.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import BREWERY_SCHEMA


def read_landing_json(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = BREWERY_SCHEMA,
) -> DataFrame:
    return spark.read.schema(schema).option("multiLine", "true").json(paths)
