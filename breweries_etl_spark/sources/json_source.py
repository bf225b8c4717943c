"""Landing JSON reader (SURVEY.md §2.1 S3).

The reference loads each landing file with ``json.load`` on the driver and
accumulates a list of dicts (ref: U/helpers.py:278-296,
T/landing_to_bronze.py:128-139) — a single-process bottleneck, and a
crashed pipeline on the first malformed page. Here the JSON scan is
distributed: every executor parses its own files, with the schema
DECLARED (no inference pass), and malformed input quarantines instead of
failing the job.

Landing files are JSON *arrays* (one per API page), hence multiLine=true.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BREWERY_SCHEMA

CORRUPT_COL = "_corrupt_record"


def read_landing_json(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = BREWERY_SCHEMA,
) -> DataFrame:
    return spark.read.schema(schema).option("multiLine", "true").json(paths)


def read_landing_json_with_quarantine(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = BREWERY_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE landing read that splits (valid, corrupt): rows Spark
    could not parse land in a quarantine frame carrying the raw payload
    text, instead of either failing the whole scan (FAILFAST) or being
    silently nulled. At 100 TB a crawl/API landing zone ALWAYS contains
    some malformed pages; the pipeline contract is "ingest what parses,
    quarantine the rest with evidence" — same posture as the silver
    layer's null-key quarantine (operators/quality.py).

    The corrupt-capture column must be part of the declared schema for
    PERMISSIVE mode to populate it; it is stripped from the valid half.
    Spark requires caching (or materializing) the frame before filtering
    on the corrupt column alone — the per-row parse state is not
    otherwise observable after column pruning — so the split caches the
    narrow parsed frame, and callers should write both halves promptly.
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(paths)
    ).cache()
    valid = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_payload")
    )
    return valid, corrupt
