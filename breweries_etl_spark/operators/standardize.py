"""Scalar column transforms of the silver stage (SURVEY.md §2.4, C1-C9).

The reference implements C4/C5 as row-wise ``pd.Series.apply`` Python
closures (ref: U/helpers.py:75-81, :103-111) — the slowest possible
construct. Here every transform is a native Column expression, so the whole
silver stage fuses into one whole-stage-codegen'd pass with zero Python
round-trips; at 100 TB that is the difference between one scan and a
per-row interpreter loop.

All functions are pure DataFrame -> DataFrame (lazy; nothing materializes
until a sink).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import (
    BREWERY_TYPE_MISS,
    BREWERY_TYPE_NULL,
    ETL_VERSION,
    QUARANTINE_REASON_MISSING_KEYS,
    STANDARD_BREWERY_TYPES,
    STRING_COLUMNS,
)

# ISO-8601 with microseconds, matching datetime.isoformat() in the
# reference (U/helpers.py:145).
_ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def convert_string_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """C1 — cast key columns to string (ref: U/helpers.py:183-197).

    Spark's cast keeps NULL as NULL; pandas ``astype(str)`` would have
    stringified NaN to 'nan'. The pipeline applies this *after* the
    quarantine split (ref call order T/bronze_to_silver.py:68,72), so the
    two are equivalent — preserve that order.
    """
    columns = STRING_COLUMNS if columns is None else columns
    present = [c for c in columns if c in df.columns]
    return df.withColumns({c: F.col(c).cast("string") for c in present})


def standardize_location_fields(df: DataFrame) -> DataFrame:
    """C2+C3 — uppercase state/city/country and derive
    ``location = UPPER(country)`` (ref: U/helpers.py:43-57).

    ``F.upper`` propagates NULL exactly like pandas ``str.upper`` on NaN.
    """
    cols = {c: F.upper(F.col(c)) for c in ("state", "city", "country") if c in df.columns}
    out = df.withColumns(cols)
    return out.withColumn("location", F.col("country"))


def brewery_type_expr(col: Column) -> Column:
    """C4 — dict-lookup recode as a native expression (no UDF).

    Semantics (branch-exact with ref U/helpers.py:75-79):
        NULL                      -> 'unknown'
        lower(strip(x)) in map    -> canonical value
        otherwise                 -> 'other'
    """
    mapping = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in STANDARD_BREWERY_TYPES.items())
    )
    normalized = F.lower(F.trim(col))
    return F.when(col.isNull(), F.lit(BREWERY_TYPE_NULL)).otherwise(
        F.coalesce(mapping[normalized], F.lit(BREWERY_TYPE_MISS))
    )


def standardize_brewery_types(df: DataFrame, column: str = "brewery_type") -> DataFrame:
    return df.withColumn(column, brewery_type_expr(F.col(column)))


def website_url_expr(col: Column) -> Column:
    """C5 — URL normalization as a native expression
    (ref: U/helpers.py:103-109): trim; ''/NULL -> NULL; prepend
    ``http://`` unless the value already matches ``^https?://``.
    """
    trimmed = F.trim(col)
    return (
        F.when(col.isNull() | (trimmed == ""), F.lit(None).cast("string"))
        .when(trimmed.rlike("^https?://"), trimmed)
        .otherwise(F.concat(F.lit("http://"), trimmed))
    )


def standardize_website_urls(df: DataFrame, column: str = "website_url") -> DataFrame:
    if column not in df.columns:
        return df
    return df.withColumn(column, website_url_expr(F.col(column)))


def fill_null_values(df: DataFrame, mapping: dict) -> DataFrame:
    """C6 — null fill (ref: U/helpers.py:169-180; defined-but-uncalled
    utility surface in the reference, kept for API parity)."""
    return df.fillna(mapping)


def add_ingestion_metadata(df: DataFrame) -> DataFrame:
    """C7 — bronze metadata: true timestamp (ref: U/helpers.py:312-323)."""
    return df.withColumn("ingestion_timestamp", F.current_timestamp())


def add_processing_metadata(df: DataFrame) -> DataFrame:
    """C8 — silver metadata: ISO-8601 *string* processed_at + literal
    etl_version (ref: U/helpers.py:134-147). String-ness is intentional —
    see schemas.py note."""
    return df.withColumns(
        {
            "processed_at": F.date_format(F.current_timestamp(), _ISO_FMT),
            "etl_version": F.lit(ETL_VERSION),
        }
    )


def add_quarantine_metadata(
    df: DataFrame, reason: str = QUARANTINE_REASON_MISSING_KEYS
) -> DataFrame:
    """C9 — quarantine annotations (ref: T/bronze_to_silver.py:182-183)."""
    return df.withColumns(
        {
            "quarantine_reason": F.lit(reason),
            "quarantine_timestamp": F.date_format(F.current_timestamp(), _ISO_FMT),
        }
    )


def silver_transform(df: DataFrame) -> DataFrame:
    """The full silver column-transform chain in reference order
    (ref: T/bronze_to_silver.py:72-76). Each step is a lazy projection;
    Catalyst fuses all five into a single codegen stage."""
    out = convert_string_columns(df)
    out = standardize_location_fields(out)
    out = standardize_brewery_types(out)
    out = standardize_website_urls(out)
    return add_processing_metadata(out)
