"""Engine configuration: medallion layout + pipeline constants.

Mirrors the reference's constants surface (reference:
airflow/dags/brewery_etl/transformations/utils/constants.py:3-30) with a
configurable root instead of the hard-coded /opt/airflow paths, so tests
and production runs point anywhere (local fs, HDFS, s3a://...).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# The five key fields that must be present and non-null after silver
# (ref: U/constants.py:17, used at T/bronze_to_silver.py:118,177).
KEY_FIELDS: list[str] = ["id", "brewery_type", "state", "city", "country"]

# Columns force-cast to string at silver (ref: U/constants.py:18).
STRING_COLUMNS: list[str] = ["id", "brewery_type", "state", "city", "country"]

# Canonical brewery types — identity map of 10 values; anything else
# recodes to 'other', NULL recodes to 'unknown'
# (ref: U/constants.py:19-30, U/helpers.py:60-86).
STANDARD_BREWERY_TYPES: dict[str, str] = {
    "micro": "micro",
    "nano": "nano",
    "regional": "regional",
    "brewpub": "brewpub",
    "large": "large",
    "planning": "planning",
    "bar": "bar",
    "contract": "contract",
    "proprietor": "proprietor",
    "closed": "closed",
}
BREWERY_TYPE_MISS = "other"
BREWERY_TYPE_NULL = "unknown"

QUARANTINE_REASON_MISSING_KEYS = "missing_key_values"
ETL_VERSION = "1.0"

# REST source operating constants (ref: U/constants.py:12-14,
# T/extract_brewery_data.py:124, U/helpers.py:215).
API_BASE_URL = "https://api.openbrewerydb.org/v1/breweries"
API_PER_PAGE_LIMIT = 200
API_TIMEOUT_S = 120
API_MAX_RETRIES = 3
API_RETRY_BACKOFF_S = 5
API_PAGE_THROTTLE_S = 0.5


@dataclass
class MedallionPaths:
    """Landing → bronze → silver → gold (+ quarantine) directory layout
    (ref: U/constants.py:3-9)."""

    root: str
    landing: str = field(init=False)
    bronze: str = field(init=False)
    silver: str = field(init=False)
    gold: str = field(init=False)
    quarantine: str = field(init=False)

    def __post_init__(self) -> None:
        self.landing = os.path.join(self.root, "landing")
        self.bronze = os.path.join(self.root, "bronze")
        self.silver = os.path.join(self.root, "silver")
        self.gold = os.path.join(self.root, "gold")
        self.quarantine = os.path.join(self.root, "quarantine")

    def gold_table(self, name: str) -> str:
        # One table per aggregation under GOLD/{name}
        # (ref: T/silver_to_gold.py:143-145).
        return os.path.join(self.gold, name)


# Partition column for the silver layer — the uppercased country
# (ref: U/helpers.py:56, T/bronze_to_silver.py:142). Country is a
# low-cardinality, potentially *skewed* key (most breweries are in one
# country); sinks.writers handles skew by also hashing into subfiles.
SILVER_PARTITION_COLUMN = "location"

TESTDATA_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
