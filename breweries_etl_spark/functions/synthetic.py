"""Deterministic brewery-shaped records derived from the driver testdata.

The reference's domain is a flat brewery record table (SURVEY.md §1.1);
the driver's correctness harness runs over TPC-H-ish tables. This module
bridges them: a dialect-portable SQL constructor (runs identically under
Spark SQL and DuckDB) that derives a brewery-like record from
customer ⋈ nation ⋈ region, including every edge the reference transforms
care about — NULL keys (quarantine path), mixed-case/padded type strings
(recode canonical path), unknown types ('other' path), NULL types
('unknown' path), and the four URL-normalization shapes.

Keeping the constructor as ONE shared SQL text removes any risk that the
Spark input and the oracle input diverge; the engine-side transforms are
then the package's DataFrame operators, and the oracle replicates their
semantics in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

# Dialect-portable: '||' concat, CAST(... AS STRING), simple CASE, and
# integer % behave identically in Spark SQL and DuckDB.
BREWERY_RAW_SQL = """
SELECT
  CASE WHEN c_custkey % 37 = 0 THEN NULL ELSE CAST(c_custkey AS STRING) END AS id,
  c_name AS name,
  CASE c_custkey % 13
    WHEN 0 THEN ' Micro '
    WHEN 1 THEN 'NANO'
    WHEN 2 THEN 'regional'
    WHEN 3 THEN 'BrewPub'
    WHEN 4 THEN 'large '
    WHEN 5 THEN 'planning'
    WHEN 6 THEN 'BAR'
    WHEN 7 THEN 'contract'
    WHEN 8 THEN 'Proprietor'
    WHEN 9 THEN 'closed'
    WHEN 10 THEN 'taproom'
    WHEN 11 THEN ''
    ELSE NULL
  END AS brewery_type,
  lower(n_name) AS state,
  'city_' || CAST(c_custkey % 100 AS STRING) AS city,
  CASE WHEN c_custkey % 41 = 0 THEN NULL ELSE lower(r_name) END AS country,
  CASE c_custkey % 5
    WHEN 0 THEN NULL
    WHEN 1 THEN ''
    WHEN 2 THEN ' www.brew' || CAST(c_custkey AS STRING) || '.com '
    WHEN 3 THEN 'https://brew' || CAST(c_custkey AS STRING) || '.org'
    ELSE 'brew' || CAST(c_custkey AS STRING) || '.net'
  END AS website_url
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def brewery_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the shared constructor. nation (25 rows) and region
    (5 rows) broadcast automatically under the session's
    autoBroadcastJoinThreshold — no shuffle for either join."""
    register_views(spark, sf_dir, ["customer", "nation", "region"])
    return spark.sql(BREWERY_RAW_SQL)


# Dirty-record constructor for entity resolution: each customer yields
# its clean record plus deterministic perturbed variants (dropped char,
# case flip, '#'→'-') within edit distance 1 of the normalized clean
# name, and one far negative control (' incorporated'). Same portability
# contract as BREWERY_RAW_SQL: substr/replace/lower/trim/'||'/% agree
# between Spark SQL and DuckDB.
ENTITY_RAW_SQL = """
SELECT c_custkey * 10 AS record_id, lower(trim(c_name)) AS name,
  c_custkey % 200 AS block
FROM customer
UNION ALL
SELECT c_custkey * 10 + 1, lower(substr(c_name, 1, 2) || substr(c_name, 4)),
  c_custkey % 200
FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT c_custkey * 10 + 2, lower(upper(c_name)), c_custkey % 200
FROM customer WHERE c_custkey % 3 = 0
UNION ALL
SELECT c_custkey * 10 + 3, lower(replace(c_name, '#', '-')), c_custkey % 200
FROM customer WHERE c_custkey % 5 = 0
UNION ALL
SELECT c_custkey * 10 + 4, lower(c_name || ' incorporated'), c_custkey % 200
FROM customer WHERE c_custkey % 7 = 0
"""


def entity_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(ENTITY_RAW_SQL)
