"""Engine-vs-oracle algorithm-equality proof for the image_ahash_pairs
bucket cap (ADVICE r5, medium): the synthetic aHash depends only on
doc_id % 256, so bucket sizes grow linearly with corpus size and the
``max_bucket`` cap WILL bind at a large enough SF. The registered
oracle now mirrors the cap (HAVING count(*) <= max_bucket before pair
expansion); this fixture proves the two sides drop the SAME pairs when
the cap binds, so parity is equality of algorithm, not coincidence of
the sampled scale factor.

Fixture (cap = 4):

- residue-0 group {256, 512, 768, 1024, 1280}: five images share one
  ahash (bucket size 5 > cap) — BOTH sides must emit zero pairs from
  it, while an uncapped engine run still reports all 10 (cap provably
  binds).
- residue-1 group {1, 257, 513}: bucket size 3 <= cap — all 3 pairs
  survive on both sides.
- singleton 2: no pair anywhere.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from breweries_etl_spark.operators import multimodal

CAP = 4
DOC_IDS = [256, 512, 768, 1024, 1280, 1, 257, 513, 2]

ORACLE_SQL = f"""
WITH px AS (
  SELECT d.doc_id, ys.y, xs.x,
         (d.doc_id * 31 + xs.x * 14 + ys.y * 26) %% 256 AS v
  FROM documents d,
       (SELECT unnest(range(0, 8)) AS x) xs,
       (SELECT unnest(range(0, 8)) AS y) ys
),
tot AS (SELECT doc_id, sum(v) AS t FROM px GROUP BY doc_id),
bits AS (
  SELECT px.doc_id,
    string_agg(CASE WHEN v * 64 >= t THEN '1' ELSE '0' END, '' ORDER BY y, x) AS ahash
  FROM px JOIN tot USING (doc_id) GROUP BY px.doc_id
),
kept AS (SELECT ahash FROM bits GROUP BY ahash HAVING count(*) <= {CAP})
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ahash
FROM bits a JOIN bits b ON a.ahash = b.ahash AND a.doc_id < b.doc_id
JOIN kept ON a.ahash = kept.ahash
ORDER BY id_a, id_b
""".replace("%%", "%")


@pytest.fixture(scope="module")
def fixture_pairs(spark):
    docs = spark.createDataFrame(
        [(i,) for i in DOC_IDS], schema="doc_id long"
    )
    assets = multimodal.synthetic_image_assets(docs, width=16, height=16)
    capped = sorted(
        (r["id_a"], r["id_b"], r["ahash"])
        for r in multimodal.image_ahash_dup_pairs(
            assets, max_bucket=CAP
        ).collect()
    )
    uncapped = sorted(
        (r["id_a"], r["id_b"])
        for r in multimodal.image_ahash_dup_pairs(
            assets, max_bucket=10**9
        ).collect()
    )
    return capped, uncapped


def test_cap_binds_on_fixture(fixture_pairs):
    capped, uncapped = fixture_pairs
    # uncapped: C(5,2) + C(3,2) = 13 pairs; capped drops the size-5 bucket
    assert len(uncapped) == 13
    assert len(capped) == 3
    assert {(a, b) for a, b, _ in capped} == {(1, 257), (1, 513), (257, 513)}


def test_engine_matches_capped_oracle(fixture_pairs):
    capped, _ = fixture_pairs
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": DOC_IDS}).astype("int64")
    )
    oracle = [
        (int(a), int(b), h) for a, b, h in con.execute(ORACLE_SQL).fetchall()
    ]
    assert capped == oracle
