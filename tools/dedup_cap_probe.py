"""Measure the dedup family's blowup caps at the dup-heavy sf1ish
probe: capped (production defaults) vs uncapped, same data, same
session — so the documented mitigation for the only superlinear rows
in SCALING.md is MEASURED, not just claimed (round-8 verdict #6).

sf1ish plants every document ×10, so every boilerplate shingle/band
bucket holds ≥10 copies of each member — exactly the degenerate shape
the caps exist for. Uncapped, candidate counts grow with the square of
bucket size; capped, oversized buckets are dropped (minhash LSH
``max_bucket``) or boilerplate shingles are excluded from candidate
generation (``max_df``).

Two fixtures:

1. plain sf1ish — copy multiplicity 10 means every bucket holds ~10
   ids, far under the caps: capped and uncapped must produce the SAME
   pairs at ~the same time (the cap is zero-cost insurance on healthy
   data — measured, not assumed).
2. boilerplate sf1ish — the same corpus with a long shared prefix
   planted on doc_id % 2 == 0, the "every page shares a header"
   degeneracy the caps exist for. The jaccard/containment paths
   set-group-collapse the ×10 copies first, so the plant must hit
   ~half the DISTINCT sets (~2.5k reps) to push the boilerplate
   shingles' df past the 1000 cap: uncapped, each of the ~38
   boilerplate shingles then emits C(2.5k,2) ≈ 3.1M candidate pairs
   (~119M join rows before distinct) that all FAIL verification —
   pure wasted quadratic work the df-cap provably skips (a pair is
   sacrificed only if boilerplate is its ONLY shared evidence).

Usage: python tools/dedup_cap_probe.py   (requires /tmp/scaled_sf1;
build via tools/scale_probe.py --rebuild). Prints a JSON line and a
markdown table to append to SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from breweries_etl_spark.operators import dedup
from breweries_etl_spark.session import get_spark
from breweries_etl_spark.sources.tables import load_table
from tools.benchlock import acquire_or_die

SF1ISH = "/tmp/scaled_sf1"
UNCAPPED = 10**9
BOILER = (
    "subscribe to our newsletter terms of service privacy policy all "
    "rights reserved copyright contact us about careers press blog "
    "sitemap help center community guidelines cookie settings do not "
    "sell my information accessibility statement affiliate disclosure "
)


def variants(docs):
    return [
        # (label, cap setting, thunk)
        ("minhash capped", "max_bucket=1000", lambda: dedup.minhash_near_duplicates(
            docs, threshold=0.5, release=False)),
        ("minhash uncapped", "max_bucket=inf", lambda: dedup.minhash_near_duplicates(
            docs, threshold=0.5, max_bucket=UNCAPPED, release=False)),
        ("ngram_jaccard capped", "max_df=1000", lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, release=False)),
        ("ngram_jaccard uncapped", "max_df=None", lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.5, max_df=None, release=False)),
        ("containment capped", "max_df=1000", lambda: dedup.containment_pairs(
            docs, threshold=0.8, release=False)),
        ("containment uncapped", "max_df=None", lambda: dedup.containment_pairs(
            docs, threshold=0.8, max_df=None, release=False)),
    ]


def run_fixture(spark, docs, fixture, out, rows):
    for label, cap, thunk in variants(docs):
        # pass 1 warms codegen/caches; report pass 2 + the output
        # pair count (the quantity the cap actually bounds)
        n_pairs = thunk().count()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        thunk().write.format("noop").mode("overwrite").save()
        secs = round(time.monotonic() - t0, 2)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        out[f"{fixture}/{label}"] = {"sec": secs, "pairs": n_pairs, "cap": cap}
        rows.append(f"| {fixture} | {label} | {cap} | {secs} | {n_pairs} |")
        print(f"{fixture:12s} {label:24s} {cap:16s} {secs:8.2f}s  "
              f"{n_pairs} pairs", flush=True)


def main() -> None:
    spark = get_spark("dedup_cap_probe")
    acquire_or_die("dedup_cap_probe")
    docs = load_table(spark, SF1ISH, "documents")
    boiler = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit(BOILER), F.col("text"))
        ).otherwise(F.col("text")),
    )
    out: dict = {}
    rows: list = []
    run_fixture(spark, docs, "plain", out, rows)
    run_fixture(spark, boiler, "boilerplate", out, rows)
    print(json.dumps({"sf": "sf1ish", "results": out}))
    print("\n| fixture | variant | cap | sec @ sf1ish | verified pairs |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
