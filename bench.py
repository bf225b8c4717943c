"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Each query's full plan is forced with the noop sink (executes everything,
writes nothing) rather than count() — count() would let Catalyst prune
the projections we want measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from breweries_etl_spark.session import get_spark

# Queries that represent the engine's cost profile: scans+aggs, multi-way
# joins, windows, the silver transform chain, and the scale extensions.
HEADLINE = [
    "gold_by_type_location",
    "silver_transform",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "topk_orders_per_customer",
    "window_function_suite",
    "rollup_orders",
    "pivot_events",
    "dedup_exact",
    "dedup_minhash_pairs",
    "similarity_topk",
    "similarity_topk_pandas",
    "text_stats",
    "text_fingerprint",
    "events_sessionize",
    "events_session_window",
    "asof_purchase_view",
    "merge_upsert",
    "json_extract_stats",
    "range_join_error_window",
    "contamination_check",
    "feature_hash_counts",
    "pack_sequences",
    "graph_bfs_levels",
    "gopher_quality_flags",
    "corpus_dup_ngrams",
    "cluster_assign",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM/codegen once with the cheapest query so timings measure
    # the plans, not first-call classloading.
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two passes per query, keep the faster: one stray GC pause or python
    # worker spin-up shouldn't define the recorded number.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            start = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.monotonic() - start, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
