"""Common-set drift bisect (round-10, judge r9 #3; widened to 42
queries in round-11 per judge r10 #6 — now the STANDING bench
protocol): the r8→r9 common bench drifted ~1.13–1.17× on BOTH
protocols. This probe separates CODE from ENVIRONMENT: run the
identical fixed query set with the identical solo protocol against
two repo checkouts back-to-back on the same (idle) machine. If r8-code-now ≈ HEAD-code-now, the code is
exonerated and the residual vs the COMMITTED r8 numbers is machine
drift between measurement days; a per-query gap concentrated in one
family points at its r9 code change instead.

Protocol per query (bench.py's): warm ×1, timed ×2 (median of the two
reported as best proxy — matches the scale probe's steady-state
convention), noop sink, clearCache + GC between queries, one JVM for
the whole set.

Usage: python tools/drift_probe.py <repo_root> [sf_dir] [--tag NAME]
Prints one JSON line {"tag", "repo", "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import sys
import time

REPO = sys.argv[1]
argv = sys.argv[2:]
TAG = "probe"
if "--tag" in argv:
    i = argv.index("--tag")
    TAG = argv[i + 1]
    del argv[i : i + 2]
SF_DIR = argv[0] if argv else "/root/testdata/sf0.1"

sys.path.insert(0, REPO)

# 20 queries present in BOTH r8 and r9 registries, spanning the
# families the r9 verdict flagged plus plain scan/agg controls:
# _ddwf-heavy closers, prefix-count pipelines, graph, windows, scans.
QUERIES = [
    "tpch_q1",                      # scan/agg control
    "tpch_q6",                      # scan control
    "gold_by_type_location",        # tiny agg control
    "ansari_bradley_price_flag",    # prefix-count (flagged in r9 solo)
    "mann_whitney_price_returnflag",
    "moods_median_price_flag",
    "kruskal_wallis_price_flag",
    "dunn_pairwise_price_flag",     # the open perf question
    "quantile_normalize_price",
    "winsorized_price_stats",
    "spearman_price_qty",
    "lineitem_price_ecdf",
    "graph_rich_club",              # flagged 2.28x solo in r9
    "graph_local_clustering",
    "graph_kcore_summary",
    "robust_scale_orders",
    "decayed_user_value",
    "bigram_lm_scores",
    "winnowing_fingerprints",
    "jarque_bera_price",            # _ddw closing chain
    # round-11 widening (judge r10 #6): the full graph family — the
    # r8/r10 false-alarm pair lived here, so the standing probe must
    # cover it — plus the newest statistics waves (18–20) and the
    # remaining heavy tail of BENCH_r10.
    "graph_harmonic_centrality",    # r10 protocol-disagreement monitor
    "graph_edge_embeddedness",
    "graph_bfs_levels",
    "graph_modularity_nation",
    "graph_degree_assortativity",
    "bootstrap_mean_orders",        # BENCH_r10 tail
    "fligner_killeen_price_flag",
    "bws_test_price_status",
    "lepage_price_flag",            # wave 18–20 statistics
    "pettitt_daily_value",
    "foster_stuart_daily_value",
    "fleiss_kappa_docs",
    "dagostino_k2_price",
    "permutation_entropy_daily",
    "variance_ratio_daily",
    "buishand_range_daily",
    "diversity_sources_docs",
    "chatterjee_xi_daily",          # r9 reconciled names
    "seasonal_mann_kendall_daily",
    "wilson_ci_priority",
    "jackknife_ratio_nation",
    "logrank_retention_cohorts",
]


def main() -> None:
    from breweries_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(f"drift_{TAG}")
    qs = entrymod.queries()
    # worker pre-warm (bench.py convention)
    qs["tpch_q6"](spark, "/root/testdata/sf0.01").write.format(
        "noop"
    ).mode("overwrite").save()
    out = {}
    for name in QUERIES:
        if name not in qs:
            out[name] = None
            continue
        times = []
        for i in range(3):  # warm + 2 timed
            start = time.monotonic()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.monotonic() - start
            if i > 0:
                times.append(round(el, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = round(sorted(times)[len(times) // 2], 3)
    print(json.dumps({"tag": TAG, "repo": REPO, "queries": out}))


if __name__ == "__main__":
    main()
