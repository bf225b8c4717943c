"""Skew runtime probe (judge r10 #3, second half): time a fixed set of
queries on uniform sf0.1 vs the hot-key skewed twin (/tmp/sfskew01,
built by `tools/make_skew.py /root/testdata/sf0.1 /tmp/sfskew01`) in
ONE warm session and report the skew/uniform ratio per query.

The set = the BENCH_r10 expensive tail + the families the skew axis
aims at: per-user windows and grouped-map Arrow ops (one user owns 90%
of events — one giant partition-group), the customer/supplier hot-key
joins, the dedup family on boilerplate-token + exact-copy documents,
and ANN over 30% identical vectors. A ratio ≫ input-growth with no
workload excuse = a plan that dies at 100 TB skew (salting/AQE
candidates); ratios driven by genuinely larger outputs (dup pair
counts explode by construction) are the workload, not the plan.

Protocol per (query, dir): warm ×1, timed ×2, median; noop sink;
clearCache + GC between runs; uniform first, then skew.

Usage: python tools/skew_probe.py [--tag NAME] [--sf1ish]
Prints one JSON line {"tag", "queries": {name: {"uniform", "skew",
"ratio"}}}.

``--sf1ish`` (judge r11 next-round #3): run the SMALLER tail set at
10× the data — uniform /tmp/scaled_sf1 (scale_probe.build_scaled) vs
its skewed twin /tmp/sfskew1 (`tools/make_skew.py /tmp/scaled_sf1
/tmp/sfskew1`). The shapes whose skew behavior can change regime at
10× are exactly the graph family, dedup_minhash_pairs, and the
per-user grouped-map windows (one user = 90% of ~1M events = one
~900k-row sorted run inside a single Arrow batch group). Protocol
drops to warm ×1 + timed ×1 per (query, dir) — at this scale the
signal is regime change (≫3× for plan reasons), not ±10% noise.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

UNIFORM = "/root/testdata/sf0.1"
SKEWED = "/tmp/sfskew01"

QUERIES = [
    # BENCH_r10 expensive tail
    "graph_harmonic_centrality", "graph_edge_embeddedness",
    "graph_local_clustering", "bootstrap_mean_orders", "graph_bfs_levels",
    "fligner_killeen_price_flag", "quantile_normalize_price",
    "moods_median_price_flag", "logreg_train_weights", "pca_top_component",
    "ansari_bradley_price_flag", "graph_pagerank_top", "ab_test_value",
    "dunn_pairwise_price_flag",
    # hot-key joins / per-customer aggregates
    "tpch_q3", "tpch_q5", "topk_orders_per_customer", "salted_skew_join",
    # one user owns 90% of events: windows + grouped-map Arrow
    "events_sessionize", "top_event_paths", "rfm_segments",
    "decayed_user_value", "user_value_trend_pandas",
    # boilerplate token in every doc + 10% exact copies
    "dedup_exact", "dedup_minhash_pairs", "corpus_dup_ngrams",
    # 30% identical embeddings
    "similarity_topk",
]

# the sf1ish regime-change set (judge r11 #3): graph family, banded
# dedup, per-user grouped-map windows, hot-key joins
SF1_QUERIES = [
    "graph_harmonic_centrality", "graph_bfs_levels",
    "graph_edge_embeddedness", "graph_local_clustering",
    "graph_pagerank_top",
    "dedup_minhash_pairs",
    "events_sessionize", "top_event_paths", "rfm_segments",
    "decayed_user_value", "user_value_trend_pandas",
    "tpch_q5", "topk_orders_per_customer",
]


def main() -> None:
    from breweries_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    tag = "skew_probe"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    sf1 = "--sf1ish" in sys.argv
    uniform, skewed = UNIFORM, SKEWED
    names = QUERIES
    runs = 3
    if sf1:
        uniform, skewed = "/tmp/scaled_sf1", "/tmp/sfskew1"
        names = SF1_QUERIES
        runs = 2  # warm ×1 + timed ×1: regime-change signal, not noise
        if tag == "skew_probe":
            tag = "skew_probe_sf1ish"
    spark = get_spark(f"skew_{tag}")
    qs = entrymod.queries()
    qs["tpch_q6"](spark, "/root/testdata/sf0.01").write.format(
        "noop"
    ).mode("overwrite").save()

    def timed(name: str, sf_dir: str) -> float:
        times = []
        for i in range(runs):
            start = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            el = time.monotonic() - start
            if i > 0:
                times.append(round(el, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        return round(sorted(times)[len(times) // 2], 3)

    out = {}
    for name in names:
        u = timed(name, uniform)
        s = timed(name, skewed)
        out[name] = {
            "uniform": u,
            "skew": s,
            "ratio": round(s / u, 2) if u > 0 else None,
        }
        print(f"{name}: uniform {u}s skew {s}s ratio {out[name]['ratio']}",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "tag": tag,
        "sf": "sf1ish" if sf1 else "sf0.1",
        "uniform_dir": uniform,
        "skew_dir": skewed,
        "queries": out,
    }))


if __name__ == "__main__":
    main()
