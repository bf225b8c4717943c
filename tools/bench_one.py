"""Run ONE (or a few) bench queries in a FRESH JVM and print per-query
timings as JSON — the attribution tool for separating real plan cost from
session-state bleed (accumulated caches/checkpoints/GC from earlier
queries in a shared session).

Usage: python tools/bench_one.py q1 [q2 ...]   (env: SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from breweries_etl_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_one")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in names:
        # warm codegen + python workers with the query itself, then time 2.
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
    print(json.dumps(timings))


if __name__ == "__main__":
    from benchlock import acquire_or_die

    acquire_or_die("bench_one.py")
    main()
