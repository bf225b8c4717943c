"""Per-query empirical profiler (guide §1/§7): run one or more bench
queries in a fresh JVM with the Spark UI enabled, and attribute the
steady-state wall-clock to jobs/stages via the UI REST API — how many
jobs a query launches, where task time goes (compute vs shuffle), and
which stages dominate.

Usage:
    python tools/profile_query.py q1 [q2 ...]        # profile
    python tools/profile_query.py --explain q1 ...   # formatted plans

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Output: one JSON object per query on stdout with
    wall_sec        timed noop-sink run (after 1 warm run)
    n_jobs          jobs launched by the timed run
    n_stages        completed stages
    task_time_sec   summed task durations across those stages
    top_stages      [{name, sec, tasks, shuffle_read_mb, shuffle_write_mb,
                      input_mb}, ...] five biggest by duration
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from breweries_etl_spark.session import get_spark


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    explain_only = False
    names = sys.argv[1:]
    if names and names[0] == "--explain":
        explain_only = True
        names = names[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile_query",
        # port 0: let Spark pick a free port (ADVICE r12 — a pinned 4049
        # silently increments under contention while the script still
        # queried 4049); read the bound port back from uiWebUrl and
        # select THIS application's id, not whatever the REST API lists
        # first.
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    qs = entrymod.queries()

    if explain_only:
        for name in names:
            print(f"===== {name} =====")
            qs[name](spark, sf_dir).explain("formatted")
        return

    ui_url = spark.sparkContext.uiWebUrl  # e.g. http://host:4040
    base = f"{ui_url}/api/v1/applications"
    my_app = spark.sparkContext.applicationId
    app_id = next(a["id"] for a in _get(base) if a["id"] == my_app)

    # pre-warm JVM + python workers like bench.py
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        fn = qs[name]
        # warm run (codegen, caches the query itself builds)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        jobs_before = {j["jobId"] for j in _get(f"{base}/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _get(f"{base}/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in _get(f"{base}/{app_id}/stages/{sid}"):
                    if att["status"] in ("COMPLETE", "FAILED"):
                        stages.append(att)
            except Exception:
                pass
        top = sorted(
            stages, key=lambda s: -(s.get("executorRunTime", 0) or 0)
        )[:5]
        out = {
            "query": name,
            "wall_sec": round(wall, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "task_time_sec": round(
                sum((s.get("executorRunTime", 0) or 0) for s in stages) / 1000.0, 2
            ),
            "top_stages": [
                {
                    "name": (s.get("name") or "")[:80],
                    "sec": round((s.get("executorRunTime", 0) or 0) / 1000.0, 2),
                    "tasks": s.get("numCompleteTasks"),
                    "shuffle_read_mb": round(
                        (s.get("shuffleReadBytes", 0) or 0) / 1e6, 1
                    ),
                    "shuffle_write_mb": round(
                        (s.get("shuffleWriteBytes", 0) or 0) / 1e6, 1
                    ),
                    "input_mb": round((s.get("inputBytes", 0) or 0) / 1e6, 1),
                }
                for s in top
            ],
        }
        print("PROFILE " + json.dumps(out), flush=True)
        if os.environ.get("PROFILE_SQL"):
            # Per-operator attribution from the SQL tab: dump the node
            # metrics of every SQL execution the timed run launched.
            try:
                execs = _get(f"{base}/{app_id}/sql?details=true&length=200")
                for e in execs[-6:]:
                    nodes = []
                    for n in e.get("nodes", []):
                        mets = {
                            m["name"]: m["value"]
                            for m in n.get("metrics", [])
                            if any(
                                k in m["name"]
                                for k in (
                                    "time total",
                                    "total time",
                                    "number of output rows",
                                    "duration",
                                )
                            )
                        }
                        if mets:
                            nodes.append(
                                {"node": n["nodeName"][:60], **mets}
                            )
                    print(
                        "SQLEXEC "
                        + json.dumps(
                            {
                                "query": name,
                                "id": e["id"],
                                "status": e.get("status"),
                                "nodes": nodes,
                            }
                        ),
                        flush=True,
                    )
            except Exception as ex:  # pragma: no cover
                print(f"SQLEXEC_ERR {ex}", flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
