"""Physical-plan audits — structural invariants a 100 TB deployment
depends on, checkable from the FORMATTED explain text without running
the query.

The headline invariant (round-8 verdict #3): every
BroadcastNestedLoopJoin/Cross join must broadcast a BOUNDED relation.
Until now only convention protected this — all 58 BNLJ occurrences in
PLANS.md happened to keep an aggregated (or top-k) relation under the
BroadcastExchange, but nothing failed if a refactor ever broadcast a
fact-scale side. ``bnlj_violations`` turns the convention into a
checkable rule:

- CartesianProduct is banned outright (it means a cross join where
  NEITHER side was broadcastable — at scale that is an n·m shuffle
  explosion, never intended by any operator here).
- Under each BroadcastNestedLoopJoin's BroadcastExchange, every scan
  leaf (parquet / InMemoryTableScan / BatchScan / checkpointed RDD)
  must have a BOUNDING ancestor inside the broadcast subtree: an
  Aggregate (scalar or k-row fold) or a TakeOrderedAndProject /
  *Limit (top-k). A raw fact scan directly under the exchange is a
  driver OOM at scale and fails the audit.
"""

from __future__ import annotations

import re

_SCAN_RE = re.compile(
    r"(Scan parquet|InMemoryTableScan|BatchScan|Scan ExistingRDD)"
)
_BOUNDING_RE = re.compile(
    r"(Aggregate|TakeOrderedAndProject|GlobalLimit|LocalLimit|CollectLimit)"
)


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def tree_lines(plan: str) -> list:
    """(depth, node_name) per tree line of a formatted physical plan.
    Depth is the structural prefix length (spaces / ':' / '+' / '-'),
    identical for siblings regardless of the whole-stage-codegen '*'
    marker, which belongs to the name field."""
    tree = plan.split("\n\n")[0].splitlines()
    out = []
    for ln in tree:
        if ln.startswith("=="):
            continue
        m = re.match(r"^([ :+\-]*)(.*)$", ln)
        name = m.group(2)
        if not name.strip():
            continue
        out.append((len(m.group(1)), name.lstrip("* ")))
    return out


def bnlj_violations(plan: str) -> list:
    """Names of plan nodes violating the bounded-broadcast rule (empty
    list = plan is clean). See module docstring for the rule."""
    lines = tree_lines(plan)
    viol = []
    for _, n in lines:
        if n.startswith("CartesianProduct"):
            viol.append(n)
    for i, (d, name) in enumerate(lines):
        if not name.startswith("BroadcastNestedLoopJoin"):
            continue
        j = i + 1
        sub = []
        while j < len(lines) and lines[j][0] > d:
            sub.append(lines[j])
            j += 1
        if not sub:
            continue
        child_depth = min(s[0] for s in sub)
        for ci, (cd, cname) in enumerate(sub):
            if cd != child_depth or not cname.startswith(
                "BroadcastExchange"
            ):
                continue
            k = ci + 1
            stack: list = []
            while k < len(sub) and sub[k][0] > cd:
                sd, sname = sub[k]
                while stack and stack[-1][0] >= sd:
                    stack.pop()
                if _SCAN_RE.match(sname) and not any(
                    _BOUNDING_RE.search(a) for _, a in stack
                ):
                    viol.append(f"{name} -> unbounded {sname}")
                stack.append((sd, sname))
                k += 1
    return viol
