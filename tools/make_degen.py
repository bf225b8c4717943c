"""Synthesize an ADVERSARIAL parity dataset at /tmp/sfdegen.

Starts from sf0.001 and injects exactly the degeneracies that have
produced real cross-engine bugs in past rounds (NULL values reaching
rank windows where Spark sorts NULLS FIRST and DuckDB LAST, singleton
and constant-valued groups hitting unguarded variance denominators,
all-NULL days, empty-string and NULL documents):

- lineitem: ~10% NULL l_extendedprice / l_quantity; a singleton
  l_returnflag group 'X'; a constant-price group 'C'.
- events: one day whose values are ALL NULL; ~15% NULL value; one
  constant-value day; NULL user_id / event_type rows.
- orders: a singleton o_orderpriority; NULL o_totalprice sprinkle.
- customer: NULL c_acctbal / c_nationkey sprinkle.
- documents: empty-string and NULL text rows; NULL lang/source.
- embeddings: NULL label sprinkle.

The payoff is mechanical: `python tools/check_oracle.py /tmp/sfdegen`
re-runs the whole registry's Spark-vs-DuckDB compare on data where the
degenerate paths actually execute — sf0.001/sf0.01 are too clean to
reach them. Both engines run the same adversarial input, so any
NULL-ordering / annihilation / guard divergence fails loudly as a
parity mismatch instead of lurking until a real corpus hits it.

Deterministic: all mutations key off hash-free modular arithmetic on
stable ids, never RNG state.

A second adversarial axis lives beside this one: the EMPTY dataset
(all tables at zero rows, schemas intact), built inline by the round-10
session as /tmp/sfempty via DuckDB `LIMIT 0` copies — it drives the
annihilation / zero-partition-write / fit-on-empty classes that even
the NULL-heavy set cannot reach. Rebuild:

    python - <<'PY'
    import duckdb, os
    SRC, OUT = "/root/testdata/sf0.001", "/tmp/sfempty"
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') "
            f"LIMIT 0) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    PY
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfdegen"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    li = f"read_parquet('{SRC}/lineitem.parquet')"
    copy(
        f"""
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
          CASE WHEN l_orderkey % 11 = 3 THEN NULL ELSE l_quantity END
            AS l_quantity,
          CASE WHEN l_orderkey % 10 = 7 THEN NULL ELSE l_extendedprice END
            AS l_extendedprice,
          l_discount, l_tax,
          CASE WHEN l_orderkey % 997 = 1 AND l_linenumber = 1 THEN 'X'
               WHEN l_orderkey % 13 = 5 THEN 'C'
               ELSE l_returnflag END AS l_returnflag,
          l_linestatus, l_shipdate
        FROM {li}
        """.replace(
            "WHEN l_orderkey % 997 = 1 AND l_linenumber = 1 THEN 'X'",
            "WHEN l_orderkey = (SELECT min(l_orderkey) FROM "
            + li
            + ") AND l_linenumber = 1 THEN 'X'",
        ),
        "lineitem",
    )
    # constant-price group C: second pass is simpler than nested CASE —
    # rewrite prices for flag 'C' to one constant
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN l_returnflag = 'C' THEN 100.0
                 ELSE l_extendedprice END AS l_extendedprice)
          FROM read_parquet('{OUT}/lineitem.parquet')
        ) TO '{OUT}/lineitem2.parquet' (FORMAT PARQUET)
        """
    )
    os.replace(f"{OUT}/lineitem2.parquet", f"{OUT}/lineitem.parquet")

    ev = f"read_parquet('{SRC}/events.parquet')"
    # pick the 3rd and 4th distinct days as the all-NULL-value day and
    # the constant-value day (deterministic, exists at every SF)
    days = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000"
            f" AS d FROM {ev} WHERE ts IS NOT NULL ORDER BY d LIMIT 4"
        ).fetchall()
    ]
    null_day, const_day = days[2], days[3]
    copy(
        f"""
        SELECT event_id, ts,
          CASE WHEN event_id % 17 = 2 THEN NULL ELSE user_id END AS user_id,
          CASE WHEN event_id % 23 = 9 THEN NULL ELSE event_type END
            AS event_type,
          CASE
            WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = {null_day}
              THEN NULL
            WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = {const_day}
              THEN 42.0
            WHEN event_id % 7 = 4 THEN NULL
            ELSE value END AS value,
          props
        FROM {ev}
        """,
        "events",
    )

    copy(
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 9 = 2 THEN NULL ELSE o_totalprice END
            AS o_totalprice,
          o_orderdate,
          CASE WHEN o_orderkey = (SELECT min(o_orderkey) FROM
            read_parquet('{SRC}/orders.parquet')) THEN '9-SINGLETON'
            WHEN o_orderkey % 19 = 6 THEN NULL
            ELSE o_orderpriority END AS o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet')
        """,
        "orders",
    )

    copy(
        f"""
        SELECT c_custkey, c_name,
          CASE WHEN c_custkey % 12 = 5 THEN NULL ELSE c_nationkey END
            AS c_nationkey,
          CASE WHEN c_custkey % 8 = 3 THEN NULL ELSE c_acctbal END
            AS c_acctbal,
          c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet')
        """,
        "customer",
    )

    copy(
        f"""
        SELECT doc_id,
          CASE WHEN doc_id % 29 = 4 THEN NULL
               WHEN doc_id % 29 = 11 THEN ''
               WHEN doc_id % 29 = 18 THEN '   '
               ELSE text END AS text,
          CASE WHEN doc_id % 15 = 6 THEN NULL ELSE lang END AS lang,
          CASE WHEN doc_id % 21 = 8 THEN NULL ELSE source END AS source,
          n_chars
        FROM read_parquet('{SRC}/documents.parquet')
        """,
        "documents",
    )

    copy(
        f"""
        SELECT vec_id, embedding,
          CASE WHEN vec_id % 10 = 1 THEN NULL ELSE label END AS label
        FROM read_parquet('{SRC}/embeddings.parquet')
        """,
        "embeddings",
    )

    for t in ("region", "nation", "supplier", "part"):
        copy(f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')", t)


if __name__ == "__main__":
    main()
