"""Compose the SKEW and DEGEN axes into the STANDING FIFTH adversarial
dataset at sf0.01 scale (judge r11 next-round #1, promoting the r11
bonus tiny-scale sweep): /tmp/sfskewdegen = make_degen applied on top
of /tmp/sfskew, PLUS three hot-key∧NULL compositions the independent
axes cannot express — a NULL cloud *inside* a hot key's majority share
at volume, and an all-NULL hot partition-day:

1. orders: the HOT customer (50% of all orders after make_skew) gets
   o_totalprice NULLed on every o_orderkey % 3 = 0 — ~⅓ of the hot
   share is NULL, so per-customer aggregates meet a hot group that is
   simultaneously the biggest AND the most NULL-ridden.
2. events: the HOT user's rows on its EARLIEST active day have value
   = NULL — an all-NULL partition that is also the giant Arrow-batch
   group every per-user grouped-map sees first.
3. lineitem: the HOT supplier's rows get l_extendedprice NULLed on
   l_orderkey % 5 = 0 — a hot JOIN key whose measure column is ~20%
   NULL on top of the degen sprinkle.

Deterministic (modular arithmetic on stable ids; the hot keys are the
min-keys planted by make_skew). Usage:

    python tools/make_skew.py                  # sf0.01 -> /tmp/sfskew
    python tools/make_skewdegen.py             # -> /tmp/sfskewdegen
    python tools/check_oracle.py /tmp/sfskewdegen --json \\
        ORACLE_SKEWDEGEN_r{N}.json

Both engines read the same parquet, so any divergence in hot-key
semantics under NULL-heavy groups fails loudly as a parity mismatch.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfskewdegen"
HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    subprocess.run(
        [sys.executable, os.path.join(HERE, "make_degen.py"), SRC, OUT],
        check=True,
    )
    con = duckdb.connect()

    def rewrite(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{name}2.parquet' (FORMAT PARQUET)"
        )
        os.replace(f"{OUT}/{name}2.parquet", f"{OUT}/{name}.parquet")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name} (hot-null composed): {n} rows")

    # hot keys as planted by make_skew (min keys of the SKEW source)
    hot_cust = con.sql(
        f"SELECT min(c_custkey) FROM read_parquet('{SRC}/customer.parquet')"
    ).fetchone()[0]
    hot_supp = con.sql(
        f"SELECT min(s_suppkey) FROM read_parquet('{SRC}/supplier.parquet')"
    ).fetchone()[0]
    hot_user = con.sql(
        f"SELECT min(user_id) FROM read_parquet('{SRC}/events.parquet')"
        f" WHERE user_id IS NOT NULL"
    ).fetchone()[0]

    rewrite(
        "orders",
        f"""
        SELECT * REPLACE (
          CASE WHEN o_custkey = {hot_cust} AND o_orderkey % 3 = 0
               THEN NULL ELSE o_totalprice END AS o_totalprice)
        FROM read_parquet('{OUT}/orders.parquet')
        """,
    )

    hot_day = con.sql(
        f"SELECT min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)"
        f" FROM read_parquet('{OUT}/events.parquet')"
        f" WHERE user_id = {hot_user} AND ts IS NOT NULL"
    ).fetchone()[0]
    rewrite(
        "events",
        f"""
        SELECT * REPLACE (
          CASE WHEN user_id = {hot_user}
                AND ts IS NOT NULL
                AND epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                    = {hot_day}
               THEN NULL ELSE value END AS value)
        FROM read_parquet('{OUT}/events.parquet')
        """,
    )

    rewrite(
        "lineitem",
        f"""
        SELECT * REPLACE (
          CASE WHEN l_suppkey = {hot_supp} AND l_orderkey % 5 = 0
               THEN NULL ELSE l_extendedprice END AS l_extendedprice)
        FROM read_parquet('{OUT}/lineitem.parquet')
        """,
    )


if __name__ == "__main__":
    main()
