"""Synthesize a SKEWED parity dataset (third adversarial axis).

Degen covered NULLs, empty covered zero rows; neither covers the
100 TB killer — a grouping/join key where one value owns most rows.
This tool plants exactly that, deterministically (modular arithmetic
on stable ids, no RNG):

- orders: ONE customer (the min c_custkey) owns ~50% of all orders —
  the customer⋈orders join and every per-customer aggregate get a hot
  key; AQE skew-join and salting paths actually fire.
- lineitem: ONE supplier owns ~50% of lineitems and ONE part owns
  ~33% — supplier/part join hot keys at fact scale.
- events: ONE user owns ~90% of events — per-user windows (sessionize,
  paths, RFM, trends) hit a single giant partition-group; grouped-map
  applyInPandas sees one Arrow batch group with most of the table.
- documents: one boilerplate token is APPENDED TO EVERY doc (max_df /
  vocabulary-cap stress for TF-IDF, PMI, n-gram Jaccard, MinHash
  banding), and ~10% of docs become EXACT copies of the min-id doc
  (one content hash / one LSH bucket owning a tenth of the corpus).
- embeddings: ~30% of vectors are overwritten with the min-id vector —
  massive cosine ties (top-k tiebreak determinism) and one hot LSH/IVF
  cell.
- region/nation/customer/supplier/part: copied unchanged (dims keep
  referential integrity; the hot keys POINT AT them).

Both engines read the same skewed parquet, so the full-registry
`check_oracle.py /tmp/sfskew` sweep fails loudly on any
tie-nondeterminism or hot-key semantics divergence, while wall-clock
on the expensive queries exposes plans that blow up under skew
(the SCALING.md skew table / judge r10 item #3).

Usage: python tools/make_skew.py [SRC] [OUT]
       (defaults: /root/testdata/sf0.01 -> /tmp/sfskew)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfskew"


def _rp(name: str) -> str:
    """read_parquet() source for a table that may be a single file
    (driver testdata) or a Spark multi-part directory (scaled_sf1)."""
    p = f"{SRC}/{name}.parquet"
    if os.path.isdir(p):
        return f"read_parquet('{p}/*.parquet')"
    return f"read_parquet('{p}')"


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

    hot_cust = con.sql(
        f"SELECT min(c_custkey) FROM {_rp('customer')}"
    ).fetchone()[0]
    hot_supp = con.sql(
        f"SELECT min(s_suppkey) FROM {_rp('supplier')}"
    ).fetchone()[0]
    hot_part = con.sql(
        f"SELECT min(p_partkey) FROM {_rp('part')}"
    ).fetchone()[0]
    hot_user = con.sql(
        f"SELECT min(user_id) FROM {_rp('events')}"
        f" WHERE user_id IS NOT NULL"
    ).fetchone()[0]

    copy(
        f"""
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 2 = 0 THEN {hot_cust}
               ELSE o_custkey END AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {_rp('orders')}
        """,
        "orders",
    )

    copy(
        f"""
        SELECT l_orderkey,
          CASE WHEN l_orderkey % 3 = 0 THEN {hot_part}
               ELSE l_partkey END AS l_partkey,
          CASE WHEN l_orderkey % 2 = 0 THEN {hot_supp}
               ELSE l_suppkey END AS l_suppkey,
          l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate
        FROM {_rp('lineitem')}
        """,
        "lineitem",
    )

    copy(
        f"""
        SELECT event_id, ts,
          CASE WHEN event_id % 10 != 0 AND user_id IS NOT NULL
               THEN {hot_user} ELSE user_id END AS user_id,
          event_type, value, props
        FROM {_rp('events')}
        """,
        "events",
    )

    docs = f"{_rp('documents')}"
    copy(
        f"""
        SELECT doc_id,
          CASE
            WHEN doc_id % 10 = 7 THEN
              (SELECT text FROM {docs} d2
               WHERE d2.doc_id = (SELECT min(doc_id) FROM {docs}))
            ELSE text || ' skewtoken boilerplate skewtoken'
          END AS text,
          lang, source, n_chars
        FROM {docs}
        """,
        "documents",
    )

    emb = f"{_rp('embeddings')}"
    copy(
        f"""
        SELECT vec_id,
          CASE WHEN vec_id % 10 < 3 THEN
            (SELECT embedding FROM {emb} e2
             WHERE e2.vec_id = (SELECT min(vec_id) FROM {emb}))
          ELSE embedding END AS embedding,
          label
        FROM {emb}
        """,
        "embeddings",
    )

    for t in ("region", "nation", "customer", "supplier", "part"):
        copy(f"SELECT * FROM {_rp(t)}", t)


if __name__ == "__main__":
    main()
