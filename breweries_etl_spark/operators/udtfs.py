"""Python user-defined table functions (Spark 4 UDTF API).

The engine's policy is native expressions first (every hot-path text
operator in `operators/text.py` is codegen'd), but the UDTF surface is
part of the platform: a table function is the right tool when one input
row legitimately yields a *variable* number of typed output rows and the
row logic is imperative (real sentence splitters, tokenizers, parsers).
This module keeps the semantics deliberately regex-simple so a SQL
oracle can replay them; swap the body for spaCy/blingfire per deployment.

Scale shape: a UDTF runs per-partition inside the Python worker; rows
stream through Arrow batches. There is no shuffle — it is a flatMap.
Applied via the SQL `LATERAL` correlation so Catalyst still prunes and
pushes filters around it.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_SPLIT = re.compile(r"[.!?]+")
_EDGE_WS = re.compile(r"^[ \t\n\r]+|[ \t\n\r]+$")


@udtf(returnType="sent_idx: int, sentence: string, n_chars: int")
class SplitSentences:
    """text -> one row per non-empty sentence.

    Split on [.!?]+ runs, strip ASCII edge whitespace, drop empties;
    sent_idx counts surviving sentences from 0. The exact same algebra
    is expressible over DuckDB lists, which is what the oracle does.
    """

    def eval(self, text: str):  # noqa: D102 - contract described above
        if text is None:
            return
        idx = 0
        for piece in _SENT_SPLIT.split(text):
            s = _EDGE_WS.sub("", piece)
            if s:
                yield idx, s, len(s)
                idx += 1


def register_udtfs(spark) -> None:
    """Idempotently register the module's table functions for SQL use."""
    spark.udtf.register("split_sentences", SplitSentences)
