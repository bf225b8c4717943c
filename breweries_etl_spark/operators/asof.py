"""As-of (backward) join — an operator Spark lacks natively.

Composition strategy (preferred over per-group pandas): tag both sides,
union them, and take the last non-null right-side payload STRUCT over a
window ordered by (time, tag). One shuffle on the `by` key, one sort
within partitions — exactly the cost of a sort-merge join, with no Python
in the loop and no per-group memory blowup. ``pd.merge_asof`` via
applyInPandas would materialize each group in a Python worker; the
union-window form streams.

The payload travels as one struct so the fill is row-atomic — a NULL
inside a right column can never borrow a value from an older right row.

Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), making
the match inclusive: right.ts <= left.ts — the same semantics as DuckDB's
``ASOF JOIN ... ON r.ts <= l.ts`` and pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, the most recent right row of the same ``by`` key
    with right.on <= left.on (NULLs when no such row — LEFT semantics).

    ``left_cols``/``right_cols`` are the payload columns carried from each
    side; right payloads come back prefixed (including ``{prefix}{on}``,
    the matched right timestamp).
    """
    payload_fields = [*right_cols, on]
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in payload_fields]
    )

    l_tagged = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(payload_type).alias("__rpay"),
    )
    # SQL join semantics for NULLs: a right row with a NULL key or NULL
    # timestamp can never match (NULL = NULL and ts <= NULL are both
    # no-match in SQL), but Spark's window PARTITION BY groups NULL
    # keys together — unfiltered, the NULL-key "group" cross-matched
    # and diverged from any ASOF JOIN replay (degen r10). Left rows
    # with NULL key/ts are kept with a NULL payload: Spark sorts their
    # NULL ts before every right row, so the prefix window finds
    # nothing, which is exactly the LEFT-join outcome.
    r_tagged = right.filter(
        F.col(by).isNotNull() & F.col(on).isNotNull()
    ).select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c).alias(c) for c in payload_fields]).alias("__rpay"),
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last(F.col("__rpay"), ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    return filled.select(
        F.col(by),
        F.col(on),
        *[F.col(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in payload_fields],
    )
