"""Distributed model TRAINING expressed as DataFrame plans: full-batch
logistic regression over hashed bag-of-words features — the shape of a
fastText-style quality/language filter being FIT on the corpus itself
(the inference-only sibling is ``filtering.quality_classifier``).

Why this is Spark-first: each iteration is ONE distributed aggregate —
per-row error in micro-units, exploded per feature bucket, summed by
bucket (map-side combinable, 33 output rows) — and the tiny model rides
into the next iteration's plan as ARRAY LITERALS, exactly like the
KMeans centroids in clustering.py. The driver never touches row data;
it collects a 33-number gradient per iteration (inherent to iterative
optimization, same as any parameter-server step).

Why it is oracle-replayable (the hard part): float SUMS across rows are
partition-order dependent, so the gradient is accumulated in integer
MICRO-UNITS — per-row error canonicalized by ``floor(err × 1e6)`` into
a long BEFORE summation; long sums are exact, hence order-independent,
hence bit-identical on any engine/partitioning (the same trick
text.bigram_lm_scores uses for log-prob sums). Everything downstream of
the gradient (weight update, next margins) is then arithmetic on exact
inputs in a fixed evaluation order. Per-row margins fold the weight
array in SORTED bucket order on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def hashed_bucket_expr(tok: Column, dims: int) -> Column:
    """Portable feature hash: md5-derived bucket in [0, dims) — identical
    arithmetic in any engine (same idiom as sampling.hash_bucket_expr)."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long") % dims


def train_logreg_hashed(
    df: DataFrame,
    label_expr: Column,
    text_col: str = "text",
    dims: int = 32,
    lr: float = 0.5,
    iterations: int = 5,
) -> DataFrame:
    """Fit logistic regression by full-batch gradient descent and return
    the model as (dim, weight) rows — dim -1 is the bias, dims 0..D-1
    the hashed-token weights, rounded to 6 dp.

    Features are binary presence indicators over md5-hashed tokens
    (sorted distinct buckets per doc). Per iteration: margin and
    sigmoid per row (scan-local), error floored to integer micro-units,
    one explode + groupBy aggregate for the 33-bucket gradient, one
    driver collect of those 33 longs, literal weight update. Determinism
    note in the module docstring; scale note: the only shuffle per
    iteration carries (bucket, micro-error) pairs — never text.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9_]+"), 0)
    feats = df.select(
        label_expr.cast("long").alias("y"),
        F.array_sort(
            F.array_distinct(F.transform(toks, lambda t: hashed_bucket_expr(t, dims)))
        ).alias("bs"),
    ).persist()
    n = feats.count()
    spark = df.sparkSession
    if n == 0:
        feats.unpersist()
        return spark.createDataFrame(
            [(j, 0.0) for j in range(-1, dims)], "dim long, weight double"
        )
    bias = 0.0
    w = [0.0] * dims
    for _ in range(iterations):
        welems = F.array(*[F.lit(float(x)) for x in w])
        margin = F.lit(float(bias)) + F.aggregate(
            F.col("bs"),
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(welems, (b + 1).cast("int")),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        err_micro = F.floor((p - F.col("y").cast("double")) * MICRO).cast("long")
        grad = (
            feats.select(
                err_micro.alias("e"),
                F.explode(
                    F.concat(F.array(F.lit(-1).cast("long")), F.col("bs"))
                ).alias("b"),
            )
            .groupBy("b")
            .agg(F.sum("e").alias("g"))
            .collect()
        )
        gmap = {int(r["b"]): int(r["g"]) for r in grad}
        bias = bias - lr * (gmap.get(-1, 0) / MICRO) / n
        w = [w[j] - lr * (gmap.get(j, 0) / MICRO) / n for j in range(dims)]
    feats.unpersist()
    # Round via Spark's SQL round (not Python's) so the decimal rounding
    # rule is the same one the DuckDB oracle applies.
    rows = [(-1, bias)] + [(j, w[j]) for j in range(dims)]
    return spark.createDataFrame(rows, "dim long, weight double").select(
        "dim", F.round("weight", 6).alias("weight")
    )
