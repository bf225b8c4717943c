"""Partitioning utilities.

``ensure_parallelism`` — CPU-bound per-row operators (shingling, MinHash,
SimHash, vector math) inherit their parallelism from the input's file
splits. A small-but-expensive table that arrives as one parquet file runs
on ONE core unless repartitioned. At 100 TB inputs have thousands of
splits and this is a no-op; on skinny inputs it spreads the compute. The
check costs one plan analysis, no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    # Read the partition count from the JVM-side RDD (ADVICE r12): the
    # Python-side ``df.rdd`` property additionally plans the
    # Row-deserialization conversion of the whole query on every call —
    # pure driver overhead in the common no-op case. ``_jdf.rdd()``
    # answers the same physical-plan partition count without it.
    if df._jdf.rdd().getNumPartitions() >= target:
        return df
    return df.repartition(target)
