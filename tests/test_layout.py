"""File-layout management: range-sorted writes (file-level data
skipping) and small-file compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from breweries_etl_spark.sinks.writers import compact_directory, write_sorted_by_range


def _file_ranges(spark, path, col):
    """Per-file (min, max) of ``col`` — what footer-stats pruning sees."""
    ranges = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        r = spark.read.parquet(f).agg(F.min(col), F.max(col)).first()
        ranges.append((r[0], r[1]))
    return ranges


def test_write_sorted_by_range_disjoint_files(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_sorted")
    write_sorted_by_range(orders, out, "o_orderdate", n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    ranges = [r for r in _file_ranges(spark, out, "o_orderdate") if r[0] is not None]
    assert len(ranges) >= 2
    # each file owns a disjoint key range -> footer stats prune scans
    for (lo1, hi1), (lo2, hi2) in zip(sorted(ranges), sorted(ranges)[1:]):
        assert hi1 <= lo2


def test_compact_directory_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "sliver_dir")
    orders.repartition(37).write.parquet(out)
    before = spark.read.parquet(out)
    n, s = before.count(), before.agg(F.sum("o_orderkey")).first()[0]
    stats = compact_directory(spark, out, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 37
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.parquet(out)
    assert after.count() == n
    assert after.agg(F.sum("o_orderkey")).first()[0] == s


def test_compact_directory_with_sort_restores_range_layout(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "sliver_sorted")
    orders.repartition(20).write.parquet(out)
    compact_directory(
        spark, out, target_file_bytes=64 * 1024, sort_col="o_orderkey"
    )
    ranges = [r for r in _file_ranges(spark, out, "o_orderkey") if r[0] is not None]
    if len(ranges) >= 2:
        for (lo1, hi1), (lo2, hi2) in zip(sorted(ranges), sorted(ranges)[1:]):
            assert hi1 <= lo2


def test_write_zordered_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout: per-file min/max spans must be narrow in BOTH
    dimensions (footer-stats pruning works for either predicate),
    unlike a single-column sort which only clusters its own column."""
    from breweries_etl_spark.sinks.writers import write_zordered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = str(tmp_path / "orders_z")
    write_zordered(orders, out, ["o_custkey", "o_totalprice"], n_files=16)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert back.columns == ["o_orderkey", "o_custkey", "o_totalprice"]

    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    spans = {"o_custkey": stats[1] - stats[0], "o_totalprice": stats[3] - stats[2]}
    for col, full_span in spans.items():
        ranges = [r for r in _file_ranges(spark, out, col) if r[0] is not None]
        assert len(ranges) >= 8
        avg_span = sum(hi - lo for lo, hi in ranges) / len(ranges)
        # each file should cover a small slice of every z-ordered dim;
        # 16 files ~ 4x4 grid -> expect well under half the full span
        assert avg_span < 0.5 * full_span, (col, avg_span, full_span)


def test_backfill_overwrites_only_touched_partitions(spark, tmp_path):
    """Dynamic partition overwrite: rewriting one partition's data must
    not drop or change sibling partitions (the backfill contract)."""
    from pyspark.sql import Row

    from breweries_etl_spark.sinks.writers import backfill_partitions

    out = str(tmp_path / "bf")
    full = spark.createDataFrame(
        [Row(k=i, loc=loc, v=1.0) for loc in ("US", "DE", "FR") for i in range(5)]
    )
    backfill_partitions(full, out, ["loc"])
    assert spark.read.parquet(out).count() == 15

    # backfill DE only, with different values and fewer rows
    patch = spark.createDataFrame([Row(k=i, loc="DE", v=9.0) for i in range(2)])
    backfill_partitions(patch, out, ["loc"])
    back = spark.read.parquet(out)
    assert back.filter(F.col("loc") == "DE").count() == 2
    assert back.filter((F.col("loc") == "DE") & (F.col("v") == 9.0)).count() == 2
    # siblings untouched
    assert back.filter(F.col("loc") == "US").count() == 5
    assert back.filter(F.col("loc") == "FR").count() == 5
    assert back.filter(F.col("v") == 1.0).count() == 10
