"""Streaming continuous near-dup admission: first-arriver-wins across
micro-batches, streaming result equals the batch-by-batch fold of the
incremental operator, and epoch replay cannot double-admit."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import Row
from pyspark.sql import types as T

from breweries_etl_spark.streaming.dedup_stream import (
    neardup_admission_batch,
    read_accepted,
    read_match_log,
    streaming_neardup_admission,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

# three arrival waves: b1 seeds, b2 near-dups b1 (rejected) + fresh,
# b3 near-dups something admitted in b2
BATCHES = [
    [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=2, text="completely different content about spark engines"),
    ],
    [
        Row(doc_id=3, text="The quick brown fox jumps over the lazy dog today!"),
        Row(doc_id=4, text="fresh news about distributed query processing at scale"),
    ],
    [
        Row(doc_id=5, text="fresh news about distributed query processing at scale!!"),
        Row(doc_id=6, text="entirely novel corpus entry with unique wording here"),
    ],
]


def _write_batch_file(spark, src_dir, tmp_root, idx, rows):
    tmp = os.path.join(tmp_root, f"b{idx}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.copy(
        glob.glob(f"{tmp}/part-*.parquet")[0],
        os.path.join(src_dir, f"batch_{idx}.parquet"),
    )
    # distinct mtimes fix the file->micro-batch order under
    # maxFilesPerTrigger=1 (oldest first)
    time.sleep(1.1)


def test_streaming_admission_equals_batch_fold(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(BATCHES):
        _write_batch_file(spark, src, str(tmp_path), i, rows)

    stream_dir = str(tmp_path / "stream_work")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_neardup_admission(stream, stream_dir)
    q.awaitTermination(120)

    fold_dir = str(tmp_path / "fold_work")
    for i, rows in enumerate(BATCHES):
        neardup_admission_batch(
            spark, spark.createDataFrame(rows, SCHEMA), i, fold_dir
        )

    got = sorted(r["doc_id"] for r in read_accepted(spark, stream_dir).collect())
    want = sorted(r["doc_id"] for r in read_accepted(spark, fold_dir).collect())
    assert got == want
    # 3 near-dups 1 (earlier batch) -> rejected; 5 near-dups 4 -> rejected
    assert got == [1, 2, 4, 6]

    pairs = {
        (r["incoming_id"], r["base_id"])
        for r in read_match_log(spark, stream_dir).collect()
    }
    assert (3, 1) in pairs and (5, 4) in pairs


def test_epoch_replay_is_idempotent(spark, tmp_path):
    work = str(tmp_path / "replay_work")
    neardup_admission_batch(spark, spark.createDataFrame(BATCHES[0], SCHEMA), 0, work)
    neardup_admission_batch(spark, spark.createDataFrame(BATCHES[1], SCHEMA), 1, work)
    before = sorted(r["doc_id"] for r in read_accepted(spark, work).collect())
    # replay epoch 1 (same data, same epoch id) — overwrite, not append
    neardup_admission_batch(spark, spark.createDataFrame(BATCHES[1], SCHEMA), 1, work)
    after = sorted(r["doc_id"] for r in read_accepted(spark, work).collect())
    assert before == after == [1, 2, 4]
