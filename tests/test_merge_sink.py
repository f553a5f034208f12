"""Streaming MERGE sink: change batches fold into a keyed snapshot; the
final snapshot equals the batch ground truth (last change per key wins
across batches)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from redpanda_iceberg_duckdb_spark.streaming.merge_sink import (
    read_snapshot, start_merge_sink,
)


def test_streaming_merge_folds_changes(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    # three files -> three micro-batches (maxFilesPerTrigger=1), ordered
    # lexicographically so batch order is deterministic
    batches = [
        [(1, "a", 1), (2, "b", 1)],
        [(2, "b2", 2), (3, "c", 2)],
        [(1, "a3", 3), (4, "d", 3)],
    ]
    schema = "id long, payload string, change_seq long"
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.parquet(str(src / f"batch_{i}")))

    stream = (spark.readStream
              .schema(T.StructType([
                  T.StructField("id", T.LongType()),
                  T.StructField("payload", T.StringType()),
                  T.StructField("change_seq", T.LongType())]))
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    base = str(tmp_path / "snap")
    q = start_merge_sink(stream, base=base, key_cols=["id"],
                         checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    snap = read_snapshot(spark, base)
    got = {r.id: (r.payload, r.change_seq) for r in snap.collect()}
    # last write per key wins; file order may batch arbitrarily, so assert
    # against max change_seq per key
    import itertools
    truth = {}
    for rid, payload, seq in itertools.chain(*batches):
        if rid not in truth or seq > truth[rid][1]:
            truth[rid] = (payload, seq)
    assert got == truth
