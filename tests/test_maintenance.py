from __future__ import annotations

from redpanda_iceberg_duckdb_spark.maintenance import (
    compact_small_files, dataset_file_stats,
)
from redpanda_iceberg_duckdb_spark.tables import load_table


def test_compaction_reduces_files(spark, sf_smoke, tmp_path):
    e = load_table(spark, sf_smoke, "events")
    frag = str(tmp_path / "fragmented")
    e.repartition(40).write.parquet(frag)   # simulate micro-batch small files
    n_in, _ = dataset_file_stats(frag)
    assert n_in >= 40
    out = str(tmp_path / "compacted")
    n_out = compact_small_files(spark, frag, out)
    assert n_out < n_in
    assert spark.read.parquet(out).count() == e.count()


def test_expire_snapshots(spark, tmp_path):
    from redpanda_iceberg_duckdb_spark.maintenance import expire_snapshots
    from redpanda_iceberg_duckdb_spark.streaming.merge_sink import (
        read_snapshot, start_merge_sink,
    )
    from pyspark.sql import types as T

    src = tmp_path / "chg"
    src.mkdir()
    for i in range(4):
        (spark.createDataFrame([(i, f"p{i}")], "id long, payload string")
         .coalesce(1).write.parquet(str(src / f"b{i}")))
    stream = (spark.readStream
              .schema(T.StructType([T.StructField("id", T.LongType()),
                                    T.StructField("payload", T.StringType())]))
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true").parquet(str(src)))
    base = str(tmp_path / "snap")
    q = start_merge_sink(stream, base=base, key_cols=["id"],
                         checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(180)

    victims = expire_snapshots(base, keep=2)
    assert len(victims) >= 1
    snap = read_snapshot(spark, base)
    assert snap.count() == 4  # current snapshot untouched


def test_expire_snapshots_keep_zero_drops_all_but_current(tmp_path):
    """keep=0 must mean 'keep nothing except the pointer target' — the old
    versions[:-0] slice silently deleted nothing."""
    import os
    from redpanda_iceberg_duckdb_spark.maintenance import expire_snapshots

    base = str(tmp_path / "snaps")
    os.makedirs(base)
    for v in (1, 2, 3):
        os.makedirs(os.path.join(base, f"v{v}"))
        with open(os.path.join(base, f"v{v}", "data.parquet"), "w") as f:
            f.write("x")
    with open(os.path.join(base, "_CURRENT"), "w") as f:
        f.write("v3")
    victims = expire_snapshots(base, keep=0)
    assert sorted(os.path.basename(v) for v in victims) == ["v1", "v2"]
    assert os.path.exists(os.path.join(base, "v3"))
    import pytest
    with pytest.raises(ValueError):
        expire_snapshots(base, keep=-1)
