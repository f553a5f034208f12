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
