"""Round-trip contract for sources/files.py: every fixture table survives
write->read in every supported format with identical rows and schema, and
reads never infer (the declared schema IS the read schema)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.sources import files
from redpanda_iceberg_duckdb_spark.tables import load_table

# Table x format matrix: embeddings exercises the array<float> CSV encode
# path; events exercises timestamps; documents exercises free text with
# whitespace (the CSV quoting risk).
CASES = [
    ("nation", "csv"), ("nation", "json"), ("nation", "orc"),
    ("documents", "csv"), ("documents", "json"), ("documents", "orc"),
    ("events", "json"), ("events", "orc"),
    ("embeddings", "csv"), ("embeddings", "orc"),
]


def _canon(df):
    # float32 -> repr-stable strings for comparison
    return sorted(tuple(str(x) for x in r) for r in df.collect())


@pytest.mark.parametrize("table,fmt", CASES)
def test_round_trip(spark, sf_smoke, tmp_path, table, fmt):
    src = load_table(spark, sf_smoke, table)
    path = str(tmp_path / f"{table}_{fmt}")
    files.write_table(src, path, fmt)
    back = files.read_table(spark, path, src.schema, fmt)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_events_csv_timestamp_microseconds(spark, sf_smoke, tmp_path):
    """CSV timestamp format preserves microseconds (the reference emits
    ISO-8601 with us precision — SURVEY.md F4)."""
    src = load_table(spark, sf_smoke, "events").limit(200)
    path = str(tmp_path / "events_csv")
    files.write_table(src, path, "csv")
    back = files.read_table(spark, path, src.schema, "csv")
    a = sorted(r.ts for r in src.select("ts").collect())
    b = sorted(r.ts for r in back.select("ts").collect())
    assert a == b


def test_rejects_unknown_format(spark, sf_smoke, tmp_path):
    src = load_table(spark, sf_smoke, "nation")
    with pytest.raises(ValueError):
        files.write_table(src, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError):
        files.read_table(spark, str(tmp_path / "x"), src.schema, "avro")
