"""Declared-schema file connectors: CSV / JSON-lines / ORC / parquet with
the SAME schema contract as the parquet fixtures — no inference anywhere
(reference parity: the reference declares every schema explicitly,
/root/reference/redpanda/producer.py:30-45 and duckdb/init.sql; SURVEY.md
section 2.1 S8).

Why no inference matters at 100 TB: `inferSchema` on CSV/JSON re-reads the
whole dataset before the real scan, and a drifting inferred type flips plans
downstream. Here every reader takes an explicit StructType from the fixture
parquet metadata (or caller-supplied), so a CSV-backed `documents` table
plans identically to the parquet one.

Round-trip contract (tests/test_file_formats.py): write any fixture table to
csv/json/orc and read it back — byte-equal rows, identical schema. Known
format gaps are encoded here, not discovered in production: CSV has no
native array/timestamp-nanos types (arrays are JSON-encoded strings on
write, decoded on read); JSON-lines carries timestamps as ISO-8601 strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

FORMATS = ("parquet", "orc", "json", "csv")

# ISO-8601 with microseconds — the reference's wire format (SURVEY.md F4).
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def fixture_schema(spark: SparkSession, sf_dir: str, name: str) -> T.StructType:
    """The declared schema of a fixture table = its parquet footer schema
    (reading the footer touches no row data)."""
    from ..tables import load_table
    return load_table(spark, sf_dir, name).schema


def _array_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields
            if isinstance(f.dataType, T.ArrayType)]


def _ts_cols(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields
            if isinstance(f.dataType, T.TimestampType)]


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` to ``path`` in ``fmt``. CSV: array columns are
    JSON-encoded (CSV has no nested types) and timestamps ISO-formatted;
    ORC/JSON/parquet round-trip natively."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt == "csv":
        for c in _array_cols(df.schema):
            df = df.withColumn(c, F.to_json(F.col(c)))
        (df.write.mode("overwrite")
           .options(header=True, nullValue="\\N",
                    timestampFormat=_TS_FMT)
           .csv(path))
    elif fmt == "json":
        # default JSON timestampFormat truncates to milliseconds; the
        # reference's contract is ISO-8601 with microseconds (SURVEY.md F4)
        df.write.mode("overwrite").option("timestampFormat", _TS_FMT) \
            .json(path)
    else:
        df.write.mode("overwrite").format(fmt).save(path)


def read_table(spark: SparkSession, path: str, schema: T.StructType,
               fmt: str = "parquet") -> DataFrame:
    """Read ``path`` as ``fmt`` with the DECLARED ``schema`` — never
    inferred. Reverses write_table's CSV encodings."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt == "csv":
        arrays = {f.name: f.dataType for f in schema.fields
                  if isinstance(f.dataType, T.ArrayType)}
        flat = T.StructType([
            T.StructField(f.name, T.StringType() if f.name in arrays
                          else f.dataType, f.nullable)
            for f in schema.fields])
        df = (spark.read.schema(flat)
              .options(header=True, nullValue="\\N",
                       timestampFormat=_TS_FMT)
              .csv(path))
        for c, dtype in arrays.items():
            df = df.withColumn(c, F.from_json(F.col(c), dtype))
        return df
    if fmt == "json":
        return (spark.read.schema(schema)
                .option("timestampFormat", _TS_FMT).json(path))
    return spark.read.schema(schema).format(fmt).load(path)
