"""Fixture-table loaders: parquet files -> DataFrames + temp views.

Scale stance: plain ``spark.read.parquet`` keeps predicate pushdown, column
pruning, and partition-count selection (``spark.sql.files.maxPartitionBytes``)
in Catalyst's hands; at 100 TB these paths would be Iceberg tables reached
through the REST catalog (sources/iceberg.py) — the query code is identical
because everything downstream works on named temp views.

Oracle parity: the driver registers the same parquet as DuckDB views with the
bare table names, so we mirror that naming exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import configure_session

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _post_load(name: str, df: DataFrame) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS): with nanosAsLong it arrives as a
    # long. DuckDB truncates ns -> us when reading the same file, so integer
    # division (not double division — 1.7e18 ns exceeds 2^53) matches exactly.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Belt-and-braces: if the session rejected inferTimestampNTZ=false
    # (configure_session swallows locked-config errors), normalize any NTZ
    # column to TIMESTAMP here. Session tz is UTC, so the instants are
    # identical to what the DuckDB oracle computes on the same file.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_session(spark)
    df = _post_load(name, spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    df.createOrReplaceTempView(name)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load the named tables (all if none given) and register temp views."""
    use = list(names) if names else TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in use}


def load_table_spread(spark: SparkSession, sf_dir: str, name: str,
                      key: str) -> DataFrame:
    """load_table + explicit hash repartition, for CPU-heavy per-row work
    (shingling, positional n-gram explode) downstream.

    The driver testdata ships each table as ONE parquet row group — one scan
    split, so an un-spread explode serializes on a single core (measured:
    2.2x on shared_ngram_span_pairs at sf0.1/local[32]). repartition with an
    EXPLICIT partition count is REPARTITION_BY_NUM, which AQE will not
    coalesce back down (a keyed repartition without a count would collapse
    to 1 partition again under coalescePartitions for KB-scale inputs).

    100 TB stance: real inputs arrive already split, but spreading by the
    row key before per-row-expensive transforms is still the correct move —
    it rebalances document-size skew; the shuffle moves the raw rows once,
    far cheaper than serializing the explode."""
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism, key)
