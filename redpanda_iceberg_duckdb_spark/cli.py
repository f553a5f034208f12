"""SQL entry point — the Spark analogue of the reference's DuckDB CLI usage
(/root/reference/validation/e2e.sh:131: `duckdb -init ... -c ".read query.sql"`):
all fixture tables registered as views, then arbitrary SQL through Catalyst.

    python -m redpanda_iceberg_duckdb_spark.cli \
        --sf-dir /root/testdata/sf0.01 \
        "SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1"
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from .session import get_spark
from .tables import load_tables


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register every fixture table as a view and execute ``sql``."""
    load_tables(spark, sf_dir)
    return spark.sql(sql)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    ap.add_argument("sql")
    args = ap.parse_args(argv)
    spark = get_spark("sql-cli")
    df = run_sql(spark, args.sf_dir, args.sql)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
