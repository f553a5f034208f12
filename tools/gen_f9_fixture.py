"""Write the committed F9 determinism fixture: the first 20,000 trades of
generator.generate_trades(20000, 42) as parquet. Committed ONCE; the
seeded_trades_parity query (operators/genparity.py) re-generates the same
corpus live and must hash-match this snapshot through the DuckDB oracle —
that green row is the driver-visible proof of F9 (seeded Mersenne-Twister
draw order) and F8 (deterministic UUIDv4-from-int). Re-running this script
must be a byte-level no-op; if it is not, the generator's determinism
contract broke.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redpanda_iceberg_duckdb_spark.generator import generate_trades  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "trades_20000_42.parquet")

SCHEMA = pa.schema([
    ("trade_id", pa.string()),
    ("symbol", pa.string()),
    ("price", pa.float64()),
    ("qty", pa.int32()),
    ("side", pa.string()),
    ("ts_event", pa.timestamp("us")),
    ("notes", pa.string()),
])


def main() -> None:
    rows = generate_trades(20_000, 42)
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    table = pa.table(cols, schema=SCHEMA)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
