"""F9/F8 made driver-visible (round-8 verdict item 5): the seeded trade
generator's draws, checked against a COMMITTED snapshot through the
cross-engine gate.

The generator (generator.py) replays the reference producer's seeded
Mersenne-Twister draw order and UUIDv4-from-int scheme
(/root/reference/redpanda/producer.py:23-49) — determinism that until now
only pytest asserted. This query regenerates trades_df(spark, 20000, 42)
LIVE and aggregates it per symbol; the DuckDB oracle computes the same
aggregates over tests/fixtures/trades_20000_42.parquet, a snapshot of the
same call committed by tools/gen_f9_fixture.py. A green hash-match row is
then machine evidence that the current generator reproduces the committed
draw sequence exactly: counts, quantity sums, price cents, side splits,
the microsecond time ladder, AND an order-independent checksum over the
UUID strings (F8's bit layout rides in trade_id).

Cross-engine float discipline: price is the only double; it is compared as
cast(floor(price*100) AS bigint) — both engines floor the identical IEEE
double, so no float ever reaches the hash. Timestamps are compared as
unix microseconds (session tz pinned UTC = DuckDB's naive-as-UTC).

Scale stance: generation is driver-side by design (F9 requires Python's
RNG sequence; the sharded scale path is generator.sharded_trades) and
20k rows is the reference corpus size; the aggregate itself is one
map-side-combinable pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..generator import trades_df
from ..registry import register

_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "trades_20000_42.parquet")


def _oracle() -> str:
    h = md5_mod_duck("trade_id")
    return f"""
SELECT symbol,
       cast(count(*) AS bigint) AS n_trades,
       cast(sum(qty) AS bigint) AS sum_qty,
       cast(sum(cast(floor(price * 100) AS bigint)) AS bigint)
         AS sum_price_cents,
       cast(sum(CASE WHEN side = 'BUY' THEN 1 ELSE 0 END) AS bigint)
         AS n_buy,
       cast(min(epoch_us(ts_event)) AS bigint) AS min_ts_us,
       cast(max(epoch_us(ts_event)) AS bigint) AS max_ts_us,
       bit_xor({h}) AS id_checksum
FROM read_parquet('{_FIXTURE}')
GROUP BY symbol ORDER BY symbol"""


@register(
    "seeded_trades_parity",
    oracle=_oracle(),
    tags=("generator", "determinism", "f9"),
)
def seeded_trades_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol summary of a LIVE generate_trades(20000, 42) run; the
    oracle reads the committed snapshot of the same call — hash-match
    proves the seeded draw order (module docstring). sf_dir is unused:
    the corpus under test is the generator itself."""
    t = trades_df(spark, 20_000, 42)
    return (t.groupBy("symbol")
            .agg(F.count(F.lit(1)).alias("n_trades"),
                 F.sum("qty").cast("bigint").alias("sum_qty"),
                 F.sum(F.floor(F.col("price") * 100).cast("bigint"))
                 .cast("bigint").alias("sum_price_cents"),
                 F.sum(F.when(F.col("side") == "BUY", 1).otherwise(0))
                 .cast("bigint").alias("n_buy"),
                 F.min(F.unix_micros("ts_event")).alias("min_ts_us"),
                 F.max(F.unix_micros("ts_event")).alias("max_ts_us"),
                 F.expr(f"bit_xor({md5_mod_spark('trade_id')})")
                 .alias("id_checksum"))
            .orderBy("symbol"))
