"""applyInPandasWithState: state must accumulate across micro-batches and the
final per-user totals must equal the batch ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from redpanda_iceberg_duckdb_spark.streaming.stateful import running_user_totals
from redpanda_iceberg_duckdb_spark.tables import load_table


def test_stateful_running_totals(spark, sf_smoke, tmp_path):
    # Split events into 3 files so availableNow produces multiple
    # micro-batches (maxFilesPerTrigger=1) and state must carry across them.
    e = load_table(spark, sf_smoke, "events").select("user_id", "value", "event_id")
    src = tmp_path / "src"
    for i in range(3):
        (e.filter(F.col("event_id") % 3 == i).drop("event_id")
         .write.parquet(str(src / f"chunk={i}")))

    schema = T.StructType([T.StructField("user_id", T.LongType()),
                           T.StructField("value", T.DoubleType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("state_out")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    # "update" emits one row per key per batch it appears in: latest wins.
    out = spark.sql("""
        SELECT user_id, n_events, total_value_cents, max_value_cents
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) rn
              FROM state_out) WHERE rn = 1""")
    got = {r.user_id: (r.n_events, r.total_value_cents, r.max_value_cents)
           for r in out.collect()}

    truth = (e.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.round(F.col("value") * 100).cast("long")).alias("tot"),
                  F.max(F.round(F.col("value") * 100).cast("long")).alias("mx")))
    want = {r.user_id: (r.n, r.tot, r.mx) for r in truth.collect()}
    assert got == want


def test_half_up_cents_midpoints_and_negative_max():
    """Rounding is half-away-from-zero (the repo policy, = Spark ROUND), not
    pandas' half-to-even; max state seeds from data, so an all-negative
    stream reports its true negative max."""
    import pandas as pd
    from redpanda_iceberg_duckdb_spark.streaming.stateful import (
        _accumulate, _half_up_cents)

    # 0.125 -> 12.5 cents: half-even gives 12, half-up must give 13.
    got = list(_half_up_cents(pd.Series([0.125, -0.125, 1.0, -2.345])))
    assert got == [13, -13, 100, -235]  # -234.5 rounds away from zero

    class FakeState:
        exists = False
        def update(self, v): self.value = v

    st = FakeState()
    out = list(_accumulate((7,), iter([pd.DataFrame({"value": [-3.0, -1.5]})]),
                           st))
    assert st.value == (2, -450, -150)  # max is -150, NOT 0
    assert out[0]["max_value_cents"].iloc[0] == -150
