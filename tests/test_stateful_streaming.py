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


def test_watermark_bounds_dedup_state(spark, sf_smoke):
    """stateOperators accounting of the chunked dedup replay
    (operators/state_metrics.py): every unique key updates state exactly
    once, eviction actually removes rows, and the held-rows peak stays
    strictly below the total key count — watermark-bounded state, measured
    from the engine's own metrics rather than asserted in prose."""
    from redpanda_iceberg_duckdb_spark.operators.state_metrics import (
        chunked_replay_metrics)
    from redpanda_iceberg_duckdb_spark.tables import load_table

    rows = chunked_replay_metrics(spark, sf_smoke)
    assert len(rows) == 4                      # one batch per chunk
    n_keys = load_table(spark, sf_smoke, "events").count()  # unique ids
    assert sum(r["input_rows"] for r in rows) == n_keys
    # every key inserts exactly one state row in its batch
    for r in rows:
        assert r["state_rows_updated"] == r["input_rows"]
    # eviction happened: quartile chunks span ~7.5 days each vs a 1-hour
    # watermark, so earlier chunks' state must be removed as later ones
    # arrive...
    assert sum(r["state_rows_removed"] for r in rows) > 0
    # ...and held state never accumulates the whole history: the peak is
    # bounded by two consecutive chunks (eviction lags one batch), far
    # below the total key count.
    peak = max(r["state_rows_total"] for r in rows)
    assert peak < n_keys
    two_chunk_bound = 2 * max(r["input_rows"] for r in rows)
    assert peak <= two_chunk_bound


def test_engine_state_metrics_equal_expected_query(spark, sf_smoke):
    """Round-13 split of the old rows-only stream_state_bound_replay: the
    engine's stateOperators metrics must equal, ROW FOR ROW, the oracled
    stream_state_expected query (which derives the accounting from event
    timestamps + the probed lag-one-watermark eviction semantics). This is
    the engine-metric half of the equality; the data half is hash-checked
    against DuckDB by the driver."""
    from redpanda_iceberg_duckdb_spark.operators.state_metrics import (
        chunked_replay_metrics)
    from redpanda_iceberg_duckdb_spark.registry import all_queries

    engine = chunked_replay_metrics(spark, sf_smoke)
    expected = (all_queries()["stream_state_expected"]
                .fn(spark, sf_smoke).collect())
    assert len(engine) == len(expected) == 4
    for i, (e, x) in enumerate(zip(engine, expected)):
        assert x["batch_id"] == i
        assert e["input_rows"] == x["input_rows"], (i, e, x.asDict())
        assert e["state_rows_updated"] == x["state_rows_updated"], (i, e)
        assert e["state_rows_total"] == x["state_rows_total"], (i, e)
        assert e["state_rows_removed"] == x["state_rows_removed"], (i, e)


def test_running_totals_state_is_keycount(spark, sf_smoke, tmp_path):
    """The applyInPandasWithState operator keeps exactly one state row per
    user — state size equals cumulative distinct keys, the expected
    profile for a no-TTL keyed aggregate."""
    from pyspark.sql import types as T

    e = load_table(spark, sf_smoke, "events").select(
        "user_id", "value", "event_id")
    n_users = e.select("user_id").distinct().count()
    src = tmp_path / "src2"
    for i in range(2):
        (e.filter(F.col("event_id") % 2 == i).drop("event_id")
         .coalesce(1).write.parquet(str(src / f"chunk={i}")))
    schema = T.StructType([T.StructField("user_id", T.LongType()),
                           T.StructField("value", T.DoubleType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("state_acct")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    progress = [p for p in q.recentProgress if p.get("numInputRows")]
    q.stop()
    assert progress, "no data batches recorded"
    last = (progress[-1].get("stateOperators") or [{}])[0]
    assert int(last.get("numRowsTotal", -1)) == n_users


def test_funnel_foreachbatch_stream_equals_batch(spark, sf_smoke, tmp_path):
    """Drive merge_funnel through a REAL availableNow file stream with
    foreachBatch (events written as 4 event-time-ordered files so the
    micro-batch order matches the sink's ordering contract) and assert
    the final maintained funnel equals the batch funnel query."""
    from pyspark.sql import functions as F

    from redpanda_iceberg_duckdb_spark.registry import all_queries
    from redpanda_iceberg_duckdb_spark.streaming.funnel_sink import (
        empty_funnel_state, funnel_counts, merge_funnel)
    from redpanda_iceberg_duckdb_spark.tables import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts")
    cuts = ["2024-01-08", "2024-01-16", "2024-01-24"]
    bounds = list(zip([None] + cuts, cuts + [None]))
    src = tmp_path / "stream_src"
    for i, (lo, hi) in enumerate(bounds):
        cond = F.lit(True)
        if lo:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
        if hi:
            cond = cond & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
        ev.filter(cond).coalesce(1).write.parquet(str(src / f"b={i}"))

    holder = {"state": empty_funnel_state(spark), "batches": 0}

    def sink(batch_df, _bid):
        holder["state"] = merge_funnel(holder["state"],
                                       batch_df.drop("b"))
        holder["batches"] += 1

    stream = (spark.readStream.schema(ev.withColumn("b", F.lit(0)).schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src))
              .writeStream.foreachBatch(sink)
              .trigger(availableNow=True).start())
    stream.awaitTermination(120)
    assert holder["batches"] >= 1
    got = funnel_counts(holder["state"]).collect()[0]
    want = all_queries()["funnel_view_click_purchase"].fn(
        spark, sf_smoke).collect()[0]
    assert got["n_view"] == want["n_view"]
    assert got["n_click_after_view"] == want["n_click_after_view"]
    assert got["n_purchase_after_click"] == want["n_purchase_after_click"]


def test_funnel_sink_state_cardinality_equals_expected(spark, sf_smoke):
    """Funnel-sink state accounting (round-12 verdict item 6): after each
    replay batch, the REAL merge_funnel state holds exactly one row per
    view-user — its count must equal the oracled funnel_state_expected
    query's state_rows, and stay bounded by users_seen."""
    from pyspark.sql import functions as F

    from redpanda_iceberg_duckdb_spark.operators.funnel_stream import _bounds
    from redpanda_iceberg_duckdb_spark.registry import all_queries
    from redpanda_iceberg_duckdb_spark.streaming.funnel_sink import (
        empty_funnel_state, merge_funnel)
    from redpanda_iceberg_duckdb_spark.tables import load_table

    expected = {r["batch_id"]: r for r in
                all_queries()["funnel_state_expected"]
                .fn(spark, sf_smoke).collect()}
    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts")
    state = empty_funnel_state(spark)
    for i, (lo, hi) in enumerate(_bounds(), 1):
        cond = F.lit(True)
        if lo:
            cond = cond & (F.col("ts") >= F.lit(lo).cast("timestamp_ntz"))
        if hi:
            cond = cond & (F.col("ts") < F.lit(hi).cast("timestamp_ntz"))
        state = merge_funnel(state, ev.filter(cond))
        n = state.count()
        assert n == expected[i]["state_rows"], (i, n, expected[i].asDict())
        assert n <= expected[i]["users_seen"]
        # state rows are exactly the view-users: t1 is never null
        assert state.filter(F.col("t1").isNull()).count() == 0
