"""The LEFT OUTER watermarked stream-stream join must emit (a) exactly the
batch inner-join matches and (b) null-signup rows for unmatched purchases
once the watermark passes their look-back window — with the documented
exception that trailing unmatched purchases (window never crossed by the
final watermark) stay in state under availableNow."""

from __future__ import annotations


from pyspark.sql import functions as F

from redpanda_iceberg_duckdb_spark.streaming.joins import (
    purchases_with_optional_signup)
from redpanda_iceberg_duckdb_spark.tables import load_table


def test_stream_outer_join_matches_batch(spark, sf_smoke, tmp_path):
    e = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_id", "event_type", "ts")
    # two event-time-ordered chunks so the watermark advances mid-stream
    mid = e.agg(F.expr("percentile(unix_micros(ts), 0.5)")).head()[0]
    src = tmp_path / "src"
    (e.filter(F.unix_micros("ts") <= int(mid)).coalesce(1)
     .write.parquet(str(src / "chunk=0")))
    (e.filter(F.unix_micros("ts") > int(mid)).coalesce(1)
     .write.parquet(str(src / "chunk=1")))

    stream = (spark.readStream.schema(e.schema)
              .option("maxFilesPerTrigger", "1")
              .option("recursiveFileLookup", "true")
              .parquet(str(src)))
    q = (purchases_with_optional_signup(stream)
         .writeStream.format("memory").queryName("oj_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM oj_out").collect()
    q.stop()

    got_matched = {(r.purchase_id, r.signup_id) for r in got
                   if r.signup_id is not None}
    got_unmatched = {r.purchase_id for r in got if r.signup_id is None}

    # batch truth
    p = (e.filter(F.col("event_type") == "purchase")
         .select("user_id", F.col("event_id").alias("pid"),
                 F.col("ts").alias("p_ts")))
    s = (e.filter(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("s_user"),
                 F.col("event_id").alias("sid"),
                 F.col("ts").alias("s_ts")))
    cond = ((F.col("user_id") == F.col("s_user"))
            & (F.col("s_ts") <= F.col("p_ts"))
            & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")))
    matched = {(r.pid, r.sid) for r in p.join(s, cond).collect()}
    unmatched = {r.pid for r in
                 p.join(s, cond, "left_anti").select("pid").collect()}

    # (a) matched rows are exact
    assert got_matched == matched
    # (b) every emitted null-row is a true batch-unmatched purchase
    assert got_unmatched <= unmatched
    # (c) null-rows only emit while a LATER batch processes (the final
    # batch's watermark never flushes its own unmatched rows), so the
    # guaranteed-emitted set is chunk-0 unmatched purchases older than
    # the watermark in effect during batch 1: chunk-0 max ts - 2h delay,
    # minus the 1h look-back margin.
    bound_us = int(mid) - 3 * 3_600_000_000
    old_unmatched = {r.pid for r in
                     p.join(s, cond, "left_anti")
                     .filter(F.unix_micros("p_ts") < bound_us)
                     .select("pid").collect()}
    assert old_unmatched <= got_unmatched
    # and the emission is non-trivial on this corpus
    assert got_unmatched, "no unmatched purchases emitted at all"
