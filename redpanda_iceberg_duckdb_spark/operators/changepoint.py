"""CUSUM changepoint detection (Page, Biometrika 1954) over hourly event
counts — the sequential drift alarm every ingest monitor runs: flag the
first hour where counts have shifted up persistently, not just spiked.

The textbook recursion S_t = max(0, S_{t-1} + (x_t - k)) looks
inherently sequential, but the one-sided CUSUM has a closed window form:

    S_t = P_t - min(P_0 .. P_t),   P_t = cumsum(x - k)

(the max-0 resets are exactly "subtract the running minimum of the
drift-adjusted prefix sum"). Both engines compute it with one cumulative
sum and one running min — NO recursion, NO UDF, no per-row state.

Scale stance: the series is first reduced by a hash aggregate to one row
per (series, hour); the two windows sort WITHIN each series partition
(retention-bounded length), never globally, so series count is the
scale-out dimension. Reference slack k and threshold h derive from
per-series mean/stddev via one aggregate broadcast back — three shuffles
total, all series-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

# Allowance k = mean + _K_STD * stddev; alarm when S_t > _H_STD * stddev.
_K_STD = 0.5
_H_STD = 4.0


def _oracle() -> str:
    return f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1, 2),
params AS (
  SELECT event_type, avg(c) AS mu, stddev_pop(c) AS sd
  FROM hourly GROUP BY event_type),
pref AS (
  SELECT h.event_type, h.h,
         sum(h.c - (p.mu + {_K_STD} * p.sd)) OVER (
             PARTITION BY h.event_type ORDER BY h.h) AS pt,
         {_H_STD} * p.sd AS thresh
  FROM hourly h JOIN params p USING (event_type)),
cusum AS (
  SELECT event_type, h, thresh,
         pt - min(pt) OVER (PARTITION BY event_type ORDER BY h
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS s
  FROM pref),
alarm AS (
  SELECT event_type, min(h) FILTER (WHERE s > thresh) AS alarm_h,
         max(s) AS max_s, any_value(thresh) AS thresh
  FROM cusum GROUP BY event_type)
SELECT event_type, cast(alarm_h AS bigint) AS alarm_hour,
       round(max_s, 4) AS max_cusum, round(thresh, 4) AS threshold
FROM alarm ORDER BY event_type"""


@register(
    "cusum_changepoint_hourly",
    oracle=_oracle(),
    tags=("timeseries", "changepoint", "scale-pattern"),
)
def cusum_changepoint_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: the first hour the one-sided CUSUM of hourly
    counts exceeds its threshold (NULL if never), plus the max statistic
    and the threshold. The oracle re-derives the prefix-min identity
    independently, so a green row proves the reset algebra, the window
    frames, and the parameter derivation all agree."""
    hourly = (load_table(spark, sf_dir, "events")
              .groupBy("event_type",
                       F.expr("unix_micros(ts) div 3600000000").alias("h"))
              .agg(F.count(F.lit(1)).alias("c")))
    params = hourly.groupBy("event_type").agg(
        F.avg("c").alias("mu"), F.stddev_pop("c").alias("sd"))
    w = (W.partitionBy("event_type").orderBy("h")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    withs = (hourly.join(F.broadcast(params), "event_type")
             .withColumn("pt", F.sum(
                 F.col("c") - (F.col("mu") + _K_STD * F.col("sd"))).over(w))
             .withColumn("thresh", _H_STD * F.col("sd"))
             .withColumn("s", F.col("pt") - F.min("pt").over(w)))
    return (withs.groupBy("event_type")
            .agg(F.min(F.when(F.col("s") > F.col("thresh"), F.col("h")))
                 .cast("long").alias("alarm_hour"),
                 F.round(F.max("s"), 4).alias("max_cusum"),
                 F.round(F.any_value("thresh"), 4).alias("threshold"))
            .orderBy("event_type"))
