"""Forecast backtesting: MASE of a seasonal-naive forecast (Hyndman &
Koehler, IJF 2006) — the scale-free accuracy metric that makes forecast
quality comparable across series of different magnitudes, evaluated the
way production capacity-planning backtests do: hold out the most recent
season, score a model against the in-sample naive error.

    MASE = mean|y_t - yhat_t| (holdout)
           / mean|y_t - y_{t-m}| (train, the seasonal-naive error)

with m = 168 (weekly seasonality on hourly data) and the forecast itself
the seasonal-naive y_{t-m} — MASE ~ 1 means "no better than persistence".

Scale stance: the series reduces to one integer count per (series, hour)
in one hash aggregate; the lag join is a self-join on (series, h - m) —
co-partitioned by series, retention-bounded length. Counts are integers,
so every |error| sum is exact in both engines and the single final
quotient is the only float. Hours with no row (zero events) simply
produce no joined pair in either engine — the same deterministic
evaluation set on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_SEASON = 168          # hours: weekly seasonality
_HOLDOUT = 168         # last week is the test period


def _oracle() -> str:
    return f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1, 2),
hmax AS (SELECT event_type, max(h) AS hm FROM hourly GROUP BY event_type),
pairs AS (
  SELECT a.event_type, a.h, abs(a.c - b.c) AS err,
         CASE WHEN a.h > m.hm - {_HOLDOUT} THEN 1 ELSE 0 END AS is_test
  FROM hourly a
  JOIN hourly b ON b.event_type = a.event_type
               AND b.h = a.h - {_SEASON}
  JOIN hmax m ON m.event_type = a.event_type)
SELECT event_type,
       cast(sum(is_test) AS bigint) AS n_test,
       cast(sum(1 - is_test) AS bigint) AS n_train,
       round((cast(sum(CASE WHEN is_test = 1 THEN err ELSE 0 END) AS double)
              / nullif(sum(is_test), 0))
             / nullif(cast(sum(CASE WHEN is_test = 0 THEN err ELSE 0 END)
                           AS double)
                      / nullif(sum(1 - is_test), 0), 0.0), 6) AS mase
FROM pairs
GROUP BY event_type
ORDER BY event_type"""


@register(
    "mase_seasonal_naive",
    oracle=_oracle(),
    tags=("forecast", "evaluation", "scale-pattern"),
)
def mase_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: MASE of the weekly seasonal-naive forecast over
    the final week of hourly counts, scaled by the in-sample
    seasonal-naive error. Integer error sums keep both engines exact up
    to the one final quotient; a green row proves the lag join, the
    train/test split, and the scaling denominator all agree."""
    hourly = (load_table(spark, sf_dir, "events")
              .groupBy("event_type",
                       F.expr("unix_micros(ts) div 3600000000").alias("h"))
              .agg(F.count(F.lit(1)).alias("c")))
    hmax = hourly.groupBy("event_type").agg(F.max("h").alias("hm"))
    lag = hourly.select(F.col("event_type").alias("et2"),
                        (F.col("h") + _SEASON).alias("h2"),
                        F.col("c").alias("c_lag"))
    pairs = (hourly
             .join(lag, (hourly.event_type == F.col("et2"))
                   & (hourly.h == F.col("h2")))
             .join(F.broadcast(hmax), "event_type")
             .select("event_type",
                     F.abs(F.col("c") - F.col("c_lag")).alias("err"),
                     F.when(F.col("h") > F.col("hm") - _HOLDOUT, 1)
                     .otherwise(0).alias("is_test")))
    test_err = F.sum(F.when(F.col("is_test") == 1, F.col("err"))
                     .otherwise(0)).cast("double")
    train_err = F.sum(F.when(F.col("is_test") == 0, F.col("err"))
                      .otherwise(0)).cast("double")
    n_test = F.sum("is_test")
    n_train = F.sum(F.lit(1) - F.col("is_test"))
    # MASE is undefined when a split is empty or the series is perfectly
    # periodic in-sample (train error 0): surface NULL, never divide by
    # zero — the same nullif guards as the oracle.
    test_mae = test_err / F.nullif(n_test.cast("double"), F.lit(0.0))
    train_mae = train_err / F.nullif(n_train.cast("double"), F.lit(0.0))
    return (pairs.groupBy("event_type")
            .agg(n_test.cast("long").alias("n_test"),
                 n_train.cast("long").alias("n_train"),
                 F.round(test_mae / F.nullif(train_mae, F.lit(0.0)), 6)
                 .alias("mase"))
            .orderBy("event_type"))
