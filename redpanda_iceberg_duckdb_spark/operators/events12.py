"""Event-behavior analytics: ordered funnel conversion and time-decayed
engagement scoring — the two product-analytics staples (Amplitude/Mixpanel
style) the engine had not yet expressed.

Funnel (view -> click -> purchase): strictly-ordered min-timestamp
chaining per user — a user converts step k iff their earliest step-k
event is strictly later than their converting step-(k-1) event. Three
conditional aggregates and two broadcast-sized joins; timestamps compare
exactly (microsecond lattice), so both engines chain identically.

Time-decayed engagement: per-user sum of value_cents · 2^(-age_days),
computed EXACTLY as an integer on the 2^(K - age) lattice (age bucketed
to whole days, K = 40 covers any horizon the data has; weights are powers
of two so the scaled sum is an exact decimal integer, order-insensitive).
The standard recency-weighted LTV/engagement score without any float-pow
cross-engine hazard.

Scale stance: both are one-scan groupBy-per-user shapes with map-side
combine; the funnel's step frames are per-user 1-row aggregates joined on
the user key (AQE broadcasts the shrinking side). No window over anything
bigger than a user's own events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_DECAY_K = 40          # 2^40 scale: exact for age 0..40 days
_TOPN = 20

_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id)
SELECT (SELECT cast(count(*) AS bigint) FROM v) AS n_view,
       (SELECT cast(count(*) AS bigint) FROM c) AS n_click_after_view,
       (SELECT cast(count(*) AS bigint) FROM p) AS n_purchase_after_click,
       round((SELECT count(*) FROM c) * 1.0
             / greatest((SELECT count(*) FROM v), 1), 6) AS view_to_click,
       round((SELECT count(*) FROM p) * 1.0
             / greatest((SELECT count(*) FROM c), 1), 6) AS click_to_purchase
"""


@register(
    "funnel_view_click_purchase",
    oracle=_FUNNEL_ORACLE,
    tags=("events", "funnel", "analytics"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-step funnel over events (module docstring):
    per-step converting-user counts and step conversion rates."""
    e = load_table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (e.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (e.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    return (nv.crossJoin(nc).crossJoin(np_)   # three 1-row aggregates
            .select(
                F.col("n_view").cast("long").alias("n_view"),
                F.col("n_click_after_view").cast("long")
                 .alias("n_click_after_view"),
                F.col("n_purchase_after_click").cast("long")
                 .alias("n_purchase_after_click"),
                F.round(F.col("n_click_after_view")
                        / F.greatest(F.col("n_view"), F.lit(1)), 6)
                 .alias("view_to_click"),
                F.round(F.col("n_purchase_after_click")
                        / F.greatest(F.col("n_click_after_view"),
                                     F.lit(1)), 6)
                 .alias("click_to_purchase")))


_DECAY_ORACLE = f"""
WITH mx AS (SELECT max(ts) AS tmax FROM events),
aged AS (SELECT user_id,
                cast(round(value * 100) AS bigint) AS cents,
                least(cast((epoch_us(mx.tmax) - epoch_us(ts))
                           // 86400000000 AS bigint), {_DECAY_K}) AS age_d
         FROM events, mx),
sc AS (SELECT user_id,
              sum(cast(cents AS hugeint)
                  * cast(power(2, {_DECAY_K} - age_d) AS hugeint))
                AS score_scaled
       FROM aged GROUP BY user_id)
SELECT user_id,
       round(cast(score_scaled AS double) / power(2, {_DECAY_K}) / 100, 6)
         AS decayed_value
FROM sc ORDER BY score_scaled DESC, user_id LIMIT {_TOPN}"""


@register(
    "time_decayed_engagement",
    oracle=_DECAY_ORACLE,
    tags=("events", "analytics", "timeseries"),
)
def time_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top users by recency-weighted value: sum of value · 2^(-age_days)
    relative to the corpus max timestamp, accumulated as an EXACT integer
    on the 2^({_DECAY_K} - age) lattice (module docstring), so the sum is
    order-insensitive and the ranking deterministic cross-engine."""
    dec = "decimal(38,0)"
    e = load_table(spark, sf_dir, "events")
    tmax = e.agg(F.max(F.unix_micros("ts"))).head()[0]
    # integer `div`, not float `/`+cast: a double quotient can land a hair
    # under an exact day boundary and truncate differently than the
    # oracle's integer floor division
    aged = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.least(F.expr(f"({int(tmax)}L - unix_micros(ts)) "
                       "div 86400000000"),
                F.lit(_DECAY_K)).cast("long").alias("age_d"))
    weight = F.expr(f"cast(pow(2, {_DECAY_K} - age_d) as {dec})")
    sc = (aged.groupBy("user_id")
          .agg(F.sum(F.col("cents").cast(dec) * weight)
               .alias("score_scaled")))
    return (sc.orderBy(F.desc("score_scaled"), "user_id").limit(_TOPN)
            .select("user_id",
                    F.round(F.col("score_scaled").cast("double")
                            / float(2 ** _DECAY_K) / 100, 6)
                    .alias("decayed_value")))
