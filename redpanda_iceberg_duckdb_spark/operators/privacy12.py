"""Laplace mechanism for differentially-private released counts — the
noise-addition side of the privacy toolbox (k-anonymity / l-diversity /
t-closeness audit the DATA; this audits the release MECHANISM). Per
event_type, the true count plus Laplace(b = 20) noise gives an
epsilon = sensitivity/b = 1/20 per-count release (count sensitivity 1).

Determinism caveat, stated honestly: production DP draws fresh randomness
per release; here the uniform draw is derived from the md5 hash of the
group key + a release tag so BOTH engines produce the identical draw and
the mechanism itself (inverse-CDF transform, clamping, accounting) is
verifiable cross-engine. Swap `_RELEASE_TAG` for a per-release nonce to
get real DP.

Float discipline: u = (h % 1e6 + 0.5)/1e6 is exact; the one ln() call is
snapped immediately to the micro lattice (cast(round(ln(arg) * 1e6) as
bigint) — the text11 micro-nat pattern), so everything downstream is
integer arithmetic and one final division. Scale: pure map-side expression
over group aggregates — no shuffle beyond the groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_u64_duck, md5_u64_spark
from ..registry import register
from ..tables import load_table

_B = 20            # Laplace scale; epsilon = 1/_B per released count
_RELEASE_TAG = "dp12-release-1"

# u in (0,1): (md5 % 1e6 + 0.5) / 1e6 — never exactly 0, 0.5, or 1, so the
# inverse CDF below never sees ln(0).
_U_SPARK = ("(cast({h} % 1000000 as double) + 0.5) / 1e6"
            .format(h=md5_u64_spark(f"concat(event_type, ':{_RELEASE_TAG}')")))
_U_DUCK = ("(cast({h} % 1000000 as double) + 0.5) / 1e6"
           .format(h=md5_u64_duck(f"event_type || ':{_RELEASE_TAG}'")))

# Laplace inverse CDF around 0: noise = -b * sign(u - .5) * ln(1 - 2|u - .5|),
# with ln snapped ONCE to micro-nats so both engines carry the same integer.
_NOISE_MICRO_SPARK = (
    f"cast(sign(0.5 - ({_U_SPARK})) as bigint)"
    f" * cast(round(ln(1 - 2 * abs(({_U_SPARK}) - 0.5)) * 1e6) as bigint)"
    f" * {_B}")
_NOISE_MICRO_DUCK = (
    f"cast(sign(0.5 - ({_U_DUCK})) as bigint)"
    f" * cast(round(ln(1 - 2 * abs(({_U_DUCK}) - 0.5)) * 1e6) as bigint)"
    f" * {_B}")

_DP_ORACLE = f"""
WITH g AS (SELECT event_type, cast(count(*) AS bigint) AS n
           FROM events GROUP BY 1),
r AS (SELECT event_type, n, {_NOISE_MICRO_DUCK} AS noise_micro FROM g)
SELECT event_type, n AS true_count,
       round((n * 1000000 + noise_micro) / 1e6, 3) AS noisy_count,
       round(noise_micro / 1e6, 3) AS noise,
       round(1.0 / {_B}, 3) AS epsilon
FROM r ORDER BY event_type"""


@register(
    "dp_noisy_counts",
    oracle=_DP_ORACLE,
    tags=("privacy", "dp"),
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Laplace-mechanism released counts with the noise and
    the per-count epsilon — deterministic seeded draws so the mechanism is
    cross-engine verifiable (module docstring has the honest caveat)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    r = g.withColumn("noise_micro", F.expr(_NOISE_MICRO_SPARK))
    return (r.select(
        "event_type",
        F.col("n").alias("true_count"),
        F.round((F.col("n") * 1000000 + F.col("noise_micro")) / 1e6, 3)
         .alias("noisy_count"),
        F.round(F.col("noise_micro") / 1e6, 3).alias("noise"),
        F.round(F.lit(1.0) / _B, 3).alias("epsilon"))
        .orderBy("event_type"))
