"""Off-policy evaluation: inverse-propensity scoring (Horvitz & Thompson
1952; Li et al., WWW 2011 for the bandit form) and its self-normalized
variant (SNIPS, Swaminathan & Joachims, NeurIPS 2015) — estimate what a
NEW decision policy would earn from logs collected under an old one,
without an experiment:

    V_IPS   = mean( r * 1[pi(x) = a_logged] / p_logged(a) )
    V_SNIPS = sum(r * match / p) / sum(match / p)

Scale stance: the estimator is one scan and one global aggregate —
per-row arithmetic on (reward, logged action, target action), no join,
no window, no state. Logged actions and the target policy are both
seeded hashes here (functions/hashing.py), making the whole construction
deterministic and giving EXACT propensities (uniform over K arms ->
p = 1/K precisely); rewards are 0/1 integers, so every sum is exact and
the two output quotients are the only floats. On a real log the
propensity is a column; the plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import md5_mod_duck, md5_mod_spark
from ..registry import register
from ..tables import load_table

_K = 3  # arms; logging policy is uniform -> propensity exactly 1/K


def _oracle() -> str:
    a_log = md5_mod_duck("'log:' || cast(event_id AS varchar)", _K)
    a_tgt = md5_mod_duck("'tgt:' || cast(user_id AS varchar)", _K)
    return f"""
WITH rows_ AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r,
         CASE WHEN {a_log} = {a_tgt} THEN 1 ELSE 0 END AS m
  FROM events)
SELECT cast(count(*) AS bigint) AS n,
       cast(sum(m) AS bigint) AS n_match,
       round(cast(sum(r) AS double) / count(*), 6) AS behavior_value,
       round({_K} * cast(sum(r * m) AS double) / count(*), 6) AS ips_value,
       round(cast(sum(r * m) AS double) / sum(m), 6) AS snips_value
FROM rows_"""


@register(
    "offpolicy_ips_snips",
    oracle=_oracle(),
    tags=("evaluation", "counterfactual", "scale-pattern"),
)
def offpolicy_ips_snips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, n_match, behavior_value, ips_value, snips_value) for a
    hash-seeded uniform logging policy vs a deterministic hash target
    policy, with reward = the event being a purchase. With constant
    propensity 1/K, SNIPS reduces to the matched-rows mean — the
    estimators' integer numerators/denominators make both engines exact
    up to the two final quotients."""
    ev = load_table(spark, sf_dir, "events")
    a_log = F.expr(md5_mod_spark(
        "concat('log:', cast(event_id as string))", _K))
    a_tgt = F.expr(md5_mod_spark(
        "concat('tgt:', cast(user_id as string))", _K))
    rows = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("r"),
        F.when(a_log == a_tgt, 1).otherwise(0).alias("m"))
    n = F.count(F.lit(1))
    return rows.agg(
        n.cast("long").alias("n"),
        F.sum("m").cast("long").alias("n_match"),
        F.round(F.sum("r").cast("double") / n, 6).alias("behavior_value"),
        F.round(F.lit(_K) * F.sum(F.col("r") * F.col("m")).cast("double")
                / n, 6).alias("ips_value"),
        F.round(F.sum(F.col("r") * F.col("m")).cast("double")
                / F.sum("m"), 6).alias("snips_value"))
