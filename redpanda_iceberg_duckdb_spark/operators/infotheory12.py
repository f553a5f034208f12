"""Entropy rate of the user-behavior Markov chain: the plug-in estimate
H = -sum_ij (c_ij/N) ln(c_ij/c_i.) over first-order event-type
transitions — how PREDICTABLE is the next action given the current one,
in nats. The per-state rows localize it (which states are deterministic
funnels, which are coin flips); the __ALL__ row is the chain's entropy
rate under the empirical state distribution — the information-theoretic
summary sitting beside the transition matrix (event_type_transitions)
and its stationary distribution (markov_stationary_events).

Micro-nat discipline: each ln(c_ij / c_i.) is snapped ONCE to micro-nats
(identical expression both engines); entropy numerators are then exact
integer sums of c_ij * lp_ij and every output is one final division.

Scale: one lead-window over per-user sequences (partitioned by user —
parallel), one |types|^2 count aggregate; everything after runs on the
transition matrix (k^2 rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_ENT_ORACLE = """
WITH p AS (
  SELECT event_type AS src, lead(event_type) OVER w AS dst
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT src, dst, cast(count(*) AS bigint) AS n FROM p
      WHERE dst IS NOT NULL GROUP BY src, dst),
r AS (SELECT src, sum(n) AS nr FROM c GROUP BY src),
lp AS (SELECT c.src, c.n,
              cast(round(ln(cast(c.n AS double) / r.nr) * 1e6) AS bigint)
                AS lpm
       FROM c JOIN r ON r.src = c.src),
per AS (SELECT src, cast(sum(n) AS bigint) AS n_out,
               cast(-sum(n * lpm) AS bigint) AS h_num
        FROM lp GROUP BY src)
SELECT src, n_out,
       round(cast(h_num AS double) / n_out / 1e6, 6) AS entropy_nats
FROM per
UNION ALL
SELECT '__ALL__' AS src,
       cast(sum(n_out) AS bigint) AS n_out,
       round(cast(sum(h_num) AS double) / sum(n_out) / 1e6, 6)
         AS entropy_nats
FROM per
ORDER BY src"""


@register(
    "markov_entropy_rate",
    oracle=_ENT_ORACLE,
    tags=("statistics", "information", "markov", "sequence"),
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the next event type and the
    chain's plug-in entropy rate (__ALL__ row), exact on the micro-nat
    lattice (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = e.select(F.col("event_type").alias("src"),
                 F.lead("event_type").over(w).alias("dst"))
    c = (p.filter(F.col("dst").isNotNull())
         .groupBy("src", "dst")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    r = c.groupBy("src").agg(F.sum("n").alias("nr"))
    lp = (c.join(r, "src")
          .select("src", "n",
                  F.round(F.log(F.col("n").cast("double") / F.col("nr"))
                          * 1e6).cast("long").alias("lpm")))
    per = (lp.groupBy("src")
           .agg(F.sum("n").cast("long").alias("n_out"),
                (-F.sum(F.col("n") * F.col("lpm"))).cast("long")
                .alias("h_num"))
           .persist())   # read by both the per-state and __ALL__ branches
    rows = per.select(
        "src", "n_out",
        F.round(F.col("h_num").cast("double") / F.col("n_out") / 1e6, 6)
         .alias("entropy_nats"))
    total = per.agg(
        F.lit("__ALL__").alias("src"),
        F.sum("n_out").cast("long").alias("n_out"),
        F.round(F.sum("h_num").cast("double") / F.sum("n_out") / 1e6, 6)
         .alias("entropy_nats"))
    return rows.unionAll(total).orderBy("src")
