"""Behavioral Markov chain: per-user event-type transition matrix and
its stationary distribution — the steady-state "where do sessions spend
their time" readout behind navigation analysis and absorbing-state
funnels (and the general-Markov sibling of graphrank's PageRank, which
fixes teleportation instead of estimating the chain from data).

Pipeline: consecutive (prev → next) event pairs per user via ONE lead()
window partitioned by user (co-partitioned, no global order), one
m x m count aggregate (m = #event types), row-normalize to a stochastic
matrix, then T=40 power iterations pi <- pi P on the driver — the
PCA/Bradley-Terry sufficient-statistics shape: the data pass reduces N
events to m^2 counts and everything after is m-bounded. The oracle
replays the identical iteration as a recursive CTE carrying pi as a list
(the preference10.py device), with the transition probabilities exact
integer ratios, so both engines run the same deterministic map.

The chain is irreducible on the shipped fixtures (every type follows
every type somewhere); rows with no outgoing transition (a user's last
event is not a row) cannot occur since only observed pairs count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_T = 40


def _oracle() -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
tr AS (SELECT event_type AS src, nxt AS dst, count(*) AS c
       FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
items AS (SELECT src AS i, row_number() OVER (ORDER BY src) - 1 AS k
          FROM (SELECT DISTINCT src FROM tr)),
rowtot AS (SELECT src, sum(c) AS tot FROM tr GROUP BY src),
pmat AS (SELECT list(row ORDER BY ki) AS p FROM
          (SELECT ii.k AS ki,
                  list(cast(coalesce(tv.c, 0) AS double) / rt.tot
                       ORDER BY kj) AS row
           FROM items ii
           JOIN rowtot rt ON rt.src = ii.i
           CROSS JOIN (SELECT i AS j, k AS kj FROM items) jj
           LEFT JOIN tr tv ON tv.src = ii.i AND tv.dst = jj.j
           GROUP BY ii.k, rt.tot) t),
m AS (SELECT cast(count(*) AS int) AS m FROM items),
st AS (
  WITH RECURSIVE itr(t, pi, p, m) AS (
    SELECT 0, [1.0 / m.m FOR x IN range(m.m)], pmat.p, m.m
    FROM pmat, m
    UNION ALL
    SELECT t + 1,
      [list_sum([pi[i+1] * p[i+1][j+1] FOR i IN range(m)])
       FOR j IN range(m)],
      p, m
    FROM itr WHERE t < {_T})
  SELECT pi FROM itr WHERE t = {_T})
SELECT it.i AS event_type,
       cast((SELECT sum(c) FROM tr WHERE src = it.i) AS bigint)
         AS n_transitions_out,
       round((SELECT pi FROM st)[it.k + 1], 6) AS stationary_prob
FROM items it ORDER BY event_type"""


@register(
    "markov_stationary_events",
    oracle=_oracle(),
    tags=("analytics", "graph", "convergence", "scale-pattern"),
)
def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_transitions_out, stationary_prob): the stationary
    distribution of the per-user event-type transition chain, T=40 power
    iterations on the m x m row-stochastic matrix (module docstring)."""
    e = load_table(spark, sf_dir, "events")
    seq = e.select("user_id", "event_type",
                   F.lead("event_type").over(
                       W.partitionBy("user_id").orderBy("ts", "event_id"))
                   .alias("nxt"))
    tr = (seq.filter(F.col("nxt").isNotNull())
          .groupBy(F.col("event_type").alias("src"),
                   F.col("nxt").alias("dst"))
          .agg(F.count(F.lit(1)).alias("c"))
          .collect())  # m^2 rows — item-cardinality

    items = sorted({r["src"] for r in tr} | {r["dst"] for r in tr})
    # Stationary analysis needs the chain on states with outgoing mass;
    # on the fixtures every type both enters and leaves, so the union
    # equals the src set (asserted implicitly by the oracle's item list
    # being src-derived: a mismatch would break the row count).
    idx = {s: k for k, s in enumerate(items)}
    m = len(items)
    cnt = [[0] * m for _ in range(m)]
    for r in tr:
        cnt[idx[r["src"]]][idx[r["dst"]]] = r["c"]
    tot = [sum(row) for row in cnt]
    p = [[cnt[i][j] / tot[i] for j in range(m)] for i in range(m)]

    pi = [1.0 / m] * m
    for _ in range(_T):
        pi = [sum(pi[i] * p[i][j] for i in range(m)) for j in range(m)]

    out = [(items[i], int(tot[i]), round(pi[i], 6)) for i in range(m)]
    return (spark.createDataFrame(
                out, "event_type string, n_transitions_out bigint, "
                     "stationary_prob double")
            .orderBy("event_type"))
