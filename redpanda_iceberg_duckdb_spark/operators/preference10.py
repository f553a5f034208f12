"""Bradley-Terry preference-strength fitting (Bradley & Terry 1952, via
the MM algorithm of Hunter 2004) — the model behind pairwise-preference
reward modeling and chatbot-arena-style rankings: given "i beat j" counts,
find strengths theta with P(i beats j) = theta_i / (theta_i + theta_j).

Comparisons are derived deterministically from the events table: within
each user, event type a "beats" b when the user fired a more often than b
(ties excluded). The wins matrix is ITEM-cardinality (m x m, m = #event
types), so the pipeline is the PCA/k-means shape: one distributed pass
reduces N events to a tiny sufficient-statistics matrix, the driver runs
T=30 MM iterations on it, and the oracle replays the identical iteration
as a recursive CTE whose state is the strength VECTOR carried as a list
(DuckDB lambdas cannot reference subqueries, so the constant w/n/m ride
along as recursion-state columns).

Scale stance: the per-(user, type) count is one map-side-combinable
aggregate; the pairing self-join is co-partitioned on user_id and emits
at most m^2 rows per user; the wins aggregate is m^2 rows total. Nothing
after the second aggregate touches the data. MM update per iteration:
theta_i <- W_i / sum_j n_ij / (theta_i + theta_j), then normalize to sum
1 — both engines evaluate the sums in ascending-index order, so the
doubles track to ~1 ulp and round(…, 6) matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_T = 30


def _oracle() -> str:
    return f"""
WITH counts AS (SELECT user_id, event_type, count(*) c
                FROM events GROUP BY 1, 2),
pw AS (SELECT a.event_type i, b.event_type j,
              sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) w
       FROM counts a JOIN counts b
         ON a.user_id = b.user_id AND a.event_type <> b.event_type
       GROUP BY 1, 2),
items AS (SELECT i, row_number() OVER (ORDER BY i) - 1 AS k
          FROM (SELECT DISTINCT i FROM pw)),
wl AS (SELECT list(wins ORDER BY k) AS w FROM
        (SELECT it.k, cast(sum(pw.w) AS double) AS wins
         FROM pw JOIN items it ON it.i = pw.i GROUP BY it.k)),
nmat AS (SELECT list(row ORDER BY k) AS n FROM
          (SELECT ia.k AS k,
                  list(cast(coalesce(nv, 0) AS double) ORDER BY kj) AS row
           FROM (SELECT k FROM items) ia(k)
           CROSS JOIN (SELECT k AS kj FROM items) jb
           LEFT JOIN (SELECT ii.k ki, jj.k kj2, p.w + q.w AS nv
                      FROM pw p JOIN pw q ON q.i = p.j AND q.j = p.i
                           JOIN items ii ON ii.i = p.i
                           JOIN items jj ON jj.i = p.j) nv
             ON nv.ki = ia.k AND nv.kj2 = jb.kj
           GROUP BY ia.k) t),
m AS (SELECT cast(count(*) AS int) AS m FROM items),
bt AS (
  WITH RECURSIVE itr(t, th, w, n, m) AS (
    SELECT 0, [1.0 / m.m FOR x IN range(m.m)], wl.w, nmat.n, m.m
    FROM wl, nmat, m
    UNION ALL
    SELECT t + 1,
      [x / list_sum([ w[i+1] /
             list_sum([CASE WHEN j <> i
                            THEN n[i+1][j+1] / (th[i+1] + th[j+1])
                            ELSE 0.0 END FOR j IN range(m)])
           FOR i IN range(m)])
       FOR x IN [ w[i+1] /
             list_sum([CASE WHEN j <> i
                            THEN n[i+1][j+1] / (th[i+1] + th[j+1])
                            ELSE 0.0 END FOR j IN range(m)])
           FOR i IN range(m)]],
      w, n, m
    FROM itr WHERE t < {_T})
  SELECT th FROM itr WHERE t = {_T})
SELECT it.i AS item,
       cast((SELECT w FROM wl)[it.k + 1] AS bigint) AS wins,
       cast(list_sum((SELECT n FROM nmat)[it.k + 1]) AS bigint)
         AS comparisons,
       round((SELECT th FROM bt)[it.k + 1], 6) AS strength
FROM items it ORDER BY item"""


@register(
    "bradley_terry_strengths",
    oracle=_oracle(),
    tags=("preference", "evaluation", "convergence", "scale-pattern"),
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(item, wins, comparisons, strength): Bradley-Terry strengths of the
    event types under the per-user frequency-preference relation, fitted
    by T=30 MM iterations on the m x m wins matrix (module docstring).
    Like the PCA/k-means family, the distributed cost is the sufficient-
    statistics reduction; iteration happens on an item-cardinality matrix
    on the driver, and the oracle replays the identical program."""
    e = load_table(spark, sf_dir, "events")
    counts = (e.groupBy("user_id", "event_type")
              .agg(F.count(F.lit(1)).alias("c")))
    a = counts.select("user_id", F.col("event_type").alias("i"),
                      F.col("c").alias("ci"))
    b = counts.select(F.col("user_id").alias("uid2"),
                      F.col("event_type").alias("j"),
                      F.col("c").alias("cj"))
    pw = (a.join(b, (F.col("user_id") == F.col("uid2"))
                 & (F.col("i") != F.col("j")))
          .groupBy("i", "j")
          .agg(F.sum(F.when(F.col("ci") > F.col("cj"), 1).otherwise(0))
               .alias("w"))
          .collect())  # m^2 rows — item-cardinality, not data-cardinality

    items = sorted({r["i"] for r in pw})
    idx = {it: k for k, it in enumerate(items)}
    m = len(items)
    wmat = [[0.0] * m for _ in range(m)]
    for r in pw:
        wmat[idx[r["i"]]][idx[r["j"]]] = float(r["w"])
    w_tot = [sum(wmat[i]) for i in range(m)]
    n_mat = [[wmat[i][j] + wmat[j][i] for j in range(m)] for i in range(m)]

    th = [1.0 / m] * m
    for _ in range(_T):
        raw = [w_tot[i]
               / sum(n_mat[i][j] / (th[i] + th[j]) if j != i else 0.0
                     for j in range(m))
               for i in range(m)]
        s = sum(raw)
        th = [x / s for x in raw]

    out = [(items[i], int(w_tot[i]), int(sum(n_mat[i])), round(th[i], 6))
           for i in range(m)]
    return (spark.createDataFrame(
                out, "item string, wins bigint, comparisons bigint, "
                     "strength double")
            .orderBy("item"))
