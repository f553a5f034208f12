"""Sliced 1-D Wasserstein distance between label slices of the embedding
corpus — the full-distribution companion to mmd_linear_label_pairs (MMD
with the linear kernel only compares MEANS; two label cells with equal
centroids but different spread are invisible to it — sliced-W1 sees
them).

Method (Rabin et al. 2011 sliced OT, made cross-engine exact): project
every embedding onto K = 8 FIXED +-1 sign vectors (the deterministic
integer stand-in for Gaussian directions — 'very sparse random
projections'; sign(p, i) = +1 iff ((131p + 31i) mod 7) is even, a pure
integer rule both engines evaluate identically), compute the exact 1-D
W1 between each label pair's projected distributions on the merged
support (ot13's cross-multiplied cumulative-count lattice: every term
|n_b*C_a - n_a*C_b| * gap is an exact int64, summed as DECIMAL(38,0)),
and average over projections with ONE final division.

Scale stance (100 TB): the projection is one map-side explode + groupBy
(vec x K partial sums, combinable); pair work runs on the projected
DISTRIBUTIONS (distinct projected values per (label, projection) — value-
lattice-bounded, not corpus-bounded); the per-pair cumulative window is
partitioned by (pair, projection). No data-sized shuffle after the first
aggregate, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_K = 8

_SW_ORACLE = f"""
WITH e AS (SELECT vec_id, label, i - 1 AS i,
                  cast(floor(cast(x AS double) * 1e6) AS bigint) AS q
           FROM (SELECT vec_id, label,
                        generate_subscripts(embedding, 1) AS i,
                        unnest(embedding) AS x
                 FROM embeddings)),
proj AS (SELECT e.vec_id, e.label, p.p,
                cast(sum(CASE WHEN ((131 * p.p + 31 * e.i) % 7) % 2 = 0
                              THEN e.q ELSE -e.q END) AS bigint) AS t
         FROM e CROSS JOIN (SELECT unnest(range({_K})) AS p) p
         GROUP BY 1, 2, 3),
c AS (SELECT label, p, t, cast(count(*) AS bigint) AS cnt
      FROM proj GROUP BY 1, 2, 3),
n AS (SELECT label, cast(sum(cnt) AS bigint) AS n FROM c
      WHERE p = 0 GROUP BY 1),
pr AS (SELECT a.label AS la, b.label AS lb, a.n AS na, b.n AS nb
       FROM n a JOIN n b ON a.label < b.label),
m AS (SELECT pr.la, pr.lb, pr.na, pr.nb, c.p, c.t,
             sum(CASE WHEN c.label = pr.la THEN c.cnt ELSE 0 END) AS ca,
             sum(CASE WHEN c.label = pr.lb THEN c.cnt ELSE 0 END) AS cb
      FROM pr JOIN c ON c.label = pr.la OR c.label = pr.lb
      GROUP BY 1, 2, 3, 4, 5, 6),
s AS (SELECT la, lb, na, nb, p, t,
             sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
             lead(t) OVER w AS nt
      FROM m WINDOW w AS (PARTITION BY la, lb, p ORDER BY t))
SELECT la AS label_a, lb AS label_b,
       cast(na AS bigint) AS n_a, cast(nb AS bigint) AS n_b,
       round(cast(sum(cast(abs(nb * cuma - na * cumb) * (nt - t)
                           AS hugeint)) AS double)
             / ({_K} * na * nb) / 1e6, 6) AS sliced_w1
FROM s WHERE nt IS NOT NULL
GROUP BY la, lb, na, nb ORDER BY label_a, label_b"""


@register(
    "sliced_wasserstein_labels",
    oracle=_SW_ORACLE,
    tags=("similarity", "drift", "optimal-transport", "statistics"),
)
def sliced_wasserstein_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliced-W1 between every label pair's embedding distribution over 8
    deterministic +-1 projections (module docstring): (label_a, label_b,
    n_a, n_b, sliced_w1), every cumulative term exact integer, one final
    division per pair."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = (emb.select("vec_id", "label",
                    F.posexplode("embedding").alias("i", "x"))
         .select("vec_id", "label", "i",
                 F.expr("cast(floor(cast(x as double) * 1e6) as bigint)")
                 .alias("q")))
    sign_pos = ((131 * F.col("p") + 31 * F.col("i")) % 7) % 2 == 0
    proj = (e.select("vec_id", "label", "i", "q",
                     F.explode(F.sequence(F.lit(0), F.lit(_K - 1)))
                     .alias("p"))
            .groupBy("vec_id", "label", "p")
            .agg(F.sum(F.when(sign_pos, F.col("q"))
                       .otherwise(-F.col("q"))).alias("t")))
    c = (proj.groupBy("label", "p", "t")
         .agg(F.count(F.lit(1)).alias("cnt")))
    n = (c.filter(F.col("p") == 0).groupBy("label")
         .agg(F.sum("cnt").alias("n")))
    pr = F.broadcast(
        n.select(F.col("label").alias("la"), F.col("n").alias("na"))
        .join(n.select(F.col("label").alias("lb"), F.col("n").alias("nb")),
              F.col("la") < F.col("lb")))
    m = (pr.join(c, (F.col("label") == F.col("la"))
                 | (F.col("label") == F.col("lb")))
         .groupBy("la", "lb", "na", "nb", "p", "t")
         .agg(F.sum(F.when(F.col("label") == F.col("la"), F.col("cnt"))
                    .otherwise(0)).alias("ca"),
              F.sum(F.when(F.col("label") == F.col("lb"), F.col("cnt"))
                    .otherwise(0)).alias("cb")))
    w = (W.partitionBy("la", "lb", "p").orderBy("t")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    wl = W.partitionBy("la", "lb", "p").orderBy("t")
    s = m.select("la", "lb", "na", "nb", "p", "t",
                 F.sum("ca").over(w).alias("cuma"),
                 F.sum("cb").over(w).alias("cumb"),
                 F.lead("t").over(wl).alias("nt"))
    # Per-term |nb*cuma - na*cumb| * gap stays < 2^63 (bound: 2*na*nb*
    # max_gap ~ 4e16 at sf0.1); the SUM rides decimal(38,0).
    term = (F.abs(F.col("nb") * F.col("cuma") - F.col("na") * F.col("cumb"))
            * (F.col("nt") - F.col("t"))).cast("decimal(38,0)")
    return (s.filter(F.col("nt").isNotNull())
            .groupBy("la", "lb", "na", "nb")
            .agg(F.sum(term).alias("tot"))
            .select(F.col("la").alias("label_a"),
                    F.col("lb").alias("label_b"),
                    F.col("na").cast("long").alias("n_a"),
                    F.col("nb").cast("long").alias("n_b"),
                    F.round(F.col("tot").cast("double")
                            / (_K * F.col("na") * F.col("nb"))
                            / F.lit(1e6), 6).alias("sliced_w1"))
            .orderBy("label_a", "label_b"))
