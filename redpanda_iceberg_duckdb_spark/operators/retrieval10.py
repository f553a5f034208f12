"""Recall/MRR vs nprobe — the IVF quality/cost dial EVALUATED as data
(round-9 verdict item 8): ann_ivf_multiprobe (similarity.py) shipped the
nprobe=2 mechanism in round 5, but its retrieval quality was never
graded. This query runs the same probe-selection machinery at
nprobe ∈ {1, 2, 4} and reports recall@10 and MRR@10 against the exact
nearest neighbor for each setting — the measured trade-off a 100 TB
vector-search deployment tunes.

Scale stance: the centroid table is O(cells × dims) and broadcasts;
candidates join cell-bucketed (an equi-join on the cell id, delta side =
the fixed probe set, broadcast) and the THREE nprobe levels share ONE
candidate scan — each candidate row carries its cell's probe rank, and
level np just filters cell_rn <= np before the per-(level, query) top-10
window. Reciprocal ranks ride as exact 2520/rank integers (retrieval9
discipline) so every aggregate is order-independent; probe selection uses
exact scaled-integer centroid distances, so the candidate sets are
bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table
from .similarity import (_NORMS_DUCK, _SCALE, _bcast_query_dots, _norms,
                         _ranked_topk, _sims_from_dots, dot_int64)

_NPROBES = (1, 2, 4)
_RR_LCM = 2520  # lcm(1..10): 2520/rank is an exact integer


def _oracle() -> str:
    return f"""
WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
           WHERE vec_id % 20 = 0 AND vec_id < 6400),
{_NORMS_DUCK},
pairs_x AS (SELECT qid, vec_id cid, qe, embedding ce
            FROM q, embeddings WHERE vec_id <> qid),
dots_x AS (SELECT qid, cid,
                  cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                      * {_SCALE}) AS bigint)) AS double) AS dot
           FROM (SELECT qid, cid, unnest(qe) x, unnest(ce) y FROM pairs_x)
           GROUP BY qid, cid),
exact1 AS (SELECT qid, cid AS tcid FROM
             (SELECT d.qid, d.cid,
                     row_number() OVER (PARTITION BY d.qid
                       ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                                d.cid) rank
              FROM dots_x d JOIN norms nq ON nq.vec_id = d.qid
                            JOIN norms nc ON nc.vec_id = d.cid)
           WHERE rank = 1),
cs AS (
  SELECT label, k,
         sum(cast(floor(cast(x as double) * 1e4) as bigint)) AS s,
         count(*) AS n
  FROM (SELECT label, unnest(embedding) x,
               generate_subscripts(embedding, 1) k FROM embeddings)
  GROUP BY label, k),
qd AS (SELECT qid, k, cast(floor(cast(x as double) * 1e4) as bigint) AS qv
       FROM (SELECT vec_id qid, unnest(embedding) x,
                    generate_subscripts(embedding, 1) k
             FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 6400)),
dist AS (SELECT qid, label,
                cast(sum(cast(qv * n - s as hugeint) * (qv * n - s))
                     as double) / (cast(n as double) * n) AS dist
         FROM qd JOIN cs USING (k) GROUP BY qid, label, n),
probe AS (SELECT qid, label, rn AS cell_rn FROM
            (SELECT qid, label,
                    row_number() OVER (PARTITION BY qid
                                       ORDER BY dist, label) rn
             FROM dist) WHERE rn <= {max(_NPROBES)}),
pairs AS (SELECT q.qid, e.vec_id cid, p.cell_rn, q.qe, e.embedding ce
          FROM q JOIN probe p ON p.qid = q.qid
               JOIN embeddings e ON e.label = p.label AND e.vec_id <> q.qid),
dots AS (SELECT qid, cid, cell_rn,
                cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                    * {_SCALE}) AS bigint)) AS double) AS dot
         FROM (SELECT qid, cid, cell_rn, unnest(qe) x, unnest(ce) y
               FROM pairs)
         GROUP BY qid, cid, cell_rn),
sims AS (SELECT qid, cid, cell_rn,
                round(dot / (nq.nrm * nc.nrm), 6) AS sim
         FROM dots JOIN norms nq ON nq.vec_id = qid
                   JOIN norms nc ON nc.vec_id = cid),
lv(np) AS (VALUES {", ".join(f"({p})" for p in _NPROBES)}),
ranked AS (SELECT lv.np, qid, cid,
                  row_number() OVER (PARTITION BY lv.np, qid
                                     ORDER BY sim DESC, cid) rank
           FROM sims JOIN lv ON sims.cell_rn <= lv.np),
top10 AS (SELECT * FROM ranked WHERE rank <= 10),
rr AS (SELECT lv.np, q.qid, coalesce({_RR_LCM} // t.rank, 0) AS rr_scaled
       FROM q CROSS JOIN lv
            JOIN exact1 x ON x.qid = q.qid
            LEFT JOIN top10 t ON t.np = lv.np AND t.qid = q.qid
                             AND t.cid = x.tcid)
SELECT cast(np AS bigint) AS nprobe,
       cast(count(*) AS bigint) AS n_queries,
       cast(sum(CASE WHEN rr_scaled > 0 THEN 1 ELSE 0 END) AS bigint)
         AS n_hits_top10,
       round(cast(sum(CASE WHEN rr_scaled > 0 THEN 1 ELSE 0 END) AS double)
             / count(*), 6) AS recall_at_10,
       round(cast(sum(rr_scaled) AS double) / {_RR_LCM} / count(*), 6)
         AS mrr_at_10
FROM rr GROUP BY np ORDER BY nprobe"""


@register(
    "ann_recall_mrr_by_nprobe",
    oracle=_oracle(),
    tags=("similarity", "ann", "evaluation", "scale-pattern"),
)
def ann_recall_mrr_by_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nprobe, n_queries, n_hits_top10, recall_at_10, mrr_at_10) for
    nprobe ∈ {1, 2, 4}: the IVF probe dial graded against the exact
    nearest neighbor, three levels from one shared candidate scan
    (module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = (emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 6400))
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qe")))
    cand = emb.select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("ce"))
    exact1 = (_ranked_topk(
        _sims_from_dots(_bcast_query_dots(q, cand), norms), 1)
        .select("qid", F.col("cid").alias("tcid")))

    # Probe ranking: exact scaled-integer centroid distances (the
    # ann_ivf_multiprobe machinery, similarity.py:243-285), kept to rank 4.
    cs = (emb.select("label", F.posexplode("embedding").alias("k", "x"))
          .groupBy("label", "k")
          .agg(F.sum(F.floor(F.col("x").cast("double") * 1e4).cast("long"))
               .alias("s"),
               F.count(F.lit(1)).alias("n")))
    cent = (cs.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("k", "s"))).alias("ks"),
                 F.max("n").alias("n"))
            .select("label",
                    F.expr("transform(ks, t -> t.s)").alias("s_arr"), "n"))
    term = ("cast(cast(floor(cast(x as double) * 1e4) as bigint) * n - s "
            "as decimal(19,0))")
    dist = (q.crossJoin(F.broadcast(cent))
            .select("qid", "label", F.expr(
                f"cast(aggregate(zip_with(qe, s_arr, (x, s) -> "
                f"{term} * {term}), cast(0 as decimal(38,0)), "
                "(acc, v) -> acc + v) as double) "
                "/ (cast(n as double) * n)").alias("dist")))
    probe = (dist.withColumn("cell_rn", F.row_number().over(
                W.partitionBy("qid").orderBy("dist", "label")))
             .filter(F.col("cell_rn") <= max(_NPROBES))
             .select("qid", "label", "cell_rn"))

    pairs = (emb.select(F.col("vec_id").alias("cid"), "label",
                        F.col("embedding").alias("ce"))
             .join(F.broadcast(q.join(probe, "qid")), "label")
             .filter(F.col("cid") != F.col("qid")))
    dots = pairs.select("qid", "cid", "cell_rn",
                        dot_int64("qe", "ce").cast("double").alias("dot"))
    sims = (dots
            .join(F.broadcast(norms.select(F.col("vec_id").alias("qid"),
                                           F.col("nrm").alias("qn"))), "qid")
            .join(norms.select(F.col("vec_id").alias("cid"),
                               F.col("nrm").alias("cn")), "cid")
            .select("qid", "cid", "cell_rn",
                    F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6)
                    .alias("sim")))
    lv = spark.createDataFrame([(p,) for p in _NPROBES], "np int")
    ranked = (sims.join(F.broadcast(lv), F.col("cell_rn") <= F.col("np"))
              .withColumn("rank", F.row_number().over(
                  W.partitionBy("np", "qid")
                  .orderBy(F.desc("sim"), F.asc("cid")))))
    top10 = ranked.filter(F.col("rank") <= 10)
    rr = (q.select("qid").crossJoin(F.broadcast(lv))
          .join(exact1, "qid")
          .join(top10.select(F.col("np").alias("tnp"),
                             F.col("qid").alias("tqid"),
                             F.col("cid").alias("tcid2"), "rank"),
                (F.col("np") == F.col("tnp"))
                & (F.col("qid") == F.col("tqid"))
                & (F.col("tcid") == F.col("tcid2")), "left")
          .select("np", "qid", F.coalesce(
              F.expr(f"cast({_RR_LCM} div rank as bigint)"), F.lit(0))
              .alias("rr_scaled")))
    hit = F.sum(F.when(F.col("rr_scaled") > 0, 1).otherwise(0))
    return (rr.groupBy(F.col("np").cast("long").alias("nprobe"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_queries"),
                 hit.cast("bigint").alias("n_hits_top10"),
                 F.round(hit.cast("double") / F.count(F.lit(1)), 6)
                 .alias("recall_at_10"),
                 F.round(F.sum("rr_scaled").cast("double") / _RR_LCM
                         / F.count(F.lit(1)), 6).alias("mrr_at_10"))
            .orderBy("nprobe"))
