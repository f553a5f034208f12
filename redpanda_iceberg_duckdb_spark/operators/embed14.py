"""Embedding-engineering operators, round 14: Matryoshka truncation
recall, linear-kernel MMD between label distributions, and exact
sufficient-statistics medoid selection.

Why these: a 100 TB embedding pipeline constantly asks (a) how many
dimensions it can afford to keep (Matryoshka / MRL truncation — store the
64-dim prefix, search the 16-dim one), (b) whether two slices of the
corpus drifted apart in embedding space (MMD), and (c) which member best
represents a duplicate cluster (medoid — the row you KEEP after
near-dedup). All three ride exact integer lattices so the DuckDB oracle
matches bit-for-bit:

- Truncation recall uses the similarity module's floor(x*y*1e12) element
  lattice; a d-prefix dot is the PREFIX SUM of the same element products,
  so one pass computes every cut.
- MMD^2 with the linear kernel reduces to ||mu_a - mu_b||^2. On per-dim
  int sums s = sum(floor(x*1e6)) the per-dim term is the exact rational
  (s_a*n_b - s_b*n_a)^2 / (n_a*n_b)^2 — numerators are summed as
  DECIMAL(38,0) (order-free, exact; fits to ~1e5 rows/label at this
  quantization), with ONE double division at the end.
- Medoids: quantize each vector ONCE to q = floor(x*1e6); then
  sum_y ||q_x - q_y||^2 = n*||q_x||^2 + sum_y ||q_y||^2 - 2<q_x, S>
  with S the per-label dim-sum vector — exact integer arithmetic, O(n*dims)
  total, NO pairwise work (int64-safe to ~1.4e5 vectors per label at this
  quantization; the overflow bound is the same discipline as pq_train).

Scale stance (100 TB): truncation recall is the brute-force-baseline
family (fixed broadcast query set — the honest exact measurement, run on
a sample); MMD and medoids are single-aggregation-pass shapes whose
shuffles are keyed by (label, dim) — they scale to any corpus that can
be scanned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

_CUTS = (8, 16, 32, 64)
_QMOD = 50          # query subset: vec_id % _QMOD == 0


def _bcast_prefix_dots(q: DataFrame, cand: DataFrame) -> DataFrame:
    """(qid, cid, d, dot): scaled-int prefix dots at every cut — the
    prefix-sum generalization of similarity._bcast_query_dots (r16,
    verdict item 3: this was the one surviving pair-expanding shape after
    the r15 batch-9 conversion, because it needs per-prefix dots).

    The query block is collected once (same bounded-block convention —
    the old shape BROADCAST the identical block into a
    BroadcastNestedLoopJoin, so the driver/executor footprint is
    unchanged) and rides a cached broadcast variable into ONE mapInPandas
    over the candidate scan: each candidate embedding crosses the Python
    boundary exactly once instead of |Q| times, and the pair join leaves
    the plan. Per batch and query j: el = floor(cm * qm[j] * 1e12) int64,
    prefix-summed along dims — elementwise IEEE multiply is commutative,
    so el (and hence every cut's cumsum) is bit-identical to the retired
    pair form's floor(qe * ce * 1e12). Self-pairs are masked per query
    slice before materializing (one |batch|-row frame per (query, cut) —
    the _bcast_query_dots memory discipline). Build-time side effect:
    the q.collect() job runs at DataFrame-construction time (see
    similarity._bcast_query_dots docstring)."""
    from .similarity import _query_block_broadcast

    spark = cand.sparkSession
    qrows = q.select("qid", "qe").collect()
    qids = [int(r["qid"]) for r in qrows]
    qvecs = [list(r["qe"]) for r in qrows]
    bc = _query_block_broadcast(spark, qids, qvecs)

    def compute(batches):
        qid_arr = np.array(bc.value[0], dtype=np.int64)
        qm = np.array(bc.value[1], dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0 or len(qid_arr) == 0:
                continue
            cm = np.array(list(pdf["ce"]), dtype=np.float64)
            cids = pdf["cid"].to_numpy()
            for j in range(len(qid_arr)):
                el = np.floor(cm * qm[j] * 1e12).astype(np.int64)
                cums = el.cumsum(axis=1)
                mask = cids != qid_arr[j]
                n = int(mask.sum())
                for d in _CUTS:
                    yield pd.DataFrame({
                        "qid": np.full(n, qid_arr[j], dtype=np.int64),
                        "cid": cids[mask],
                        "d": np.full(n, d, dtype=np.int32),
                        "dot": cums[mask, d - 1].astype(np.float64)})

    return cand.select("cid", "ce").mapInPandas(
        compute, schema="qid long, cid long, d int, dot double")


def _prefix_norms(emb: DataFrame) -> DataFrame:
    """(vec_id, d, nrm): prefix self-dot norms at every cut."""

    def compute(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            el = np.floor(m * m * 1e12).astype(np.int64)
            cums = el.cumsum(axis=1)
            frames = []
            for d in _CUTS:
                frames.append(pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "d": np.full(len(pdf), d, dtype=np.int32),
                    "nrm": np.sqrt(cums[:, d - 1].astype(np.float64))}))
            yield pd.concat(frames)

    return emb.select("vec_id", "embedding").mapInPandas(
        compute, schema="vec_id long, d int, nrm double")


_CUTS_SQL = ",".join(f"({d})" for d in _CUTS)

_MRL_ORACLE = f"""
WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
           WHERE vec_id % {_QMOD} = 0),
pairs AS (SELECT qid, vec_id cid, qe, embedding ce
          FROM q, embeddings WHERE vec_id <> qid),
el AS (SELECT qid, cid, generate_subscripts(qe, 1) AS i,
              unnest(qe) AS x, unnest(ce) AS y
       FROM pairs),
dots AS (SELECT qid, cid, d.d,
                cast(sum(CASE WHEN i <= d.d THEN
                     cast(floor(cast(x AS double) * cast(y AS double) * 1e12)
                          AS bigint) ELSE 0 END) AS double) AS dot
         FROM el CROSS JOIN (VALUES {_CUTS_SQL}) d(d)
         GROUP BY qid, cid, d.d),
ne AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              unnest(embedding) AS x
       FROM embeddings),
norms AS (SELECT vec_id, d.d,
                 sqrt(cast(sum(CASE WHEN i <= d.d THEN
                      cast(floor(cast(x AS double) * cast(x AS double) * 1e12)
                           AS bigint) ELSE 0 END) AS double)) AS nrm
          FROM ne CROSS JOIN (VALUES {_CUTS_SQL}) d(d)
          GROUP BY vec_id, d.d),
sims AS (SELECT p.qid, p.cid, p.d,
                round(p.dot / (nq.nrm * nc.nrm), 6) AS sim
         FROM dots p JOIN norms nq ON nq.vec_id = p.qid AND nq.d = p.d
                     JOIN norms nc ON nc.vec_id = p.cid AND nc.d = p.d),
t1 AS (SELECT d, qid, cid FROM
         (SELECT d, qid, cid,
                 row_number() OVER (PARTITION BY d, qid
                                    ORDER BY sim DESC, cid) rn
          FROM sims)
       WHERE rn = 1),
full1 AS (SELECT qid, cid AS fcid FROM t1 WHERE d = {max(_CUTS)})
SELECT t1.d AS dims, cast(count(*) AS bigint) AS n_queries,
       cast(sum(CASE WHEN t1.cid = f.fcid THEN 1 ELSE 0 END) AS bigint)
         AS n_top1_match,
       round(cast(sum(CASE WHEN t1.cid = f.fcid THEN 1 ELSE 0 END)
                  AS double) / count(*), 6) AS recall_at1
FROM t1 JOIN full1 f USING (qid)
GROUP BY t1.d ORDER BY dims"""


@register(
    "matryoshka_recall_curve",
    oracle=_MRL_ORACLE,
    tags=("similarity", "ann", "truncation", "evaluation", "pandas_udf"),
)
def matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@1 of dimension-truncated cosine search vs full-dimension
    exact top-1, per prefix length d in (8, 16, 32, 64) — the measurement
    behind 'can we search the 16-dim Matryoshka prefix?'. One numpy pass
    computes every cut (prefix sums of the same element lattice)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") % _QMOD == 0)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")))
    c = emb.select(F.col("vec_id").alias("cid"),
                   F.col("embedding").alias("ce"))
    # r16 (verdict item 3): the pair-expanding BroadcastNestedLoopJoin
    # (both embeddings shipped through Arrow per (q, c) pair) is gone —
    # the query block rides a broadcast variable into one mapInPandas
    # over the candidate scan (_bcast_prefix_dots docstring).
    dots = _bcast_prefix_dots(q, c)
    norms = _prefix_norms(emb)
    qn = F.broadcast(norms.select(F.col("vec_id").alias("qid"),
                                  F.col("d"), F.col("nrm").alias("qn"))
                     .join(F.broadcast(q.select("qid")), "qid"))
    cn = norms.select(F.col("vec_id").alias("cid"), F.col("d"),
                      F.col("nrm").alias("cn"))
    sims = (dots.join(qn, ["qid", "d"]).join(cn, ["cid", "d"])
            .select("qid", "cid", "d",
                    F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6)
                    .alias("sim")))
    w = W.partitionBy("d", "qid").orderBy(F.desc("sim"), "cid")
    t1 = (sims.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") == 1).select("d", "qid", "cid"))
    full1 = (t1.filter(F.col("d") == max(_CUTS))
             .select("qid", F.col("cid").alias("fcid")))
    hit = F.when(F.col("cid") == F.col("fcid"), 1).otherwise(0)
    return (t1.join(F.broadcast(full1), "qid")
            .groupBy(F.col("d").cast("int").alias("dims"))
            .agg(F.count(F.lit(1)).alias("n_queries"),
                 F.sum(hit).cast("long").alias("n_top1_match"),
                 F.round(F.sum(hit).cast("double")
                         / F.count(F.lit(1)), 6).alias("recall_at1"))
            .orderBy("dims"))


_Q6 = "cast(floor(cast(x AS double) * 1e6) AS bigint)"

_MMD_ORACLE = f"""
WITH e AS (SELECT vec_id, label, i, {_Q6} AS q
           FROM (SELECT vec_id, label,
                        generate_subscripts(embedding, 1) AS i,
                        unnest(embedding) AS x
                 FROM embeddings)),
sums AS (SELECT label, i, cast(sum(q) AS bigint) AS s FROM e
         GROUP BY label, i),
cnt AS (SELECT label, cast(count(*) AS bigint) AS n FROM embeddings
        GROUP BY label),
num AS (SELECT a.label AS label_a, b.label AS label_b,
               sum(cast((a.s * cb.n - b.s * ca.n)
                        * (a.s * cb.n - b.s * ca.n)
                        AS decimal(38, 0))) AS sq,
               min(ca.n) AS na, min(cb.n) AS nb
        FROM sums a JOIN sums b ON a.i = b.i AND a.label < b.label
             JOIN cnt ca ON ca.label = a.label
             JOIN cnt cb ON cb.label = b.label
        GROUP BY a.label, b.label)
SELECT label_a, label_b,
       round(cast(sq AS double)
             / (cast(na AS double) * na * nb * nb) / 1e12, 6) AS mmd2
FROM num ORDER BY label_a, label_b"""


@register(
    "mmd_linear_label_pairs",
    oracle=_MMD_ORACLE,
    tags=("similarity", "drift", "statistics"),
)
def mmd_linear_label_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel MMD^2 = ||mu_a - mu_b||^2 between every label pair's
    embedding distribution — the one-pass drift test between corpus
    slices (module docstring has the exact-rational formulation). The /1e12
    unscales the 1e6 per-component quantization."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("i", "x"))
    sums = (ex.groupBy("label", "i")
            .agg(F.sum(F.expr("cast(floor(cast(x as double) * 1e6) "
                              "as bigint)")).alias("s")))
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    a = sums.select(F.col("label").alias("label_a"), "i",
                    F.col("s").alias("sa"))
    b = sums.select(F.col("label").alias("label_b"), F.col("i"),
                    F.col("s").alias("sb"))
    ca = F.broadcast(cnt.select(F.col("label").alias("label_a"),
                                F.col("n").alias("na")))
    cb = F.broadcast(cnt.select(F.col("label").alias("label_b"),
                                F.col("n").alias("nb")))
    diff = F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")
    num = (a.join(b, (a.i == b.i) & (F.col("label_a") < F.col("label_b")))
           .join(ca, "label_a").join(cb, "label_b")
           .groupBy("label_a", "label_b")
           .agg(F.sum((diff * diff).cast("decimal(38,0)")).alias("sq"),
                F.min("na").alias("na"), F.min("nb").alias("nb")))
    return (num.select(
        "label_a", "label_b",
        F.round(F.col("sq").cast("double")
                / (F.col("na").cast("double") * F.col("na")
                   * F.col("nb") * F.col("nb")) / 1e12, 6).alias("mmd2"))
        .orderBy("label_a", "label_b"))


_MEDOID_ORACLE = f"""
WITH e AS (SELECT vec_id, label, i, {_Q6} AS q
           FROM (SELECT vec_id, label,
                        generate_subscripts(embedding, 1) AS i,
                        unnest(embedding) AS x
                 FROM embeddings)),
vn AS (SELECT vec_id, label, cast(sum(q * q) AS bigint) AS sq FROM e
       GROUP BY vec_id, label),
ls AS (SELECT label, i, cast(sum(q) AS bigint) AS s FROM e
       GROUP BY label, i),
lt AS (SELECT label, cast(sum(sq) AS bigint) AS t,
              cast(count(*) AS bigint) AS n
       FROM vn GROUP BY label),
cross_d AS (SELECT e.vec_id, e.label, cast(sum(e.q * ls.s) AS bigint) AS xs
            FROM e JOIN ls ON ls.label = e.label AND ls.i = e.i
            GROUP BY e.vec_id, e.label),
score AS (SELECT vn.vec_id, vn.label,
                 lt.n * vn.sq + lt.t - 2 * cross_d.xs AS ssd
          FROM vn JOIN cross_d ON cross_d.vec_id = vn.vec_id
               JOIN lt ON lt.label = vn.label)
SELECT label, vec_id AS medoid_vec_id, cast(ssd AS bigint) AS medoid_ssd
FROM (SELECT label, vec_id, ssd,
             row_number() OVER (PARTITION BY label
                                ORDER BY ssd, vec_id) AS rn
      FROM score)
WHERE rn = 1 ORDER BY label"""


@register(
    "cluster_medoids",
    oracle=_MEDOID_ORACLE,
    tags=("similarity", "dedup", "clustering"),
)
def cluster_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label medoid (the vector minimizing total squared distance to
    its cell — the representative you KEEP after near-dedup), via the
    sufficient-statistics identity in the module docstring: O(n*dims),
    exact int64, no pairwise join. Tie -> smallest vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label",
                   F.posexplode("embedding").alias("i", "x")) \
        .withColumn("q", F.expr("cast(floor(cast(x as double) * 1e6) "
                                "as bigint)"))
    vn = (e.groupBy("vec_id", "label")
          .agg(F.sum(F.col("q") * F.col("q")).alias("sq")))
    ls = e.groupBy("label", "i").agg(F.sum("q").alias("s"))
    lt = F.broadcast(vn.groupBy("label")
                     .agg(F.sum("sq").alias("t"),
                          F.count(F.lit(1)).alias("n")))
    cross_d = (e.join(ls, ["label", "i"])
               .groupBy("vec_id", "label")
               .agg(F.sum(F.col("q") * F.col("s")).alias("xs")))
    score = (vn.join(cross_d, ["vec_id", "label"]).join(lt, "label")
             .select("label", "vec_id",
                     (F.col("n") * F.col("sq") + F.col("t")
                      - 2 * F.col("xs")).alias("ssd")))
    w = W.partitionBy("label").orderBy("ssd", "vec_id")
    return (score.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("label", F.col("vec_id").alias("medoid_vec_id"),
                    F.col("ssd").cast("long").alias("medoid_ssd"))
            .orderBy("label"))
