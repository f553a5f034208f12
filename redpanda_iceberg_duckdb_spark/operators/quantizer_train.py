"""K-means quantizer TRAINING to convergence + the retrained-index recall
audit — the end-to-end "train coarse quantizer -> measure ANN recall" loop
a real vector pipeline runs offline (round-7 verdict item 7; the single
Lloyd step it extends is quantizer.py:kmeans_lloyd_step).

Determinism: each iteration reuses the exact scaled-integer centroid
distance from quantizer.py — dist(q, cell) compares
Σ_k (floor(q_k·1e4)·n − S_k)² with S_k the cell's scaled coordinate sum —
so assignment trajectories are bit-identical cross-engine, and BOTH the
final assignment and the NUMBER OF ROUNDS to convergence are checkable
facts: the DuckDB oracle is a self-terminating recursive CTE running the
same recurrence until zero vectors move (measured: 13 rounds at
sf0.001/sf0.01, 30 at sf0.1).

Scale stance (100 TB):
- Per round: centroid table is cells × dims (KBs) built by ONE aggregate
  over the current assignment, broadcast back; reassignment is map-side
  against the broadcast centroids; the convergence signal is ONE scalar
  (count moved) to the driver. This is Spark MLlib's k-means iteration
  shape (broadcast centers + aggregate), expressed relationally so DuckDB
  can replay it.
- Loop discipline: previous assignment unpersisted once its successor
  materializes; localCheckpoint every 5 rounds truncates lineage
  (clusters.py / graphrank.py discipline).
- The recall audit's exact side is O(|Q|·N) over the fixed 1% probe set
  (broadcast queries, Arrow-batched numpy dots — similarity.py's
  machinery); the IVF side probes only the RETRAINED cell, so the audit
  measures exactly what retraining bought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..dataset_cache import data_fingerprint
from ..tables import load_table
from .similarity import (_NORMS_DUCK, _SCALE, _norms, _numpy_pair_dots,
                         _ranked_topk, _sims_from_dots, dot_int64)

_MAX_ROUNDS = 100

# Self-terminating recursive assignment: rows (vec_id, lbl, old_lbl, t,
# moved) where moved = total movers in round t (window-summed, identical on
# every row). The recursive term reads only rows with moved > 0, so the
# round after zero movers produces nothing and recursion halts; `fin` is
# the converged assignment, max(t) the round count.
_ASSIGN_CTE = """
qd AS (SELECT vec_id, k, cast(floor(cast(x AS double) * 1e4) AS bigint) qv
       FROM (SELECT vec_id, unnest(embedding) x,
                    generate_subscripts(embedding, 1) k FROM embeddings)),
it AS (
  SELECT vec_id, label AS lbl, cast(NULL AS integer) AS old_lbl,
         0 AS t, 1 AS moved
  FROM embeddings
  UNION ALL
  SELECT a.vec_id, a.lbl, a.old_lbl, a.t,
         sum(CASE WHEN a.lbl <> a.old_lbl THEN 1 ELSE 0 END) OVER () AS moved
  FROM (
    SELECT r.vec_id, r.lbl, w2.lbl AS old_lbl, w2.t + 1 AS t
    FROM (SELECT d.vec_id, d.lbl,
                 row_number() OVER (PARTITION BY d.vec_id
                                    ORDER BY d.d, d.lbl) rn
          FROM (SELECT qd.vec_id, cs.lbl,
                       cast(sum(cast(qd.qv * cs.n - cs.s AS hugeint)
                                * (qd.qv * cs.n - cs.s)) AS double)
                         / (cast(cs.n AS double) * cs.n) AS d
                FROM qd
                JOIN (SELECT w.lbl, qd2.k, sum(qd2.qv) s, count(*) n
                      FROM (SELECT vec_id, lbl FROM it WHERE moved > 0) w
                      JOIN qd qd2 ON qd2.vec_id = w.vec_id
                      GROUP BY w.lbl, qd2.k) cs
                  ON cs.k = qd.k
                GROUP BY qd.vec_id, cs.lbl, cs.n) d) r
    JOIN (SELECT vec_id, lbl, t FROM it WHERE moved > 0) w2
      ON w2.vec_id = r.vec_id
    WHERE r.rn = 1) a),
fin AS (SELECT vec_id, lbl FROM it WHERE t = (SELECT max(t) FROM it))"""


# (applicationId, sf_dir) -> (checkpointed assignment, round count).
# ann_recall_retrained re-runs the SAME converged training that
# kmeans_train_converged just executed (13-30 driver-synchronized rounds);
# in the driver's sequential correctness run that doubled the most
# expensive iterative job in the batch (round-8 advice). The cached
# assignment is a localCheckpoint (lineage-free, ~6k tiny rows) whose
# blocks stay valid for the life of the Spark application — keying on
# applicationId drops entries from dead sessions.
_TRAIN_CACHE: dict[tuple[str, str], tuple[DataFrame, int]] = {}


def train_assignments(spark: SparkSession, sf_dir: str
                      ) -> tuple[DataFrame, int]:
    """Lloyd iterations from the shipped ``label`` column until zero
    vectors move. Returns (final (vec_id, lbl) assignment — persisted via
    localCheckpoint, lineage-free — and the round count). Memoized per
    (application, sf_dir): see _TRAIN_CACHE."""
    # Data fingerprint in the key: a rewrite of embeddings.parquet within
    # one application must miss the cache, not serve stale assignments
    # (round-9 advice; same fix as graphrank._EDGE_CACHE).
    key = (spark.sparkContext.applicationId,
           data_fingerprint(sf_dir, "embeddings") or sf_dir)
    if key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding")
           .localCheckpoint(eager=False))  # scanned every round
    cur = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("label").alias("lbl"))
           .persist())
    term = ("cast(cast(floor(cast(x as double) * 1e4) as bigint) * n - s "
            "as decimal(19,0))")
    n_rounds = 0
    for i in range(_MAX_ROUNDS):
        j = emb.join(cur, "vec_id")
        cs = (j.select("lbl", F.posexplode("embedding").alias("k", "x"))
              .groupBy("lbl", "k")
              .agg(F.sum(F.floor(F.col("x").cast("double") * 1e4)
                         .cast("long")).alias("s"),
                   F.count(F.lit(1)).alias("n")))
        cent = (cs.groupBy("lbl")
                .agg(F.array_sort(F.collect_list(F.struct("k", "s")))
                      .alias("ks"),
                     F.max("n").alias("n"))
                .select("lbl", F.expr("transform(ks, t -> t.s)")
                        .alias("s_arr"), "n"))
        dist = (emb.withColumnRenamed("embedding", "x_arr")
                .crossJoin(F.broadcast(cent))
                .select("vec_id", "lbl", F.expr(
                    f"cast(aggregate(zip_with(x_arr, s_arr, (x, s) -> "
                    f"{term} * {term}), cast(0 as decimal(38,0)), "
                    "(acc, v) -> acc + v) as double) "
                    "/ (cast(n as double) * n)").alias("d")))
        nxt = (dist.withColumn("rn", F.row_number().over(
                   W.partitionBy("vec_id").orderBy("d", "lbl")))
               .filter(F.col("rn") == 1).select("vec_id", "lbl"))
        if (i + 1) % 5 == 0:
            nxt = nxt.localCheckpoint(eager=False)
        nxt = nxt.persist()
        moved = (nxt.join(cur.withColumnRenamed("lbl", "old_lbl"), "vec_id")
                 .filter(F.col("lbl") != F.col("old_lbl")).count())
        cur.unpersist()
        cur = nxt
        n_rounds = i + 1
        if moved == 0:
            break
    else:
        cur.unpersist()
        raise RuntimeError(
            f"kmeans training: no convergence in {_MAX_ROUNDS} rounds — "
            "a tie-cycle; production would stop on a moved-count plateau")
    fin = cur.localCheckpoint(eager=True)
    cur.unpersist()
    _TRAIN_CACHE.clear()   # at most one live entry — bounded memory
    _TRAIN_CACHE[key] = (fin, n_rounds)
    return fin, n_rounds


@register(
    "kmeans_train_converged",
    oracle=f"""
WITH RECURSIVE {_ASSIGN_CTE}
SELECT f.lbl AS label,
       cast(count(DISTINCT f.vec_id) AS bigint) AS n_vecs,
       cast(sum(q.qv) AS bigint) AS coord_sum_scaled,
       cast((SELECT max(t) FROM it) AS bigint) AS n_rounds
FROM fin f JOIN qd q ON q.vec_id = f.vec_id
GROUP BY f.lbl ORDER BY f.lbl""",
    tags=("similarity", "clustering", "iterative", "convergence"),
)
def kmeans_train_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-means training run: Lloyd iterations from the shipped cell
    assignment until zero vectors move, reported as the final per-cell
    summary (size, scaled coordinate checksum) plus the CONVERGENCE ROUND
    COUNT — which the self-terminating recursive oracle independently
    discovers, so a green row proves Spark stopped at exactly the right
    iteration, not just that some stable clustering exists."""
    fin, n_rounds = train_assignments(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = (emb.select("vec_id", F.explode("embedding").alias("x"))
          .select("vec_id", F.floor(F.col("x").cast("double") * 1e4)
                  .cast("long").alias("qv")))
    return (fin.join(qv, "vec_id")
            .groupBy("lbl")
            .agg(F.countDistinct("vec_id").alias("n_vecs"),
                 F.sum("qv").alias("coord_sum_scaled"))
            .select(F.col("lbl").alias("label"), "n_vecs",
                    "coord_sum_scaled",
                    F.lit(n_rounds).cast("bigint").alias("n_rounds"))
            .orderBy("label"))


@register(
    "ann_recall_retrained",
    oracle=f"""
WITH RECURSIVE {_ASSIGN_CTE},
q AS (SELECT e.vec_id qid, f.lbl qlabel, e.embedding qe
      FROM embeddings e JOIN fin f ON f.vec_id = e.vec_id
      WHERE e.vec_id % 100 = 0 AND e.vec_id < 6400),
{_NORMS_DUCK},
pairs_x AS (SELECT qid, vec_id cid, qe, embedding ce
            FROM q, embeddings WHERE vec_id <> qid),
dots_x AS (SELECT qid, cid,
                  cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                      * {_SCALE}) AS bigint)) AS double) AS dot
           FROM (SELECT qid, cid, unnest(qe) x, unnest(ce) y FROM pairs_x)
           GROUP BY qid, cid),
exact5 AS (SELECT qid, cid FROM
             (SELECT d.qid, d.cid,
                     row_number() OVER (PARTITION BY d.qid
                       ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                                d.cid) rank
              FROM dots_x d JOIN norms nq ON nq.vec_id = d.qid
                            JOIN norms nc ON nc.vec_id = d.cid)
           WHERE rank <= 5),
pairs_i AS (SELECT qid, e.vec_id cid, qe, e.embedding ce
            FROM q JOIN fin fc ON fc.lbl = q.qlabel
                 JOIN embeddings e ON e.vec_id = fc.vec_id
            WHERE e.vec_id <> q.qid),
dots_i AS (SELECT qid, cid,
                  cast(sum(cast(floor(cast(x AS double) * cast(y AS double)
                                      * {_SCALE}) AS bigint)) AS double) AS dot
           FROM (SELECT qid, cid, unnest(qe) x, unnest(ce) y FROM pairs_i)
           GROUP BY qid, cid),
ivf5 AS (SELECT qid, cid FROM
           (SELECT d.qid, d.cid,
                   row_number() OVER (PARTITION BY d.qid
                     ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                              d.cid) rank
            FROM dots_i d JOIN norms nq ON nq.vec_id = d.qid
                          JOIN norms nc ON nc.vec_id = d.cid)
         WHERE rank <= 5),
hits AS (SELECT i.qid, count(*) AS n_hits
         FROM ivf5 i JOIN exact5 x ON x.qid = i.qid AND x.cid = i.cid
         GROUP BY i.qid)
SELECT q.qid, cast(coalesce(h.n_hits, 0) AS bigint) AS n_hits,
       round(coalesce(h.n_hits, 0) / 5.0, 6) AS recall_at_5
FROM q LEFT JOIN hits h ON h.qid = q.qid
ORDER BY q.qid""",
    tags=("similarity", "ann", "evaluation", "iterative"),
)
def ann_recall_retrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of IVF nprobe=1 probing the RETRAINED cells (converged
    k-means above) against exact brute-force ground truth — the
    measurement that tells a pipeline whether quantizer retraining
    actually improved the index before swapping it in. Same evaluation
    contract as ann_ivf_recall_at_k (similarity.py), cells swapped."""
    fin, _ = train_assignments(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    norms = _norms(emb)
    q = (emb.join(fin, "vec_id")
         .filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 6400))
         .select(F.col("vec_id").alias("qid"), F.col("lbl").alias("qlabel"),
                 F.col("embedding").alias("qe")))
    cand = emb.select(F.col("vec_id").alias("cid"),
                      F.col("embedding").alias("ce"))
    pairs_x = cand.join(F.broadcast(q), F.col("cid") != F.col("qid"))
    exact5 = (_ranked_topk(
        _sims_from_dots(_numpy_pair_dots(pairs_x), norms), 5)
        .select("qid", "cid"))
    cand_cell = (emb.join(fin, "vec_id")
                 .select(F.col("vec_id").alias("cid"), "lbl",
                         F.col("embedding").alias("ce")))
    pairs_i = cand_cell.join(
        F.broadcast(q), (F.col("lbl") == F.col("qlabel"))
        & (F.col("cid") != F.col("qid")))
    dots_i = pairs_i.select("qid", "cid",
                            dot_int64("qe", "ce").cast("double").alias("dot"))
    ivf5 = _ranked_topk(_sims_from_dots(dots_i, norms), 5).select("qid", "cid")
    hits = (ivf5.join(exact5, ["qid", "cid"])
            .groupBy("qid").agg(F.count(F.lit(1)).alias("n_hits")))
    return (q.select("qid").join(hits, "qid", "left")
            .select("qid",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.round(F.coalesce("n_hits", F.lit(0)) / 5.0, 6)
                     .alias("recall_at_5"))
            .orderBy("qid"))
