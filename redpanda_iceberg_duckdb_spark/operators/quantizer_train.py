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
- Per round: ONE job — scan, map-side argmin of each vector against the
  k centroid sufficient stats entered as literals (MLlib's broadcast-
  centers shape; cells × dims is KBs), posexplode + combinable
  groupBy(lbl, k) collecting the next round's k×dims stats. No persist,
  no join, no window, no growing lineage; the convergence signal (count
  moved) rides the same aggregate. A measured farthest-point (Gonzalez)
  re-seeding experiment INCREASED Lloyd rounds 30 -> 40 at sf0.1
  (outlier seeds), so the shipped label init stays.
- Loop discipline: only driver-held k-row stats cross rounds; the input
  is localCheckpointed once up front.
- The recall audit's exact side is O(|Q|·N) over the fixed 1% probe set
  (broadcast queries, Arrow-batched numpy dots — similarity.py's
  machinery); the IVF side probes only the RETRAINED cell, so the audit
  measures exactly what retraining bought.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..dataset_cache import data_fingerprint
from ..tables import load_table
from .similarity import (_NORMS_DUCK, _SCALE, _bcast_query_dots, _norms,
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
           .select("vec_id", "embedding",
                   F.col("label").cast("int").alias("lbl0"),
                   F.expr("transform(embedding, x -> cast(floor("
                          "cast(x as double) * 1e4) as bigint))").alias("q"))
           .localCheckpoint(eager=False))  # scanned every round
    dims = len(emb.select("embedding").head()[0])
    # One scalar up front: max |qv| over the corpus, used by the exact
    # per-round int64-overflow guard below (bounded collect: one long).
    q_max = int(emb.select(F.expr(
        "max(array_max(transform(q, x -> abs(x))))")).head()[0])

    # MLlib's Lloyd shape, exactly: ONLY the k centroid sufficient stats
    # (lbl, n, s_arr) cross rounds, carried on the DRIVER and re-entered
    # as array literals — assignments are implicit (recomputed per row
    # from the cell stats), so a round is ONE job: scan -> map (argmin of
    # the precomputed integer lattice q against the k cells) ->
    # posexplode -> combinable groupBy(lbl, k) collecting k*dims stat
    # rows. No persist, no broadcast build, no join, no growing lineage;
    # the per-round collect is bucket-cardinality bounded (k*dims ints),
    # inside the repo's bounded-collect rule.
    # d = sum((qv*n - s)^2) / n^2 per cell — the IDENTICAL recurrence the
    # oracle's recursive CTE runs; array_min over struct(d, lbl) breaks
    # ties to the smallest lbl, matching its ORDER BY d, lbl. The sum is
    # int64 whenever the exact bound sum_k (q_max*n + |s_k|)^2 < 2^63
    # (checked per round per cell in Python — always true at test SFs);
    # otherwise the SAME expression runs on decimal(38,0). Both paths
    # produce the identical exact integer, so the double division matches
    # DuckDB's hugeint->double bit-for-bit either way.
    # The hot path is an Arrow-batched mapInPandas (numpy does the
    # k×dims integer arithmetic; Spark HOFs are CodegenFallback and
    # evaluate lambda-at-a-time — measured 1.5 s/round interpreted vs
    # 0.3 s/round numpy at sf0.1); the HOF expression below is the exact
    # decimal fallback for cells past the int64 bound, and also serves
    # the final assignment materialization.
    # PLAN TRAP (measured): the HOF argmin MUST sit in its own select
    # BELOW the posexplode select — fused into one select, the analyzer
    # parks the projection ABOVE the Generate and the argmin re-evaluates
    # once per EXPLODED row (dims x), 4.7 s/round vs 0.4 s/round at
    # sf0.001. (Measured end-to-end at sf0.1: per-round broadcast-join
    # loop 58 s, round-10 posexplode+window loop 33 s, driver-literal
    # decimal + 64-col agg 79 s, this shape 12 s; a Gonzalez
    # farthest-point re-seeding experiment INCREASED Lloyd rounds
    # 30 -> 40 — outlier seeds — so the shipped label init stays.)

    def _cell_cols(cells: list, p: str) -> list:
        return [
            F.lit([lbl for lbl, _, _ in cells]).cast("array<int>")
             .alias(f"{p}lbls"),
            F.lit([n for _, n, _ in cells]).cast("array<bigint>")
             .alias(f"{p}ns"),
            F.lit([v for _, _, s_arr in cells for v in s_arr])
             .cast("array<bigint>").alias(f"{p}sf"),
        ]

    def _argmin(cells: list, p: str) -> str:
        exact = all(
            sum((q_max * n + abs(s)) ** 2 for s in s_arr) < (1 << 63)
            for _, n, s_arr in cells)
        t = f"(x * element_at({p}ns, i + 1) - s)"
        sq = t if exact else f"cast({t} as decimal(19,0))"
        zero = "0L" if exact else "cast(0 as decimal(38,0))"
        return (
            f"array_min(transform(sequence(0, {len(cells) - 1}), "
            f"i -> struct("
            f"cast(aggregate(zip_with(q, slice({p}sf, i * {dims} + 1, "
            f"{dims}), (x, s) -> ({sq}) * ({sq})), {zero}, "
            "(acc, v) -> acc + v) as double) "
            f"/ (cast(element_at({p}ns, i + 1) as double) "
            f"* element_at({p}ns, i + 1)) as d, "
            f"element_at({p}lbls, i + 1) as lbl))).lbl")

    def _int64_safe(cells: list) -> bool:
        return all(
            sum((q_max * n + abs(s)) ** 2 for s in s_arr) < (1 << 63)
            for _, n, s_arr in cells)

    def _np_argmin_fn(cells: list):
        """Vectorized per-batch argmin over the k cells — the SAME exact
        recurrence: t = q*n - s is int64-exact under the _int64_safe
        bound, (t*t).sum() is exact, the double division matches
        DuckDB's hugeint->double bit-for-bit, and np.argmin's
        first-minimum tie-break = ORDER BY d, lbl because cells are
        sorted by lbl."""
        import numpy as np
        ns = [n for _, n, _ in cells]
        sf = np.array([s_arr for _, _, s_arr in cells], dtype=np.int64)
        lbls = np.array([lbl for lbl, _, _ in cells], dtype=np.int64)

        def assign(qm):                        # qm: B×dims int64
            d = np.empty((qm.shape[0], len(ns)), dtype=np.float64)
            for i, n in enumerate(ns):
                t = qm * n - sf[i]
                d[:, i] = (t * t).sum(axis=1).astype(np.float64) \
                    / (float(n) * float(n))
            return lbls[np.argmin(d, axis=1)]
        return assign

    def _assigned_np(new_cells, old_cells) -> DataFrame:
        """(lbl, mv, per-cell per-dim partial sums) via ONE Arrow-batched
        mapInPandas pass — numpy does the k×dims integer arithmetic the
        interpreted HOF path evaluates lambda-at-a-time (HOFs never
        codegen; measured 1.5 s/round vs 0.3 s/round at sf0.1)."""
        import pandas as pd
        new_fn = _np_argmin_fn(new_cells)
        old_fn = (None if old_cells is new_cells
                  else _np_argmin_fn(old_cells))

        def gen(batches):
            import numpy as np
            for pdf in batches:
                if not len(pdf):
                    continue
                qm = np.stack(pdf["q"].to_numpy()).astype(np.int64)
                lbl = new_fn(qm)
                old = (pdf["lbl0"].to_numpy().astype(np.int64)
                       if old_fn is None else old_fn(qm))
                mv = (lbl != old).astype(np.int64)
                out = []
                for c_lbl in np.unique(lbl):
                    m = lbl == c_lbl
                    s_arr = qm[m].sum(axis=0)
                    out.append(pd.DataFrame({
                        "lbl": int(c_lbl), "k": range(dims),
                        "s": s_arr,
                        "n": int(m.sum()),
                        "mv": [int(mv[m].sum())] + [0] * (dims - 1)}))
                yield pd.concat(out)
        return emb.select("q", "lbl0").mapInPandas(
            gen, "lbl int, k int, s long, n long, mv long")

    def _round_stats(new_cells, old_cells) -> list:
        if new_cells is None:                       # round 0: shipped init
            parts = (emb.select("q", F.col("lbl0").alias("lbl"),
                                F.lit(0).alias("mv"))
                     .select("lbl", "mv",
                             F.posexplode("q").alias("k", "x"))
                     .groupBy("lbl", "k")
                     .agg(F.sum("x").alias("s"),
                          F.count(F.lit(1)).alias("n"),
                          F.sum(F.when(F.col("k") == 0, F.col("mv"))
                                .otherwise(F.lit(0))).alias("mv")))
        elif _int64_safe(new_cells) and _int64_safe(old_cells):
            parts = (_assigned_np(new_cells, old_cells)
                     .groupBy("lbl", "k")
                     .agg(F.sum("s").alias("s"), F.sum("n").alias("n"),
                          F.sum("mv").alias("mv")))
        else:                        # exact decimal fallback, HOF path
            base = emb.select("q", "lbl0",
                              *_cell_cols(new_cells, "C_new_"),
                              *_cell_cols(old_cells, "C_old_"))
            new_lbl = F.expr(_argmin(new_cells, "C_new_"))
            old_lbl = (F.expr(_argmin(old_cells, "C_old_"))
                       if old_cells is not new_cells else F.col("lbl0"))
            parts = (base.select(
                        "q", new_lbl.alias("lbl"),
                        (new_lbl != old_lbl).cast("long").alias("mv"))
                     .select("lbl", "mv",
                             F.posexplode("q").alias("k", "x"))
                     .groupBy("lbl", "k")
                     .agg(F.sum("x").alias("s"),
                          F.count(F.lit(1)).alias("n"),
                          F.sum(F.when(F.col("k") == 0, F.col("mv"))
                                .otherwise(F.lit(0))).alias("mv")))
        rows = parts.collect()               # k*dims rows: cell stats
        cells: dict[int, dict] = {}
        for r in rows:
            c = cells.setdefault(int(r["lbl"]),
                                 {"n": int(r["n"]), "mv": 0,
                                  "s": [0] * dims})
            c["s"][int(r["k"])] = int(r["s"])
            c["mv"] += int(r["mv"])
        return sorted((lbl, c["n"], c["mv"], c["s"])
                      for lbl, c in cells.items())

    # round 0: sufficient stats of the shipped-label assignment
    stats = _round_stats(None, None)
    prev_cells = None
    n_rounds = 0
    for i in range(_MAX_ROUNDS):
        cur_cells = [(lbl, n, s) for lbl, n, _, s in stats]
        stats = _round_stats(
            cur_cells, prev_cells if prev_cells is not None else cur_cells)
        moved = sum(mv for _, _, mv, _ in stats)
        prev_cells = cur_cells
        n_rounds = i + 1
        if moved == 0:
            break
    else:
        raise RuntimeError(
            f"kmeans training: no convergence in {_MAX_ROUNDS} rounds — "
            "a tie-cycle; production would stop on a moved-count plateau")
    fin = (emb.select("vec_id", "q", *_cell_cols(prev_cells, "C_new_"))
           .select("vec_id",
                   F.expr(_argmin(prev_cells, "C_new_")).alias("lbl"))
           .localCheckpoint(eager=True))
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
    exact5 = (_ranked_topk(
        _sims_from_dots(_bcast_query_dots(q, cand), norms), 5)
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
