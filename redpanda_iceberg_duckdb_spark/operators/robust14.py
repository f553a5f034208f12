"""Huber M-estimator of location, IRLS-iterated to convergence — the
robust-location member of the repo's converged-fit family (logistic IRLS
in glm12, Cox Newton in cox13, trained PQ/k-means): the monitoring
answer to 'what is the typical event value when the tail is junk'.

Recurrence (integer lattice end to end). Values reduce ONCE to the
distinct-cents histogram (v, c) — value-domain-bounded, the KS/CvM curve
shape. mu lives in MICRO-cents; weights on a 1e4 lattice:

    r_v  = |v * 1e6 - mu|                       (micro-cents, bigint)
    w_v  = 1e4                  if r_v <= K*1e6
         = (2*K*1e10 + r_v) // (2*r_v)          otherwise  (round-half-up)
    mu'  = (2e6 * sum(c w v) + sum(c w)) // (2 * sum(c w))

(the (2a+b)//(2b) form IS round-half-up of a/b for positive integers —
no floats anywhere in the loop). Convergence: |mu' - mu| <= 1 micro-cent,
step unapplied (cox13's lattice-resolution rule). The driver loop runs on
the collected histogram (curve-sized — the offsets-table convention);
the DuckDB oracle replays the identical recurrence in a recursive CTE
with HUGEINT casts where products exceed int64 (Python ints are
arbitrary-precision, so both engines compute the same integers).

Scale stance (100 TB): one map-side-combinable histogram aggregate;
iterations are curve-sized. K is fixed at 1000 cents ($10), stated
rather than MAD-derived so the recurrence stays a two-engine pure
function of the histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_K_CENTS = 1000
_MAX_ITERS = 80

_HIST_SQL = """
hist AS (SELECT cast(floor(value * 100) AS bigint) AS v,
                cast(count(*) AS bigint) AS c
         FROM events GROUP BY 1)"""

# One IRLS step given mu (micro-cents): correlated lateral aggregate over
# the histogram (cox13's oracle template).
_STEP_SQL = f"""
SELECT cast((2000000 * sum(cast(h.c AS hugeint) * w.w * h.v) + sum(cast(h.c AS hugeint) * w.w))
            // (2 * sum(cast(h.c AS hugeint) * w.w)) AS bigint) AS mu2
FROM hist h, lateral (
  SELECT CASE WHEN abs(h.v * 1000000 - {{mu}}) <= {_K_CENTS} * 1000000
              THEN cast(10000 AS hugeint)
              ELSE (2 * cast({_K_CENTS} AS hugeint) * 10000000000
                    + abs(h.v * 1000000 - {{mu}}))
                   // (2 * cast(abs(h.v * 1000000 - {{mu}}) AS hugeint))
         END AS w) w"""


def _huber_oracle() -> str:
    step = _STEP_SQL.format(mu="it.mu")
    return f"""
WITH RECURSIVE {_HIST_SQL},
start AS (SELECT cast((2000000 * sum(cast(c AS hugeint) * v)
                       + sum(cast(c AS hugeint)))
                      // (2 * sum(cast(c AS hugeint))) AS bigint) AS mu0
          FROM hist),
it AS (
  SELECT 0 AS k, (SELECT mu0 FROM start) AS mu, 1 AS moved
  UNION ALL
  SELECT m.k + 1,
         CASE WHEN abs(m.mu2 - m.mu) <= 1 THEN m.mu ELSE m.mu2 END,
         CASE WHEN abs(m.mu2 - m.mu) <= 1 THEN 0 ELSE 1 END
  FROM (SELECT it.k, it.mu, s.mu2
        FROM it, ({step}) s
        WHERE it.moved = 1 AND it.k < {_MAX_ITERS}) m),
fin AS (SELECT * FROM it WHERE k = (SELECT max(k) FROM it))
SELECT (SELECT cast(sum(c) AS bigint) FROM hist) AS n_rows,
       (SELECT cast(count(*) AS bigint) FROM hist) AS n_distinct,
       cast(k AS bigint) AS n_iters,
       mu AS mu_micro_cents,
       round(mu / 1e8, 6) AS huber_mean
FROM fin"""


@register(
    "huber_location_converged",
    oracle=_huber_oracle(),
    tags=("statistics", "robust", "iterative", "convergence"),
)
def huber_location_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber location of event `value` (K = $10), IRLS to lattice
    convergence on the exact micro-cent recurrence (module docstring).
    Start = round-half-up mean. Returns (n_rows, n_distinct, n_iters,
    mu_micro_cents, huber_mean)."""
    e = load_table(spark, sf_dir, "events")
    hist = (e.select(F.floor(F.col("value") * 100).cast("long").alias("v"))
            .groupBy("v").agg(F.count(F.lit(1)).alias("c")))
    # Curve rows are value-domain-bounded — the offsets-table collect.
    rows = [(int(r["v"]), int(r["c"])) for r in hist.collect()]
    n_rows = sum(c for _, c in rows)
    sc, scv = sum(c for _, c in rows), sum(c * v for v, c in rows)
    mu = (2_000_000 * scv + sc) // (2 * sc)
    k_hi = _K_CENTS * 1_000_000
    n_iters = 0
    for _ in range(_MAX_ITERS):
        swv = sw = 0
        for v, c in rows:
            r = abs(v * 1_000_000 - mu)
            w = 10_000 if r <= k_hi else \
                (2 * _K_CENTS * 10_000_000_000 + r) // (2 * r)
            sw += c * w
            swv += c * w * v
        mu2 = (2_000_000 * swv + sw) // (2 * sw)
        n_iters += 1
        if abs(mu2 - mu) <= 1:
            break                      # step below lattice resolution
        mu = mu2
    else:
        raise RuntimeError(f"huber IRLS: no convergence in {_MAX_ITERS}")
    return spark.createDataFrame(
        [(n_rows, len(rows), n_iters, mu, float(round(mu / 1e8, 6)))],
        "n_rows long, n_distinct long, n_iters long, "
        "mu_micro_cents long, huber_mean double")
