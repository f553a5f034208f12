"""Vocabulary richness estimation from the frequency-of-frequencies
profile — the corpus-statistics questions Heaps-law fitting (lexicon.py)
answers by extrapolation, answered instead by the capture-recapture
estimators ecologists and LM smoothing share:

- Chao1 (Chao 1984, bias-corrected form): how many types does the corpus
  REALLY have, unseen included? D + f1*(f1-1)/(2*(f2+1)) — driven
  entirely by the singleton/doubleton counts.
- Good-Turing (Good 1953): the adjusted count r* = (r+1) * f_{r+1} / f_r
  for each observed frequency r, plus the leave-one-out mass estimate
  p0 = f1/N for everything unseen — the discounting curve every
  back-off LM smoother is built on.

Both are pure functions of the frequency-of-frequencies table, which is
TINY (O(max count) rows) no matter how large the corpus: one token
count aggregate, one count-of-counts aggregate, then arithmetic. The
only floats are single divisions of exact integers, rounded once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_FOF_DUCK = """
cnt AS (SELECT tok, cast(count(*) AS bigint) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY tok),
fof AS (SELECT n AS r, cast(count(*) AS bigint) AS f
        FROM cnt GROUP BY n)"""


@register(
    "chao1_vocab_richness",
    oracle=f"""
WITH {_FOF_DUCK}
SELECT cast(sum(f) AS bigint) AS d_observed,
       cast(sum(r * f) AS bigint) AS n_tokens,
       cast(coalesce(sum(CASE WHEN r = 1 THEN f END), 0) AS bigint) AS f1,
       cast(coalesce(sum(CASE WHEN r = 2 THEN f END), 0) AS bigint) AS f2,
       round(sum(f)
             + cast(coalesce(sum(CASE WHEN r = 1 THEN f END), 0)
                    * (coalesce(sum(CASE WHEN r = 1 THEN f END), 0) - 1)
                    AS double)
               / (2 * (coalesce(sum(CASE WHEN r = 2 THEN f END), 0) + 1)),
             3) AS chao1
FROM fof""",
    tags=("corpus-stats", "estimator"),
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected Chao1 total-vocabulary estimate from singleton and
    doubleton type counts (module docstring)."""
    fof = _fof(spark, sf_dir)
    f1 = F.coalesce(F.sum(F.when(F.col("r") == 1, F.col("f"))), F.lit(0))
    f2 = F.coalesce(F.sum(F.when(F.col("r") == 2, F.col("f"))), F.lit(0))
    return fof.agg(
        F.sum("f").cast("long").alias("d_observed"),
        F.sum(F.col("r") * F.col("f")).cast("long").alias("n_tokens"),
        f1.cast("long").alias("f1"),
        f2.cast("long").alias("f2"),
        F.round(F.sum("f")
                + (f1 * (f1 - 1)).cast("double") / (2 * (f2 + 1)), 3)
         .alias("chao1"))


@register(
    "good_turing_counts",
    oracle=f"""
WITH {_FOF_DUCK},
tot AS (SELECT sum(r * f) AS n FROM fof)
SELECT a.r, a.f AS f_r,
       round(cast((a.r + 1) * b.f AS double) / a.f, 6) AS r_star,
       round(cast(a.r * a.f AS double) / (SELECT n FROM tot), 6)
         AS observed_mass
FROM fof a JOIN fof b ON b.r = a.r + 1
WHERE a.r <= 10
ORDER BY a.r""",
    tags=("corpus-stats", "language-model", "estimator"),
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* for observed frequencies r <= 10
    (rows exist only where f_{{r+1}} > 0, the estimator's domain), with
    each frequency band's observed probability mass."""
    fof = _fof(spark, sf_dir)
    tot = fof.agg(F.sum(F.col("r") * F.col("f")).alias("n"))
    b = fof.select((F.col("r") - 1).alias("r"), F.col("f").alias("f_next"))
    return (fof.filter(F.col("r") <= 10)
            .join(b, "r")
            .crossJoin(F.broadcast(tot))
            .select("r", F.col("f").alias("f_r"),
                    F.round(((F.col("r") + 1) * F.col("f_next"))
                            .cast("double") / F.col("f"), 6).alias("r_star"),
                    F.round((F.col("r") * F.col("f")).cast("double")
                            / F.col("n"), 6).alias("observed_mass"))
            .orderBy("r"))


def _fof(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cnt = (d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
           .filter(F.col("tok") != "")
           .groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n")))
    return cnt.groupBy(F.col("n").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("f"))


@register(
    "yule_k_lexical_diversity",
    oracle=f"""
WITH {_FOF_DUCK}
SELECT cast(sum(r * f) AS bigint) AS n_tokens,
       cast(sum(f) AS bigint) AS n_types,
       cast(sum(cast(r AS bigint) * r * f) AS bigint) AS sum_r2f,
       round(1e4 * (cast(sum(cast(r AS bigint) * r * f) AS double)
                    - sum(r * f))
             / (cast(sum(r * f) AS double) * sum(r * f)), 6) AS yule_k
FROM fof""",
    tags=("corpus-stats", "estimator"),
)
def yule_k_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K = 1e4 * (sum r^2 f_r - N) / N^2 — the
    length-invariant repeat-rate measure of lexical diversity (Yule 1944),
    a third pure function of the same frequency-of-frequencies table as
    Chao1/Good-Turing: high K = repetitive vocabulary use, low K =
    diverse. Exact integer moments, one final division."""
    fof = _fof(spark, sf_dir)
    n = F.sum(F.col("r") * F.col("f"))
    r2f = F.sum(F.col("r") * F.col("r") * F.col("f"))
    return fof.agg(
        n.cast("long").alias("n_tokens"),
        F.sum("f").cast("long").alias("n_types"),
        r2f.cast("long").alias("sum_r2f"),
        F.round(1e4 * (r2f.cast("double") - n)
                / (n.cast("double") * n), 6).alias("yule_k"))
