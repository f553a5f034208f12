"""Krippendorff's alpha over three deterministic document raters — the
inter-rater reliability readout that handles MISSING ratings, which is
exactly what separates it from the Cohen's kappa pair the engine
already carries (calibration10): real annotation pipelines have raters
who abstain, and kappa simply cannot score those units.

Raters (all deterministic functions of the document row, the
cohens_kappa_labelers convention):
- A: length tercile of n_chars (< 200 -> 0, < 320 -> 1, else 2);
- B: A's label md5-perturbed — docs whose md5(doc_id) lands in a 1/5
  residue class shift one category cyclically (a systematically noisy
  second pass);
- C: the tercile rule on a different signal (n_chars of the TEXT's
  first 40% — substr length), abstaining (NULL) on doc_id % 7 = 0.

Exactness: with m_u in {2, 3} raters per unit, scaling the coincidence
matrix by 2 clears every (m_u - 1) denominator: O_ck =
sum_u w_u * m_uc * (m_uk - delta_ck) with w_u = 2/(m_u - 1) in {1, 2}
is an exact bigint, and nominal alpha reduces to
1 - D_o_scaled * (N_t - 2) / (N_t^2 - sum_c N_c^2) — the off-diagonal
expectation as a squares identity (no category-pair join), one double
division at the end.

Scale stance (100 TB): one map-side label projection, one (doc,
category) count, one category x category cell aggregate over <= 9
cells per doc — a two-shuffle pipeline with a 3x3 final grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_T1, _T2 = 200, 320

# md5-derived residue must be identical cross-engine: both engines hash
# the decimal string of doc_id and take the first 8 hex digits as an
# unsigned bigint (the repo's md5-randomness convention).
_MD5_DUCK = ("cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8)) "
             "AS bigint)")
_MD5_SPARK = ("cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), "
              "16, 10) AS bigint)")

_RATINGS_TMPL = f"""
base AS (
  SELECT doc_id,
         CASE WHEN n_chars < {_T1} THEN 0
              WHEN n_chars < {_T2} THEN 1 ELSE 2 END AS la,
         length(substr(text, 1, cast(floor(n_chars * 2.0 / 5)
                                     AS bigint))) AS c40
  FROM {{DOCS}}),
r AS (
  SELECT doc_id, 'A' AS rater, la AS cat FROM base
  UNION ALL
  SELECT doc_id, 'B',
         CASE WHEN {{MD5}} % 5 = 0 THEN (la + 1) % 3 ELSE la END
  FROM base
  UNION ALL
  SELECT doc_id, 'C',
         CASE WHEN c40 < {_T1 * 2 // 5} THEN 0
              WHEN c40 < {_T2 * 2 // 5} THEN 1 ELSE 2 END
  FROM base WHERE doc_id % 7 <> 0)"""

_ALPHA_TAIL = """
mu AS (SELECT doc_id, cast(count(*) AS bigint) AS m FROM r
       GROUP BY doc_id),
muc AS (SELECT doc_id, cat, cast(count(*) AS bigint) AS mc FROM r
        GROUP BY doc_id, cat),
cells AS (
  SELECT a.cat AS c, b.cat AS k,
         sum((CASE WHEN mu.m = 2 THEN 2 ELSE 1 END)
             * a.mc * (b.mc - CASE WHEN a.cat = b.cat THEN 1 ELSE 0 END))
           AS o
  FROM muc a JOIN muc b ON b.doc_id = a.doc_id
  JOIN mu ON mu.doc_id = a.doc_id
  WHERE mu.m >= 2
  GROUP BY a.cat, b.cat),
nc AS (SELECT c, cast(sum(o) AS bigint) AS n_c FROM cells GROUP BY c),
tot AS (SELECT cast(sum(o) AS bigint) AS nt,
               cast(sum(CASE WHEN c <> k THEN o ELSE 0 END) AS bigint)
                 AS do_
        FROM cells),
sq AS (SELECT cast(sum(n_c * n_c) AS bigint) AS s2 FROM nc)
SELECT (SELECT cast(count(*) AS bigint) FROM mu WHERE m >= 2) AS n_units,
       nt AS n_pairable_x2, do_ AS d_obs_x2,
       round(1.0 - cast(do_ AS double) * (nt - 2)
             / (cast(nt AS double) * nt - s2), 6) AS alpha
FROM tot, sq"""


@register(
    "krippendorff_alpha_labels",
    oracle=("WITH "
            + _RATINGS_TMPL.format(DOCS="documents", MD5=_MD5_DUCK).strip()
            + "," + _ALPHA_TAIL),
    tags=("evaluation", "agreement", "missing-data"),
)
def krippendorff_alpha_labels(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """(n_units, n_pairable_x2, d_obs_x2, alpha): nominal Krippendorff
    alpha over the three deterministic raters with rater C abstaining on
    1/7 of docs (module docstring) — exact scaled coincidence matrix,
    one final double division."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("kripp15_docs")
    # r16 scan-audit collapse (guide §2.4 / r10 multi-branch lesson):
    # Spark inlines CTEs, so mu/muc/cells re-derived the ratings CTE —
    # and with it the documents scan INCLUDING the fat text column (the
    # c40 substr) — 21 times in one plan. Materialize the narrow
    # (doc_id, rater, cat) ratings frame once (3 rows per doc, no text)
    # and run the tail over the checkpointed RDD: 21 text-bearing corpus
    # scans -> 1.
    r = spark.sql(
        "WITH "
        + _RATINGS_TMPL.format(DOCS="kripp15_docs", MD5=_MD5_SPARK).strip()
        + " SELECT * FROM r").localCheckpoint(eager=True)
    r.createOrReplaceTempView("kripp15_r")
    return spark.sql(
        "WITH r AS (SELECT * FROM kripp15_r)," + _ALPHA_TAIL)
