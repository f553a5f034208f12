"""Inter-source unigram KL divergence — the distribution-shift matrix a
mixture-curation pipeline reads before reweighting domains (which source
pairs are interchangeable, which are far apart; the pairwise sibling of
dsir_importance_topk's single importance direction and psi_price_drift's
numeric drift).

Micro-nat discipline (nblm10.py): each smoothed log-probability
ln((n_st + 1) / (N_s + V)) is snapped ONCE to micro-nats
(cast(round(ln(p) * 1e6) as bigint)); KL then rides exact integers —

    KL(a || b) * (N_a + V) * 1e6  =  sum_t (n_at + 1) * (lp_a(t) - lp_b(t))

an order-insensitive bigint sum over the add-one-smoothed vocabulary
(every token in the GLOBAL vocab contributes to every source, absent
tokens at count 0), divided once at the end. Both engines evaluate the
identical ln expression on identical doubles and the 1e-6 snap absorbs
any last-ulp libm difference (the nblm10 hazard note).

Scale stance (100 TB): one tokenization pass -> (source, token) counts
(map-side combinable); the smoothed distribution is a vocab x sources
frame (vocabulary-sized, NOT corpus-sized) built by a cross of the
distinct vocab with the 5 source totals; the KL matrix is k^2 rows. The
corpus is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table


def _oracle() -> str:
    return """
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents),
cnt AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2),
vocab AS (SELECT DISTINCT tok FROM cnt),
src AS (SELECT source, sum(n) AS ns FROM cnt GROUP BY 1),
vv AS (SELECT count(*) AS v FROM vocab),
grid AS (
  SELECT s.source, v.tok, s.ns, coalesce(c.n, 0) AS n
  FROM src s CROSS JOIN vocab v
  LEFT JOIN cnt c ON c.source = s.source AND c.tok = v.tok),
lp AS (
  SELECT source, tok, n,
         cast(round(ln((n + 1.0) / (ns + (SELECT v FROM vv))) * 1e6)
              AS bigint) AS lp
  FROM grid),
kl AS (
  SELECT a.source AS source_a, b.source AS source_b,
         sum((a.n + 1) * (a.lp - b.lp)) AS kl_num
  FROM lp a JOIN lp b ON b.tok = a.tok AND b.source <> a.source
  GROUP BY 1, 2),
den AS (SELECT source, ns + (SELECT v FROM vv) AS d FROM src)
SELECT k.source_a, k.source_b,
       cast(k.kl_num AS bigint) AS kl_micronat_num,
       round(cast(k.kl_num AS double) / (d.d * 1e6), 6) AS kl_nats
FROM kl k JOIN den d ON d.source = k.source_a
ORDER BY source_a, source_b"""


@register(
    "token_kl_by_source_pair",
    oracle=_oracle(),
    tags=("text", "curation", "drift", "scale-pattern"),
)
def token_kl_by_source_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, kl_micronat_num, kl_nats): add-one-smoothed
    unigram KL divergence between every ordered source pair — exact
    integer numerator on the micro-nat lattice, one division (module
    docstring)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    # Checkpointed: cnt feeds the vocabulary, the per-source totals AND
    # the smoothed-grid join (and lp is read by both KL sides) — without
    # it each branch re-ran the scan + tokenize + aggregate (10
    # documents scans in one plan, r15 scan audit). (source, token)
    # counts: vocabulary-bounded, tokenized once.
    cnt = (toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n"))
           ).localCheckpoint(eager=True)
    vocab = cnt.select("tok").distinct()
    src = cnt.groupBy("source").agg(F.sum("n").alias("ns"))
    vv = vocab.agg(F.count(F.lit(1)).alias("v"))
    grid = (src.crossJoin(vocab)
            .crossJoin(F.broadcast(vv))
            .join(cnt, ["source", "tok"], "left")
            .select("source", "tok", "ns", "v",
                    F.coalesce("n", F.lit(0)).alias("n")))
    lp = grid.select(
        "source", "tok", "n",
        F.round(F.log((F.col("n") + 1.0) / (F.col("ns") + F.col("v")))
                * 1e6).cast("bigint").alias("lp"))
    a = lp.select(F.col("source").alias("source_a"), "tok",
                  F.col("n").alias("na"), F.col("lp").alias("lpa"))
    b = lp.select(F.col("source").alias("source_b"), "tok",
                  F.col("lp").alias("lpb"))
    kl = (a.join(b, "tok")
          .filter(F.col("source_a") != F.col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(F.sum((F.col("na") + 1) * (F.col("lpa") - F.col("lpb")))
               .alias("kl_num")))
    den = (src.crossJoin(F.broadcast(vv))
           .select(F.col("source").alias("source_a"),
                   (F.col("ns") + F.col("v")).alias("d")))
    return (kl.join(F.broadcast(den), "source_a")
            .select("source_a", "source_b",
                    F.col("kl_num").cast("long").alias("kl_micronat_num"),
                    F.round(F.col("kl_num").cast("double")
                            / (F.col("d") * 1e6), 6).alias("kl_nats"))
            .orderBy("source_a", "source_b"))
