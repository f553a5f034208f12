"""Round-15 language-model pipeline operators: speculative-decoding
acceptance rates and deterministic beam-search decoding over the event
Markov chain.

speculative_acceptance_rate — the serving-side twin of the LM-eval tier
(Kneser-Ney perplexity, self-BLEU): when a small per-source draft model
proposes tokens and the corpus-wide target model verifies them, the
expected token-acceptance probability of speculative sampling is
E_q[min(1, p/q)] = sum_t min(p_t, q_t) = 1 - TV(p, q). That identity
lets the whole thing run EXACTLY on integer counts: with p = ct/N and
q = cs/M, min(p_t, q_t) = min(ct*M, cs*N) / (N*M) — cross-multiplied
bigints, one double division per source at the end. (Unigram proposal
models — the draft-acceptance bound, not a full sequence model.)

beam_search_paths — width-3, 4-step beam decode of the most probable
event-type sequences starting from 'view', over transition
probabilities learned from per-user event bigrams
(event_type_transitions' windows.py semantics). Log-probs are snapped
ONCE to the 1e6 micro-nat lattice (round(1e6*ln(c/row_total))), so
path scores are exact integer sums and the beam's (score DESC, path
ASC) tiebreak is fully deterministic in both engines. The Spark side is
idiomatic DataFrame ops (per-step top-3 via orderBy/limit on a <= 15-row
frame); only the lattice definition is shared with the oracle.

Scale stance (100 TB): acceptance is two map-side-combinable token
counts joined on the vocab (vocab-sized shuffle); beam search reduces
the corpus to a 5x5 transition matrix and then runs constant-size
per-step top-k — no corpus work after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_ACCEPT_ORACLE = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
             FROM documents),
tgt AS (SELECT tok, cast(count(*) AS bigint) AS ct FROM tok
        GROUP BY tok),
ntot AS (SELECT cast(sum(ct) AS bigint) AS n FROM tgt),
src AS (SELECT source, tok, cast(count(*) AS bigint) AS cs FROM tok
        GROUP BY source, tok),
ns AS (SELECT source, cast(sum(cs) AS bigint) AS m FROM src
       GROUP BY source),
j AS (SELECT s.source,
             least(t.ct * ns.m, s.cs * n.n) AS mn,
             ns.m AS m, n.n AS n
      FROM tgt t JOIN src s ON s.tok = t.tok
      JOIN ns ON ns.source = s.source CROSS JOIN ntot n)
SELECT source, cast(count(*) AS bigint) AS n_shared_vocab,
       round(cast(sum(mn) AS double) / (max(m) * cast(max(n) AS double)),
             6) AS acceptance
FROM j GROUP BY source ORDER BY source"""


@register(
    "speculative_acceptance_rate",
    oracle=_ACCEPT_ORACLE,
    tags=("lm", "serving", "distribution-distance"),
)
def speculative_acceptance_rate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """(source, n_shared_vocab, acceptance): expected speculative-
    decoding acceptance of each per-source unigram draft against the
    corpus-wide target — exact cross-multiplied integer min-sums
    (module docstring)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source",
                   F.explode(F.split("text", " ")).alias("tok"))
    tgt = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                 .alias("ct"))
    ntot = tgt.agg(F.sum("ct").cast("long").alias("n"))
    src = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long")
                                           .alias("cs"))
    ns = src.groupBy("source").agg(F.sum("cs").cast("long").alias("m"))
    j = (tgt.join(src, "tok")
         .join(F.broadcast(ns), "source")
         .crossJoin(F.broadcast(ntot)))
    return (j.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_vocab"),
                 F.round(F.sum(F.least(F.col("ct") * F.col("m"),
                                       F.col("cs") * F.col("n")))
                         .cast("double")
                         / (F.max("m") * F.max("n").cast("double")), 6)
                 .alias("acceptance"))
            .orderBy("source"))


_BEAM_W = 3
_BEAM_STEPS = 4
_BEAM_START = "view"

# Micro-nat transition lattice, shared text (dialect-free):
_LP_SQL = """
p AS (SELECT user_id, event_type AS a,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events),
c AS (SELECT a, b, cast(count(*) AS bigint) AS n FROM p
      WHERE b IS NOT NULL GROUP BY a, b),
rt AS (SELECT a, cast(sum(n) AS bigint) AS tot FROM c GROUP BY a),
lp AS (SELECT c.a, c.b,
              cast(round(1000000 * ln(cast(c.n AS double) / rt.tot))
                   AS bigint) AS lp
       FROM c JOIN rt ON rt.a = c.a)"""


def _beam_oracle() -> str:
    steps = []
    prev = "b0"
    for t in range(1, _BEAM_STEPS + 1):
        steps.append(
            f"s{t} AS (SELECT * FROM ("
            f"SELECT {prev}.path || '>' || lp.b AS path, lp.b AS last, "
            f"{prev}.sc + lp.lp AS sc "
            f"FROM {prev} JOIN lp ON lp.a = {prev}.last) "
            f"ORDER BY sc DESC, path LIMIT {_BEAM_W})")
        prev = f"s{t}"
    return (f"WITH {_LP_SQL.lstrip()},\n"
            f"b0 AS (SELECT '{_BEAM_START}' AS path, "
            f"'{_BEAM_START}' AS last, cast(0 AS bigint) AS sc),\n"
            + ",\n".join(steps)
            + f"\nSELECT path, sc AS score_e6 FROM s{_BEAM_STEPS} "
              f"ORDER BY sc DESC, path")


@register(
    "beam_search_paths",
    oracle=_beam_oracle(),
    tags=("lm", "decoding", "markov"),
)
def beam_search_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(path, score_e6): the width-3 beam after 4 decode steps from
    'view' over the micro-nat event-transition lattice — exact integer
    path scores, (score DESC, path ASC) beam tiebreak."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("beam15_events")
    lp = spark.sql("WITH " + _LP_SQL.replace("FROM events",
                                             "FROM beam15_events")
                   .lstrip() + " SELECT a, b, lp FROM lp")
    beam = spark.createDataFrame([( _BEAM_START, _BEAM_START, 0)],
                                 "path string, last string, sc long")
    lp_b = F.broadcast(lp)
    for _ in range(_BEAM_STEPS):
        beam = (beam.join(lp_b, beam["last"] == lp["a"])
                .select(F.concat_ws(">", "path", "b").alias("path"),
                        F.col("b").alias("last"),
                        (F.col("sc") + F.col("lp")).alias("sc"))
                .orderBy(F.col("sc").desc(), "path").limit(_BEAM_W))
    return (beam.select("path", F.col("sc").alias("score_e6"))
            .orderBy(F.col("score_e6").desc(), "path"))
