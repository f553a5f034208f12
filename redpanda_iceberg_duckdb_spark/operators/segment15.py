"""Unigram-LM Viterbi subword segmentation (the SentencePiece decode
half, Kudo 2018) — the engine's BPE family (bpe_train_merges /
bpe_encode_stats) learns merges greedily bottom-up; the unigram model
instead SCORES every segmentation and Viterbi-picks the cheapest. This
is the decode users run billions of times per corpus pass, so it's a
first-class operator, exact and oracled.

Model (all derived from the corpus, deterministically):
- vocab: every single character, plus the top-50 character bigrams and
  top-30 trigrams by occurrence-weighted frequency (ties broken by
  piece text; counted inside word boundaries);
- piece cost: round(1e6 * ln(total_vocab_count / piece_count)) — the
  micro-nat negative log-prob lattice (ln is the repo's accepted 1-ulp
  libm exposure);
- Viterbi over each DISTINCT word: best[p] = min over piece lengths
  l in {1,2,3} of best[p-l] + cost(piece at p-l..p), with the
  (cost, n_pieces) pair packed as cost*64 + 1-per-piece into one
  integer so the DP minimum is unique and deterministic. Single chars
  are always in vocab, so every word segments.

Output: per source, the occurrence-weighted subword fertility
(pieces per word) and mean piece cost — the tokenizer-quality readout
tokenizer_fertility_by_lang gives for whitespace tokens, now for a
LEARNED subword inventory.

Exactness: counts, packed DP scores, and fertility numerators are
exact bigints; two double divisions at the end.

Scale stance (100 TB): the corpus reduces to (distinct word, count) —
vocabulary-sized, tiny here and low-millions at web scale. The DP is
18 chained joins of the word table against the broadcast vocab
(pieces x positions work, independent of corpus row count); per-source
fertility is one map-side join back to the token counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_MAXLEN = 18
_TOP2, _TOP3 = 50, 30

# ---- shared SQL fragments (dialect notes inline) ----------------------

_VOCAB_DUCK = f"""
tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents),
wc AS (SELECT w, cast(count(*) AS bigint) AS cnt FROM tok
       WHERE len(w) BETWEEN 1 AND {_MAXLEN} GROUP BY w),
sub AS (SELECT s.l, substr(wc.w, p.p + 1, s.l) AS piece,
               cast(sum(wc.cnt) AS bigint) AS cnt
        FROM wc
        CROSS JOIN (SELECT unnest([1, 2, 3]) AS l) s
        JOIN lateral (SELECT unnest(range(len(wc.w))) AS p) p
          ON p.p + s.l <= len(wc.w)
        GROUP BY s.l, piece),
v1 AS (SELECT piece, cnt FROM sub WHERE l = 1),
v2 AS (SELECT piece, cnt FROM sub WHERE l = 2
       ORDER BY cnt DESC, piece LIMIT {_TOP2}),
v3 AS (SELECT piece, cnt FROM sub WHERE l = 3
       ORDER BY cnt DESC, piece LIMIT {_TOP3}),
vocab0 AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2
           UNION ALL SELECT * FROM v3),
vt AS (SELECT cast(sum(cnt) AS bigint) AS tot FROM vocab0),
vocab AS (SELECT piece, len(piece) AS l,
                 cast(round(1000000 * ln(cast(vt.tot AS double) / cnt))
                      AS bigint) * 64 + 1 AS enc
          FROM vocab0 CROSS JOIN vt)"""


def _dp_duck() -> str:
    steps = ["b0 AS (SELECT w FROM wc)"]
    for p in range(1, _MAXLEN + 1):
        branches = []
        for l in (1, 2, 3):
            if p - l < 0:
                continue
            prev = f"b{p - l}"
            prev_enc = "cast(0 AS bigint)" if p - l == 0 \
                else f"{prev}.enc"
            branches.append(
                f"SELECT {prev}.w, {prev_enc} + vocab.enc AS enc "
                f"FROM {prev} JOIN vocab ON vocab.l = {l} "
                f"AND vocab.piece = substr({prev}.w, {p - l + 1}, {l}) "
                f"WHERE len({prev}.w) >= {p}")
        steps.append(
            f"b{p} AS MATERIALIZED (SELECT w, min(enc) AS enc FROM ("
            + " UNION ALL ".join(branches) + ") GROUP BY w)")
    finals = " UNION ALL ".join(
        f"SELECT w, enc FROM b{p} WHERE len(w) = {p}"
        for p in range(1, _MAXLEN + 1))
    return ",\n".join(steps) + f",\nseg AS ({finals})"


_SEG_ORACLE = f"""
WITH {_VOCAB_DUCK.lstrip()},
{_dp_duck()}
SELECT t.source,
       cast(count(*) AS bigint) AS n_tokens,
       cast(sum(seg.enc % 64) AS bigint) AS n_pieces,
       round(cast(sum(seg.enc % 64) AS double) / count(*), 6)
         AS fertility,
       round(cast(sum(seg.enc // 64) AS double)
             / cast(sum(seg.enc % 64) AS double) / 1000000, 6)
         AS mean_piece_cost_nats
FROM tok t JOIN seg ON seg.w = t.w
GROUP BY t.source ORDER BY t.source"""


@register(
    "unigram_viterbi_segmentation",
    oracle=_SEG_ORACLE,
    tags=("lm", "tokenizer", "dynamic-programming"),
)
def unigram_viterbi_segmentation(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_pieces, fertility, mean_piece_cost_nats):
    occurrence-weighted Viterbi subword stats under the corpus-derived
    unigram piece model (module docstring).

    Constraint propagation is disabled WHILE this query's plans
    optimize (and restored after): the DP recursion's per-level
    filters/joins make Catalyst's constraint inference accumulate a
    disjunction over all DP paths — a measured ~600 KB filter
    expression pushed through the final join whose codegen OOMs a
    small-driver session. Constraints survive localCheckpoint
    (LogicalRDD preserves them), so the only sound cut is the
    optimizer rule itself; every frame, including the 20-row result,
    materializes eagerly inside the window."""
    _PROP = "spark.sql.constraintPropagation.enabled"
    prior = spark.conf.get(_PROP, None)
    if prior != "false":
        spark.conf.set(_PROP, "false")
    try:
        out = _viterbi_inner(spark, sf_dir).localCheckpoint(eager=True)
        # re-assert the output order on the 20-row checkpointed frame
        # (the post-restore Sort plan is constraint-free and trivial)
        return out.orderBy("source")
    finally:
        if prior != "false":
            if prior is None:
                spark.conf.unset(_PROP)
            else:
                spark.conf.set(_PROP, prior)


def _viterbi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    # r15 optimization (guide §2.4): wc feeds the three substring-count
    # branches below AND DP levels 1-3 (via levels[0]) — six evaluations
    # of the corpus token scan + word-count shuffle without
    # materialization. One localCheckpoint of the vocabulary-sized
    # (w, cnt) frame collapses them to a single pass.
    wc = (tok.filter((F.length("w") >= 1) & (F.length("w") <= _MAXLEN))
          .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
          .localCheckpoint(eager=True))
    # substring counts, occurrence-weighted, inside word boundaries
    pos = (wc.select("w", "cnt",
                     F.explode(F.sequence(
                         F.lit(0), F.length("w") - 1)).alias("p")))
    sub = None
    for l in (1, 2, 3):
        part = (pos.filter(F.col("p") + l <= F.length("w"))
                .select(F.lit(l).alias("l"),
                        F.expr(f"substr(w, p + 1, {l})").alias("piece"),
                        "cnt"))
        part = part.groupBy("l", "piece").agg(F.sum("cnt").cast("long")
                                              .alias("cnt"))
        sub = part if sub is None else sub.union(part)
    # sub is read by the three per-length vocab branches; checkpoint the
    # piece-count table (vocab-sized) so the 3-branch union runs once.
    sub = sub.localCheckpoint(eager=True)
    v1 = sub.filter(F.col("l") == 1).select("piece", "cnt")
    v2 = (sub.filter(F.col("l") == 2)
          .orderBy(F.col("cnt").desc(), "piece").limit(_TOP2)
          .select("piece", "cnt"))
    v3 = (sub.filter(F.col("l") == 3)
          .orderBy(F.col("cnt").desc(), "piece").limit(_TOP3)
          .select("piece", "cnt"))
    vocab0 = v1.union(v2).union(v3)
    vt = vocab0.agg(F.sum("cnt").cast("long").alias("tot"))
    vocab = (vocab0.crossJoin(F.broadcast(vt))
             .select("piece", F.length("piece").alias("l"),
                     (F.round(1_000_000
                              * F.log(F.col("tot").cast("double")
                                      / F.col("cnt")))
                      .cast("long") * 64 + 1).alias("enc"))
             .localCheckpoint(eager=True))
    vb = F.broadcast(vocab)
    # Viterbi DP: b[p] per word = packed min (cost*64 + pieces)
    levels: dict[int, DataFrame] = {0: wc.select("w")}
    for p in range(1, _MAXLEN + 1):
        branches = []
        for l in (1, 2, 3):
            if p - l < 0:
                continue
            prev = levels[p - l]
            if p - l == 0:
                prev = prev.select("w", F.lit(0).cast("long")
                                   .alias("penc"))
            else:
                prev = prev.select("w", F.col("enc").alias("penc"))
            br = (prev.filter(F.length("w") >= p)
                  .join(vb, (vb["l"] == l)
                        & (vb["piece"]
                           == F.expr(f"substr(w, {p - l + 1}, {l})")))
                  .select("w", (F.col("penc") + vb["enc"]).alias("enc")))
            branches.append(br)
        merged = branches[0]
        for br in branches[1:]:
            merged = merged.union(br)
        levels[p] = (merged.groupBy("w")
                     .agg(F.min("enc").alias("enc"))
                     .localCheckpoint(eager=True))
    # Union the levels WITH the position as a column and filter ONCE on
    # length(w) = p: per-branch constant filters (length(w) = 1, = 2, …)
    # would make constraint inference build a ~600 KB OR-chain that gets
    # pushed through the final join and whose codegen OOMs a
    # small-driver session (measured; survives localCheckpoint because
    # LogicalRDD preserves constraints). A column comparison propagates
    # as a single constraint.
    seg = None
    for p in range(1, _MAXLEN + 1):
        part = levels[p].select("w", "enc", F.lit(p).alias("p"))
        seg = part if seg is None else seg.union(part)
    seg = seg.filter(F.length("w") == F.col("p")).drop("p")
    # seg is vocabulary-sized (distinct words) — broadcast it EXPLICITLY:
    # the static planner estimates tok by its parquet scan bytes, which
    # the explode invalidates, and under a small-driver session it would
    # pick the exploded token side as the build side (OOM'd a 1g vanilla
    # probe at sf0.001).
    return (tok.join(F.broadcast(seg), "w")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum(F.col("enc") % 64).cast("long").alias("n_pieces"),
                 F.round(F.sum(F.col("enc") % 64).cast("double")
                         / F.count(F.lit(1)), 6).alias("fertility"),
                 F.round(F.sum(F.expr("enc div 64")).cast("double")
                         / F.sum(F.col("enc") % 64).cast("double")
                         / 1_000_000, 6).alias("mean_piece_cost_nats"))
            .orderBy("source"))
