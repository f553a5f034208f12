"""Corpus-level lexical analysis: vocabulary growth (Heaps-law curve),
per-document token novelty, token-distribution entropy, and modal tokens.

These are the corpus statistics a training-data pipeline computes before
and after dedup/filtering (vocabulary saturation tells you when more data
stops adding new tokens; novelty flags documents that are recombinations
of already-seen vocabulary; entropy is a cheap diversity score).

Scale notes (100 TB stance):
- Everything reduces to token explosion -> hash aggregation. The first-seen
  aggregate (`min(doc_id) per token`) is ONE shuffle keyed by token with
  map-side partial mins; vocabulary is sublinear in corpus size (Heaps'
  law), so the reduce side stays small even at 100 TB.
- Novelty joins first-seen back to per-doc distinct tokens on the token
  key — an equi-join between two already-token-partitioned frames, so AQE
  can plan it without an extra exchange of the big side.
- No Python UDFs; split/explode/ln are all JVM-side codegen.

Reference parity: the reference has no text operators at all (its corpus
surface is /root/reference/duckdb/query_and_publish.py:107-122 trade
aggregates); this module is additive LLM-pipeline coverage per the build
brief, same fixture contract as operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

# Distinct (doc_id, token) pairs; dedup happens before the first-seen agg so
# a token repeated within one doc counts once.
_TOK_CTE_DUCK = """
w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents),
first_seen AS (SELECT tok, min(doc_id) AS first_doc FROM w GROUP BY tok)
"""


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
            .distinct())


def _first_seen(tokens: DataFrame) -> DataFrame:
    return tokens.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))


@register(
    "vocab_growth_by_bucket",
    oracle=f"""
WITH {_TOK_CTE_DUCK}
SELECT first_doc, count(*) AS new_tokens,
       min(tok) AS first_token, max(tok) AS last_token
FROM first_seen GROUP BY first_doc ORDER BY first_doc""",
    tags=("text", "vocab"),
)
def vocab_growth_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: which documents (in doc_id order)
    introduced NEVER-BEFORE-SEEN tokens, how many, and the alphabetic
    min/max of what they introduced. One shuffle: min(doc_id) per token
    with map-side partial mins; the rollup runs over the vocabulary frame,
    which Heaps' law keeps sublinear in corpus size, so the result is
    bounded by |vocab| rows even at 100 TB."""
    fs = _first_seen(_doc_tokens(spark, sf_dir))
    return (fs.groupBy("first_doc")
            .agg(F.count(F.lit(1)).alias("new_tokens"),
                 F.min("tok").alias("first_token"),
                 F.max("tok").alias("last_token"))
            .orderBy("first_doc"))


@register(
    "token_novelty_ratio",
    oracle=f"""
WITH {_TOK_CTE_DUCK},
per_doc AS (
  SELECT w.doc_id,
         count(*) AS n_distinct,
         cast(sum(CASE WHEN f.first_doc = w.doc_id THEN 1 ELSE 0 END)
             AS bigint) AS n_new
  FROM w JOIN first_seen f USING (tok)
  GROUP BY w.doc_id)
SELECT doc_id, n_distinct, n_new,
       round(cast(n_new as double) / n_distinct, 6) AS novelty
FROM per_doc ORDER BY doc_id""",
    tags=("text", "vocab", "join"),
)
def token_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct tokens whose
    FIRST corpus occurrence is this doc. Low-novelty documents are vocab
    recombinations — prime dedup/filter candidates. The join is token-keyed
    between two frames already partitioned by token (the explode output and
    the first-seen aggregate), so only one side exchanges; the ratio is a
    true quotient of small ints -> round(…,6) is midpoint-safe cross-engine."""
    toks = _doc_tokens(spark, sf_dir)
    joined = toks.join(_first_seen(toks), "tok")
    return (joined.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_distinct"),
                 F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                       .otherwise(0)).alias("n_new"))
            .select("doc_id", "n_distinct", "n_new",
                    F.round(F.col("n_new").cast("double")
                            / F.col("n_distinct"), 6).alias("novelty"))
            .orderBy("doc_id"))


@register(
    "token_entropy_by_source",
    oracle="""
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
c AS (SELECT source, tok, count(*) AS c FROM w GROUP BY source, tok),
s AS (SELECT source, cast(sum(c) AS bigint) AS n_tokens,
             count(*) AS n_distinct,
             sum(c * ln(c)) AS slc
      FROM c GROUP BY source)
SELECT source, n_tokens, n_distinct,
       round(ln(n_tokens) - slc / n_tokens, 6) AS entropy
FROM s ORDER BY source""",
    tags=("text", "entropy"),
)
def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy (nats) of the token distribution per source —
    the standard cheap diversity score for corpus slices. Uses the
    ln-decomposition H = ln(N) - Σ c·ln(c) / N so the inner aggregate needs
    only per-token counts (map-side combine), no per-token probability
    column. Two shuffles, the second over |sources| rows. Cross-engine: the
    double Σ c·ln(c) is order-dependent only in the last ulp over ~dozens of
    terms; round(…,6) absorbs it."""
    d = load_table(spark, sf_dir, "documents")
    counts = (d.select("source",
                       F.explode(F.split("text", " ")).alias("tok"))
              .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c")))
    return (counts.groupBy("source")
            .agg(F.sum("c").alias("n_tokens"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.sum(F.col("c") * F.log(F.col("c"))).alias("slc"))
            .select("source", "n_tokens", "n_distinct",
                    F.round(F.log(F.col("n_tokens"))
                            - F.col("slc") / F.col("n_tokens"), 6)
                    .alias("entropy"))
            .orderBy("source"))


@register(
    "mode_token_per_source",
    oracle="""
WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
c AS (SELECT source, tok, count(*) AS c FROM w GROUP BY source, tok),
r AS (SELECT source, tok, c,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, tok) AS rn
      FROM c)
SELECT source, tok AS top_token, c AS occurrences
FROM r WHERE rn = 1 ORDER BY source""",
    tags=("text", "mode", "window"),
)
def mode_token_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal (most frequent) token per source with a deterministic
    count-desc, token-asc tie-break. The window runs over the per-token
    COUNT frame (vocabulary-sized, not corpus-sized) — at 100 TB the
    row_number partition is |vocab per source|, never |tokens|."""
    d = load_table(spark, sf_dir, "documents")
    counts = (d.select("source",
                       F.explode(F.split("text", " ")).alias("tok"))
              .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c")))
    w = W.partitionBy("source").orderBy(F.desc("c"), "tok")
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("source", F.col("tok").alias("top_token"),
                    F.col("c").alias("occurrences"))
            .orderBy("source"))


@register(
    "source_vocab_overlap",
    oracle="""
WITH v AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
s AS (SELECT source, count(*) AS nv FROM v GROUP BY source),
inter AS (SELECT a.source AS source_a, b.source AS source_b,
                 count(*) AS n_shared
          FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
          GROUP BY 1, 2)
SELECT source_a, source_b, n_shared,
       round(n_shared * 1.0 / (s1.nv + s2.nv - n_shared), 6) AS jaccard
FROM inter
JOIN s s1 ON s1.source = source_a
JOIN s s2 ON s2.source = source_b
ORDER BY source_a, source_b""",
    tags=("lexicon", "overlap", "curation"),
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-audit matrix
    that tells a mixture designer which sources are near-redundant before
    any document-level dedup runs. The document table collapses to the
    (source, token) vocabulary FIRST (distinct — vocabulary-sized, not
    corpus-sized), so the token self-join fans out at most |sources| ways
    per token and the output is |sources| choose 2 rows. Counts are exact
    integers; jaccard is a true quotient (round 6). At 100 TB the distinct
    is the only corpus-scale shuffle; everything after runs on vocabulary
    tables."""
    d = load_table(spark, sf_dir, "documents")
    v = (d.select("source",
                  F.explode(F.split("text", " ")).alias("tok"))
         .distinct())
    s = v.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = v.select(F.col("source").alias("source_a"), "tok")
    b = v.select(F.col("source").alias("source_b"), "tok")
    inter = (a.join(b, ["tok"])
             .filter(F.col("source_a") < F.col("source_b"))
             .groupBy("source_a", "source_b")
             .agg(F.count(F.lit(1)).alias("n_shared")))
    s1 = s.select(F.col("source").alias("source_a"), F.col("nv").alias("nv_a"))
    s2 = s.select(F.col("source").alias("source_b"), F.col("nv").alias("nv_b"))
    return (inter.join(F.broadcast(s1), "source_a")
            .join(F.broadcast(s2), "source_b")
            .select("source_a", "source_b", "n_shared",
                    F.round(F.col("n_shared")
                            / (F.col("nv_a") + F.col("nv_b")
                               - F.col("n_shared")), 6).alias("jaccard"))
            .orderBy("source_a", "source_b"))


@register(
    "token_cooccurrence_lift",
    oracle="""
WITH dt AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
tc AS (SELECT tok, count(*) AS n FROM dt GROUP BY tok),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2),
lifted AS (
  SELECT p.tok_a, p.tok_b, p.n_ab,
         round(p.n_ab * nd.n_docs * 1.0 / (ta.n * tb.n), 6) AS lift
  FROM pairs p
  JOIN tc ta ON ta.tok = p.tok_a
  JOIN tc tb ON tb.tok = p.tok_b
  CROSS JOIN nd)
SELECT tok_a, tok_b, n_ab, lift
FROM lifted
ORDER BY lift DESC, tok_a, tok_b
LIMIT 20""",
    tags=("lexicon", "association"),
)
def token_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token pairs by co-occurrence lift — association mining
    (P(a,b) / P(a)P(b)) with the lift kept as an EXACT integer rational
    (n_ab * N / (n_a * n_b)): no logarithms, so no libm divergence between
    engines; ties break on the token pair. Work is vocabulary-shaped: the
    corpus reduces to distinct (doc, token) once, the pair join fans out
    per-doc (bounded by tokens-per-doc squared, not corpus size), and
    everything downstream runs on vocabulary-sized tables. The final top-20
    is a TakeOrdered, not a global sort."""
    d = load_table(spark, sf_dir, "documents")
    dt = (d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
          .distinct())
    n_docs = d.select("doc_id").distinct().count()
    tc = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    a = dt.select("doc_id", F.col("tok").alias("tok_a"))
    b = dt.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (a.join(b, "doc_id")
             .filter(F.col("tok_a") < F.col("tok_b"))
             .groupBy("tok_a", "tok_b")
             .agg(F.count(F.lit(1)).alias("n_ab")))
    ta = tc.select(F.col("tok").alias("tok_a"), F.col("n").alias("n_a"))
    tb = tc.select(F.col("tok").alias("tok_b"), F.col("n").alias("n_b"))
    return (pairs.join(F.broadcast(ta), "tok_a")
            .join(F.broadcast(tb), "tok_b")
            .select("tok_a", "tok_b", "n_ab",
                    F.round(F.col("n_ab") * F.lit(n_docs)
                            / (F.col("n_a") * F.col("n_b")), 6)
                    .alias("lift"))
            .orderBy(F.desc("lift"), "tok_a", "tok_b")
            .limit(20))


@register(
    "bpe_pair_frequencies",
    oracle="""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
pairs AS (
  SELECT substring(w, i + 1, 2) AS pair
  FROM words, unnest(range(greatest(length(w) - 1, 0))) r(i)
  WHERE length(w) >= 2)
SELECT pair, count(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT 30""",
    tags=("lexicon", "tokenizer", "bpe"),
)
def bpe_pair_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistic one BPE training iteration maximizes: corpus-wide
    frequencies of adjacent character pairs within words (Sennrich et al.
    2016, arXiv:1508.07909), top 30. The merge step picks the argmax; at
    scale the whole tokenizer-training loop is this hash-aggregate per
    iteration — explode words, slide a 2-char window JVM-side, one shuffle
    keyed by pair with map-side combine (pair vocabulary is tiny, so the
    reduce side is trivially small). Ties at the cutoff are broken by pair
    text, so the top-30 slice is engine-deterministic."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w"))
    pairs = (words.filter(F.length("w") >= 2)
             .select(F.explode(F.expr(
                 "transform(sequence(1, length(w) - 1), "
                 "i -> substring(w, i, 2))")).alias("pair")))
    return (pairs.groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(30))


@register(
    "unigram_logprob_quality",
    oracle="""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
ct AS (SELECT tok, cast(sum(tf) AS bigint) AS c FROM tf GROUP BY tok),
tot AS (SELECT cast(sum(c) AS bigint) AS total FROM ct),
per_doc AS (SELECT tf.doc_id,
                   cast(sum(tf.tf) AS bigint) AS n_tokens,
                   sum(tf.tf * ln(ct.c)) AS slc
            FROM tf JOIN ct USING (tok) GROUP BY tf.doc_id)
SELECT doc_id, n_tokens,
       round(slc / n_tokens - ln(total), 6) AS avg_logprob
FROM per_doc CROSS JOIN tot
ORDER BY doc_id""",
    tags=("text", "quality", "language-model"),
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram LM — the cheapest perplexity proxy used as a quality filter
    (low mean log-prob = off-distribution / noisy docs). Decomposition
    keeps everything count-shaped: mean = Σ tf·ln(c_tok) / dl − ln(total),
    so the plan is one tokenize pass, the (doc, tok) tf aggregate, a
    token-keyed join against the corpus counts (both sides already
    partitioned by token), and a per-doc sum — no per-token probability
    column materializes and the corpus total travels as one broadcast
    scalar. The double Σ tf·ln(c) accumulates over at most a few hundred
    terms per doc; round(…,6) absorbs the last-ulp ordering noise (same
    policy as token_entropy_by_source)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    ct = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("c"))
    tot = ct.agg(F.sum("c").cast("bigint").alias("total"))
    per_doc = (tf.join(ct, "tok")
               .groupBy("doc_id")
               .agg(F.sum("tf").cast("bigint").alias("n_tokens"),
                    F.sum(F.col("tf") * F.log("c")).alias("slc")))
    return (per_doc.crossJoin(F.broadcast(tot))
            .select("doc_id", "n_tokens",
                    F.round(F.col("slc") / F.col("n_tokens")
                            - F.log("total"), 6).alias("avg_logprob"))
            .orderBy("doc_id"))


@register(
    "zipf_fit_by_source",
    oracle="""
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents),
tf AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
rk AS (SELECT source, tok, c,
              row_number() OVER (PARTITION BY source
                                 ORDER BY c DESC, tok) AS rank
       FROM tf),
xy AS (SELECT source, ln(rank) AS x, ln(c) AS y FROM rk),
m AS (SELECT source, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy GROUP BY source)
SELECT source, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       CASE WHEN round(n * syy - sy * sy, 9) = 0 THEN NULL
            ELSE round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                       / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
       END AS r2
FROM m ORDER BY source""",
    tags=("text", "quality", "zipf"),
)
def zipf_fit_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source: OLS slope of ln(frequency) against
    ln(rank) over the source's token frequency table. Natural text sits
    near slope −1; strong deviation flags templated/generated/spam slices
    before they enter a training mix. Ranks come from a window PARTITIONED
    by source (parallel across sources, never global); the regression is
    the same five-sufficient-statistics aggregate as ols_hourly_trend —
    map-side combinable, one row per source out. Doubles accumulate over
    at most |vocab| terms per source; round(…,6) absorbs ordering ulp
    (the repo-wide float policy)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c")))
    rk = tf.withColumn("rank", F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("c"), "tok")))
    xy = rk.select("source", F.log("rank").alias("x"), F.log("c").alias("y"))
    m = (xy.groupBy("source")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sxx"),
              F.sum(F.col("y") * F.col("y")).alias("syy")))
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # Degenerate guard: a constant-frequency source has zero y-variance,
    # where r2 is 0/0 — Spark's non-ANSI division yields NULL, DuckDB NaN.
    # Detected on the ROUNDED variance (exact zero is summation-order
    # dependent at the ulp level) and defined as NULL in both engines.
    r2 = F.when(F.round(deny, 9) == 0, F.lit(None).cast("double")) \
          .otherwise(F.round(num * num / (denx * deny), 6))
    return (m.select("source", "n",
                     F.round(num / denx, 6).alias("zipf_slope"),
                     r2.alias("r2"))
            .orderBy("source"))
