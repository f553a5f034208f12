"""Text-analysis operators over ``documents``: token statistics, regex
tokenization, heuristic language ID, quality scoring, and content
fingerprinting. All run as native column expressions (JVM, codegen) — no
Python in the hot path; each has an exact DuckDB oracle.

Scale: every operator here is a narrow map over the corpus (no shuffle except
final ORDER BY, which exists only for presentation) — they pipeline with the
parquet scan and prune to the ``text`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# Heuristic stopword lists for language ID (shared literals, both engines).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "de", "et", "est"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


@register(
    "text_stats",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       round(len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' ')), 6) AS ttr,
       length(text) AS n_chars_measured,
       round((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
             / len(string_split(text, ' ')), 6) AS avg_token_len
FROM documents
ORDER BY doc_id""",
    bench=True,
    tags=("text",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: count, distinct count, type-token
    ratio, character count, average token length."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        F.round(nd / n, 6).alias("ttr"),
        F.length("text").alias("n_chars_measured"),
        F.round((F.length("text") - (n - 1)) / n, 6).alias("avg_token_len"),
    ).orderBy("doc_id")


@register(
    "token_count_regex",
    oracle=r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish,
       len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
       len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
FROM documents
ORDER BY doc_id""",
    tags=("text",),
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization counts: word runs, digit runs, and
    punctuation as separate tokens (the pre-tokenizer split most BPE
    vocabularies assume)."""
    d = load_table(spark, sf_dir, "documents")

    def cnt(pat: str):
        return F.size(F.expr(f"regexp_extract_all(text, '{pat}', 0)"))

    return d.select(
        "doc_id",
        cnt("[a-z]+|[0-9]+|[^a-z0-9 ]").alias("n_bpe_ish"),
        cnt("[0-9]+").alias("n_numbers"),
        cnt("[^a-z0-9 ]").alias("n_punct"),
    ).orderBy("doc_id")


def _lang_score_duck(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return (f"len(list_intersect(list_distinct(string_split(text, ' ')), "
            f"[{lst}]))")


def _lang_score_spark(lang: str) -> F.Column:
    lst = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return F.size(F.expr(
        f"array_intersect(array_distinct(split(text, ' ')), array({lst}))"))


@register(
    "lang_id_heuristic",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_score_duck("en")} AS s_en,
         {_lang_score_duck("es")} AS s_es,
         {_lang_score_duck("fr")} AS s_fr,
         {_lang_score_duck("de")} AS s_de,
         {_lang_score_duck("zh")} AS s_zh
  FROM documents)
SELECT doc_id,
       CASE greatest(s_en, s_es, s_fr, s_de, s_zh)
            WHEN 0 THEN 'und'
            WHEN s_en THEN 'en'
            WHEN s_es THEN 'es'
            WHEN s_fr THEN 'fr'
            WHEN s_de THEN 'de'
            ELSE 'zh' END AS predicted_lang,
       lang AS labeled_lang
FROM scored
ORDER BY doc_id""",
    tags=("text",),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: score each language by distinct marker
    hits, argmax with a fixed precedence order (en>es>fr>de>zh) so ties are
    deterministic; 'und' when nothing matches."""
    d = load_table(spark, sf_dir, "documents")
    scores = {lang: _lang_score_spark(lang) for lang in _LANG_MARKERS}
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "und")
    for lang in ["en", "es", "fr", "de", "zh"]:   # precedence order
        pred = pred.when(scores[lang] == best, lang)
    return d.select(
        "doc_id", pred.alias("predicted_lang"), F.col("lang").alias("labeled_lang")
    ).orderBy("doc_id")


# Quality formula shared with clusters.cluster_best_survivors' oracle.
_QUALITY_EXPR_DUCK = r"""round(0.4 * least(len(string_split(text, ' ')) / 100.0, 1.0)
           + 0.4 * (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' ')))
           + 0.2 * (1.0 - least(len(regexp_extract_all(text, '[^a-z0-9 ]'))
                                * 1.0 / length(text), 1.0)), 6)"""


@register(
    "quality_score",
    oracle=f"""
SELECT doc_id,
       {_QUALITY_EXPR_DUCK} AS quality
FROM documents
ORDER BY doc_id""",
    tags=("text",),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score: length saturation (0.4), type-token
    ratio (0.4), inverse punctuation density (0.2) — the shape of pretraining
    quality filters; every term is a native expression."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    punct = F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
    return d.select(
        "doc_id",
        F.round(
            0.4 * F.least(n / F.lit(100.0), F.lit(1.0))
            + 0.4 * ttr
            + 0.2 * (1.0 - F.least(punct / F.length("text"), F.lit(1.0))),
            6,
        ).alias("quality"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    oracle=r"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
       length(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS n_norm_chars
FROM documents
ORDER BY doc_id""",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical content fingerprint: lowercase, trim, collapse whitespace,
    md5 — the key used by dedup_exact_groups, exposed as its own operator."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return d.select(
        "doc_id", F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("n_norm_chars"),
    ).orderBy("doc_id")


@register(
    "source_lang_profile",
    oracle="""
SELECT source, lang, count(*) AS n_docs,
       cast(sum(n_chars) AS bigint) AS total_chars,
       round(cast(sum(n_chars) AS bigint) * 1.0 / count(*), 4) AS avg_chars
FROM documents
GROUP BY source, lang
ORDER BY source, lang""",
    tags=("text",),
)
def source_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition profile: docs/chars per (source, lang) — the
    bookkeeping rollup every corpus pipeline reports."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.round(F.sum("n_chars") / F.count(F.lit(1)), 4).alias("avg_chars"))
        .orderBy("source", "lang")
    )


@register(
    "tfidf_top_terms",
    oracle="""
WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM
              (SELECT doc_id, unnest(string_split(text, ' ')) tok FROM documents)
            GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
scored AS (SELECT doc_id, tf.tok AS term,
                  cast(tf * 1000000 // df AS bigint) AS score_scaled
           FROM tf JOIN df ON tf.tok = df.tok)
SELECT doc_id, term, score_scaled, rnk FROM
  (SELECT *, row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_scaled DESC, term) rnk
   FROM scored)
WHERE rnk <= 3
ORDER BY doc_id, rnk""",
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by a TF-IDF-style score.

    Score = tf * 1e6 // df (integer rational): same ordering as tf/df,
    but exact integer arithmetic — cross-engine ln() can differ in the last
    ulp, so the classic tf*ln(N/df) is not oracle-safe; the monotone rational
    surrogate is. DF is one extra aggregate over the exploded tokens
    (broadcast-joined back — vocabulary is small relative to the corpus)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tf = (d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    scored = (tf.join(F.broadcast(df_), "tok")
              .select("doc_id", F.col("tok").alias("term"),
                      F.expr("cast(tf * 1000000 div df as bigint)")
                      .alias("score_scaled")))
    w = W.partitionBy("doc_id").orderBy(F.desc("score_scaled"), F.asc("term"))
    return (scored.select("doc_id", "term", "score_scaled",
                          F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= 3)
            .orderBy("doc_id", "rnk"))
