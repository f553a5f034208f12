"""Content-defined chunking (CDC): split each document at positions where a
rolling window hash of the text hits a boundary pattern, instead of at fixed
offsets.

Why it matters for a training-data pipeline: fixed-size chunking breaks
dedup — inserting one character near the top of a re-crawled page shifts
every later chunk boundary, so no chunk hash matches the previous crawl.
Content-defined boundaries depend only on the LOCAL window bytes, so an
edit perturbs at most the chunks it touches and chunk-hash dedup keeps
working across near-identical re-crawls (the rsync/LBFS/FastCDC idea, all
public literature).

Determinism: the "rolling" hash here is a windowed polynomial evaluated
INDEPENDENTLY at each position i over the last W=8 characters —

    h(i) = ( Σ_{j=0..7} ascii(char[i-j]) · (257^j mod 1000003) ) mod 1000003

boundary iff h(i) % 64 == 0 (expected chunk length 64). Pure integer
arithmetic (each term is reduced mod M, the 8-term sum stays < 2^40), so
both engines agree bit-for-bit. Evaluating per-position (8 multiplies)
rather than via the recurrence costs 8× the arithmetic but removes the
sequential dependency — every position is independent, which is exactly
what a data-parallel engine wants.

Scale stance (100 TB): the whole chunker is ONE map-side projection —
boundary positions, chunk substrings, chunk hashes, and per-doc stats are
all computed inside array expressions on the document row (WholeStageCodegen
end-to-end, zero shuffles before the final per-doc output). Nothing about
the plan changes whether there are 500 docs or 5 billion; the only shuffle
anywhere is the optional global ordering of the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table_spread

_W = 8                  # window characters
_M = 1_000_003          # polynomial modulus (prime)
_BASE = 257
_MASK = 64              # boundary when h % 64 == 0 -> expected chunk ~64 chars
_POW = [pow(_BASE, j, _M) for j in range(_W)]

# h(i) over the last W chars ending at 1-based position i.
_HASH_SPARK = "(" + " + ".join(
    f"ascii(substr(text, i - {j}, 1)) * {_POW[j]}" for j in range(_W)
) + f") % {_M}"
_HASH_DUCK = "(" + " + ".join(
    f"ord(text[i - {j}]) * {_POW[j]}" for j in range(_W)
) + f") % {_M}"

_BOUNDS_SPARK = (
    f"case when length(text) >= {_W} then "
    f"filter(sequence({_W}, length(text)), i -> ({_HASH_SPARK}) % {_MASK} = 0) "
    "else array() end"
)
# Append the doc end as the final chunk boundary (unless a content boundary
# already landed exactly there).
_ENDS_SPARK = (
    "case when size(b) > 0 and element_at(b, -1) = length(text) then b "
    "else concat(b, array(length(text))) end"
)

_ORACLE = f"""
WITH d AS (SELECT doc_id, text FROM documents),
wb AS (SELECT doc_id, text,
              list_filter(range({_W}, length(text) + 1),
                          i -> ({_HASH_DUCK}) % {_MASK} = 0) AS b
       FROM d),
we AS (SELECT doc_id, text,
              CASE WHEN len(b) > 0 AND b[-1] = length(text) THEN b
                   ELSE list_append(b, length(text)) END AS ends
       FROM wb),
ex AS (SELECT doc_id, text, ends,
              unnest(range(1, len(ends) + 1)) AS k
       FROM we),
ch AS (SELECT doc_id,
              CASE WHEN k = 1 THEN 1 ELSE ends[k - 1] + 1 END AS s,
              ends[k] AS e, text
       FROM ex),
h AS (SELECT doc_id, md5(substr(text, s, e - s + 1)) AS ch_hash,
             e - s + 1 AS clen
      FROM ch)
SELECT doc_id,
       cast(count(*) AS bigint) AS n_chunks,
       cast(count(DISTINCT ch_hash) AS bigint) AS n_distinct_chunks,
       cast(min(clen) AS bigint) AS min_chunk_len,
       cast(max(clen) AS bigint) AS max_chunk_len
FROM h GROUP BY doc_id ORDER BY doc_id"""


@register(
    "cdc_chunk_stats",
    oracle=_ORACLE,
    tags=("chunking", "dedup", "cdc"),
)
def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-defined chunking stats: chunk count, distinct
    chunk hashes (intra-doc chunk dedup signal), and the chunk-length
    range. Module docstring has the windowed-polynomial boundary rule and
    the all-map-side plan; contrast with chunk_documents_sliding
    (sampling_packing.py), which is the fixed-stride token chunker this
    one makes edit-robust."""
    d = load_table_spread(spark, sf_dir, "documents", "doc_id")
    ends = (d.select("doc_id", "text",
                     F.expr(_BOUNDS_SPARK).alias("b"))
            .select("doc_id", "text", F.expr(_ENDS_SPARK).alias("ends")))
    # Chunks, hashes, and stats all inside array expressions — no explode,
    # no shuffle; each output row is produced by its input row alone.
    chunks = ends.select(
        "doc_id",
        F.expr(
            "transform(ends, (e, i) -> "
            "substr(text, if(i = 0, 1, element_at(ends, i) + 1), "
            "e - if(i = 0, 1, element_at(ends, i) + 1) + 1))"
        ).alias("cs"))
    hashed = chunks.select(
        "doc_id",
        F.expr("transform(cs, c -> md5(c))").alias("hs"),
        F.expr("transform(cs, c -> length(c))").alias("ls"))
    return (hashed.select(
                "doc_id",
                F.size("hs").cast("bigint").alias("n_chunks"),
                F.size(F.array_distinct("hs")).cast("bigint")
                 .alias("n_distinct_chunks"),
                F.array_min("ls").cast("bigint").alias("min_chunk_len"),
                F.array_max("ls").cast("bigint").alias("max_chunk_len"))
            .orderBy("doc_id"))
