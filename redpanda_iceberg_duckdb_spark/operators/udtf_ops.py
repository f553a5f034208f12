"""Python UDTF surface (Spark 4, SURVEY.md section 2.10): a lazy row-
generating table function driven through SQL LATERAL, proven equivalent to
the native-expression pipeline on the same oracle.

UDTFs are the API of last resort in this repo's hierarchy (built-in exprs >
Arrow-batched pandas UDFs > UDTF/mapPartitions): chunk_documents_sliding
already does this job with explode+slice entirely JVM-side, and that remains
the production path. This module exists because a complete engine must offer
the escape hatch for chunkers whose logic genuinely cannot be expressed
natively (stateful tokenizers, sentence splitters) — and because claiming
the surface without a driver-checkable query would be padding. The oracle is
the SAME DuckDB SQL as the native query, so the equivalence is checked
cross-engine every gate, not just once in a unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load_table

_CHUNK_UDTF_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, unnest(range(0, len(toks), 12)) AS start, toks FROM t)
SELECT doc_id, cast(start // 12 AS int) AS chunk_idx,
       cast(len(toks[start + 1 : start + 16]) AS int) AS n_tokens,
       md5(array_to_string(toks[start + 1 : start + 16], ' ')) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_idx"""


def _register_chunk_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    # useArrow: rows cross the Python boundary in Arrow batches instead of
    # pickled one-at-a-time (plan shows the Arrow eval node, not
    # BatchEvalPythonUDTF) — eval() itself stays a per-row generator, which
    # is the UDTF contract; the transfer is what Arrow batches.
    @udtf(returnType="chunk_idx: int, n_tokens: int, chunk_md5: string",
          useArrow=True)
    class ChunkDoc:
        """Sliding-window chunker (size 16, stride 12) — identical math to
        chunk_documents_sliding's explode+slice, but expressed as a lazy
        Python generator per document."""

        def eval(self, text: str):
            import hashlib

            # NULL text emits no chunks — matches the native chunker
            # (split/explode drops NULLs) and the DuckDB oracle.
            if text is None:
                return
            toks = text.split(" ")
            for i, start in enumerate(range(0, len(toks), 12)):
                ch = toks[start:start + 16]
                yield (i, len(ch),
                       hashlib.md5(" ".join(ch).encode()).hexdigest())

    spark.udtf.register("chunk_doc_udtf", ChunkDoc)


@register(
    "chunk_documents_udtf",
    oracle=_CHUNK_UDTF_ORACLE,
    tags=("udtf", "chunking", "curation"),
)
def chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunk_documents_sliding re-expressed as a Python UDTF invoked via SQL
    LATERAL — the Spark 4 table-function API exercised end-to-end against
    the same DuckDB oracle as the native pipeline. Rows stream out of the
    generator per input document (no per-doc materialization of all chunks);
    Arrow batches carry them back to the JVM. See module docstring for why
    the native variant remains the production path."""
    _register_chunk_udtf(spark)
    load_table(spark, sf_dir, "documents")
    return spark.sql("""
SELECT doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5
FROM documents, LATERAL chunk_doc_udtf(text) c
ORDER BY doc_id, chunk_idx""")


# --------------------------------------------------- sentence-boundary UDTF
#
# The chunker above proves the UDTF API against a job a built-in can also do.
# This one is the job the API exists FOR: a single-pass finite-state sentence
# splitter (quote tracking + abbreviation suppression) whose natural
# expression is a stateful per-document generator. The repo has no native
# equivalent — expressing it in DataFrame ops would take explode + three
# window passes + re-aggregation (that reconstruction is exactly what the
# DuckDB oracle does, and it is only possible at all because this FSM's
# quote state is a prefix parity; a non-abelian state machine would leave
# SQL entirely).
#
# The fixture corpus has no punctuation (TESTDATA.md documents are plain
# word streams), so both engines first inject punctuation deterministically
# by 0-based token index i:
#   i % 29 == 0 -> token becomes 'dr.'   (abbreviation with terminal period)
#   i %  7 == 6 -> token + '.'           (sentence-terminal candidate)
#   i % 13 == 0 -> '"' + token           (quote char, toggles state)
#   i % 17 == 0 -> token + '"'           (quote char, toggles state)
# (first two are exclusive by CASE precedence; quote wraps stack on top).
#
# Split semantics over the enriched tokens: a sentence ends at token i iff
#   - core := token minus '"' chars ends with '.', '!' or '?', and
#   - lower(core) is not an abbreviation (dr./mr./mrs./st./no./vs./etc.), and
#   - the count of '"' chars in tokens 0..i (inclusive) is EVEN (outside a
#     quotation),
# and the final token of a document always closes its sentence.

_ABBREV = ("dr.", "mr.", "mrs.", "st.", "no.", "vs.", "etc.")

_SENTENCE_UDTF_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (SELECT doc_id, unnest(range(0, len(toks))) AS i, toks FROM t),
tok AS (SELECT doc_id, i, toks[i + 1] AS tk FROM idx),
e1 AS (SELECT doc_id, i,
         CASE WHEN i % 29 = 0 THEN 'dr.'
              WHEN i % 7 = 6 THEN tk || '.' ELSE tk END AS t2 FROM tok),
e2 AS (SELECT doc_id, i,
         CASE WHEN i % 13 = 0 THEN '"' || t2 ELSE t2 END AS t3 FROM e1),
e3 AS (SELECT doc_id, i,
         CASE WHEN i % 17 = 0 THEN t3 || '"' ELSE t3 END AS tokx FROM e2),
q AS (SELECT doc_id, i, tokx, replace(tokx, '"', '') AS core,
        sum(len(tokx) - len(replace(tokx, '"', '')))
          OVER (PARTITION BY doc_id ORDER BY i) AS qcum
      FROM e3),
b AS (SELECT doc_id, i, tokx,
        CASE WHEN (core LIKE '%.' OR core LIKE '%!' OR core LIKE '%?')
              AND lower(core) NOT IN {_ABBREV}
              AND qcum % 2 = 0 THEN 1 ELSE 0 END AS is_b
      FROM q),
s AS (SELECT doc_id, i, tokx,
        coalesce(sum(is_b) OVER (PARTITION BY doc_id ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sent_idx
      FROM b)
SELECT doc_id, cast(sent_idx AS int) AS sent_idx,
       cast(count(*) AS int) AS n_tokens,
       md5(string_agg(tokx, ' ' ORDER BY i)) AS sent_md5
FROM s GROUP BY doc_id, sent_idx
ORDER BY doc_id, sent_idx"""


def _register_sentence_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, n_tokens: int, sent_md5: string",
          useArrow=True)
    class SentenceSplit:
        """Single-pass sentence splitter: punctuation injection + FSM walk
        (buffer, quote parity, sentence counter) — one generator frame per
        document, O(tokens) time, O(longest sentence) memory."""

        def eval(self, text: str):
            import hashlib

            if text is None:
                return
            abbrev = {"dr.", "mr.", "mrs.", "st.", "no.", "vs.", "etc."}
            buf: list[str] = []
            parity = 0
            sent_idx = 0
            toks = text.split(" ")
            for i, tk in enumerate(toks):
                if i % 29 == 0:
                    tk = "dr."
                elif i % 7 == 6:
                    tk = tk + "."
                if i % 13 == 0:
                    tk = '"' + tk
                if i % 17 == 0:
                    tk = tk + '"'
                parity = (parity + tk.count('"')) % 2
                buf.append(tk)
                core = tk.replace('"', "")
                if (core.endswith((".", "!", "?"))
                        and core.lower() not in abbrev and parity == 0):
                    yield (sent_idx, len(buf),
                           hashlib.md5(" ".join(buf).encode()).hexdigest())
                    sent_idx += 1
                    buf = []
            if buf:
                yield (sent_idx, len(buf),
                       hashlib.md5(" ".join(buf).encode()).hexdigest())

    spark.udtf.register("sentence_split_udtf", SentenceSplit)


@register(
    "sentence_chunks_udtf",
    oracle=_SENTENCE_UDTF_ORACLE,
    tags=("udtf", "chunking", "text"),
)
def sentence_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary document splitting via a stateful Python UDTF — the
    chunker whose logic (quote-state + abbreviation FSM) has no native
    DataFrame expression in this repo; see the block comment above for exact
    semantics and why the oracle's window-function reconstruction doesn't
    generalize. Rows stream out per document through Arrow; at 100 TB this
    is a map-side-only operator (no shuffle before the LATERAL)."""
    _register_sentence_udtf(spark)
    load_table(spark, sf_dir, "documents")
    return spark.sql("""
SELECT doc_id, s.sent_idx, s.n_tokens, s.sent_md5
FROM documents, LATERAL sentence_split_udtf(text) s
ORDER BY doc_id, sent_idx""")
