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

    @udtf(returnType="chunk_idx: int, n_tokens: int, chunk_md5: string")
    class ChunkDoc:
        """Sliding-window chunker (size 16, stride 12) — identical math to
        chunk_documents_sliding's explode+slice, but expressed as a lazy
        Python generator per document."""

        def eval(self, text: str):
            import hashlib

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
