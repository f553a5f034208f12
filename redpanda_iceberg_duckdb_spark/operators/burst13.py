"""Token burstiness (Church & Gale): tokens whose occurrences CLUMP into
few documents — cf/df, corpus frequency over document frequency — the
corpus-linguistics signal that separates topical terms (bursty: a doc
about a thing says it many times) from function words (cf/df ~ 1
everywhere). Quality pipelines use the bursty tail to find template spam
(one token repeated hundreds of times in a handful of docs) that
frequency alone ranks as "popular".

Ranking is exact: burstiness is compared as the integer (1e6*cf) div df
(half-up not needed — only the ORDER matters and floor of a monotone
transform preserves it except at ties, which the (tok) tiebreak settles
identically in both engines). Minimum support cf >= 10 keeps one-off
noise out of the top list.

Scale stance (100 TB): one token pass, one combinable (cf, df) aggregate
per token — df via count(DISTINCT doc_id), the one shuffle —
TakeOrderedAndProject for the top rows. No window, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_TOP = 30
_MIN_CF = 10

_BURST_ORACLE = f"""
WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents),
agg AS (SELECT tok, cast(count(*) AS bigint) AS cf,
               cast(count(DISTINCT doc_id) AS bigint) AS df
        FROM tk GROUP BY tok HAVING count(*) >= {_MIN_CF})
SELECT tok, cf, df,
       (1000000 * cf) // df AS burst_micro,
       round(cast(cf AS double) / df, 6) AS burstiness
FROM agg
ORDER BY burst_micro DESC, tok LIMIT {_TOP}"""


@register(
    "token_burstiness_topk",
    oracle=_BURST_ORACLE,
    tags=("text", "quality", "corpus-linguistics", "llm-pipeline"),
)
def token_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP} burstiest tokens (cf/df, cf >= {_MIN_CF}) — module
    docstring: (tok, cf, df, burst_micro, burstiness)."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    agg = (tk.groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("cf"),
                F.count_distinct("doc_id").cast("long").alias("df"))
           .filter(F.col("cf") >= _MIN_CF))
    return (agg.selectExpr(
        "tok", "cf", "df",
        "(1000000 * cf) div df AS burst_micro",
        "round(cast(cf AS double) / df, 6) AS burstiness")
        .orderBy(F.desc("burst_micro"), "tok").limit(_TOP))
