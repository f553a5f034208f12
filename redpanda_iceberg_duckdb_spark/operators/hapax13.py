"""Hapax legomena share and type-token ratio per source — the two
classic lexical-richness slices the corpus-level estimators (Chao1,
Good-Turing, Yule K) aggregate away: a source whose hapax share spikes
is either genuinely diverse or full of OCR noise/mojibake (the quality
triage decides which), and TTR falling with size at the wrong rate flags
template text. Counts are within-source (a token unique to the corpus
but repeated inside one source is not a hapax THERE).

All integers until the final divisions. Scale stance (100 TB): one token
pass, one (source, token) count aggregate — map-side combinable, the one
shuffle — one per-source rollup. No window, no join, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

_HAPAX_ORACLE = """
WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents),
cf AS (SELECT source, tok, cast(count(*) AS bigint) AS cf
       FROM tk GROUP BY 1, 2)
SELECT source,
       cast(sum(cf) AS bigint) AS n_tokens,
       cast(count(*) AS bigint) AS n_types,
       cast(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS bigint) AS n_hapax,
       round(cast(count(*) AS double) / sum(cf), 6) AS type_token_ratio,
       round(cast(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS double)
             / count(*), 6) AS hapax_share
FROM cf GROUP BY source ORDER BY source"""


@register(
    "hapax_share_by_source",
    oracle=_HAPAX_ORACLE,
    tags=("text", "quality", "corpus-linguistics"),
)
def hapax_share_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, n_types, n_hapax, type_token_ratio,
    hapax_share) — module docstring."""
    d = load_table(spark, sf_dir, "documents")
    cf = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("source", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("cf")))
    return (cf.groupBy("source")
            .agg(F.sum("cf").cast("long").alias("n_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_types"),
                 F.sum(F.when(F.col("cf") == 1, 1).otherwise(0))
                 .cast("long").alias("n_hapax"))
            .select("source", "n_tokens", "n_types", "n_hapax",
                    F.round(F.col("n_types").cast("double")
                            / F.col("n_tokens"), 6)
                    .alias("type_token_ratio"),
                    F.round(F.col("n_hapax").cast("double")
                            / F.col("n_types"), 6).alias("hapax_share"))
            .orderBy("source"))
